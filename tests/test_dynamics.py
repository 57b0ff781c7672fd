"""Newmark transient dynamics: modal-exact free vibration, energy
conservation, Rayleigh decay, and the static long-time limit."""
import pytest
import jax.numpy as jnp
import numpy as np

from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.eval.modal import natural_frequencies
from vbicm_tpu.ops.dynamics import make_newmark_integrator, total_energy
from vbicm_tpu.solver import fea_solution
from vbicm_tpu.config import MaterialCard

RHO = 1.0


def _model():
    return build_fem_model(cooks_membrane_mesh(4, 2), dense=True, with_mass=True)


def test_free_vibration_matches_modal_solution():
    model = _model()
    w, phi = natural_frequencies(model, density=RHO, n_modes=1)
    w1 = float(w[0])
    T = 2 * np.pi / w1
    dt = T / 400
    nsteps = 800  # two periods
    integ = make_newmark_integrator(model, density=RHO, dt=dt)
    u0 = jnp.asarray(phi[:, 0])
    v0 = jnp.zeros_like(u0)
    F = jnp.zeros((nsteps, model.nfree))
    us, vels, _ = integ(u0, v0, F)
    t = dt * np.arange(1, nsteps + 1)
    exact = np.cos(w1 * t)[:, None] * np.asarray(phi[:, 0])[None, :]
    # avg-acceleration period error ~ (w*dt)^2/12 per period: tiny at dt=T/400
    err = np.max(np.abs(np.asarray(us) - exact)) / np.max(np.abs(exact))
    assert err < 5e-3

    # energy conservation (undamped, gamma=1/2): relative drift < 1e-10
    en = np.asarray(total_energy(model, us, vels, density=RHO))
    assert np.max(np.abs(en - en[0])) / en[0] < 1e-9


def test_rayleigh_damped_decay():
    model = _model()
    w, phi = natural_frequencies(model, density=RHO, n_modes=1)
    w1 = float(w[0])
    a_r = 0.02 * w1  # mass-proportional: zeta = a/(2w)
    zeta = a_r / (2 * w1)
    T = 2 * np.pi / w1
    dt = T / 400
    nsteps = 2000  # five periods
    integ = make_newmark_integrator(model, density=RHO, dt=dt, rayleigh=(a_r, 0.0))
    u0 = jnp.asarray(phi[:, 0])
    us, _, _ = integ(u0, jnp.zeros_like(u0), jnp.zeros((nsteps, model.nfree)))
    # modal coordinate (normalized projection); envelope exp(-zeta*w*t):
    # peak amplitude of period 1 vs period 4 gives the decrement over 3T
    p1 = np.asarray(phi[:, 0])
    q = (np.asarray(us) @ p1) / (p1 @ p1)
    per = int(round(T / dt))
    a_first = np.max(np.abs(q[:per]))
    a_last = np.max(np.abs(q[3 * per : 4 * per]))
    expect = np.exp(-zeta * w1 * 3 * T)
    assert abs(a_last / a_first - expect) < 0.02 * expect


def test_spring_model_dynamics_consistent_with_modal():
    """Springs enter K in the integrator, modal analysis, AND the energy
    diagnostic consistently."""
    from vbicm_tpu.mesh.rect import inverter_quad4_mesh

    mesh, in_node, out_node = inverter_quad4_mesh(4, 4)
    model = build_fem_model(
        mesh, dense=True, with_mass=True,
        nodal_springs=[(in_node, 0, 20.0), (out_node, 0, 20.0)],
    )
    w, phi = natural_frequencies(model, density=RHO, n_modes=1)
    w1 = float(w[0])
    T = 2 * np.pi / w1
    dt, nsteps = T / 400, 800
    integ = make_newmark_integrator(model, density=RHO, dt=dt)
    u0 = jnp.asarray(phi[:, 0])
    us, vels, _ = integ(u0, jnp.zeros_like(u0), jnp.zeros((nsteps, model.nfree)))
    t = dt * np.arange(1, nsteps + 1)
    exact = np.cos(w1 * t)[:, None] * np.asarray(phi[:, 0])[None, :]
    err = np.max(np.abs(np.asarray(us) - exact)) / np.max(np.abs(exact))
    assert err < 5e-3  # only holds if modal K includes the springs
    en = np.asarray(total_energy(model, us, vels, density=RHO))
    assert np.max(np.abs(en - en[0])) / en[0] < 1e-9  # spring PE included


def test_initial_acceleration_f0_override():
    model = _model()
    w, _ = natural_frequencies(model, density=RHO, n_modes=1)
    dt = 2 * np.pi / float(w[0]) / 200
    integ = make_newmark_integrator(model, density=RHO, dt=dt)
    z = jnp.zeros(model.nfree)
    # ramp load starting at 0: with f0=0 the first-step response is O(dt^2)
    F = jnp.outer(jnp.arange(1, 6) * dt, model.f_free)
    us0, _, _ = integ(z, z, F, f0=jnp.zeros(model.nfree))
    us_default, _, _ = integ(z, z, F)  # f0 defaults to F[0] (step-load kick)
    assert float(jnp.max(jnp.abs(us0[0]))) < float(jnp.max(jnp.abs(us_default[0])))


@pytest.mark.slow
def test_finite_strain_newmark_linear_limit_and_equilibrium():
    """Nonlinear (Neo-Hookean) implicit Newmark: reproduces the linear
    integrator in the small-amplitude limit, and holds a finite-strain
    static equilibrium exactly."""
    import dataclasses

    from vbicm_tpu.ops.dynamics import make_newmark_finite_strain
    from vbicm_tpu.ops.element import material_coeffs
    from vbicm_tpu.ops.finite_strain import NeoHookean, solve_finite_strain

    model = _model()
    lam, mu = material_coeffs(model.stype, 20.0, 0.3)
    mat = NeoHookean(lam=jnp.asarray(lam), mu=jnp.asarray(mu))
    w, _ = natural_frequencies(model, density=RHO, n_modes=1)
    T = 2 * np.pi / float(w[0])
    dt, nsteps = T / 100, 50

    # small-amplitude limit: tiny step load, nonlinear == linear to O(eps)
    eps = 1e-6
    F = jnp.broadcast_to(eps * model.f_ext, (nsteps, model.ndof))
    integ_nl = make_newmark_finite_strain(model, mat, density=RHO, dt=dt)
    us_nl, _, _ = integ_nl(
        jnp.zeros(model.ndof), jnp.zeros(model.ndof), F
    )
    integ_lin = make_newmark_integrator(model, density=RHO, dt=dt)
    free = np.asarray(model.free_dof)
    F_lin = jnp.broadcast_to(eps * model.f_free, (nsteps, model.nfree))
    us_lin, _, _ = integ_lin(
        jnp.zeros(model.nfree), jnp.zeros(model.nfree), F_lin
    )
    rel = np.max(
        np.abs(np.asarray(us_nl)[:, free] - np.asarray(us_lin))
    ) / np.max(np.abs(np.asarray(us_lin)))
    assert rel < 1e-4  # O(eps) geometric-nonlinearity correction only

    # finite-strain equilibrium hold: start AT the static Neo-Hookean
    # solution under the full load with v0=0 -> trajectory stays put
    res = solve_finite_strain(model, float(lam), float(mu), n_steps=2)
    u_eq = res.u
    F_full = jnp.broadcast_to(model.f_ext * model.free_mask, (20, model.ndof))
    us_eq, vels_eq, _ = integ_nl(u_eq, jnp.zeros(model.ndof), F_full)
    drift = float(jnp.max(jnp.abs(us_eq[-1] - u_eq))) / float(
        jnp.max(jnp.abs(u_eq))
    )
    assert drift < 1e-8


def test_damped_step_load_reaches_static_solution():
    model = _model()
    w, _ = natural_frequencies(model, density=RHO, n_modes=1)
    w1 = float(w[0])
    dt = 2 * np.pi / w1 / 100
    nsteps = 4000
    integ = make_newmark_integrator(
        model, density=RHO, dt=dt, rayleigh=(0.8 * w1, 0.2 / w1)
    )
    F = jnp.broadcast_to(model.f_free, (nsteps, model.nfree))
    us, _, _ = integ(
        jnp.zeros(model.nfree), jnp.zeros(model.nfree), F
    )
    u_static = np.asarray(fea_solution(model, MaterialCard()).u)[
        np.asarray(model.free_dof)
    ]
    rel = np.max(np.abs(np.asarray(us[-1]) - u_static)) / np.max(np.abs(u_static))
    assert rel < 1e-6
