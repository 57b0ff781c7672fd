"""Generalized-Maxwell viscoelasticity (ops.viscoelastic): integrator
exactness, elastic limits, creep physics, and parameter gradients through
the trajectory.

Rate-dependent sibling of the J2 plasticity family on the reference's
driverless inelastic storage (``src/fem_preprocess.py:486-501``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.viscoelastic import (
    MaxwellMaterial,
    make_viscoelastic_solver,
    relaxation_modulus,
)
from vbicm_tpu.solver import material_coeffs

LAM, MU = material_coeffs(2, 20.0, 0.3)


def _mat(mu_ratio=0.5, tau=1.0):
    """Instantaneous moduli = reference card (lam, MU); one branch carrying
    ``mu_ratio`` of the shear stiffness."""
    return MaxwellMaterial(
        lam=jnp.asarray(LAM),
        mu_inf=jnp.asarray(MU * (1 - mu_ratio)),
        mu=jnp.asarray([MU * mu_ratio]),
        tau=jnp.asarray([tau]),
    )


def test_recurrence_is_exact_for_ramp_hold():
    """The Herrmann-Peterson recurrence is EXACT for piecewise-linear
    strain: a single-branch ramp(t_r)-then-hold shear history must match
    the closed-form hereditary integral to machine precision at ANY dt.

        s(t >= t_r) = 2 mu (e/t_r) tau (1 - e^{-t_r/tau}) e^{-(t-t_r)/tau}
    """
    mu_b, tau, e_amp, t_r, dt = 3.0, 0.7, 0.02, 0.3, 0.1
    n_ramp = int(round(t_r / dt))
    n_hold = 20
    a = np.exp(-dt / tau)
    b = -np.expm1(-dt / tau) / (dt / tau)
    de = e_amp / n_ramp
    s = 0.0
    ts, ss = [], []
    for n in range(n_ramp + n_hold):
        inc = de if n < n_ramp else 0.0
        s = a * s + 2 * mu_b * b * inc
        ts.append((n + 1) * dt)
        ss.append(s)
    ts, ss = np.asarray(ts), np.asarray(ss)
    hold = ts >= t_r - 1e-12
    s_exact = (
        2 * mu_b * (e_amp / t_r) * tau * (1 - np.exp(-t_r / tau))
        * np.exp(-(ts[hold] - t_r) / tau)
    )
    np.testing.assert_allclose(ss[hold], s_exact, rtol=1e-12)


def test_relaxation_modulus_prony():
    mat = _mat(0.4, 2.0)
    t = jnp.asarray([0.0, 1.0, 10.0])
    g = np.asarray(relaxation_modulus(mat, t))
    assert abs(g[0] - MU) < 1e-12  # instantaneous = mu0
    # t = 5 tau: branch decayed to e^-5 = 0.0067 of its modulus
    expected = 0.6 * MU + 0.4 * MU * np.exp(-5.0)
    np.testing.assert_allclose(g[2], expected, rtol=1e-12)


@pytest.fixture(scope="module")
def model():
    return build_fem_model(cooks_membrane_mesh(8, 4), dense=True)


def _elastic_u(model, lam, mu):
    K = np.zeros((model.ndof, model.ndof))
    lm = np.asarray(model.lm)
    ke = lam * np.asarray(model.ke_lam) + mu * np.asarray(model.ke_mu)
    for e in range(lm.shape[0]):
        K[np.ix_(lm[e], lm[e])] += ke[e]
    free = np.asarray(model.free_dof)
    u = np.zeros(model.ndof)
    u[free] = np.linalg.solve(K[np.ix_(free, free)], np.asarray(model.f_ext)[free])
    return u


def test_instantaneous_limit_matches_elastic(model):
    """tau >> total time: no relaxation happens; every step equals the
    elastic solve at the instantaneous moduli (lam, mu0)."""
    mat = _mat(0.5, tau=1e8)
    solve = make_viscoelastic_solver(model, dt=0.1, n_steps=4)
    res = solve(mat)
    u_el = _elastic_u(model, LAM, MU)
    for k in range(4):
        # spectral-solve roundoff feeds the history: measured drift
        # ~1.5e-9/step, far below any physical relaxation
        np.testing.assert_allclose(
            np.asarray(res.u[k]), u_el, rtol=0, atol=1e-7
        )


def test_longtime_creep_reaches_relaxed_modulus(model):
    """Constant load, t >> tau: the displacement converges to the elastic
    solve at the RELAXED moduli (K_b unchanged, mu -> mu_inf)."""
    mat = _mat(0.5, tau=0.05)
    solve = make_viscoelastic_solver(model, dt=0.1, n_steps=40)
    res = solve(mat)
    kb = LAM + 2 * MU / 3
    mu_rel = 0.5 * MU
    u_rel = _elastic_u(model, kb - 2 * mu_rel / 3, mu_rel)
    np.testing.assert_allclose(
        np.asarray(res.u[-1]), u_rel, rtol=0,
        atol=1e-6 * np.abs(u_rel).max(),
    )
    # creep: tip deflection magnitude strictly grows from glassy to relaxed
    tip = np.abs(np.asarray(res.u)[:, -1])
    assert (np.diff(tip) > -1e-12).all()
    assert tip[-1] > 1.2 * tip[0]


def test_parameter_gradients_fd(model):
    """Gradients of a trajectory functional w.r.t. every Maxwell parameter
    (through scan-of-spectral-solves) vs central finite differences."""
    solve = make_viscoelastic_solver(model, dt=0.2, n_steps=6)

    def loss(mu_inf, mu_b, tau):
        mat = MaxwellMaterial(
            lam=jnp.asarray(LAM), mu_inf=mu_inf,
            mu=jnp.asarray([mu_b]), tau=jnp.asarray([tau]),
        )
        res = solve(mat)
        return jnp.sum(res.u[-1] ** 2) + jnp.sum(res.u[2] ** 2)

    args = (jnp.asarray(0.5 * MU), jnp.asarray(0.5 * MU), jnp.asarray(0.4))
    g = jax.grad(loss, argnums=(0, 1, 2))(*args)
    for i, name in enumerate(["mu_inf", "mu_b", "tau"]):
        h = 1e-6 * max(1.0, abs(float(args[i])))
        ap = list(args)
        ap[i] = args[i] + h
        am = list(args)
        am[i] = args[i] - h
        fd = (float(loss(*ap)) - float(loss(*am))) / (2 * h)
        np.testing.assert_allclose(float(g[i]), fd, rtol=5e-6,
                                   err_msg=name)
        assert abs(float(g[i])) > 1e-10, name


def test_vmap_material_batch(model):
    """vmap over a relaxation-time batch == per-sample loop."""
    solve = make_viscoelastic_solver(model, dt=0.1, n_steps=5)

    def tip(tau):
        res = solve(MaxwellMaterial(
            lam=jnp.asarray(LAM), mu_inf=jnp.asarray(0.5 * MU),
            mu=jnp.asarray([0.5 * MU]), tau=jnp.asarray([tau]),
        ))
        return res.u[-1]

    taus = jnp.asarray([0.05, 0.5, 5.0])
    batched = jax.vmap(tip)(taus)
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(batched[k]), np.asarray(tip(taus[k])),
            rtol=0, atol=1e-12,
        )
