"""Nonlinear power-law material through the Newton driver.

Checks: (1) exact linear limit (m=1 == linear solver), (2) real Newton
convergence on the softening material, (3) implicit-function-theorem
gradients through the converged state vs finite differences.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import MaterialCard
from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.element import lame_from_Ev
from vbicm_tpu.ops.nonlinear import make_nonlinear_solver, solve_nonlinear
from vbicm_tpu.solver import fea_solution

LAM, MU = lame_from_Ev(20.0, 0.3)


@pytest.fixture(scope="module")
def small_model():
    return build_fem_model(cooks_membrane_mesh(8, 4), dense=False)


def test_linear_limit_matches_linear_solver(small_model):
    """m=1 is exactly linear elasticity: one Newton step reproduces the
    linear solve."""
    res = solve_nonlinear(small_model, jnp.asarray(LAM), jnp.asarray(MU), m=1.0)
    assert bool(res.converged)
    assert int(res.iterations) <= 2, int(res.iterations)
    u_lin = fea_solution(small_model, MaterialCard(E=20.0, v=0.3)).u
    np.testing.assert_allclose(
        np.asarray(res.u), np.asarray(u_lin), rtol=1e-8, atol=1e-12
    )


def test_softening_material_converges_and_softens(small_model):
    """m<1 softens in shear: larger tip deflection, Newton converges in a
    handful of iterations with the energy-norm criterion."""
    # m=0.5, g0=0.05: tip strain ~ g0 so the secant softens visibly (~68%
    # extra deflection) while the tangent stays positive definite (for
    # m >= 0.5 the tangent modulus is (1+x)^{m-2}(1+(2m-1)x) > 0)
    res = solve_nonlinear(
        small_model, jnp.asarray(LAM), jnp.asarray(MU), m=0.5, g0=0.05, tol_cr=1e-14
    )
    assert bool(res.converged)
    assert 2 < int(res.iterations) <= 15, int(res.iterations)
    u_lin = fea_solution(small_model, MaterialCard(E=20.0, v=0.3)).u
    uy_nl = float(res.u[-1])
    uy_l = float(u_lin[-1])
    assert uy_nl > uy_l * 1.02, (uy_nl, uy_l)  # visibly softer
    assert uy_nl < uy_l * 3.0  # but not blown up


@pytest.mark.slow
def test_gradients_through_converged_state(small_model):
    """d(tip uy)/d(lam, mu) by the implicit adjoint vs central differences."""
    solver = make_nonlinear_solver(small_model, m=0.6, g0=0.03)

    def tip(lam, mu):
        return solver(lam, mu)[-1]

    lam0, mu0 = jnp.asarray(LAM), jnp.asarray(MU)
    glam, gmu = jax.grad(tip, argnums=(0, 1))(lam0, mu0)
    eps = 1e-5
    fd_lam = (float(tip(lam0 + eps, mu0)) - float(tip(lam0 - eps, mu0))) / (2 * eps)
    fd_mu = (float(tip(lam0, mu0 + eps)) - float(tip(lam0, mu0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(glam), fd_lam, rtol=2e-5)
    np.testing.assert_allclose(float(gmu), fd_mu, rtol=2e-5)


@pytest.mark.slow
def test_vmap_over_materials(small_model):
    """The nonlinear solve is vmap-able over a material batch (the posterior
    -sample axis of the VI pipeline)."""
    solver = make_nonlinear_solver(small_model, m=0.7, g0=0.03)
    lams = jnp.asarray([LAM, LAM * 1.1, LAM * 0.9])
    mus = jnp.asarray([MU, MU * 0.95, MU * 1.05])
    us = jax.vmap(solver)(lams, mus)
    ref = jnp.stack([solver(lams[i], mus[i]) for i in range(3)])
    np.testing.assert_allclose(np.asarray(us), np.asarray(ref), rtol=1e-7, atol=1e-10)


@pytest.mark.slow
def test_load_stepping_tracks_softening_path(small_model):
    """m=0.5, g0=0.02 saturates (limit load ~55% of the applied force):
    cold full-load Newton diverges — correctly, no equilibrium exists there
    — while warm-started load stepping (the reference's numsteps/
    load_factor card semantics) tracks the equilibrium path to 50% load,
    far beyond the linear response."""
    from vbicm_tpu.ops.nonlinear import solve_nonlinear_stepped

    res_cold = solve_nonlinear(
        small_model, jnp.asarray(LAM), jnp.asarray(MU), m=0.5, g0=0.02
    )
    assert not bool(res_cold.converged)  # beyond the limit load

    res = solve_nonlinear_stepped(
        small_model, jnp.asarray(LAM), jnp.asarray(MU), m=0.5, g0=0.02,
        n_steps=8, load_factor=0.5, tol_cr=1e-12,
    )
    assert bool(res.converged), (int(res.iterations), float(res.tol))
    uy = float(res.u[-1])
    u_lin = float(fea_solution(small_model, MaterialCard(E=20.0, v=0.3)).u[-1])
    # at half load the linear answer is u_lin/2; the softened path is ~3x it
    assert uy > 1.5 * u_lin / 2.0, (uy, u_lin)
    assert np.isfinite(np.asarray(res.u)).all()


@pytest.mark.slow
def test_arclength_traces_limit_load_path(small_model):
    """Cylindrical arc-length continuation (reference arclen card — cards
    only, no implementation there): traces the saturating-secant softening
    path toward its limit load with every increment converged; cross-
    validated against warm-started load stepping at a matching load factor."""
    from vbicm_tpu.ops.arclength import trace_arclength
    from vbicm_tpu.ops.nonlinear import solve_nonlinear_stepped

    path = trace_arclength(small_model, jnp.asarray(LAM), jnp.asarray(MU),
                           m=0.5, g0=0.02, dl=2.0, n_steps=10, t0_step=0.1)
    assert path.converged.all(), path.converged
    t = path.t
    uy = path.u[:, -1]
    # monotone load and displacement, decelerating load (softening)
    assert (np.diff(t) > 0).all() and (np.diff(uy) > 0).all()
    dt_duy = np.diff(t) / np.diff(uy)
    assert (np.diff(dt_duy) < 0).all(), dt_duy  # concave path
    assert t[-1] < 0.60  # below/approaching the ~0.55 limit load

    # cross-validate one point against load stepping
    k = 6
    res = solve_nonlinear_stepped(
        small_model, jnp.asarray(LAM), jnp.asarray(MU), m=0.5, g0=0.02,
        n_steps=8, load_factor=float(t[k]), tol_cr=1e-14,
    )
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.u), path.u[k], rtol=1e-6, atol=1e-9)
