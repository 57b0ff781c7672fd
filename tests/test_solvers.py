"""Cross-method solver equivalence: spectral == cholesky == inverse == CG,
values and gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.ops.solve import (
    make_dense_affine_solver,
    make_spectral_affine_solver,
)
from vbicm_tpu.solver import make_fh_fun, make_solver


@pytest.fixture(scope="module")
def parts(cooks_model):
    return jnp.stack([cooks_model.k_lam_ff, cooks_model.k_mu_ff])


@pytest.fixture(scope="module")
def coeffs():
    return jnp.array([11.538461538461538, 7.6923076923076925])  # E=20, v=0.3


def test_spectral_matches_cholesky(parts, coeffs, cooks_model):
    f = cooks_model.f_free
    u_chol = make_dense_affine_solver(parts)(coeffs, f)
    u_spec = make_spectral_affine_solver(parts)(coeffs, f)
    rel = float(jnp.linalg.norm(u_spec - u_chol) / jnp.linalg.norm(u_chol))
    assert rel < 1e-11, rel


def test_spectral_f32_apply_with_refinement(parts, coeffs, cooks_model):
    f = cooks_model.f_free
    u64 = make_dense_affine_solver(parts)(coeffs, f)
    u_mixed = make_spectral_affine_solver(parts, apply_dtype=jnp.float32, refine_iters=2)(
        coeffs, f
    )
    rel = float(jnp.linalg.norm(u_mixed - u64) / jnp.linalg.norm(u64))
    assert rel < 1e-9, rel


def test_spectral_gradients_match_cholesky(parts, coeffs, cooks_model):
    f = cooks_model.f_free

    def loss(solve, c):
        return jnp.sum(solve(c, f)[-2:] ** 2)

    g_chol = jax.grad(lambda c: loss(make_dense_affine_solver(parts), c))(coeffs)
    g_spec = jax.grad(lambda c: loss(make_spectral_affine_solver(parts), c))(coeffs)
    np.testing.assert_allclose(np.asarray(g_spec), np.asarray(g_chol), rtol=1e-9)


def test_spectral_random_coefficient_sweep(parts, cooks_model):
    """Exactness across the whole (lam, mu) range hit by the theta prior."""
    f = cooks_model.f_free
    spec = make_spectral_affine_solver(parts)
    chol = make_dense_affine_solver(parts)
    rng = np.random.default_rng(0)
    for _ in range(5):
        theta = rng.normal(size=2) * 2.0
        E = np.exp(0.1 * theta[0] + np.log(20.0))
        v = 0.5 / (1 + np.exp(-0.015 * theta[1]))
        lam = v * E / ((1 + v) * (1 - 2 * v))
        mu = 0.5 * E / (1 + v)
        c = jnp.array([lam, mu])
        rel = float(jnp.linalg.norm(spec(c, f) - chol(c, f)) / jnp.linalg.norm(chol(c, f)))
        assert rel < 1e-10, (theta, rel)


def test_make_solver_method_dispatch(cooks_model):
    from vbicm_tpu.ops.element import lame_from_Ev

    lam, mu = lame_from_Ev(20.0, 0.3)
    u_ref = None
    for method in ("spectral", "cholesky", "inverse"):
        u = make_solver(cooks_model, method=method)(jnp.asarray(lam), jnp.asarray(mu))
        if u_ref is None:
            u_ref = u
        else:
            np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-9)


def test_fh_spectral_vs_cholesky_batched(cooks_model):
    thetas = jnp.asarray(np.random.default_rng(3).normal(size=(8, 2)))
    fh_s = make_fh_fun(cooks_model, method="spectral")
    fh_c = make_fh_fun(cooks_model, method="cholesky")
    ys, hs = jax.jit(jax.vmap(fh_s))(thetas)
    yc, hc = jax.jit(jax.vmap(fh_c))(thetas)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yc), atol=1e-10)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hc), atol=1e-10)


def test_newton_raphson_linear_one_iteration(cooks_model):
    """NR driver on the linear problem: converges in exactly 1 iteration to
    the direct solve (the reference's linear path is the same loop with its
    convergence check observed, src/fem_solver.py:68-126)."""
    from vbicm_tpu.ops.element import lame_from_Ev
    from vbicm_tpu.ops.newton import newton_raphson

    lam, mu = lame_from_Ev(20.0, 0.3)
    model = cooks_model
    K = lam * model.k_lam_ff + mu * model.k_mu_ff
    f = model.f_free

    def residual(u):
        return K @ u - f  # R = F_int - F_ext on free dofs

    base = make_spectral_affine_solver(jnp.stack([model.k_lam_ff, model.k_mu_ff]))
    coeffs = jnp.array([lam, mu])

    def tangent_solve(u, r):
        return -base(coeffs, r)

    res = newton_raphson(residual, tangent_solve, jnp.zeros_like(f), tol_cr=1e-10)
    assert bool(res.converged)
    assert int(res.iterations) == 1
    u_direct = base(coeffs, f)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(u_direct), atol=1e-10)


def test_newton_raphson_nonlinear():
    """NR on a genuinely nonlinear system (cubic spring) — quadratic
    convergence to machine precision."""
    from vbicm_tpu.ops.newton import newton_raphson

    k1, k3, fext = 2.0, 0.5, jnp.array([1.0, 2.0])

    def residual(u):
        return k1 * u + k3 * u**3 - fext

    def tangent_solve(u, r):
        kt = k1 + 3 * k3 * u**2  # diagonal tangent
        return -r / kt

    res = newton_raphson(residual, tangent_solve, jnp.zeros(2), tol_cr=1e-14, max_iter=20)
    assert bool(res.converged)
    assert int(res.iterations) <= 8
    u = np.asarray(res.u)
    np.testing.assert_allclose(k1 * u + k3 * u**3, np.asarray(fext), atol=1e-10)
