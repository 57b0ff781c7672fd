"""Reduced-basis ROM: certified accuracy vs the full solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import ProblemConfig
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.rom import build_reduced_basis, make_fh_fun_rom
from vbicm_tpu.rom.reduced_basis import reduced_solve, residual_norm
from vbicm_tpu.solver import make_fh_fun
from vbicm_tpu.ops.element import lame_from_Ev


@pytest.fixture(scope="module")
def rb(cooks_model):
    return build_reduced_basis(cooks_model, tol=1e-11)


def test_rb_converged(rb):
    assert rb.max_rel_residual < 1e-11
    assert rb.r <= 30  # one-parameter manifold compresses hard


def test_rom_fh_matches_full(cooks_model, rb):
    fh_full = make_fh_fun(cooks_model)
    fh_rom = make_fh_fun_rom(cooks_model, rb)
    rng = np.random.default_rng(0)
    for theta in rng.normal(size=(6, 2)) * 2.0:
        y_f, h_f = fh_full(jnp.asarray(theta))
        y_r, h_r = fh_rom(jnp.asarray(theta))
        np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_f), rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(h_r), np.asarray(h_f), rtol=1e-8, atol=1e-10)


def test_rom_gradients(cooks_model, rb):
    fh_full = make_fh_fun(cooks_model)
    fh_rom = make_fh_fun_rom(cooks_model, rb)

    def loss(fh, th):
        y, h = fh(th)
        return jnp.sum(y) + jnp.sum(h)

    th = jnp.array([0.4, -0.7])
    g_full = jax.grad(lambda t: loss(fh_full, t))(th)
    g_rom = jax.grad(lambda t: loss(fh_rom, t))(th)
    np.testing.assert_allclose(np.asarray(g_rom), np.asarray(g_full), rtol=1e-6)


def test_error_certificate(cooks_model, rb):
    lam, mu = lame_from_Ev(20.0, 0.3)
    u_r = reduced_solve(rb, jnp.asarray(lam), jnp.asarray(mu))
    res = float(residual_norm(rb, jnp.asarray(lam), jnp.asarray(mu), u_r))
    # Gram-expansion cancellation floors the online estimator near sqrt(eps)
    assert res < 1e-6
    # with u_r = 0 the certified residual is exactly ||f||/||f|| = 1
    res0 = float(
        residual_norm(rb, jnp.asarray(lam), jnp.asarray(mu), jnp.zeros_like(u_r))
    )
    np.testing.assert_allclose(res0, 1.0, rtol=1e-12)
    # and the certificate is consistent with the TRUE residual
    K = lam * np.asarray(cooks_model.k_lam_ff) + mu * np.asarray(cooks_model.k_mu_ff)
    free = np.asarray(cooks_model.free_dof)
    Qf = rb.Q[free]
    f = np.asarray(cooks_model.f_free)
    true_res = np.linalg.norm(f - K @ (Qf @ np.asarray(u_r))) / np.linalg.norm(f)
    # both are tiny; the estimator may sit at its cancellation floor above
    # the true residual, but must never under-report by more than the floor
    assert res >= true_res - 1e-8
    assert res < 1e-6


def test_rom_scaled_mesh_smoke():
    """Scaled-config slice: 80x40 mesh ROM built from the sparse path and
    checked against matrix-free CG at one parameter point."""
    mesh = cooks_membrane_mesh(80, 40)
    model = build_fem_model(mesh, dense=False)
    rb = build_reduced_basis(model, tol=1e-10)
    assert rb.max_rel_residual < 1e-10

    from vbicm_tpu.solver import make_solver

    lam, mu = lame_from_Ev(20.0, 0.3)
    u_cg = make_solver(model, cg_tol=1e-13)(jnp.asarray(lam), jnp.asarray(mu))
    u_rom = np.asarray(rb.Q) @ np.asarray(
        reduced_solve(rb, jnp.asarray(lam), jnp.asarray(mu))
    )
    err = np.linalg.norm(u_rom - np.asarray(u_cg)) / np.linalg.norm(np.asarray(u_cg))
    assert err < 1e-8, err


def test_rom_fh_3d_matches_full_order():
    """make_fh_fun_rom on a 3-D hex8 box (ndm-generic probe layout) against
    the full-order fh, values and theta-gradients."""
    import dataclasses

    from vbicm_tpu.config import ProblemConfig, SectionCard
    from vbicm_tpu.mesh.solid3d import beam_hex8_mesh
    from vbicm_tpu.rom import build_reduced_basis, make_fh_fun_rom
    from vbicm_tpu.solver import make_fh_fun

    model = build_fem_model(
        beam_hex8_mesh(4, 2, 2), SectionCard(stype=4), dense=True
    )
    cfg = dataclasses.replace(
        ProblemConfig(), y_dim=3, node_id=model.nnodes, ele_id=8,
        nipt_id=(1, 5),
    )
    # 3-D floor: the greedy stagnates ~3e-11 relative (true-residual floor
    # on this model); tol below that must return the floor basis, not hang
    rb = build_reduced_basis(model, tol=1e-11)
    assert rb.max_rel_residual < 1e-9
    fh_rom = make_fh_fun_rom(model, rb, cfg)
    fh_full = make_fh_fun(model, cfg)
    thetas = jnp.asarray(np.random.default_rng(0).standard_normal((4, 2)))
    y_r, h_r = jax.vmap(fh_rom)(thetas)
    y_f, h_f = jax.vmap(fh_full)(thetas)
    assert y_r.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h_r), np.asarray(h_f), rtol=1e-6)

    def loss(fh):
        def f(t):
            y, h = jax.vmap(fh)(t)
            return jnp.sum(y**2) + jnp.sum(h)
        return f

    g_r = jax.grad(loss(fh_rom))(thetas)
    g_f = jax.grad(loss(fh_full))(thetas)
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g_f), rtol=1e-5)
