"""3-D structured-grid machinery: 27-point block stencil == assembled
operator, trilinear transfer exactness/adjointness, and the box two-level
solver vs the dense solve (values + gradients)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from vbicm_tpu.mesh.solid3d import beam_hex8_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.config import SectionCard
from vbicm_tpu.ops.multigrid import make_grid_transfer_nd
from vbicm_tpu.ops.stencil3d import make_stencil_part_matvec_3d
from vbicm_tpu.solver import make_solver, make_two_level_solver_box3d

NXC, NYC, NZC, R = 2, 1, 1, 2
NX, NY, NZ = NXC * R, NYC * R, NZC * R


def _models():
    sec = SectionCard(stype=4)
    fine = build_fem_model(beam_hex8_mesh(NX, NY, NZ), sec, dense=False)
    coarse = build_fem_model(beam_hex8_mesh(NXC, NYC, NZC), sec, dense=True)
    return fine, coarse


def _assembled_parts(model):
    lm = np.asarray(model.lm)
    Ks = []
    for ke in (np.asarray(model.ke_lam), np.asarray(model.ke_mu)):
        K = np.zeros((model.ndof, model.ndof))
        for e in range(lm.shape[0]):
            K[np.ix_(lm[e], lm[e])] += ke[e]
        Ks.append(K)
    return Ks


def test_stencil3d_equals_assembled_matvec():
    fine, _ = _models()
    pm, diag = make_stencil_part_matvec_3d(fine, NX, NY, NZ)
    K0, K1 = _assembled_parts(fine)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(fine.ndof))
    np.testing.assert_allclose(np.asarray(pm(0, x)), K0 @ np.asarray(x), atol=1e-11)
    np.testing.assert_allclose(np.asarray(pm(1, x)), K1 @ np.asarray(x), atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(diag), np.stack([np.diag(K0), np.diag(K1)]), atol=1e-12
    )
    # vmapped f32 batch
    xb = jnp.asarray(rng.standard_normal((3, fine.ndof)), jnp.float32)
    qb = jax.vmap(lambda v: pm(0, v))(xb)
    want = np.asarray(xb, np.float64) @ K0.T
    np.testing.assert_allclose(np.asarray(qb), want, rtol=3e-5, atol=1e-4)


def test_grid_transfer_3d_exact_on_trilinear_fields_and_adjoint():
    prolong, restrict = make_grid_transfer_nd((NZC, NYC, NXC), R, 3)

    # a multilinear nodal field is prolongated EXACTLY (FE embedding)
    def field(x, y, z):
        return np.stack([1 + 2 * x - y + 3 * z, x * 0.5 + z, y - z], axis=-1)

    def grid_nodes(nx, ny, nz):
        xs, ys, zs = (np.linspace(0, 1, n + 1) for n in (nx, ny, nz))
        Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
        return X, Y, Z

    Xc, Yc, Zc = grid_nodes(NXC, NYC, NZC)
    Xf, Yf, Zf = grid_nodes(NX, NY, NZ)
    u_c = jnp.asarray(field(Xc, Yc, Zc).reshape(-1))
    u_f = field(Xf, Yf, Zf).reshape(-1)
    np.testing.assert_allclose(np.asarray(prolong(u_c)), u_f, atol=1e-13)

    # exact adjointness
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(u_c.shape[0]))
    b = jnp.asarray(rng.standard_normal(u_f.shape[0]))
    np.testing.assert_allclose(
        float(jnp.vdot(prolong(a), b)), float(jnp.vdot(a, restrict(b))), rtol=1e-12
    )


@pytest.mark.slow
def test_two_level_box3d_matches_dense_solver():
    fine, coarse = _models()
    dense_fine = build_fem_model(
        beam_hex8_mesh(NX, NY, NZ), SectionCard(stype=4), dense=True
    )
    lam, mu = jnp.asarray(11.54), jnp.asarray(7.69)
    u_ref = make_solver(dense_fine)(lam, mu)
    s2l = make_two_level_solver_box3d(
        fine, coarse, (NXC, NYC, NZC), R,
        cg_dtype=jnp.float32, refine_iters=1, tol=1e-6, maxiter=600,
    )
    u = s2l(lam, mu)
    scale = float(jnp.max(jnp.abs(u_ref)))
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=3e-8 * scale)

    # gradients through the adjoint VJP
    def qoi(s):
        return jax.grad(lambda l, m: jnp.sum(s(l, m) ** 2), argnums=(0, 1))(lam, mu)

    g2l = qoi(s2l)
    gref = qoi(make_solver(dense_fine))
    for a, b in zip(g2l, gref):
        assert abs(float(a) - float(b)) < 1e-5 * max(1.0, abs(float(b)))

    # batched (vmap) solves agree with per-sample to the mixed-precision
    # floor (batched f32 einsums accumulate in a different order than the
    # unbatched lowering, so trajectories differ at the f32 level and the
    # refined answers at ~kappa * cg_tol^2)
    cs = jnp.stack([jnp.stack([lam, mu]), jnp.stack([lam * 1.2, mu * 0.8])])
    ub = jax.vmap(lambda c: s2l(c[0], c[1]))(cs)
    u1 = s2l(cs[1, 0], cs[1, 1])
    np.testing.assert_allclose(np.asarray(ub[1]), np.asarray(u1), atol=5e-8 * scale)


def test_pallas_3d_row_kernel_interpret_matches_assembled():
    """The batched-f32 production path (lane-interleaved 198-plane packing
    + (z, y) row kernel), in interpret mode against the assembled operator."""
    from vbicm_tpu.ops.stencil3d import build_stencil_tables_3d
    from vbicm_tpu.ops.stencil3d_pallas import (
        pack_w_interleaved_3d,
        stencil_affine_matvec_pallas_3d,
    )

    fine, _ = _models()
    W = build_stencil_tables_3d(fine, NX, NY, NZ)
    w_all = jnp.asarray(pack_w_interleaved_3d(W))
    K0, K1 = _assembled_parts(fine)
    rng = np.random.default_rng(3)
    B = 4
    u = jnp.asarray(rng.standard_normal((B, fine.ndof)), jnp.float32)
    c = jnp.asarray(rng.uniform(1.0, 3.0, (B, 2)), jnp.float32)
    q = stencil_affine_matvec_pallas_3d(
        w_all, c, u, NZ=NZ + 1, NY=NY + 1, NX=NX + 1, interpret=True
    )
    want = np.stack(
        [
            np.asarray(c[b, 0]) * (K0 @ np.asarray(u[b], np.float64))
            + np.asarray(c[b, 1]) * (K1 @ np.asarray(u[b], np.float64))
            for b in range(B)
        ]
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(q), want, atol=3e-6 * scale)


def test_affine_matvec_3d_custom_vmap_dispatch():
    """The custom_vmap wrapper: unbatched == reference; batched f64 falls
    back to the XLA path (Pallas disabled off-TPU)."""
    from vbicm_tpu.ops.stencil3d import make_stencil_affine_matvec_3d

    fine, _ = _models()
    affine, pm, diag = make_stencil_affine_matvec_3d(fine, NX, NY, NZ)
    K0, K1 = _assembled_parts(fine)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal(fine.ndof))
    cs = jnp.asarray([1.5, 0.7])
    want = 1.5 * (K0 @ np.asarray(u)) + 0.7 * (K1 @ np.asarray(u))
    np.testing.assert_allclose(np.asarray(affine(cs, u)), want, atol=1e-10)
    ub = jnp.asarray(rng.standard_normal((3, fine.ndof)))
    cb = jnp.broadcast_to(cs, (3, 2))
    got = jax.vmap(affine)(cb, ub)
    want_b = 1.5 * np.asarray(ub) @ K0.T + 0.7 * np.asarray(ub) @ K1.T
    np.testing.assert_allclose(np.asarray(got), want_b, atol=1e-10)


def test_compensated_residual_3d_f64_grade():
    """The n-D compensated residual on the 27-point hex8 stencil."""
    from vbicm_tpu.ops.stencil3d import build_stencil_tables_3d, make_stencil_part_matvec_3d
    from vbicm_tpu.ops.stencil_compensated import make_compensated_residual_3d

    fine, _ = _models()
    W = build_stencil_tables_3d(fine, NX, NY, NZ)
    pm, _ = make_stencil_part_matvec_3d(fine, NX, NY, NZ, W=W)
    res_c = make_compensated_residual_3d(fine, NX, NY, NZ, W=W)
    rng = np.random.default_rng(7)
    mask = fine.free_mask
    coeffs = jnp.asarray([11.53, 7.69])
    x = jnp.asarray(rng.standard_normal(fine.ndof))
    b = jnp.asarray(rng.standard_normal(fine.ndof))
    q64 = coeffs[0] * pm(0, x * mask) + coeffs[1] * pm(1, x * mask)
    r64 = (b - q64) * mask
    r = res_c(coeffs, b, x)
    scale = float(jnp.max(jnp.abs(q64)))
    np.testing.assert_allclose(np.asarray(r), np.asarray(r64), atol=1e-12 * scale)


@pytest.mark.slow
def test_box3d_solver_compensated_refinement():
    from vbicm_tpu.solver import make_two_level_solver_box3d

    fine, coarse = _models()
    s_ref = make_two_level_solver_box3d(
        fine, coarse, (NXC, NYC, NZC), R, tol=1e-12, maxiter=2000
    )
    s_c = make_two_level_solver_box3d(
        fine, coarse, (NXC, NYC, NZC), R, cg_dtype=jnp.float32,
        refine_iters=2, tol=1e-5, maxiter=400,
        refine_residual="compensated",
    )
    lam, mu = jnp.asarray(11.54), jnp.asarray(7.69)
    u_ref = np.asarray(s_ref(lam, mu))
    u_c = np.asarray(s_c(lam, mu))
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(u_c, u_ref, atol=1e-9 * scale)


@pytest.mark.slow
def test_box3d_solver_vcycle_matches():
    from vbicm_tpu.solver import make_two_level_solver_box3d

    fine, coarse = _models()
    s_ref = make_two_level_solver_box3d(
        fine, coarse, (NXC, NYC, NZC), R, tol=1e-12, maxiter=2000
    )
    s_v = make_two_level_solver_box3d(
        fine, coarse, (NXC, NYC, NZC), R, cg_dtype=jnp.float32,
        refine_iters=2, tol=1e-5, maxiter=200,
        refine_residual="compensated", cycle="vcycle",
    )
    lam, mu = jnp.asarray(11.54), jnp.asarray(7.69)
    u_ref = np.asarray(s_ref(lam, mu))
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(np.asarray(s_v(lam, mu)), u_ref, atol=1e-9 * scale)
