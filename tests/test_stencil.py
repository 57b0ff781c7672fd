"""Structured-grid stencil matvec: exact equality with the assembled
operator, and the two-level solver with/without it."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.stencil import build_stencil_tables, make_stencil_part_matvec
from vbicm_tpu.solver import make_two_level_solver

NX, NY = 8, 4


def _assembled_parts(model):
    lm = np.asarray(model.lm)
    Ks = []
    for ke in (np.asarray(model.ke_lam), np.asarray(model.ke_mu)):
        K = np.zeros((model.ndof, model.ndof))
        for e in range(lm.shape[0]):
            K[np.ix_(lm[e], lm[e])] += ke[e]
        Ks.append(K)
    return Ks


def test_stencil_equals_assembled_matvec():
    model = build_fem_model(cooks_membrane_mesh(NX, NY), dense=False)
    pm, diag = make_stencil_part_matvec(model, NX, NY)
    K0, K1 = _assembled_parts(model)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(model.ndof))
    np.testing.assert_allclose(np.asarray(pm(0, x)), K0 @ np.asarray(x), atol=1e-11)
    np.testing.assert_allclose(np.asarray(pm(1, x)), K1 @ np.asarray(x), atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(diag), np.stack([np.diag(K0), np.diag(K1)]), atol=1e-12
    )
    # f32 dispatch path
    x32 = x.astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(pm(0, x32)), (K0 @ np.asarray(x)).astype(np.float32), rtol=2e-5
    )
    # vmapped over a batch
    xb = jnp.asarray(rng.standard_normal((5, model.ndof)))
    qb = jax.vmap(lambda v: pm(1, v))(xb)
    np.testing.assert_allclose(np.asarray(qb), np.asarray(xb) @ K1.T, atol=1e-11)


def test_pallas_row_kernel_interpret_matches_assembled():
    """The production batched-f32 path (lane-interleaved 42-plane packing +
    row kernel), in interpret mode against the assembled operator."""
    from vbicm_tpu.ops.stencil import build_stencil_tables
    from vbicm_tpu.ops.stencil_pallas import (
        pack_w_interleaved,
        stencil_affine_matvec_pallas,
    )

    model = build_fem_model(cooks_membrane_mesh(NX, NY), dense=False)
    W = build_stencil_tables(model, NX, NY)
    w_all = jnp.asarray(pack_w_interleaved(W))
    K0, K1 = _assembled_parts(model)
    rng = np.random.default_rng(2)
    B = 4
    u = jnp.asarray(rng.standard_normal((B, model.ndof)), jnp.float32)
    c = jnp.asarray(rng.uniform(1.0, 3.0, (B, 2)), jnp.float32)
    q = stencil_affine_matvec_pallas(
        w_all, c, u, NY=NY + 1, NX=NX + 1, interpret=True
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


def test_pallas_multirow_kernel_bit_matches_one_row():
    """The opt-in multi-row (manually double-buffered DMA) variant must be
    bit-identical to the production one-row kernel, including when
    rows_per_program does not divide NY+1 (tail-row padding)."""
    from vbicm_tpu.ops.stencil import build_stencil_tables
    from vbicm_tpu.ops.stencil_pallas import (
        pack_w_interleaved,
        stencil_affine_matvec_pallas,
        stencil_affine_matvec_pallas_mr,
    )

    model = build_fem_model(cooks_membrane_mesh(NX, NY), dense=False)
    W = build_stencil_tables(model, NX, NY)
    w_all = jnp.asarray(pack_w_interleaved(W))
    rng = np.random.default_rng(3)
    B = 4
    u = jnp.asarray(rng.standard_normal((B, model.ndof)), jnp.float32)
    c = jnp.asarray(rng.uniform(1.0, 3.0, (B, 2)), jnp.float32)
    q0 = stencil_affine_matvec_pallas(
        w_all, c, u, NY=NY + 1, NX=NX + 1, interpret=True
    )
    for rpp in (3, 4):  # NY+1 = 5: neither divides -> exercises padding
        q1 = stencil_affine_matvec_pallas_mr(
            w_all, c, u, NY=NY + 1, NX=NX + 1, rows_per_program=rpp,
            interpret=True,
        )
        assert float(jnp.max(jnp.abs(q0 - q1))) == 0.0


def test_grid_transfer_equals_gather_transfers():
    from vbicm_tpu.ops.multigrid import (
        cooks_prolongation,
        make_grid_transfer,
        make_two_level_preconditioner,
    )

    nxc, nyc, ratio = 4, 2, 2
    model = build_fem_model(cooks_membrane_mesh(nxc * ratio, nyc * ratio), dense=False)
    idx, w = cooks_prolongation(nxc, nyc, ratio)
    _, p_ref, r_ref = make_two_level_preconditioner(
        idx, w, lambda c, r: r, model.free_mask
    )
    p_g, r_g = make_grid_transfer(nxc, nyc, ratio)
    rng = np.random.default_rng(1)
    n_c = 2 * (nxc + 1) * (nyc + 1)
    u_c = jnp.asarray(rng.standard_normal(n_c))
    np.testing.assert_allclose(np.asarray(p_g(u_c)), np.asarray(p_ref(u_c)), atol=1e-13)
    r_f = jnp.asarray(rng.standard_normal(model.ndof))
    np.testing.assert_allclose(np.asarray(r_g(r_f)), np.asarray(r_ref(r_f)), atol=1e-13)
    # f32 + vmapped dispatch
    ub = jnp.asarray(rng.standard_normal((3, n_c)), jnp.float32)
    got = jax.vmap(p_g)(ub)
    want = jnp.stack([p_ref(ub[i].astype(jnp.float64)) for i in range(3)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)
    # ratio 4 adjointness
    p4, r4 = make_grid_transfer(3, 2, 4)
    uc = jnp.asarray(rng.standard_normal(2 * 4 * 3))
    vf = jnp.asarray(rng.standard_normal(2 * 13 * 9))
    np.testing.assert_allclose(
        float(jnp.vdot(p4(uc), vf)), float(jnp.vdot(uc, r4(vf))), rtol=1e-12
    )


def test_compensated_residual_f64_grade():
    """Dekker/TwoSum residual from pure-f32 ops lands ~1e-14 relative —
    seven decades below the split_f32 mode it supersedes."""
    from vbicm_tpu.ops.stencil import build_stencil_tables, make_stencil_part_matvec
    from vbicm_tpu.ops.stencil_compensated import make_compensated_residual

    nx, ny = 16, 8
    model = build_fem_model(cooks_membrane_mesh(nx, ny), dense=False)
    W = build_stencil_tables(model, nx, ny)
    pm, _ = make_stencil_part_matvec(model, nx, ny, W=W)
    res_c = make_compensated_residual(model, nx, ny, W=W)
    rng = np.random.default_rng(3)
    mask = model.free_mask
    coeffs = jnp.asarray([11.53, 7.69])
    x = jnp.asarray(rng.standard_normal(model.ndof))
    b = jnp.asarray(rng.standard_normal(model.ndof))
    q64 = coeffs[0] * pm(0, x * mask) + coeffs[1] * pm(1, x * mask)
    r64 = (b - q64) * mask
    r = res_c(coeffs, b, x)
    scale = float(jnp.max(jnp.abs(q64)))
    np.testing.assert_allclose(np.asarray(r), np.asarray(r64), atol=1e-12 * scale)
    # vmapped
    B = 3
    X = jnp.asarray(rng.standard_normal((B, model.ndof)))
    Bv = jnp.asarray(rng.standard_normal((B, model.ndof)))
    Cc = jnp.asarray(np.abs(rng.standard_normal((B, 2))) + 5)
    rb = jax.vmap(res_c)(Cc, Bv, X)
    want = jnp.stack([
        (Bv[i] - (Cc[i, 0] * pm(0, X[i] * mask) + Cc[i, 1] * pm(1, X[i] * mask))) * mask
        for i in range(B)
    ])
    np.testing.assert_allclose(np.asarray(rb), np.asarray(want), atol=1e-12 * scale)


def test_two_level_solver_compensated_refinement():
    """cg_dtype=f32 + compensated refinement matches the f64 solve."""
    nxc, nyc, ratio = NX // 2, NY // 2, 2
    model = build_fem_model(cooks_membrane_mesh(NX, NY), dense=False)
    coarse = build_fem_model(cooks_membrane_mesh(nxc, nyc), dense=True)
    s_ref = make_two_level_solver(model, coarse, nxc, nyc, ratio,
                                  tol=1e-12, maxiter=2000, use_stencil=True)
    s_c = make_two_level_solver(
        model, coarse, nxc, nyc, ratio, cg_dtype=jnp.float32,
        refine_iters=2, tol=1e-5, maxiter=400, use_stencil=True,
        refine_residual="compensated",
    )
    lam, mu = jnp.asarray(11.54), jnp.asarray(7.69)
    u_ref = np.asarray(s_ref(lam, mu))
    u_c = np.asarray(s_c(lam, mu))
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(u_c, u_ref, atol=1e-9 * scale)


@pytest.mark.slow
def test_two_level_solver_vcycle_matches_f64():
    """Multiplicative V(1,1) cycle: same answer, SPD-safe under vmap."""
    nxc, nyc, ratio = NX // 2, NY // 2, 2
    model = build_fem_model(cooks_membrane_mesh(NX, NY), dense=False)
    coarse = build_fem_model(cooks_membrane_mesh(nxc, nyc), dense=True)
    s_ref = make_two_level_solver(model, coarse, nxc, nyc, ratio,
                                  tol=1e-12, maxiter=2000, use_stencil=True)
    s_v = make_two_level_solver(
        model, coarse, nxc, nyc, ratio, cg_dtype=jnp.float32,
        refine_iters=2, tol=1e-5, maxiter=200, use_stencil=True,
        refine_residual="compensated", cycle="vcycle",
    )
    lam, mu = jnp.asarray(11.54), jnp.asarray(7.69)
    u_ref = np.asarray(s_ref(lam, mu))
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(np.asarray(s_v(lam, mu)), u_ref, atol=1e-9 * scale)
    # batched
    lams = jnp.asarray([8.0, 11.54, 15.0])
    mus = jnp.asarray([5.0, 7.69, 9.0])
    ub = np.asarray(jax.vmap(s_v)(lams, mus))
    for i in range(3):
        ui = np.asarray(s_ref(lams[i], mus[i]))
        np.testing.assert_allclose(ub[i], ui, atol=1e-8 * np.abs(ui).max())


@pytest.mark.slow
def test_batched_two_level_solver_matches_vmapped():
    """The natively-batched two-level CG (scalar alpha/beta freezing,
    z-eliminated preconditioner fold) against the vmapped production
    solver, values and gradients."""
    from vbicm_tpu.solver import make_two_level_solver_batched

    nxc, nyc, ratio = NX // 2, NY // 2, 2
    model = build_fem_model(cooks_membrane_mesh(NX, NY), dense=False)
    coarse = build_fem_model(cooks_membrane_mesh(nxc, nyc), dense=True)
    s_ref = make_two_level_solver(model, coarse, nxc, nyc, ratio,
                                  tol=1e-12, maxiter=2000, use_stencil=True)
    for rr in ("compensated", "f64"):
        s_b = make_two_level_solver_batched(
            model, coarse, nxc, nyc, ratio, refine_iters=2, tol=1e-5,
            maxiter=400, refine_residual=rr,
        )
        # spread of conditioning so lanes converge at different iterations
        lams = jnp.asarray([8.0, 11.54, 15.0, 30.0])
        mus = jnp.asarray([5.0, 7.69, 9.0, 3.0])
        ub = np.asarray(s_b(lams, mus))
        for i in range(4):
            ui = np.asarray(s_ref(lams[i], mus[i]))
            np.testing.assert_allclose(
                ub[i], ui, atol=2e-9 * np.abs(ui).max(), err_msg=rr
            )

    # adjoint: gradient of a probe functional vs the vmapped solver's
    s_b = make_two_level_solver_batched(
        model, coarse, nxc, nyc, ratio, refine_iters=2, tol=1e-5,
        maxiter=400, refine_residual="compensated",
    )
    wvec = jnp.asarray(np.random.default_rng(7).standard_normal(model.ndof))

    def loss_b(lams, mus):
        return jnp.sum(jnp.sin(s_b(lams, mus) @ wvec))

    def loss_r(lams, mus):
        u = jax.vmap(s_ref)(lams, mus)
        return jnp.sum(jnp.sin(u @ wvec))

    lams = jnp.asarray([11.54, 9.0])
    mus = jnp.asarray([7.69, 6.0])
    gb = jax.grad(loss_b, argnums=(0, 1))(lams, mus)
    gr = jax.grad(loss_r, argnums=(0, 1))(lams, mus)
    for a, b in zip(gb, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.slow
def test_fh_fun_batched_matches_vmapped_fh():
    """make_fh_fun_batched over the batched solver == vmap(make_fh_fun)
    over the vmapped solver, values and theta-gradients."""
    from vbicm_tpu.config import ProblemConfig
    from vbicm_tpu.solver import (
        make_fh_fun,
        make_fh_fun_batched,
        make_two_level_solver_batched,
    )

    nxc, nyc, ratio = NX // 2, NY // 2, 2
    model = build_fem_model(cooks_membrane_mesh(NX, NY), dense=False)
    coarse = build_fem_model(cooks_membrane_mesh(nxc, nyc), dense=True)
    cfg = ProblemConfig(node_id=model.nnodes, ele_id=7)
    s_ref = make_two_level_solver(model, coarse, nxc, nyc, ratio,
                                  tol=1e-12, maxiter=2000, use_stencil=True)
    fh_ref = jax.vmap(make_fh_fun(model, cfg, solve_free=s_ref))
    s_b = make_two_level_solver_batched(
        model, coarse, nxc, nyc, ratio, refine_iters=2, tol=1e-5, maxiter=400,
    )
    fh_b = make_fh_fun_batched(model, s_b, cfg)
    thetas = jnp.asarray(np.random.default_rng(5).standard_normal((3, 2)))
    y0, h0 = fh_ref(thetas)
    y1, h1 = fh_b(thetas)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=1e-8)
    g0 = jax.grad(lambda t: jnp.sum(fh_ref(t)[0] ** 2) + jnp.sum(fh_ref(t)[1]))(thetas)
    g1 = jax.grad(lambda t: jnp.sum(fh_b(t)[0] ** 2) + jnp.sum(fh_b(t)[1]))(thetas)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-6)


def test_conv_transfer_equals_reshape_transfers():
    from vbicm_tpu.ops.multigrid import make_grid_transfer, make_grid_transfer_conv

    rng = np.random.default_rng(2)
    for nxc, nyc, ratio in [(5, 3, 2), (4, 2, 4)]:
        p0, r0 = make_grid_transfer(nxc, nyc, ratio)
        p1, r1 = make_grid_transfer_conv(nxc, nyc, ratio)
        n_c = 2 * (nxc + 1) * (nyc + 1)
        n_f = 2 * (nxc * ratio + 1) * (nyc * ratio + 1)
        u_c = jnp.asarray(rng.standard_normal(n_c))
        r_f = jnp.asarray(rng.standard_normal(n_f))
        np.testing.assert_allclose(np.asarray(p1(u_c)), np.asarray(p0(u_c)), atol=1e-13)
        np.testing.assert_allclose(np.asarray(r1(r_f)), np.asarray(r0(r_f)), atol=1e-13)
        # the conv pair is exactly adjoint
        np.testing.assert_allclose(
            float(jnp.vdot(p1(u_c), r_f)), float(jnp.vdot(u_c, r1(r_f))), rtol=1e-12
        )
        # f32 + vmap dispatch
        ub = jnp.asarray(rng.standard_normal((3, n_c)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(jax.vmap(p1)(ub)), np.asarray(jax.vmap(p0)(ub)),
            rtol=1e-5, atol=1e-6,
        )


@pytest.mark.slow
def test_two_level_stencil_solver_matches_element_path():
    nxc, nyc, ratio = NX // 2, NY // 2, 2
    model = build_fem_model(cooks_membrane_mesh(NX, NY), dense=False)
    coarse = build_fem_model(cooks_membrane_mesh(nxc, nyc), dense=True)
    kw = dict(cg_dtype=jnp.float32, refine_iters=1, tol=1e-6, maxiter=400)
    s_el = make_two_level_solver(model, coarse, nxc, nyc, ratio, **kw)
    s_st = make_two_level_solver(model, coarse, nxc, nyc, ratio, use_stencil=True, **kw)
    lam, mu = jnp.asarray(11.54), jnp.asarray(7.69)
    u_el = np.asarray(s_el(lam, mu))
    u_st = np.asarray(s_st(lam, mu))
    scale = np.abs(u_el).max()
    np.testing.assert_allclose(u_st, u_el, atol=1e-8 * scale)

    # gradients agree too (the adjoint cotangents run through the stencil)
    def qoi(s):
        def f(l, m):
            return jnp.sum(s(l, m) ** 2)

        return jax.grad(f, argnums=(0, 1))(lam, mu)

    g_el = qoi(s_el)
    g_st = qoi(s_st)
    for a, b in zip(g_el, g_st):
        assert abs(float(a) - float(b)) < 1e-5 * max(1.0, abs(float(a)))

    # split-f32 refinement-residual speed mode: kappa-limited accuracy
    s_sp = make_two_level_solver(
        model, coarse, nxc, nyc, ratio, use_stencil=True,
        refine_residual="split_f32", **kw
    )
    u_sp = np.asarray(s_sp(lam, mu))
    assert np.max(np.abs(u_sp - u_el)) < 1e-4 * scale


@pytest.mark.slow
def test_three_level_solver_matches_dense():
    """Three-level telescope (fine Jacobi + mid Jacobi + spectral coarse):
    values + gradients vs the dense solver, and the mixed-precision batched
    path."""
    import jax.numpy as jnp

    from vbicm_tpu.solver import make_solver, make_three_level_solver

    nxc, nyc, r_mc, r_fm = 4, 2, 2, 2  # 4x2 -> 8x4 -> 16x8
    fine = build_fem_model(cooks_membrane_mesh(16, 8), dense=False)
    mid = build_fem_model(cooks_membrane_mesh(8, 4), dense=False)
    coarse = build_fem_model(cooks_membrane_mesh(4, 2), dense=True)
    dense_fine = build_fem_model(cooks_membrane_mesh(16, 8), dense=True)

    lam, mu = jnp.asarray(11.54), jnp.asarray(7.69)
    u_ref = make_solver(dense_fine)(lam, mu)
    scale = float(jnp.max(jnp.abs(u_ref)))

    s3 = make_three_level_solver(
        fine, mid, coarse, nxc, nyc, r_mc, r_fm, tol=1e-11, maxiter=2000,
    )
    u3 = s3(lam, mu)
    np.testing.assert_allclose(np.asarray(u3), np.asarray(u_ref), atol=1e-8 * scale)

    # gradients through the adjoint VJP
    def qoi(s):
        return jax.grad(lambda l, m: jnp.sum(s(l, m) ** 2), argnums=(0, 1))(lam, mu)

    g3 = qoi(s3)
    gref = qoi(make_solver(dense_fine))
    for a, b in zip(g3, gref):
        assert abs(float(a) - float(b)) < 1e-5 * max(1.0, abs(float(b)))

    # mixed-precision batched path
    s3m = make_three_level_solver(
        fine, mid, coarse, nxc, nyc, r_mc, r_fm,
        cg_dtype=jnp.float32, refine_iters=1, tol=1e-5, maxiter=1500,
    )
    cs = jnp.stack([jnp.stack([lam, mu]), jnp.stack([lam * 1.2, mu * 0.8])])
    ub = jax.vmap(lambda c: s3m(c[0], c[1]))(cs)
    np.testing.assert_allclose(np.asarray(ub[0]), np.asarray(u_ref), atol=5e-7 * scale)


def test_matmul_transfer_equals_conv_transfers():
    """Tensor-product MXU-matmul transfers == conv transfers (2-D and N-D),
    including exact adjointness and the f32 vmapped dispatch."""
    from vbicm_tpu.ops.multigrid import (
        make_grid_transfer_conv,
        make_grid_transfer_matmul,
        make_grid_transfer_matmul_nd,
        make_grid_transfer_nd,
    )

    rng = np.random.default_rng(3)
    for nxc, nyc, ratio in [(5, 3, 2), (4, 2, 4)]:
        p0, r0 = make_grid_transfer_conv(nxc, nyc, ratio)
        p1, r1 = make_grid_transfer_matmul(nxc, nyc, ratio)
        n_c = 2 * (nxc + 1) * (nyc + 1)
        n_f = 2 * (nxc * ratio + 1) * (nyc * ratio + 1)
        u_c = jnp.asarray(rng.standard_normal(n_c))
        r_f = jnp.asarray(rng.standard_normal(n_f))
        np.testing.assert_allclose(np.asarray(p1(u_c)), np.asarray(p0(u_c)), atol=1e-13)
        np.testing.assert_allclose(np.asarray(r1(r_f)), np.asarray(r0(r_f)), atol=1e-13)
        np.testing.assert_allclose(
            float(jnp.vdot(p1(u_c), r_f)), float(jnp.vdot(u_c, r1(r_f))), rtol=1e-12
        )
        ub = jnp.asarray(rng.standard_normal((3, n_c)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(jax.vmap(p1)(ub)), np.asarray(jax.vmap(p0)(ub)),
            rtol=1e-5, atol=1e-6,
        )
    # 3-D
    cells, ratio, nd = (4, 3, 5), 2, 3
    pn, rn = make_grid_transfer_nd(cells, ratio, nd)
    pm, rm = make_grid_transfer_matmul_nd(cells, ratio, nd)
    n_c = nd * int(np.prod([c + 1 for c in cells]))
    n_f = nd * int(np.prod([c * ratio + 1 for c in cells]))
    uc = jnp.asarray(rng.standard_normal((2, n_c)))
    uf = jnp.asarray(rng.standard_normal((2, n_f)))
    np.testing.assert_allclose(
        np.asarray(jax.vmap(pm)(uc)), np.asarray(jax.vmap(pn)(uc)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(jax.vmap(rm)(uf)), np.asarray(jax.vmap(rn)(uf)), atol=1e-12
    )


@pytest.mark.slow
def test_dense_coarse_correction_and_solver_path():
    """The folded two-matmul coarse correction == restrict -> spectral
    coarse solve -> prolong, and the transfer='dense' solver matches."""
    from vbicm_tpu.ops.multigrid import (
        make_dense_coarse_correction,
        make_grid_transfer_conv,
    )
    from vbicm_tpu.solver import make_coarse_spectral_apply

    nx, ny, r = 16, 8, 4
    model = build_fem_model(cooks_membrane_mesh(nx, ny), dense=False)
    coarse = build_fem_model(cooks_membrane_mesh(nx // r, ny // r), dense=True)
    corr = make_dense_coarse_correction(coarse, nx // r, ny // r, r, model.free_mask)
    ca = make_coarse_spectral_apply(coarse)
    pl_, rs_ = make_grid_transfer_conv(nx // r, ny // r, r)
    rng = np.random.default_rng(4)
    mask = jnp.asarray(model.free_mask, jnp.float32)
    rv = jnp.asarray(rng.standard_normal(model.ndof), jnp.float32) * mask
    coeffs = jnp.asarray([11.5, 7.7])
    z1 = corr(coeffs, rv)
    z2 = pl_(ca(coeffs, rs_(rv))) * mask
    scale = float(jnp.max(jnp.abs(z2)))
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=2e-4 * scale)

    kw = dict(cg_dtype=jnp.float32, refine_iters=1, tol=1e-4, maxiter=400,
              use_stencil=True, refine_residual="compensated")
    s_conv = make_two_level_solver(model, coarse, nx // r, ny // r, r,
                                   transfer="conv", **kw)
    s_dense = make_two_level_solver(model, coarse, nx // r, ny // r, r,
                                    transfer="dense", **kw)
    lam = jnp.asarray(rng.uniform(8, 16, 3))
    mu = jnp.asarray(rng.uniform(5, 10, 3))
    u1 = jax.vmap(s_conv)(lam, mu)
    u2 = jax.vmap(s_dense)(lam, mu)
    scale = float(jnp.max(jnp.abs(u1)))
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=1e-4 * scale)

    # gradients survive the dense-correction preconditioner (adjoint re-solve)
    g1 = jax.grad(lambda l, m: jnp.sum(s_dense(l, m) ** 2), argnums=(0, 1))(
        lam[0], mu[0])
    g0 = jax.grad(lambda l, m: jnp.sum(s_conv(l, m) ** 2), argnums=(0, 1))(
        lam[0], mu[0])
    for a, b in zip(g1, g0):
        assert abs(float(a) - float(b)) < 1e-3 * max(1.0, abs(float(b)))


@pytest.mark.slow
def test_two_step_training_through_fh_batch():
    """TwoStepTrainer(fh_batch=...) — the full two-step fit through the
    natively-batched solver, against the same fit through vmap(fh) over the
    vmapped production solver (identical ELBO math, same keys)."""
    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.prob.datagen import generate_data_fem
    from vbicm_tpu.solver import (
        make_fh_fun,
        make_fh_fun_batched,
        make_two_level_solver_batched,
    )
    from vbicm_tpu.vi.train import TwoStepTrainer

    nxc, nyc, ratio = NX // 2, NY // 2, 2
    model = build_fem_model(cooks_membrane_mesh(NX, NY), dense=False)
    coarse = build_fem_model(cooks_membrane_mesh(nxc, nyc), dense=True)
    cfg = ProblemConfig(node_id=model.nnodes, ele_id=7)
    s_ref = make_two_level_solver(model, coarse, nxc, nyc, ratio,
                                  tol=1e-12, maxiter=2000, use_stencil=True)
    fh = make_fh_fun(model, cfg, solve_free=s_ref)
    s_b = make_two_level_solver_batched(
        model, coarse, nxc, nyc, ratio, refine_iters=2, tol=1e-6, maxiter=600,
    )
    fh_b = make_fh_fun_batched(model, s_b, cfg)

    ds = generate_data_fem(
        jax.random.PRNGKey(0), jax.jit(fh_b), n_sam=64, ne_sam=2,
        sig_e=cfg.sig_e, sig_eta=cfg.sig_eta,
    )
    tcfg = TrainConfig(batch_size=32, num_epoch1=2, num_epoch2=2)
    res_b = TwoStepTrainer(None, cfg, tcfg, fh_batch=fh_b).fit(
        ds.y_data, ds.e_data, jax.random.PRNGKey(1)
    )
    res_v = TwoStepTrainer(None, cfg, tcfg, fh=fh).fit(
        ds.y_data, ds.e_data, jax.random.PRNGKey(1)
    )
    assert np.isfinite(res_b.hist_step1).all() and np.isfinite(res_b.hist_step2).all()
    # same keys + same math -> the loss trajectories agree to solver accuracy
    np.testing.assert_allclose(
        np.asarray(res_b.hist_step1), np.asarray(res_v.hist_step1), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res_b.hist_step2), np.asarray(res_v.hist_step2), rtol=1e-4
    )


def test_chunked_batch_call_covers_remainder():
    """Non-multiple batches run the kernel path for EVERY lane: full
    max_b chunks + one remainder call (review fix — the old rule fell back
    to the slow path for the whole batch)."""
    import jax
    import jax.numpy as jnp
    from vbicm_tpu.ops.stencil import chunked_batch_call

    calls = []

    def fake_kernel(c, u):
        calls.append(u.shape[0])
        return c[:, :1] * u

    c = jnp.arange(22.0).reshape(11, 2)
    u = jnp.arange(33.0).reshape(11, 3)
    out = chunked_batch_call(fake_kernel, c, u, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(c[:, :1] * u))
    # two traced shapes: the max_b chunk (lax.map traces once) + remainder
    assert 4 in calls and 3 in calls
    calls.clear()
    out = chunked_batch_call(fake_kernel, c[:8], u[:8], 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(c[:8, :1] * u[:8]))
    assert 3 not in calls
