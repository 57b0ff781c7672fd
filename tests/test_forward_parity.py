"""Golden end-to-end parity vs the reference NumPy solver.

Fixture ``tests/fixtures/reference_golden.json`` was produced by running the
reference implementation (scipy sparse path, ``fem_test.py`` pipeline) at
several (E, nu) points including the theta-map cases. Target: displacements
and stresses to <= 1e-6 (BASELINE.md 'Forward parity'); we assert much
tighter since both sides are float64.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import MaterialCard, ProblemConfig
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.solver import fea_solution, make_fh_fun, make_solver, probe_von_mises


@pytest.fixture(scope="module")
def solutions(cooks_model, golden):
    sols = []
    for case in golden:
        mat = MaterialCard(E=case["E"], v=case["v"])
        sols.append((case, fea_solution(cooks_model, mat)))
    return sols


@pytest.mark.tpu_lane
def test_displacement_parity(solutions):
    for case, sol in solutions:
        u = np.asarray(sol.u)
        np.testing.assert_allclose(u[460:462], case["u_node231"], rtol=0, atol=1e-9)
        np.testing.assert_allclose(u[:12], case["u_head"], atol=1e-9)
        np.testing.assert_allclose(u[-12:], case["u_tail"], atol=1e-9)
        np.testing.assert_allclose(np.linalg.norm(u), case["u_norm"], rtol=1e-10)


@pytest.mark.tpu_lane
def test_stress_strain_parity(solutions):
    for case, sol in solutions:
        # golden stores (6, nqpt) for element 12 (0-based 11)
        np.testing.assert_allclose(
            np.asarray(sol.stress[11]).T, np.asarray(case["stress_e12"]), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(sol.strain[11]).T, np.asarray(case["strain_e12"]), atol=1e-9
        )


@pytest.mark.tpu_lane
def test_von_mises_probe_parity(cooks_model, solutions):
    from vbicm_tpu.ops.element import lame_from_Ev

    for case, sol in solutions:
        lam, mu = lame_from_Ev(case["E"], case["v"])
        vm = probe_von_mises(cooks_model, sol.u, lam, mu, 12, np.array([1, 3]))
        np.testing.assert_allclose(np.asarray(vm), case["vm_e12_q13"], atol=1e-9)


@pytest.mark.tpu_lane
def test_fh_theta_map_parity(cooks_model, golden):
    """fh(theta) must hit the golden (y, h) for the theta-mapped cases."""
    fh = make_fh_fun(cooks_model, ProblemConfig())
    # cases 1..3 were generated from theta values via the exp/sigmoid map
    thetas = [(1.0, 1.0), (-0.5, 2.0), (2.0, -1.0)]
    for theta, case in zip(thetas, golden[1:]):
        y, h = fh(jnp.asarray(theta))
        np.testing.assert_allclose(np.asarray(y), case["u_node231"], atol=1e-9)
        np.testing.assert_allclose(np.asarray(h), case["vm_e12_q13"], atol=1e-9)


@pytest.mark.tpu_lane
def test_fh_vmap_batch(cooks_model):
    fh = make_fh_fun(cooks_model)
    thetas = jnp.asarray(np.random.default_rng(0).normal(size=(8, 2)))
    y, h = jax.jit(jax.vmap(fh))(thetas)
    assert y.shape == (8, 2) and h.shape == (8, 2)
    # batched result matches per-sample calls
    y0, h0 = fh(thetas[3])
    np.testing.assert_allclose(np.asarray(y[3]), np.asarray(y0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(h[3]), np.asarray(h0), atol=1e-12)


def test_reactions_balance_load(cooks_model):
    sol = fea_solution(cooks_model, MaterialCard())
    # sum of reactions must balance the applied load (50 in +y)
    ry = np.asarray(sol.reactions)[1::2].sum()
    rx = np.asarray(sol.reactions)[0::2].sum()
    np.testing.assert_allclose(ry, -50.0, atol=1e-8)
    np.testing.assert_allclose(rx, 0.0, atol=1e-8)


def test_grad_through_solve_vs_finite_differences(cooks_model):
    """BASELINE configs[1]: d(sigma_vm)/d(theta) through assembly + solve."""
    fh = make_fh_fun(cooks_model)

    def loss(theta):
        y, h = fh(theta)
        return jnp.sum(h) + jnp.sum(y)

    theta0 = jnp.array([0.3, -0.8])
    g = jax.grad(loss)(theta0)
    eps = 1e-5
    for i in range(2):
        tp = theta0.at[i].add(eps)
        tm = theta0.at[i].add(-eps)
        fd = (loss(tp) - loss(tm)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-5, atol=1e-8)


def test_matrix_free_cg_matches_dense(cooks_mesh):
    dense_model = build_fem_model(cooks_mesh, dense=True)
    mf_model = build_fem_model(cooks_mesh, dense=False)
    from vbicm_tpu.ops.element import lame_from_Ev

    lam, mu = lame_from_Ev(20.0, 0.3)
    u_dense = make_solver(dense_model)(jnp.asarray(lam), jnp.asarray(mu))
    u_mf = make_solver(mf_model, cg_tol=1e-14)(jnp.asarray(lam), jnp.asarray(mu))
    np.testing.assert_allclose(np.asarray(u_mf), np.asarray(u_dense), atol=1e-8)


def test_matrix_free_gradient(cooks_mesh):
    mf_model = build_fem_model(cooks_mesh, dense=False)
    fh = make_fh_fun(mf_model)

    def loss(theta):
        y, h = fh(theta)
        # note: h alone is invariant to the E-scale (stress of a linear
        # load-controlled problem), so include y for a non-degenerate check
        return jnp.sum(h) + jnp.sum(y)

    theta0 = jnp.array([0.1, 0.2])
    g = jax.grad(loss)(theta0)
    eps = 1e-5
    fd = (loss(theta0.at[0].add(eps)) - loss(theta0.at[0].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), float(fd), rtol=1e-4, atol=1e-8)


@pytest.mark.tpu_lane
def test_mixed_precision_refinement(cooks_model):
    """f32 factorization + refinement recovers f64-grade accuracy."""
    from vbicm_tpu.ops.element import lame_from_Ev

    lam, mu = lame_from_Ev(20.0, 0.3)
    u64 = make_solver(cooks_model)(jnp.asarray(lam), jnp.asarray(mu))
    u_mixed = make_solver(cooks_model, factor_dtype=jnp.float32, refine_iters=3)(
        jnp.asarray(lam), jnp.asarray(mu)
    )
    rel = np.linalg.norm(np.asarray(u_mixed - u64)) / np.linalg.norm(np.asarray(u64))
    assert rel < 1e-10, rel


def test_plane_stress_end_to_end(cooks_mesh):
    """stype=1 full path vs an independent scipy oracle with the textbook
    plane-stress constitutive matrix."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.ops import quadrature
    from vbicm_tpu.ops.shape import quad4_shape
    from vbicm_tpu.ops.element import bmatrix

    E, v = 20.0, 0.3
    model = build_fem_model(cooks_mesh, SectionCard(stype=1))
    sol = fea_solution(model, MaterialCard(E=E, v=v))

    # oracle: assemble with C_ps directly
    C = E / (1 - v**2) * np.array([[1, v, 0], [v, 1, 0], [0, 0, (1 - v) / 2]])
    qp, qw = quadrature.int2d(2)
    coords = np.asarray(model.coords)
    conn = np.asarray(model.conn)
    lm = np.asarray(model.lm)
    ndof = model.ndof
    K = np.zeros((ndof, ndof))
    for e in range(conn.shape[0]):
        xl = jnp.asarray(coords[conn[e]])
        ke = np.zeros((8, 8))
        for q in range(4):
            n, dn, detj = quad4_shape(qp[q, 0], qp[q, 1], xl)
            B = np.asarray(bmatrix(dn))
            ke += 10.0 * float(detj) * qw[q] * (B.T @ C @ B)
        K[np.ix_(lm[e], lm[e])] += ke
    free = np.asarray(model.free_dof)
    f = np.zeros(ndof)
    u_or = np.zeros(ndof)
    u_or[free] = np.linalg.solve(K[np.ix_(free, free)], np.asarray(model.f_free))

    np.testing.assert_allclose(np.asarray(sol.u), u_or, atol=1e-8)
    # stress: s33 must be 0, strain e33 = -v/(1-v)(e11+e22)
    np.testing.assert_allclose(np.asarray(sol.stress[..., 2]), 0.0, atol=1e-12)
    e33 = np.asarray(sol.strain[..., 2])
    expected = -v / (1 - v) * (np.asarray(sol.strain[..., 0]) + np.asarray(sol.strain[..., 1]))
    np.testing.assert_allclose(e33, expected, atol=1e-12)
    # differentiability through the plane-stress path
    from vbicm_tpu.solver import make_fh_fun

    fh = make_fh_fun(model)
    g = jax.grad(lambda t: jnp.sum(fh(t)[0]))(jnp.array([0.2, -0.3]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_mixed_precision_cg(cooks_mesh):
    """f32 CG + f64 refinement matches pure-f64 CG (the TPU scaled path)."""
    mf_model = build_fem_model(cooks_mesh, dense=False)
    from vbicm_tpu.ops.element import lame_from_Ev

    lam, mu = lame_from_Ev(20.0, 0.3)
    u64 = make_solver(mf_model, cg_tol=1e-13)(jnp.asarray(lam), jnp.asarray(mu))
    u_mixed = make_solver(
        mf_model, factor_dtype=jnp.float32, refine_iters=3, cg_tol=1e-6
    )(jnp.asarray(lam), jnp.asarray(mu))
    rel = np.linalg.norm(np.asarray(u_mixed - u64)) / np.linalg.norm(np.asarray(u64))
    assert rel < 1e-9, rel


@pytest.mark.slow
def test_quad9_end_to_end():
    """Biquadratic Cook's membrane: SPD system, consistent load, and the
    q9 solution at matched dof count is MORE accurate than q4 (classic
    p-refinement ordering), judged against a fine-q4 reference."""
    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.mesh import cooks_membrane_mesh, cooks_membrane_mesh_q9

    # fine quad4 reference solution (tip uy)
    fine = build_fem_model(cooks_membrane_mesh(64, 32), dense=True)
    sol_f = fea_solution(fine, MaterialCard())
    uy_ref = float(np.asarray(sol_f.u)[2 * (fine.nnodes - 1) + 1])

    # quad4 10x5 vs quad9 5x... matched NODE grid: q4 at 10x5 has 11x6
    # nodes; q9 at 5x... q9(5, 3) grid 11x7. Use q4 10x6 (11x7 nodes) vs
    # q9 (5, 3) — slightly favors neither
    m4 = build_fem_model(cooks_membrane_mesh(10, 6))
    s4 = fea_solution(m4, MaterialCard())
    uy4 = float(np.asarray(s4.u)[2 * (m4.nnodes - 1) + 1])

    m9 = build_fem_model(cooks_membrane_mesh_q9(5, 3), SectionCard(intp=3))
    s9 = fea_solution(m9, MaterialCard())
    uy9 = float(np.asarray(s9.u)[2 * (m9.nnodes - 1) + 1])

    # load balance holds for the consistent lumping too
    ry = np.asarray(s9.reactions)[1::2].sum()
    np.testing.assert_allclose(ry, -50.0, atol=1e-8)
    # q9 beats q4 at the same nodal resolution
    assert abs(uy9 - uy_ref) < abs(uy4 - uy_ref), (uy4, uy9, uy_ref)
    # and both converge to the same answer
    assert abs(uy9 - uy_ref) / abs(uy_ref) < 0.02


def test_quad9_differentiable():
    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.mesh import cooks_membrane_mesh_q9

    m9 = build_fem_model(cooks_membrane_mesh_q9(4, 2), SectionCard(intp=3))
    cfg = ProblemConfig(node_id=m9.nnodes, ele_id=3, nipt_id=(1, 3))
    fh = make_fh_fun(m9, cfg)
    g = jax.grad(lambda t: jnp.sum(fh(t)[0]) + jnp.sum(fh(t)[1]))(jnp.array([0.2, -0.1]))
    assert np.all(np.isfinite(np.asarray(g)))
    # E-scaling law still holds: d(sum y)/dtheta0 = -0.1 * sum y
    y, _ = fh(jnp.array([0.2, -0.1]))
    gy = jax.grad(lambda t: jnp.sum(fh(t)[0]))(jnp.array([0.2, -0.1]))
    np.testing.assert_allclose(float(gy[0]), -0.1 * float(jnp.sum(y)), rtol=1e-8)


@pytest.mark.slow
def test_quad8_end_to_end():
    """8-node serendipity elements: load balance and accuracy between q4
    and q9 at comparable resolution."""
    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.mesh import cooks_membrane_mesh, cooks_membrane_mesh_q8

    fine = build_fem_model(cooks_membrane_mesh(64, 32), dense=True)
    uy_ref = float(np.asarray(fea_solution(fine, MaterialCard()).u)[-1])

    m8 = build_fem_model(cooks_membrane_mesh_q8(5, 3), SectionCard(intp=3))
    s8 = fea_solution(m8, MaterialCard())
    # tip node = last node of the top row = the (gy, gx) grid point, which
    # is the last kept node in row-major order
    uy8 = float(np.asarray(s8.u)[-1])
    np.testing.assert_allclose(np.asarray(s8.reactions)[1::2].sum(), -50.0, atol=1e-8)
    assert abs(uy8 - uy_ref) / abs(uy_ref) < 0.03, (uy8, uy_ref)


@pytest.mark.slow
def test_quad16_end_to_end():
    """Bicubic Lagrange elements (reference ``shp2dc`` capability,
    src/fem_preprocess.py:973-1033): load balance, p-refinement accuracy
    ordering q16 > q9 > q4 at matched nodal resolution, differentiable."""
    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.mesh import (
        cooks_membrane_mesh,
        cooks_membrane_mesh_q9,
        cooks_membrane_mesh_q16,
    )

    fine = build_fem_model(cooks_membrane_mesh(64, 32), dense=True)
    uy_ref = float(np.asarray(fea_solution(fine, MaterialCard()).u)[-1])

    # matched 13x7 nodal grids: q4 12x6, q9 6x3, q16 4x2
    m4 = build_fem_model(cooks_membrane_mesh(12, 6))
    uy4 = float(np.asarray(fea_solution(m4, MaterialCard()).u)[-1])
    m9 = build_fem_model(cooks_membrane_mesh_q9(6, 3), SectionCard(intp=3))
    uy9 = float(np.asarray(fea_solution(m9, MaterialCard()).u)[-1])
    m16 = build_fem_model(cooks_membrane_mesh_q16(4, 2), SectionCard(intp=4))
    s16 = fea_solution(m16, MaterialCard())
    uy16 = float(np.asarray(s16.u)[-1])

    np.testing.assert_allclose(np.asarray(s16.reactions)[1::2].sum(), -50.0, atol=1e-8)
    e4, e9, e16 = (abs(u - uy_ref) for u in (uy4, uy9, uy16))
    assert e16 < e9 < e4, (uy4, uy9, uy16, uy_ref)
    assert e16 / abs(uy_ref) < 0.01, (uy16, uy_ref)

    # differentiable through the cubic element path
    cfg = ProblemConfig(node_id=m16.nnodes, ele_id=3, nipt_id=(1, 3))
    fh = make_fh_fun(m16, cfg)
    y, _ = fh(jnp.array([0.2, -0.1]))
    gy = jax.grad(lambda t: jnp.sum(fh(t)[0]))(jnp.array([0.2, -0.1]))
    np.testing.assert_allclose(float(gy[0]), -0.1 * float(jnp.sum(y)), rtol=1e-8)


@pytest.mark.slow
def test_quad12_end_to_end():
    """12-node cubic serendipity elements (reference ``shp2ds`` capability,
    src/fem_preprocess.py:1035-1120): load balance + close to the q16
    answer at the same mesh (serendipity drops only interior modes)."""
    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.mesh import (
        cooks_membrane_mesh,
        cooks_membrane_mesh_q12,
        cooks_membrane_mesh_q16,
    )

    fine = build_fem_model(cooks_membrane_mesh(64, 32), dense=True)
    uy_ref = float(np.asarray(fea_solution(fine, MaterialCard()).u)[-1])

    # serendipity cubics lose their cubic convergence on DISTORTED meshes
    # (Cook's elements are trapezoids — the classic serendipity caveat), so
    # the assertion is monotone h-convergence, not q16-level accuracy:
    # measured errors 7.9% (2x1) -> 2.1% (4x2) -> 0.23% (8x4)
    errs = []
    for nx, ny in ((2, 1), (4, 2), (8, 4)):
        m12 = build_fem_model(cooks_membrane_mesh_q12(nx, ny), SectionCard(intp=4))
        s12 = fea_solution(m12, MaterialCard())
        np.testing.assert_allclose(
            np.asarray(s12.reactions)[1::2].sum(), -50.0, atol=1e-8
        )
        uy12 = float(np.asarray(s12.u)[-1])
        errs.append(abs(uy12 - uy_ref) / abs(uy_ref))
    assert errs[2] < errs[1] < errs[0], errs
    assert errs[2] < 5e-3, errs


def test_higher_order_parity_vs_reference_solver():
    """Displacement parity vs the ACTUAL reference NumPy solver on our
    generator meshes for q8/q9/q16 (goldens produced by writing the meshes
    with write_feap_mesh and running /root/reference/src/fem_solver.py with
    the appropriate quadrature order). q12 is excluded: the reference's
    shp2ds is BROKEN dead code (partition of unity fails, sum N = -2.85 at
    interior points — docs/DIVERGENCES.md); our q12 is validated by
    h-convergence instead (test_quad12_end_to_end)."""
    import json
    import os

    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.mesh import (
        cooks_membrane_mesh_q8,
        cooks_membrane_mesh_q9,
        cooks_membrane_mesh_q16,
    )

    fdir = os.path.join(os.path.dirname(__file__), "fixtures")
    with open(os.path.join(fdir, "reference_golden_higher_order.json")) as f:
        goldens = json.load(f)
    gens = {"q8": cooks_membrane_mesh_q8, "q9": cooks_membrane_mesh_q9,
            "q16": cooks_membrane_mesh_q16}
    for name, g in goldens.items():
        m = build_fem_model(gens[name](*g["nxny"]), SectionCard(intp=g["intp"]))
        for case in g["cases"]:
            u = np.asarray(fea_solution(m, MaterialCard(E=case["E"], v=case["v"])).u)
            np.testing.assert_allclose(
                np.linalg.norm(u), case["u_norm"], rtol=1e-12, err_msg=name
            )
            np.testing.assert_allclose(
                u[-8:], case["u_tail"], rtol=1e-9, atol=1e-13, err_msg=name
            )


def test_body_force_consistent_load(cooks_mesh):
    """Constant body force (reference part-card 'body', dormant there):
    consistent nodal load integrates to exactly rho*g x volume, and a
    gravity-loaded clamped membrane's reactions balance it."""
    from vbicm_tpu.mesh import cooks_membrane_mesh_q9
    from vbicm_tpu.config import SectionCard

    by = -0.25
    model = build_fem_model(cooks_mesh, body_force=(0.0, by))
    m0 = build_fem_model(cooks_mesh)
    fb = np.asarray(model.f_ext) - np.asarray(m0.f_ext)
    # Cook's area = 48 * (44 + 16) / 2 = 1440; thk = 10
    np.testing.assert_allclose(fb[1::2].sum(), by * 1440.0 * 10.0, rtol=1e-12)
    np.testing.assert_allclose(fb[0::2].sum(), 0.0, atol=1e-10)

    sol = fea_solution(model, MaterialCard())
    ry = np.asarray(sol.reactions)[1::2].sum()
    # reactions balance the loads applied at FREE dofs (body load landing
    # directly on clamped nodes is carried by the support, not the solve)
    f_free_y = np.asarray(model.f_ext)[np.asarray(model.free_dof)]
    free_is_y = (np.asarray(model.free_dof) % 2) == 1
    np.testing.assert_allclose(ry, -f_free_y[free_is_y].sum(), rtol=1e-9)

    # higher-order family too (q9 consistent shape-function weights)
    m9 = build_fem_model(cooks_membrane_mesh_q9(4, 2), SectionCard(intp=3),
                         body_force=(0.0, by))
    m9_0 = build_fem_model(cooks_membrane_mesh_q9(4, 2), SectionCard(intp=3))
    fb9 = np.asarray(m9.f_ext) - np.asarray(m9_0.f_ext)
    np.testing.assert_allclose(fb9[1::2].sum(), by * 1440.0 * 10.0, rtol=1e-12)


@pytest.mark.slow
def test_tri3_end_to_end():
    """3-node triangles (reference shp2d nel=3 collapsed-quad path —
    which CRASHES in the reference: its shp buffer is sized (3, nel) but
    the corner loop writes 4 columns, DIVERGENCES #15): load balance +
    first-order h-convergence toward the refined-q4 answer."""
    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.mesh import cooks_membrane_mesh, cooks_membrane_mesh_tri3

    fine = build_fem_model(cooks_membrane_mesh(64, 32), dense=True)
    uy_ref = float(np.asarray(fea_solution(fine, MaterialCard()).u)[-1])

    errs = []
    for nx, ny in ((10, 5), (20, 10), (40, 20)):
        m = build_fem_model(cooks_membrane_mesh_tri3(nx, ny), SectionCard(intp=2))
        sol = fea_solution(m, MaterialCard())
        np.testing.assert_allclose(
            np.asarray(sol.reactions)[1::2].sum(), -50.0, atol=1e-8
        )
        errs.append(abs(float(np.asarray(sol.u)[-1]) - uy_ref) / abs(uy_ref))
    # measured: 34% -> 14% -> 4.5% (constant-strain triangles are stiff in
    # bending; convergence is what validates the element)
    assert errs[2] < errs[1] < errs[0], errs
    assert errs[2] < 0.06, errs


def test_element_strain_energy(cooks_model):
    """Per-element strain energy (reference strain_energy_flag output):
    sums to the external work 0.5 f^T u, all entries nonnegative."""
    from vbicm_tpu.ops.element import lame_from_Ev
    from vbicm_tpu.solver import element_strain_energy

    lam, mu = lame_from_Ev(20.0, 0.3)
    sol = fea_solution(cooks_model, MaterialCard(E=20.0, v=0.3))
    se = np.asarray(element_strain_energy(cooks_model, sol.u, lam, mu))
    assert se.shape == (cooks_model.nele,)
    assert (se >= -1e-12).all()
    work = 0.5 * float(jnp.vdot(cooks_model.f_ext, sol.u))
    np.testing.assert_allclose(se.sum(), work, rtol=1e-10)
