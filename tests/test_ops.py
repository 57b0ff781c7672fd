"""Unit tests for quadrature, shape functions, element math, von Mises."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.io as sio

from vbicm_tpu.ops import quadrature
from vbicm_tpu.ops.element import (
    C_LAM3,
    C_MU3,
    bmatrix,
    element_stiffness_parts,
    lame_from_Ev,
    plane_strain_C3,
    plane_stress_C3,
    stress6_plane_strain,
)
from vbicm_tpu.ops.shape import quad4_shape, quad8_natural, quad9_natural, quad4_natural
from vbicm_tpu.ops.vonmises import PDEVS6, von_mises_classical, von_mises_reference

MODEL_MAT = "/root/reference/model_file.mat"


def test_gauss_2d_orders_integrate_polynomials():
    # order-p rule integrates x^(2p-1) exactly on [-1,1]^2
    for order in range(1, 6):
        pts, wts = quadrature.int2d(order)
        assert pts.shape[0] == order * order
        np.testing.assert_allclose(wts.sum(), 4.0, atol=1e-12)
        for px in range(2 * order):
            exact = (1 - (-1) ** (px + 1)) / (px + 1) * 2.0
            got = np.sum(wts * pts[:, 0] ** px)
            np.testing.assert_allclose(got, exact, atol=1e-10)


def test_gauss_2x2_ordering():
    pts, wts = quadrature.int2d(2)
    g = 1.0 / np.sqrt(3.0)
    np.testing.assert_allclose(
        pts, [[-g, -g], [g, -g], [g, g], [-g, g]], atol=1e-14
    )
    np.testing.assert_allclose(wts, 1.0)


def test_gauss_order45_point_tables_match_reference():
    """Orders 4/5 replicate the reference's DESCENDING per-axis fill
    (src/fem_preprocess.py:565-606), so index-addressed probes (nipt_id)
    land on the same physical points."""
    # order 4: ss = [+a, +b, -b, -a], ww = [.5-h, .5+h, .5+h, .5-h]
    g4 = np.sqrt(4.8)
    h4 = (1.0 / 3.0) / g4
    ss4 = np.array([np.sqrt((3 + g4) / 7), np.sqrt((3 - g4) / 7)])
    ss4 = np.array([ss4[0], ss4[1], -ss4[1], -ss4[0]])
    ww4 = np.array([0.5 - h4, 0.5 + h4, 0.5 + h4, 0.5 - h4])
    pts, wts = quadrature.int2d(4)
    P4 = np.array([[ss4[k], ss4[j]] for j in range(4) for k in range(4)])
    W4 = np.array([ww4[j] * ww4[k] for j in range(4) for k in range(4)])
    np.testing.assert_allclose(pts, P4, atol=1e-14)
    np.testing.assert_allclose(wts, W4, atol=1e-14)
    # order 5: ss = [+a, +b, 0, -b, -a]
    g5 = np.sqrt(1120.0)
    a5, b5 = np.sqrt((70 + g5) / 126), np.sqrt((70 - g5) / 126)
    ss5 = np.array([a5, b5, 0.0, -b5, -a5])
    wa = (21 * g5 + 117.6) / (g5 * (70 + g5))
    wb = (21 * g5 - 117.6) / (g5 * (70 - g5))
    ww5 = np.array([wa, wb, 2 * (1 - wa - wb), wb, wa])
    pts, wts = quadrature.int2d(5)
    P5 = np.array([[ss5[k], ss5[j]] for j in range(5) for k in range(5)])
    W5 = np.array([ww5[j] * ww5[k] for j in range(5) for k in range(5)])
    np.testing.assert_allclose(pts, P5, atol=1e-13)
    np.testing.assert_allclose(wts, W5, atol=1e-13)


def test_special_5pt_rule():
    pts, wts = quadrature.int2d(0)
    np.testing.assert_allclose(wts.sum(), 4.0 * 5 / 9 + 2.8 * 8 / 9, atol=1e-12)


def test_nodal_rules():
    for n in (4, 9, 16):
        pts, wts = quadrature.int2dn(n)
        assert pts.shape == (n, 2)
        np.testing.assert_allclose(wts.sum(), 4.0, atol=1e-12)


def test_quad4_partition_of_unity():
    for xi, eta in [(0.0, 0.0), (0.3, -0.7), (1.0, 1.0), (-0.2, 0.9)]:
        n, dn = quad4_natural(xi, eta)
        np.testing.assert_allclose(float(jnp.sum(n)), 1.0, atol=1e-14)
        np.testing.assert_allclose(np.asarray(jnp.sum(dn, axis=0)), 0.0, atol=1e-14)


def test_quad8_quad9_partition_of_unity():
    for fn, nel in [(quad8_natural, 8), (quad9_natural, 9)]:
        n, dn = fn(0.33, -0.41)
        assert n.shape == (nel,)
        np.testing.assert_allclose(float(jnp.sum(n)), 1.0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(jnp.sum(dn, axis=0)), 0.0, atol=1e-13)


def test_quad4_global_gradients_linear_field():
    # gradients must reproduce a linear field exactly on a distorted quad
    xl = jnp.array([[0.0, 0.0], [2.3, 0.2], [2.7, 1.9], [-0.3, 1.4]])
    a, b, c = 1.7, -0.6, 0.9
    vals = a + b * xl[:, 0] + c * xl[:, 1]
    n, dn, detj = quad4_shape(0.37, -0.21, xl)
    np.testing.assert_allclose(float(vals @ dn[:, 0]), b, atol=1e-12)
    np.testing.assert_allclose(float(vals @ dn[:, 1]), c, atol=1e-12)
    assert float(detj) > 0


@pytest.mark.skipif(not __import__("os").path.exists(MODEL_MAT), reason="no reference mount")
def test_shape_and_jacobian_parity_with_reference_model_file():
    """Golden parity of shp/jac/B/dvol vs the reference's own preprocessed
    element data (element 0 of Cook's 20x10, model_file.mat)."""
    d = sio.loadmat(MODEL_MAT, struct_as_record=False, squeeze_me=True)
    ek = d["topo_data"].element_kdata
    md = d["model_data"]
    coords = np.stack([e.coord[:, 1:3] for e in md.element[:1]])[0]  # (4, 2)
    pts, wts = quadrature.int2d(2)
    for q in range(4):
        n, dn, detj = quad4_shape(pts[q, 0], pts[q, 1], jnp.asarray(coords))
        np.testing.assert_allclose(float(detj) * wts[q], ek.jac[q], atol=1e-12)
        # reference shp layout: shp[0]=dN/dx, shp[1]=dN/dy, shp[2]=N
        np.testing.assert_allclose(np.asarray(dn[:, 0]), ek.shp[0, :, q], atol=1e-12)
        np.testing.assert_allclose(np.asarray(dn[:, 1]), ek.shp[1, :, q], atol=1e-12)
        np.testing.assert_allclose(np.asarray(n), ek.shp[2, :, q], atol=1e-12)
    np.testing.assert_allclose(ek.dvol, ek.thk * ek.jac, atol=1e-12)


def test_plane_strain_C_decomposition():
    E, v = 20.0, 0.3
    lam, mu = lame_from_Ev(E, v)
    C = np.asarray(plane_strain_C3(E, v))
    np.testing.assert_allclose(C, lam * C_LAM3 + mu * C_MU3, atol=1e-12)
    # against the explicit 4x4 reduced form of the reference
    l = v * E / ((1 + v) * (1 - 2 * v))
    m = 0.5 * E / (1 + v)
    Cref = np.array([[l + 2 * m, l, 0], [l, l + 2 * m, 0], [0, 0, m]])
    np.testing.assert_allclose(C, Cref, atol=1e-12)


def test_plane_stress_C():
    E, v = 20.0, 0.3
    C = np.asarray(plane_stress_C3(E, v))
    Cref = E / (1 - v**2) * np.array([[1, v, 0], [v, 1, 0], [0, 0, (1 - v) / 2]])
    np.testing.assert_allclose(C, Cref, atol=1e-12)


def test_stress6_plane_strain():
    lam, mu = lame_from_Ev(20.0, 0.3)
    eps3 = jnp.array([1e-3, -2e-3, 5e-4])
    s = np.asarray(stress6_plane_strain(eps3, lam, mu))
    tr = 1e-3 - 2e-3
    np.testing.assert_allclose(s[0], lam * tr + 2 * mu * 1e-3, atol=1e-15)
    np.testing.assert_allclose(s[2], lam * tr, atol=1e-15)
    np.testing.assert_allclose(s[3], mu * 5e-4, atol=1e-15)
    np.testing.assert_allclose(s[4:], 0.0)


def test_pdevs6_matches_reference_table():
    # reference Pdevs (src/fem_preprocess.py:32-42) restricted to
    # [0,4,8,3,7,2]: dev 3x3 block + diag(0.5) on shears
    expected = np.zeros((6, 6))
    expected[:3, :3] = np.eye(3) - 1.0 / 3.0
    expected[3:, 3:] = 0.5 * np.eye(3)
    np.testing.assert_allclose(PDEVS6, expected, atol=1e-12)


def test_von_mises_reference_vs_manual():
    sig = jnp.array([3.0, -1.0, 0.5, 0.7, 0.0, 0.0])
    p = (3.0 - 1.0 + 0.5) / 3.0
    manual = np.sqrt(
        0.5 * ((3 - p) ** 2 + (-1 - p) ** 2 + (0.5 - p) ** 2) + 0.5 * (0.7 / 2) ** 2 * 1
    )
    # shear term: (t/2)^2 appears once in the 6-vector restriction
    manual = np.sqrt(
        0.5 * (((3 - p) ** 2 + (-1 - p) ** 2 + (0.5 - p) ** 2) + (0.7 / 2) ** 2)
    )
    np.testing.assert_allclose(float(von_mises_reference(sig)), manual, atol=1e-12)


def test_element_stiffness_parts_symmetry_and_nullspace():
    xl = jnp.array([[0.0, 0.0], [2.0, 0.1], [2.2, 1.9], [-0.1, 2.0]])
    pts, wts = quadrature.int2d(2)
    Bs, dv = [], []
    for q in range(4):
        n, dn, detj = quad4_shape(pts[q, 0], pts[q, 1], xl)
        Bs.append(bmatrix(dn))
        dv.append(detj * wts[q] * 10.0)
    B = jnp.stack(Bs)
    dvol = jnp.asarray(np.array(dv))
    ke_lam, ke_mu = element_stiffness_parts(B, dvol)
    lam, mu = lame_from_Ev(20.0, 0.3)
    ke = lam * ke_lam + mu * ke_mu
    ke_np = np.asarray(ke)
    np.testing.assert_allclose(ke_np, ke_np.T, atol=1e-10)
    # rigid-body modes: translations and infinitesimal rotation are nullspace
    tx = np.tile([1.0, 0.0], 4)
    ty = np.tile([0.0, 1.0], 4)
    rot = np.stack([-np.asarray(xl)[:, 1], np.asarray(xl)[:, 0]], axis=1).reshape(-1)
    for v in (tx, ty, rot):
        np.testing.assert_allclose(ke_np @ v, 0.0, atol=1e-9)
    # positive semidefinite with exactly 3 near-zero eigenvalues
    w = np.linalg.eigvalsh(ke_np)
    assert (w[:3] < 1e-9).all() and (w[3:] > 1e-9).all()


def test_higher_order_shape_functions():
    """tri3/quad12/quad16: partition of unity, zero gradient sum, and
    linear-field reproduction (completeness)."""
    from vbicm_tpu.ops.shape import (
        isoparametric,
        quad12_natural,
        quad16_natural,
        shape_natural,
        tri3_natural,
    )

    for nel in (3, 4, 8, 9, 12, 16):
        fn = shape_natural(nel)
        n, dn = fn(0.37, -0.52)
        assert n.shape == (nel,)
        np.testing.assert_allclose(float(jnp.sum(n)), 1.0, atol=1e-12, err_msg=str(nel))
        np.testing.assert_allclose(
            np.asarray(jnp.sum(dn, axis=0)), 0.0, atol=1e-12, err_msg=str(nel)
        )

    # quad16 nodal (Kronecker delta) property
    nodes1d = [-1.0, -1.0 / 3.0, 1.0 / 3.0, 1.0]
    from vbicm_tpu.ops.shape import _Q16_IJ

    for k, (i, j) in enumerate(_Q16_IJ):
        n, _ = quad16_natural(nodes1d[i], nodes1d[j])
        expected = np.zeros(16)
        expected[k] = 1.0
        np.testing.assert_allclose(np.asarray(n), expected, atol=1e-12)

    # quad12 nodal property at its corner and edge nodes
    pts = [(-1, -1), (1, -1), (1, 1), (-1, 1),
           (-1/3, -1), (1/3, -1), (1, -1/3), (1, 1/3),
           (1/3, 1), (-1/3, 1), (-1, 1/3), (-1, -1/3)]
    for k, (x, y) in enumerate(pts):
        n, _ = quad12_natural(float(x), float(y))
        expected = np.zeros(12)
        expected[k] = 1.0
        np.testing.assert_allclose(np.asarray(n), expected, atol=1e-12)


def test_c6_and_condensation():
    from vbicm_tpu.ops.element import (
        elasticity_C6,
        plane_stress_C3,
        plane_stress_condensation,
    )

    E, v = 20.0, 0.3
    C6 = elasticity_C6(E, v)
    # block structure: lam+2mu diagonal, lam off-diagonal, mu shears
    lam, mu = lame_from_Ev(E, v)
    np.testing.assert_allclose(float(C6[0, 0]), lam + 2 * mu, atol=1e-12)
    np.testing.assert_allclose(float(C6[0, 1]), lam, atol=1e-12)
    np.testing.assert_allclose(float(C6[3, 3]), mu, atol=1e-12)
    # condensing e33 out of C6 reproduces the plane-stress matrix
    np.testing.assert_allclose(
        np.asarray(plane_stress_condensation(C6)),
        np.asarray(plane_stress_C3(E, v)),
        atol=1e-10,
    )


def test_axisymmetric_bmatrix():
    from vbicm_tpu.ops.element import bmatrix_axisym
    from vbicm_tpu.ops.shape import quad4_shape

    xl = jnp.array([[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0]])
    n, dn, detj = quad4_shape(0.1, -0.2, xl)
    r = float(n @ xl[:, 0])
    B = bmatrix_axisym(dn, n, r)
    assert B.shape == (4, 8)
    # hoop strain of pure radial rigid translation u_r = 1: e_hoop = 1/r
    u = np.zeros(8)
    u[0::2] = 1.0
    eps = np.asarray(B) @ u
    np.testing.assert_allclose(eps[2], 1.0 / r, atol=1e-12)
    np.testing.assert_allclose(eps[[0, 1, 3]], 0.0, atol=1e-12)


def test_generic_geometry_matches_quad4_path():
    """element_geometry_generic reproduces the specialized quad4 precompute
    bit-for-bit and produces consistent stiffness for a quad9 patch."""
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import _element_geometry, element_geometry_generic

    m = cooks_membrane_mesh(4, 2)
    qp, qw = quadrature.int2d(2)
    B1, d1 = _element_geometry(m.coords, m.conn, qp, qw, 10.0)
    B2, d2 = element_geometry_generic(m.coords, m.conn, qp, qw, 10.0)
    np.testing.assert_allclose(B2, B1, atol=1e-14)
    np.testing.assert_allclose(d2, d1, atol=1e-14)

    # quad9 single-element patch: stiffness from the generic path must be
    # symmetric PSD with exactly 3 rigid-body modes
    coords9 = np.array(
        [
            [0, 0], [2, 0], [2, 2], [0, 2],        # corners
            [1, 0], [2, 1], [1, 2], [0, 1],        # mid-sides
            [1, 1],                                 # center
        ],
        dtype=float,
    )
    conn9 = np.arange(9, dtype=np.int32)[None, :]
    qp3, qw3 = quadrature.int2d(3)
    B9, d9 = element_geometry_generic(coords9, conn9, qp3, qw3, 1.0)
    from vbicm_tpu.ops.element import C_LAM3, C_MU3, lame_from_Ev

    lam, mu = lame_from_Ev(20.0, 0.3)
    C = lam * C_LAM3 + mu * C_MU3
    ke = np.einsum("qai,ab,qbj,q->ij", B9[0], C, B9[0], d9[0])
    np.testing.assert_allclose(ke, ke.T, atol=1e-10)
    w = np.linalg.eigvalsh(ke)
    assert (np.abs(w[:3]) < 1e-9).all() and (w[3:] > 1e-9).all()


def test_sorted_scatter_matches_at_add():
    from vbicm_tpu.ops.assembly import element_matvec, make_sorted_scatter
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model

    model = build_fem_model(cooks_membrane_mesh(8, 4), dense=False)
    scatter = make_sorted_scatter(model.lm, model.ndof)

    def mv(ke, u):
        qe = jnp.einsum("eij,ej->ei", ke, u[model.lm])
        return scatter(qe)

    rng = np.random.default_rng(0)
    ke = jnp.asarray(rng.normal(size=(model.nele, 8, 8)))
    u = jnp.asarray(rng.normal(size=(model.ndof,)))
    ref = element_matvec(ke, model.lm, u, model.ndof)
    got = mv(ke, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)
    # vmapped over a batch too
    kes = jnp.asarray(rng.normal(size=(4, model.nele, 8, 8)))
    us = jnp.asarray(rng.normal(size=(4, model.ndof)))
    got_b = jax.vmap(mv)(kes, us)
    ref_b = jax.vmap(lambda k, x: element_matvec(k, model.lm, x, model.ndof))(kes, us)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b), atol=1e-12)


def test_int3d_tensor_and_special_rules():
    # tensor orders integrate 3-D monomials exactly
    for order in range(1, 6):
        pts, wts = quadrature.int3d(order)
        assert pts.shape == (order**3, 3)
        np.testing.assert_allclose(wts.sum(), 8.0, rtol=1e-14)
        for p in range(2 * order - 1):
            exact = ((1 - (-1) ** (p + 1)) / (p + 1)) * 4.0
            np.testing.assert_allclose(
                (wts * pts[:, 0] ** p).sum(), exact, atol=1e-13)

    # special rules: faithful transcription of the reference tables
    # (src/fem_preprocess.py:677-700; dead code there — no 3-D element
    # exists in the reference — kept for table completeness)
    ig = np.array([-1, 1, 1, -1], dtype=np.float64)
    jg = np.array([-1, -1, 1, 1], dtype=np.float64)

    pts, wts = quadrature.int3d(-9)
    g = np.sqrt(0.6)
    exp = np.zeros((9, 4))
    for i in range(4):
        exp[i, :3] = [ig[i] * g, jg[i] * g, g]
        exp[i + 4, :3] = [ig[i] * g, jg[i] * g, -g]
        exp[i, 3] = exp[i + 4, 3] = 5.0 / 9.0
    exp[8, 3] = 1.034482758620690  # reference constant 'thty29' = 30/29
    np.testing.assert_allclose(pts, exp[:, :3], atol=1e-14)
    np.testing.assert_allclose(wts, exp[:, 3], atol=1e-12)

    pts, wts = quadrature.int3d(-4)
    g = 1.0 / np.sqrt(3.0)
    exp_x = ig * g
    exp_y = np.array([-g, g, -g, g])
    exp_z = jg * g
    np.testing.assert_allclose(pts, np.stack([exp_x, exp_y, exp_z], axis=1), atol=1e-15)
    np.testing.assert_allclose(wts, 2.0)
    # degree-2 exactness of the 4-point rule
    np.testing.assert_allclose((wts * pts[:, 0] ** 2).sum(), 8.0 / 3.0, rtol=1e-14)
    np.testing.assert_allclose((wts * pts[:, 0] * pts[:, 1]).sum(), 0.0, atol=1e-15)

    # dispatch mirrors reference quadr3d (straight forward to int3d)
    p2, w2 = quadrature.quadr3d(2, 8)
    np.testing.assert_allclose(p2, quadrature.int3d(2)[0])
