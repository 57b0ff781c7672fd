"""Axisymmetric (stype 3) end-to-end vs the Lamé thick-cylinder solution.

The reference's stype-3 constitutive driver is an EMPTY STUB
(src/mat_subroutine.py:300-302) — its axisymmetric capability is B-matrix/
residual plumbing only. This path completes it with the standard
formulation (hoop strain N/r row, dvol = 2*pi*r*detJ*w) and validates
against the closed-form pressurized thick-walled cylinder.
"""
import numpy as np
import pytest

from vbicm_tpu.config import MaterialCard, SectionCard
from vbicm_tpu.mesh.feap import MeshData
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.solver import fea_solution

A_IN, B_OUT, H, P = 1.0, 2.0, 0.5, 1.0
NR, NZ = 40, 2


def cylinder_mesh():
    """(r, z) rectangle: r in [a, b], z in [0, h]; uz fixed everywhere
    (plane-strain axisymmetry, e_zz = 0); internal pressure at r = a."""
    rs = np.linspace(A_IN, B_OUT, NR + 1)
    zs = np.linspace(0.0, H, NZ + 1)
    R, Z = np.meshgrid(rs, zs)
    coords = np.stack([R.ravel(), Z.ravel()], axis=1)
    conn = []
    for r in range(NZ):
        for c in range(NR):
            n0 = r * (NR + 1) + c
            conn.append((n0, n0 + 1, n0 + NR + 2, n0 + NR + 1))
    conn = np.array(conn, dtype=np.int32)
    # uz fixed on all nodes
    nn = coords.shape[0]
    bc_nodes = np.arange(nn, dtype=np.int32)
    bc_flags = np.tile(np.array([[0, 1]], dtype=np.int32), (nn, 1))
    # consistent pressure load on the r = a edge: total 2*pi*a*h*p,
    # trapezoidal over the NZ edge segments
    edge = np.array([r * (NR + 1) for r in range(NZ + 1)], dtype=np.int32)
    w = np.full(NZ + 1, H / NZ)
    w[0] *= 0.5
    w[-1] *= 0.5
    fr = 2.0 * np.pi * A_IN * P * w
    load_vals = np.stack([fr, np.zeros(NZ + 1)], axis=1)
    return MeshData(
        coords=coords, conn=conn, bc_nodes=bc_nodes, bc_flags=bc_flags,
        load_nodes=edge, load_vals=load_vals,
        disp_nodes=np.zeros((0,), dtype=np.int32), disp_vals=np.zeros((0, 2)),
        space_dim=2, max_node_dof=2, max_ele_node=4,
    )


def u_r_lame(r, E, v):
    A = P * A_IN**2 / (B_OUT**2 - A_IN**2)
    C = P * A_IN**2 * B_OUT**2 / (B_OUT**2 - A_IN**2)
    return (1 + v) / E * (A * (1 - 2 * v) * r + C / r)


@pytest.fixture(scope="module")
def cyl_solution():
    model = build_fem_model(cylinder_mesh(), SectionCard(stype=3))
    sol = fea_solution(model, MaterialCard(E=20.0, v=0.3))
    return model, sol


def test_lame_displacement(cyl_solution):
    model, sol = cyl_solution
    u = np.asarray(sol.u)
    coords = np.asarray(model.coords)
    # radial displacements along the bottom row of nodes
    idx = np.arange(NR + 1)
    r = coords[idx, 0]
    ur = u[2 * idx]
    ur_exact = u_r_lame(r, 20.0, 0.3)
    np.testing.assert_allclose(ur, ur_exact, rtol=2e-3)
    # uz everywhere ~ 0 (fixed)
    np.testing.assert_allclose(u[1::2], 0.0, atol=1e-14)


def test_lame_stresses(cyl_solution):
    model, sol = cyl_solution
    # qpt radii for element stresses
    sig = np.asarray(sol.stress)  # (nele, nqpt, 6)
    coords = np.asarray(model.coords)
    conn = np.asarray(model.conn)
    A = P * A_IN**2 / (B_OUT**2 - A_IN**2)
    C = P * A_IN**2 * B_OUT**2 / (B_OUT**2 - A_IN**2)
    # centroid radius per element (first row of elements)
    for e in range(0, NR, 5):
        rc = coords[conn[e], 0].mean()
        s_rr = sig[e, :, 0].mean()
        s_tt = sig[e, :, 2].mean()
        np.testing.assert_allclose(s_rr, A - C / rc**2, rtol=0.06, atol=5e-3)
        np.testing.assert_allclose(s_tt, A + C / rc**2, rtol=0.02)
    # sigma_zz = v*(s_rr + s_tt) under e_zz = 0
    szz = sig[..., 1]
    np.testing.assert_allclose(
        szz, 0.3 * (sig[..., 0] + sig[..., 2]), rtol=1e-9, atol=1e-12
    )


def test_axisym_differentiable():
    import jax
    import jax.numpy as jnp

    from vbicm_tpu.solver import make_solver

    model = build_fem_model(cylinder_mesh(), SectionCard(stype=3))
    solve = make_solver(model)

    def inner_ur(lam, mu):
        return solve(lam, mu)[0]

    g = jax.grad(inner_ur, argnums=(0, 1))(11.54, 7.69)
    eps = 1e-6
    fd = (float(inner_ur(11.54 + eps, 7.69)) - float(inner_ur(11.54 - eps, 7.69))) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), fd, rtol=1e-5)
