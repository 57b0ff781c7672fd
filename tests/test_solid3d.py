"""3-D hex8 solid elements, end to end.

Oracle strategy (SURVEY.md §4): closed-form shape-function identities, the
single-element patch test (exact linear fields), and an INDEPENDENT scipy
assembly/solve written from first principles in this file (explicit loops,
full 6x6 C-matrix — no shared code with vbicm_tpu.model).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg

from vbicm_tpu.config import MaterialCard, ProblemConfig, SectionCard
from vbicm_tpu.mesh import beam_hex8_mesh, cube_hex8_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.shape import hex8_natural
from vbicm_tpu.solver import (
    element_strain_energy,
    fea_solution,
    make_fh_fun,
    make_solver,
)

E0, V0 = 20.0, 0.3
SEC3D = SectionCard(intp=2, stype=4)


def _oracle_solve(mesh, E, v):
    """First-principles hex8 assembly + sparse solve (independent of model.py:
    scalar loops, full C6, scipy spsolve)."""
    lam = v * E / ((1 + v) * (1 - 2 * v))
    mu = E / (2 * (1 + v))
    C = np.zeros((6, 6))
    C[:3, :3] = lam
    C[np.arange(3), np.arange(3)] += 2 * mu
    C[3, 3] = C[4, 4] = C[5, 5] = mu

    g = 1.0 / np.sqrt(3.0)
    # tensor-product 2x2x2 points, any order (integration is order-free)
    qp = [(sx * g, sy * g, sz * g) for sz in (-1, 1) for sy in (-1, 1) for sx in (-1, 1)]
    signs = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        dtype=float,
    )

    ndof = mesh.nnodes * 3
    K = scipy.sparse.lil_matrix((ndof, ndof))
    for e in range(mesh.nele):
        nodes = mesh.conn[e]
        xl = mesh.coords[nodes]  # (8, 3)
        ke = np.zeros((24, 24))
        for (xi, eta, zeta) in qp:
            dn = np.zeros((8, 3))
            for a in range(8):
                s, t, r = signs[a]
                dn[a, 0] = 0.125 * s * (1 + t * eta) * (1 + r * zeta)
                dn[a, 1] = 0.125 * t * (1 + s * xi) * (1 + r * zeta)
                dn[a, 2] = 0.125 * r * (1 + s * xi) * (1 + t * eta)
            J = dn.T @ xl
            detj = np.linalg.det(J)
            dng = dn @ np.linalg.inv(J)
            B = np.zeros((6, 24))
            for a in range(8):
                B[0, 3 * a] = dng[a, 0]
                B[1, 3 * a + 1] = dng[a, 1]
                B[2, 3 * a + 2] = dng[a, 2]
                B[3, 3 * a] = dng[a, 1]
                B[3, 3 * a + 1] = dng[a, 0]
                B[4, 3 * a + 1] = dng[a, 2]
                B[4, 3 * a + 2] = dng[a, 1]
                B[5, 3 * a] = dng[a, 2]
                B[5, 3 * a + 2] = dng[a, 0]
            ke += detj * B.T @ C @ B
        dofs = np.concatenate([3 * nodes + d for d in range(3)]).reshape(3, 8).T.reshape(-1)
        for i in range(24):
            K[dofs[i], dofs] += ke[i]

    f = np.zeros(ndof)
    for n, vals in zip(mesh.load_nodes, mesh.load_vals):
        f[3 * n : 3 * n + 3] += vals
    fixed = np.zeros(ndof, dtype=bool)
    for n, flags in zip(mesh.bc_nodes, mesh.bc_flags):
        for d in range(3):
            if flags[d]:
                fixed[3 * n + d] = True
    free = ~fixed
    u = np.zeros(ndof)
    u[free] = scipy.sparse.linalg.spsolve(K.tocsr()[free][:, free], f[free])
    return u


def test_hex8_shape_identities():
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (20, 3), minval=-1.0, maxval=1.0)
    for p in np.asarray(pts):
        n, dn = hex8_natural(*p)
        assert float(jnp.abs(jnp.sum(n) - 1.0)) < 1e-14  # partition of unity
        assert float(jnp.max(jnp.abs(jnp.sum(dn, axis=0)))) < 1e-14
    # Kronecker property at the corners
    corners = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        dtype=float,
    )
    for a, c in enumerate(corners):
        n, _ = hex8_natural(*c)
        expect = np.zeros(8)
        expect[a] = 1.0
        np.testing.assert_allclose(np.asarray(n), expect, atol=1e-14)
    # linear completeness: N(p) @ xl == p for xl = corners of a distorted hex
    rng = np.random.default_rng(1)
    xl = corners + 0.2 * rng.standard_normal((8, 3))
    for p in [(-0.3, 0.5, 0.1), (0.9, -0.7, 0.2)]:
        n, _ = hex8_natural(*p)
        # trilinear map of the distorted hex evaluated consistently
        x = np.asarray(n) @ xl
        n2, _ = hex8_natural(*p)
        np.testing.assert_allclose(np.asarray(n2) @ xl, x, atol=1e-14)


def test_hex8_host_dn_matches_shape_library():
    """The host-side NumPy fast path (model._hex8_dn_host, used in the 3-D
    geometry precompute) must agree with the jnp shape library — they share
    only the sign constants, so a future edit to hex8_natural could silently
    diverge (ADVICE r4)."""
    from vbicm_tpu.model import _hex8_dn_host

    rng = np.random.default_rng(3)
    qpts = rng.uniform(-1.0, 1.0, (17, 3))
    dn_host = _hex8_dn_host(qpts)
    assert dn_host.shape == (17, 8, 3)
    for q, p in enumerate(qpts):
        _, dn = hex8_natural(*p)
        np.testing.assert_allclose(dn_host[q], np.asarray(dn), atol=1e-14)


def test_patch_test_linear_field_exact():
    """Prescribing an affine displacement on every boundary node reproduces
    the affine field and a CONSTANT stress exactly (the classical patch
    test — hex8 must pass to machine precision)."""
    mesh = cube_hex8_mesh(3, 1.0)
    a = np.array([0.011, 0.022, 0.033])
    G = np.array(
        [
            [0.004, 0.001, 0.002],
            [0.001, 0.006, 0.0015],
            [0.002, 0.0015, 0.005],
        ]
    )
    u_exact = a[None, :] + mesh.coords @ G.T

    # boundary = any node on a face of the cube
    on_face = (
        np.isclose(mesh.coords, 0.0).any(axis=1)
        | np.isclose(mesh.coords, 1.0).any(axis=1)
    )
    bnodes = np.nonzero(on_face)[0].astype(np.int32)
    bvals = u_exact[bnodes]
    assert np.abs(bvals).min() > 0.0  # every component marks its dof fixed
    mesh = dataclasses.replace(mesh, disp_nodes=bnodes, disp_vals=bvals)

    model = build_fem_model(mesh, SEC3D)
    sol = fea_solution(model, MaterialCard(E=E0, v=V0))
    np.testing.assert_allclose(
        np.asarray(sol.u).reshape(-1, 3), u_exact, atol=1e-12
    )
    # constant strain = sym(G) (Voigt engineering shears), everywhere
    eps = np.asarray(sol.strain)  # (nele, nqpt, 6)
    sym = 0.5 * (G + G.T)
    expect = np.array(
        [sym[0, 0], sym[1, 1], sym[2, 2], 2 * sym[0, 1], 2 * sym[1, 2], 2 * sym[0, 2]]
    )
    np.testing.assert_allclose(eps, np.broadcast_to(expect, eps.shape), atol=1e-12)
    # stress matches the isotropic law applied to that strain
    lam = V0 * E0 / ((1 + V0) * (1 - 2 * V0))
    mu = E0 / (2 * (1 + V0))
    tr = expect[:3].sum()
    sig_expect = np.concatenate([lam * tr + 2 * mu * expect[:3], mu * expect[3:]])
    np.testing.assert_allclose(
        np.asarray(sol.stress),
        np.broadcast_to(sig_expect, eps.shape),
        atol=1e-12,
    )


def test_cantilever_matches_scipy_oracle():
    mesh = beam_hex8_mesh(8, 2, 2, lx=8.0, ly=1.0, lz=1.0, tip_force=(0.0, 0.0, -1.0))
    model = build_fem_model(mesh, SEC3D)
    for method in ("spectral", "cholesky"):
        sol = fea_solution(
            model, MaterialCard(E=E0, v=V0), solve_free=make_solver(model, method=method)
        )
        u_ref = _oracle_solve(mesh, E0, V0)
        np.testing.assert_allclose(np.asarray(sol.u), u_ref, rtol=0, atol=1e-9)
    # equilibrium: reactions balance the applied load
    np.testing.assert_allclose(
        np.asarray(sol.reactions).reshape(-1, 3).sum(axis=0),
        -np.array([0.0, 0.0, -1.0]),
        atol=1e-10,
    )
    # per-element strain energy sums to external work 0.5 f.u
    c0 = MaterialCard(E=E0, v=V0).lam
    c1 = MaterialCard(E=E0, v=V0).mu
    en = element_strain_energy(model, sol.u, c0, c1)
    np.testing.assert_allclose(
        float(jnp.sum(en)), 0.5 * float(model.f_ext @ sol.u), rtol=1e-12
    )


def test_matrix_free_cg_matches_dense():
    mesh = beam_hex8_mesh(4, 2, 2)
    model_d = build_fem_model(mesh, SEC3D)
    model_mf = build_fem_model(mesh, SEC3D, dense=False)
    mat = MaterialCard(E=E0, v=V0)
    u_d = fea_solution(model_d, mat).u
    u_mf = fea_solution(model_mf, mat, solve_free=make_solver(model_mf, cg_tol=1e-14)).u
    np.testing.assert_allclose(np.asarray(u_mf), np.asarray(u_d), atol=1e-9)


def test_fh_differentiable_and_vmapped():
    mesh = beam_hex8_mesh(4, 2, 2)
    model = build_fem_model(mesh, SEC3D)
    cfg = ProblemConfig(node_id=model.nnodes, ele_id=1, nipt_id=(1, 3))
    fh = make_fh_fun(model, cfg)
    theta = jnp.array([0.2, -0.4])
    y, h = fh(theta)
    assert y.shape == (3,) and h.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(y))) and bool(jnp.all(jnp.isfinite(h)))

    # gradient of the von Mises probe w.r.t. theta vs central differences
    g = jax.grad(lambda t: jnp.sum(fh(t)[1]))(theta)
    eps = 1e-5
    for i in range(2):
        tp = theta.at[i].add(eps)
        tm = theta.at[i].add(-eps)
        fd = (float(jnp.sum(fh(tp)[1])) - float(jnp.sum(fh(tm)[1]))) / (2 * eps)
        assert abs(float(g[i]) - fd) < 1e-6 * max(1.0, abs(fd))

    # vmap over a theta batch matches the loop
    thetas = jnp.asarray(np.random.default_rng(3).standard_normal((5, 2)))
    ys, hs = jax.vmap(fh)(thetas)
    for k in range(5):
        yk, hk = fh(thetas[k])
        np.testing.assert_allclose(np.asarray(ys[k]), np.asarray(yk), atol=1e-12)
        np.testing.assert_allclose(np.asarray(hs[k]), np.asarray(hk), atol=1e-12)


def test_mass_and_body_force_totals():
    mesh = beam_hex8_mesh(3, 2, 2, lx=3.0, ly=1.0, lz=2.0, tip_force=(0.0, 0.0, 0.0))
    vol = 3.0 * 1.0 * 2.0
    model = build_fem_model(mesh, SEC3D, with_mass=True, body_force=(0.0, 0.0, -9.81))
    # unit-density mass sums to the volume (each translation dof block)
    total_mass = float(jnp.sum(model.me_unit)) / 3.0
    assert abs(total_mass - vol) < 1e-10
    # consistent gravity load sums to -9.81 * V in z, zero x/y
    f = np.asarray(model.f_ext).reshape(-1, 3).sum(axis=0)
    np.testing.assert_allclose(f, [0.0, 0.0, -9.81 * vol], atol=1e-10)


def test_feap_roundtrip_and_xdmf_3d(tmp_path):
    from vbicm_tpu.eval.xdmf import write_xdmf
    from vbicm_tpu.mesh import read_feap_mesh, write_feap_mesh

    mesh = beam_hex8_mesh(3, 2, 2, lx=3.0)
    p = str(tmp_path / "beam3d.txt")
    write_feap_mesh(p, mesh)
    back = read_feap_mesh(p)
    assert back.space_dim == 3 and back.max_node_dof == 3 and back.max_ele_node == 8
    np.testing.assert_allclose(back.coords, mesh.coords, atol=0)
    np.testing.assert_array_equal(back.conn, mesh.conn)
    np.testing.assert_array_equal(back.bc_nodes, mesh.bc_nodes)
    np.testing.assert_allclose(back.load_vals, mesh.load_vals, atol=0)

    model = build_fem_model(back, SEC3D)
    sol = fea_solution(model, MaterialCard(E=E0, v=V0))
    h5 = str(tmp_path / "beam3d.h5")
    write_xdmf(h5, model, [np.asarray(sol.u)], mag=1.0)
    import h5py

    with h5py.File(h5, "r") as f:
        assert f["topology"].shape == (model.nele, 8)
        assert f["step0"].shape == (model.nnodes, 3)
    xml = open(str(tmp_path / "beam3d.xdmf")).read()
    assert "Hexahedron" in xml and "XYZ" in xml


def test_beam_theory_convergence():
    """Tip deflection approaches Euler-Bernoulli + shear (Timoshenko) as the
    mesh refines — a sanity anchor on absolute physics, loose tolerance."""
    P, L, b, h = 1.0, 8.0, 1.0, 1.0
    I = b * h**3 / 12.0
    Ashear = 5.0 / 6.0 * b * h
    mu = E0 / (2 * (1 + V0))
    w_timo = P * L**3 / (3 * E0 * I) + P * L / (mu * Ashear)

    mesh = beam_hex8_mesh(16, 2, 4, lx=L, ly=b, lz=h, tip_force=(0.0, 0.0, -P))
    model = build_fem_model(mesh, SEC3D)
    sol = fea_solution(model, MaterialCard(E=E0, v=V0))
    uz = np.asarray(sol.u).reshape(-1, 3)[:, 2]
    tip = np.isclose(mesh.coords[:, 0], L)
    w_fem = -uz[tip].mean()
    # hex8 with nu>0 is stiff (shear locking) on coarse meshes; 15% window
    assert abs(w_fem - w_timo) / w_timo < 0.15
