"""Finite-strain Neo-Hookean: homogeneous-deformation patch tests, the
small-strain limit against the linear solver, analytic Cauchy stress, and
implicit-adjoint gradients vs finite differences."""
import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from vbicm_tpu.config import MaterialCard, SectionCard
from vbicm_tpu.mesh import cooks_membrane_mesh, cube_hex8_mesh, beam_hex8_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.finite_strain import (
    NeoHookean,
    cauchy_stress,
    deformation_gradient,
    make_finite_strain_solver,
    make_total_potential,
    psi_neo_hookean,
    shape_gradients_from_B,
    solve_finite_strain,
)
from vbicm_tpu.solver import fea_solution

E0, V0 = 20.0, 0.3
LAM0 = V0 * E0 / ((1 + V0) * (1 - 2 * V0))
MU0 = E0 / (2 * (1 + V0))


def _recovered_F(model, u):
    G, nel, ndm = shape_gradients_from_B(model)
    ue = u[model.lm].reshape(model.nele, nel, ndm)
    return deformation_gradient(G, ue[:, None, :, :], ndm)


def test_homogeneous_patch_3d():
    """All boundary nodes prescribed with an affine map u = a + G X: the
    free interior must reproduce the affine field exactly (homogeneous F is
    an equilibrium state of any homogeneous hyperelastic body), the energy
    must equal V * psi(F), and the Cauchy stress the analytic Neo-Hookean
    formula sigma = mu/J (FF^T - I) + lam lnJ/J I."""
    mesh = cube_hex8_mesh(3, 1.0)
    a = np.array([0.013, 0.027, 0.041])
    Gm = np.array(
        [
            [0.06, 0.02, 0.01],
            [0.015, -0.04, 0.02],
            [0.01, 0.012, 0.05],
        ]
    )
    u_exact = a[None, :] + mesh.coords @ Gm.T
    on_face = (
        np.isclose(mesh.coords, 0.0).any(axis=1)
        | np.isclose(mesh.coords, 1.0).any(axis=1)
    )
    bnodes = np.nonzero(on_face)[0].astype(np.int32)
    assert np.abs(u_exact[bnodes]).min() > 0.0
    mesh = dataclasses.replace(
        mesh, disp_nodes=bnodes, disp_vals=u_exact[bnodes]
    )
    model = build_fem_model(mesh, SectionCard(intp=2, stype=4))

    res = solve_finite_strain(model, LAM0, MU0)
    assert bool(res.converged)
    u_full = np.asarray(res.u * model.free_mask) + _prescribed(model)
    np.testing.assert_allclose(u_full.reshape(-1, 3), u_exact, atol=1e-10)

    F0 = np.eye(3) + Gm
    mat = NeoHookean(lam=jnp.asarray(LAM0), mu=jnp.asarray(MU0))
    F = _recovered_F(model, jnp.asarray(u_full))
    np.testing.assert_allclose(
        np.asarray(F), np.broadcast_to(F0, np.asarray(F).shape), atol=1e-10
    )
    # internal energy (the potential's integral part; f_ext = 0 here)
    pot = make_total_potential(model)
    energy = float(pot(res.u, mat))
    psi0 = float(psi_neo_hookean(jnp.asarray(F0), mat, 3))
    assert abs(energy - psi0 * 1.0) < 1e-12  # unit volume

    # analytic Cauchy stress
    J = np.linalg.det(F0)
    B = F0 @ F0.T
    sig_exact = MU0 / J * (B - np.eye(3)) + LAM0 * np.log(J) / J * np.eye(3)
    sig = np.asarray(cauchy_stress(F, mat, 3))
    np.testing.assert_allclose(
        sig, np.broadcast_to(sig_exact, sig.shape), atol=1e-10
    )


def _prescribed(model):
    full = np.zeros(model.ndof)
    full[np.asarray(model.supp_dof)] = np.asarray(model.u_supp)
    return full


def test_homogeneous_patch_plane_strain():
    """2-D version on a distorted-free Cook's-style rectangle: plane-strain
    Neo-Hookean with F33 = 1."""
    mesh = cooks_membrane_mesh(4, 4)
    a = np.array([0.31, 0.23])
    Gm = np.array([[0.03, 0.012], [0.008, -0.02]])
    u_exact = a[None, :] + mesh.coords @ Gm.T
    # boundary nodes of the quad grid
    conn = mesh.conn
    from collections import Counter

    edges = Counter()
    for el in conn:
        for k in range(4):
            e = tuple(sorted((int(el[k]), int(el[(k + 1) % 4]))))
            edges[e] += 1
    bset = sorted({n for e, c in edges.items() if c == 1 for n in e})
    bnodes = np.asarray(bset, dtype=np.int32)
    assert np.abs(u_exact[bnodes]).min() > 0.0
    mesh = dataclasses.replace(
        mesh,
        disp_nodes=bnodes,
        disp_vals=u_exact[bnodes],
        load_nodes=np.zeros((0,), np.int32),
        load_vals=np.zeros((0, 2)),
        bc_nodes=np.zeros((0,), np.int32),
        bc_flags=np.zeros((0, 2), np.int32),
    )
    model = build_fem_model(mesh, SectionCard(intp=2, thk=1.0, stype=2))
    res = solve_finite_strain(model, LAM0, MU0)
    assert bool(res.converged)
    u_full = np.asarray(res.u * model.free_mask) + _prescribed(model)
    np.testing.assert_allclose(u_full.reshape(-1, 2), u_exact, atol=1e-9)

    F0 = np.eye(2) + Gm
    mat = NeoHookean(lam=jnp.asarray(LAM0), mu=jnp.asarray(MU0))
    F = _recovered_F(model, jnp.asarray(u_full))
    # analytic plane-strain Cauchy stress (F33 = 1): J = det F_2d
    J = np.linalg.det(F0)
    B2 = F0 @ F0.T
    sig_exact = MU0 / J * (B2 - np.eye(2)) + LAM0 * np.log(J) / J * np.eye(2)
    sig = np.asarray(cauchy_stress(F, mat, 2))
    np.testing.assert_allclose(
        sig, np.broadcast_to(sig_exact, sig.shape), atol=1e-9
    )


def test_small_strain_limit_matches_linear():
    """As the load scales down, the finite-strain solution converges to the
    linear-elastic one at first order: || u_fs/s - u_lin/s || = O(s)."""
    base = cooks_membrane_mesh(8, 4)
    mat = MaterialCard(E=E0, v=V0)

    def rel_gap(s):
        mesh = dataclasses.replace(base, load_vals=base.load_vals * s)
        model = build_fem_model(mesh, SectionCard(intp=2, stype=2))
        u_lin = np.asarray(fea_solution(model, mat).u)
        res = solve_finite_strain(model, mat.lam, mat.mu)
        assert bool(res.converged)
        u_fs = np.asarray(res.u * model.free_mask)
        return np.linalg.norm(u_fs - u_lin) / np.linalg.norm(u_lin)

    g1 = rel_gap(1e-3)
    g2 = rel_gap(1e-4)
    assert g1 < 5e-3
    # first-order convergence in the load scale (allow 20% slack)
    assert g2 < g1 / 10.0 * 1.2


def test_newton_converges_at_moderate_load():
    mesh = cooks_membrane_mesh(8, 4)  # shipped load ~ finite-rotation regime
    model = build_fem_model(mesh, SectionCard(intp=2, stype=2))
    res = solve_finite_strain(model, LAM0, MU0, n_steps=4, max_iter=40)
    assert bool(res.converged)
    u_lin = np.asarray(fea_solution(model, MaterialCard(E=E0, v=V0)).u)
    u_fs = np.asarray(res.u * model.free_mask)
    # geometrically nonlinear answer differs measurably from linear
    gap = np.linalg.norm(u_fs - u_lin) / np.linalg.norm(u_lin)
    assert 0.005 < gap < 1.0


@pytest.mark.slow
def test_implicit_adjoint_gradients():
    mesh = beam_hex8_mesh(3, 2, 2, lx=3.0, tip_force=(0.0, 0.0, -0.05))
    model = build_fem_model(mesh, SectionCard(intp=2, stype=4))
    solver = make_finite_strain_solver(model, tol_cr=1e-14)
    tip_dof = model.ndof - 1

    def qoi(lam, mu):
        return solver(lam, mu)[tip_dof]

    lam, mu = jnp.asarray(LAM0), jnp.asarray(MU0)
    glam, gmu = jax.grad(qoi, argnums=(0, 1))(lam, mu)
    eps = 1e-4
    fd_lam = (float(qoi(lam + eps, mu)) - float(qoi(lam - eps, mu))) / (2 * eps)
    fd_mu = (float(qoi(lam, mu + eps)) - float(qoi(lam, mu - eps))) / (2 * eps)
    assert abs(float(glam) - fd_lam) < 2e-6 * max(1.0, abs(fd_lam))
    assert abs(float(gmu) - fd_mu) < 2e-6 * max(1.0, abs(fd_mu))


def test_finite_strain_rejects_plane_stress():
    # Advisor r2: stype=1 coefficients are condensed plane-stress moduli,
    # not Lame (lam, mu), and the energy assumes F33 = 1 — reject loudly.
    import pytest
    from vbicm_tpu.mesh.rect import rect_quad4_mesh
    from vbicm_tpu.ops.finite_strain import shape_gradients_from_B

    mesh = rect_quad4_mesh(2, 2, lx=1.0, ly=1.0, top_load=(0.0, -1.0))
    model = build_fem_model(mesh, SectionCard(intp=2, thk=1.0, stype=1))
    with pytest.raises(NotImplementedError, match="plane-strain"):
        shape_gradients_from_B(model)
