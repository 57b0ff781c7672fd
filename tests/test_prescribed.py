"""Nonzero prescribed-displacement (Dirichlet lift) support.

The reference merges DISPlacement rows into the support set and carries the
prescribed values through the solve by embedding Us into u_n1 before
assembly (src/fem_preprocess.py:252-262, src/fem_solver.py:74-101), which
yields u_f = K_ff^-1 (f_f - K_fs u_s). These tests check every solver family
against an independent scipy partitioned-solve oracle on a disp-controlled
Cook's variant, plus gradients through the lifted solve.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import MaterialCard, ProblemConfig
from vbicm_tpu.mesh.cooks import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.element import material_coeffs
from vbicm_tpu.solver import fea_solution, make_fh_fun, make_solver

UX, UY = 0.03, 0.12  # prescribed right-edge displacement


def disp_controlled_mesh(nx=8, ny=4):
    """Cook's membrane with the right edge displacement-controlled
    (prescribed (UX, UY)) instead of force-loaded."""
    mesh = cooks_membrane_mesh(nx, ny)
    right = (np.arange(ny + 1, dtype=np.int32) * (nx + 1)) + nx
    return dataclasses.replace(
        mesh,
        load_nodes=np.zeros((0,), dtype=np.int32),
        load_vals=np.zeros((0, 2), dtype=np.float64),
        disp_nodes=right,
        disp_vals=np.tile(np.array([[UX, UY]]), (ny + 1, 1)),
    )


@pytest.fixture(scope="module")
def disp_model():
    return build_fem_model(disp_controlled_mesh())


@pytest.fixture(scope="module")
def oracle(disp_model):
    """scipy partitioned solve on the same affine K parts."""
    import scipy.linalg

    m = disp_model
    lam, mu = material_coeffs(2, 20.0, 0.3)
    ndof = m.ndof
    K = np.zeros((ndof, ndof))
    lm = np.asarray(m.lm)
    ke = lam * np.asarray(m.ke_lam) + mu * np.asarray(m.ke_mu)
    for e in range(lm.shape[0]):
        K[np.ix_(lm[e], lm[e])] += ke[e]
    free = np.asarray(m.free_dof)
    supp = np.asarray(m.supp_dof)
    u_s = np.asarray(m.u_supp)
    f = np.asarray(m.f_ext)
    u_f = scipy.linalg.solve(
        K[np.ix_(free, free)], f[free] - K[np.ix_(free, supp)] @ u_s
    )
    u = np.zeros(ndof)
    u[free] = u_f
    u[supp] = u_s
    reactions = K[np.ix_(supp, free)] @ u_f + K[np.ix_(supp, supp)] @ u_s
    return u, supp, reactions


def test_support_set_and_values(disp_model):
    """Prescribed dofs are marked supported with their values carried."""
    m = disp_model
    assert m.has_prescribed
    # 5 clamped left-edge nodes x 2 + 5 right-edge nodes x 2
    assert m.supp_dof.shape[0] == 2 * (4 + 1) * 2
    vals = np.asarray(m.u_supp)
    assert set(np.round(vals[vals != 0.0], 6)) == {UX, UY}


@pytest.mark.parametrize("method", ["spectral", "cholesky"])
def test_dense_solvers_match_oracle(disp_model, oracle, method):
    u_ref, _, _ = oracle
    solve = make_solver(disp_model, method=method)
    u = np.asarray(solve(*material_coeffs(2, 20.0, 0.3)))
    np.testing.assert_allclose(u, u_ref, rtol=1e-10, atol=1e-13)


def test_matfree_solver_matches_oracle(oracle):
    u_ref, _, _ = oracle
    m = build_fem_model(disp_controlled_mesh(), dense=False)
    solve = make_solver(m, cg_tol=1e-13)
    u = np.asarray(solve(*material_coeffs(2, 20.0, 0.3)))
    np.testing.assert_allclose(u, u_ref, rtol=1e-8, atol=1e-11)


def test_reactions_match_oracle(disp_model, oracle):
    u_ref, supp, react_ref = oracle
    sol = fea_solution(disp_model, MaterialCard(E=20.0, v=0.3))
    np.testing.assert_allclose(np.asarray(sol.u), u_ref, rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(sol.reactions)[supp], react_ref, rtol=1e-9, atol=1e-11
    )


def test_gradients_through_lift_match_fd(disp_model):
    """d(probe)/d(theta) through the lifted solve vs central differences."""
    cfg = ProblemConfig()
    # probe ids valid on the 8x4 mesh
    cfg = dataclasses.replace(cfg, node_id=disp_model.nnodes, ele_id=5)
    fh = make_fh_fun(disp_model, cfg)

    def scalar(theta):
        y, h = fh(theta)
        return jnp.sum(y) + jnp.sum(h)

    theta0 = jnp.array([0.3, -0.2])
    g = np.asarray(jax.grad(scalar)(theta0))
    eps = 1e-5
    for i in range(2):
        dt = np.zeros(2)
        dt[i] = eps
        fd = (float(scalar(theta0 + dt)) - float(scalar(theta0 - dt))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=5e-6)


def test_reference_golden_disp_control():
    """Full parity vs the ACTUAL reference NumPy solver on a disp-controlled
    20x10 Cook's mesh (right edge prescribed (0.03, 0.12)): displacements,
    von Mises probe, and support reactions (Ps). Golden produced by running
    /root/reference/src/fem_solver.py on tests/fixtures/cooksm_20x10_dispctrl.txt."""
    import json
    import os

    from vbicm_tpu.mesh.feap import read_feap_mesh
    from vbicm_tpu.solver import probe_von_mises

    fdir = os.path.join(os.path.dirname(__file__), "fixtures")
    with open(os.path.join(fdir, "reference_golden_dispctrl.json")) as f:
        cases = json.load(f)
    mesh = read_feap_mesh(os.path.join(fdir, "cooksm_20x10_dispctrl.txt"))
    model = build_fem_model(mesh)
    assert model.has_prescribed

    for case in cases:
        sol = fea_solution(model, MaterialCard(E=case["E"], v=case["v"]))
        u = np.asarray(sol.u)
        np.testing.assert_allclose(u[460:462], case["u_node231"], rtol=1e-9)
        np.testing.assert_allclose(u[:12], case["u_head"], rtol=1e-9, atol=1e-15)
        np.testing.assert_allclose(u[-12:], case["u_tail"], rtol=1e-9, atol=1e-15)
        np.testing.assert_allclose(np.linalg.norm(u), case["u_norm"], rtol=1e-10)
        c0, c1 = material_coeffs(2, case["E"], case["v"])
        vm = np.asarray(
            probe_von_mises(model, sol.u, c0, c1, 12, np.array([1, 3]))
        )
        np.testing.assert_allclose(vm, case["vm_e12_q13"], rtol=1e-9)
        supp = np.asarray(case["supp_dof"])
        np.testing.assert_allclose(
            np.asarray(sol.reactions)[supp], case["Ps"], rtol=1e-8, atol=1e-12
        )


def test_force_controlled_models_unchanged(cooks_model):
    """Force-controlled models take the zero-lift fast path."""
    assert not cooks_model.has_prescribed
    assert float(jnp.abs(cooks_model.u_supp).max(initial=0.0)) == 0.0
