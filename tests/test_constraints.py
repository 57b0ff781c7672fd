"""Equality (multi-point) constraints — reference eqcgroup capability
(src/fem_preprocess.py:308-324): groups of (node, direction) dofs share one
unknown. Verified against an explicit scipy constraint-elimination oracle.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import MaterialCard
from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.element import material_coeffs
from vbicm_tpu.solver import expand_dofs, fea_solution, make_solver


@pytest.fixture(scope="module")
def tied_model():
    """Cook's 8x4 with the two top-right edge nodes tied in BOTH directions
    (a rigid link), plus an x-tie between two interior nodes."""
    mesh = cooks_membrane_mesh(8, 4)
    nn = mesh.nnodes
    top_right = nn - 1
    below = nn - 1 - 9  # one row down (nx+1 = 9)
    groups = [
        [(top_right, 0), (below, 0)],
        [(top_right, 1), (below, 1)],
        [(20, 0), (21, 0)],
    ]
    return build_fem_model(mesh, eq_groups=groups), mesh, groups


def _oracle(model_unc, groups, E, v):
    """Constraint elimination on the UNCONSTRAINED full system: u = T q with
    T mapping reduced unknowns to full dofs; solve T^T K T q = T^T f."""
    import scipy.linalg

    lam, mu = material_coeffs(2, E, v)
    ndof = model_unc.ndof
    K = np.zeros((ndof, ndof))
    lm = np.asarray(model_unc.lm)
    ke = lam * np.asarray(model_unc.ke_lam) + mu * np.asarray(model_unc.ke_mu)
    for e in range(lm.shape[0]):
        K[np.ix_(lm[e], lm[e])] += ke[e]
    f = np.asarray(model_unc.f_ext)

    group_of = -np.ones(ndof, dtype=int)
    for k, g in enumerate(groups):
        for node, d in g:
            group_of[2 * node + d] = k
    uncon = np.nonzero(group_of == -1)[0]
    nred = uncon.size + len(groups)
    T = np.zeros((ndof, nred))
    for i, d in enumerate(uncon):
        T[d, i] = 1.0
    for k, g in enumerate(groups):
        for node, d in g:
            T[2 * node + d, uncon.size + k] = 1.0

    Kr = T.T @ K @ T
    fr = T.T @ f
    # apply the clamped left edge in reduced space
    fixed_full = np.zeros(ndof, dtype=bool)
    fixed_full[np.asarray(model_unc.supp_dof)] = True
    fixed_red = (T.T @ fixed_full.astype(float)) > 0
    free = np.nonzero(~fixed_red)[0]
    q = np.zeros(nred)
    q[free] = scipy.linalg.solve(Kr[np.ix_(free, free)], fr[free])
    return T @ q  # full-space displacement


def test_constrained_solve_matches_elimination_oracle(tied_model):
    model, mesh, groups = tied_model
    model_unc = build_fem_model(mesh)
    u_ref_full = _oracle(model_unc, groups, 20.0, 0.3)

    sol = fea_solution(model, MaterialCard(E=20.0, v=0.3))
    u_full = np.asarray(expand_dofs(model, sol.u))
    np.testing.assert_allclose(u_full, u_ref_full, rtol=1e-10, atol=1e-13)

    # tied dofs really are equal
    nn = mesh.nnodes
    assert u_full[2 * (nn - 1)] == u_full[2 * (nn - 1 - 9)]
    assert u_full[2 * (nn - 1) + 1] == u_full[2 * (nn - 1 - 9) + 1]


def test_constrained_model_bookkeeping(tied_model):
    model, mesh, groups = tied_model
    assert model.has_constraints
    assert model.ndof == 2 * mesh.nnodes - 3  # 3 groups of 2 merge 3 dofs
    assert model.ndof_full == 2 * mesh.nnodes
    # load accumulation: the shared tip dof carries both members' loads
    f_full = np.zeros(model.ndof_full)
    for n, vals in zip(mesh.load_nodes, mesh.load_vals):
        f_full[2 * n] += vals[0]
        f_full[2 * n + 1] += vals[1]
    dof_map = np.asarray(model.dof_map)
    nn = mesh.nnodes
    shared = dof_map[2 * (nn - 1) + 1]
    expected = f_full[2 * (nn - 1) + 1] + f_full[2 * (nn - 1 - 9) + 1]
    np.testing.assert_allclose(float(model.f_ext[shared]), expected)


def test_constrained_solver_differentiable(tied_model):
    import jax

    model, _, _ = tied_model
    solve = make_solver(model)

    def tip(lam, mu):
        return solve(lam, mu)[-1]

    g = jax.grad(tip, argnums=(0, 1))(11.54, 7.69)
    assert np.all(np.isfinite(np.asarray(g)))
    eps = 1e-6
    fd = (float(tip(11.54 + eps, 7.69)) - float(tip(11.54 - eps, 7.69))) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), fd, rtol=1e-5)


def test_constrained_matfree_solver(tied_model):
    """The matrix-free CG path works on the reduced system (segment-sum
    scatters accumulate duplicate element-dof contributions correctly,
    unlike the fancy-index host assembly this feature exposed)."""
    model_d, mesh, groups = tied_model
    model_mf = build_fem_model(mesh, eq_groups=groups, dense=False)
    u_d = np.asarray(make_solver(model_d)(*material_coeffs(2, 20.0, 0.3)))
    u_mf = np.asarray(make_solver(model_mf, cg_tol=1e-13)(*material_coeffs(2, 20.0, 0.3)))
    np.testing.assert_allclose(u_mf, u_d, rtol=1e-8, atol=1e-11)


def test_combined_prescribed_constraints_body_force():
    """All three BC/load features at once — prescribed displacements,
    equality constraints, body force — against a single scipy oracle built
    from first principles (T^T K T reduction + Dirichlet lift)."""
    import dataclasses

    import scipy.linalg

    mesh0 = cooks_membrane_mesh(6, 3)
    nn = mesh0.nnodes  # 7x4 grid = 28
    # prescribe the right edge, tie two interior nodes in y
    right = (np.arange(4, dtype=np.int32) * 7) + 6
    mesh = dataclasses.replace(
        mesh0,
        disp_nodes=right,
        disp_vals=np.tile(np.array([[0.02, 0.08]]), (4, 1)),
    )
    groups = [[(9, 1), (10, 1)]]
    bf = (0.0, -0.1)
    model = build_fem_model(mesh, eq_groups=groups, body_force=bf)

    # oracle on the unconstrained full system
    model_f = build_fem_model(mesh, body_force=bf)  # full space w/ lift data
    lam, mu = material_coeffs(2, 20.0, 0.3)
    ndof = model_f.ndof_full
    K = np.zeros((ndof, ndof))
    lm = np.asarray(model_f.lm)
    ke = lam * np.asarray(model_f.ke_lam) + mu * np.asarray(model_f.ke_mu)
    for e in range(lm.shape[0]):
        K[np.ix_(lm[e], lm[e])] += ke[e]
    f = np.asarray(model_f.f_ext)  # includes the body load
    fixed = np.zeros(ndof, dtype=bool)
    fixed[np.asarray(model_f.supp_dof)] = True
    pres = np.zeros(ndof)
    pres[np.asarray(model_f.supp_dof)] = np.asarray(model_f.u_supp)

    # constraint basis
    group_of = -np.ones(ndof, dtype=int)
    for k, g in enumerate(groups):
        for node, d in g:
            group_of[2 * node + d] = k
    uncon = np.nonzero(group_of == -1)[0]
    nred = uncon.size + len(groups)
    T = np.zeros((ndof, nred))
    for i, d in enumerate(uncon):
        T[d, i] = 1.0
    for k, g in enumerate(groups):
        for node, d in g:
            T[2 * node + d, uncon.size + k] = 1.0

    Kr = T.T @ K @ T
    fr = T.T @ f
    fixed_r = (T.T @ fixed.astype(float)) > 0
    # prescribed values carried into reduced space (max per group)
    ur_s = np.zeros(nred)
    for d in range(ndof):
        j = np.nonzero(T[d])[0][0]
        if fixed[d] and pres[d] != 0.0:
            ur_s[j] = pres[d]
    free = np.nonzero(~fixed_r)[0]
    supp = np.nonzero(fixed_r)[0]
    q = np.zeros(nred)
    q[supp] = ur_s[supp]
    q[free] = scipy.linalg.solve(
        Kr[np.ix_(free, free)], fr[free] - Kr[np.ix_(free, supp)] @ ur_s[supp]
    )
    u_full_oracle = T @ q

    sol = fea_solution(model, MaterialCard(E=20.0, v=0.3))
    u_full = np.asarray(expand_dofs(model, sol.u))
    np.testing.assert_allclose(u_full, u_full_oracle, rtol=1e-9, atol=1e-12)
