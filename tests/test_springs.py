"""Nodal springs (reference nodal_spring card, src/fem_solver.py:277-286 —
unreachable there) + force-inverter output functional, vs a scipy oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.element import material_coeffs
from vbicm_tpu.solver import fea_solution, make_finverter_vector, make_solver
from vbicm_tpu.config import MaterialCard

SPRINGS = [(5, 0, 7.5), (5, 1, 2.0), (17, 1, 11.0)]


def _oracle(model, lam, mu):
    lm = np.asarray(model.lm)
    K = np.zeros((model.ndof, model.ndof))
    ke = lam * np.asarray(model.ke_lam) + mu * np.asarray(model.ke_mu)
    for e in range(lm.shape[0]):
        K[np.ix_(lm[e], lm[e])] += ke[e]
    K[np.diag_indices_from(K)] += np.asarray(model.spring_diag)
    f = np.asarray(model.f_ext)
    free = np.asarray(model.free_dof)
    u = np.zeros(model.ndof)
    u[free] = np.linalg.solve(K[np.ix_(free, free)], f[free])
    return u, K


def test_spring_solve_matches_oracle():
    model = build_fem_model(
        cooks_membrane_mesh(8, 4), dense=True, nodal_springs=SPRINGS
    )
    mat = MaterialCard()
    c0, c1 = material_coeffs(model.stype, mat.E, mat.v)
    u_ora, K = _oracle(model, c0, c1)
    sol = fea_solution(model, mat)
    np.testing.assert_allclose(np.asarray(sol.u), u_ora, atol=1e-10)
    # springs actually change the answer
    base = fea_solution(build_fem_model(cooks_membrane_mesh(8, 4), dense=True), mat)
    assert float(jnp.max(jnp.abs(sol.u - base.u))) > 1e-3
    # equilibrium: reactions balance applied loads (spring forces are
    # internal-external at grounded nodes: sum reactions + springs = f_ext)
    spring_f = np.asarray(model.spring_diag) * np.asarray(sol.u)
    resid = K @ np.asarray(sol.u) - np.asarray(model.f_ext)
    free = np.asarray(model.free_dof)
    np.testing.assert_allclose(resid[free], 0.0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(sol.reactions)[free], spring_f[free] * 0.0, atol=1e-12
    )


def test_spring_gradients_fd():
    model = build_fem_model(
        cooks_membrane_mesh(4, 2), dense=True, nodal_springs=[(3, 1, 5.0)]
    )
    solve = make_solver(model, method="cholesky")

    def qoi(lam, mu):
        return jnp.sum(solve(lam, mu) ** 2)

    lam, mu = 11.54, 7.69
    g = jax.grad(qoi, argnums=(0, 1))(jnp.asarray(lam), jnp.asarray(mu))
    eps = 1e-6
    for i, (dl, dm) in enumerate([(eps, 0.0), (0.0, eps)]):
        fd = (qoi(jnp.asarray(lam + dl), jnp.asarray(mu + dm))
              - qoi(jnp.asarray(lam - dl), jnp.asarray(mu - dm))) / (2 * eps)
        assert abs(float(g[i]) - float(fd)) < 1e-5 * max(1.0, abs(float(fd)))


def test_finverter_vector_and_matfree_raises():
    model = build_fem_model(
        cooks_membrane_mesh(4, 2), dense=True, nodal_springs=[(3, 1, 5.0)]
    )
    L = make_finverter_vector(model, [(7, 0, -1)])
    assert float(L[2 * 7]) == -1.0 and float(jnp.sum(jnp.abs(L))) == 1.0
    mf = build_fem_model(
        cooks_membrane_mesh(4, 2), dense=False, nodal_springs=[(3, 1, 5.0)]
    )
    with pytest.raises(NotImplementedError):
        make_solver(mf)
