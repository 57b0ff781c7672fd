"""Public user-material (umat) extension point: a user energy density
callable gets residual/tangent/parameter-gradients derived automatically.

Reference anchor: the dead ``mat_type == 99`` hook
(``src/mat_subroutine.py:210-215``). Our equivalent is an energy-density
callable into ``ops.umat.make_umat_solver``; the J2 deformation-theory
material is the shipped demonstration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import MaterialCard, SectionCard
from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.element import material_coeffs
from vbicm_tpu.ops.umat import (
    J2DeformationMaterial,
    j2_deformation_psi,
    make_umat_solver,
    solve_umat,
)
from vbicm_tpu.solver import fea_solution

E0, V0 = 20.0, 0.3
LAM0 = V0 * E0 / ((1 + V0) * (1 - 2 * V0))
MU0 = E0 / (2 * (1 + V0))


def linear_psi(eps, mat):
    """User-written linear-elastic density 0.5 lam tr^2 + mu eps:eps
    (engineering shear: eps12 = g12/2 contributes 2 mu eps12^2 = mu g12^2/2)."""
    lam, mu = mat
    e11, e22, g12 = eps[..., 0], eps[..., 1], eps[..., 2]
    tr = e11 + e22
    return 0.5 * lam * tr**2 + mu * (e11**2 + e22**2 + 0.5 * g12**2)


@pytest.fixture(scope="module")
def model():
    return build_fem_model(cooks_membrane_mesh(8, 4), SectionCard(intp=2, thk=10.0, stype=2))


def test_umat_linear_matches_linear_solver(model):
    solve = make_umat_solver(model, linear_psi)
    u = solve((jnp.asarray(LAM0), jnp.asarray(MU0)))
    u_ref = fea_solution(model, MaterialCard(E=E0, v=V0)).u
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-9)


def test_umat_parameter_gradients_match_fd(model):
    """Custom-VJP gradients w.r.t. an arbitrary material pytree vs FD."""
    solve = make_umat_solver(model, linear_psi)
    probe = model.ndof // 3

    def qoi(mat):
        return solve(mat)[probe]

    mat0 = (jnp.asarray(LAM0), jnp.asarray(MU0))
    glam, gmu = jax.grad(qoi)(mat0)
    h = 1e-5
    fd_lam = (qoi((mat0[0] + h, mat0[1])) - qoi((mat0[0] - h, mat0[1]))) / (2 * h)
    fd_mu = (qoi((mat0[0], mat0[1] + h)) - qoi((mat0[0], mat0[1] - h))) / (2 * h)
    np.testing.assert_allclose(float(glam), float(fd_lam), rtol=1e-6)
    np.testing.assert_allclose(float(gmu), float(fd_mu), rtol=1e-6)


@pytest.mark.slow
def test_j2_deformation_material(model):
    """The shipped J2 demo: H = 3 mu is exactly linear; low yield stress
    softens the structure (larger tip displacement) and the parameter
    gradient w.r.t. sig_y is nonzero and matches FD."""
    # H = 3 mu -> q(e) = 3 mu e for all e: identical to linear elasticity
    mat_lin = J2DeformationMaterial(
        lam=jnp.asarray(LAM0), mu=jnp.asarray(MU0),
        sig_y=jnp.asarray(0.05), H=jnp.asarray(3.0 * MU0),
    )
    res = solve_umat(model, j2_deformation_psi, mat_lin)
    assert bool(res.converged)
    u_ref = fea_solution(model, MaterialCard(E=E0, v=V0)).u
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(u_ref), atol=1e-8)

    # plastic softening: H << 3 mu with a yield level inside the strain range
    mat_pl = mat_lin._replace(H=jnp.asarray(0.05 * MU0), sig_y=jnp.asarray(0.02))
    res_pl = solve_umat(model, j2_deformation_psi, mat_pl, n_steps=4)
    assert bool(res_pl.converged)
    tip = int(np.argmax(np.abs(np.asarray(u_ref))))
    assert abs(float(res_pl.u[tip])) > abs(float(u_ref[tip])) * 1.02

    solve = make_umat_solver(model, j2_deformation_psi, n_steps=4)

    def qoi(sig_y):
        return solve(mat_pl._replace(sig_y=sig_y))[tip]

    g = jax.grad(qoi)(jnp.asarray(0.02))
    h = 1e-6
    fd = (qoi(jnp.asarray(0.02 + h)) - qoi(jnp.asarray(0.02 - h))) / (2 * h)
    assert abs(float(g)) > 0
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_umat_finite_strain_kind(model):
    """kind='finite_strain': a user psi(F) reproduces the built-in
    Neo-Hookean solver."""
    from vbicm_tpu.ops.finite_strain import psi_neo_hookean, NeoHookean, solve_finite_strain

    def user_psi_F(F, mat):
        lam, mu = mat
        return psi_neo_hookean(F, NeoHookean(lam=lam, mu=mu), 2)

    res = solve_umat(model, user_psi_F, (jnp.asarray(LAM0), jnp.asarray(MU0)),
                     kind="finite_strain")
    assert bool(res.converged)
    ref = solve_finite_strain(model, jnp.asarray(LAM0), jnp.asarray(MU0))
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(ref.u), atol=1e-9)
