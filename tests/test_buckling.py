"""Linearized buckling: the autodiff geometric stiffness against a finite
difference of the exact tangent, and the Euler cantilever column."""
import jax
import jax.numpy as jnp
import numpy as np

from vbicm_tpu.config import MaterialCard, SectionCard
from vbicm_tpu.eval.buckling import buckling_factors, geometric_stiffness
from vbicm_tpu.mesh.rect import rect_quad4_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.finite_strain import NeoHookean, make_total_potential
from vbicm_tpu.solver import fea_solution

E0, V0 = 20.0, 0.3
LAM0 = V0 * E0 / ((1 + V0) * (1 - 2 * V0))
MU0 = E0 / (2 * (1 + V0))


def test_geometric_stiffness_matches_fd_hessian():
    mesh = rect_quad4_mesh(2, 6, lx=1.0, ly=3.0, top_load=(0.0, -1.0))
    model = build_fem_model(mesh, SectionCard(intp=2, thk=1.0, stype=2))
    u0 = fea_solution(model, MaterialCard(E=E0, v=V0)).u
    Kg = geometric_stiffness(model, LAM0, MU0, u0)

    pot = make_total_potential(model)
    mat = NeoHookean(lam=jnp.asarray(LAM0), mu=jnp.asarray(MU0))
    mask = model.free_mask
    grad_u = jax.grad(lambda u: pot(u, mat))
    free = np.asarray(model.free_dof)

    rng = np.random.default_rng(0)
    v_f = rng.standard_normal(free.shape[0])
    v = np.zeros(model.ndof)
    v[free] = v_f
    v = jnp.asarray(v)
    u0m = jnp.asarray(u0) * mask

    def hess_v(s):
        _, hv = jax.jvp(grad_u, (s * u0m,), (v,))
        return np.asarray(hv * mask)[free]

    e = 1e-6
    fd = (hess_v(e) - hess_v(-e)) / (2 * e)
    np.testing.assert_allclose(Kg @ v_f, fd, rtol=1e-6, atol=1e-10)


def test_euler_cantilever_column():
    """Critical load of a clamped-free column under tip compression:
    P_cr = pi^2 E' I / (4 L^2) with the plane-strain modulus E' = E/(1-v^2).
    quad4 full integration is slightly stiff in bending — 10% window."""
    h, L, thk = 1.0, 20.0, 1.0
    mesh = rect_quad4_mesh(4, 60, lx=h, ly=L, top_load=(0.0, -1.0))
    model = build_fem_model(mesh, SectionCard(intp=2, thk=thk, stype=2))
    factors, modes = buckling_factors(model, E=E0, v=V0, n_modes=2)

    Ep = E0 / (1.0 - V0**2)
    I = thk * h**3 / 12.0
    p_cr = np.pi**2 * Ep * I / (4.0 * L**2)
    assert abs(factors[0] - p_cr) / p_cr < 0.10
    # second mode of the clamped-free column is ~9x the first
    assert 7.0 < factors[1] / factors[0] < 11.0
    # first mode is a lateral sway: x-motion dominates y-motion
    free = np.asarray(model.free_dof)
    m = np.zeros(model.ndof)
    m[free] = modes[:, 0]
    mx = np.abs(m.reshape(-1, 2)[:, 0]).max()
    my = np.abs(m.reshape(-1, 2)[:, 1]).max()
    assert mx > 5.0 * my


def test_buckling_rejects_prescribed_displacement_models():
    # Advisor r2: K_G scales only the free-dof state by the load factor, so
    # displacement-driven models are out of scope and must be rejected.
    import dataclasses
    import pytest
    from vbicm_tpu.mesh import cooks_membrane_mesh

    mesh = cooks_membrane_mesh(4, 2)
    right = (np.arange(3, dtype=np.int32) * 5) + 4
    mesh = dataclasses.replace(
        mesh,
        load_nodes=np.zeros((0,), dtype=np.int32),
        load_vals=np.zeros((0, 2), dtype=np.float64),
        disp_nodes=right,
        disp_vals=np.tile(np.array([[0.01, 0.05]]), (3, 1)),
    )
    model = build_fem_model(mesh, dense=True)
    assert model.has_prescribed
    with pytest.raises(NotImplementedError, match="force-driven"):
        buckling_factors(model)
