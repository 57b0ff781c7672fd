"""Multi-slice (dcn x ici) hybrid-mesh layout on the virtual CPU mesh:
samples over the slow axis, per-iteration CG collectives over the fast one."""
import jax
import jax.numpy as jnp
import numpy as np

from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.element import material_coeffs
from vbicm_tpu.parallel.multislice import get_hybrid_mesh, make_multislice_solver
from vbicm_tpu.solver import make_solver


def test_hybrid_mesh_shape_and_axes():
    mesh = get_hybrid_mesh(2)
    assert mesh.axis_names == ("dcn", "ici")
    assert mesh.devices.shape == (2, len(jax.devices()) // 2)
    mesh42 = get_hybrid_mesh(4, 2)
    assert mesh42.devices.shape == (4, 2)


def test_multislice_solver_matches_unsharded():
    mesh = get_hybrid_mesh(2, 4)
    model = build_fem_model(cooks_membrane_mesh(8, 4), dense=False)
    solve = make_multislice_solver(model, mesh, tol=1e-12)
    c0, c1 = material_coeffs(2, 20.0, 0.3)
    B = 4
    coeffs = jnp.tile(jnp.asarray([c0, c1])[None, :], (B, 1))
    u = solve(coeffs)
    dense = build_fem_model(cooks_membrane_mesh(8, 4), dense=True)
    u_ref = make_solver(dense)(jnp.asarray(c0), jnp.asarray(c1))
    scale = float(jnp.max(jnp.abs(u_ref)))
    np.testing.assert_allclose(np.asarray(u[0]), np.asarray(u_ref),
                               atol=1e-8 * scale)
    # all samples identical coeffs -> identical rows (lane independence)
    un = np.asarray(u)
    assert np.max(np.abs(un - un[0])) < 1e-12 * scale
