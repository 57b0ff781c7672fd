"""SIMP topology optimization: autodiff sensitivity equals the classic
adjoint formula, OC iteration reduces compliance under the volume budget."""
import jax
import jax.numpy as jnp
import numpy as np

from vbicm_tpu.mesh.rect import cantilever_quad4_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.assembly import assemble_dense
from vbicm_tpu.ops.topopt import make_compliance_problem, optimize_compliance

NX, NY = 12, 4


def _model():
    return build_fem_model(cantilever_quad4_mesh(NX, NY), dense=True)


def test_autodiff_matches_classic_simp_sensitivity():
    model = _model()
    penal, rho_min = 3.0, 1e-3
    prob = make_compliance_problem(model, penal=penal, rmin=1e-9)  # no filtering
    rng = np.random.default_rng(0)
    rho = jnp.asarray(rng.uniform(0.3, 0.9, model.nele))
    c, dc = prob.compliance_and_grad(rho)

    # classic formula: dc/drho_e = -p rho^(p-1) (1-rho_min) u_e' k_e u_e
    scale = rho_min + (1 - rho_min) * rho**penal
    K = assemble_dense(scale[:, None, None] * prob.ke, model.lm, model.ndof)
    free = np.asarray(model.free_dof)
    u = np.zeros(model.ndof)
    u[free] = np.linalg.solve(np.asarray(K)[np.ix_(free, free)], np.asarray(model.f_free))
    ue = u[np.asarray(model.lm)]  # (nele, 8)
    uku = np.einsum("ei,eij,ej->e", ue, np.asarray(prob.ke), ue)
    dc_classic = -penal * np.asarray(rho) ** (penal - 1) * (1 - rho_min) * uku
    np.testing.assert_allclose(np.asarray(dc), dc_classic, rtol=1e-9)


def test_force_inverter_inverts_output_motion():
    from vbicm_tpu.mesh.rect import inverter_quad4_mesh
    from vbicm_tpu.ops.topopt import optimize_mechanism
    from vbicm_tpu.solver import make_finverter_vector

    mesh, in_node, out_node = inverter_quad4_mesh(16, 16)
    k = 20.0  # 0.1 * E * thk
    model = build_fem_model(
        mesh, dense=True,
        nodal_springs=[(in_node, 0, k), (out_node, 0, k)],
    )
    Lv = make_finverter_vector(model, [(out_node, 0, 1)])
    rho, hist = optimize_mechanism(model, Lv, volfrac=0.3, n_iter=40, rmin=1.3)
    # uniform initial design pushes the output in +x; the optimized
    # mechanism INVERTS it
    assert hist["objective"][0] > 0.0
    assert hist["objective"][-1] < -0.1 * hist["objective"][0]
    assert abs(hist["vol"][-1] - 0.3) < 5e-3


def test_oc_optimization_reduces_compliance():
    model = _model()
    volfrac = 0.5
    rho, hist = optimize_compliance(model, volfrac=volfrac, n_iter=15, rmin=1.5)
    c = hist["compliance"]
    assert c[-1] < 0.75 * c[0]
    assert abs(hist["vol"][-1] - volfrac) < 5e-3
    # filter keeps densities in bounds and produces a structure (not uniform)
    assert float(jnp.min(rho)) >= 0.0 and float(jnp.max(rho)) <= 1.0
    assert float(jnp.std(rho)) > 0.2


def test_compliance_includes_nodal_springs():
    # Advisor r2: compliance() must include model.spring_diag (like the
    # mechanism objective already does) — verified against a scipy oracle.
    model = build_fem_model(
        cantilever_quad4_mesh(NX, NY), dense=True,
        nodal_springs=[(5, 1, 4.0), (11, 0, 2.5)],
    )
    prob = make_compliance_problem(model, rmin=1e-9)
    rng = np.random.default_rng(1)
    rho = jnp.asarray(rng.uniform(0.3, 0.9, model.nele))
    c, _ = prob.compliance_and_grad(rho)

    rho_min, penal = 1e-3, 3.0
    scale = rho_min + (1 - rho_min) * np.asarray(rho) ** penal
    K = np.array(assemble_dense(
        jnp.asarray(scale)[:, None, None] * prob.ke, model.lm, model.ndof))
    K[np.diag_indices_from(K)] += np.asarray(model.spring_diag)
    free = np.asarray(model.free_dof)
    f = np.asarray(model.f_free)
    u_f = np.linalg.solve(K[np.ix_(free, free)], f)
    np.testing.assert_allclose(float(c), float(f @ u_f), rtol=1e-10)

    # and it differs from the spring-less compliance
    c0, _ = make_compliance_problem(_model(), rmin=1e-9).compliance_and_grad(rho)
    assert abs(float(c) - float(c0)) > 1e-6
