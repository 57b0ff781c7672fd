"""Matrix-free modal analysis (subspace iteration through the
preconditioned-CG rhs solvers) against the dense scipy generalized eigh.

The dense path (`eval.modal.natural_frequencies`) needs an (ndof, ndof)
host matrix — unusable at the scaled/3-D configs this framework targets;
`natural_frequencies_matfree` reuses the production solve machinery
instead (no counterpart anywhere in the reference, which has no dynamics
at all — its mass-matrix code `src/mat_subroutine.py:74-75` ships behind
a card that is off)."""
import jax.numpy as jnp
import numpy as np

from vbicm_tpu.config import SectionCard
from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.mesh.solid3d import beam_hex8_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.eval.modal import (
    assemble_mass,
    natural_frequencies,
    natural_frequencies_matfree,
)

E, V, RHO = 20.0, 0.3, 2.5


def _mode_residual(model, w, phi, density):
    """max_k ||K phi_k - w_k^2 M phi_k|| / ||K phi_k|| on the free dofs."""
    import scipy.linalg

    from vbicm_tpu.ops.element import material_coeffs

    c0, c1 = material_coeffs(model.stype, E, V)
    K = float(c0) * np.asarray(model.k_lam_ff) + float(c1) * np.asarray(
        model.k_mu_ff
    )
    M = assemble_mass(model, density)
    free = np.asarray(model.free_dof)
    pf = phi[free]
    r = K @ pf - M @ pf * (w**2)[None, :]
    return float(
        np.max(
            np.linalg.norm(r, axis=0) / np.linalg.norm(K @ pf, axis=0)
        )
    )


def test_matfree_modal_matches_dense_2d():
    from vbicm_tpu.ops.solve import make_matfree_affine_solver

    model = build_fem_model(cooks_membrane_mesh(8, 4), with_mass=True)
    solve_rhs = make_matfree_affine_solver(
        jnp.stack([model.ke_lam, model.ke_mu]),
        model.lm,
        model.free_mask,
        model.ndof,
        tol=1e-13,
        maxiter=4000,
    )
    w_ref, _ = natural_frequencies(model, E=E, v=V, density=RHO, n_modes=5)
    w, phi = natural_frequencies_matfree(
        model, solve_rhs, E=E, v=V, density=RHO, n_modes=5
    )
    np.testing.assert_allclose(w, w_ref, rtol=1e-8)
    # eigenpair residual: Ritz VALUES converge quadratically, shapes only
    # linearly — at the 1e-10 value stop the shape residual sits near
    # sqrt(tol), so pin the standard modal-solver level
    assert _mode_residual(model, w, phi, RHO) < 1e-5
    # supports carry zeros (full-dof masked shapes)
    supp = np.asarray(model.supp_dof)
    assert np.max(np.abs(phi[supp])) == 0.0


def test_matfree_modal_box3d_through_two_level_rhs_solver():
    from vbicm_tpu.solver import make_two_level_solver_box3d

    sec = SectionCard(stype=4)
    fine = build_fem_model(
        beam_hex8_mesh(4, 2, 2), sec, dense=False, with_mass=True
    )
    coarse = build_fem_model(beam_hex8_mesh(2, 1, 1), sec, dense=True)
    solve_free, solve_rhs = make_two_level_solver_box3d(
        fine, coarse, (2, 1, 1), 2, tol=1e-13, maxiter=2000,
        with_rhs_solver=True,
    )
    dense = build_fem_model(
        beam_hex8_mesh(4, 2, 2), sec, dense=True, with_mass=True
    )
    w_ref, _ = natural_frequencies(dense, E=E, v=V, density=RHO, n_modes=4)
    w, phi = natural_frequencies_matfree(
        fine, solve_rhs, E=E, v=V, density=RHO, n_modes=4
    )
    np.testing.assert_allclose(w, w_ref, rtol=1e-8)
    assert _mode_residual(dense, w, phi, RHO) < 1e-5
