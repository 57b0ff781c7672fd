"""Modal analysis: natural frequencies/modes from the consistent mass matrix.

The reference gates a consistent mass matrix behind its dynamics card
(``me = dvol * Nm^T den Nm``, ``src/mat_subroutine.py:74-75``; the card
ships off). With ``build_fem_model(with_mass=True)`` the unit-density
element mass blocks are precomputed; this module assembles M, solves the
generalized eigenproblem K phi = omega^2 M phi on the free dofs (host
scipy — a one-time analysis, not a training hot path), and returns natural
frequencies in rad/s.
"""
from __future__ import annotations

import numpy as np

from ..model import FemModel
from ..ops.element import material_coeffs


def assemble_mass(model: FemModel, density: float) -> np.ndarray:
    """Dense consistent mass on the free dofs (host NumPy)."""
    if model.me_unit is None:
        raise ValueError("build the model with with_mass=True")
    lm = np.asarray(model.lm)
    me = density * np.asarray(model.me_unit)
    M = np.zeros((model.ndof, model.ndof))
    edof = lm.shape[1]
    for e in range(lm.shape[0]):
        idx = lm[e]
        if model.has_constraints:
            np.add.at(M, (np.repeat(idx, edof), np.tile(idx, edof)), me[e].ravel())
        else:
            M[np.ix_(idx, idx)] += me[e]
    free = np.asarray(model.free_dof)
    return M[np.ix_(free, free)]


def natural_frequencies(
    model: FemModel, *, E: float = 20.0, v: float = 0.3, density: float = 1.0,
    n_modes: int = 6,
):
    """First ``n_modes`` natural frequencies (rad/s) and free-dof mode shapes."""
    import scipy.linalg

    if model.k_lam_ff is None:
        raise ValueError("modal analysis needs a dense model (dense=True)")
    c0, c1 = material_coeffs(model.stype, E, v)
    K = float(c0) * np.asarray(model.k_lam_ff) + float(c1) * np.asarray(model.k_mu_ff)
    if model.has_springs:
        free = np.asarray(model.free_dof)
        K[np.diag_indices_from(K)] += np.asarray(model.spring_diag)[free]
    M = assemble_mass(model, density)
    w2, phi = scipy.linalg.eigh(K, M, subset_by_index=[0, n_modes - 1])
    return np.sqrt(np.maximum(w2, 0.0)), phi
