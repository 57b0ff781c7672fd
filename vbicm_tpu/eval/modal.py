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


def natural_frequencies_matfree(
    model: FemModel,
    solve_rhs,
    *,
    E: float = 20.0,
    v: float = 0.3,
    density: float = 1.0,
    n_modes: int = 6,
    n_extra: int = 4,
    n_iter: int = 60,
    tol: float = 1e-10,
    seed: int = 0,
):
    """First ``n_modes`` natural frequencies WITHOUT assembling K or M —
    the scalable sibling of :func:`natural_frequencies` for the structured
    solver paths (the dense route needs an (ndof, ndof) host eigh; at the
    3-D scaled config that is a >25 GB matrix).

    Block inverse (subspace) iteration with Rayleigh-Ritz: per sweep, one
    preconditioned-CG solve per subspace column through ``solve_rhs``
    (``solve_rhs(coeffs (2,), b (ndof,)) -> u`` — the handle returned by
    ``make_two_level_solver[_box3d](..., with_rhs_solver=True)`` or
    ``ops.solve.make_matfree_affine_solver`` directly), K/M applications as
    matrix-free element matvecs (sorted-segment-sum scatter), and an
    (m, m) Rayleigh-Ritz eigh on device. Everything batched over the
    subspace with ``vmap`` — the solves share one CG while_loop.

    Returns ``(omega (n_modes,) rad/s ascending, phi (ndof, n_modes))``
    with M-orthonormal full-dof mode shapes (zeros on supports) — note the
    dense path returns FREE-dof shapes instead.
    """
    from ..ops.assembly import make_sorted_scatter

    if model.me_unit is None:
        raise ValueError("build the model with with_mass=True")
    if model.has_constraints:
        raise NotImplementedError(
            "constrained models: use the dense natural_frequencies"
        )
    import jax
    import jax.numpy as jnp

    c0, c1 = material_coeffs(model.stype, E, v)
    coeffs = jnp.stack(
        [jnp.asarray(c0, model.dtype), jnp.asarray(c1, model.dtype)]
    )
    mask = jnp.asarray(model.free_mask)
    lm = jnp.asarray(model.lm)
    scatter = make_sorted_scatter(np.asarray(model.lm), model.ndof)
    if model.has_springs:
        # the matrix-free solve_rhs paths exclude the spring diagonal, so
        # inverse iteration would converge to the wrong operator's modes
        raise NotImplementedError(
            "spring-bearing models: use the dense natural_frequencies"
        )
    ke = coeffs[0] * model.ke_lam + coeffs[1] * model.ke_mu
    me = jnp.asarray(density) * model.me_unit

    def _mv(blocks, x):
        qe = jnp.einsum(
            "eij,ej->ei", blocks, (x * mask)[lm],
            precision=jax.lax.Precision.HIGHEST,
        )
        return scatter(qe) * mask

    k_cols = jax.vmap(lambda x: _mv(ke, x), in_axes=1, out_axes=1)
    m_cols = jax.vmap(lambda x: _mv(me, x), in_axes=1, out_axes=1)
    solve_cols = jax.vmap(lambda b: solve_rhs(coeffs, b), in_axes=1, out_axes=1)

    m = n_modes + n_extra
    X = jax.random.normal(
        jax.random.PRNGKey(seed), (model.ndof, m), model.dtype
    ) * mask[:, None]

    @jax.jit
    def sweep(X):
        Y = solve_cols(m_cols(X))
        G = Y.T @ m_cols(Y)
        L = jnp.linalg.cholesky(0.5 * (G + G.T))
        Y = jax.scipy.linalg.solve_triangular(L, Y.T, lower=True).T
        A = Y.T @ k_cols(Y)
        w2, S = jnp.linalg.eigh(0.5 * (A + A.T))
        return Y @ S, w2

    w_prev = None
    for _ in range(n_iter):
        X, w2 = sweep(X)
        w = np.sqrt(np.maximum(np.asarray(w2[:n_modes]), 0.0))
        if w_prev is not None and np.all(
            np.abs(w - w_prev) <= tol * np.maximum(w, 1e-300)
        ):
            break
        w_prev = w
    return w, np.asarray(X[:, :n_modes])
