"""Random-field material inversion: KL-expansion of a spatially varying
log-Young's-modulus field, inferred by the same amortized two-step VI.

Beyond the reference — its material is homogeneous (two scalars,
``model_property_cards.py:25``; the theta -> (E, nu) map at
``src/data_generation_2sam_more_loss.py:182-186``). This module scales the
PARAMETER dimension instead of the mesh: theta in R^d are the coefficients
of a truncated Karhunen-Loeve expansion of a stationary Gaussian field

    log E(x) = log E0 + sum_k theta_k sqrt(lambda_k) phi_k(x),
    theta_k ~ N(0, 1)  (the VI prior, exactly as in the scalar pipeline)

evaluated at element centroids (piecewise-constant modulus). The forward
solve uses the per-element-coefficient operator
:func:`ops.solve.make_field_solver`; observations are displacement probes
at several nodes (a field needs more than one probe to be identifiable).
Everything downstream — ELBO terms, two-step trainer, MCMC reference —
is already dimension-generic in theta, so this plugs straight into
``TwoStepTrainer(fh=...)`` with ``ProblemConfig(theta_dim=d, y_dim=...)``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ProblemConfig
from ..model import FemModel
from ..ops.element import lame_from_Ev
from ..ops.solve import make_field_solver
from ..ops.vonmises import von_mises_reference


@dataclasses.dataclass(frozen=True)
class KLExpansion:
    """Truncated KL basis of the log-modulus field at element centroids."""

    modes: np.ndarray  # (n_modes, nele): sqrt(lambda_k) * phi_k
    eigvals: np.ndarray  # (n_modes,) covariance eigenvalues
    mean_log: float  # log E0
    corr_len: float
    sigma: float

    @property
    def n_modes(self) -> int:
        return int(self.modes.shape[0])


def element_centroids(model: FemModel) -> np.ndarray:
    """(nele, ndm) element centroids (mean of corner coordinates)."""
    coords = np.asarray(model.coords)
    conn = np.asarray(model.conn)
    return coords[conn].mean(axis=1)


def build_kl_expansion(
    model: FemModel,
    *,
    n_modes: int = 8,
    corr_len: float = 15.0,
    sigma: float = 0.3,
    mean_log: float = float(np.log(20.0)),
    dense_eigh_threshold: int = 2000,
) -> KLExpansion:
    """Host-side KL of a squared-exponential covariance at element centroids.

    C(x, x') = sigma^2 exp(-|x - x'|^2 / (2 l^2)), discretized on the
    centroid cloud with uniform element weights (exact for uniform meshes;
    a consistent-mass Galerkin discretization changes eigenvalues by O(h)).
    Dense eigh — fine to ~20k elements; the offline cost is once per mesh.
    """
    x = element_centroids(model)
    # |x-x'|^2 = |x|^2 + |x'|^2 - 2 x.x' — one BLAS-3 gram matrix instead
    # of the (n, n, ndm) broadcast intermediate (which is 30x slower at
    # nele ~ 1e4: O(n^2 ndm) strided memory traffic vs one GEMM)
    sq = (x**2).sum(axis=1)
    d2 = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (x @ x.T), 0.0)
    C = sigma**2 * np.exp(-d2 / (2.0 * corr_len**2))
    # uniform quadrature weight w = 1/nele keeps phi_k O(1) and orthonormal
    # in the weighted inner product; lambda_k then carry the field variance
    w = 1.0 / C.shape[0]
    if C.shape[0] <= dense_eigh_threshold:
        evals, evecs = np.linalg.eigh(C * w)
        idx = np.argsort(evals)[::-1][:n_modes]
    else:
        # scaled meshes: a dense eigh at nele ~ 1e4 is O(n^3) minutes on
        # one host core. Randomized subspace iteration (Halko et al.) needs
        # only a handful of BLAS-3 passes over C and is exact to working
        # precision for the SE kernel's exponentially decaying spectrum
        # (deterministic seed -> reproducible basis).
        rng = np.random.default_rng(0)
        Cw = C * w
        q = min(n_modes + 8, Cw.shape[0])
        Y = Cw @ rng.standard_normal((Cw.shape[0], q))
        for _ in range(2):  # power iterations sharpen the subspace
            Y, _ = np.linalg.qr(Y)
            Y = Cw @ Y
        Q, _ = np.linalg.qr(Y)
        T = Q.T @ (Cw @ Q)
        T = 0.5 * (T + T.T)
        tvals, tvecs = np.linalg.eigh(T)
        evals = tvals
        evecs = Q @ tvecs
        idx = np.argsort(evals)[::-1][:n_modes]
    lam = np.clip(evals[idx], 0.0, None)
    phi = evecs[:, idx].T / np.sqrt(w)  # orthonormal under w-weighted dot
    modes = np.sqrt(lam)[:, None] * phi
    return KLExpansion(
        modes=modes, eigvals=lam, mean_log=float(mean_log),
        corr_len=float(corr_len), sigma=float(sigma),
    )


def field_from_theta(kl: KLExpansion, theta, dtype=jnp.float64):
    """E(theta): (n_modes,) -> (nele,) positive modulus field."""
    modes = jnp.asarray(kl.modes, dtype)
    return jnp.exp(kl.mean_log + theta.astype(dtype) @ modes)


def posterior_field_moments(kl: KLExpansion, theta_mean, theta_var=None, *, L=None):
    """Closed-form per-element moments of the log-modulus field under a
    Gaussian posterior on the KL coefficients:

        log E(x) = mean_log + sum_k theta_k modes_k(x)
        mean[log E] = mean_log + modes^T theta_mean
        var[log E](x_e) = m_e^T Sigma m_e,   m_e = modes[:, e]

    Pass EITHER ``theta_var`` (mean-field: Sigma = diag(theta_var), the
    variance reduces to modes^2 ^T theta_var) or ``L`` (full-covariance
    Cholesky factor, Sigma = L L^T: std_e = |L^T m_e| — the off-diagonal
    theta correlations project into the field and must not be dropped).

    Returns ``(log_mean, log_std)`` as (nele,) NumPy arrays — the field the
    amortized posterior actually infers, ready for
    ``eval.xdmf.write_xdmf(..., cell_fields=...)`` visualization.
    """
    if (theta_var is None) == (L is None):
        raise ValueError("pass exactly one of theta_var (mean-field) or L (fullcov)")
    tm = np.asarray(theta_mean).reshape(-1)
    log_mean = kl.mean_log + tm @ kl.modes
    if L is not None:
        log_std = np.linalg.norm(np.asarray(L).T @ kl.modes, axis=0)
    else:
        tv = np.asarray(theta_var).reshape(-1)
        log_std = np.sqrt(tv @ (kl.modes**2))
    return log_mean, log_std


def make_mean_field_preconditioner(
    coarse_model: FemModel,
    nx_coarse: int,
    ny_coarse: int,
    ratio: int,
    free_mask,
    *,
    nu: float = 0.3,
    E0: float = 20.0,
    omega: float = 0.6,
) -> Callable:
    """Two-level preconditioner for the FIELD operator, built at the mean
    field E = E0 (homogeneous coefficients).

    The field operator K(E) is spectrally equivalent to the homogeneous
    K(E0) with constants min(E/E0), max(E/E0) — for a lognormal field with
    sigma ~ 0.3 that ratio is ~e^(6 sigma) ~ 6, so the fixed-coefficient
    spectral coarse solve + conv-form transfers precondition EVERY sample
    without per-sample coarse setup. The Jacobi half DOES see the true
    per-sample field (make_field_solver passes the E-weighted diagonal).
    Signature matches ``make_field_solver(preconditioner=...)``:
    ``prec(E, diag_inv, r) -> z``.
    """
    import jax.numpy as jnp  # local alias for clarity

    from ..ops.multigrid import (
        make_grid_transfer_conv,
        make_two_level_preconditioner,
    )
    from ..solver import make_coarse_spectral_apply

    coarse_apply = make_coarse_spectral_apply(coarse_model)
    gt = make_grid_transfer_conv(nx_coarse, ny_coarse, ratio)
    prec2, _, _ = make_two_level_preconditioner(
        None, None, coarse_apply, free_mask, omega=omega, grid_transfer=gt
    )
    lam0, mu0 = lame_from_Ev(E0, nu)
    coeffs0 = jnp.stack([jnp.asarray(lam0), jnp.asarray(mu0)])

    def prec(E, diag_inv, r):
        return prec2(coeffs0.astype(r.dtype), diag_inv, r)

    return prec


def make_mean_field_preconditioner_box3d(
    coarse_model: FemModel,
    cells_coarse,
    ratio: int,
    free_mask,
    *,
    nu: float = 0.3,
    E0: float = 20.0,
    omega: float = 0.6,
) -> Callable:
    """3-D sibling of :func:`make_mean_field_preconditioner` for structured
    hex8 box meshes (``mesh/solid3d.py`` numbering): spectral coarse solve at
    the mean field E0 + trilinear tensor-product transfers
    (``ops.multigrid.make_grid_transfer_nd``). ``cells_coarse`` = coarse
    (nx, ny, nz) cell counts; the fine grid is ``cells_coarse * ratio``.
    Pass as ``make_field_solver(..., preconditioner=..., grid=(nx, ny, nz))``.
    """
    from ..ops.multigrid import (
        make_grid_transfer_nd,
        make_two_level_preconditioner,
    )
    from ..solver import make_coarse_spectral_apply

    ncx, ncy, ncz = cells_coarse
    coarse_apply = make_coarse_spectral_apply(coarse_model)
    gt = make_grid_transfer_nd((ncz, ncy, ncx), ratio, 3)
    prec2, _, _ = make_two_level_preconditioner(
        None, None, coarse_apply, free_mask, omega=omega, grid_transfer=gt
    )
    lam0, mu0 = lame_from_Ev(E0, nu)
    coeffs0 = jnp.stack([jnp.asarray(lam0), jnp.asarray(mu0)])

    def prec(E, diag_inv, r):
        return prec2(coeffs0.astype(r.dtype), diag_inv, r)

    return prec


def make_fh_fun_field(
    model: FemModel,
    kl: KLExpansion,
    cfg: ProblemConfig,
    *,
    probe_nodes: Sequence[int],
    nu: float = 0.3,
    tol: float = 1e-12,
    maxiter: int = 4000,
    cg_dtype=None,
    refine_iters: int = 0,
    preconditioner=None,
    grid=None,
) -> Callable:
    """Observation operator ``fh(theta) -> (y, h)`` for the random-field model.

    theta: (kl.n_modes,) standard-normal KL coefficients.
    y: displacements at ``probe_nodes`` (1-based node ids), dim = len * ndm —
    set ``cfg.y_dim`` and ``cfg.theta_dim`` accordingly for the trainer.
    h: reference-convention von Mises at ``cfg.ele_id`` / ``cfg.nipt_id``,
    computed with the LOCAL element modulus (the stress at a point sees the
    stiffness at that point).
    """
    if model.has_constraints or model.has_springs or model.has_prescribed:
        raise NotImplementedError(
            "random-field solver assumes the plain force-controlled operator"
        )
    if model.stype not in (2, 4):
        # lame_from_Ev(1, nu)*E is the true Lame pair only for plane strain
        # and 3-D solids; plane stress/axisym need their own coefficient maps
        raise NotImplementedError(
            "random-field fh supports plane strain (stype=2) and 3-D (stype=4)"
        )
    lam1, mu1 = lame_from_Ev(1.0, nu)
    ke_unit = lam1 * jnp.asarray(model.ke_lam) + mu1 * jnp.asarray(model.ke_mu)
    solve = make_field_solver(
        ke_unit, np.asarray(model.lm), model.free_mask, model.ndof,
        tol=tol, maxiter=maxiter, cg_dtype=cg_dtype, refine_iters=refine_iters,
        preconditioner=preconditioner, grid=grid,
    )
    probe_nodes = np.asarray(probe_nodes, dtype=np.int64)
    if probe_nodes.min() < 1 or probe_nodes.max() > model.nnodes:
        raise ValueError("probe_nodes outside [1, nnodes]")
    obs = (
        model.ndm * (probe_nodes[:, None] - 1) + np.arange(model.ndm)[None, :]
    ).reshape(-1)
    obs_dofs = jnp.asarray(obs)
    # same 1-based probe validation as make_fh_fun — a misconfigured
    # ele_id=0 would otherwise silently probe the LAST element (negative
    # indexing) and produce plausible-but-wrong h targets
    if not (1 <= cfg.ele_id <= model.nele):
        raise ValueError(f"ele_id {cfg.ele_id} outside [1, {model.nele}]")
    nq = model.B.shape[1]
    if any(not (1 <= int(p) <= nq) for p in cfg.nipt_id):
        raise ValueError(f"nipt_id {cfg.nipt_id} outside [1, {nq}]")
    e = cfg.ele_id - 1
    q = jnp.asarray(cfg.nipt_id, dtype=jnp.int32) - 1
    B_probe = model.B[e, q]
    lm_probe = model.lm[e]
    f_ext = model.f_ext

    from ..solver import _stress6

    def fh(theta):
        E = field_from_theta(kl, theta, model.dtype)
        u = solve(E, f_ext)
        y = u[obs_dofs]
        eps3 = jnp.einsum("qai,i->qa", B_probe, u[lm_probe])
        Ee = E[e]
        sig6 = _stress6(model, eps3, lam1 * Ee, mu1 * Ee)
        h = von_mises_reference(sig6)
        return y, h

    return fh
