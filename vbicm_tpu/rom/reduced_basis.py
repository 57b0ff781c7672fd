"""Certified reduced-basis solver for the parametric stiffness family.

The scaled configuration (~160x80 mesh, 26k dofs) cannot use the dense
spectral solver, and running thousands of CG iterations per posterior sample
wastes the structure of the problem: the operator family

    K(lam, mu) = lam*K_lam + mu*K_mu = mu * (t*K_lam + K_mu),  t = lam/mu

is affine in TWO parameters, and with the load fixed the solution manifold
``u(lam, mu) = u_hat(t)/mu`` is a smooth ONE-parameter curve in R^n. The
classic reduced-basis method for affinely parametric elliptic PDEs
(Rozza/Patera et al.) therefore compresses it to machine precision with a
handful of snapshots:

  offline (host, float64, scipy sparse): greedy-select snapshot parameters
  from a candidate t-grid by TRUE residual norm, solve with a sparse direct
  factorization, orthonormalize -> basis Q (n, r), project
  A_r = Q^T K_lam Q, B_r = Q^T K_mu Q, f_r = Q^T f;

  online (device): the reduced pencil gets the same spectral treatment as
  the full dense solver — eigh(A_r, B_r) once, so EVERY sample's reduced
  solve is a length-r diagonal scale:  u_r = V diag(1/(lam*g + mu)) V^T f_r.
  The observation operator needs only ~10 rows of Q (probe dofs), so a full
  fh(theta) evaluation on the 26k-dof mesh costs O(r^2) ~ microseconds.

  certificate: the residual norm ||f - K(c) Q u_r|| is computable in reduced
  space from precomputed Gram blocks, giving a rigorous per-sample error
  monitor without touching the full mesh.

All ops are plain JAX (r x r), so gradients flow natively — no custom VJP
needed on the online path.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ProblemConfig
from ..model import FemModel


@dataclasses.dataclass(frozen=True)
class ReducedBasis:
    Q: np.ndarray  # (ndof, r) basis (zero rows on fixed dofs)
    g: np.ndarray  # (r,) generalized eigenvalues of (A_r, B_r)
    V: np.ndarray  # (r, r) eigenvectors, V^T B_r V = I
    f_r: np.ndarray  # (r,) = Q^T f
    # error-certificate Gram data: ||f - K Q u||^2 =
    #   ff - 2 sum_p c_p u.(m_p) + sum_pq c_p c_q u.(G_pq u)
    ff: float
    m: np.ndarray  # (P, r) with m_p = (K_p Q)^T f
    G: np.ndarray  # (P, P, r, r) with G_pq = (K_p Q)^T (K_q Q)
    t_snapshots: Tuple[float, ...]
    max_rel_residual: float  # certified max over the training grid

    @property
    def r(self) -> int:
        return int(self.Q.shape[1])


def _sparse_parts(model: FemModel):
    """Assemble scipy CSR K_lam/K_mu on the full dof set, rows/cols of fixed
    dofs zeroed with unit diagonal (so solves act on free dofs)."""
    import scipy.sparse as sp

    lm = np.asarray(model.lm)
    ndof = model.ndof
    rows = np.repeat(lm, lm.shape[1], axis=1).reshape(-1)
    cols = np.tile(lm, (1, lm.shape[1])).reshape(-1)
    mats = []
    free_mask = np.asarray(model.free_mask) > 0
    for ke in (np.asarray(model.ke_lam), np.asarray(model.ke_mu)):
        K = sp.csr_matrix((ke.reshape(-1), (rows, cols)), shape=(ndof, ndof))
        # mask fixed dofs
        d = sp.diags(free_mask.astype(np.float64))
        K = d @ K @ d
        mats.append(K)
    # unit diagonal on fixed dofs of the mu-part keeps (tA+B) nonsingular
    fixed = sp.diags((~free_mask).astype(np.float64))
    mats[1] = mats[1] + fixed
    return mats[0], mats[1]


def build_reduced_basis(
    model: FemModel,
    *,
    t_range: Tuple[float, float] = (0.2, 5.0),
    n_candidates: int = 33,
    tol: float = 1e-10,
    max_basis: int = 64,
) -> ReducedBasis:
    """Greedy certified RB construction on the host.

    t = lam/mu candidate grid is log-spaced over ``t_range`` (the Cook's
    problem's theta prior maps to t in ~[0.86, 1.16]; the default range is a
    wide safety margin). Greedy stops when the worst TRUE relative residual
    over the grid drops below ``tol``.
    """
    import scipy.sparse.linalg as spla

    if model.has_prescribed:
        raise NotImplementedError(
            "reduced basis assumes a fixed coefficient-independent RHS; with "
            "prescribed displacements the lifted RHS depends on (lam, mu) — "
            "use the full-order solvers"
        )
    A, B = _sparse_parts(model)
    f = np.asarray(model.f_ext) * (np.asarray(model.free_mask))
    fnorm = float(np.linalg.norm(f))
    ts = np.geomspace(t_range[0], t_range[1], n_candidates)

    Q = np.zeros((model.ndof, 0))
    chosen = []
    max_res = np.inf
    # start at the geometric middle
    next_t = float(ts[len(ts) // 2])
    while Q.shape[1] < max_basis:
        u = spla.spsolve((next_t * A + B).tocsc(), f)
        chosen.append(next_t)
        # Gram-Schmidt against current basis (twice for stability)
        v = u.copy()
        for _ in range(2):
            if Q.shape[1]:
                v -= Q @ (Q.T @ v)
        nv = np.linalg.norm(v)
        grew = nv > 1e-13 * np.linalg.norm(u)
        if grew:
            Q = np.concatenate([Q, (v / nv)[:, None]], axis=1)
        # evaluate true residuals over the grid with the current basis
        AQ, BQ = A @ Q, B @ Q
        Ar, Br = Q.T @ AQ, Q.T @ BQ
        fr = Q.T @ f
        res = np.empty(len(ts))
        for i, t in enumerate(ts):
            ur = np.linalg.solve(t * Ar + Br, fr)
            res[i] = np.linalg.norm(f - (t * (AQ @ ur) + BQ @ ur)) / fnorm
        max_res = float(res.max())
        if max_res < tol:
            break
        if not grew:
            # the worst-t snapshot adds no new direction: the solution
            # manifold is exhausted at working precision and ``max_res`` is
            # the attainable floor (3e-11 measured on a 3-D hex8 beam).
            # Without this break the greedy spins forever re-selecting the
            # same t (Q never reaches max_basis, res never drops below tol).
            import warnings

            warnings.warn(
                f"reduced basis stagnated at r={Q.shape[1]} with max relative "
                f"residual {max_res:.2e} > tol={tol:.0e}; returning the "
                "floor-accuracy basis (check rb.max_rel_residual)"
            )
            break
        next_t = float(ts[int(res.argmax())])

    AQ, BQ = A @ Q, B @ Q
    Ar, Br = Q.T @ AQ, Q.T @ BQ
    fr = Q.T @ f
    import scipy.linalg

    g, V = scipy.linalg.eigh(Ar, Br)

    KQ = np.stack([AQ, BQ])  # (P, ndof, r)
    m = np.einsum("pnr,n->pr", KQ, f)
    G = np.einsum("pnr,qns->pqrs", KQ, KQ)

    return ReducedBasis(
        Q=Q,
        g=g,
        V=V,
        f_r=fr,
        ff=float(f @ f),
        m=m,
        G=G,
        t_snapshots=tuple(chosen),
        max_rel_residual=max_res,
    )


def reduced_solve(rb: ReducedBasis, lam, mu):
    """u_r(lam, mu) in the reduced space — O(r^2), natively differentiable."""
    g = jnp.asarray(rb.g)
    V = jnp.asarray(rb.V)
    f_r = jnp.asarray(rb.f_r)
    d = lam * g + mu
    return V @ ((V.T @ f_r) / d)


def residual_norm(rb: ReducedBasis, lam, mu, u_r):
    """Certified ||f - K(c) Q u_r|| / ||f|| from the Gram data.

    Note the usual RB caveat: the expansion ``ff - 2 lin + quad`` cancels
    catastrophically once the true residual is below ~sqrt(eps)*||f||, so
    this estimator floors around 1e-8 relative in float64. The greedy
    construction therefore uses TRUE residuals (full-space matvecs on the
    host); this online estimator is a cheap runtime out-of-range monitor.
    """
    c = jnp.stack([lam, mu])
    m = jnp.asarray(rb.m)
    G = jnp.asarray(rb.G)
    lin = 2.0 * jnp.einsum("p,pr,r->", c, m, u_r)
    quad = jnp.einsum("p,q,pqrs,r,s->", c, c, G, u_r, u_r)
    val = jnp.maximum(rb.ff - lin + quad, 0.0)
    return jnp.sqrt(val) / jnp.sqrt(rb.ff)


def make_fh_fun_rom(
    model: FemModel,
    rb: ReducedBasis,
    cfg: ProblemConfig = ProblemConfig(),
) -> Callable:
    """ROM observation operator fh(theta) -> (y, h): O(r^2) per sample.

    Only the probe rows of Q are used online; exactness is certified by
    ``rb.max_rel_residual`` over the training range.
    """
    from ..ops.element import material_coeffs
    from ..ops.vonmises import von_mises_reference
    from ..solver import _stress6

    dt = model.dtype
    tm = jnp.asarray(cfg.theta_map.theta_mean, dt)
    ts = jnp.asarray(cfg.theta_map.theta_std, dt)
    # probe indices map through dof_map (identity unless equality
    # constraints renumbered the solver space); ndm-generic (2-D and 3-D
    # box models alike — the basis builder is dimension-agnostic already)
    obs_full = model.ndm * (cfg.node_id - 1) + np.arange(model.ndm)
    obs_dofs = np.asarray(model.dof_map)[obs_full]
    e = cfg.ele_id - 1
    q = np.asarray(cfg.nipt_id, dtype=np.int32) - 1
    B_probe = model.B[e, q]  # (nq, 3, 8) 2-D / (nq, 6, 24) hex8
    lm_probe = np.asarray(model.lm[e])

    Q_obs = jnp.asarray(rb.Q[obs_dofs], dt)  # (ndm, r)
    Q_ele = jnp.asarray(rb.Q[lm_probe], dt)  # (edof, r)
    g = jnp.asarray(rb.g, dt)
    V = jnp.asarray(rb.V, dt)
    fV = jnp.asarray(rb.V.T @ rb.f_r, dt)

    def fh(theta):
        theta = jnp.asarray(theta, dt)
        E = jnp.exp(ts[0] * theta[0] + tm[0])
        v = 0.5 * jax.nn.sigmoid(ts[1] * theta[1] + tm[1])
        # (c0, c1) are the affine coefficients of the model's stype —
        # (lam, mu) plane strain, (b, a) plane stress — matching the K parts
        # the basis was built from (ADVICE r1: no plane-strain hardcode)
        c0, c1 = material_coeffs(model.stype, E, v)
        u_r = V @ (fV / (c0 * g + c1))
        y = Q_obs @ u_r
        ue = Q_ele @ u_r
        eps3 = jnp.einsum("qai,i->qa", B_probe, ue)
        sig6 = _stress6(model, eps3, c0, c1)
        h = von_mises_reference(sig6)
        return y, h

    return fh
