"""Certified reduced-basis ROM for the random-field operator family.

The per-element-coefficient operator of the KL field-inversion family
(``ops.solve.make_field_solver``) is EXACTLY affine in the field:

    K(E) = sum_e E_e A_e,   E_e = exp(mean_log + (modes^T theta)_e)

so — unlike generic nonaffine parameterizations — no empirical interpolation
is needed: with a reduced basis Q (ndof, r) the reduced operator is

    K_r(E) = sum_e E_e M_e,   M_e = Q_e^T ke_unit_e Q_e  (precomputed)

i.e. ONE (B, nele) x (nele, r^2) GEMM per sample batch — the ideal MXU
shape — followed by a batched r x r dense solve. This trades the full-order
path's ~60 preconditioned CG iterations (``make_field_solver`` +
``make_mean_field_preconditioner``) for O(nele r^2) flops in a single fused
matmul, the same RB-over-affine-family design as the two-parameter ROM
(``rom.reduced_basis``) lifted to a per-element coefficient vector.

Offline: host-side greedy over prior draws of theta with TRUE residual
certification (sparse direct snapshot solves, incremental reduced-operator
updates), plus a held-out validation sweep — the certificate is a measured
max relative residual, not an online estimator (the Gram expansion over
P = nele parts is infeasible and unnecessary here).

MEASURED ENVELOPE (40x20 Cook's, corr_len 12, sigma = 0.3, 512-candidate
pool, held-out certificate): the Kolmogorov n-width of the lognormal-field
solution manifold decays exponentially but with a rate that collapses as
the KL dimension grows —

    4 modes:  r = 179 -> val residual 4.9e-8   (certified reduction)
    8 modes:  r = 400 -> val residual 7.8e-7   (works, basis getting fat)
    16 modes: r = 257 exhausts a 257-draw pool at TRAIN residual 6e-12 but
              val residual 3.8e-4 — and the r-vs-residual curve (~0.5
              decades per 50 vectors: 2e-4 at r=200) shows tight tolerances
              are unreachable at practical r.

So: use this ROM for <=8-mode field inversions (or loose-tolerance
sweeps); the 16-mode production family stays on the full-order
``make_field_solver`` + mean-field two-level path. The builder warns when
the candidate pool is nearly exhausted (training certificate overfits).

No counterpart in ``/root/reference`` (its material is two scalars,
``model_property_cards.py:25``; it has no model reduction at all).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ProblemConfig
from ..model import FemModel
from ..ops.element import lame_from_Ev
from ..ops.vonmises import von_mises_reference
from ..prob.randomfield import KLExpansion, field_from_theta


@dataclasses.dataclass(frozen=True)
class FieldReducedBasis:
    Q: np.ndarray  # (ndof, r) basis (zero rows on fixed dofs)
    M: np.ndarray  # (nele, r, r) reduced unit-modulus element blocks
    f_r: np.ndarray  # (r,) = Q^T f
    nu: float
    theta_snapshots: np.ndarray  # (r_sel, n_modes) greedy-selected draws
    max_rel_residual: float  # certified max over the TRAINING candidate set
    val_max_rel_residual: float  # measured max over held-out prior draws

    @property
    def r(self) -> int:
        return int(self.Q.shape[1])


def _field_csr(model: FemModel, ke_unit: np.ndarray, E: np.ndarray):
    """Host CSR of K(E) = assemble(E_e ke_unit_e), fixed dofs masked with
    unit diagonal (same convention as ``rom.reduced_basis._sparse_parts``)."""
    import scipy.sparse as sp

    lm = np.asarray(model.lm)
    ndof = model.ndof
    rows = np.repeat(lm, lm.shape[1], axis=1).reshape(-1)
    cols = np.tile(lm, (1, lm.shape[1])).reshape(-1)
    data = (E[:, None, None] * ke_unit).reshape(-1)
    K = sp.csr_matrix((data, (rows, cols)), shape=(ndof, ndof))
    free = np.asarray(model.free_mask) > 0
    d = sp.diags(free.astype(np.float64))
    return d @ K @ d + sp.diags((~free).astype(np.float64))


def build_reduced_basis_field(
    model: FemModel,
    kl: KLExpansion,
    *,
    nu: float = 0.3,
    n_candidates: int = 96,
    n_validate: int = 64,
    tol: float = 1e-8,
    max_basis: int = 128,
    seed: int = 0,
    verbose: bool = False,
) -> FieldReducedBasis:
    """Greedy certified RB over the theta prior N(0, I_{n_modes}).

    Candidates are ``n_candidates`` fixed prior draws (+ the mean field as
    the greedy seed); each greedy step direct-solves the worst-residual
    candidate's full system and re-certifies the whole set with TRUE
    residuals (one sparse matvec per candidate — the per-candidate reduced
    operators are updated incrementally, one new row/column per step).
    ``val_max_rel_residual`` reports the same certificate on ``n_validate``
    FRESH draws the greedy never saw — the honest generalization number.
    """
    import scipy.sparse.linalg as spla

    if model.has_constraints or model.has_springs or model.has_prescribed:
        raise NotImplementedError(
            "field ROM assumes the plain force-controlled operator"
        )
    if model.stype not in (2, 4):
        raise NotImplementedError(
            "field ROM supports plane strain (stype=2) and 3-D (stype=4)"
        )
    lam1, mu1 = lame_from_Ev(1.0, nu)
    ke_unit = lam1 * np.asarray(model.ke_lam) + mu1 * np.asarray(model.ke_mu)
    f = np.asarray(model.f_ext) * (np.asarray(model.free_mask))
    fnorm = float(np.linalg.norm(f))

    rng = np.random.default_rng(seed)
    thetas = np.concatenate(
        [np.zeros((1, kl.n_modes)),  # mean field: the greedy seed
         rng.standard_normal((n_candidates, kl.n_modes))]
    )
    fields = np.exp(kl.mean_log + thetas @ kl.modes)  # (n_cand+1, nele)
    Ks = [_field_csr(model, ke_unit, E) for E in fields]

    n_all = len(Ks)
    Q = np.zeros((model.ndof, 0))
    Kr = np.zeros((n_all, max_basis, max_basis))  # per-candidate Q^T K_i Q
    chosen: list[int] = []
    next_i = 0
    max_res = np.inf
    while Q.shape[1] < max_basis:
        u = spla.spsolve(Ks[next_i].tocsc(), f)
        v = u.copy()
        for _ in range(2):  # twice-is-enough Gram-Schmidt
            if Q.shape[1]:
                v -= Q @ (Q.T @ v)
        nv = np.linalg.norm(v)
        if nv <= 1e-13 * np.linalg.norm(u):
            import warnings

            warnings.warn(
                f"field reduced basis stagnated at r={Q.shape[1]} with max "
                f"relative residual {max_res:.2e} > tol={tol:.0e}; returning "
                "the floor-accuracy basis (check rb.max_rel_residual)"
            )
            break
        # record the snapshot only once it actually grew the basis, so
        # theta_snapshots[k] generated Q[:, k] even in the stagnation case
        chosen.append(next_i)
        q = v / nv
        r = Q.shape[1]
        # incremental reduced-operator update: one sparse matvec w = K_i q
        # per candidate, new row/col [Q^T w; q^T w] (K_i symmetric)
        for i, K in enumerate(Ks):
            w = K @ q
            col = Q.T @ w
            Kr[i, :r, r] = col
            Kr[i, r, :r] = col
            Kr[i, r, r] = q @ w
        Q = np.concatenate([Q, q[:, None]], axis=1)
        r += 1
        f_r = Q.T @ f
        u_rs = np.linalg.solve(
            Kr[:, :r, :r], np.broadcast_to(f_r[:, None], (n_all, r, 1)).copy()
        )[..., 0]  # batched (n_all, r)
        xs = Q @ u_rs.T  # (ndof, n_all)
        res = np.array(
            [np.linalg.norm(f - K @ xs[:, i]) for i, K in enumerate(Ks)]
        ) / fnorm
        max_res = float(res.max())
        if verbose:
            print(f"[field-rb] r={r} max_res={max_res:.3e}", flush=True)
        if max_res < tol:
            break
        next_i = int(res.argmax())

    r = Q.shape[1]
    if r >= 0.8 * n_all:
        import warnings

        warnings.warn(
            f"field reduced basis used {r} of {n_all} candidates — the pool "
            "is nearly exhausted, so the training certificate is an "
            "overfit-optimistic number; trust val_max_rel_residual (or "
            "enlarge n_candidates). Measured envelope: the 16-mode "
            "sigma=0.3 family does NOT compress below ~4e-4 (see module "
            "docstring); use the full-order field solver there."
        )
    f_r = Q.T @ f
    # held-out certification on fresh prior draws
    th_val = rng.standard_normal((n_validate, kl.n_modes))
    val_max = 0.0
    for th in th_val:
        E = np.exp(kl.mean_log + th @ kl.modes)
        K = _field_csr(model, ke_unit, E)
        KQ = K @ Q
        u_r = np.linalg.solve(Q.T @ KQ, f_r)
        val_max = max(val_max, float(np.linalg.norm(f - KQ @ u_r) / fnorm))

    # reduced unit-modulus element blocks M_e = Q_e^T ke_unit_e Q_e
    Q_e = Q[np.asarray(model.lm)]  # (nele, edof, r)
    M = np.einsum("eai,eab,ebj->eij", Q_e, ke_unit, Q_e, optimize=True)

    return FieldReducedBasis(
        Q=Q,
        M=M,
        f_r=f_r,
        nu=float(nu),
        theta_snapshots=thetas[chosen],
        max_rel_residual=max_res,
        val_max_rel_residual=val_max,
    )


def reduced_field_solve(rb: FieldReducedBasis, E):
    """u_r(E): one (nele,) x (nele, r^2) contraction + an r x r dense solve.
    Natively differentiable — no custom VJP needed at r x r scale."""
    r = rb.r
    Mf = jnp.asarray(rb.M.reshape(-1, r * r), E.dtype)
    # HIGHEST: the constant-operand batched contraction must not lower to
    # one bf16 pass under vmap (docs/KNOWN_ISSUES.md batched-lowering rule)
    Kr = jnp.matmul(E, Mf, precision=jax.lax.Precision.HIGHEST).reshape(r, r)
    Kr = 0.5 * (Kr + Kr.T)
    return jnp.linalg.solve(Kr, jnp.asarray(rb.f_r, E.dtype))


def make_fh_fun_field_rom(
    model: FemModel,
    kl: KLExpansion,
    rb: FieldReducedBasis,
    cfg: ProblemConfig,
    *,
    probe_nodes,
) -> Callable:
    """ROM observation operator for the field family: same (y, h) semantics
    as ``prob.randomfield.make_fh_fun_field`` (displacement probes + local-
    modulus von Mises), O(nele r + r^3) per sample instead of a full CG
    solve — exactness certified by ``rb.max_rel_residual`` /
    ``rb.val_max_rel_residual``."""
    from ..solver import _stress6

    dt = model.dtype
    r = rb.r
    probe_nodes = np.asarray(probe_nodes, dtype=np.int64)
    if probe_nodes.min() < 1 or probe_nodes.max() > model.nnodes:
        raise ValueError("probe_nodes outside [1, nnodes]")
    obs = (
        model.ndm * (probe_nodes[:, None] - 1) + np.arange(model.ndm)[None, :]
    ).reshape(-1)
    if not (1 <= cfg.ele_id <= model.nele):
        raise ValueError(f"ele_id {cfg.ele_id} outside [1, {model.nele}]")
    nq = model.B.shape[1]
    if any(not (1 <= int(p) <= nq) for p in cfg.nipt_id):
        raise ValueError(f"nipt_id {cfg.nipt_id} outside [1, {nq}]")
    e = cfg.ele_id - 1
    q = jnp.asarray(cfg.nipt_id, dtype=jnp.int32) - 1
    B_probe = model.B[e, q]
    lam_nu, mu_nu = lame_from_Ev(1.0, rb.nu)

    Mf = jnp.asarray(rb.M.reshape(-1, r * r), dt)
    f_r = jnp.asarray(rb.f_r, dt)
    Q_obs = jnp.asarray(rb.Q[obs], dt)
    Q_ele = jnp.asarray(rb.Q[np.asarray(model.lm[e])], dt)

    def fh(theta):
        E = field_from_theta(kl, theta, dt)
        Kr = jnp.matmul(E, Mf, precision=jax.lax.Precision.HIGHEST).reshape(r, r)
        Kr = 0.5 * (Kr + Kr.T)
        u_r = jnp.linalg.solve(Kr, f_r)
        y = Q_obs @ u_r
        ue = Q_ele @ u_r
        eps3 = jnp.einsum("qai,i->qa", B_probe, ue)
        Ee = E[e]
        sig6 = _stress6(model, eps3, lam_nu * Ee, mu_nu * Ee)
        h = von_mises_reference(sig6)
        return y, h

    return fh
