"""Differentiable linear solvers.

The reference differentiates through a dense ``tf.linalg.solve``
(``src/fem_solver_tf.py:137``), letting TF build the solve's gradient graph.
Here the solve carries an explicit custom VJP built on the adjoint-state
method: for ``u = K(c)^{-1} f`` with ``K(c) = sum_p c_p * P_p`` (the affine
stiffness decomposition, see ``ops.element``),

    w      = K^{-1} ubar          (adjoint solve — reuses the factorization)
    fbar   = w
    cbar_p = - w^T (P_p u)

so the backward pass is one extra triangular solve pair + P matvecs, never a
dense (n x n) cotangent. Under ``vmap`` this becomes a batched Cholesky —
the per-training-step hot op.

Mixed precision (TPU fast path): factorize in float32 on the MXU, then
recover float64-grade accuracy with iterative refinement — the residual
``r = f - K u`` is computed in the model dtype (f64) and only the
correction solve reuses the f32 factor. With HIGHEST-precision f32 applies
``refine_iters=1`` already lands ~2e-12 relative at this problem's
conditioning (the emulated-f64 residual matvec dominates refinement cost,
so fewer refinements is both faster and the accuracy is set by the apply
precision); parity tests run the pure-f64 path.

For refined meshes where a dense factor does not fit, ``matrix-free PCG``
(Jacobi-preconditioned) with the same adjoint custom-VJP structure; its
matvec is the element gather→blockmatmul→scatter from ``ops.assembly`` and
shards over the element axis across chips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import cho_factor, cho_solve

from .assembly import make_sorted_scatter


# ---------------------------------------------------------------------------
# Dense Cholesky path (small/medium meshes)
# ---------------------------------------------------------------------------


def make_dense_affine_solver(
    parts, *, factor_dtype=None, refine_iters: int = 0, method: str = "auto"
):
    """Build a differentiable solver for ``(sum_p c_p parts_p) u = f``.

    parts: (P, n, n) symmetric positive-definite basis (free-free blocks),
    captured as constants. Returns ``solve(coeffs (P,), f (n,)) -> u (n,)``
    with the adjoint custom VJP. ``factor_dtype=jnp.float32`` +
    ``refine_iters>=2`` is the TPU mixed-precision mode.

    method:
      * "cholesky" — factor once, every apply is a cho_solve (two triangular
        solves). Best on CPU, where trsv is fast.
      * "inverse"  — factor once, then form K^-1 explicitly with ONE
        n-RHS triangular solve pair (blocked trsm -> MXU-friendly); every
        subsequent apply (forward, refinement, adjoint) is a plain matvec.
        A training step needs ~6 applies per factorization (forward +
        refinements + adjoint), and single-RHS triangular solves are
        sequential-bound on TPU, so trading one trsm for all of them wins.
      * "auto"     — "inverse" when factor_dtype is set (TPU mixed mode),
        else "cholesky".

    Memory/perf design for the batched (vmapped) case: the per-sample matrix
    is built DIRECTLY in the factor dtype (K32 = sum c_p parts32_p), so no
    (B, n, n) float64 tensor ever exists on device; iterative-refinement
    residuals are computed matrix-free through the shared affine parts
    (``r = f - sum_p c_p (P_p @ x)``, two (n,n)@(n,) matvecs against
    replicated constants). Per-sample device footprint is one f32 factor
    (or inverse).
    """
    parts = jnp.asarray(parts)
    parts_f = parts if factor_dtype is None else parts.astype(factor_dtype)
    if method == "auto":
        method = "inverse" if factor_dtype is not None else "cholesky"

    def _affine_matvec(coeffs, x):
        """sum_p c_p (parts_p @ x) in the precision of x — scalar-broadcast
        combine, not a dot_general: under vmap a batched coeffs contraction
        lowers to ONE bf16 matmul pass on TPU at default precision
        (docs/KNOWN_ISSUES.md)."""
        px = jnp.einsum("pij,j->pi", parts, x)
        return sum(coeffs[p].astype(x.dtype) * px[p] for p in range(parts.shape[0]))

    def _factor(coeffs):
        # scalar-broadcast combine for the same reason as _affine_matvec
        Kf = sum(
            coeffs[p].astype(parts_f.dtype) * parts_f[p]
            for p in range(parts_f.shape[0])
        )
        cfac = cho_factor(Kf, lower=True)
        if method == "inverse":
            eye = jnp.eye(Kf.shape[-1], dtype=Kf.dtype)
            return cho_solve(cfac, eye)  # K^-1, built by one blocked trsm pair
        return cfac

    def _apply(op, b):
        if method == "inverse":
            return op @ b
        return cho_solve(op, b)

    def _solve_refined(op, coeffs, b):
        fdt = op.dtype if method == "inverse" else op[0].dtype
        x = _apply(op, b.astype(fdt)).astype(b.dtype)
        for _ in range(refine_iters):
            r = b - _affine_matvec(coeffs, x)
            x = x + _apply(op, r.astype(fdt)).astype(b.dtype)
        return x

    @jax.custom_vjp
    def solve(coeffs, f):
        u, _ = _fwd(coeffs, f)
        return u

    def _fwd(coeffs, f):
        op = _factor(coeffs)
        u = _solve_refined(op, coeffs, f)
        return u, (coeffs, u, op)

    def _bwd(res, ubar):
        coeffs, u, op = res
        w = _solve_refined(op, coeffs, ubar)
        pu = jnp.einsum("pij,j->pi", parts, u)  # (P, n)
        cbar = -(pu @ w)
        return cbar.astype(coeffs.dtype), w

    solve.defvjp(_fwd, _bwd)
    return solve


# ---------------------------------------------------------------------------
# Spectral solver for 2-term affine pencils (the TPU speed-of-light path)
# ---------------------------------------------------------------------------


def make_spectral_affine_solver(parts, *, apply_dtype=None, refine_iters: int = 0):
    """Differentiable solver for ``(c0*A + c1*B) u = f`` via one-time pencil
    diagonalization — the fastest possible batched path on TPU.

    With B symmetric positive definite (here: the mu-part of the stiffness)
    and A symmetric PSD, solve the generalized eigenproblem ``A V = B V
    diag(g)`` once on the host in float64, normalizing ``V^T B V = I``. Then
    for EVERY coefficient pair,

        K(c)^{-1} b  =  V diag(1 / (c0*g + c1)) V^T b

    — two dense matmuls and a diagonal scale. Per-sample cost drops from
    O(n^3) (Cholesky: measured 27 ms for a 256x440 batch on v5e) to O(n^2)
    of pure MXU work; no per-sample factorization exists at all.

    ``apply_dtype=float32`` runs the matmuls on the MXU at f32;
    ``refine_iters`` polishes to f64 through the shared affine parts
    (the spectral apply is its own preconditioner). Exact for any c with
    ``c0*g + c1 > 0``; the generic-P Cholesky path remains the fallback.
    """
    import numpy as np
    import scipy.linalg

    parts_np = np.asarray(parts)
    if parts_np.shape[0] != 2:
        raise ValueError("spectral solver requires exactly 2 affine parts")
    # A = parts[0] (lam-part, PSD), B = parts[1] (mu-part, SPD)
    g, V = scipy.linalg.eigh(parts_np[0], parts_np[1])
    g64 = jnp.asarray(g)
    V64 = jnp.asarray(V)
    Va = V64 if apply_dtype is None else V64.astype(apply_dtype)
    ga = g64.astype(Va.dtype)
    parts = jnp.asarray(parts)

    def _affine_matvec(coeffs, x):
        px = jnp.einsum("pij,j->pi", parts, x)
        return coeffs.astype(x.dtype) @ px

    # Precision policy (round-2 measurement, v5e, B=64x4 train step): the
    # f64 residual matvec of each refinement iteration runs on EMULATED f64
    # and dominates cost, so minimizing refinements beats cheapening the
    # apply. HIGHEST-precision f32 apply (6 bf16 passes) gives 1.8e-7
    # relative bare; ONE refinement lands 2e-12 at 872 steps/s — both
    # faster and 6 orders more accurate than the round-1 policy of
    # DEFAULT(bf16) apply + 2 refinements (5e-6, 641 steps/s). HIGHEST
    # unconditionally; f64-parity users run apply_dtype=None (pure f64).
    _apply_prec = jax.lax.Precision.HIGHEST

    def _coords_and_apply(coeffs, b):
        """Returns (x, a) with x = K^-1 b and a = its eigen-coordinates."""
        hp = _apply_prec
        d = (coeffs[0].astype(Va.dtype) * ga + coeffs[1].astype(Va.dtype))
        a = jnp.matmul(Va.T, b.astype(Va.dtype), precision=hp) / d
        x = jnp.matmul(Va, a, precision=hp).astype(b.dtype)
        if refine_iters:
            for _ in range(refine_iters):
                r = b - _affine_matvec(coeffs, x)
                da = jnp.matmul(Va.T, r.astype(Va.dtype), precision=hp) / d
                a = a + da
                x = x + jnp.matmul(Va, da, precision=hp).astype(b.dtype)
        return x, a

    @jax.custom_vjp
    def solve(coeffs, f):
        x, _ = _coords_and_apply(coeffs, f)
        return x

    def _fwd(coeffs, f):
        x, a = _coords_and_apply(coeffs, f)
        return x, (coeffs, a)

    def _bwd(res, ubar):
        coeffs, a = res
        w, b = _coords_and_apply(coeffs, ubar)
        # In eigen-coordinates (V^T A V = diag(g), V^T B V = I):
        #   w^T A u = sum_i g_i a_i b_i,   w^T B u = sum_i a_i b_i
        # — the coefficient cotangents are O(n) diagonal contractions, no
        # full-space P_p matvec needed.
        ab = a * b
        cbar = -jnp.stack([jnp.sum(ga * ab), jnp.sum(ab)])
        return cbar.astype(coeffs.dtype), w

    solve.defvjp(_fwd, _bwd)
    return solve


# ---------------------------------------------------------------------------
# Matrix-free preconditioned conjugate gradients (large meshes / sharded)
# ---------------------------------------------------------------------------


def pcg(matvec, b, minv, *, tol=1e-12, maxiter=1000, x0=None):
    """Preconditioned CG. ``minv`` is either an inverse-diagonal array
    (Jacobi) or a callable ``r -> z`` (e.g. the two-level preconditioner in
    ``ops.multigrid``). All args full-dof; ``matvec`` must already apply the
    free-dof mask (fixed dofs stay identically zero).

    Returns (x, iters, residual_norm_sq). vmap- and shard_map-compatible:
    pure lax.while_loop, no data-dependent shapes.
    """
    apply_prec = minv if callable(minv) else (lambda rr: minv * rr)
    # RHS NORMALIZATION (exact — CG is linear in b): solve K x_hat = b/||b||
    # and scale back. Without it, a tiny-norm rhs (e.g. the 2nd iterative-
    # refinement residual, entries ~1e-13) puts every CG dot product at the
    # f32 underflow floor, where subnormal-garbage p'Kp denominators make
    # alpha explode over hundreds of stalled iterations (measured: a lane
    # amplifying 1e-12 -> 0.82 in 500 iters, inf/NaN without the breakdown
    # guard). Normalized, all quantities sit in well-scaled territory.
    tiny = jnp.asarray(1e-30 if b.dtype == jnp.float32 else 1e-300, b.dtype)
    scale = jnp.sqrt(jnp.maximum(jnp.vdot(b, b), tiny))
    b = b / scale
    x = jnp.zeros_like(b) if x0 is None else x0 / scale
    r = b - matvec(x)
    z = apply_prec(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.maximum(jnp.vdot(b, b), tiny)

    def _done(r):
        return jnp.vdot(r, r) <= tol * tol * bnorm

    def cond(state):
        x, r, z, p, rz, it, dead = state
        return jnp.logical_and(
            it < maxiter, jnp.logical_not(jnp.logical_or(_done(r), dead))
        )

    def body(state):
        x, r, z, p, rz, it, dead = state
        # Under vmap, lanes that already converged keep executing this body
        # (jax while_loop runs until ALL lanes' cond is false). Freezing
        # converged lanes is essential: their f32 residual norms underflow
        # and the alpha/beta ratios blow the iterate up otherwise.
        # BREAKDOWN SAFEGUARD (dead flag): a lane stalled at its f32
        # rounding floor (tol tighter than ~kappa * eps_f32) can round
        # p'Kp or (r, z) non-positive; the recurrences then diverge
        # (negative beta destroys conjugacy, inf - inf = NaN). Freeze such
        # lanes permanently — outer refinement still improves them.
        done = jnp.logical_or(_done(r), dead)
        kp = matvec(p)
        denom = jnp.vdot(p, kp)
        bad = jnp.logical_not(denom > 0)  # catches <= 0 and NaN
        alpha = jnp.where(bad, 0.0, rz / jnp.where(denom == 0, 1.0, denom))
        x_n = x + alpha * p
        r_n = r - alpha * kp
        z_n = apply_prec(r_n)
        rz_n = jnp.vdot(r_n, z_n)
        dead_n = dead | (~done & (bad | ~(rz_n > 0)))
        beta = jnp.where(
            dead_n, 0.0, rz_n / jnp.where(rz == 0, 1.0, rz)
        )
        p_n = z_n + beta * p
        keep = lambda old, new: jnp.where(done, old, new)
        return (
            keep(x, x_n),
            keep(r, r_n),
            keep(z, z_n),
            keep(p, p_n),
            jnp.where(done | dead_n, rz, rz_n),
            it + 1,
            dead_n,
        )

    x, r, z, p, rz, it, _dead = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, jnp.array(0), jnp.array(False))
    )
    return x * scale, it, jnp.vdot(r, r) * scale * scale


def pcg_two_level_batched(
    matvec_b,
    b,
    dinv,
    coeffs_b,
    restrict_b,
    prolong_b,
    coarse_apply_b,
    mask,
    *,
    omega: float,
    tol: float = 1e-12,
    maxiter: int = 1000,
):
    """Natively-BATCHED additive two-level PCG — the fusion-friendly
    restructuring of ``vmap(pcg)`` for the structured-grid hot loop.

    Two hot-loop savings over the vmapped form (where jax batches the
    while_loop by running every lane until ALL converge and the body
    freezes converged lanes with FOUR full-state ``jnp.where`` selects,
    ~0.4 GB/iteration of pure select traffic at 160x80 B=256):

      * converged lanes are frozen by masking the SCALARS alpha/beta to
        zero per lane instead of selecting the (B, n) state vectors —
        ``x + 0*p`` is the freeze, no extra passes. (A done lane's p
        drifts to z once; harmless, alpha stays 0.)
      * the preconditioned residual z is NEVER materialized: with the
        additive preconditioner z = omega*D^-1 r + P s, s = A_c^-1 R r,
        the CG scalars fold into small-space dots —
        ``(r, z) = omega * sum(r * dinv * r) + (R r, s)`` — and the
        p-update consumes z's two terms directly. This removes the z
        state vector (one fewer carry copy) and lets XLA fuse the
        elementwise x/r/p updates with the reductions around them.

    Args: ``matvec_b(p) -> (B, n)`` masked batched operator;
    ``b (B, n)`` masked rhs (cg dtype); ``dinv (B, n)`` Jacobi inverse
    diagonal; ``coeffs_b (B, P)``; ``restrict_b/prolong_b`` batched grid
    transfers; ``coarse_apply_b(coeffs_b, r_c) -> (B, nc)`` batched coarse
    solve; ``mask (n,)`` free-dof 0/1. Same convergence criterion as
    :func:`pcg` (relative residual vs b, per lane).

    Returns ``(x, iters)``.
    """
    B = b.shape[0]
    rdt = b.dtype
    mask = mask.astype(rdt)
    tiny = jnp.asarray(1e-30 if rdt == jnp.float32 else 1e-300, rdt)
    # per-lane RHS NORMALIZATION (exact — CG is linear in b): see the same
    # block in :func:`pcg`. The refinement rhs of the adjoint solve has
    # per-lane norms down to ~1e-12; unnormalized, its f32 dot products sit
    # at the underflow floor where subnormal-garbage denominators make
    # stalled lanes diverge (measured 1e-12 -> 0.82 in 500 iters -> NaN).
    scale = jnp.sqrt(jnp.maximum(jnp.einsum("bi,bi->b", b, b), tiny))
    b = b / scale[:, None]
    bb = jnp.maximum(jnp.einsum("bi,bi->b", b, b), tiny)
    thresh = (tol * tol) * bb

    def _prec_dots(r):
        """s = coarse solve of R r, plus (r, z) with z never formed."""
        rc = restrict_b(r)
        s = coarse_apply_b(coeffs_b, rc)
        rz = omega * jnp.einsum("bi,bi,bi->b", r, dinv, r) + jnp.einsum(
            "bc,bc->b", rc, s
        )
        return s, rz

    def _z(r, s):
        return (omega * dinv * r + prolong_b(s) * mask).astype(rdt)

    x = jnp.zeros_like(b)
    r = b
    s, rz = _prec_dots(r)
    p = _z(r, s)
    rr = jnp.einsum("bi,bi->b", r, r)
    dead = rz <= 0  # breakdown flag, per lane (permanent)

    def cond(state):
        it, x, r, p, rz, rr, dead = state
        return jnp.logical_and(
            it < maxiter, jnp.any(jnp.logical_and(rr > thresh, ~dead))
        )

    def body(state):
        it, x, r, p, rz, rr, dead = state
        # BREAKDOWN SAFEGUARD: in f32, a lane iterating at/below its
        # rounding floor (tol tighter than ~kappa * eps_f32 allows) can
        # produce non-positive p'Kp or (r, z) — the CG recurrences then
        # DIVERGE (negative beta destroys conjugacy, alpha explodes,
        # inf - inf = NaN poisons the whole batch, and through the adjoint
        # the training step). Such lanes freeze permanently at their
        # current iterate; outer refinement still improves them.
        done = (rr <= thresh) | dead
        kp = matvec_b(p)
        denom = jnp.einsum("bi,bi->b", p, kp)
        bad_d = ~(denom > 0)  # catches <= 0 and NaN
        alpha = jnp.where(
            done | bad_d, 0.0, rz / jnp.where(denom == 0, 1.0, denom)
        ).astype(rdt)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * kp
        s, rz_n = _prec_dots(r)
        rr = jnp.einsum("bi,bi->b", r, r)
        dead = dead | (~done & bad_d) | (~done & ~(rz_n > 0))
        beta = jnp.where(
            done | dead, 0.0, rz_n / jnp.where(rz == 0, 1.0, rz)
        ).astype(rdt)
        p = _z(r, s) + beta[:, None] * p
        rz = jnp.where(done | dead, rz, rz_n)
        return it + 1, x, r, p, rz, rr, dead

    it, x, r, p, rz, rr, dead = jax.lax.while_loop(
        cond, body, (jnp.array(0), x, r, p, rz, rr, dead)
    )
    return x * scale[:, None], it


def make_matfree_affine_solver(
    ke_parts,
    lm,
    free_mask,
    ndof: int,
    *,
    tol: float = 1e-12,
    maxiter: int = 2000,
    cg_dtype=None,
    refine_iters: int = 0,
    preconditioner=None,
    part_matvec=None,
    diag_parts=None,
    affine_matvec=None,
    refine_residual: str = "f64",
    residual_fn=None,
):
    """Differentiable matrix-free solver for the affine element operator.

    ``refine_residual``: how iterative-refinement residuals are computed.
    "f64" (default) — exact, one emulated-f64 element matvec per
    refinement. "split_f32" — split the f64 iterate x = x1 + x2 into two
    f32 halves, apply the (fast, possibly Pallas-stencil) f32 operator to
    each, and sum in f64: the splitting represents x exactly, so the
    residual error is the f32 rounding of the apply, and the refined
    solution lands at ~kappa(K) * 1e-7 relative (measured 2.7e-4 at
    160x80 — vs 4e-8 for "f64" — at 2.05x the throughput, 2322 vs 1131
    solves/s at B=256). A speed mode for workloads whose tolerance is far
    above that (the VI observation noise is 0.3). Requires
    cg_dtype=float32. "compensated" — f64-GRADE residuals (~1e-14
    relative, measured) from pure-f32 tensor arithmetic via Dekker
    TwoProd / Knuth TwoSum on the structured-grid stencil
    (``ops.stencil_compensated``); pass the built residual as
    ``residual_fn(coeffs, b, x) -> r``. Strictly dominates "split_f32"
    (same dtype domain, no accuracy floor above the CG tolerance).

    ``part_matvec``: optional ``(p, x) -> K_p @ x`` override of the element
    gather/einsum/scatter matvec, used for FLOAT32 applications only (the
    CG hot loop). Pass ``diag_parts`` (P, ndof) with it. Built by e.g.
    ``ops.stencil.make_stencil_part_matvec`` for structured grids.

    ``affine_matvec``: optional fused ``(coeffs, u) -> K(c) @ u``, likewise
    f32-only — e.g. the custom_vmap Pallas stencil from
    ``ops.stencil.make_stencil_affine_matvec``. All f64 applications
    (refinement residuals, adjoint coefficient cotangents) stay on the
    element einsum path regardless: f64 is VPU-emulated on TPU and the XLA
    stencil is 2x slower than the element path there (measured).

    ke_parts: (P, nele, edof, edof) theta-independent element-block bases;
    ``K(c) = sum_p c_p * assemble(ke_parts[p])``. The returned
    ``solve(coeffs, f)`` works on full-dof vectors with fixed dofs masked to
    zero (free_mask: (ndof,) 0/1). Backward is one more PCG (same operator,
    symmetric) + P matrix-free matvecs.

    TPU mixed-precision mode: ``cg_dtype=jnp.float32`` runs the ENTIRE CG
    iteration in f32 (the hot matvecs hit the MXU instead of emulated-f64
    VPU passes), and ``refine_iters`` outer iterative-refinement steps
    recover f64-grade accuracy — the only f64 work per refinement is one
    residual matvec. Measured ~60x over pure-f64 CG on v5e.
    """
    # NOTE: scatters here use the sorted segment-sum lowering, NOT
    # ``.at[].add`` — the batched scatter-add is miscompiled under vmap on
    # the axon TPU runtime (docs/KNOWN_ISSUES.md); segment_sum with a static
    # host-side sort permutation is correct there and typically faster.
    ke_parts = jnp.asarray(ke_parts)
    lm_np = lm
    lm = jnp.asarray(lm)
    free_mask = jnp.asarray(free_mask)
    ke_parts_cg = ke_parts if cg_dtype is None else ke_parts.astype(cg_dtype)
    free_mask_cg = free_mask if cg_dtype is None else free_mask.astype(cg_dtype)
    _scatter = make_sorted_scatter(lm_np, ndof)

    def _sorted_matvec(ke, u):
        ue = u[lm]
        qe = jnp.einsum("eij,ej->ei", ke, ue, precision=jax.lax.Precision.HIGHEST)
        return _scatter(qe)

    def _element_single_part(parts, p, u):
        return _sorted_matvec(parts[p], u)

    def _element_affine_matvec(parts, coeffs, u):
        """K(c) @ u as ``sum_p c_p * (K_p @ u)`` with CONSTANT-operand
        element einsums. Never materialize ``tensordot(coeffs, parts)``:
        under vmap that batched contraction is a real dot_general which TPU
        lowers to ONE bf16 pass at default precision (~2e-3 per apply —
        round-1's "two-level vmap lane contamination" was exactly this,
        amplified through hundreds of CG iterations). The per-part form is
        exact, keeps the big einsum operand constant across the batch, and
        skips the (B, nele, edof, edof) intermediate entirely."""
        ue = u[lm]
        q = None
        for p in range(parts.shape[0]):
            qp = jnp.einsum(
                "eij,ej->ei", parts[p], ue, precision=jax.lax.Precision.HIGHEST
            )
            cp = coeffs[p].astype(parts.dtype)
            q = cp * qp if q is None else q + cp * qp
        return _scatter(q)

    # Custom (stencil) applications serve ONLY f32 — the CG hot loop.
    # f64 applications (refinement residuals, adjoint coefficient
    # cotangents) stay on the element path: f64 is VPU-emulated on TPU and
    # the 18-pass XLA stencil is 2x SLOWER than the element einsum there
    # (259 vs 127 ms at 160x80 B=256, measured round 2), while in f32 the
    # Pallas stencil is 2.3x faster. Dtype dispatch is trace-time static.
    if part_matvec is None:
        _single_part = _element_single_part
    else:

        def _single_part(parts, p, u):
            if u.dtype == jnp.float32:
                return part_matvec(p, u)
            return _element_single_part(parts, p, u)

    if affine_matvec is not None:

        def _affine_matvec(parts, coeffs, u):
            if u.dtype == jnp.float32:
                return affine_matvec(coeffs, u)
            return _element_affine_matvec(parts, coeffs, u)

    elif part_matvec is not None:

        def _affine_matvec(parts, coeffs, u):
            if u.dtype != jnp.float32:
                return _element_affine_matvec(parts, coeffs, u)
            # scalar-broadcast combine for the same bf16-trap reason
            q = None
            for p in range(ke_parts.shape[0]):
                qp = part_matvec(p, u)
                cp = coeffs[p].astype(qp.dtype)
                q = cp * qp if q is None else q + cp * qp
            return q

    else:
        _affine_matvec = _element_affine_matvec

    def _masked_matvec_in(parts, mask, coeffs, x):
        y = _affine_matvec(parts, coeffs, x * mask)
        return y * mask + x * (1.0 - mask)  # identity on fixed dofs

    # per-part assembled diagonals (constants, precomputed once)
    if diag_parts is not None:
        _diag_parts = jnp.asarray(diag_parts, ke_parts_cg.dtype)
    else:
        _diag_parts = jnp.stack(
            [_scatter(jnp.diagonal(ke_parts_cg[p], axis1=-2, axis2=-1))
             for p in range(ke_parts_cg.shape[0])]
        )

    def _cg_once(coeffs, b):
        """One PCG solve in the CG dtype."""
        parts, mask = ke_parts_cg, free_mask_cg

        def mv(x):
            y = _affine_matvec(parts, coeffs, x * mask)
            return y * mask + x * (1.0 - mask)

        # scalar-broadcast combine (NOT tensordot — same bf16 trap as above)
        d = sum(
            coeffs[p].astype(parts.dtype) * _diag_parts[p]
            for p in range(_diag_parts.shape[0])
        )
        d = jnp.where(mask > 0, jnp.where(d == 0, 1.0, d), 1.0)
        minv = 1.0 / d
        if preconditioner is not None:
            prec = lambda r: preconditioner(coeffs, minv, r)
        else:
            prec = minv
        bc = (b * free_mask).astype(parts.dtype)
        x, _, _ = pcg(mv, bc, prec, tol=tol, maxiter=maxiter)
        return x

    if refine_residual == "split_f32":
        if jnp.dtype(cg_dtype or ke_parts.dtype) != jnp.dtype(jnp.float32):
            raise ValueError("refine_residual='split_f32' needs cg_dtype=float32")

        def _residual(coeffs, b, x):
            x1 = x.astype(jnp.float32)
            x2 = (x - x1.astype(x.dtype)).astype(jnp.float32)
            q = (
                _affine_matvec(ke_parts_cg, coeffs, x1 * free_mask_cg).astype(x.dtype)
                + _affine_matvec(ke_parts_cg, coeffs, x2 * free_mask_cg).astype(x.dtype)
            )
            return (b - q) * free_mask

    elif refine_residual == "compensated":
        if residual_fn is None:
            raise ValueError(
                "refine_residual='compensated' needs residual_fn (build it "
                "with ops.stencil_compensated.make_compensated_residual)"
            )

        def _residual(coeffs, b, x):
            # Fence the compensated-residual DAG off from the CG
            # while_loops: without the barriers XLA's fusion of the
            # 36-plane TwoProd/TwoSum chain into the surrounding graph
            # nearly doubles the whole solve (170 vs 91 ms at 160x80
            # B=256, measured round 3).
            xb = jax.lax.optimization_barrier(x)
            return jax.lax.optimization_barrier(residual_fn(coeffs, b, xb))

    elif refine_residual == "f64":

        def _residual(coeffs, b, x):
            # fixed-dof identity term cancels since x, r live on free dofs
            return b * free_mask - _masked_matvec_in(ke_parts, free_mask, coeffs, x) * free_mask

    else:
        raise ValueError(f"unknown refine_residual {refine_residual!r}")

    def _solve_once(coeffs, b):
        x = _cg_once(coeffs, b).astype(b.dtype)
        for _ in range(refine_iters):
            r = _residual(coeffs, b, x)
            x = x + _cg_once(coeffs, r).astype(b.dtype)
        return x * free_mask

    @jax.custom_vjp
    def solve(coeffs, f):
        return _solve_once(coeffs, f)

    def _fwd(coeffs, f):
        u = _solve_once(coeffs, f)
        return u, (coeffs, u)

    def _bwd(res, ubar):
        coeffs, u = res
        w = _solve_once(coeffs, ubar)
        cbar = []
        for p in range(ke_parts.shape[0]):
            ku = _single_part(ke_parts, p, u)
            cbar.append(-jnp.vdot(w, ku * free_mask))
        return jnp.stack(cbar).astype(coeffs.dtype), w

    solve.defvjp(_fwd, _bwd)
    return solve



# ---------------------------------------------------------------------------
# Per-element coefficient field solver (random-field inversion)
# ---------------------------------------------------------------------------


def make_field_solver(
    ke_unit,
    lm,
    free_mask,
    ndof: int,
    *,
    tol: float = 1e-12,
    maxiter: int = 4000,
    cg_dtype=None,
    refine_iters: int = 0,
    preconditioner=None,
    grid=None,
):
    """Differentiable matrix-free solver for a PER-ELEMENT coefficient field:

        K(E) = assemble( E_e * ke_unit_e ),   E: (nele,) positive field

    the operator family behind spatially-varying-stiffness (random-field)
    inversion — beyond the reference's two-scalar affine decomposition
    (``K = c0 K_lam + c1 K_mu``); there is no counterpart in
    ``/root/reference`` (its material is homogeneous,
    ``model_property_cards.py:25``).

    ke_unit: (nele, edof, edof) unit-modulus element blocks (both Lame
    parameters are linear in E at fixed nu, so ``ke_unit = lam(1,nu)*ke_lam
    + mu(1,nu)*ke_mu``). ``solve(E, f)`` maps full-dof vectors with fixed
    dofs masked to zero. Jacobi-PCG forward; adjoint custom VJP with

        Ebar_e = - w_e^T (ke_unit_e u_e)     (per-element contraction)

    The batched-contraction bf16 trap (docs/KNOWN_ISSUES.md) is avoided by
    construction: the big einsum operand ``ke_unit`` is CONSTANT across the
    vmap batch and the E-field enters as an elementwise broadcast, never a
    batched dot_general.

    ``cg_dtype=jnp.float32`` + ``refine_iters`` = the same TPU
    mixed-precision policy as :func:`make_matfree_affine_solver` (f32 MXU
    CG, f64 residual refinement).

    ``preconditioner(E, diag_inv, r) -> z``: optional hook replacing plain
    Jacobi — e.g. a two-level cycle built at the MEAN field (the field
    operator is spectrally equivalent to the homogeneous one within the
    field's range ratio, so a fixed-coefficient coarse solve preconditions
    every sample; see ``prob.randomfield.make_mean_field_preconditioner``).

    ``grid=(nx, ny)`` or ``(nx, ny, nz)``: declares the structured layout of
    ``mesh/cooks.py`` (quad4, node id = row*(nx+1)+col, element e = r*nx+c
    with conn (n0, n0+1, n0+nx+2, n0+nx+1)) or ``mesh/solid3d.py`` (hex8,
    node id = (k*(ny+1)+j)*(nx+1)+i, element e = (k*ny+j)*nx+i, bottom quad
    CCW then top). The element gather/scatter in the CG hot loop then
    becomes reshape + 4 (2-D) / 8 (3-D) static shifted slices / padded
    adds — zero index traffic, the same structured-grid rewrite that took
    the homogeneous path from the element matvec to the stencil form
    (``ops/stencil.py`` module docstring). The lm table is validated
    against the declared layout at build time.
    """
    ke_unit = jnp.asarray(ke_unit)
    lm_np = np.asarray(lm)
    lm = jnp.asarray(lm)
    free_mask = jnp.asarray(free_mask)
    ke_cg = ke_unit if cg_dtype is None else ke_unit.astype(cg_dtype)
    mask_cg = free_mask if cg_dtype is None else free_mask.astype(cg_dtype)
    if grid is not None:
        # cells in memory-major order: (ny, nx) / (nz, ny, nx); nd dofs/node
        nd = len(grid)
        cells = tuple(int(c) for c in reversed(grid))
        Ns = tuple(c + 1 for c in cells)
        nele = int(np.prod(cells))
        if lm_np.shape[0] != nele or ndof != int(np.prod(Ns)) * nd:
            raise ValueError(f"lm/ndof do not match the declared {grid} grid")
        if nd == 2:
            # local node (row, col) offsets for conn (n0, n0+1, n0+nx+2, n0+nx+1)
            lpos = ((0, 0), (0, 1), (1, 1), (1, 0))
        elif nd == 3:
            # (dz, dy, dx) per conn slot: bottom quad CCW then top quad CCW
            lpos = ((0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0),
                    (1, 0, 0), (1, 0, 1), (1, 1, 1), (1, 1, 0))
        else:
            raise ValueError("grid must be (nx, ny) or (nx, ny, nz)")
        # element -> per-axis cell index (memory-major), then expected lm
        eidx = np.unravel_index(np.arange(nele), cells)  # nd arrays
        nodes = np.stack(
            [np.ravel_multi_index(
                tuple(eidx[a] + off[a] for a in range(nd)), Ns)
             for off in lpos],
            axis=1,
        )
        lm_expect = (nd * nodes[:, :, None] + np.arange(nd)[None, None, :]).reshape(
            nele, nd * len(lpos)
        )
        if not np.array_equal(lm_np, lm_expect):
            raise ValueError("lm table does not follow the structured-grid layout")
        gshape = Ns + (nd,)
        edof_g = nd * len(lpos)

        def _gather(x):
            g = x.reshape(gshape)
            return jnp.concatenate(
                [
                    jax.lax.slice(
                        g,
                        off + (0,),
                        tuple(o + c for o, c in zip(off, cells)) + (nd,),
                    )
                    for off in lpos
                ],
                axis=-1,
            ).reshape(nele, edof_g)

        def _scatter(qe):
            q = qe.reshape(cells + (len(lpos), nd))
            out = jnp.zeros(gshape, qe.dtype)
            for li, off in enumerate(lpos):
                sl = tuple(slice(o, o + c) for o, c in zip(off, cells))
                out = out.at[sl].add(q[..., li, :])
            return out.reshape(-1)

    else:
        _scatter = make_sorted_scatter(lm_np, ndof)
        _gather = lambda x: x[lm]
    # per-element unit diagonals, assembled per element so the E-weighted
    # Jacobi diagonal is one scatter of broadcast values
    diag_e = jnp.diagonal(ke_cg, axis1=-2, axis2=-1)  # (nele, edof)

    def _matvec(ke, mask, E, x):
        xm = x * mask
        qe = jnp.einsum(
            "eij,ej->ei", ke, _gather(xm), precision=jax.lax.Precision.HIGHEST
        )
        y = _scatter(E[:, None].astype(qe.dtype) * qe)
        return y * mask + x * (1.0 - mask)

    def _cg_once(E, b):
        mv = lambda x: _matvec(ke_cg, mask_cg, E, x)
        d = _scatter(E[:, None].astype(diag_e.dtype) * diag_e)
        d = jnp.where(mask_cg > 0, jnp.where(d == 0, 1.0, d), 1.0)
        if preconditioner is not None:
            prec = lambda r: preconditioner(E, 1.0 / d, r)
        else:
            prec = 1.0 / d
        bc = (b * free_mask).astype(ke_cg.dtype)
        x, _, _ = pcg(mv, bc, prec, tol=tol, maxiter=maxiter)
        return x

    def _solve_once(E, b):
        x = _cg_once(E, b).astype(b.dtype)
        for _ in range(refine_iters):
            r = b * free_mask - _matvec(ke_unit, free_mask, E, x) * free_mask
            x = x + _cg_once(E, r).astype(b.dtype)
        return x * free_mask

    @jax.custom_vjp
    def solve(E, f):
        return _solve_once(E, f)

    def _fwd(E, f):
        u = _solve_once(E, f)
        return u, (E, u)

    def _bwd(res, ubar):
        E, u = res
        w = _solve_once(E, ubar)
        ku = jnp.einsum(
            "eij,ej->ei", ke_unit, _gather(u * free_mask),
            precision=jax.lax.Precision.HIGHEST,
        )
        Ebar = -jnp.einsum(
            "ei,ei->e", _gather(w * free_mask), ku,
            precision=jax.lax.Precision.HIGHEST,
        )
        return Ebar.astype(E.dtype), w

    solve.defvjp(_fwd, _bwd)
    return solve
