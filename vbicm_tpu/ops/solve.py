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
correction solve reuses the f32 factor. ``refine_iters=2`` is enough for
~1e-12 relative error at this problem's conditioning; parity tests run the
pure-f64 path.

For refined meshes where a dense factor does not fit, ``matrix-free PCG``
(Jacobi-preconditioned) with the same adjoint custom-VJP structure; its
matvec is the element gather→blockmatmul→scatter from ``ops.assembly`` and
shards over the element axis across chips.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from .assembly import element_matvec


# ---------------------------------------------------------------------------
# Dense Cholesky path (small/medium meshes)
# ---------------------------------------------------------------------------


def make_dense_affine_solver(parts, *, factor_dtype=None, refine_iters: int = 0):
    """Build a differentiable solver for ``(sum_p c_p parts_p) u = f``.

    parts: (P, n, n) symmetric positive-definite basis (free-free blocks),
    captured as constants. Returns ``solve(coeffs (P,), f (n,)) -> u (n,)``
    with the adjoint custom VJP. ``factor_dtype=jnp.float32`` +
    ``refine_iters>=2`` is the TPU mixed-precision mode.

    Memory/perf design for the batched (vmapped) case: the per-sample matrix
    is built DIRECTLY in the factor dtype (K32 = sum c_p parts32_p), so no
    (B, n, n) float64 tensor ever exists on device; iterative-refinement
    residuals are computed matrix-free through the shared affine parts
    (``r = f - sum_p c_p (P_p @ x)``, two (n,n)@(n,) matvecs against
    replicated constants). Per-sample device footprint is one f32 factor.
    """
    parts = jnp.asarray(parts)
    parts_f = parts if factor_dtype is None else parts.astype(factor_dtype)

    def _affine_matvec(coeffs, x):
        """sum_p c_p (parts_p @ x) in the precision of x."""
        px = jnp.einsum("pij,j->pi", parts, x)
        return coeffs.astype(x.dtype) @ px

    def _factor(coeffs):
        Kf = jnp.tensordot(coeffs.astype(parts_f.dtype), parts_f, axes=1)
        return cho_factor(Kf, lower=True)

    def _solve_refined(cfac, coeffs, b):
        fdt = cfac[0].dtype
        x = cho_solve(cfac, b.astype(fdt)).astype(b.dtype)
        for _ in range(refine_iters):
            r = b - _affine_matvec(coeffs, x)
            x = x + cho_solve(cfac, r.astype(fdt)).astype(b.dtype)
        return x

    @jax.custom_vjp
    def solve(coeffs, f):
        u, _ = _fwd(coeffs, f)
        return u

    def _fwd(coeffs, f):
        cfac = _factor(coeffs)
        u = _solve_refined(cfac, coeffs, f)
        return u, (coeffs, u, cfac)

    def _bwd(res, ubar):
        coeffs, u, cfac = res
        w = _solve_refined(cfac, coeffs, ubar)
        pu = jnp.einsum("pij,j->pi", parts, u)  # (P, n)
        cbar = -(pu @ w)
        return cbar.astype(coeffs.dtype), w

    solve.defvjp(_fwd, _bwd)
    return solve


# ---------------------------------------------------------------------------
# Matrix-free preconditioned conjugate gradients (large meshes / sharded)
# ---------------------------------------------------------------------------


def pcg(matvec, b, minv, *, tol=1e-12, maxiter=1000, x0=None):
    """Jacobi/diagonal-preconditioned CG. All args full-dof; ``matvec`` must
    already apply the free-dof mask (fixed dofs stay identically zero).

    Returns (x, iters, residual_norm_sq). vmap- and shard_map-compatible:
    pure lax.while_loop, no data-dependent shapes.
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = minv * r
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.maximum(jnp.vdot(b, b), jnp.asarray(1e-300, b.dtype))

    def cond(state):
        x, r, z, p, rz, it = state
        return jnp.logical_and(it < maxiter, jnp.vdot(r, r) > tol * tol * bnorm)

    def body(state):
        x, r, z, p, rz, it = state
        kp = matvec(p)
        denom = jnp.vdot(p, kp)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * kp
        z = minv * r
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return x, r, z, p, rz_new, it + 1

    x, r, z, p, rz, it = jax.lax.while_loop(cond, body, (x, r, z, p, rz, jnp.array(0)))
    return x, it, jnp.vdot(r, r)


def make_matfree_affine_solver(
    ke_parts,
    lm,
    free_mask,
    ndof: int,
    *,
    tol: float = 1e-12,
    maxiter: int = 2000,
):
    """Differentiable matrix-free solver for the affine element operator.

    ke_parts: (P, nele, edof, edof) theta-independent element-block bases;
    ``K(c) = sum_p c_p * assemble(ke_parts[p])``. The returned
    ``solve(coeffs, f)`` works on full-dof vectors with fixed dofs masked to
    zero (free_mask: (ndof,) 0/1). Backward is one more PCG (same operator,
    symmetric) + P matrix-free matvecs.
    """
    ke_parts = jnp.asarray(ke_parts)
    lm = jnp.asarray(lm)
    free_mask = jnp.asarray(free_mask)

    def _combined_ke(coeffs):
        return jnp.tensordot(coeffs.astype(ke_parts.dtype), ke_parts, axes=1)

    def _masked_matvec(ke, x):
        y = element_matvec(ke, lm, x * free_mask, ndof)
        return y * free_mask + x * (1.0 - free_mask)  # identity on fixed dofs

    def _diag(ke):
        d = element_matvec_diag(ke, lm, ndof)
        d = jnp.where(free_mask > 0, d, 1.0)
        return 1.0 / d

    def _solve_once(coeffs, b):
        ke = _combined_ke(coeffs)
        minv = _diag(ke)
        mv = functools.partial(_masked_matvec, ke)
        x, _, _ = pcg(mv, b * free_mask, minv, tol=tol, maxiter=maxiter)
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
            ku = element_matvec(ke_parts[p], lm, u, ndof)
            cbar.append(-jnp.vdot(w, ku * free_mask))
        return jnp.stack(cbar).astype(coeffs.dtype), w

    solve.defvjp(_fwd, _bwd)
    return solve


def element_matvec_diag(ke, lm, ndof):
    diag_e = jnp.diagonal(ke, axis1=-2, axis2=-1)
    d = jnp.zeros((ndof,), dtype=ke.dtype)
    return d.at[lm.reshape(-1)].add(diag_e.reshape(-1))
