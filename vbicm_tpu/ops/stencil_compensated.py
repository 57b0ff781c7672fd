"""f64-grade refinement residuals from pure-f32 stencil arithmetic.

The iterative-refinement residual ``r = b - K(c) x`` is the cost anchor of
the mixed-precision full-order solve: computed the straightforward way it
needs an f64 operator application, and f64 on TPU is VPU-emulated — the
element-path f64 matvec costs 143 ms at 160x80 B=256 (measured round 3),
more than the entire f32 CG solve it polishes. The existing "split_f32"
speed mode (``ops.solve``) avoids it by applying the f32 operator to the
two f32 halves of x, but its accuracy floor is kappa * eps_f32 ~ 2e-4:
each f32 product W*u rounds at 1e-7 RELATIVE TO THE FULL TERM, and the
residual's cancellation amplifies that by the conditioning.

This module removes the floor with compensated arithmetic, keeping every
tensor op in f32:

  * x = x1 + x2        exact two-f32 split of the f64 iterate (48 bits)
  * W64 = W1 + W2      exact two-f32 split of the stencil tables
  * leading terms W1*x1: error-free Dekker TwoProd (the 12-bit operand
    splits W1 = W1h + W1l are precomputed host-side; products of 12-bit
    halves are EXACT in f32), accumulated with Knuth TwoSum into a
    running (S, E) head/tail pair
  * cross terms W1*x2 + W2*x1 (~1e-7 relative): plain f32, accumulated
    into the tail — their rounding is O(1e-14) relative
  * W2*x2 (~1e-14 relative): dropped
  * the per-part (S_p, E_p) pairs are combined with the f64 coefficients
    and subtracted from b in f64 — elementwise only, no f64 matvec

Error budget ~1e-14 relative to |K||x| (measured 8e-15 on Cook's 32x16),
so the refined solution lands where the true-f64 residual path does (the
CG tolerance dominates: 2.4e-8 vs 2.7e-8 relative at tol 3e-3 + one
refinement, measured at 160x80), at pure-f32 VPU cost: 21.6 vs 143 ms per
B=256 batch — which turns into 1148 -> 2820 solves/s end to end.

Works for both the 2-D 9-point (``ops.stencil``) and 3-D 27-point
(``ops.stencil3d``) block stencils. All ops are elementwise/slice on
(*grid, A) views — one XLA fusion region per part, vmap-batched like the
rest of the solver. (In the solver the call is fenced with
``lax.optimization_barrier`` — see ``ops.solve``.)

No reference counterpart (the reference is f64 end-to-end on CPU,
``main_custom_training.py:109``); this is TPU-native machinery.
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

_SPLITTER = np.float32(4097.0)  # 2^12 + 1: Dekker split at 12 bits


def _dekker_split_np(a: np.ndarray):
    """Exact 12-bit head/tail split of f32 values (host-side, for tables)."""
    a = np.asarray(a, np.float32)
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, (a - hi).astype(np.float32)


def _dekker_split(a):
    """Exact 12-bit head/tail split of f32 values (traced)."""
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, a - hi


def _two_sum(s, p):
    """Knuth TwoSum: s + p = z + e exactly. Returns (z, e)."""
    z = s + p
    t = z - s
    e = (s - (z - t)) + (p - t)
    return z, e


def _make_residual_from_tables(W, free_mask, grid_shape, A: int):
    """Generic n-D compensated residual from per-offset block tables.

    W: (P, *grid_nodes, *3^ndim, A, A) float64; grid_shape = node counts
    (slowest-varying first); A = dofs per node.
    """
    W = np.asarray(W)
    P = W.shape[0]
    ndim = len(grid_shape)
    W1 = W.astype(np.float32)
    W2 = (W - W1).astype(np.float32)
    W1h, W1l = _dekker_split_np(W1)
    tW1 = jnp.asarray(W1)
    tW2 = jnp.asarray(W2)
    tW1h = jnp.asarray(W1h)
    tW1l = jnp.asarray(W1l)
    mask64 = jnp.asarray(free_mask)
    offsets = list(itertools.product(range(3), repeat=ndim))

    def residual(coeffs, b, x):
        xm = (x * mask64).reshape(*grid_shape, A)
        x1 = xm.astype(jnp.float32)
        x2 = (xm - x1).astype(jnp.float32)
        pad = tuple((1, 1) for _ in range(ndim)) + ((0, 0),)
        u1 = jnp.pad(x1, pad)
        u2 = jnp.pad(x2, pad)
        u1h, u1l = _dekker_split(u1)

        q = None
        for p in range(P):
            S = jnp.zeros((*grid_shape, A), jnp.float32)
            E = jnp.zeros((*grid_shape, A), jnp.float32)
            for off in offsets:
                sl = tuple(slice(d, d + n) for d, n in zip(off, grid_shape))
                widx = (p,) + tuple(slice(None) for _ in range(ndim)) + off
                for bcomp in range(A):
                    ub = u1[sl + (bcomp,)][..., None]
                    ubh = u1h[sl + (bcomp,)][..., None]
                    ubl = u1l[sl + (bcomp,)][..., None]
                    ub2 = u2[sl + (bcomp,)][..., None]
                    w = tW1[widx + (slice(None), bcomp)]
                    wh = tW1h[widx + (slice(None), bcomp)]
                    wl = tW1l[widx + (slice(None), bcomp)]
                    w2 = tW2[widx + (slice(None), bcomp)]
                    # TwoProd: w*ub = prod + perr exactly
                    prod = w * ub
                    perr = ((wh * ubh - prod) + wh * ubl + wl * ubh) + wl * ubl
                    S, serr = _two_sum(S, prod)
                    # tail: product error + summation error + cross terms
                    E = E + (perr + serr) + (w * ub2 + w2 * ub)
            qp = S.astype(jnp.float64) + E.astype(jnp.float64)
            cp = coeffs[p]
            q = cp * qp if q is None else q + cp * qp
        return (b - q.reshape(-1)) * mask64

    return residual


def make_compensated_residual(model, nx: int, ny: int, W=None):
    """Build ``residual(coeffs, b, x) -> r`` with ``r = (b - K(c)(x*mask))*mask``
    accurate to ~1e-14 relative, using only f32 tensor arithmetic, for the
    2-D structured quad4 grid of ``ops.stencil``.

    ``coeffs`` (P,) f64, ``b``/``x`` (ndof,) f64 full-dof vectors. vmap
    over a batch axis for the per-sample refinement residuals.
    """
    from .stencil import build_stencil_tables

    if W is None:
        W = build_stencil_tables(model, nx, ny)
    return _make_residual_from_tables(W, model.free_mask, (ny + 1, nx + 1), 2)


def make_compensated_residual_3d(model, nx: int, ny: int, nz: int, W=None):
    """3-D sibling of :func:`make_compensated_residual` for the hex8
    27-point box stencil of ``ops.stencil3d``."""
    from .stencil3d import build_stencil_tables_3d

    if W is None:
        W = build_stencil_tables_3d(model, nx, ny, nz)
    return _make_residual_from_tables(
        W, model.free_mask, (nz + 1, ny + 1, nx + 1), 3
    )
