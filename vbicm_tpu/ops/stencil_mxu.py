"""Pallas TPU kernel: batched 9-point block-stencil matvec on the MXU.

The row-stencil kernel (``ops.stencil_pallas``) evaluates the 42 folded
coefficient planes as VPU fused multiply-adds — pure VPU work, measured
1.35 ms at 160x80 B=256, within ~2x of VPU peak, while the in-loop
two-level CG iteration is 1.64 ms total: the solve is ~80% matvec-bound
and the MXU sits idle the whole time.

This kernel moves the stencil onto the MXU by densifying the 7-tap
lane-band into banded block matrices. For each mesh row ``y`` and output
lane tile ``t`` (128 lanes), the three contributing u-rows' 136-lane
source windows are concatenated into one (B, 416) operand and multiplied
against a (416, 256) banded table whose columns hold BOTH affine parts:

    acc[b, p*128 + k] = sum_{dy, w} u_row[y+dy][b, t*128 + w - 3]
                                      * M[y, t][dy*136 + w, p*128 + k]

i.e. ONE matmul per (row, tile) instead of 42 VPU plane passes; the
per-sample affine coefficients combine the two 128-column halves
in-register afterwards (the bf16-trap-safe scalar-broadcast form).
Densifying wastes ~19x the FLOPs of the band — and still wins, because
they run on the MXU.

Precision modes:

  * ``"bf16x3"`` (default) — the classic 3-pass bf16 split: operands are
    split u = uh + ul, M = Mh + Ml (bf16 high/low halves) and the product
    accumulated in f32 as uh@Mh + ul@Mh + uh@Ml, dropping only the
    ~2^-32-relative ul@Ml term. Equivalent to ``Precision.HIGH`` (which
    Mosaic's dot lowering does not expose). Measured parity vs the exact
    f64 operator: ~3e-6 relative — far below the f32 CG tolerance regime
    (3e-3) the hot loop runs at; final solve accuracy is restored by the
    f64/compensated refinement exactly as with the VPU kernel.
  * ``"f32"`` — single table, ``Precision.HIGHEST`` dots (6 bf16 passes),
    1e-7 parity; same cost class as the VPU kernel (measured 1.56 vs
    1.35 ms), kept for accuracy-critical callers.

Table footprint at 160x80: (NY, T, 416, 256) = 101 MB f32 ("f32") or
2 x 50 MB bf16 ("bf16x3") in HBM, one full read per matvec (~0.12 ms at
v5e HBM rates) — the price of MXU-shaped operands.

Layout rules follow ``ops.stencil_pallas``: every operand 2-D, batch in
sublanes, dof-interleaved grid coordinate in lanes, y-halo as three
row-shifted input views of the same padded flat array.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LPAD = 8  # left lane pad (>= 3 halo lanes, 8 keeps slices sublane-aligned)
WIN = 136  # padded per-dy source window (128 + 6 taps + 2 alignment pad)
KDIM = 3 * WIN + 8  # concatenated 3-dy window, padded to 416 = 16*26


def _i32(x):
    return jnp.asarray(x, jnp.int32)


def _row_kernel_bf16x3(NX2, B, T, c_ref, mh_ref, ml_ref,
                       um_ref, u0_ref, up_ref, q_ref):
    urows = (um_ref, u0_ref, up_ref)
    zpad = jnp.zeros((B, 8), jnp.float32)
    for t in range(T):
        s = LPAD - 3 + t * 128
        uw = jnp.concatenate(
            [urows[dy][:, s : s + WIN] for dy in range(3)] + [zpad], axis=1
        )  # (B, KDIM)
        uh = uw.astype(jnp.bfloat16)
        ul = (uw - uh.astype(jnp.float32)).astype(jnp.bfloat16)
        mh = mh_ref[t * KDIM : (t + 1) * KDIM, :]
        ml = ml_ref[t * KDIM : (t + 1) * KDIM, :]
        acc = (
            jnp.dot(uh, mh, preferred_element_type=jnp.float32)
            + jnp.dot(ul, mh, preferred_element_type=jnp.float32)
            + jnp.dot(uh, ml, preferred_element_type=jnp.float32)
        )  # (B, 256)
        q = c_ref[0:B, 0:1] * acc[:, :128] + c_ref[B : 2 * B, 0:1] * acc[:, 128:]
        q_ref[:, LPAD + t * 128 : LPAD + (t + 1) * 128] = q
    q_ref[:, 0:LPAD] = jnp.zeros((B, LPAD), jnp.float32)
    tail = q_ref.shape[1] - (LPAD + T * 128)
    if tail:
        q_ref[:, LPAD + T * 128 :] = jnp.zeros((B, tail), jnp.float32)


def _row_kernel_f32(NX2, B, T, c_ref, m_ref, um_ref, u0_ref, up_ref, q_ref):
    urows = (um_ref, u0_ref, up_ref)
    zpad = jnp.zeros((B, 8), jnp.float32)
    for t in range(T):
        s = LPAD - 3 + t * 128
        uw = jnp.concatenate(
            [urows[dy][:, s : s + WIN] for dy in range(3)] + [zpad], axis=1
        )
        mb = m_ref[t * KDIM : (t + 1) * KDIM, :]
        acc = jax.lax.dot_general(
            uw, mb, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        q = c_ref[0:B, 0:1] * acc[:, :128] + c_ref[B : 2 * B, 0:1] * acc[:, 128:]
        q_ref[:, LPAD + t * 128 : LPAD + (t + 1) * 128] = q
    q_ref[:, 0:LPAD] = jnp.zeros((B, LPAD), jnp.float32)
    tail = q_ref.shape[1] - (LPAD + T * 128)
    if tail:
        q_ref[:, LPAD + T * 128 :] = jnp.zeros((B, tail), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("NY", "NX", "interpret", "mode")
)
def stencil_affine_matvec_mxu(m_bands, coeffs, u, *, NY: int, NX: int,
                              interpret: bool = False, mode: str = "bf16x3"):
    """q = K(c) @ u for a batch via banded MXU matmuls.

    m_bands: from :func:`pack_w_bands` — (Mh, Ml) bf16 pair for
    ``mode="bf16x3"``, a single f32 table for ``mode="f32"``; coeffs
    (B, 2); u (B, ndof), ndof = NY*NX*2. Returns (B, ndof) f32.
    """
    B = u.shape[0]
    NX2 = 2 * NX
    T = -(-NX2 // 128)
    XL = -(-(LPAD + T * 128) // 128) * 128  # lane-padded row length
    g = u.astype(jnp.float32).reshape(B, NY, NX2)
    upad = jnp.pad(g, ((0, 0), (1, 1), (LPAD, XL - NX2 - LPAD))).reshape(
        B, (NY + 2) * XL
    )
    c = jnp.broadcast_to(
        jnp.transpose(coeffs.astype(jnp.float32)).reshape(2 * B, 1), (2 * B, 128)
    )
    rows_per_y = T * KDIM

    u_spec = lambda dy: pl.BlockSpec(
        (B, XL),
        lambda y, _dy=dy: (_i32(0), y + _i32(_dy)),
        memory_space=pltpu.VMEM,
    )
    m_spec = pl.BlockSpec((rows_per_y, 256), lambda y: (y, _i32(0)),
                          memory_space=pltpu.VMEM)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((B, NY * XL), jnp.float32),
        grid=(NY,),
        out_specs=pl.BlockSpec((B, XL), lambda y: (_i32(0), y),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    c_spec = pl.BlockSpec((2 * B, 128), lambda y: (_i32(0), _i32(0)),
                          memory_space=pltpu.VMEM)
    if mode == "bf16x3":
        mh, ml = m_bands
        qp = pl.pallas_call(
            functools.partial(_row_kernel_bf16x3, NX2, B, T),
            in_specs=[c_spec, m_spec, m_spec, u_spec(0), u_spec(1), u_spec(2)],
            **common,
        )(c, mh, ml, upad, upad, upad)
    elif mode == "f32":
        qp = pl.pallas_call(
            functools.partial(_row_kernel_f32, NX2, B, T),
            in_specs=[c_spec, m_spec, u_spec(0), u_spec(1), u_spec(2)],
            **common,
        )(c, m_bands, upad, upad, upad)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return qp.reshape(B, NY, XL)[:, :, LPAD : LPAD + NX2].reshape(B, NY * NX2)


def pack_w_bands(W, mode: str = "bf16x3"):
    """(P, NY, NX, 3, 3, 2, 2) stencil tables -> banded MXU tables.

    Layout: (NY * T * KDIM, 256) with row block [y, t] a (KDIM, 256)
    matrix — row dy*WIN + (k + d), column p*128 + k holds the folded
    coefficient for output lane i = t*128 + k (dof-interleaved i = 2x+a)
    receiving from source lane j = i + (d - 3), summed over (dx, b) with
    2*dx + b - a = d - 3 (the fold of ``stencil_pallas.pack_w_interleaved``).

    Returns (Mh, Ml) jnp bf16 arrays for ``mode="bf16x3"`` (high/low split
    of the f64 table), or one f32 array for ``mode="f32"``.
    """
    P, NY, NX = W.shape[:3]
    assert P == 2
    NX2 = 2 * NX
    T = -(-NX2 // 128)
    planes = np.zeros((P, NY, 3, 7, T * 128))
    for p in range(P):
        for dy in range(3):
            for dx in range(3):
                for a in range(2):
                    for b in range(2):
                        delta = 2 * (dx - 1) + b - a
                        planes[p, :, dy, delta + 3, a:NX2:2] += W[p, :, :, dy, dx, a, b]
    out = np.zeros((NY, T, KDIM, 256))
    k = np.arange(128)
    for p in range(P):
        for dy in range(3):
            for t in range(T):
                for d in range(7):  # delta = d - 3; window row dy*WIN + k + d
                    vals = planes[p, :, dy, d, t * 128 : (t + 1) * 128]  # (NY, 128)
                    out[:, t, dy * WIN + k + d, p * 128 + k] = vals
    out = out.reshape(NY * T * KDIM, 256)
    if mode == "bf16x3":
        hi = jnp.asarray(out, jnp.bfloat16)
        lo = jnp.asarray(out - np.asarray(hi, np.float64), jnp.bfloat16)
        return hi, lo
    if mode == "f32":
        return jnp.asarray(out, jnp.float32)
    raise ValueError(f"unknown mode {mode!r}")
