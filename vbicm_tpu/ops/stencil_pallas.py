"""Pallas TPU kernel: fused batched 9-point block-stencil affine matvec.

The XLA lowering of the structured-grid stencil (``ops.stencil``) emits the
9 shifted contractions as separate HBM passes (5.6 ms/matvec at 160x80,
B=256 — measured, round 2; the element gather/einsum/scatter path is
3.8 ms). This kernel performs the whole operator application per grid row
while the three contributing u-rows sit in VMEM, and applies the per-sample
affine coefficients in-register: 1.2 ms isolated / 1.65 ms under the
vmapped jit — 3.4x the XLA stencil, 2.3x the element path.

Layout — the part that actually matters on this hardware:

  * EVERY operand is 2-D with the batch in SUBLANES and the flattened,
    dof-INTERLEAVED grid coordinate in LANES. 3-D operands are poison: the
    axon runtime assigns host transfers and jit outputs non-default layouts
    (e.g. major_to_minor (1,0,2)), and the relayout copy XLA inserts in
    front of the Pallas custom call runs at ~1 GB/s (~30 ms round trip —
    measured; it dominated two earlier designs of this kernel). 2-D arrays
    always carry the default layout, so the kernel sees zero relayouts.
  * The dof interleave (lane i = 2x + a) makes the 2x2 block stencil a 1-D
    7-tap stencil per y-offset: source lane j = 2(x+dx) + b sits at offset
    delta = 2*dx + (b - a) in {-3..3}, and (dx, b) pairs sharing a delta
    fold into one coefficient plane (42 planes total instead of 72).
  * The y-halo is expressed as THREE input views of the row-padded flat
    array whose index maps differ by one row-block — the standard Pallas
    pipeline double-buffers the row fetches, no manual DMA.

    q[:, y*NX2 + i] = sum_p c_p[:] * sum_{dy in 0..2, d in 0..6}
        Wt[y*42 + (p*3+dy)*7 + d, i] * u_pad[:, (y+dy)*XL + 4 + i + d - 3]

Grid = one program per mesh row; 42 (B, 2NX)-shaped VPU fused multiply-adds
per row. Exact to f32 rounding vs the f64 assembled operator (1.8e-7
relative, measured). Host-side transform is reshape+pad only — no
transposes. NOTE (round-2 measurement): the end-to-end two-level CG is
NOT matvec-bound — the prolong/restrict gathers of the preconditioner cost
8.2 ms/iteration vs 3.8 ms for the element matvec — so this kernel alone
does not speed up the solve; it pays off combined with the structured-grid
transfer operators (``ops.multigrid`` reshape-based variants).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _i32(x):
    return jnp.asarray(x, jnp.int32)


def _row_kernel(NX2: int, B: int, c_ref, w_ref, um_ref, u0_ref, up_ref, q_ref):
    urows = (um_ref, u0_ref, up_ref)
    acc = [None, None]  # per part -> (B, NX2)
    for dy in range(3):
        row = urows[dy]  # (B, XLP) lane-padded row
        for d in range(7):  # lane offset delta = d - 3; slice start 4+delta
            usl = row[:, 1 + d : 1 + d + NX2]
            for p in range(2):
                kk = (p * 3 + dy) * 7 + d
                t = w_ref[kk : kk + 1, :NX2] * usl  # (1,NX2) x (B,NX2)
                acc[p] = t if acc[p] is None else acc[p] + t
    q_ref[:, :NX2] = c_ref[0:B, 0:1] * acc[0] + c_ref[B : 2 * B, 0:1] * acc[1]
    q_ref[:, NX2:] = jnp.zeros((B, q_ref.shape[1] - NX2), jnp.float32)


@functools.partial(jax.jit, static_argnames=("NY", "NX", "interpret"))
def stencil_affine_matvec_pallas(w_int, coeffs, u, *, NY: int, NX: int,
                                 interpret: bool = False):
    """q = K(c) @ u for a batch: w_int (NY*48, XLP) f32 (see
    ``pack_w_interleaved``); coeffs (B, 2); u (B, ndof), ndof = NY*NX*2.
    Returns (B, ndof) f32."""
    B = u.shape[0]
    NX2 = 2 * NX
    # lane-pad each mesh row to a multiple of 128 (Mosaic block constraint);
    # 4 leading halo lanes, zero tail
    XLP = -(-(NX2 + 8) // 128) * 128
    g = u.astype(jnp.float32).reshape(B, NY, NX2)
    upad = jnp.pad(g, ((0, 0), (1, 1), (4, XLP - NX2 - 4))).reshape(
        B, (NY + 2) * XLP
    )
    # (2B, 128) coefficient columns: rows [0,B) = c0, [B,2B) = c1
    c = jnp.broadcast_to(
        jnp.transpose(coeffs.astype(jnp.float32)).reshape(2 * B, 1), (2 * B, 128)
    )

    u_spec = lambda dy: pl.BlockSpec(
        (B, XLP),
        lambda y, _dy=dy: (_i32(0), y + _i32(_dy)),
        memory_space=pltpu.VMEM,
    )
    qp = pl.pallas_call(
        functools.partial(_row_kernel, NX2, B),
        out_shape=jax.ShapeDtypeStruct((B, NY * XLP), jnp.float32),
        grid=(NY,),
        in_specs=[
            pl.BlockSpec((2 * B, 128), lambda y: (_i32(0), _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, XLP), lambda y: (y, _i32(0)),
                         memory_space=pltpu.VMEM),
            u_spec(0),
            u_spec(1),
            u_spec(2),
        ],
        out_specs=pl.BlockSpec((B, XLP), lambda y: (_i32(0), y),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c, w_int, upad, upad, upad)
    return qp.reshape(B, NY, XLP)[:, :, :NX2].reshape(B, NY * NX2)


def pack_w_interleaved(W) -> np.ndarray:
    """(P, NY, NX, 3, 3, 2, 2) stencil tables -> (NY*48, XLP) f32
    lane-interleaved delta planes, rows padded 42->48 and lanes to the
    128-multiple XLP: row y*48 + (p*3+dy)*7 + (delta+3), lane 2x+a, value =
    sum over (dx, b) with 2*dx + b - a = delta of W[p, y, x, dy, dx, a, b]."""
    P, NY, NX = W.shape[:3]
    assert P == 2
    XLP = -(-(2 * NX + 8) // 128) * 128
    wt = np.zeros((NY, 48, XLP), np.float32)  # rows/lanes padded to (8k, 128k)
    for p in range(P):
        for dy in range(3):
            for dx in range(3):
                for a in range(2):
                    for b in range(2):
                        delta = 2 * (dx - 1) + b - a
                        kk = (p * 3 + dy) * 7 + delta + 3
                        wt[:, kk, a : 2 * NX : 2] += W[p, :, :, dy, dx, a, b]
    return np.ascontiguousarray(wt.reshape(NY * 48, XLP))
