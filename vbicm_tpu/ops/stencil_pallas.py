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


def _mr_kernel(NX2: int, B: int, XLP: int, RPP: int, NPROG: int,
               c_ref, w_ref, u_hbm, q_ref, u_vmem, sems):
    g = pl.program_id(0)
    slot = jax.lax.rem(g, _i32(2))

    def chunk_copy(prog, buf):
        return pltpu.make_async_copy(
            u_hbm.at[:, pl.ds(prog * RPP * XLP, (RPP + 2) * XLP)],
            u_vmem.at[buf], sems.at[buf],
        )

    @pl.when(g == 0)
    def _():
        chunk_copy(g, slot).start()

    # prefetch the NEXT program's chunk into the other buffer while this
    # program computes — the double-buffering that makes the manual DMA
    # overlap instead of serialize
    @pl.when(g + 1 < NPROG)
    def _():
        chunk_copy(g + 1, jax.lax.rem(g + _i32(1), _i32(2))).start()

    chunk_copy(g, slot).wait()
    for ry in range(RPP):
        acc = [None, None]
        for dy in range(3):
            base = (ry + dy) * XLP
            for d in range(7):
                usl = u_vmem[slot, :, base + 1 + d : base + 1 + d + NX2]
                for p in range(2):
                    kk = ry * 48 + (p * 3 + dy) * 7 + d
                    t = w_ref[kk : kk + 1, :NX2] * usl
                    acc[p] = t if acc[p] is None else acc[p] + t
        q_ref[:, ry * XLP : ry * XLP + NX2] = (
            c_ref[0:B, 0:1] * acc[0] + c_ref[B : 2 * B, 0:1] * acc[1]
        )
        q_ref[:, ry * XLP + NX2 : (ry + 1) * XLP] = jnp.zeros(
            (B, XLP - NX2), jnp.float32
        )


@functools.partial(
    jax.jit, static_argnames=("NY", "NX", "rows_per_program", "interpret")
)
def stencil_affine_matvec_pallas_mr(w_int, coeffs, u, *, NY: int, NX: int,
                                    rows_per_program: int = 8,
                                    interpret: bool = False):
    """Multi-row variant of :func:`stencil_affine_matvec_pallas`.

    Hypothesis tested (round 3): the one-row-per-program kernel looked
    PER-PROGRAM bound (cost ~flat in batch from B=8 to B=64). This variant
    processes ``rows_per_program`` mesh rows per grid program from ONE
    contiguous row chunk, manually double-buffered across grid steps
    (program g prefetches chunk g+1 while computing), which also replaces
    the three overlapping row-view fetches — 3x the u traffic — with a
    single (RPP+2)-row copy. Same 42-plane VPU math, bit-identical results
    (interpret-mode parity 0.0 vs the one-row kernel).

    MEASURED OUTCOME (v5e, 160x80): the win is small — B=64: 0.706 ms vs
    0.755 one-row; B=256: 1.149 vs 1.182 (min-of-5x50). The kernel is VPU
    compute-bound at production batch, not pipeline/DMA-bound, so chunking
    and prefetch buy only the fill overhead. Kept as an opt-in variant;
    the one-row kernel stays the production default.

    VMEM: the u chunk is (B, (RPP+2)*XLP) f32 DOUBLE-buffered plus the
    blocked W rows and the double-buffered output block — at 160x80 B=256
    the scoped-VMEM stack OOMs for RPP=9 (19.9M > 16M limit, measured);
    keep 2*B*XLP*(RPP+2)*4 + B*RPP*XLP*8 under the 16 MB budget
    (RPP=3 fits at B=256, RPP<=9 at B=64).
    """
    B = u.shape[0]
    NX2 = 2 * NX
    RPP = rows_per_program
    XLP = -(-(NX2 + 8) // 128) * 128
    NYP = -(-NY // RPP) * RPP
    g = u.astype(jnp.float32).reshape(B, NY, NX2)
    upad = jnp.pad(
        g, ((0, 0), (1, 1 + NYP - NY), (4, XLP - NX2 - 4))
    ).reshape(B, (NYP + 2) * XLP)
    c = jnp.broadcast_to(
        jnp.transpose(coeffs.astype(jnp.float32)).reshape(2 * B, 1), (2 * B, 128)
    )
    qp = pl.pallas_call(
        functools.partial(_mr_kernel, NX2, B, XLP, RPP, NYP // RPP),
        out_shape=jax.ShapeDtypeStruct((B, NYP * XLP), jnp.float32),
        grid=(NYP // RPP,),
        in_specs=[
            pl.BlockSpec((2 * B, 128), lambda i: (_i32(0), _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RPP * 48, XLP), lambda i: (i, _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, RPP * XLP), lambda i: (_i32(0), i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, B, (RPP + 2) * XLP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(c, pad_w_rows(w_int, NY, RPP), upad)
    return qp.reshape(B, NYP, XLP)[:, :NY, :NX2].reshape(B, NY * NX2)


def pad_w_rows(w_int, NY: int, RPP: int):
    """Pad the (NY*48, XLP) packed planes to (ceil(NY/RPP)*RPP*48, XLP)
    with zero rows so the multi-row kernel's blocked W spec tiles evenly."""
    NYP = -(-NY // RPP) * RPP
    if NYP == NY:
        return w_int
    return jnp.pad(w_int, ((0, (NYP - NY) * 48), (0, 0)))


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
