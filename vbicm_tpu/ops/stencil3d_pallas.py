"""Pallas TPU kernel: fused batched 27-point block-stencil affine matvec.

3-D sibling of ``ops.stencil_pallas``. The XLA lowering of the hex8 box
stencil (``ops.stencil3d``) emits the 27 shifted contractions as separate
HBM passes per part (54 streams of the full u grid per application); this
kernel performs the whole operator application per (z, y) grid row while the
nine contributing u-rows sit in VMEM and applies the per-sample affine
coefficients in-register.

Layout (see ``ops.stencil_pallas`` for the measured rationale — identical
rules, third axis added):

  * every operand is 2-D: batch in SUBLANES, flattened dof-INTERLEAVED grid
    coordinate in LANES (3-D operands trigger axon relayout copies at
    ~1 GB/s in front of the custom call);
  * dof interleave with 3 dofs/node: lane l = 3x + a. The 3x3 block stencil
    becomes an 11-tap 1-D stencil per (dz, dy): source lane 3(x+dx) + b sits
    at delta = 3 dx + (b - a) in {-5..5}, and (dx, b) pairs sharing a delta
    fold into one coefficient plane — 2 parts x 9 (dz,dy) x 11 taps = 198
    planes (vs 2 x 27 x 9 = 486 raw block terms);
  * the (z, y) halo is NINE input views of the row-padded flat array whose
    block-index maps differ by one row-block; the standard Pallas pipeline
    double-buffers the row fetches.

Grid = one program per (z, y) mesh row; 198 (B, 3NX)-shaped VPU fused
multiply-adds per row.
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


_ROWS = 200  # 198 coefficient planes padded to a sublane multiple


def _row_kernel(NX3: int, B: int, c_ref, w_ref, *refs):
    urows = refs[:9]  # (B, XLP) lane-padded rows, (dz, dy) raster order
    q_ref = refs[9]
    acc = [None, None]  # per part -> (B, NX3)
    for v in range(9):
        row = urows[v]
        for d in range(11):  # lane offset delta = d - 5; slice start = d
            usl = row[:, d : d + NX3]
            for p in range(2):
                kk = (p * 9 + v) * 11 + d
                t = w_ref[kk : kk + 1, :NX3] * usl  # (1,NX3) x (B,NX3)
                acc[p] = t if acc[p] is None else acc[p] + t
    q_ref[:, :NX3] = c_ref[0:B, 0:1] * acc[0] + c_ref[B : 2 * B, 0:1] * acc[1]
    q_ref[:, NX3:] = jnp.zeros((B, q_ref.shape[1] - NX3), jnp.float32)


@functools.partial(jax.jit, static_argnames=("NZ", "NY", "NX", "interpret"))
def stencil_affine_matvec_pallas_3d(w_int, coeffs, u, *, NZ: int, NY: int,
                                    NX: int, interpret: bool = False):
    """q = K(c) @ u for a batch: w_int (NZ*NY*_ROWS, XLP) f32 (see
    ``pack_w_interleaved_3d``); coeffs (B, 2); u (B, ndof),
    ndof = NZ*NY*NX*3. Returns (B, ndof) f32."""
    B = u.shape[0]
    NX3 = 3 * NX
    XLP = -(-(NX3 + 10) // 128) * 128
    NYP = NY + 2
    g = u.astype(jnp.float32).reshape(B, NZ, NY, NX3)
    upad = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (5, XLP - NX3 - 5))).reshape(
        B, (NZ + 2) * NYP * XLP
    )
    c = jnp.broadcast_to(
        jnp.transpose(coeffs.astype(jnp.float32)).reshape(2 * B, 1), (2 * B, 128)
    )

    def u_spec(dz, dy):
        return pl.BlockSpec(
            (B, XLP),
            lambda z, y, _dz=dz, _dy=dy: (
                _i32(0),
                (z + _i32(_dz)) * _i32(NYP) + y + _i32(_dy),
            ),
            memory_space=pltpu.VMEM,
        )

    qp = pl.pallas_call(
        functools.partial(_row_kernel, NX3, B),
        out_shape=jax.ShapeDtypeStruct((B, NZ * NY * XLP), jnp.float32),
        grid=(NZ, NY),
        in_specs=[
            pl.BlockSpec((2 * B, 128), lambda z, y: (_i32(0), _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, XLP), lambda z, y: (z * _i32(NY) + y, _i32(0)),
                         memory_space=pltpu.VMEM),
        ]
        + [u_spec(dz, dy) for dz in range(3) for dy in range(3)],
        out_specs=pl.BlockSpec((B, XLP), lambda z, y: (_i32(0), z * _i32(NY) + y),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c, w_int, *([upad] * 9))
    return qp.reshape(B, NZ * NY, XLP)[:, :, :NX3].reshape(B, NZ * NY * NX3)


def pack_w_interleaved_3d(W) -> np.ndarray:
    """(P, NZ, NY, NX, 3, 3, 3, 3, 3) stencil tables (from
    ``ops.stencil3d.build_stencil_tables_3d``) -> (NZ*NY*_ROWS, XLP) f32
    lane-interleaved delta planes: row (z*NY + y)*_ROWS + (p*9 + dz*3 +
    dy)*11 + (delta + 5), lane 3x + a, value = sum over (dx, b) with
    3*dx + b - a = delta of W[p, z, y, x, dz, dy, dx, a, b]."""
    P, NZ, NY, NX = W.shape[:4]
    assert P == 2
    NX3 = 3 * NX
    XLP = -(-(NX3 + 10) // 128) * 128
    wt = np.zeros((NZ * NY, _ROWS, XLP), np.float32)
    for p in range(P):
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    for a in range(3):
                        for b in range(3):
                            delta = 3 * (dx - 1) + b - a
                            kk = (p * 9 + dz * 3 + dy) * 11 + delta + 5
                            wt[:, kk, a:NX3:3] += W[
                                p, :, :, :, dz, dy, dx, a, b
                            ].reshape(NZ * NY, NX)
    return np.ascontiguousarray(wt.reshape(NZ * NY * _ROWS, XLP))
