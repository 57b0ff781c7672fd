"""Pallas TPU kernel: fused batched affine element matvec.

The matrix-free CG hot op (``ops.solve._affine_matvec``) is

    q[b, e, i] = sum_j ( c0[b]*ke0[e,i,j] + c1[b]*ke1[e,i,j] ) * ue[b, e, j]

for a batch b of samples over all elements e (edof i, j). XLA executes the
per-part einsums as two passes that each materialize a (B, nele, edof)
intermediate in HBM and then combine them — at 160x80/B=256 that is
~420 MB of intermediate traffic per CG iteration. This kernel fuses the
two part products and the affine combine so ``ue`` is read ONCE and the
only output is the combined ``qe``.

Layout (structure-of-arrays, the TPU-native choice): everything carries the
ELEMENT axis last so it is the 128-lane dimension —

    ue  (B, edof, nele_p)  — produced directly by ``u[:, lm.T]`` (no
                             transpose op; the gather index layout does it)
    ke  (P, edof, edof, nele_p) — constant across the batch, VMEM-resident
                             per element tile and reused for all batch tiles
    q   (B, edof, nele_p)

and the kernel body is 64 fused multiply-adds of (B_t, E_t) tiles on the
VPU (per-element 8x8 blocks are hopeless MXU shapes; as element-lane vector
FMAs they run at VPU speed with perfect lane utilization). The element axis
is zero-padded to a multiple of the lane width by the caller wrapper; the
scatter back to dofs uses the same sorted segment-sum lowering as
``ops.assembly`` with a permutation built for the transposed (i, e) layout.

This is the round-1 deferral item (docs/STATUS.md item 4): the fused
matrix-free path for refined meshes where the dense spectral solver no
longer fits.

Measured (v5e, B=256, 160x80, f32): pallas-fused 3.88 ms/matvec (tile_e
1024) vs XLA per-part 3.45 ms — the end-to-end op is bound by the
OUT-OF-KERNEL gather/scatter HBM traffic (~400 MB/iteration), which the
kernel cannot absorb (TPU Pallas has no efficient in-kernel random gather
along lanes), so XLA's fusion of the FMA chain into the gather wins
slightly. Like ``spectral_pallas``, kept as a correct, tested template —
the production matvec stays on the per-part XLA path (``ops.solve``).
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


def _matvec_kernel(edof: int, c_ref, ke_ref, ue_ref, q_ref):
    """One (batch-tile, element-tile) block.

    c_ref: (B_t, 128) broadcast coefficients, columns 0/1 = c0/c1
    ke_ref: (P, edof, edof, E_t); ue_ref/q_ref: (B_t, edof, E_t).
    """
    c0 = c_ref[:, 0:1]  # (B_t, 1) -> broadcasts over lanes
    c1 = c_ref[:, 1:2]
    for i in range(edof):
        acc = None
        for j in range(edof):
            kij = c0 * ke_ref[0, i, j, :][None, :] + c1 * ke_ref[1, i, j, :][None, :]
            term = kij * ue_ref[:, j, :]
            acc = term if acc is None else acc + term
        q_ref[:, i, :] = acc


@functools.partial(jax.jit, static_argnames=("tile_b", "tile_e", "interpret"))
def element_matvec_fused(ke_soa, coeffs, ue_soa, *, tile_b: int = 8,
                         tile_e: int = 1024, interpret: bool = False):
    """Fused affine element matvec.

    ke_soa: (2, edof, edof, nele_p) f32 with nele_p % tile_e == 0;
    coeffs: (B, 2); ue_soa: (B, edof, nele_p). Returns (B, edof, nele_p).
    B is padded to tile_b internally.
    """
    P, edof, _, nele_p = ke_soa.shape
    B = ue_soa.shape[0]
    assert nele_p % tile_e == 0, (nele_p, tile_e)
    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    if Bp != B:
        ue_soa = jnp.concatenate(
            [ue_soa, jnp.zeros((Bp - B, edof, nele_p), ue_soa.dtype)], axis=0
        )
        coeffs = jnp.concatenate(
            [coeffs, jnp.zeros((Bp - B, 2), coeffs.dtype)], axis=0
        )
    c_b = jnp.broadcast_to(coeffs[:, None, :], (Bp, 1, 2))
    c_b = jnp.pad(c_b, ((0, 0), (0, 0), (0, 126))).reshape(Bp, 128)

    grid = (Bp // tile_b, nele_p // tile_e)
    out = pl.pallas_call(
        functools.partial(_matvec_kernel, edof),
        out_shape=jax.ShapeDtypeStruct((Bp, edof, nele_p), ue_soa.dtype),
        grid=grid,
        # NOTE: index-map constants must match the program-id dtype (i32) —
        # under jax_enable_x64 a bare Python 0 traces as i64 and Mosaic
        # fails to legalize the mixed-type func.return
        in_specs=[
            pl.BlockSpec((tile_b, 128), lambda b, e: (b, _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, edof, edof, tile_e),
                         lambda b, e: (_i32(0), _i32(0), _i32(0), e),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, edof, tile_e), lambda b, e: (b, _i32(0), e),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, edof, tile_e),
                               lambda b, e: (b, _i32(0), e),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c_b, ke_soa, ue_soa)
    return out[:B]


def make_fused_affine_matvec(model, *, dtype=jnp.float32, tile_e: int = 1024,
                             interpret: bool = False):
    """Build ``matvec(coeffs (B, 2), u (B, ndof)) -> K(c) u (B, ndof)``
    on the fused kernel: SoA gather -> pallas FMA block -> sorted
    segment-sum scatter. Fixed dofs are handled by the caller's masking
    (same contract as ``ops.solve``'s matvec)."""
    lm = np.asarray(model.lm)
    nele, edof = lm.shape
    lanes = 128
    nele_p = ((nele + tile_e - 1) // tile_e) * tile_e
    if nele_p % lanes:
        nele_p = ((nele_p + lanes - 1) // lanes) * lanes

    # SoA element blocks, zero-padded elements contribute nothing
    ke = np.zeros((2, edof, edof, nele_p), dtype=np.float32)
    ke[0, :, :, :nele] = np.asarray(model.ke_lam).transpose(1, 2, 0)
    ke[1, :, :, :nele] = np.asarray(model.ke_mu).transpose(1, 2, 0)
    ke = jnp.asarray(ke, dtype)

    # gather index (edof, nele_p): padded elements read dof 0 (harmless —
    # their ke is zero); scatter permutation over the (i, e) layout sends
    # padded entries to a trash segment
    lmT = np.zeros((edof, nele_p), dtype=np.int32)
    lmT[:, :nele] = lm.T
    lmT_j = jnp.asarray(lmT)

    flat_ids = np.full(edof * nele_p, model.ndof, dtype=np.int64)  # trash row
    flat_ids.reshape(edof, nele_p)[:, :nele] = lm.T
    perm = np.argsort(flat_ids, kind="stable").astype(np.int32)
    ids_sorted = jnp.asarray(flat_ids[perm].astype(np.int32))
    perm_j = jnp.asarray(perm)
    ndof = model.ndof

    def matvec(coeffs, u):
        ue = u[:, lmT_j].astype(dtype)  # (B, edof, nele_p) SoA gather
        qe = element_matvec_fused(ke, coeffs.astype(dtype), ue,
                                  tile_e=tile_e, interpret=interpret)
        flat = qe.reshape(qe.shape[0], -1)[:, perm_j]
        q = jax.ops.segment_sum(
            flat.T, ids_sorted, num_segments=ndof + 1, indices_are_sorted=True
        ).T  # segment over the leading axis; batch rides along
        return q[:, :ndof]

    return matvec
