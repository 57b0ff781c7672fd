"""Structured-grid 27-point block-stencil matvec for hex8 box meshes.

3-D sibling of ``ops.stencil``: on the structured hex8 numbering of
``mesh/solid3d.py`` (node = (k*(ny+1)+j)*(nx+1)+i) the assembled affine
stiffness couples each node to its 26 grid neighbours, so ``K_p @ u`` is a
27-point stencil of 3x3 dof blocks — applied as shifted elementwise
contractions on the (NZ, NY, NX, 3) grid view, with zero index arrays in
the hot loop. Tables are built by scattering the affine element blocks
(ke_lam/ke_mu) by grid offset; exact (to rounding) equality with the
assembled operator. The f32 BATCHED application — the CG hot loop under
vmap — dispatches to the Pallas row kernel (``ops.stencil3d_pallas``,
round 3); unbatched and f64 applications use the XLA lowering here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# local hex8 node (k, j, i) offsets for the conn order of mesh/solid3d.py:
# bottom quad CCW then top quad CCW
_LPOS = np.array(
    [
        [0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
        [1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0],
    ]
)


def build_stencil_tables_3d(model, nx: int, ny: int, nz: int):
    """(P, NZ, NY, NX, 3, 3, 3, 3, 3) per-offset block tables from the
    model's affine element stiffness parts."""
    if model.has_constraints:
        raise NotImplementedError("stencil matvec assumes the unconstrained grid layout")
    NX, NY, NZ = nx + 1, ny + 1, nz + 1
    nele = nx * ny * nz
    if model.nele != nele or model.ndof != NZ * NY * NX * 3:
        raise ValueError("model does not match the (nx, ny, nz) structured grid")
    ke = np.stack([np.asarray(model.ke_lam), np.asarray(model.ke_mu)])  # (2, nele, 24, 24)
    P = ke.shape[0]
    eidx = np.arange(nele)
    kk, rem = np.divmod(eidx, ny * nx)
    jj, ii = np.divmod(rem, nx)
    W = np.zeros((P, NZ, NY, NX, 3, 3, 3, 3, 3))
    for li in range(8):
        iz = kk + _LPOS[li, 0]
        iy = jj + _LPOS[li, 1]
        ix = ii + _LPOS[li, 2]
        for lj in range(8):
            dz = _LPOS[lj, 0] - _LPOS[li, 0] + 1
            dy = _LPOS[lj, 1] - _LPOS[li, 1] + 1
            dx = _LPOS[lj, 2] - _LPOS[li, 2] + 1
            for p in range(P):
                for a in range(3):
                    for b in range(3):
                        np.add.at(
                            W[p, :, :, :, dz, dy, dx, a, b],
                            (iz, iy, ix),
                            ke[p, :, 3 * li + a, 3 * lj + b],
                        )
    return W


def make_stencil_part_matvec_3d(model, nx: int, ny: int, nz: int, W=None):
    """``(part_matvec(p, x), diag_parts)`` for
    ``ops.solve.make_matfree_affine_solver`` on a hex8 box model: K_p as the
    27-point block stencil (f32/f64 table dispatch on x.dtype)."""
    if W is None:
        W = build_stencil_tables_3d(model, nx, ny, nz)
    NX, NY, NZ = nx + 1, ny + 1, nz + 1
    tables = {
        jnp.dtype(jnp.float64): jnp.asarray(W),
        jnp.dtype(jnp.float32): jnp.asarray(W, jnp.float32),
    }
    diag = np.stack(
        [
            np.stack(
                [W[p, :, :, :, 1, 1, 1, a, a] for a in range(3)], axis=-1
            ).reshape(-1)
            for p in range(W.shape[0])
        ]
    )
    hp = jax.lax.Precision.HIGHEST

    def part_matvec(p, x):
        Wp = tables[jnp.dtype(x.dtype)][p]
        ug = x.reshape(NZ, NY, NX, 3)
        up = jnp.pad(ug, ((1, 1), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    t = jnp.einsum(
                        "zyxab,zyxb->zyxa",
                        Wp[:, :, :, dz, dy, dx],
                        up[dz : dz + NZ, dy : dy + NY, dx : dx + NX],
                        precision=hp,
                    )
                    acc = t if acc is None else acc + t
        return acc.reshape(x.shape)

    return part_matvec, jnp.asarray(diag)


def make_stencil_affine_matvec_3d(model, nx: int, ny: int, nz: int, *,
                                  use_pallas: bool = True):
    """Full affine application ``affine(coeffs, u) -> K(c) @ u`` plus the
    per-part pieces — 3-D sibling of ``ops.stencil.make_stencil_affine_matvec``.

    ``affine`` is a ``custom_vmap``: unbatched (and any f64 batched) calls
    run the XLA 27-point stencil; the f32 BATCHED call — the CG hot loop
    under vmap — dispatches to the Pallas row kernel
    (``ops.stencil3d_pallas``), which fuses all 486 offset/part/dof terms
    per VMEM-resident (z, y) row instead of XLA's 54 separate HBM passes.

    Returns ``(affine, part_matvec, diag_parts)``.
    """
    from jax.custom_batching import custom_vmap

    if use_pallas and jax.default_backend() != "tpu":
        use_pallas = False  # Mosaic kernels are TPU-only; CPU runs the XLA path

    W = build_stencil_tables_3d(model, nx, ny, nz)
    part_matvec, diag = make_stencil_part_matvec_3d(model, nx, ny, nz, W=W)
    NX, NY, NZ = nx + 1, ny + 1, nz + 1
    w_all = None
    if use_pallas:
        from .stencil3d_pallas import pack_w_interleaved_3d

        w_all = jnp.asarray(pack_w_interleaved_3d(W))

    def _ref(coeffs, u):
        q = None
        for p in range(W.shape[0]):
            qp = part_matvec(p, u)
            cp = coeffs[p].astype(qp.dtype)
            q = cp * qp if q is None else q + cp * qp
        return q

    @custom_vmap
    def affine(coeffs, u):
        return _ref(coeffs, u)

    # nine double-buffered (B, XLP) u-row views: cap the per-call batch to
    # keep the scoped-VMEM stack under the 16 MB limit; chunk bulk batches
    # through lax.map (see ops.stencil for the 2-D measurement)
    PALLAS_MAX_B = 256

    @affine.def_vmap
    def _vmap_rule(axis_size, in_batched, coeffs, u):
        cb, ub = in_batched
        u_b = u if ub else jnp.broadcast_to(u, (axis_size,) + u.shape)
        c_b = coeffs if cb else jnp.broadcast_to(coeffs, (axis_size,) + coeffs.shape)
        if use_pallas and u_b.dtype == jnp.float32 and u_b.ndim == 2:
            from .stencil3d_pallas import stencil_affine_matvec_pallas_3d

            from .stencil import chunked_batch_call

            out = chunked_batch_call(
                lambda c, u: stencil_affine_matvec_pallas_3d(
                    w_all, c, u, NZ=NZ, NY=NY, NX=NX),
                c_b, u_b, PALLAS_MAX_B,
            )
        else:
            out = jax.vmap(_ref)(c_b, u_b)
        return out, True

    return affine, part_matvec, diag
