"""Structured-grid block-stencil matvec for the affine FEM operator.

On a structured quad4 grid (the Cook's family, ``mesh/cooks.py``: node id =
row*(nx+1)+col) the assembled stiffness couples each node only to its 8 grid
neighbours, so ``K_p @ u`` is a 9-point stencil of 2x2 dof blocks:

    q[y, x, a] = sum_{dy,dx in {-1,0,1}} W_p[y, x, dy, dx, a, b] * u[y+dy, x+dx, b]

This removes the gather/scatter entirely from the CG hot loop — the
element-based matvec (``ops.solve._affine_matvec``) moves ~3x the operator's
intrinsic traffic through HBM in (B, nele, 8) gathered/scattered
intermediates. Measured at 160x80, B=256 (v5e): element path 3.8 ms/matvec,
this stencil under XLA 5.6 ms (the 9 shifted contractions stay separate HBM
passes), the Pallas row kernel (``ops.stencil_pallas``) 1.65 ms. The solve
is only matvec-bound once the preconditioner transfer operators are also in
structured-grid form (see ``ops.multigrid``).

Exactly equal (to rounding) to the assembled matvec: the tables are built by
scattering the same ``ke`` blocks by grid offset instead of by dof id.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_stencil_tables(model, nx: int, ny: int):
    """Per-offset block-coefficient tables W (P, NY, NX, 3, 3, 2, 2) from
    the model's affine element stiffness parts, for the structured quad4
    numbering of ``mesh/cooks.py`` (element e = r*nx + c, conn
    (n0, n0+1, n0+nx+2, n0+nx+1))."""
    if model.has_constraints:
        raise NotImplementedError("stencil matvec assumes the unconstrained grid layout")
    NY, NX = ny + 1, nx + 1
    nele = nx * ny
    if model.nele != nele or model.ndof != NY * NX * 2:
        raise ValueError("model does not match the (nx, ny) structured grid")
    ke = np.stack([np.asarray(model.ke_lam), np.asarray(model.ke_mu)])  # (2, nele, 8, 8)
    P = ke.shape[0]
    rr, cc = np.divmod(np.arange(nele), nx)
    # local node (row, col) offsets for conn order (n0, n0+1, n0+nx+2, n0+nx+1)
    lpos = np.array([[0, 0], [0, 1], [1, 1], [1, 0]])
    W = np.zeros((P, NY, NX, 3, 3, 2, 2))
    for li in range(4):
        iy = rr + lpos[li, 0]
        ix = cc + lpos[li, 1]
        for lj in range(4):
            dy = lpos[lj, 0] - lpos[li, 0] + 1
            dx = lpos[lj, 1] - lpos[li, 1] + 1
            for p in range(P):
                for a in range(2):
                    for b in range(2):
                        np.add.at(
                            W[p, :, :, dy, dx, a, b],
                            (iy, ix),
                            ke[p, :, 2 * li + a, 2 * lj + b],
                        )
    return W


def make_stencil_part_matvec(model, nx: int, ny: int, W=None):
    """Build ``(part_matvec(p, x), diag_parts)`` for ``ops.solve.
    make_matfree_affine_solver``: ``part_matvec`` applies the assembled
    ``K_p`` as a 9-point block stencil (dtype-dispatching: f32 tables for
    the CG iteration, f64 for refinement residuals and the adjoint
    coefficient cotangents); ``diag_parts`` is (P, ndof) in f64."""
    if W is None:
        W = build_stencil_tables(model, nx, ny)
    NY, NX = ny + 1, nx + 1
    tables = {
        jnp.dtype(jnp.float64): jnp.asarray(W),
        jnp.dtype(jnp.float32): jnp.asarray(W, jnp.float32),
    }
    # diag of K_p: the (dy, dx) = (0, 0) offset's diagonal dof blocks
    diag = np.stack(
        [np.stack([W[p, :, :, 1, 1, a, a] for a in range(2)], axis=-1).reshape(-1)
         for p in range(W.shape[0])]
    )
    hp = jax.lax.Precision.HIGHEST

    def part_matvec(p, x):
        Wp = tables[jnp.dtype(x.dtype)][p]
        ug = x.reshape(NY, NX, 2)
        up = jnp.pad(ug, ((1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                t = jnp.einsum(
                    "yxab,yxb->yxa",
                    Wp[:, :, dy, dx],
                    up[dy : dy + NY, dx : dx + NX],
                    precision=hp,
                )
                acc = t if acc is None else acc + t
        return acc.reshape(x.shape)

    return part_matvec, jnp.asarray(diag)


def chunked_batch_call(call, c_b, u_b, max_b: int):
    """Dispatch a batched kernel call in VMEM-safe chunks: full ``max_b``
    blocks through ``lax.map`` plus ONE direct call for the remainder, so a
    non-multiple batch never falls back to the slow path for all lanes.
    ``call(c, u)`` must accept any batch size <= max_b. Shared by the 2-D
    and 3-D stencil ``custom_vmap`` rules; unit-tested on CPU with a fake
    kernel (`test_stencil.py`)."""
    B = u_b.shape[0]
    if B <= max_b:
        return call(c_b, u_b)
    k = B // max_b
    cut = k * max_b
    out = jax.lax.map(
        lambda cu: call(cu[0], cu[1]),
        (c_b[:cut].reshape(k, max_b, -1), u_b[:cut].reshape(k, max_b, -1)),
    ).reshape(cut, -1)
    if cut < B:
        out = jnp.concatenate([out, call(c_b[cut:], u_b[cut:])])
    return out


def make_stencil_affine_matvec(model, nx: int, ny: int, *, use_pallas: bool = True):
    """Full affine application ``affine(coeffs, u) -> K(c) @ u`` plus the
    per-part pieces for the solver's refinement/adjoint paths.

    ``affine`` is a ``custom_vmap``: the unbatched call (and any f64 batched
    call) runs the XLA stencil; the f32 BATCHED call — the CG hot loop under
    ``vmap`` — dispatches to the Pallas row-stencil kernel
    (``ops.stencil_pallas``), which fuses all 72 offset/part/dof terms per
    VMEM-resident row instead of XLA's 18 separate HBM passes.

    Returns ``(affine, part_matvec, diag_parts)``.
    """
    from jax.custom_batching import custom_vmap

    if use_pallas and jax.default_backend() != "tpu":
        use_pallas = False  # Mosaic kernels are TPU-only; CPU runs the XLA path

    W = build_stencil_tables(model, nx, ny)
    part_matvec, diag = make_stencil_part_matvec(model, nx, ny, W=W)
    NY, NX = ny + 1, nx + 1
    w_all = None
    if use_pallas:
        from .stencil_pallas import pack_w_interleaved

        w_all = jnp.asarray(pack_w_interleaved(W))

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

    # Kernel VMEM blocks scale with the batch: each of the three u-row views
    # is a (B, XLP) f32 block, double-buffered by the pipeline. Cap the
    # per-call batch so the scoped-VMEM stack stays well under the 16 MB
    # limit (measured OOM at B=2048 on 160x80: 24 MB requested; B=512 on
    # 160x80 now sits 64 KB OVER the limit with the current libtpu — scoped
    # 16.06 MB vs 16.00), and chunk larger batches through lax.map — the CG
    # hot loop runs at B<=256, so this only triggers for bulk sweeps like
    # dataset generation.
    PALLAS_MAX_B = 256

    @affine.def_vmap
    def _vmap_rule(axis_size, in_batched, coeffs, u):
        cb, ub = in_batched
        u_b = u if ub else jnp.broadcast_to(u, (axis_size,) + u.shape)
        c_b = coeffs if cb else jnp.broadcast_to(coeffs, (axis_size,) + coeffs.shape)
        if use_pallas and u_b.dtype == jnp.float32 and u_b.ndim == 2:
            from .stencil_pallas import stencil_affine_matvec_pallas

            out = chunked_batch_call(
                lambda c, u: stencil_affine_matvec_pallas(
                    w_all, c, u, NY=NY, NX=NX),
                c_b, u_b, PALLAS_MAX_B,
            )
        else:
            out = jax.vmap(_ref)(c_b, u_b)
        return out, True

    return affine, part_matvec, diag
