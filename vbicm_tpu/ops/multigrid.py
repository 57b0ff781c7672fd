"""Two-level (coarse-grid + Jacobi) preconditioning for refined Cook's meshes.

The full-order CG path on the scaled configuration is conditioning-bound:
Jacobi-PCG needs ~2000 iterations at 160x80 and float32 recurrences stall
near 3e-2 relative error. The structured mesh family admits the classic
geometric two-level cure, with a TPU twist: the coarse operator is the
SMALL Cook's model, whose spectral pencil diagonalization gives an EXACT
coarse solve for ANY (lam, mu) with zero per-sample setup:

    M^-1 r = P K_c(lam, mu)^-1 P^T r + omega * D^-1 r

where P is the bilinear index-space prolongation (exact here because the
Cook's geometry is bilinear in the (xi, eta) index map, so coarse-cell FE
interpolation == index-space interpolation), and D the fine Jacobi diagonal.
Everything is gathers/scatters + one tiny dense apply — ICI-shardable along
with the element matvec.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def cooks_prolongation(nx_c: int, ny_c: int, ratio: int):
    """Bilinear prolongation for Cook's meshes: coarse (nx_c x ny_c) ->
    fine (nx_c*ratio x ny_c*ratio). Returns (idx (nfine_nodes, 4) int32,
    w (nfine_nodes, 4) float64) with fine nodal value = sum_k w*coarse[idx].
    """
    nx_f, ny_f = nx_c * ratio, ny_c * ratio
    ncx, ncy = nx_c + 1, ny_c + 1
    idx = np.zeros(((nx_f + 1) * (ny_f + 1), 4), dtype=np.int32)
    w = np.zeros(((nx_f + 1) * (ny_f + 1), 4))
    for j in range(ny_f + 1):
        for i in range(nx_f + 1):
            n = j * (nx_f + 1) + i
            ic, fi = divmod(i, ratio)
            jc, fj = divmod(j, ratio)
            if ic == nx_c:  # right edge
                ic, fi = nx_c - 1, ratio
            if jc == ny_c:
                jc, fj = ny_c - 1, ratio
            s = fi / ratio
            t = fj / ratio
            base = jc * ncx + ic
            idx[n] = (base, base + 1, base + ncx, base + ncx + 1)
            w[n] = ((1 - s) * (1 - t), s * (1 - t), (1 - s) * t, s * t)
    return idx, w


def make_two_level_preconditioner(
    prolong_idx,
    prolong_w,
    coarse_apply: Callable,
    fine_free_mask,
    *,
    omega: float = 0.5,
):
    """Builds ``prec(coeffs, diag_inv, r) -> z``.

    prolong_idx/w: nodal prolongation; expanded to the interleaved dof
    layout internally. ``coarse_apply(coeffs, r_c) -> K_c^-1 r_c`` is the
    coarse solve on the COARSE full-dof vector (fixed dofs zeroed) — use the
    spectral apply of the coarse model. diag_inv is the fine Jacobi inverse
    diagonal for the current coefficients.
    """
    idx = jnp.asarray(prolong_idx, jnp.int32)
    w = jnp.asarray(prolong_w)
    n_fine = idx.shape[0]
    fine_free_mask = jnp.asarray(fine_free_mask)

    def _prolong(u_c):
        """coarse dofs (2*nc,) -> fine dofs (2*nf,); pure gather/reshape
        (no scatter — see the vmap note above)."""
        ux = jnp.sum(w * u_c[2 * idx], axis=1)
        uy = jnp.sum(w * u_c[2 * idx + 1], axis=1)
        return jnp.stack([ux, uy], axis=-1).reshape(-1)

    n_coarse = int(np.asarray(prolong_idx).max()) + 1
    # Sorted segment-sum restriction (NOT .at[].add — the batched scatter-add
    # is miscompiled under vmap on the axon TPU runtime, docs/KNOWN_ISSUES.md).
    # Build the combined x/y dof scatter as one static sorted permutation.
    _idx_np = np.asarray(prolong_idx)
    _dof_ids = np.concatenate(
        [(2 * _idx_np).reshape(-1), (2 * _idx_np + 1).reshape(-1)]
    )
    _perm = np.argsort(_dof_ids, kind="stable").astype(np.int32)
    _sorted_ids = jnp.asarray(_dof_ids[_perm])
    _perm_j = jnp.asarray(_perm)

    def _restrict(r_f):
        """P^T: fine dofs -> coarse dofs (segment-sum lowering).

        De-interleaving uses reshape, not strided slicing: batched strided
        slices (``r[0::2]`` under vmap) are miscompiled on the axon TPU
        runtime (lane contamination for B >= 2; docs/KNOWN_ISSUES.md).
        """
        r2 = r_f.reshape(-1, 2)
        rx = r2[:, 0]
        ry = r2[:, 1]
        vals = jnp.concatenate(
            [(w * rx[:, None]).reshape(-1), (w * ry[:, None]).reshape(-1)]
        ).astype(r_f.dtype)
        return jax.ops.segment_sum(
            vals[_perm_j], _sorted_ids, num_segments=2 * n_coarse,
            indices_are_sorted=True,
        )

    def prec(coeffs, diag_inv, r):
        r = r * fine_free_mask.astype(r.dtype)
        z_smooth = omega * diag_inv * r
        r_c = _restrict(r)
        z_c = coarse_apply(coeffs, r_c)
        z_coarse = _prolong(z_c) * fine_free_mask.astype(r.dtype)
        return z_smooth + z_coarse.astype(r.dtype)

    return prec, _prolong, _restrict
