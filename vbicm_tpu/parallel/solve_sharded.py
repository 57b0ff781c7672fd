"""Element-sharded (domain-decomposed) matrix-free solver.

The scaled configuration (~160x80 mesh, BASELINE.json configs[4]) is this
project's context-parallel equivalent (SURVEY §2.5): the assembled operator
is never materialized; the element axis is sharded across the device mesh
and the CG matvec becomes

    q = psum_over_devices( scatter_e( ke_shard @ gather_e(u) ) )

with u replicated (the 160x80 problem is ~26k dofs = 208 KB — tiny next to
the element blocks), so the only collective per CG iteration is one psum of
a dof vector over ICI. Built with ``shard_map`` so the collective is
explicit, and wrapped in the same adjoint custom VJP as the dense solvers
(backward = one more sharded CG + P sharded matvecs).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..model import FemModel
from ..ops.solve import pcg


def _pad_elements(arr, nd):
    """Pad the leading (element) axis to a multiple of the device count."""
    nele = arr.shape[0]
    pad = (-nele) % nd
    if pad == 0:
        return arr
    pad_block = jnp.zeros((pad,) + arr.shape[1:], dtype=arr.dtype)
    return jnp.concatenate([arr, pad_block], axis=0)


def make_element_sharded_solver(
    model: FemModel,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    tol: float = 1e-12,
    maxiter: int = 4000,
) -> Callable:
    """Differentiable ``solve(coeffs (2,), f (ndof,)) -> u (ndof,)`` with the
    element axis sharded across ``mesh``. Zero-stiffness padding elements
    (lm -> dof 0, ke = 0) make the shard count even."""
    nd = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    ke_parts = _pad_elements(jnp.stack([model.ke_lam, model.ke_mu], axis=1), nd)
    # ke_parts: (nele_p, P, 8, 8) — element axis leading so it shards
    lm = _pad_elements(model.lm, nd)
    free_mask = model.free_mask
    ndof = model.ndof
    edof = int(lm.shape[1])

    # Per-shard sorted-scatter tables (NOT .at[].add — miscompiled when
    # batched on the axon TPU runtime; sorted segment_sum is the safe
    # lowering, see docs/KNOWN_ISSUES.md). Shards are contiguous chunks of
    # the padded element axis, so the permutations are static host data that
    # shard along with the elements.
    lm_np = np.asarray(lm).reshape(nd, -1, edof)
    perms, ids = [], []
    for d in range(nd):
        flat = lm_np[d].reshape(-1)
        pp = np.argsort(flat, kind="stable").astype(np.int32)
        perms.append(pp)
        ids.append(flat[pp].astype(np.int32))
    scat_perm = jnp.asarray(np.concatenate(perms))  # (nd * per_shard*edof,)
    scat_ids = jnp.asarray(np.concatenate(ids))

    part = P(axis_name)
    repl = P()

    def _local_scatter(perm_shard, ids_shard, qe):
        flat = qe.reshape(-1)[perm_shard]
        return jax.ops.segment_sum(
            flat, ids_shard, num_segments=ndof, indices_are_sorted=True
        )

    def _sharded_core(ke_p_shard, lm_shard, perm_shard, ids_shard, coeffs, b):
        """Runs per device on its element shard; returns replicated u."""
        ke = jnp.einsum("p,epij->eij", coeffs.astype(ke_p_shard.dtype), ke_p_shard)

        def mv(x):
            ue = (x * free_mask)[lm_shard]
            qe = jnp.einsum(
                "eij,ej->ei", ke, ue, precision=jax.lax.Precision.HIGHEST
            )
            q = jax.lax.psum(_local_scatter(perm_shard, ids_shard, qe), axis_name)
            return q * free_mask + x * (1.0 - free_mask)

        diag_local = _local_scatter(
            perm_shard, ids_shard, jnp.diagonal(ke, axis1=-2, axis2=-1)
        )
        diag = jax.lax.psum(diag_local, axis_name)
        minv = 1.0 / jnp.where(free_mask > 0, jnp.where(diag == 0, 1.0, diag), 1.0)
        x, _, _ = pcg(mv, b * free_mask, minv, tol=tol, maxiter=maxiter)
        return x * free_mask

    core = jax.shard_map(
        _sharded_core,
        mesh=mesh,
        in_specs=(part, part, part, part, repl, repl),
        out_specs=repl,
    )

    def _matvec_part(p_idx, x):
        """Sharded K_p @ x for the VJP coefficient gradient."""

        def body(ke_p_shard, lm_shard, perm_shard, ids_shard, xx):
            ue = xx[lm_shard]
            qe = jnp.einsum(
                "eij,ej->ei", ke_p_shard[:, p_idx], ue,
                precision=jax.lax.Precision.HIGHEST,
            )
            return jax.lax.psum(_local_scatter(perm_shard, ids_shard, qe), axis_name)

        return jax.shard_map(
            body, mesh=mesh, in_specs=(part, part, part, part, repl), out_specs=repl
        )(ke_parts, lm, scat_perm, scat_ids, x)

    @jax.custom_vjp
    def solve(coeffs, f):
        return core(ke_parts, lm, scat_perm, scat_ids, coeffs, f)

    def _fwd(coeffs, f):
        u = core(ke_parts, lm, scat_perm, scat_ids, coeffs, f)
        return u, (coeffs, u)

    def _bwd(res, ubar):
        coeffs, u = res
        w = core(ke_parts, lm, scat_perm, scat_ids, coeffs, ubar)
        cbar = jnp.stack(
            [-jnp.vdot(w, _matvec_part(p, u) * free_mask) for p in range(2)]
        )
        return cbar.astype(coeffs.dtype), w

    solve.defvjp(_fwd, _bwd)
    return solve
