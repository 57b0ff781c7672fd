"""Global assembly: scatter element blocks into global operators.

The reference loops over elements in Python and scatters into a
scipy CSR / dense TF matrix per solve (``src/fem_solver.py:196-258``,
``src/fem_solver_tf.py:271-341``). Here assembly is a single batched
scatter-add over the whole element block tensor — and for the homogeneous
linear-elastic problem it happens ONCE at model build (on the affine parts
``ke_lam`` / ``ke_mu``), never inside the training step.

Two operator representations:
  * dense (ndof x ndof) — right for the Cook's 20x10 mesh (462 dofs) where
    a batched Cholesky is the fastest possible solve;
  * matrix-free — ``element_matvec`` applies K via gather → 8x8 block matmul
    → scatter, the building block of the CG path for refined meshes and the
    element-sharded multi-chip path (SURVEY §2.5's domain-decomposition
    equivalent).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def assemble_dense(ke, lm, ndof):
    """Scatter per-element blocks into a dense global matrix.

    ke: (nele, edof, edof); lm: (nele, edof) int dof map.
    """
    K = jnp.zeros((ndof, ndof), dtype=ke.dtype)
    return K.at[lm[:, :, None], lm[:, None, :]].add(ke)


def assemble_vector(fe, lm, ndof):
    """Scatter per-element vectors (nele, edof) into a global (ndof,) vector."""
    f = jnp.zeros((ndof,), dtype=fe.dtype)
    return f.at[lm.reshape(-1)].add(fe.reshape(-1))


def gather_element_dofs(u, lm):
    """u: (ndof,) -> (nele, edof) element dof values."""
    return u[lm]


def element_matvec(ke, lm, u, ndof):
    """Matrix-free K @ u using per-element blocks.

    ke: (nele, edof, edof); lm: (nele, edof); u: (ndof,).
    """
    ue = u[lm]  # (nele, edof)
    # HIGHEST: TPU f32 matmuls default to bf16 passes, which is fatal inside
    # CG recurrences — force full-precision accumulation.
    qe = jnp.einsum("eij,ej->ei", ke, ue, precision=jax.lax.Precision.HIGHEST)
    return assemble_vector(qe, lm, ndof)


def make_free_mask(free_dof, ndof, dtype=jnp.float64):
    """0/1 mask over dofs, 1 on free dofs — for masked (matrix-free) solves."""
    m = jnp.zeros((ndof,), dtype=dtype)
    return m.at[free_dof].set(1.0)


def jacobi_diagonal(ke, lm, ndof):
    """Diagonal of the assembled K from element blocks (for preconditioning)."""
    diag_e = jnp.diagonal(ke, axis1=-2, axis2=-1)  # (nele, edof)
    return assemble_vector(diag_e, lm, ndof)


def make_sorted_scatter(lm, ndof: int):
    """Precompute a sorted segment-sum scatter for the element->global map.

    Alternative lowering to ``.at[].add``: element contributions are
    permuted into dof-sorted order once (host-side static permutation) and
    reduced with ``jax.ops.segment_sum(..., indices_are_sorted=True)``,
    which XLA lowers to a contiguous segmented reduction instead of a
    scatter-add. Returns ``scatter(qe (nele, edof)) -> (ndof,)``.
    """
    import numpy as np

    lm_flat = np.asarray(lm).reshape(-1)
    perm = np.argsort(lm_flat, kind="stable").astype(np.int32)
    sorted_ids = lm_flat[perm].astype(np.int32)
    perm_j = jnp.asarray(perm)
    ids_j = jnp.asarray(sorted_ids)

    def scatter(qe):
        flat = qe.reshape(-1)[perm_j]
        return jax.ops.segment_sum(
            flat, ids_j, num_segments=ndof, indices_are_sorted=True
        )

    return scatter
