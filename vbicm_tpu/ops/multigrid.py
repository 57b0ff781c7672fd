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


def make_grid_transfer(nx_c: int, ny_c: int, ratio: int):
    """Gather-free structured-grid transfer operators.

    Same math as ``cooks_prolongation`` + the segment-sum restriction (the
    bilinear index-space P and its exact transpose), but expressed purely as
    reshape/slice/concat arithmetic on the (NY, NX, 2) grid view of the flat
    dof vector — no index arrays at all. Round-2 measurements showed the
    gather-based transfers are what bound the batched two-level CG
    (restrict 4.6 ms + prolong 3.2 ms per iteration at 160x80, B=256,
    vs 3.8 ms for the element matvec); TPU has no fast gather path, while
    this form is pure VPU traffic that XLA fuses.

    Returns ``(prolong, restrict)`` on flat dof vectors (f32 or f64; the
    restriction is ``jax.linear_transpose`` of the prolongation, so the pair
    is exactly adjoint in either dtype).
    """
    NXc, NYc = nx_c + 1, ny_c + 1
    r = ratio
    t = np.arange(r, dtype=np.float64) / r
    s = np.arange(r, dtype=np.float64) / r
    # (r, r) bilinear weights for the four cell corners, body nodes
    w00 = np.einsum("i,j->ij", 1 - t, 1 - s)
    w01 = np.einsum("i,j->ij", 1 - t, s)
    w10 = np.einsum("i,j->ij", t, 1 - s)
    w11 = np.einsum("i,j->ij", t, s)

    def _make(dtype):
        W = [jnp.asarray(w[None, :, None, :, None], dtype) for w in (w00, w01, w10, w11)]
        t1 = jnp.asarray((1 - t)[None, :, None], dtype)
        t2 = jnp.asarray(t[None, :, None], dtype)
        s1 = jnp.asarray((1 - s)[None, :, None], dtype)
        s2 = jnp.asarray(s[None, :, None], dtype)

        def prolong(u_c):
            c = u_c.reshape(NYc, NXc, 2)
            c00 = c[:-1, :-1][:, None, :, None]
            c01 = c[:-1, 1:][:, None, :, None]
            c10 = c[1:, :-1][:, None, :, None]
            c11 = c[1:, 1:][:, None, :, None]
            body = (W[0] * c00 + W[1] * c01 + W[2] * c10 + W[3] * c11).reshape(
                ny_c * r, nx_c * r, 2
            )
            colR = c[:, -1]
            right = (t1 * colR[:-1, None] + t2 * colR[1:, None]).reshape(ny_c * r, 1, 2)
            rowB = c[-1]
            bottom = (s1 * rowB[:-1, None] + s2 * rowB[1:, None]).reshape(nx_c * r, 2)
            last = jnp.concatenate([bottom, c[-1:, -1]], axis=0)[None]
            fine = jnp.concatenate(
                [jnp.concatenate([body, right], axis=1), last], axis=0
            )
            return fine.reshape(-1)

        tr = jax.linear_transpose(prolong, jnp.zeros(2 * NYc * NXc, dtype))
        return prolong, tr

    ops = {jnp.dtype(d): _make(d) for d in (jnp.float32, jnp.float64)}

    def prolong(u_c):
        return ops[jnp.dtype(u_c.dtype)][0](u_c)

    def restrict(r_f):
        return ops[jnp.dtype(r_f.dtype)][1](r_f)[0]

    return prolong, restrict


def make_grid_transfer_conv(nx_c: int, ny_c: int, ratio: int,
                            *, precision=jax.lax.Precision.HIGHEST):
    """Grid transfers as XLA convolutions — the fastest batched form on TPU.

    Same math as ``make_grid_transfer`` (bilinear index-space prolongation
    and its exact transpose): the prolongation is a separable hat-kernel
    interpolation, expressed as ``conv_general_dilated`` with
    ``lhs_dilation=ratio`` (insert ratio-1 zeros between coarse nodes, then
    convolve with the length 2*ratio-1 hat); the restriction is the SAME
    kernel applied as a stride-``ratio`` convolution — with a symmetric
    kernel these two are exactly each other's transpose, including the
    boundary truncation (the hat of an edge coarse node clipped by the
    zero padding is precisely the edge column of the bilinear table in
    ``cooks_prolongation``).

    Why this form: the reshape/concat transfers of ``make_grid_transfer``
    cost ~0.7 ms/CG-iteration at 160x80 B=256 (in-loop, measured round 3) —
    layout-copy-bound, ~9x their HBM traffic — while conv ops hit XLA's
    tuned TPU conv emitters. Separable: two 1-D passes per transfer.

    Returns ``(prolong, restrict)`` on flat dof vectors; vmap-compatible
    (the conv batching rule folds the vmap axis into the conv batch).
    """
    r = ratio
    NXc, NYc = nx_c + 1, ny_c + 1
    nx_f, ny_f = nx_c * r, ny_c * r
    NXf, NYf = nx_f + 1, ny_f + 1
    hat = 1.0 - np.abs(np.arange(-(r - 1), r)) / r  # (2r-1,) hat weights
    dn = jax.lax.conv_dimension_numbers(
        (1, 2, 2, 2), (2, 2, 1, 2), ("NHWC", "HWIO", "NHWC")
    )
    K = 2 * r - 1

    def _make(dtype):
        # depthwise (group=2) separable kernels, HWIO with I/groups = 1:
        # dof channel stays innermost — zero transposes/relayouts.
        kh = jnp.asarray(np.broadcast_to(hat.reshape(K, 1, 1, 1), (K, 1, 1, 2)), dtype)
        kw = jnp.asarray(np.broadcast_to(hat.reshape(1, K, 1, 1), (1, K, 1, 2)), dtype)

        def _conv(x, k, strides, lhs_dil, pad):
            return jax.lax.conv_general_dilated(
                x, k, window_strides=strides, padding=pad,
                lhs_dilation=lhs_dil, dimension_numbers=dn,
                feature_group_count=2, precision=precision)

        def prolong(u_c):
            x = u_c.reshape(1, NYc, NXc, 2)  # dof = channel (innermost)
            x = _conv(x, kh, (1, 1), (r, 1), [(r - 1, r - 1), (0, 0)])
            x = _conv(x, kw, (1, 1), (1, r), [(0, 0), (r - 1, r - 1)])
            return x.reshape(-1)

        def restrict(r_fv):
            x = r_fv.reshape(1, NYf, NXf, 2)
            x = _conv(x, kh, (r, 1), (1, 1), [(r - 1, r - 1), (0, 0)])
            x = _conv(x, kw, (1, r), (1, 1), [(0, 0), (r - 1, r - 1)])
            return x.reshape(-1)

        return prolong, restrict

    ops = {jnp.dtype(d): _make(d) for d in (jnp.float32, jnp.float64)}

    def prolong(u_c):
        return ops[jnp.dtype(u_c.dtype)][0](u_c)

    def restrict(r_f):
        return ops[jnp.dtype(r_f.dtype)][1](r_f)

    return prolong, restrict


def _hat_matrix(n_fine: int, n_coarse: int, r: int) -> np.ndarray:
    """1-D bilinear interpolation matrix P (n_fine, n_coarse):
    P[f, c] = max(0, 1 - |f - r*c| / r) — the hat kernel of
    ``make_grid_transfer_conv`` in dense form, edge truncation included."""
    f = np.arange(n_fine)[:, None]
    c = np.arange(n_coarse)[None, :]
    return np.maximum(0.0, 1.0 - np.abs(f - r * c) / r)


def make_grid_transfer_matmul(nx_c: int, ny_c: int, ratio: int,
                              *, precision=jax.lax.Precision.HIGHEST):
    """Grid transfers as tensor-product MXU matmuls — the fastest batched
    form measured on TPU (round 3).

    The bilinear prolongation is separable, P = P_y (x) P_x, so the whole
    transfer is two small constant-operand matmuls on the (NY, NX*2) grid
    view:  fine = P_y @ U_c @ (P_x (x) I_2)^T,  restrict = its exact
    transpose. Identical math to ``make_grid_transfer_conv`` (same hat
    kernel, same edge truncation — parity 1e-7 f32 / 1e-15 f64, tested),
    but where the TPU conv emitters cost 1.7 + 2.2 ms per restrict/prolong
    pair at 160x80 B=256, the batched matmuls hit the MXU at ~0.1 ms
    (measured round 3) — the transfers drop out of the two-level CG
    iteration cost entirely.

    ``precision`` applies to the matmuls; HIGHEST (6-pass bf16, ~f32-exact)
    by default. Inside the two-level PRECONDITIONER ``DEFAULT`` (one bf16
    pass) is admissible for the same reason as the coarse spectral apply —
    the preconditioner only shapes the Krylov space.

    Returns ``(prolong, restrict)`` on flat interleaved dof vectors;
    vmap-compatible (constant-operand batched matmuls).
    """
    r = ratio
    NXc, NYc = nx_c + 1, ny_c + 1
    NXf, NYf = nx_c * r + 1, ny_c * r + 1
    Py = _hat_matrix(NYf, NYc, r)
    Px2 = np.kron(_hat_matrix(NXf, NXc, r), np.eye(2))  # interleaved dofs
    tabs = {
        jnp.dtype(d): (jnp.asarray(Py, d), jnp.asarray(Px2, d))
        for d in (jnp.float32, jnp.float64)
    }

    def prolong(u_c):
        Pyj, Px2j = tabs[jnp.dtype(u_c.dtype)]
        t = jnp.matmul(u_c.reshape(NYc, NXc * 2), Px2j.T, precision=precision)
        return jnp.matmul(Pyj, t, precision=precision).reshape(-1)

    def restrict(r_f):
        Pyj, Px2j = tabs[jnp.dtype(r_f.dtype)]
        t = jnp.matmul(Pyj.T, r_f.reshape(NYf, NXf * 2), precision=precision)
        return jnp.matmul(t, Px2j, precision=precision).reshape(-1)

    return prolong, restrict


def make_grid_transfer_matmul_nd(cells_coarse, ratio: int, ndof_node: int,
                                 *, precision=jax.lax.Precision.HIGHEST):
    """N-D sibling of :func:`make_grid_transfer_matmul`: the multilinear
    tensor-product transfer applied as one constant-operand matmul per axis
    (dof channel folded into the fastest axis). Same math as
    ``make_grid_transfer_nd`` (tested to f32/f64 rounding); MXU instead of
    the reshape/concat lowering. ``cells_coarse`` slowest-first, as there."""
    r = ratio
    ndim = len(cells_coarse)
    fine_dims = tuple(c * r + 1 for c in cells_coarse)
    coarse_dims = tuple(c + 1 for c in cells_coarse)
    mats = [_hat_matrix(f, c, r) for f, c in zip(fine_dims, coarse_dims)]
    # fold the dof channel into the last axis's map
    mats[-1] = np.kron(mats[-1], np.eye(ndof_node))
    tabs = {
        jnp.dtype(d): [jnp.asarray(m, d) for m in mats]
        for d in (jnp.float32, jnp.float64)
    }
    coarse_last = coarse_dims[-1] * ndof_node
    fine_last = fine_dims[-1] * ndof_node

    def prolong(u_c):
        ms = tabs[jnp.dtype(u_c.dtype)]
        a = u_c.reshape(coarse_dims[:-1] + (coarse_last,))
        for ax in range(ndim):
            # contract the coarse axis with P[ax] (fine, coarse): move it
            # last, tensordot, move back — XLA folds into dot_general
            a = jnp.moveaxis(
                jnp.tensordot(jnp.moveaxis(a, ax, -1), ms[ax],
                              axes=[[-1], [1]], precision=precision),
                -1, ax)
        return a.reshape(-1)

    def restrict(r_f):
        ms = tabs[jnp.dtype(r_f.dtype)]
        a = r_f.reshape(fine_dims[:-1] + (fine_last,))
        for ax in range(ndim):
            a = jnp.moveaxis(
                jnp.tensordot(jnp.moveaxis(a, ax, -1), ms[ax],
                              axes=[[-1], [0]], precision=precision),
                -1, ax)
        return a.reshape(-1)

    return prolong, restrict


def make_grid_transfer_nd(cells_coarse, ratio: int, ndof_node: int):
    """N-dimensional structured-grid transfer operators, gather-free.

    ``cells_coarse``: coarse cell counts per axis, SLOWEST-varying first
    (e.g. ``(nz, ny, nx)`` for the hex8 box numbering of
    ``mesh/solid3d.py``: node = (k*(ny+1)+j)*(nx+1)+i). The prolongation
    is the tensor product of per-axis 1-D linear interpolations — exactly
    the FE multilinear embedding on axis-aligned box meshes (each cell's
    geometry map is affine, so index-space interpolation == FE
    interpolation; same argument as the 2-D Cook's case). Restriction is
    the exact ``jax.linear_transpose``. Returns ``(prolong, restrict)`` on
    flat dof vectors of the node-major interleaved layout.
    """
    r = ratio
    s = np.arange(r, dtype=np.float64) / r
    ndim = len(cells_coarse)
    fine_shape = tuple(c * r + 1 for c in cells_coarse) + (ndof_node,)
    coarse_shape = tuple(c + 1 for c in cells_coarse) + (ndof_node,)

    def _make(dtype):
        s1 = jnp.asarray(1 - s, dtype)
        s2 = jnp.asarray(s, dtype)

        def interp_axis0(a):
            """1-D refine along axis 0: (C+1, ...) -> (C*r + 1, ...)."""
            lo = a[:-1][:, None]  # (C, 1, ...)
            hi = a[1:][:, None]
            w1 = s1.reshape((1, r) + (1,) * (a.ndim - 1))
            w2 = s2.reshape((1, r) + (1,) * (a.ndim - 1))
            body = (w1 * lo + w2 * hi).reshape(
                (a.shape[0] - 1) * r, *a.shape[1:]
            )
            return jnp.concatenate([body, a[-1:]], axis=0)

        def prolong(u_c):
            a = u_c.reshape(coarse_shape)
            for ax in range(ndim):
                a = jnp.moveaxis(interp_axis0(jnp.moveaxis(a, ax, 0)), 0, ax)
            return a.reshape(-1)

        tr = jax.linear_transpose(
            prolong, jnp.zeros(int(np.prod(coarse_shape)), dtype)
        )
        return prolong, tr

    ops = {jnp.dtype(d): _make(d) for d in (jnp.float32, jnp.float64)}

    def prolong(u_c):
        return ops[jnp.dtype(u_c.dtype)][0](u_c)

    def restrict(r_f):
        return ops[jnp.dtype(r_f.dtype)][1](r_f)[0]

    return prolong, restrict


def make_three_level_preconditioner(
    gt_fine_mid,
    gt_mid_coarse,
    mid_diag_parts,
    mid_free_mask,
    coarse_apply: Callable,
    fine_free_mask,
    *,
    omega: float = 0.6,
    omega_mid: float = 0.6,
):
    """Additive three-level telescope ``prec(coeffs, diag_inv, r) -> z``:

        z = omega D_f^-1 r
          + P1 [ omega_mid D_m^-1 r_m + P2 K_c^-1 P2^T r_m ] ,  r_m = P1^T r

    Each term is SPD, so the sum is a valid PCG preconditioner. The point
    (round-2 deferred item): the exact spectral solve moves DOWN one more
    level, so its one-time eigh setup is on a mesh 16x smaller — a 320x160
    fine grid runs with a 20x10 spectral pencil (seconds) instead of the
    80x40 one (~200 s). The mid level only needs its affine Jacobi
    diagonal, assembled once per part.

    ``gt_*``: (prolong, restrict) pairs from ``make_grid_transfer``;
    ``mid_diag_parts``: (P, ndof_mid) per-part assembled diagonals of the
    MID model; ``coarse_apply(coeffs, r_c) -> K_c^-1 r_c`` as usual.
    """
    p1, r1 = gt_fine_mid
    p2, r2 = gt_mid_coarse
    mid_diag_parts = jnp.asarray(mid_diag_parts)
    mid_free_mask = jnp.asarray(mid_free_mask)
    fine_free_mask = jnp.asarray(fine_free_mask)

    def prec(coeffs, diag_inv, r):
        mask_f = fine_free_mask.astype(r.dtype)
        mask_m = mid_free_mask.astype(r.dtype)
        r = r * mask_f
        z = omega * diag_inv * r
        r_m = r1(r) * mask_m
        # mid Jacobi diagonal for these coefficients (scalar-broadcast
        # combine — see the bf16 note in ops.solve)
        d_m = None
        parts_m = mid_diag_parts.astype(r.dtype)
        for p in range(parts_m.shape[0]):
            t = coeffs[p].astype(r.dtype) * parts_m[p]
            d_m = t if d_m is None else d_m + t
        d_m = jnp.where(mask_m > 0, jnp.where(d_m == 0, 1.0, d_m), 1.0)
        z_m = (omega_mid / d_m) * r_m
        r_c = r2(r_m)
        z_c = coarse_apply(coeffs, r_c)
        z_m = z_m + p2(z_c).astype(r.dtype) * mask_m
        return z + p1(z_m).astype(r.dtype) * mask_f

    return prec


def make_two_level_vcycle_preconditioner(
    matvec: Callable,
    grid_transfer,
    coarse_apply: Callable,
    fine_free_mask,
    *,
    omega: float = 0.45,
    presmooth: int = 1,
    postsmooth: int = 1,
):
    """Symmetric multiplicative two-level V-cycle ``prec(coeffs, diag_inv, r)``.

    The additive form (``make_two_level_preconditioner``) just SUMS the
    Jacobi and coarse corrections — cheap (no extra matvecs) but its
    PCG iteration count is bounded by the worst of the two half-spaces.
    The multiplicative cycle composes them:

        x  = omega D^-1 r                      (pre-smooth, x0 = 0)
        x += P K_c^-1 P^T (r - K x)            (exact coarse correction)
        x += omega D^-1 (r - K x)              (post-smooth)

    costing ``presmooth + postsmooth`` extra fine matvecs per application.
    Equal pre/post damped-Jacobi sweeps around a symmetric coarse solve
    keep the operator SPD for PCG (x0 = 0) — PROVIDED the smoother is a
    contraction: omega < 2 / lambda_max(D^-1 K), and for plane-strain
    quad4 elasticity lambda_max approaches 4, so omega must stay BELOW
    ~0.5 (measured at 160x80: omega=0.5 converges in 15 PCG iterations,
    omega>=0.6 stalls at maxiter). The default 0.45 is safe across the
    theta prior range.

    Measured verdict at 160x80 B=256 (f32 CG, tol 3e-3, exact spectral
    coarse solve): 30 -> 15 PCG iterations vs the additive form — but
    each iteration carries 2 extra fine matvecs, so wall-clock is a WASH
    on a single chip where the matvec dominates. Kept as an option
    because the trade flips when the non-matvec per-iteration cost is
    the bottleneck: element-sharded solves (transfers + coarse solve +
    CG dot products each cost a collective — halving the iteration count
    halves the collective count), or configurations with a relatively
    more expensive coarse level.

    ``matvec(coeffs, x)``: the masked fine operator in the CG dtype (the
    stencil path's f32 apply). No reference counterpart (the reference
    solves dense f64 on CPU, ``src/fem_solver.py``).
    """
    prolong, restrict = grid_transfer
    fine_free_mask = jnp.asarray(fine_free_mask)

    def prec(coeffs, diag_inv, r):
        mask = fine_free_mask.astype(r.dtype)
        r = r * mask
        x = omega * diag_inv * r
        for _ in range(presmooth - 1):
            x = x + omega * diag_inv * (r - matvec(coeffs, x))
        rr = r - matvec(coeffs, x)
        z_c = coarse_apply(coeffs, restrict(rr))
        x = x + (prolong(z_c) * mask).astype(r.dtype)
        for _ in range(postsmooth):
            x = x + omega * diag_inv * (r - matvec(coeffs, x))
        return x

    return prec


def make_dense_coarse_correction(coarse_model, nx_c: int, ny_c: int,
                                 ratio: int, fine_free_mask,
                                 *, dtype=jnp.float32,
                                 precision=jax.lax.Precision.DEFAULT):
    """The ENTIRE coarse correction of the two-level preconditioner —
    restrict, spectral coarse solve, prolong — folded into two dense MXU
    matmuls:

        z_c = A^T @ ( (A @ r) / d(c) ),   A = V^T R_free,  d = c0*g + c1

    where (g, V) is the coarse pencil diagonalization (K_lam v = g K_mu v,
    V^T K_mu V = I) and R_free the bilinear restriction onto the coarse
    FREE dofs (R = P^T exactly, so prolongation-side = A^T — one stored
    matrix). At 160x80/40x20 A is (1680, 26082): the three separate stages
    cost ~0.8 + 1.0 + 0.8 ms per CG iteration at B=256 (each a small-
    operand op well above its traffic bound), while the folded form is two
    (B, 26082) x (26082, 1680) matmuls — chunky, transpose-free MXU shapes.

    ``dtype``: storage/compute type of A. float32 (default) with DEFAULT
    precision (one bf16 pass) — admissible inside the preconditioner for
    the same reason as the coarse spectral apply; bfloat16 halves the
    HBM traffic of A again (the matmuls run bf16 either way).

    Returns ``corr(coeffs, r) -> z_c`` on fine full-dof vectors (caller
    masks); vmap-compatible (constant-operand matmuls, batch in rows).
    """
    import scipy.linalg

    r = ratio
    NXc, NYc = nx_c + 1, ny_c + 1
    NXf, NYf = nx_c * r + 1, ny_c * r + 1
    g, V = scipy.linalg.eigh(
        np.asarray(coarse_model.k_lam_ff), np.asarray(coarse_model.k_mu_ff)
    )
    Ry = _hat_matrix(NYf, NYc, r).T  # (NYc, NYf)
    Rx2 = np.kron(_hat_matrix(NXf, NXc, r).T, np.eye(2))  # (NXc2, NXf2)
    R_full = np.kron(Ry, Rx2)  # (NYc*NXc2, NYf*NXf2) flat-dof restriction
    free_c = np.asarray(coarse_model.free_dof)
    mask_f = np.asarray(fine_free_mask)
    # fold the fine free-dof mask into A so corr() needs no pre-mask
    A = (V.T @ R_full[free_c, :]) * mask_f[None, :]
    A_j = jnp.asarray(A, dtype)
    g_j = jnp.asarray(g, jnp.float32)

    def corr(coeffs, rv):
        c0 = coeffs[0].astype(jnp.float32)
        c1 = coeffs[1].astype(jnp.float32)
        d = c0 * g_j + c1
        s = jnp.einsum("n,cn->c", rv.astype(dtype), A_j,
                       precision=precision,
                       preferred_element_type=jnp.float32)
        s = (s / d).astype(dtype)
        z = jnp.einsum("c,cn->n", s, A_j, precision=precision,
                       preferred_element_type=jnp.float32)
        return z.astype(rv.dtype)

    return corr


def make_two_level_preconditioner(
    prolong_idx,
    prolong_w,
    coarse_apply: Callable,
    fine_free_mask,
    *,
    omega: float = 0.5,
    grid_transfer=None,
):
    """Builds ``prec(coeffs, diag_inv, r) -> z``.

    prolong_idx/w: nodal prolongation; expanded to the interleaved dof
    layout internally. ``coarse_apply(coeffs, r_c) -> K_c^-1 r_c`` is the
    coarse solve on the COARSE full-dof vector (fixed dofs zeroed) — use the
    spectral apply of the coarse model. diag_inv is the fine Jacobi inverse
    diagonal for the current coefficients.

    ``grid_transfer``: optional ``(prolong, restrict)`` pair from
    ``make_grid_transfer``/``make_grid_transfer_nd`` replacing the
    gather/segment-sum transfers with the reshape-based structured-grid
    form (same math, ~10x faster batched on TPU). When given,
    ``prolong_idx``/``prolong_w`` may be None.
    """
    fine_free_mask = jnp.asarray(fine_free_mask)
    if grid_transfer is not None:
        _prolong, _restrict = grid_transfer

        def prec(coeffs, diag_inv, r):
            r = r * fine_free_mask.astype(r.dtype)
            z_smooth = omega * diag_inv * r
            r_c = _restrict(r)
            z_c = coarse_apply(coeffs, r_c)
            z_coarse = _prolong(z_c) * fine_free_mask.astype(r.dtype)
            return z_smooth + z_coarse.astype(r.dtype)

        return prec, _prolong, _restrict

    idx = jnp.asarray(prolong_idx, jnp.int32)
    w = jnp.asarray(prolong_w)
    n_fine = idx.shape[0]

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
