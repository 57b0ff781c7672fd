"""Pallas kernel tests (interpret mode on CPU; real-hardware path exercised
by bench.py --pallas on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.ops.spectral_pallas import (
    spectral_apply_batched,
    spectral_apply_reference,
)


def _problem(B=20, n=200, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    g = np.abs(rng.normal(size=n)) + 0.1
    coeffs = np.abs(rng.normal(size=(B, 2))) + 1.0
    b = rng.normal(size=(B, n))
    return (
        jnp.asarray(Q, jnp.float32),
        jnp.asarray(g, jnp.float32),
        jnp.asarray(coeffs, jnp.float32),
        jnp.asarray(b, jnp.float32),
    )


def test_kernel_matches_reference_interpret():
    V, g, c, b = _problem()
    out_k = spectral_apply_batched(V, g, c, b, interpret=True)
    out_r = spectral_apply_reference(V, g, c, b)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), atol=2e-5)


def test_kernel_padding_cases():
    # n and B already aligned, and unaligned, both must work
    for B, n in [(128, 256), (5, 440), (130, 130)]:
        V, g, c, b = _problem(B, n, seed=B + n)
        out_k = spectral_apply_batched(V, g, c, b, interpret=True)
        out_r = spectral_apply_reference(V, g, c, b)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_r), atol=3e-5, err_msg=f"B={B} n={n}"
        )


def test_kernel_is_a_solve():
    """The apply really inverts K = c0 * V diag(g) V^T-ish pencil when V is
    orthonormal (A = V g V^T, B = V V^T = I)."""
    V, g, c, b = _problem(B=4, n=64, seed=3)
    A = np.asarray(V) @ np.diag(np.asarray(g)) @ np.asarray(V).T
    out = np.asarray(spectral_apply_batched(V, g, c, b, interpret=True))
    for s in range(4):
        K = float(c[s, 0]) * A + float(c[s, 1]) * np.eye(64)
        np.testing.assert_allclose(K @ out[s], np.asarray(b)[s], atol=1e-3)


def test_fused_element_matvec_matches_xla():
    """Fused pallas affine element matvec (interpret mode on CPU) ==
    per-part XLA einsum + scatter."""
    import numpy as np

    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.ops.assembly import element_matvec
    from vbicm_tpu.ops.element_matvec_pallas import make_fused_affine_matvec

    model = build_fem_model(cooks_membrane_mesh(8, 4), dense=False)
    B = 3
    rng = np.random.default_rng(0)
    coeffs = jnp.asarray(rng.uniform(5.0, 15.0, (B, 2)), jnp.float32)
    us = jnp.asarray(rng.standard_normal((B, model.ndof)), jnp.float32)

    mv = make_fused_affine_matvec(model, interpret=True, tile_e=128)
    got = np.asarray(mv(coeffs, us))

    for b in range(B):
        ke = (coeffs[b, 0] * model.ke_lam + coeffs[b, 1] * model.ke_mu).astype(
            jnp.float32
        )
        ref = np.asarray(element_matvec(ke, model.lm, us[b], model.ndof))
        np.testing.assert_allclose(got[b], ref, rtol=2e-5, atol=1e-5)


def test_mxu_banded_stencil_kernel_interpret_matches_assembled():
    """ops/stencil_mxu.py: the banded MXU matvec (both precision modes) in
    interpret mode against the exact per-part stencil operator."""
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.ops.stencil import build_stencil_tables, make_stencil_part_matvec
    from vbicm_tpu.ops.stencil_mxu import pack_w_bands, stencil_affine_matvec_mxu

    nx, ny = 12, 6
    model = build_fem_model(cooks_membrane_mesh(nx, ny), dense=False)
    W = build_stencil_tables(model, nx, ny)
    part_mv, _ = make_stencil_part_matvec(model, nx, ny, W=W)
    B = 4
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((B, model.ndof)), jnp.float32)
    coeffs = jnp.asarray(rng.uniform(5, 15, size=(B, 2)), jnp.float32)
    qr = jnp.stack([
        coeffs[b, 0] * part_mv(0, u[b].astype(jnp.float64))
        + coeffs[b, 1] * part_mv(1, u[b].astype(jnp.float64))
        for b in range(B)
    ])
    scale = float(jnp.max(jnp.abs(qr)))
    for mode, tol in (("f32", 5e-6), ("bf16x3", 5e-5)):
        mb = pack_w_bands(W, mode)
        q = stencil_affine_matvec_mxu(mb, coeffs, u, NY=ny + 1, NX=nx + 1,
                                      interpret=True, mode=mode)
        err = float(jnp.max(jnp.abs(q - qr))) / scale
        assert err < tol, (mode, err)
