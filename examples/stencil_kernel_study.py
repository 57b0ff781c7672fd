"""Stencil-matvec bandwidth study (round-4 verdict item 6).

BENCH_r04 reported the Pallas row-stencil at 31.3 GB/s = 3.8% of the v5e
HBM peak and asked "close the 26x gap or write the ceiling". This driver
decides it by measurement:

  1. times EVERY implementation of the 160x80 batched affine matvec —
     XLA stencil, Pallas one-row VPU, Pallas multi-row VPU, MXU-banded
     f32 and bf16x3 (``ops.stencil_mxu``) — at production batch;
  2. measures an EMPIRICAL VPU peak with a kernel of identical grid/block
     structure doing the same count of aligned (B, NX2) FMAs with no
     stencil shifts — the attainable ceiling for this op shape;
  3. states the correct roofline: the 42-plane stencil does ~10.5 f32
     flops per minimum HBM byte while the VPU ridge point on v5e sits at
     ~5 flops/byte (empirical-peak/819 GB/s), so the VPU kernels are
     COMPUTE-bound and an HBM-bandwidth fraction is the wrong metric for
     them; the MXU variants trade 19x densified FLOPs for MXU rate and
     ARE bandwidth-facing (the banded table read dominates their traffic).

Writes results_stencil_study/summary.json; checks every kernel against
the f64 XLA stencil for accuracy. Reference surface: none (the reference
has no structured-grid solver at all) — this studies this repo's own
BASELINE configs[4] hot loop.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best, out


def vpu_peak_kernel(B, NY, XLP, nfma):
    """Empirical VPU ceiling probe: NY grid programs, each doing ``nfma``
    aligned (B, XLP) multiply-adds on VMEM-resident blocks — the same
    program/block structure as the row-stencil kernel minus the shifted
    slices and table reads."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        acc = a_ref[...]
        b = b_ref[...]
        for _ in range(nfma):
            acc = acc * b + b
        o_ref[...] = acc

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, NY * XLP), jnp.float32),
            grid=(NY,),
            in_specs=[
                pl.BlockSpec((B, XLP), lambda y: (0, y),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, XLP), lambda y: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, XLP), lambda y: (0, y),
                                   memory_space=pltpu.VMEM),
        )(a, b)

    return run


def main():
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.ops.stencil import build_stencil_tables, make_stencil_part_matvec
    from vbicm_tpu.ops.stencil_mxu import pack_w_bands, stencil_affine_matvec_mxu
    from vbicm_tpu.ops.stencil_pallas import (
        pack_w_interleaved,
        stencil_affine_matvec_pallas,
        stencil_affine_matvec_pallas_mr,
    )
    from vbicm_tpu.utils.roofline import device_peaks

    jax.config.update("jax_enable_x64", True)
    assert jax.default_backend() == "tpu", "run on the chip"
    nx, ny, B = 160, 80, 256
    NY, NX = ny + 1, nx + 1
    NX2 = 2 * NX
    model = build_fem_model(cooks_membrane_mesh(nx, ny), dense=False)
    W = build_stencil_tables(model, nx, ny)
    part_matvec, _ = make_stencil_part_matvec(model, nx, ny, W=W)
    w_int = jnp.asarray(pack_w_interleaved(W))
    mh, ml = pack_w_bands(W, "bf16x3")
    mf32 = pack_w_bands(W, "f32")

    rng = np.random.default_rng(0)
    c64 = jnp.asarray(rng.uniform(1.0, 2.0, (B, 2)))
    u64 = jnp.asarray(rng.normal(size=(B, model.ndof)))
    c32, u32 = c64.astype(jnp.float32), u64.astype(jnp.float32)

    def xla_ref(c, u):
        q = None
        for p in range(2):
            qp = part_matvec(p, u)
            cp = c[:, p : p + 1].astype(qp.dtype)
            q = cp * qp if q is None else q + cp * qp
        return q

    q_exact = jax.jit(jax.vmap(lambda c, u: xla_ref(c[None], u[None])[0]))(
        c64, u64
    )
    scale = float(jnp.linalg.norm(q_exact))

    impls = {
        "xla_stencil_f32": jax.jit(lambda c, u: xla_ref(c, u)),
        "pallas_onerow": jax.jit(functools.partial(
            stencil_affine_matvec_pallas, w_int, NY=NY, NX=NX)),
        "pallas_multirow3": jax.jit(functools.partial(
            stencil_affine_matvec_pallas_mr, w_int, NY=NY, NX=NX,
            rows_per_program=3)),
        "mxu_f32": jax.jit(functools.partial(
            stencil_affine_matvec_mxu, mf32, NY=NY, NX=NX, mode="f32")),
        "mxu_bf16x3": jax.jit(functools.partial(
            stencil_affine_matvec_mxu, (mh, ml), NY=NY, NX=NX,
            mode="bf16x3")),
    }

    peak_tflops, peak_hbm = device_peaks()
    # algorithmic minimum HBM traffic: u in + q out (f32) + one pass over
    # the operator tables (per-impl)
    uq_bytes = 2 * 4.0 * B * model.ndof
    table_bytes = {
        "xla_stencil_f32": float(np.asarray(W).nbytes) / 2,  # f32 of the f64
        "pallas_onerow": float(w_int.size) * 4.0,
        "pallas_multirow3": float(w_int.size) * 4.0,
        "mxu_f32": float(mf32.size) * 4.0,
        "mxu_bf16x3": float(mh.size + ml.size) * 2.0,
    }
    # f32 flops actually required by the band (not the densified form)
    band_flops = 2.0 * B * NY * 42 * NX2

    out = {"mesh": f"{nx}x{ny}", "ndof": model.ndof, "batch": B,
           "peak_hbm_gbs": peak_hbm, "peak_bf16_tflops": peak_tflops,
           "band_flops_per_matvec": band_flops, "impls": {}}
    for name, fn in impls.items():
        dt, q = timeit(fn, c32, u32)
        rel = float(jnp.linalg.norm(q.astype(jnp.float64) - q_exact)) / scale
        total_min_bytes = uq_bytes + table_bytes[name]
        sol_ms = total_min_bytes / peak_hbm / 1e6
        rec = {
            "ms": round(dt * 1e3, 4),
            "rel_err_vs_f64": rel,
            "min_bytes": total_min_bytes,
            "achieved_gbs_vs_min_traffic": round(total_min_bytes / dt / 1e9, 1),
            "hbm_bound_fraction": round(total_min_bytes / dt / 1e9 / peak_hbm, 4),
            "bandwidth_sol_ms": round(sol_ms, 4),
            "band_tflops": round(band_flops / dt / 1e12, 4),
        }
        out["impls"][name] = rec
        print(f"{name:18s} {rec['ms']:8.3f} ms  rel {rel:.2e}  "
              f"bw-frac {rec['hbm_bound_fraction']:.3f}  "
              f"band {rec['band_tflops']:.3f} TFLOP/s")

    # empirical VPU ceiling with the one-row kernel's structure: 42 FMAs
    # per (B, XLP) block per program (the stencil's per-row FMA count)
    XLP = -(-(NX2 + 8) // 128) * 128
    a = jnp.asarray(rng.normal(size=(B, NY * XLP)), jnp.float32)
    bb = jnp.asarray(rng.normal(size=(B, XLP)), jnp.float32)
    run = vpu_peak_kernel(B, NY, XLP, 42)
    dt_p, _ = timeit(run, a, bb)
    vpu_flops = 2.0 * 42 * B * NY * XLP
    vpu_peak = vpu_flops / dt_p / 1e12
    out["vpu_empirical"] = {
        "ms": round(dt_p * 1e3, 4),
        "tflops": round(vpu_peak, 4),
        "note": "42 aligned (B,XLP) FMAs per program, same grid/blocks as "
                "pallas_onerow, no shifted slices / table reads",
    }
    one = out["impls"]["pallas_onerow"]
    out["verdict"] = {
        "vpu_ridge_flops_per_byte": round(vpu_peak * 1e12 / (peak_hbm * 1e9), 2),
        "stencil_band_intensity_flops_per_byte": round(
            band_flops / one["min_bytes"], 2),
        "pallas_onerow_fraction_of_empirical_vpu": round(
            one["band_tflops"] / vpu_peak, 3),
    }
    print(json.dumps(out["vpu_empirical"], indent=1))
    print(json.dumps(out["verdict"], indent=1))

    os.makedirs("results_stencil_study", exist_ok=True)
    with open("results_stencil_study/summary.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results_stencil_study/summary.json")


if __name__ == "__main__":
    main()
