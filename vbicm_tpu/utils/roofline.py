"""Roofline / MFU accounting for the benchmark harness.

Round-2 review: perf claims were multiples of a soft target (50 steps/s)
with no hardware-efficiency statement. This module turns a measured
iteration rate into achieved TFLOP/s and fraction-of-peak via the XLA cost
model (``compiled.cost_analysis()`` — the compiler's own FLOP/byte counts
for the exact HLO that ran), plus HBM-bandwidth utilization, so "fast"
becomes a statement about distance from the chip's roofline.

Peak numbers are per-chip datasheet values for the common TPU generations;
unknown kinds fall back to v5e. FLOPs are counted by XLA independent of
dtype, so MFU is reported against the bf16 MXU peak (the ceiling the MXU
can reach) — a deliberate, conservative convention: f32-HIGHEST work
costs multiple bf16 passes, so its achievable ceiling is lower.
"""
from __future__ import annotations

from typing import Optional

import jax

# per-chip peaks: (bf16 TFLOP/s, HBM GB/s)
_PEAKS = {
    "TPU v4": (275.0, 1228.0),
    "TPU v5 lite": (197.0, 819.0),
    "TPU v5": (459.0, 2765.0),  # v5p
    "TPU v5p": (459.0, 2765.0),
    "TPU v6 lite": (918.0, 1640.0),  # Trillium
    "cpu": (1.0, 50.0),  # nominal, keeps the fields defined off-TPU
}


def device_peaks(device: Optional[jax.Device] = None):
    """(bf16_peak_tflops, hbm_gb_s) for the first (or given) device."""
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu")
    for k, v in _PEAKS.items():
        if kind.startswith(k):
            return v
    return _PEAKS["TPU v5 lite"] if d.platform == "tpu" else _PEAKS["cpu"]


def compiled_costs(fn, *args, **kwargs):
    """(flops, bytes_accessed) of ``jit(fn)`` for these args, from XLA's
    cost analysis of the compiled executable. Returns (None, None) when the
    backend does not expose the analysis."""
    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = ca.get("flops")
        nbytes = ca.get("bytes accessed", ca.get("bytes_accessed"))
        # `is not None`, not truthiness: 0.0 flops is a legitimate result
        # for pure data-movement executables and must not drop the (valid)
        # bytes measurement
        return (float(flops) if flops is not None else None,
                float(nbytes) if nbytes is not None else None)
    except Exception:
        return None, None


def mfu_fields(flops_per_iter, bytes_per_iter, iters_per_sec, device=None):
    """Benchmark-JSON fields: achieved TFLOP/s, MFU vs bf16 peak, achieved
    HBM GB/s and bandwidth utilization. Missing costs yield an empty dict."""
    if not flops_per_iter:
        return {}
    peak_tflops, peak_hbm = device_peaks(device)
    achieved = flops_per_iter * iters_per_sec / 1e12
    out = {
        "flops_per_iter": float(flops_per_iter),
        "achieved_tflops": round(achieved, 4),
        "mfu_vs_bf16_peak": round(achieved / peak_tflops, 5),
    }
    if bytes_per_iter:
        gbs = bytes_per_iter * iters_per_sec / 1e9
        out["achieved_hbm_gbs"] = round(gbs, 2)
        out["hbm_utilization"] = round(gbs / peak_hbm, 5)
    return out
