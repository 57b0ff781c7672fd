"""Timing / benchmarking helpers with correct JAX async semantics.

Replaces the reference's ad-hoc ``time.time()`` prints: every measurement
synchronizes with ``block_until_ready`` so dispatch latency is not mistaken
for compute time, and compilation is excluded by a warmup call.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict

import jax


class Timer:
    """Context-manager wall timer: ``with Timer() as t: ...; t.seconds``."""

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        return False


def benchmark_fn(fn: Callable, *args, iters: int = 20, warmup: int = 1, **kwargs) -> Dict[str, Any]:
    """Steady-state timing of a jitted function (excludes compile)."""
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "per_sec": 1.0 / dt, "iters": iters}


def profile_trace(path: str):
    """jax.profiler trace context for TensorBoard-viewable traces."""
    return jax.profiler.trace(path)
