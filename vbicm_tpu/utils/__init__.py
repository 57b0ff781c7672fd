from .logging import MetricsLogger
from .timing import Timer, benchmark_fn

__all__ = ["MetricsLogger", "Timer", "benchmark_fn"]
