"""Structured metrics logging (JSONL), replacing the reference's prints
(``main_custom_training.py:272-279``, ``src/fem_solver.py:61-63``)."""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional, TextIO


class MetricsLogger:
    """Append-only JSONL metrics stream + optional stdout echo.

    Usage:
        log = MetricsLogger("results/metrics.jsonl")
        log.log("train_step1", epoch=3, loss=4.2, steps_per_sec=31.0)
    """

    def __init__(self, path: Optional[str] = None, echo: bool = False):
        self.path = path
        self.echo = echo
        self._fh: Optional[TextIO] = None
        if path is not None:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        rec = {"ts": time.time(), "event": event, **fields}
        line = json.dumps(rec)
        if self._fh is not None:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo:
            print(line, file=sys.stderr)
        return rec

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
