"""Checkpoint backends.

Two interchangeable formats for trainer state (params + optimizer state +
epoch + history; see ``vi/train.py``):

  * msgpack (flax.serialization) — single-file, no extra deps, what the
    trainer writes by default;
  * orbax — the production JAX checkpointing library (async-capable,
    sharding-aware), for users integrating with orbax-managed runs
    (SURVEY §5 checkpoint/resume plan).

Both round-trip arbitrary pytrees; orbax is optional and gated on import.
"""
from __future__ import annotations

import os
from typing import Any, Optional

from flax import serialization


def save_msgpack(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def load_msgpack(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("orbax-checkpoint is not installed") from e


def save_orbax(path: str, tree: Any) -> None:
    """Save a pytree with orbax (StandardCheckpointer); path must not exist."""
    ocp = _orbax()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def load_orbax(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree with orbax; template restores concrete dtypes/shapes."""
    ocp = _orbax()
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), target=template)
    return ckptr.restore(os.path.abspath(path))
