"""Multi-slice (DCN x ICI) device meshes: the two-tier hardware mapping.

A multi-slice TPU deployment has two very different interconnects: ICI
within a slice (~100s of GB/s per link) and DCN between slices (orders of
magnitude slower). The collective layout must put chatty axes on ICI and
quiet axes on DCN. For this workload the mapping is unambiguous:

  * the POSTERIOR-SAMPLE axis goes on the ``dcn`` (outer) axis — FEM
    solves for different theta samples are embarrassingly parallel; the
    only cross-sample communication is the per-step gradient/loss
    reduction (a few kB for the 20-neuron nets), which DCN absorbs;
  * the ELEMENT / domain-decomposition axis goes on the ``ici`` (inner)
    axis — the sharded CG matvec reduces partial dof sums EVERY iteration
    (``parallel/mesh.py::make_2d_sharded_solver``, one psum per matvec),
    so those collectives must ride ICI.

GSPMD handles the rest: with the mesh built slice-major (each mesh row =
one slice), every ``ici``-axis collective is intra-slice by construction.

No multi-slice hardware is attached in this environment; the layout is
exercised on virtual CPU meshes (``tests/test_multislice.py``, driver
dryrun) — the standard way to validate sharding without a pod.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def get_hybrid_mesh(
    n_slices: int,
    chips_per_slice: Optional[int] = None,
    *,
    axis_names: Tuple[str, str] = ("dcn", "ici"),
) -> Mesh:
    """(n_slices, chips_per_slice) device mesh, slice-major.

    On real multi-slice hardware uses ``mesh_utils.create_hybrid_device_mesh``
    (groups devices by ``device.slice_index`` so rows align with physical
    slices); on single-slice or virtual (CPU) devices falls back to a plain
    reshape, which preserves the axis semantics for compile-level testing.
    """
    devs = jax.devices()
    if chips_per_slice is None:
        if len(devs) % n_slices:
            raise ValueError(f"{len(devs)} devices don't split into {n_slices} slices")
        chips_per_slice = len(devs) // n_slices
    n = n_slices * chips_per_slice
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    slice_ids = {getattr(d, "slice_index", 0) for d in devs[:n]}
    if len(slice_ids) > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (chips_per_slice,),
            (n_slices,),
            devices=devs[:n],
        )
        # hybrid mesh returns (dcn, ici)-ordered axes already
        return Mesh(arr.reshape(n_slices, chips_per_slice), axis_names)
    return Mesh(np.array(devs[:n]).reshape(n_slices, chips_per_slice), axis_names)


def make_multislice_solver(model, mesh: Mesh, *, tol: float = 1e-12,
                           maxiter: int = 4000):
    """Batched FEM solve with samples on ``dcn`` and elements on ``ici``
    (the two-tier mapping above). Thin specialization of
    ``parallel.mesh.make_2d_sharded_solver`` to the hybrid mesh's axis
    names; returns ``solve_batch(coeffs (B, P)) -> (B, ndof)``."""
    from .mesh import make_2d_sharded_solver

    dcn_name, ici_name = mesh.axis_names
    return make_2d_sharded_solver(
        model, mesh, data_axis=dcn_name, dd_axis=ici_name, tol=tol,
        maxiter=maxiter,
    )
