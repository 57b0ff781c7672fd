"""XDMF/HDF5 export of deformed configurations.

Equivalent of ``xdmf_h5data_save`` / ``create_xdmf_file``
(``src/fem_postprocess.py:90-161``): connectivity + per-step deformed
coordinates into HDF5, with an XDMF XML index for ParaView.
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np


# XDMF cell types by (node count, ndm); cubic families export their corner
# quad (XDMF has no standard 12/16-node quad cell)
_TOPO = {(3, 2): ("Triangle", 3), (4, 2): ("Quadrilateral", 4),
         (8, 2): ("Quadrilateral_8", 8), (9, 2): ("Quadrilateral_9", 9),
         (12, 2): ("Quadrilateral", 4), (16, 2): ("Quadrilateral", 4),
         (8, 3): ("Hexahedron", 8)}


def write_xdmf(path_h5: str, model, displacements: Sequence[np.ndarray], *, mag: float = 1.0,
               cell_fields: dict | None = None):
    """Write topology + deformed coordinates per step; emits `<path>.xdmf`.

    ``cell_fields``: optional ``{name: (nele,) array}`` per-element scalar
    fields (e.g. an inferred log-modulus field and its posterior std,
    ``prob.randomfield.posterior_field_moments``) attached to every step as
    XDMF Cell attributes.
    """
    import h5py

    coords = np.asarray(model.coords)
    conn = np.asarray(model.conn)
    ndm = int(getattr(model, "ndm", 2))
    nnodes, nele = coords.shape[0], conn.shape[0]
    topo_type, ncell = _TOPO[(conn.shape[1], ndm)]
    conn_out = conn[:, :ncell]
    cell_fields = cell_fields or {}
    with h5py.File(path_h5, "w") as f:
        f["topology"] = conn_out.astype(np.int32)
        for name, vals in cell_fields.items():
            vals = np.asarray(vals).reshape(-1)
            if vals.size != nele:
                raise ValueError(f"cell field {name!r} has size {vals.size}, want {nele}")
            f[f"cell_{name}"] = vals
        for i, u in enumerate(displacements):
            u = np.asarray(u)
            if getattr(model, "has_constraints", False) and u.size != ndm * nnodes:
                u = u[np.asarray(model.dof_map)]
            disp = u.reshape(-1, ndm)
            f[f"step{i}"] = coords + mag * disp

    attrs = "".join(
        f"""
      <Attribute Name="{name}" AttributeType="Scalar" Center="Cell">
        <DataItem Dimensions="{nele}" Format="HDF">{os.path.basename(path_h5)}:/cell_{name}</DataItem>
      </Attribute>"""
        for name in cell_fields
    )
    steps = "\n".join(
        f"""    <Grid Name="step{i}" GridType="Uniform">
      <Time Value="{i}"/>
      <Topology TopologyType="{topo_type}" NumberOfElements="{nele}">
        <DataItem Dimensions="{nele} {ncell}" Format="HDF">{os.path.basename(path_h5)}:/topology</DataItem>
      </Topology>
      <Geometry GeometryType="{'XY' if ndm == 2 else 'XYZ'}">
        <DataItem Dimensions="{nnodes} {ndm}" Format="HDF">{os.path.basename(path_h5)}:/step{i}</DataItem>
      </Geometry>{attrs}
    </Grid>"""
        for i in range(len(displacements))
    )
    xml = f"""<?xml version="1.0" ?>
<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>
<Xdmf Version="3.0">
  <Domain>
    <Grid Name="mesh" GridType="Collection" CollectionType="Temporal">
{steps}
    </Grid>
  </Domain>
</Xdmf>
"""
    with open(os.path.splitext(path_h5)[0] + ".xdmf", "w") as f:
        f.write(xml)
