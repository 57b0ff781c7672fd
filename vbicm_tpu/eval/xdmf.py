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


def write_xdmf(path_h5: str, model, displacements: Sequence[np.ndarray], *, mag: float = 1.0):
    """Write topology + deformed coordinates per step; emits `<path>.xdmf`."""
    import h5py

    coords = np.asarray(model.coords)
    conn = np.asarray(model.conn)
    ndm = int(getattr(model, "ndm", 2))
    nnodes, nele = coords.shape[0], conn.shape[0]
    topo_type, ncell = _TOPO[(conn.shape[1], ndm)]
    conn_out = conn[:, :ncell]
    with h5py.File(path_h5, "w") as f:
        f["topology"] = conn_out.astype(np.int32)
        for i, u in enumerate(displacements):
            u = np.asarray(u)
            if getattr(model, "has_constraints", False) and u.size != ndm * nnodes:
                u = u[np.asarray(model.dof_map)]
            disp = u.reshape(-1, ndm)
            f[f"step{i}"] = coords + mag * disp

    steps = "\n".join(
        f"""    <Grid Name="step{i}" GridType="Uniform">
      <Time Value="{i}"/>
      <Topology TopologyType="{topo_type}" NumberOfElements="{nele}">
        <DataItem Dimensions="{nele} {ncell}" Format="HDF">{os.path.basename(path_h5)}:/topology</DataItem>
      </Topology>
      <Geometry GeometryType="{'XY' if ndm == 2 else 'XYZ'}">
        <DataItem Dimensions="{nnodes} {ndm}" Format="HDF">{os.path.basename(path_h5)}:/step{i}</DataItem>
      </Geometry>
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
