"""Structured rectangle quad4 mesh — generic plane fixture (columns, plates).

Complements the Cook's-membrane family (``mesh/cooks.py``) with an axis-
aligned rectangle: the standard fixture for Euler-column buckling and patch
tests on undistorted geometry.
"""
from __future__ import annotations

import numpy as np

from .feap import MeshData


def _grid(nx: int, ny: int, lx: float, ly: float):
    """Shared structured-grid builder: (coords, conn, nid)."""
    xs = np.linspace(0.0, lx, nx + 1)
    ys = np.linspace(0.0, ly, ny + 1)

    def nid(i, j):
        return j * (nx + 1) + i

    nnodes = (nx + 1) * (ny + 1)
    coords = np.zeros((nnodes, 2))
    for j in range(ny + 1):
        for i in range(nx + 1):
            coords[nid(i, j)] = (xs[i], ys[j])
    conn = np.zeros((nx * ny, 4), dtype=np.int32)
    e = 0
    for j in range(ny):
        for i in range(nx):
            conn[e] = [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)]
            e += 1
    return coords, conn, nid


def _mesh_q4(coords, conn, bc_nodes, bc_flags, load_nodes, load_vals):
    return MeshData(
        coords=coords,
        conn=conn,
        bc_nodes=bc_nodes,
        bc_flags=bc_flags,
        load_nodes=load_nodes,
        load_vals=load_vals,
        disp_nodes=np.zeros((0,), dtype=np.int32),
        disp_vals=np.zeros((0, 2), dtype=np.float64),
        space_dim=2,
        max_node_dof=2,
        max_ele_node=4,
    )



def rect_quad4_mesh(
    nx: int,
    ny: int,
    lx: float = 1.0,
    ly: float = 10.0,
    *,
    fix_bottom: bool = True,
    top_load: tuple = (0.0, -1.0),
) -> MeshData:
    """[0,lx] x [0,ly] on an nx x ny quad4 grid. The y=0 edge is clamped
    (both dofs) when ``fix_bottom``; ``top_load`` is the TOTAL force on the
    y=ly edge, applied as the consistent load of a uniform traction
    (trapezoidal: edge-interior nodes get double the corner weight)."""
    coords, conn, nid = _grid(nx, ny, lx, ly)
    nnodes = coords.shape[0]
    if fix_bottom:
        bc_nodes = np.array([nid(i, 0) for i in range(nx + 1)], dtype=np.int32)
        bc_flags = np.ones((bc_nodes.shape[0], 2), dtype=np.int32)
    else:
        bc_nodes = np.zeros((0,), dtype=np.int32)
        bc_flags = np.zeros((0, 2), dtype=np.int32)

    w = np.zeros(nnodes)
    for i in range(nx):  # each top edge segment spreads half to each end
        w[nid(i, ny)] += 0.5
        w[nid(i + 1, ny)] += 0.5
    w /= w.sum()
    load_nodes = np.nonzero(w)[0].astype(np.int32)
    load_vals = w[load_nodes, None] * np.asarray(top_load, dtype=np.float64)[None, :]
    return _mesh_q4(coords, conn, bc_nodes, bc_flags, load_nodes, load_vals)


def inverter_quad4_mesh(nx: int, ny: int, l: float = 1.0):
    """Force-inverter design domain (Sigmund's classic, full model):
    [0,l]^2 grid, the two left-edge corner nodes clamped, unit +x input
    force at the left-edge midheight. Returns ``(mesh, in_node, out_node)``
    — attach input/output springs at the x-dofs of those nodes via
    ``build_fem_model(nodal_springs=...)`` and the output functional via
    ``solver.make_finverter_vector``."""
    coords, conn, nid = _grid(nx, ny, l, l)
    bc_nodes = np.array([nid(0, 0), nid(0, ny)], dtype=np.int32)
    bc_flags = np.ones((2, 2), dtype=np.int32)
    in_node = nid(0, ny // 2)
    out_node = nid(nx, ny // 2)
    load_nodes = np.array([in_node], dtype=np.int32)
    load_vals = np.array([[1.0, 0.0]])
    mesh = _mesh_q4(coords, conn, bc_nodes, bc_flags, load_nodes, load_vals)
    return mesh, int(in_node), int(out_node)


def cantilever_quad4_mesh(
    nx: int, ny: int, lx: float = 3.0, ly: float = 1.0
) -> MeshData:
    """[0,lx] x [0,ly] cantilever: x=0 edge clamped, unit downward point
    load at the right-edge midheight — the standard compliance-minimization
    (88-line-code style) fixture."""
    coords, conn, nid = _grid(nx, ny, lx, ly)
    bc_nodes = np.array([nid(0, j) for j in range(ny + 1)], dtype=np.int32)
    bc_flags = np.ones((bc_nodes.shape[0], 2), dtype=np.int32)
    load_nodes = np.array([nid(nx, ny // 2)], dtype=np.int32)
    load_vals = np.array([[0.0, -1.0]])
    return _mesh_q4(coords, conn, bc_nodes, bc_flags, load_nodes, load_vals)
