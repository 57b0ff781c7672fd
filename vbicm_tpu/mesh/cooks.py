"""Cook's-membrane mesh generator.

Reproduces the geometry/numbering convention of the shipped mesh
``Armero_cooksm_20x10.txt`` (corners (0,0), (48,44), (48,60), (0,44); node
numbering x-fastest from the bottom edge; element k in row r spans columns
(k, k+1)) for arbitrary nx x ny resolution, so the scaled configuration
(~160x80, BASELINE.json configs[4]) uses the same code path as the 20x10
parity case. For nx=20, ny=10 the output matches the shipped file exactly.

Loading matches the shipped file: a total shear force of 50 in +y on the
right edge, lumped uniformly with half-weights at the two corner nodes
(``Armero_cooksm_20x10.txt`` FORCe section: 2.5 at nodes 21/231, 5.0 at the
nine interior right-edge nodes). The left edge is fully clamped.
"""
from __future__ import annotations

import numpy as np

from .feap import MeshData

# Cook's membrane geometry (mesh-file Parameters block: L=48, H1=44, H2=60)
_L = 48.0
_H1 = 44.0
_H2 = 60.0
_TOTAL_SHEAR = 50.0


def cooks_membrane_mesh(nx: int = 20, ny: int = 10) -> MeshData:
    """Build an (nx x ny)-element quad4 mesh of Cook's membrane."""
    xi = np.linspace(0.0, 1.0, nx + 1)  # horizontal fraction
    eta = np.linspace(0.0, 1.0, ny + 1)  # vertical fraction
    Xi, Eta = np.meshgrid(xi, eta)  # (ny+1, nx+1), row-major, x fastest
    x = _L * Xi
    y_bot = _H1 * Xi
    y_top = _H1 + (_H2 - _H1) * Xi
    y = y_bot + (y_top - y_bot) * Eta
    coords = np.stack([x.ravel(), y.ravel()], axis=1)  # node id = r*(nx+1)+c

    conn = np.zeros((nx * ny, 4), dtype=np.int32)
    e = 0
    for r in range(ny):
        for c in range(nx):
            n0 = r * (nx + 1) + c
            conn[e] = (n0, n0 + 1, n0 + nx + 2, n0 + nx + 1)
            e += 1

    # Left edge clamped (both dofs)
    bc_nodes = np.arange(ny + 1, dtype=np.int32) * (nx + 1)
    bc_flags = np.ones((ny + 1, 2), dtype=np.int32)

    # Right-edge shear load, trapezoidal (uniform) lumping
    load_nodes = (np.arange(ny + 1, dtype=np.int32) * (nx + 1)) + nx
    fy = np.full(ny + 1, _TOTAL_SHEAR / ny)
    fy[0] *= 0.5
    fy[-1] *= 0.5
    load_vals = np.stack([np.zeros(ny + 1), fy], axis=1)

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


def cooks_membrane_mesh_q9(nx: int = 10, ny: int = 5) -> MeshData:
    """9-node (biquadratic Lagrange) Cook's-membrane mesh.

    Same bilinear geometry map as the quad4 generator on a (2nx+1) x (2ny+1)
    nodal grid. Element node ordering matches ``ops.shape.quad9_natural``:
    corners CCW, mid-sides (bottom, right, top, left), center. The right-edge
    shear load uses the CONSISTENT quadratic-edge lumping (1/6, 4/6, 1/6 per
    edge segment) so the total force is still 50 in +y.
    """
    gx, gy = 2 * nx, 2 * ny
    xi = np.linspace(0.0, 1.0, gx + 1)
    eta = np.linspace(0.0, 1.0, gy + 1)
    Xi, Eta = np.meshgrid(xi, eta)
    x = _L * Xi
    y_bot = _H1 * Xi
    y_top = _H1 + (_H2 - _H1) * Xi
    y = y_bot + (y_top - y_bot) * Eta
    coords = np.stack([x.ravel(), y.ravel()], axis=1)

    def nid(r, c):
        return r * (gx + 1) + c

    conn = np.zeros((nx * ny, 9), dtype=np.int32)
    e = 0
    for r in range(ny):
        for c in range(nx):
            r0, c0 = 2 * r, 2 * c
            conn[e] = (
                nid(r0, c0), nid(r0, c0 + 2), nid(r0 + 2, c0 + 2), nid(r0 + 2, c0),
                nid(r0, c0 + 1), nid(r0 + 1, c0 + 2), nid(r0 + 2, c0 + 1), nid(r0 + 1, c0),
                nid(r0 + 1, c0 + 1),
            )
            e += 1

    bc_nodes = np.array([nid(r, 0) for r in range(gy + 1)], dtype=np.int32)
    bc_flags = np.ones((gy + 1, 2), dtype=np.int32)

    # consistent edge load: per edge element of length fraction, corner
    # nodes get t*h/6, midside t*4h/6; h = TOTAL/ny per edge element
    load = np.zeros(gy + 1)
    seg = _TOTAL_SHEAR / ny
    for r in range(ny):
        load[2 * r] += seg / 6.0
        load[2 * r + 1] += 4.0 * seg / 6.0
        load[2 * r + 2] += seg / 6.0
    load_nodes = np.array([nid(r, gx) for r in range(gy + 1)], dtype=np.int32)
    load_vals = np.stack([np.zeros(gy + 1), load], axis=1)

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
        max_ele_node=9,
    )


def _cubic_grid(nx: int, ny: int):
    """(3nx+1) x (3ny+1) nodal grid of the Cook's bilinear geometry map."""
    gx, gy = 3 * nx, 3 * ny
    xi = np.linspace(0.0, 1.0, gx + 1)
    eta = np.linspace(0.0, 1.0, gy + 1)
    Xi, Eta = np.meshgrid(xi, eta)
    x = _L * Xi
    y_bot = _H1 * Xi
    y_top = _H1 + (_H2 - _H1) * Xi
    y = y_bot + (y_top - y_bot) * Eta
    return x, y, gx, gy


def _cubic_edge_load(ny: int, gy: int):
    """Consistent cubic-edge lumping of the total right-edge shear: for a
    uniform traction on a cubic edge (nodes at -1, -1/3, 1/3, 1) the
    consistent weights are (1/8, 3/8, 3/8, 1/8) of the segment force."""
    load = np.zeros(gy + 1)
    seg = _TOTAL_SHEAR / ny
    for r in range(ny):
        load[3 * r] += seg / 8.0
        load[3 * r + 1] += 3.0 * seg / 8.0
        load[3 * r + 2] += 3.0 * seg / 8.0
        load[3 * r + 3] += seg / 8.0
    return load


def cooks_membrane_mesh_q16(nx: int = 5, ny: int = 3) -> MeshData:
    """16-node bicubic Lagrange Cook's mesh (reference ``shp2dc``
    capability, ``src/fem_preprocess.py:973-1033``). Element node ordering
    matches ``ops.shape._Q16_IJ``: corners CCW, 2 edge nodes per edge
    (bottom, right, top-reversed, left-reversed), then 4 interior."""
    x, y, gx, gy = _cubic_grid(nx, ny)
    coords = np.stack([x.ravel(), y.ravel()], axis=1)

    def nid(r, c):
        return r * (gx + 1) + c

    conn = np.zeros((nx * ny, 16), dtype=np.int32)
    e = 0
    for r in range(ny):
        for c in range(nx):
            r0, c0 = 3 * r, 3 * c
            conn[e] = (
                nid(r0, c0), nid(r0, c0 + 3), nid(r0 + 3, c0 + 3), nid(r0 + 3, c0),
                nid(r0, c0 + 1), nid(r0, c0 + 2),              # bottom
                nid(r0 + 1, c0 + 3), nid(r0 + 2, c0 + 3),      # right
                nid(r0 + 3, c0 + 2), nid(r0 + 3, c0 + 1),      # top (reversed)
                nid(r0 + 2, c0), nid(r0 + 1, c0),              # left (reversed)
                nid(r0 + 1, c0 + 1), nid(r0 + 1, c0 + 2),      # interior
                nid(r0 + 2, c0 + 2), nid(r0 + 2, c0 + 1),
            )
            e += 1

    bc_nodes = np.array([nid(r, 0) for r in range(gy + 1)], dtype=np.int32)
    bc_flags = np.ones((gy + 1, 2), dtype=np.int32)
    load = _cubic_edge_load(ny, gy)
    load_nodes = np.array([nid(r, gx) for r in range(gy + 1)], dtype=np.int32)
    load_vals = np.stack([np.zeros(gy + 1), load], axis=1)

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
        max_ele_node=16,
    )


def cooks_membrane_mesh_q12(nx: int = 5, ny: int = 3) -> MeshData:
    """12-node cubic serendipity Cook's mesh (reference ``shp2ds``
    capability, ``src/fem_preprocess.py:1035-1120``): the bicubic nodal grid
    without the 4 interior nodes of each element. Node ordering matches
    ``ops.shape._Q12_EDGE`` (corners CCW, 2 edge nodes per edge)."""
    x, y, gx, gy = _cubic_grid(nx, ny)
    keep = np.ones((gy + 1, gx + 1), dtype=bool)
    keep[1::3, 1::3] = False  # interior (1,1) of each cell
    keep[1::3, 2::3] = False
    keep[2::3, 1::3] = False
    keep[2::3, 2::3] = False
    new_id = -np.ones((gy + 1, gx + 1), dtype=np.int64)
    new_id[keep] = np.arange(keep.sum())
    coords = np.stack([x[keep], y[keep]], axis=1)

    def nid(r, c):
        assert new_id[r, c] >= 0
        return int(new_id[r, c])

    conn = np.zeros((nx * ny, 12), dtype=np.int32)
    e = 0
    for r in range(ny):
        for c in range(nx):
            r0, c0 = 3 * r, 3 * c
            conn[e] = (
                nid(r0, c0), nid(r0, c0 + 3), nid(r0 + 3, c0 + 3), nid(r0 + 3, c0),
                nid(r0, c0 + 1), nid(r0, c0 + 2),              # bottom
                nid(r0 + 1, c0 + 3), nid(r0 + 2, c0 + 3),      # right
                nid(r0 + 3, c0 + 2), nid(r0 + 3, c0 + 1),      # top (reversed)
                nid(r0 + 2, c0), nid(r0 + 1, c0),              # left (reversed)
            )
            e += 1

    gy_nodes = [nid(r, 0) for r in range(gy + 1)]
    bc_nodes = np.array(gy_nodes, dtype=np.int32)
    bc_flags = np.ones((gy + 1, 2), dtype=np.int32)
    load = _cubic_edge_load(ny, gy)
    load_nodes = np.array([nid(r, gx) for r in range(gy + 1)], dtype=np.int32)
    load_vals = np.stack([np.zeros(gy + 1), load], axis=1)

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
        max_ele_node=12,
    )


def cooks_membrane_mesh_q8(nx: int = 10, ny: int = 5) -> MeshData:
    """8-node serendipity Cook's-membrane mesh: the q9 nodal grid without
    the element-center nodes. Node ordering per element matches
    ``ops.shape.quad8_natural`` (corners CCW, mid-sides bottom/right/top/
    left); consistent quadratic edge loading as in the q9 generator.
    """
    gx, gy = 2 * nx, 2 * ny
    xi = np.linspace(0.0, 1.0, gx + 1)
    eta = np.linspace(0.0, 1.0, gy + 1)
    Xi, Eta = np.meshgrid(xi, eta)
    x = _L * Xi
    y = _H1 * Xi + (_H1 + (_H2 - _H1) * Xi - _H1 * Xi) * Eta
    # keep every grid point except (odd row, odd col) = element centers
    keep = np.ones((gy + 1, gx + 1), dtype=bool)
    keep[1::2, 1::2] = False
    new_id = -np.ones((gy + 1, gx + 1), dtype=np.int64)
    new_id[keep] = np.arange(keep.sum())
    coords = np.stack([x[keep], y[keep]], axis=1)

    def nid(r, c):
        return int(new_id[r, c])

    conn = np.zeros((nx * ny, 8), dtype=np.int32)
    e = 0
    for r in range(ny):
        for c in range(nx):
            r0, c0 = 2 * r, 2 * c
            conn[e] = (
                nid(r0, c0), nid(r0, c0 + 2), nid(r0 + 2, c0 + 2), nid(r0 + 2, c0),
                nid(r0, c0 + 1), nid(r0 + 1, c0 + 2), nid(r0 + 2, c0 + 1), nid(r0 + 1, c0),
            )
            e += 1

    bc_nodes = np.array([nid(r, 0) for r in range(gy + 1)], dtype=np.int32)
    bc_flags = np.ones((gy + 1, 2), dtype=np.int32)

    load = np.zeros(gy + 1)
    seg = _TOTAL_SHEAR / ny
    for r in range(ny):
        load[2 * r] += seg / 6.0
        load[2 * r + 1] += 4.0 * seg / 6.0
        load[2 * r + 2] += seg / 6.0
    load_nodes = np.array([nid(r, gx) for r in range(gy + 1)], dtype=np.int32)
    load_vals = np.stack([np.zeros(gy + 1), load], axis=1)

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
        max_ele_node=8,
    )


def cooks_membrane_mesh_tri3(nx: int = 20, ny: int = 10) -> MeshData:
    """3-node triangle Cook's mesh: each quad of the q4 grid split along its
    (n0, n2) diagonal, CCW node ordering (reference ``shp2d`` nel=3 path,
    collapsed-quad formulation, src/fem_preprocess.py:888-890)."""
    q = cooks_membrane_mesh(nx, ny)
    tris = []
    for n0, n1, n2, n3 in q.conn:
        tris.append((n0, n1, n2))
        tris.append((n0, n2, n3))
    return MeshData(
        coords=q.coords,
        conn=np.asarray(tris, dtype=np.int32),
        bc_nodes=q.bc_nodes,
        bc_flags=q.bc_flags,
        load_nodes=q.load_nodes,
        load_vals=q.load_vals,
        disp_nodes=q.disp_nodes,
        disp_vals=q.disp_vals,
        space_dim=2,
        max_node_dof=2,
        max_ele_node=3,
    )
