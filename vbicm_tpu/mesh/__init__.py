from .feap import MeshData, read_feap_mesh, write_feap_mesh
from .solid3d import beam_hex8_mesh, cube_hex8_mesh
from .cooks import (
    cooks_membrane_mesh,
    cooks_membrane_mesh_q8,
    cooks_membrane_mesh_q9,
    cooks_membrane_mesh_q12,
    cooks_membrane_mesh_q16,
    cooks_membrane_mesh_tri3,
)

__all__ = [
    "MeshData",
    "read_feap_mesh",
    "write_feap_mesh",
    "cooks_membrane_mesh",
    "cooks_membrane_mesh_q8",
    "cooks_membrane_mesh_q9",
    "cooks_membrane_mesh_q12",
    "cooks_membrane_mesh_q16",
    "cooks_membrane_mesh_tri3",
    "beam_hex8_mesh",
    "cube_hex8_mesh",
]
