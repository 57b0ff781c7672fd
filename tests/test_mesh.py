import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_MESH
from vbicm_tpu.mesh import cooks_membrane_mesh, read_feap_mesh


def test_generator_shapes():
    m = cooks_membrane_mesh(20, 10)
    assert m.nnodes == 231
    assert m.nele == 200
    assert m.bc_nodes.shape[0] == 11
    assert m.load_nodes.shape[0] == 11
    # corners of Cook's membrane
    np.testing.assert_allclose(m.coords[0], [0.0, 0.0])
    np.testing.assert_allclose(m.coords[20], [48.0, 44.0])
    np.testing.assert_allclose(m.coords[230], [48.0, 60.0])
    np.testing.assert_allclose(m.coords[210], [0.0, 44.0])
    # total load = 50 in +y
    np.testing.assert_allclose(m.load_vals[:, 1].sum(), 50.0)
    np.testing.assert_allclose(m.load_vals[:, 0], 0.0)


@pytest.mark.skipif(not os.path.exists(REFERENCE_MESH), reason="reference mount absent")
def test_parser_matches_generator():
    parsed = read_feap_mesh(REFERENCE_MESH)
    gen = cooks_membrane_mesh(20, 10)
    np.testing.assert_allclose(parsed.coords, gen.coords, atol=1e-12)
    np.testing.assert_array_equal(parsed.conn, gen.conn)
    np.testing.assert_array_equal(np.sort(parsed.bc_nodes), np.sort(gen.bc_nodes))
    # load vector agreement (file carries ~1e-15 x-noise entries)
    f_parsed = np.zeros(parsed.nnodes * 2)
    for n, v in zip(parsed.load_nodes, parsed.load_vals):
        f_parsed[2 * n] += v[0]
        f_parsed[2 * n + 1] += v[1]
    f_gen = np.zeros(gen.nnodes * 2)
    for n, v in zip(gen.load_nodes, gen.load_vals):
        f_gen[2 * n] += v[0]
        f_gen[2 * n + 1] += v[1]
    np.testing.assert_allclose(f_parsed, f_gen, atol=1e-12)


def test_scaled_mesh():
    m = cooks_membrane_mesh(160, 80)
    assert m.nnodes == 161 * 81
    assert m.nele == 160 * 80
    np.testing.assert_allclose(m.load_vals[:, 1].sum(), 50.0)
    np.testing.assert_allclose(m.coords[-1], [48.0, 60.0])


def test_feap_writer_roundtrip_all_families(tmp_path):
    """write_feap_mesh -> read_feap_mesh is lossless for every element
    family, including disp-controlled meshes."""
    import dataclasses

    from vbicm_tpu.mesh import (
        cooks_membrane_mesh,
        cooks_membrane_mesh_q8,
        cooks_membrane_mesh_q9,
        cooks_membrane_mesh_q12,
        cooks_membrane_mesh_q16,
        read_feap_mesh,
        write_feap_mesh,
    )

    meshes = [
        cooks_membrane_mesh(6, 3),
        cooks_membrane_mesh_q8(3, 2),
        cooks_membrane_mesh_q9(3, 2),
        cooks_membrane_mesh_q12(2, 1),
        cooks_membrane_mesh_q16(2, 1),
    ]
    # a disp-controlled variant too
    m0 = meshes[0]
    meshes.append(dataclasses.replace(
        m0,
        load_nodes=np.zeros((0,), dtype=np.int32),
        load_vals=np.zeros((0, 2)),
        disp_nodes=np.array([6], dtype=np.int32),
        disp_vals=np.array([[0.01, 0.02]]),
    ))
    for k, mesh in enumerate(meshes):
        p = str(tmp_path / f"m{k}.txt")
        write_feap_mesh(p, mesh)
        back = read_feap_mesh(p)
        np.testing.assert_allclose(back.coords, mesh.coords, rtol=1e-15)
        np.testing.assert_array_equal(back.conn, mesh.conn)
        np.testing.assert_array_equal(back.bc_nodes, mesh.bc_nodes)
        np.testing.assert_array_equal(back.bc_flags, mesh.bc_flags)
        np.testing.assert_array_equal(back.load_nodes, mesh.load_nodes)
        np.testing.assert_allclose(back.load_vals, mesh.load_vals, rtol=1e-15)
        np.testing.assert_array_equal(back.disp_nodes, mesh.disp_nodes)
        np.testing.assert_allclose(back.disp_vals, mesh.disp_vals, rtol=1e-15)
