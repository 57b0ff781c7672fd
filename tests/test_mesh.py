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
