import os

# Tests run on a virtual 8-device CPU mesh (the standard way to exercise
# jax.sharding without TPU hardware) and in float64 parity mode.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon site customization pins jax_platforms to "axon,cpu"; the env var
# alone is not enough — force CPU explicitly so tests run on the virtual
# 8-device CPU mesh regardless of the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


REFERENCE_MESH = "/root/reference/Armero_cooksm_20x10.txt"


@pytest.fixture(scope="session")
def cooks_mesh():
    # Generated mesh is the canonical source; a dedicated test asserts it is
    # identical to the shipped FEAP file when the reference mount exists.
    from vbicm_tpu.mesh import cooks_membrane_mesh

    return cooks_membrane_mesh(20, 10)


@pytest.fixture(scope="session")
def cooks_model(cooks_mesh):
    from vbicm_tpu.model import build_fem_model

    return build_fem_model(cooks_mesh)


@pytest.fixture(scope="session")
def golden():
    import json

    with open(os.path.join(os.path.dirname(__file__), "fixtures", "reference_golden.json")) as f:
        return json.load(f)
