import os

# Tests run on a virtual 8-device CPU mesh (the standard way to exercise
# jax.sharding without TPU hardware) and in float64 parity mode.
#
# VBICM_TEST_PLATFORM=tpu switches the suite onto the real chip (the axon
# tunnel) — the on-TPU lane for the curated fast subset
# (`pytest -m tpu_lane`), catching the TPU-only numerics class CPU tests
# are blind to (docs/KNOWN_ISSUES.md: bf16 batched contractions, scatter
# lowering, converged-lane CG). Anything else keeps full CPU parity.
_PLATFORM = os.environ.get("VBICM_TEST_PLATFORM", "cpu")
if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if _PLATFORM == "cpu":
    # The axon site customization pins jax_platforms to "axon,cpu"; the env
    # var alone is not enough — force CPU explicitly so tests run on the
    # virtual 8-device CPU mesh regardless of the TPU tunnel.
    jax.config.update("jax_platforms", "cpu")
else:
    # On-chip lane: compiles go through the axon remote-compile relay
    # (30-300 s cold). The persistent cache removes recompiles, but warm
    # lane runs still spend ~5-6 min wall (measured r4/r5: 346 s — eager
    # dispatch over the tunnel dominates, not compiles); the lane result +
    # wall time is recorded to results_tpu_lane/summary.json each run and
    # surfaced by bench.py as tpu_lane_* fields.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


REFERENCE_MESH = "/root/reference/Armero_cooksm_20x10.txt"


def pytest_collection_modifyitems(config, items):
    """On the TPU lane run ONLY tests marked tpu_lane (the curated ~6-min
    subset — multi-device sharding tests would need 8 chips); on CPU run
    everything."""
    if _PLATFORM == "cpu":
        return
    skip = pytest.mark.skip(reason="not in the curated on-TPU lane")
    for item in items:
        if "tpu_lane" not in item.keywords:
            item.add_marker(skip)


def pytest_sessionfinish(session, exitstatus):
    """Record each on-chip lane run (pass/fail, test count, wall time) to
    results_tpu_lane/summary.json so bench.py can surface it as tpu_lane_*
    fields every round (round-4 verdict item 4)."""
    if _PLATFORM == "cpu":
        return
    import datetime
    import json
    import time as _time

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(root, "results_tpu_lane")
    os.makedirs(outdir, exist_ok=True)
    start = getattr(session.config, "_vbicm_lane_start", None)
    tr = session.config.pluginmanager.get_plugin("terminalreporter")
    stats = getattr(tr, "stats", {}) if tr else {}
    rec = {
        "passed": int(exitstatus) == 0,
        "exitstatus": int(exitstatus),
        "tests": len(stats.get("passed", [])),
        "failed": len(stats.get("failed", [])),
        "collected": int(session.testscollected),
        "wall_s": round(_time.time() - start, 1) if start else None,
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
    }
    with open(os.path.join(outdir, "summary.json"), "w") as f:
        json.dump(rec, f, indent=1)


def pytest_sessionstart(session):
    if _PLATFORM != "cpu":
        import time as _time

        session.config._vbicm_lane_start = _time.time()


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
