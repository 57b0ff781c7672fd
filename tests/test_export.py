"""AOT serving export (utils.export / jax.export): round-trip parity,
batch polymorphism, and export of the differentiable FEM operator itself.

Deployment surface beyond the reference (whose serving = load Keras .h5 in
a TF process, ``main_postprocess.py:26-45``): a single StableHLO blob that
re-executes without any package code.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vbicm_tpu.config import ProblemConfig
from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.models.mlp import init_vi_networks
from vbicm_tpu.solver import make_fh_fun
from vbicm_tpu.utils.export import (
    export_fn,
    load_exported,
    make_vi_server,
    save_exported,
)


def test_vi_server_roundtrip(tmp_path):
    """serve(y) == deserialize(serialize(serve))(y), through a file."""
    tn, tp, zn, zp = init_vi_networks(jax.random.PRNGKey(0))
    serve = make_vi_server(tn, tp, zn, zp)
    y = jnp.asarray(np.random.default_rng(0).standard_normal((5, 2)))
    ref = serve(y)
    path = str(tmp_path / "model.stablehlo")
    save_exported(path, serve, y)
    out = load_exported(path)(y)
    assert set(out) == set(ref)
    for k in ref:
        # AOT lowering may fuse differently from the in-process jit: allow
        # 1-ULP drift (measured 2.2e-16 on one element)
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=5e-16, atol=0
        )
    # physical-space lognormal moments are consistent with log-space ones
    z = np.exp(
        np.asarray(ref["logz_mean"])
        + 0.5 * np.asarray(ref["logz_sig"]) ** 2
    )
    np.testing.assert_allclose(np.asarray(ref["z_mean"]), z, rtol=1e-12)


def test_batch_polymorphic_export():
    """One artifact, any request size: exported with a symbolic batch dim,
    executed at batch 1, 3, and 17."""
    tn, tp, zn, zp = init_vi_networks(jax.random.PRNGKey(1))
    serve = make_vi_server(tn, tp, zn, zp)
    example = jnp.zeros((4, 2))
    blob = export_fn(serve, example, batch_polymorphic=True)
    call = load_exported(blob)
    for b in (1, 3, 17):
        y = jnp.asarray(np.random.default_rng(b).standard_normal((b, 2)))
        out = call(y)
        ref = serve(y)
        assert out["theta_mean"].shape == (b, 2)
        np.testing.assert_allclose(
            np.asarray(out["z_std"]), np.asarray(ref["z_std"]), rtol=1e-14
        )


def test_export_fem_operator():
    """The full differentiable FEM observation operator — assembly,
    spectral solve with custom adjoint, von Mises probes — exports and
    round-trips as one batched StableHLO artifact; its exported GRADIENT
    (through the custom-VJP solve) matches the in-process one."""
    model = build_fem_model(cooks_membrane_mesh(8, 4), dense=True)
    cfg = ProblemConfig(node_id=40, ele_id=5)
    fh = make_fh_fun(model, cfg)

    def batched(theta):
        y, h = jax.vmap(fh)(theta)
        return y, h

    th = jnp.asarray(np.random.default_rng(2).standard_normal((6, 2)))
    y_ref, h_ref = batched(th)
    call = load_exported(export_fn(batched, th, batch_polymorphic=True))
    y_out, h_out = call(th)
    np.testing.assert_allclose(np.asarray(y_out), np.asarray(y_ref), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(h_out), np.asarray(h_ref), rtol=1e-14)
    # different batch size through the same artifact
    th3 = th[:3]
    y3, _ = call(th3)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y_ref[:3]), rtol=1e-14)

    def loss_grad(theta):
        def loss(t):
            y, h = jax.vmap(fh)(t)
            return jnp.sum(y**2) + jnp.sum(h)

        return jax.value_and_grad(loss)(theta)

    v_ref, g_ref = loss_grad(th)
    gcall = load_exported(export_fn(loss_grad, th))
    v_out, g_out = gcall(th)
    np.testing.assert_allclose(float(v_out), float(v_ref), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), rtol=1e-13)
