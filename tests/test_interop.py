"""Checkpoint interop with the reference's Keras HDF5 format, both ways."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vbicm_tpu.models.mlp import init_vi_networks


def test_keras_export_roundtrip(tmp_path):
    """export_keras_checkpoint -> load_theta_params/load_z_params is exact."""
    from vbicm_tpu.eval.reference_ckpt import (
        export_keras_checkpoint,
        load_theta_params,
        load_z_params,
    )

    tnet, tp, znet, zp = init_vi_networks(jax.random.PRNGKey(3))
    p1 = str(tmp_path / "step1.h5")
    export_keras_checkpoint(p1, tp)
    tp2 = load_theta_params(p1)
    y = jnp.asarray(np.random.default_rng(0).normal(size=(5, 2)))
    np.testing.assert_allclose(
        np.asarray(tnet.apply(tp, y)[0]), np.asarray(tnet.apply(tp2, y)[0]), rtol=0, atol=0
    )

    p2 = str(tmp_path / "step2.h5")
    export_keras_checkpoint(p2, tp, zp)
    zp2 = load_z_params(p2)
    np.testing.assert_allclose(
        np.asarray(znet.apply(zp, y)[0]), np.asarray(znet.apply(zp2, y)[0]), rtol=0, atol=0
    )


def test_keras_export_loads_in_tensorflow(tmp_path):
    """The exported h5 drives an equivalent tf.keras model bit-for-bit
    (load_weights by_name — full load_model of the reference's own files
    needs its TF 2.13 TFOpLambda, absent from modern keras)."""
    tf = pytest.importorskip("tensorflow")

    from vbicm_tpu.eval.reference_ckpt import export_keras_checkpoint

    tnet, tp, _, _ = init_vi_networks(jax.random.PRNGKey(3))
    path = str(tmp_path / "step1.h5")
    export_keras_checkpoint(path, tp)

    tf.keras.backend.set_floatx("float64")
    from tensorflow.keras.layers import Dense, Input

    y_in = Input(shape=(2,))
    h = y_in
    for n in ("dense", "dense_1", "dense_2"):
        h = Dense(20, activation="relu", name=n)(h)
    tm = Dense(2, name="dense_3")(h)
    h2 = y_in
    for n in ("dense_4", "dense_5", "dense_6"):
        h2 = Dense(20, activation="relu", name=n)(h2)
    ls = Dense(2, name="dense_7")(h2)
    m = tf.keras.Model(y_in, [tm, ls])
    m.load_weights(path, by_name=True)

    yv = np.random.default_rng(0).normal(size=(5, 2))
    tm_tf, ls_tf = m.predict(yv, verbose=0)
    tm_j, _, ls_j = tnet.apply(tp, jnp.asarray(yv))
    np.testing.assert_allclose(tm_tf, np.asarray(tm_j), atol=1e-14)
    np.testing.assert_allclose(ls_tf, np.asarray(ls_j), atol=1e-14)
