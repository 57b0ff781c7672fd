"""Load the reference's shipped Keras checkpoints into our flax param trees.

The reference saves its VI nets as Keras HDF5 models
(``main_custom_training.py:282-283,416-417``; files under
``results_2steps_proposed{1,2}/`` and ``results_method1/``). Layer layout
(creation order, ``main_custom_training.py:128-176``):

  * theta-mean MLP: ``dense`` (2x20), ``dense_1``, ``dense_2`` hidden,
    ``dense_3`` (20x2) head;
  * theta-log-sig MLP: ``dense_4..6`` hidden, ``dense_7`` head;
  * z-mean MLP: ``z_mean_dense0..2`` hidden, ``z_mean`` head;
  * z-log-sig MLP: ``z_sig_dense0..2`` hidden, ``log_z_sig`` head.

Loading these gives a DETERMINISTIC parity oracle: evaluating our ELBO on
the reference's trained weights yields the loss value its training actually
achieved (the per-epoch history entries are single last-batch draws with
huge variance — reference step-1 history ranges 1.45..5.96).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def _dense(f, name):
    g = f["model_weights"][name][name]
    return (
        np.array(g["kernel:0"], dtype=np.float64),
        np.array(g["bias:0"], dtype=np.float64),
    )


def _mlp_params(f, layer_names, dtype):
    p = {}
    for i, name in enumerate(layer_names):
        k, b = _dense(f, name)
        p[f"Dense_{i}"] = {"kernel": jnp.asarray(k, dtype), "bias": jnp.asarray(b, dtype)}
    return p


def load_theta_params(path: str, dtype=jnp.float64):
    """Keras step-1 checkpoint -> flax params for ``ThetaPosteriorNet``."""
    if h5py is None:
        raise RuntimeError("h5py unavailable")
    with h5py.File(path, "r") as f:
        mean = _mlp_params(f, ["dense", "dense_1", "dense_2", "dense_3"], dtype)
        sig = _mlp_params(f, ["dense_4", "dense_5", "dense_6", "dense_7"], dtype)
    return {"params": {"theta_mean_net": mean, "theta_sig_net": sig}}


def load_z_params(path: str, dtype=jnp.float64):
    """Keras step-2 checkpoint -> flax params for ``ZPredictiveNet``.

    Handles both naming schemes found in the shipped results: explicit
    ``z_mean_dense0..`` names (final/intermediate step-2 models) and the
    anonymous continuation ``dense_8..15`` (older saves), probed in order.
    """
    if h5py is None:
        raise RuntimeError("h5py unavailable")
    with h5py.File(path, "r") as f:
        names = set(f["model_weights"].keys())
        if "z_mean_dense0" in names:
            zm = ["z_mean_dense0", "z_mean_dense1", "z_mean_dense2", "z_mean"]
            zs = ["z_sig_dense0", "z_sig_dense1", "z_sig_dense2", "log_z_sig"]
        elif "dense_8" in names:
            zm = ["dense_8", "dense_9", "dense_10", "dense_11"]
            zs = ["dense_12", "dense_13", "dense_14", "dense_15"]
        else:  # pragma: no cover
            raise ValueError(f"unrecognized z-net layer names in {path}: {sorted(names)}")
        mean = _mlp_params(f, zm, dtype)
        sig = _mlp_params(f, zs, dtype)
    return {"params": {"z_mean_net": mean, "z_sig_net": sig}}


def _write_mlp(f, layer_names, params):
    for i, name in enumerate(layer_names):
        g = f["model_weights"][name][name]
        p = params[f"Dense_{i}"]
        g["kernel:0"][...] = np.asarray(p["kernel"], dtype=g["kernel:0"].dtype)
        g["bias:0"][...] = np.asarray(p["bias"], dtype=g["bias:0"].dtype)


def export_keras_checkpoint(
    out_path: str,
    theta_params,
    z_params=None,
    *,
    template: Optional[str] = None,
):
    """Write our flax params as a Keras HDF5 checkpoint the REFERENCE's own
    scripts can load (``main_postprocess.py:50-56`` loads these with
    ``tf.keras.models.load_model``) — interop in the reverse direction of
    :func:`load_theta_params`.

    The reference's shipped file is copied as the architecture template
    (model_config / layer attrs stay valid) and only the weight datasets are
    overwritten. With ``z_params`` the step-2 template (16 layers) is used,
    else the step-1 one.
    """
    import shutil

    if h5py is None:
        raise RuntimeError("h5py unavailable")
    ref_root = "/root/reference/results_2steps_proposed1"
    if template is None:
        template = (
            f"{ref_root}/step2/final_model_step2.h5"
            if z_params is not None
            else f"{ref_root}/step1/19-3.81684013.h5"
        )
    shutil.copyfile(template, out_path)
    with h5py.File(out_path, "r+") as f:
        p = theta_params["params"]
        _write_mlp(f, ["dense", "dense_1", "dense_2", "dense_3"], p["theta_mean_net"])
        _write_mlp(f, ["dense_4", "dense_5", "dense_6", "dense_7"], p["theta_sig_net"])
        if z_params is not None:
            zp = z_params["params"]
            _write_mlp(f, ["z_mean_dense0", "z_mean_dense1", "z_mean_dense2", "z_mean"],
                       zp["z_mean_net"])
            _write_mlp(f, ["z_sig_dense0", "z_sig_dense1", "z_sig_dense2", "log_z_sig"],
                       zp["z_sig_net"])


def load_temp_data_moments(path: str):
    """Read the reference's cached posterior log-z moments (``temp_data.mat``,
    MATLAB v5 format; keys ``logz_mean_post/logz_sig_post (n,2)`` written by
    the step-1->2 bridge, ``main_custom_training.py:310-328``)."""
    import scipy.io as sio

    d = sio.loadmat(path)
    return (
        np.asarray(d["logz_mean_post"], dtype=np.float64),
        np.asarray(d["logz_sig_post"], dtype=np.float64),
    )
