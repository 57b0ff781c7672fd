"""Dataset generation for the FEM inverse problem + HDF5 I/O.

Rebuild of ``MeasurementData`` (``src/data_generation_2sam_more_loss.py``):
draw theta ~ N(0, I), push the whole batch through the vmapped FEM
observation operator in one shot (the reference threads 12-wide through
``tf.map_fn``; here it is a single jitted batched solve, shardable across
chips), add measurement/prediction noise, and persist the reference's HDF5
layout — including the fixed reparameterization seeds ``e_data`` (common
random numbers reused at train time, "Eq. 21").

Quirk preserved deliberately: the reference's ``save_data`` writes the RAW
arrays into the ``*_scaled_data`` fields (``:256-268``); we do the same so
files interoperate, and expose :func:`standardize` for users who want the
actual scaling.

The loader accepts both this module's files and the reference's shipped
``data_fem_test_big_noise.h5`` (hdf5storage writes MATLAB-ordered, i.e.
transposed, datasets — detected and fixed on read).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


@dataclasses.dataclass
class MeasurementDataset:
    y_data: np.ndarray  # (n_sam, d_y)
    z_data: np.ndarray  # (n_sam, d_z)
    log_z_data: np.ndarray  # (n_sam, d_z)
    e_data: np.ndarray  # (ne_sam, d_theta) fixed reparameterization seeds
    y_mean: np.ndarray  # (1, d_y)
    y_std: np.ndarray
    z_mean: np.ndarray
    z_std: np.ndarray
    theta_data: Optional[np.ndarray] = None  # (n_sam, d_theta) latent truth

    @property
    def n_sam(self) -> int:
        return int(self.y_data.shape[0])

    @property
    def ne_sam(self) -> int:
        return int(self.e_data.shape[0])


def standardize(x, mean, std):
    """(x - mean) / std (reference ``standardize_data``)."""
    return (x - mean) / std


def generate_data_fem(
    key: jax.Array,
    batch_fh: Callable,
    *,
    n_sam: int,
    ne_sam: int,
    d_y: int = 2,
    d_z: int = 2,
    d_theta: int = 2,
    sig_e: float = 1e-1,
    sig_eta: float = 3e-3,
    chunk: Optional[int] = None,
) -> MeasurementDataset:
    """Generate the (y, z) dataset through the batched FEM map.

    batch_fh: ``thetas (B, d_theta) -> (y (B, d_y), h (B, d_z))`` — typically
    ``jax.jit(jax.vmap(make_fh_fun(model)))`` or its sharded variant.
    ``chunk`` bounds device memory for very large n_sam.
    """
    k_th, k_e, k_eta, k_seed = jax.random.split(key, 4)
    theta = jax.random.normal(k_th, (n_sam, d_theta))
    if chunk is None or chunk >= n_sam:
        f_clean, h_clean = batch_fh(theta)
    else:
        fs, hs = [], []
        for i in range(0, n_sam, chunk):
            f_i, h_i = batch_fh(theta[i : i + chunk])
            fs.append(f_i)
            hs.append(h_i)
        f_clean = jnp.concatenate(fs)
        h_clean = jnp.concatenate(hs)

    err = jnp.sqrt(sig_e) * jax.random.normal(k_e, (n_sam, d_y))
    eta = jnp.sqrt(sig_eta) * jax.random.normal(k_eta, (n_sam, d_z))
    y = np.asarray(f_clean + err)
    z = np.asarray(h_clean + eta)
    if (z <= 0.0).any():
        # z = h + eta can go nonpositive when the noise scale rivals the
        # stress signal (coarse meshes / tiny test problems); log(z) would
        # silently store NaNs that poison downstream lognormal fits. Clamp
        # to the smallest positive z and say so.
        import warnings

        nbad = int((z <= 0.0).sum())
        floor = float(z[z > 0.0].min()) if (z > 0.0).any() else 1e-12
        warnings.warn(
            f"{nbad} z samples were nonpositive after adding noise "
            f"(sig_eta={sig_eta}); clamped to {floor:.3e} before log"
        )
        z = np.where(z > 0.0, z, floor)
    e_data = np.asarray(jax.random.normal(k_seed, (ne_sam, d_theta)))

    return MeasurementDataset(
        y_data=y,
        z_data=z,
        log_z_data=np.log(z),
        e_data=e_data,
        y_mean=y.mean(axis=0, keepdims=True),
        y_std=y.std(axis=0, keepdims=True),
        z_mean=z.mean(axis=0, keepdims=True),
        z_std=z.std(axis=0, keepdims=True),
        theta_data=np.asarray(theta),
    )


def save_dataset(ds: MeasurementDataset, path: str) -> None:
    """Write the reference's HDF5 field layout (``save_data``, ``:256-268``)."""
    if h5py is None:
        raise RuntimeError("h5py unavailable")
    with h5py.File(path, "w") as f:
        f["y_data"] = ds.y_data
        f["y_scaled_data"] = ds.y_data  # reference quirk: raw, not scaled
        f["z_data"] = ds.z_data
        f["log_z_data"] = ds.log_z_data
        f["z_scaled_data"] = ds.z_data  # reference quirk
        f["y_mean"] = ds.y_mean
        f["y_std"] = ds.y_std
        f["z_mean"] = ds.z_mean
        f["z_std"] = ds.z_std
        f["e_data"] = ds.e_data
        if ds.theta_data is not None:
            f["theta_data"] = ds.theta_data


def load_dataset(path: str) -> MeasurementDataset:
    """Load ours or the reference's shipped dataset file.

    hdf5storage (used by the reference) writes MATLAB-format files: every
    dataset carries a ``MATLAB_class`` attribute and is stored transposed
    (column-major). Detect that per-dataset and undo it.
    """
    if h5py is None:
        raise RuntimeError("h5py unavailable")
    with h5py.File(path, "r") as f:
        def get(k):
            d = f[k]
            a = np.asarray(d)
            if a.ndim == 2 and "MATLAB_class" in d.attrs:
                a = a.T
            return a
        y = get("y_data")
        z = get("z_data")
        logz = get("log_z_data") if "log_z_data" in f else np.log(z)
        e = get("e_data")
        ym = np.asarray(f["y_mean"]).reshape(1, -1)
        ys = np.asarray(f["y_std"]).reshape(1, -1)
        zm = np.asarray(f["z_mean"]).reshape(1, -1)
        zs = np.asarray(f["z_std"]).reshape(1, -1)
        th = get("theta_data") if "theta_data" in f else None
    return MeasurementDataset(
        y_data=y,
        z_data=z,
        log_z_data=logz,
        e_data=e,
        y_mean=ym,
        y_std=ys,
        z_mean=zm,
        z_std=zs,
        theta_data=th,
    )
