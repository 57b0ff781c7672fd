"""Closed-form toy forward maps for 1-D/2-D validation cases.

Ports of the reference's cheap test fixtures
(``src/data_generation.py:25-96``, ``src/data_generation_2sam_more_loss.py:214-253``):
case 1 (linear), case 2 (quadratic observation / exponential prediction),
case 3 (2-D). They exercise the VI machinery without a FEM solve.
"""
from __future__ import annotations

import jax.numpy as jnp


def h_fun_1d_case1(theta):
    return 3.0 * theta


def f_fun_1d_case1(theta):
    return 2.0 * theta


def h_fun_1d_case2(theta):
    return jnp.exp(theta) + 0.2


def f_fun_1d_case2(theta):
    return 2.0 * theta**2 + 2.0


def f_fun_2d_case3(x):
    f1 = 2.0 * x[..., 0] ** 2 + 2.0
    f2 = x[..., 1] ** 4 + x[..., 1] + 1.0
    return jnp.stack([f1, f2], axis=-1)


def h_fun_2d_case3(x):
    h1 = jnp.exp(x[..., 0]) + 0.2
    h2 = jnp.exp(x[..., 1]) + 0.1
    return jnp.stack([h1, h2], axis=-1)


def generate_data_1d(key, n_sam: int, sig_e: float, sig_eta: float):
    """1-D linear case dataset (reference ``generate_data_1d``)."""
    import jax

    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.normal(k1, (n_sam, 1))
    y = 2.0 * theta + jnp.sqrt(sig_e) * jax.random.normal(k2, (n_sam, 1))
    z = 3.0 * theta + jnp.sqrt(sig_eta) * jax.random.normal(k3, (n_sam, 1))
    return y, z, theta


def _analytic_dataset(key, f_fun, h_fun, n_sam, d_theta, sig_e, sig_eta, ne_sam):
    """Shared generator: theta ~ N(0, I), y = f + e, z = h + eta, plus the
    fixed reparameterization seeds (e_data) the training reuses as common
    random numbers — same structure as the FEM dataset generator
    (``src/data_generation.py:59-78`` with the 2sam e_data convention)."""
    import jax
    import numpy as np

    from .datagen import MeasurementDataset

    k1, k2, k3, k4 = jax.random.split(key, 4)
    theta = jax.random.normal(k1, (n_sam, d_theta))
    f = f_fun(theta)
    h = h_fun(theta)
    y = np.asarray(f + jnp.sqrt(sig_e) * jax.random.normal(k2, f.shape))
    z = np.asarray(h + jnp.sqrt(sig_eta) * jax.random.normal(k3, h.shape))
    if (z <= 0.0).any():
        floor = float(z[z > 0.0].min()) if (z > 0.0).any() else 1e-12
        z = np.where(z > 0.0, z, floor)
    e_data = np.asarray(jax.random.normal(k4, (ne_sam, d_theta)))
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


def generate_data_1d_case2(key, n_sam: int, *, sig_e: float = 0.1,
                           sig_eta: float = 3e-3, ne_sam: int = 4):
    """1-D case-2 dataset (reference ``generate_data_1d_case2``,
    ``src/data_generation.py:42-57``): quadratic observation, exponential
    prediction. Full MeasurementDataset (HDF5-compatible via datagen)."""
    return _analytic_dataset(
        key, f_fun_1d_case2, h_fun_1d_case2, n_sam, 1, sig_e, sig_eta, ne_sam
    )


def generate_data_2d_case3(key, n_sam: int, *, sig_e: float = 0.1,
                           sig_eta: float = 3e-3, ne_sam: int = 4):
    """2-D case-3 dataset (reference ``generate_data_2d_case3``,
    ``src/data_generation.py:59-78``): f = (2x1^2+2, x2^4+x2+1),
    h = (e^x1+0.2, e^x2+0.1)."""
    return _analytic_dataset(
        key, f_fun_2d_case3, h_fun_2d_case3, n_sam, 2, sig_e, sig_eta, ne_sam
    )
