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
