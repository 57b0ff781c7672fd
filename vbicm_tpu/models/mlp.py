"""Inference / predictive networks.

The reference builds four independent Keras MLPs (3 hidden x 20 relu each,
``main_custom_training.py:128-176``):

  * theta_mean(y), log_theta_sig(y)  — Gaussian posterior q(theta|y)
    with theta_sig = exp(log_theta_sig) (a *variance*),
  * z_mean(y), log_z_sig(y)          — lognormal predictive p(z|y)
    with z_sig = exp(log_z_sig).

Here they are two flax modules (posterior pair / predictive pair) so the
two-step schedule's freeze semantics (``vi_pred_model_step1.trainable =
False``, ``main_custom_training.py:305``) fall out of training separate
param trees rather than flag-flipping. Initialization matches Keras Dense
defaults (glorot-uniform kernels, zero biases) so loss trajectories are
statistically comparable to the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    """Dense relu stack with a linear head (Keras-default init).

    ``zero_head=True`` zero-initializes the output layer's kernel (the
    trunk stays glorot) — used by the full-covariance posterior's
    off-diagonal head so training starts exactly mean-field."""

    hidden: int = 20
    n_layers: int = 3
    out_dim: int = 2
    dtype: jnp.dtype = jnp.float64
    zero_head: bool = False

    @nn.compact
    def __call__(self, x):
        k_init = nn.initializers.glorot_uniform()
        for _ in range(self.n_layers):
            x = nn.Dense(self.hidden, kernel_init=k_init, dtype=self.dtype,
                         param_dtype=self.dtype)(x)
            x = nn.relu(x)
        head_init = nn.initializers.zeros if self.zero_head else k_init
        return nn.Dense(self.out_dim, kernel_init=head_init, dtype=self.dtype,
                        param_dtype=self.dtype)(x)


def _normalize(y, shift, scale, dtype):
    """Optional frozen input standardization (y - mean)/std baked into the
    net as CONSTANTS (not parameters): the amortized maps train poorly on
    unnormalized inputs spanning decades (the analytic case-3 y1 reaches
    ~30), and the reference's own ``standardize_data`` helper exists for
    exactly this (``src/data_generation_2sam_more_loss.py:208-212``) even
    though its FEM case never needs it. ``None`` (default) is a no-op —
    reference-parity configurations are unaffected."""
    if shift is None:
        return y
    return (y - jnp.asarray(shift, dtype)) / jnp.asarray(scale, dtype)


class ThetaPosteriorNet(nn.Module):
    """q(theta|y): returns (theta_mean, theta_sig, log_theta_sig)."""

    hidden: int = 20
    n_layers: int = 3
    theta_dim: int = 2
    dtype: jnp.dtype = jnp.float64
    y_shift: tuple = None
    y_scale: tuple = None

    @nn.compact
    def __call__(self, y):
        y = _normalize(y, self.y_shift, self.y_scale, self.dtype)
        theta_mean = MLP(self.hidden, self.n_layers, self.theta_dim, self.dtype,
                         name="theta_mean_net")(y)
        log_theta_sig = MLP(self.hidden, self.n_layers, self.theta_dim, self.dtype,
                            name="theta_sig_net")(y)
        return theta_mean, jnp.exp(log_theta_sig), log_theta_sig


class ThetaPosteriorFullCovNet(nn.Module):
    """q(theta|y) = N(mu(y), L(y) L(y)^T): full-covariance amortized
    posterior — returns (theta_mean, L, log_diag).

    Beyond the reference (independent Gaussians per dim,
    ``main_custom_training.py:128-176``): on correlated posteriors the
    mean-field optimum matches the precision diagonal, so its marginal
    stds UNDERestimate truth (measured VI/MC std ratios down to 0.01 on
    the sharp-likelihood random-field family); a Cholesky head removes
    that gap while keeping the reparameterization trick exact
    (theta = mu + L e). L's diagonal is exp(0.5 * log_diag) — the same
    squared-scale parameterization (and underflow-safe chain rule) as the
    mean-field head. The strictly-lower-triangular head is ZERO-initialized
    so training starts at the mean-field init and learns correlations only
    as the data demand them.
    """

    hidden: int = 20
    n_layers: int = 3
    theta_dim: int = 2
    dtype: jnp.dtype = jnp.float64
    y_shift: tuple = None
    y_scale: tuple = None

    @nn.compact
    def __call__(self, y):
        y = _normalize(y, self.y_shift, self.y_scale, self.dtype)
        d = self.theta_dim
        theta_mean = MLP(self.hidden, self.n_layers, d, self.dtype,
                         name="theta_mean_net")(y)
        log_diag = MLP(self.hidden, self.n_layers, d, self.dtype,
                       name="theta_sig_net")(y)
        n_off = d * (d - 1) // 2
        off = MLP(self.hidden, self.n_layers, n_off, self.dtype,
                  zero_head=True, name="theta_offdiag_net")(y)
        il, jl = jnp.tril_indices(d, -1)
        L = jnp.zeros((*off.shape[:-1], d, d), self.dtype)
        L = L.at[..., il, jl].set(off)
        diag = jnp.exp(0.5 * log_diag)
        L = L.at[..., jnp.arange(d), jnp.arange(d)].set(diag)
        return theta_mean, L, log_diag


def marginal_variance(L):
    """Per-dim marginal variances diag(L L^T) of the full-covariance q."""
    return jnp.sum(L**2, axis=-1)


class ZPredictiveNet(nn.Module):
    """p(z|y) lognormal: returns (z_mean, z_sig, log_z_sig)."""

    hidden: int = 20
    n_layers: int = 3
    z_dim: int = 2
    dtype: jnp.dtype = jnp.float64
    y_shift: tuple = None
    y_scale: tuple = None

    @nn.compact
    def __call__(self, y):
        y = _normalize(y, self.y_shift, self.y_scale, self.dtype)
        z_mean = MLP(self.hidden, self.n_layers, self.z_dim, self.dtype,
                     name="z_mean_net")(y)
        log_z_sig = MLP(self.hidden, self.n_layers, self.z_dim, self.dtype,
                        name="z_sig_net")(y)
        return z_mean, jnp.exp(log_z_sig), log_z_sig


def init_vi_networks(key, y_dim=2, theta_dim=2, z_dim=2, hidden=20,
                     n_layers1=3, n_layers2=3, dtype=jnp.float64):
    """Initialize both nets; returns (theta_net, theta_params, z_net, z_params)."""
    k1, k2 = jax.random.split(key)
    dummy = jnp.zeros((1, y_dim), dtype)
    theta_net = ThetaPosteriorNet(hidden, n_layers1, theta_dim, dtype)
    z_net = ZPredictiveNet(hidden, n_layers2, z_dim, dtype)
    return (
        theta_net,
        theta_net.init(k1, dummy),
        z_net,
        z_net.init(k2, dummy),
    )
