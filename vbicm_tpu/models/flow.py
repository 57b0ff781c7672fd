"""Conditional normalizing-flow amortized posterior q(theta|y).

Third posterior family, beyond the reference's independent Gaussians
(``main_custom_training.py:128-176``) and the full-covariance Cholesky head
(``models.mlp.ThetaPosteriorFullCovNet``):

  * the mean-field head cannot represent CORRELATION (round-2/3 finding:
    its optimum matches the precision diagonal);
  * the fullcov head removes that, but both are GAUSSIAN — a curved or
    skewed posterior (any nonlinear forward map with a weakly identified
    parameter, e.g. the power-law material or a banana-shaped
    theta2 + a*theta1^2 observable) is outside the family no matter how
    the moments are fit.

This module stacks conditional affine coupling layers (RealNVP-style) on
top of the mean-field base:

    theta_0 = mu(y) + exp(0.5 * log_sig(y)) * e,      e ~ N(0, I)
    theta_{k+1}[passive] = theta_k[passive] * exp(s_k) + t_k,
        (s_k, t_k) = MLP_k([theta_k * mask_k, y_norm])

with the active/passive split alternating across layers. The log-density
is exact by the change of variables:

    log q(theta|y) = log N(e) - 0.5 * sum(log_sig) - sum_k sum(s_k),

so the reparameterized ELBO stays a plain Monte-Carlo average — no
density estimation, no discriminators. TPU notes: every layer is a small
dense matmul over the (B*ne) sample batch (MXU-friendly), control flow is
a static Python loop over ``n_couplings`` (unrolled at trace time), and
the scale outputs are tanh-bounded by ``s_cap`` so one bad batch cannot
produce an exp overflow inside jit.

The coupling heads are ZERO-initialized: at init every coupling is the
identity and the flow IS the mean-field posterior — training starts from
reference-parity behavior and buys expressiveness only as the data demand
it (same design as the fullcov head's zero off-diagonal init).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .mlp import MLP, _normalize


class ThetaPosteriorFlowNet(nn.Module):
    """q(theta|y) as a conditional affine-coupling flow.

    ``__call__(y, e) -> (theta, logq)`` with ``y (B, d_y)``, base draws
    ``e (ne, d_theta)`` (the dataset's common-random-number convention):
    ``theta (B, ne, d_theta)``, ``logq (B, ne)`` the exact log-density of
    each sample under q(.|y_b).

    ``base(y) -> (mu, log_sig)`` exposes the mean-field base heads (the
    flow at init equals ``mu + exp(0.5*log_sig) * e`` exactly).
    """

    hidden: int = 20
    n_layers: int = 3
    theta_dim: int = 2
    dtype: jnp.dtype = jnp.float64
    y_shift: tuple = None
    y_scale: tuple = None
    n_couplings: int = 4
    s_cap: float = 3.0

    def setup(self):
        if self.theta_dim < 2:
            raise ValueError(
                "the coupling split needs theta_dim >= 2; for a scalar "
                "theta the Gaussian families are already exact up to a "
                "monotone 1-D map"
            )
        self.theta_mean_net = MLP(self.hidden, self.n_layers, self.theta_dim,
                                  self.dtype)
        self.theta_sig_net = MLP(self.hidden, self.n_layers, self.theta_dim,
                                 self.dtype)
        self.couplings = [
            MLP(self.hidden, self.n_layers, 2 * self.theta_dim, self.dtype,
                zero_head=True)
            for _ in range(self.n_couplings)
        ]

    def base(self, y):
        y = _normalize(y, self.y_shift, self.y_scale, self.dtype)
        return self.theta_mean_net(y), self.theta_sig_net(y)

    def __call__(self, y, e):
        mu, log_sig = self.base(y)
        d = self.theta_dim
        B, ne = mu.shape[0], e.shape[0]
        theta = mu[:, None, :] + jnp.exp(0.5 * log_sig)[:, None, :] * e[None, :, :]
        logq = (
            -0.5 * d * math.log(2.0 * math.pi)
            - 0.5 * jnp.sum(e**2, axis=-1)[None, :]
            - 0.5 * jnp.sum(log_sig, axis=-1)[:, None]
        )
        yn = _normalize(y, self.y_shift, self.y_scale, self.dtype)
        yb = jnp.broadcast_to(yn[:, None, :], (B, ne, yn.shape[-1]))
        idx = jnp.arange(d)
        for k, net in enumerate(self.couplings):
            mask = ((idx + k) % 2 == 0).astype(self.dtype)  # active dims
            st = net(jnp.concatenate([theta * mask, yb], axis=-1))
            s = self.s_cap * jnp.tanh(st[..., :d] / self.s_cap) * (1.0 - mask)
            t = st[..., d:] * (1.0 - mask)
            theta = theta * jnp.exp(s) + t
            logq = logq - jnp.sum(s, axis=-1)
        return theta, logq


def flow_moments(net, params, y, key, n_mc=256):
    """Monte-Carlo posterior moments of the flow: (mean (B, d), var (B, d)).

    The flow has no closed-form moments (that is the point); eval surfaces
    that expect ``(theta_mean, theta_sig)`` get the MC estimates from
    ``n_mc`` fresh base draws.
    """
    d = net.theta_dim
    e = jax.random.normal(key, (n_mc, d), net.dtype)
    theta, _ = net.apply(params, jnp.asarray(y, net.dtype), e)
    return jnp.mean(theta, axis=1), jnp.var(theta, axis=1)
