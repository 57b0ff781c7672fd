"""MCMC reference posterior.

The reference validates VI against a random-walk Metropolis chain
(``sampyl.Metropolis`` over theta with log-posterior = Gaussian likelihood of
y given FEM f(theta) + N(0, I) prior, ``src/postprocess_lib.py:77-103``) —
each proposal there runs one FEM solve through the TF graph, sequentially.

Here the sampler is a pure-JAX ``lax.scan`` with the *vmapped* FEM
log-density: many independent chains advance in lockstep, so every MCMC step
is one batched Cholesky across chains — chains parallelize across chips
exactly like posterior samples do in training.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class MetropolisResult:
    samples: np.ndarray  # (n_chains, n_kept, d)
    accept_rate: float


def make_fem_logpost(fh: Callable, y_obs, sig_e: float):
    """log p(theta | y) up to a constant, matching ``logp_y_2d``
    (``src/postprocess_lib.py:77-88``): Gaussian likelihood on f(theta) with
    variance sig_e + standard-normal prior."""
    y_obs = jnp.asarray(y_obs).reshape(-1)

    def logpost(theta):
        f, _ = fh(theta)
        ll = -0.5 / sig_e * jnp.sum((y_obs - f) ** 2)
        lp = -0.5 * jnp.sum(theta**2)
        return ll + lp

    return logpost


def metropolis(
    key,
    logpost: Callable,
    *,
    d: int = 2,
    n_samples: int = 5000,
    burn: int = 500,
    thin: int = 1,
    n_chains: int = 8,
    step_size: float = 0.5,
    init: Optional[jnp.ndarray] = None,
) -> MetropolisResult:
    """Random-walk Metropolis, vmapped over chains, scanned over steps."""
    n_steps = burn + n_samples * thin

    if init is None:
        init = jnp.zeros((n_chains, d))
    logp0 = jax.vmap(logpost)(init)

    def one_step(carry, k):
        theta, logp = carry
        k1, k2 = jax.random.split(k)
        prop = theta + step_size * jax.random.normal(k1, theta.shape, theta.dtype)
        logp_prop = jax.vmap(logpost)(prop)
        log_u = jnp.log(jax.random.uniform(k2, (theta.shape[0],)))
        accept = log_u < (logp_prop - logp)
        theta = jnp.where(accept[:, None], prop, theta)
        logp = jnp.where(accept, logp_prop, logp)
        return (theta, logp), (theta, accept)

    keys = jax.random.split(key, n_steps)
    (_, _), (chain, accepts) = jax.lax.scan(one_step, (init, logp0), keys)
    # chain: (n_steps, n_chains, d) -> drop burn-in, thin, chains-major
    kept = chain[burn::thin]  # (n_samples, n_chains, d)
    samples = np.asarray(jnp.swapaxes(kept, 0, 1))
    return MetropolisResult(
        samples=samples, accept_rate=float(jnp.mean(accepts[burn:]))
    )


def posterior_predictive_z(key, fh_batch: Callable, theta_samples, sig_eta: float):
    """z = h(theta) + eta over posterior draws (``src/postprocess_lib.py:96-99``).

    theta_samples: (N, d); fh_batch: batched fh. Returns (N, d_z).
    """
    theta_samples = jnp.asarray(theta_samples)
    _, h = fh_batch(theta_samples)
    eta = jnp.sqrt(sig_eta) * jax.random.normal(key, h.shape, h.dtype)
    return np.asarray(h + eta)
