"""MCMC reference posterior.

The reference validates VI against a random-walk Metropolis chain
(``sampyl.Metropolis`` over theta with log-posterior = Gaussian likelihood of
y given FEM f(theta) + N(0, I) prior, ``src/postprocess_lib.py:77-103``) —
each proposal there runs one FEM solve through the TF graph, sequentially,
and sampyl adapts its proposal scale during burn-in.

Here the sampler is a pure-JAX ``lax.scan`` with the *vmapped* FEM
log-density: many independent chains advance in lockstep, so every MCMC step
is one batched Cholesky across chains — chains parallelize across chips
exactly like posterior samples do in training. Proposal adaptation is
per-chain Robbins-Monro on the log step size during burn-in (frozen after,
so the kept samples are exact Metropolis); chain quality is quantified by
split-R-hat and bulk ESS (Vehtari et al. 2021 style), which the statistical
tests use to derive their tolerances instead of hand-picked bands.
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
    step_size: Optional[np.ndarray] = None  # (n_chains,) final adapted scales
    ess: Optional[np.ndarray] = None  # (d,) bulk effective sample size
    rhat: Optional[np.ndarray] = None  # (d,) split-R-hat

    def mean_mcse(self) -> np.ndarray:
        """Monte-Carlo standard error of the posterior-mean estimate per
        dimension: sd / sqrt(ESS) — the statistically honest tolerance for
        comparing posterior means against this chain."""
        flat = self.samples.reshape(-1, self.samples.shape[-1])
        return flat.std(axis=0, ddof=1) / np.sqrt(np.maximum(self.ess, 1.0))


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
    adapt: bool = True,
    target_accept: float = 0.3,
) -> MetropolisResult:
    """Random-walk Metropolis, vmapped over chains, scanned over steps.

    ``adapt=True`` tunes a PER-CHAIN log step size toward ``target_accept``
    during burn-in only (Robbins-Monro, gamma_t = t^-0.6), mirroring
    sampyl's burn-in scale adaptation (``src/postprocess_lib.py:92-94``);
    sampling steps use the frozen scales, so detailed balance holds for
    every kept draw. Diagnostics (split-R-hat, bulk ESS with Geyer initial
    monotone truncation) are computed on the kept samples.
    """
    n_steps = burn + n_samples * thin

    if init is None:
        init = jnp.zeros((n_chains, d))
    else:
        init = jnp.asarray(init)
    logp0 = jax.vmap(logpost)(init)
    log_s0 = jnp.full((n_chains,), jnp.log(step_size), init.dtype)

    def one_step(carry, inp):
        theta, logp, log_s = carry
        k, t = inp
        k1, k2 = jax.random.split(k)
        prop = theta + jnp.exp(log_s)[:, None] * jax.random.normal(
            k1, theta.shape, theta.dtype
        )
        logp_prop = jax.vmap(logpost)(prop)
        log_ratio = logp_prop - logp
        log_u = jnp.log(jax.random.uniform(k2, (theta.shape[0],)))
        accept = log_u < log_ratio
        theta = jnp.where(accept[:, None], prop, theta)
        logp = jnp.where(accept, logp_prop, logp)
        if adapt:
            alpha = jnp.minimum(1.0, jnp.exp(log_ratio))  # expected acceptance
            gamma = (t + 1.0) ** (-0.6)
            in_burn = t < burn
            log_s = jnp.where(
                in_burn, log_s + gamma * (alpha - target_accept), log_s
            )
        return (theta, logp, log_s), (theta, accept)

    keys = jax.random.split(key, n_steps)
    ts = jnp.arange(n_steps, dtype=init.dtype)
    (_, _, log_s), (chain, accepts) = jax.lax.scan(
        one_step, (init, logp0, log_s0), (keys, ts)
    )
    # chain: (n_steps, n_chains, d) -> drop burn-in, thin, chains-major
    kept = chain[burn::thin]  # (n_samples, n_chains, d)
    samples = np.asarray(jnp.swapaxes(kept, 0, 1))
    ess, rhat = ess_rhat(samples)
    return MetropolisResult(
        samples=samples,
        accept_rate=float(jnp.mean(accepts[burn:])),
        step_size=np.asarray(jnp.exp(log_s)),
        ess=ess,
        rhat=rhat,
    )


def hmc(
    key,
    logpost: Callable,
    *,
    d: int = 2,
    n_samples: int = 2000,
    burn: int = 500,
    thin: int = 1,
    n_chains: int = 8,
    step_size: float = 0.2,
    n_leapfrog: int = 8,
    init: Optional[jnp.ndarray] = None,
    adapt: bool = True,
    target_accept: float = 0.75,
) -> MetropolisResult:
    """Hamiltonian Monte Carlo, vmapped over chains, scanned over steps.

    The TPU-native upgrade over :func:`metropolis` that the reference could
    not express: its sampler treats the FEM forward map as a black box
    (``sampyl.Metropolis``, ``src/postprocess_lib.py:92-94``), while here
    ``jax.grad`` of the log-posterior runs through the FEM adjoint solve —
    one extra linear solve per leapfrog step — so each proposal is guided
    by the exact posterior gradient. Per gradient evaluation HMC's
    effective sample size is typically an order of magnitude above
    random-walk (pinned in ``tests/test_eval.py``).

    Identity mass matrix (the theta prior is standard normal, so the
    posterior scale is O(1) by construction). ``adapt=True`` runs per-chain
    Robbins-Monro on the log step size toward ``target_accept`` during
    burn-in only; kept samples use frozen step sizes, so detailed balance
    holds for every retained draw. Returns the same
    :class:`MetropolisResult` (split-R-hat / bulk-ESS diagnostics).
    """
    n_steps = burn + n_samples * thin

    if init is None:
        init = jnp.zeros((n_chains, d))
    else:
        init = jnp.asarray(init)
    v_logp = jax.vmap(logpost)
    v_grad = jax.vmap(jax.grad(logpost))
    logp0 = v_logp(init)
    log_s0 = jnp.full((n_chains,), jnp.log(step_size), init.dtype)

    def one_step(carry, inp):
        theta, logp, g_theta, log_s = carry
        k, t = inp
        k1, k2, k3 = jax.random.split(k, 3)
        # jitter the step size (+-33%) so eps*L never locks onto a period
        # of the target — without this, trajectories on near-Gaussian
        # posteriors U-turn back to their start (adapted eps ~ 0.8, L = 8
        # gives eps*L ~ 2*pi) and the ESS collapses to the random-walk
        # level. Jitter preserves detailed balance (eps is drawn
        # independently of the state).
        jit = jax.random.uniform(k3, (theta.shape[0], 1), theta.dtype,
                                 2.0 / 3.0, 4.0 / 3.0)
        eps = jnp.exp(log_s)[:, None] * jit
        p0 = jax.random.normal(k1, theta.shape, theta.dtype)

        # merged leapfrog: half kick, L x (drift, kick) with the last kick
        # halved — L gradient evaluations per trajectory (each one a full
        # FEM forward+adjoint solve), reusing the cached gradient at the
        # current state for the first half kick instead of the naive
        # kick-drift-kick form's 2L evaluations
        p_half = p0 + 0.5 * eps * g_theta

        def leap(carry, l):
            q, p, _ = carry
            q = q + eps * p
            gq = v_grad(q)
            w = jnp.where(l == n_leapfrog - 1, 0.5, 1.0)
            p = p + w * eps * gq
            return (q, p, gq), None

        (q1, p1, g1), _ = jax.lax.scan(
            leap, (theta, p_half, g_theta), jnp.arange(n_leapfrog)
        )
        logp1 = v_logp(q1)
        h0 = logp - 0.5 * jnp.sum(p0**2, axis=1)
        h1 = logp1 - 0.5 * jnp.sum(p1**2, axis=1)
        log_ratio = h1 - h0
        # guard divergences (non-finite H after an unstable trajectory)
        log_ratio = jnp.where(jnp.isfinite(log_ratio), log_ratio, -jnp.inf)
        log_u = jnp.log(jax.random.uniform(k2, (theta.shape[0],)))
        accept = log_u < log_ratio
        theta = jnp.where(accept[:, None], q1, theta)
        logp = jnp.where(accept, logp1, logp)
        # the trajectory's last gradient IS grad at q1 — cache it so the
        # next proposal's first half kick costs nothing extra
        g_theta = jnp.where(accept[:, None], g1, g_theta)
        if adapt:
            alpha = jnp.minimum(1.0, jnp.exp(log_ratio))
            gamma = (t + 1.0) ** (-0.6)
            in_burn = t < burn
            log_s = jnp.where(
                in_burn, log_s + gamma * (alpha - target_accept), log_s
            )
        return (theta, logp, g_theta, log_s), (theta, accept)

    keys = jax.random.split(key, n_steps)
    ts = jnp.arange(n_steps, dtype=init.dtype)
    (_, _, _, log_s), (chain, accepts) = jax.lax.scan(
        one_step, (init, logp0, v_grad(init), log_s0), (keys, ts)
    )
    kept = chain[burn::thin]
    samples = np.asarray(jnp.swapaxes(kept, 0, 1))
    ess, rhat = ess_rhat(samples)
    return MetropolisResult(
        samples=samples,
        accept_rate=float(jnp.mean(accepts[burn:])),
        step_size=np.asarray(jnp.exp(log_s)),
        ess=ess,
        rhat=rhat,
    )


def ess_rhat(samples: np.ndarray):
    """(bulk ESS (d,), split-R-hat (d,)) for samples (n_chains, n_kept, d).

    Split-R-hat: each chain halved -> 2M sequences; R-hat = sqrt(var+ / W).
    ESS: M*N / (1 + 2 sum rho_t) with chain-averaged autocorrelations from
    FFT and Geyer's initial-monotone-positive-sequence truncation.
    """
    samples = np.asarray(samples, np.float64)
    m, n, d = samples.shape
    half = n // 2
    # ---- split R-hat ----
    split = samples[:, : 2 * half].reshape(m * 2, half, d)
    cm = split.mean(axis=1)  # (2m, d)
    W = split.var(axis=1, ddof=1).mean(axis=0)  # (d,)
    B = half * cm.var(axis=0, ddof=1)  # (d,)
    var_plus = (half - 1) / half * W + B / half
    rhat = np.sqrt(var_plus / np.maximum(W, 1e-300))

    # ---- bulk ESS on the split sequences ----
    seqs = split - split.mean(axis=1, keepdims=True)  # center per sequence
    nfft = int(2 ** np.ceil(np.log2(2 * half)))
    f = np.fft.rfft(seqs, n=nfft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=nfft, axis=1)[:, :half].real
    acov /= half  # biased autocovariance per sequence
    mean_acov = acov.mean(axis=0)  # (half, d)
    # Vehtari: rho_t = 1 - (W - mean within-seq acov_t) / var_plus
    rho = 1.0 - (W[None, :] - mean_acov) / np.maximum(var_plus[None, :], 1e-300)
    ess = np.empty(d)
    for j in range(d):
        # Geyer: sum consecutive pairs while positive, enforce monotone
        p = rho[:, j]
        tmax = (len(p) // 2) * 2
        pair = p[:tmax].reshape(-1, 2).sum(axis=1)  # Gamma_k
        k_pos = np.argmax(pair <= 0) if np.any(pair <= 0) else len(pair)
        g = pair[:k_pos]
        g = np.minimum.accumulate(g) if len(g) else g
        tau = -1.0 + 2.0 * g.sum()  # rho_0 = 1 included via -1 + 2*sum(pairs)
        tau = max(tau, 1.0 / np.log10(max(m * n, 10)))
        ess[j] = min(m * n / tau, float(m * n))
    return ess, rhat


def posterior_predictive_z(key, fh_batch: Callable, theta_samples, sig_eta: float):
    """z = h(theta) + eta over posterior draws (``src/postprocess_lib.py:96-99``).

    theta_samples: (N, d); fh_batch: batched fh. Returns (N, d_z).
    """
    theta_samples = jnp.asarray(theta_samples)
    _, h = fh_batch(theta_samples)
    eta = jnp.sqrt(sig_eta) * jax.random.normal(key, h.shape, h.dtype)
    return np.asarray(h + eta)
