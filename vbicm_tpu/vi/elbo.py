"""ELBO terms for the two-step amortized VI scheme.

Exact math of ``main_custom_training.py``:

  step 1 (q(theta|y), "Eq. 17/21/22"):   loss = term1 - term2 - term3
  step 2 (p(z|y) lognormal, "Eq. 23/25"): loss = alpha*(term4 - term5)
                                                  + moment_match_loss

``sig_e`` / ``sig_eta`` are noise *variances*. ``e_data`` are the fixed
reparameterization seeds (common random numbers) shared between data
generation and training.

Pairing semantics: with ``pairing="cross"`` (default) term2/term5 reproduce
the reference's broadcasting *exactly*: ``y`` is expanded to (B, 1, d) and
compared against the full flattened FEM batch (B*ne, d), producing a
(B, B*ne) pair matrix that is then averaged (``main_custom_training.py:
199-214,347-364``) — every observation is scored against every posterior
sample in the batch, not only its own. ``pairing="per_sample"`` implements
the textbook per-observation Monte-Carlo pairing. Both are provided;
"cross" is the parity mode.
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp


def term1(log_theta_sig):
    """Entropy-like term of q(theta|y) ("Eq. 17", ``:183-185``)."""
    d = log_theta_sig.shape[-1]
    return (
        -0.5 * jnp.mean(jnp.sum(log_theta_sig, axis=-1), axis=0)
        - 0.5 * d * math.log(2.0 * math.pi)
        - 0.5 * d
    )


def reparameterize(theta_mean, theta_sig, e_data, log_theta_sig=None):
    """theta samples via fixed seeds: (B, d), (B, d), (ne, d) -> (B*ne, d).

    Matches the reference broadcast ``e_data * sqrt(sig)[:,None] +
    mean[:,None]`` then flatten (``:202-208``).

    When ``log_theta_sig`` is given, the std is computed as
    ``exp(0.5 * log_sig)`` instead of ``sqrt(exp(log_sig))`` — the same
    function, but with a bounded chain rule: once the variance head drops
    below ~-87 (TPU flushes subnormals, so ``exp(log_sig)`` becomes exactly
    0.0), ``d sqrt(sig)/d log_sig = exp(log_sig) * 0.5/sqrt(sig)`` is
    ``0 * inf = NaN`` even though the loss VALUE is still finite — one such
    batch poisons the optimizer state permanently (observed in the sharp-
    likelihood random-field runs, sig_e=1e-3, where the posterior collapse
    drives log_sig far negative before the entropy term pulls it back).
    """
    if log_theta_sig is not None:
        theta_std = jnp.exp(0.5 * log_theta_sig)[:, None, :]
    else:
        theta_std = jnp.sqrt(theta_sig)[:, None, :]
    theta = e_data[None, :, :] * theta_std + theta_mean[:, None, :]
    return theta.reshape(-1, theta.shape[-1])


def term2(y, theta_mean, theta_sig, e_data, batch_f, sig_e, pairing="cross",
          log_theta_sig=None):
    """MC estimate of E_q[log p(y|theta)] with the FEM inside (``:199-214``).

    batch_f: thetas (N, d_theta) -> f (N, d_y) (first output of fh).
    """
    d_y = y.shape[-1]
    theta_data = reparameterize(theta_mean, theta_sig, e_data, log_theta_sig)
    f_data = batch_f(theta_data)  # (B*ne, d_y)
    l1 = -0.5 * d_y * math.log(2.0 * math.pi * sig_e)
    if pairing == "cross":
        # (B, 1, d) - (B*ne, d) -> (B, B*ne, d): reference's broadcast
        l2 = -0.5 / sig_e * jnp.sum((y[:, None, :] - f_data[None, :, :]) ** 2, axis=-1)
    elif pairing == "per_sample":
        ne = e_data.shape[0]
        f_r = f_data.reshape(y.shape[0], ne, d_y)
        l2 = -0.5 / sig_e * jnp.sum((y[:, None, :] - f_r) ** 2, axis=-1)
    else:
        raise ValueError(f"unknown pairing {pairing!r}")
    return l1 + jnp.mean(l2)


def term3(theta_mean, theta_sig):
    """Cross-entropy to the N(0, I) prior ("Eq. 22", ``:224-227``)."""
    d = theta_mean.shape[-1]
    return -0.5 * d * math.log(2.0 * math.pi) - 0.5 * jnp.mean(
        jnp.sum(theta_sig + theta_mean**2, axis=-1), axis=0
    )


def make_loss_step1(batch_f, e_data, sig_e, pairing="cross"):
    """loss(y, (theta_mean, theta_sig, log_theta_sig)[, e]) for step 1.

    ``e`` overrides the closed-over fixed seeds for this evaluation — used
    by ``TrainConfig.resample_e`` to draw fresh reparameterization noise
    every step (same (ne, d) shape)."""

    def loss(y, outputs, e=None):
        e = e_data if e is None else e
        theta_mean, theta_sig, log_theta_sig = outputs
        t1 = term1(log_theta_sig)
        t2 = term2(y, theta_mean, theta_sig, e, batch_f, sig_e, pairing,
                   log_theta_sig=log_theta_sig)
        t3 = term3(theta_mean, theta_sig)
        return t1 - t2 - t3

    return loss


# ---------------------------------------------------------------------------
# Full-covariance posterior (beyond the reference's independent-Gaussians q)
# ---------------------------------------------------------------------------


def reparameterize_fullcov(theta_mean, L, e_data):
    """theta = mu + L e with a per-observation Cholesky factor:
    (B, d), (B, d, d), (ne, d) -> (B*ne, d).

    The full-covariance sibling of :func:`reparameterize` — the mean-field
    q underestimates marginal variances on correlated posteriors (its
    optimum matches the PRECISION diagonal, 1/Lambda_ii <= Sigma_ii; VI/MC
    std ratios down to 0.01 measured on the sharp-likelihood random-field
    posteriors), which a Cholesky parameterization Sigma = L L^T removes.
    """
    theta = theta_mean[:, None, :] + jnp.einsum("bij,nj->bni", L, e_data)
    return theta.reshape(-1, theta.shape[-1])


def term1_fullcov(log_diag):
    """-entropy of q = N(mu, L L^T): log L_ii = 0.5 * log_diag (the net
    parameterizes the squared diagonal, matching the mean-field head)."""
    d = log_diag.shape[-1]
    return (
        -0.5 * jnp.mean(jnp.sum(log_diag, axis=-1), axis=0)
        - 0.5 * d * math.log(2.0 * math.pi)
        - 0.5 * d
    )


def term3_fullcov(theta_mean, L):
    """Cross-entropy to the N(0, I) prior: E[theta^T theta] =
    tr(L L^T) + |mu|^2 = sum L^2 + |mu|^2."""
    d = theta_mean.shape[-1]
    return -0.5 * d * math.log(2.0 * math.pi) - 0.5 * jnp.mean(
        jnp.sum(L**2, axis=(-2, -1)) + jnp.sum(theta_mean**2, axis=-1), axis=0
    )


def make_loss_step1_fullcov(batch_f, e_data, sig_e):
    """Step-1 loss for the full-covariance posterior head
    (``models.mlp.ThetaPosteriorFullCovNet``): outputs =
    (theta_mean, L, log_diag). Per-observation pairing only — the
    cross-pairing broadcast is the reference-parity mode of the MEAN-FIELD
    head; a correlated q has no reference counterpart to pair against."""

    def loss(y, outputs, e=None):
        e = e_data if e is None else e
        theta_mean, L, log_diag = outputs
        d_y = y.shape[-1]
        ne = e.shape[0]
        theta_data = reparameterize_fullcov(theta_mean, L, e)
        f_data = batch_f(theta_data)
        f_r = f_data.reshape(y.shape[0], ne, d_y)
        l2 = -0.5 / sig_e * jnp.sum((y[:, None, :] - f_r) ** 2, axis=-1)
        t2 = -0.5 * d_y * math.log(2.0 * math.pi * sig_e) + jnp.mean(l2)
        return term1_fullcov(log_diag) - t2 - term3_fullcov(theta_mean, L)

    return loss


# ---------------------------------------------------------------------------
# Normalizing-flow posterior (models.flow.ThetaPosteriorFlowNet)
# ---------------------------------------------------------------------------


def make_loss_step1_flow(batch_f, sig_e):
    """Step-1 loss for the flow posterior: outputs = (theta, logq) from
    ``ThetaPosteriorFlowNet.__call__`` — theta (B, ne, d), logq (B, ne)
    the EXACT per-sample log-density via the coupling log-det.

    loss = E_q[log q(theta|y) - log p(y|theta) - log p(theta)]
         = KL(q || posterior) - log Z,

    the same objective as term1 - term2 - term3 but with every term a
    per-sample Monte-Carlo average (the flow has no closed-form entropy or
    prior cross-entropy). Per-observation pairing only, like fullcov.
    """

    def loss(y, outputs, e=None):  # e consumed upstream (flow apply)
        theta, logq = outputs
        B, ne, d = theta.shape
        d_y = y.shape[-1]
        f = batch_f(theta.reshape(-1, d)).reshape(B, ne, d_y)
        loglik = -0.5 * d_y * math.log(2.0 * math.pi * sig_e) - 0.5 / sig_e * jnp.sum(
            (y[:, None, :] - f) ** 2, axis=-1
        )
        logprior = -0.5 * d * math.log(2.0 * math.pi) - 0.5 * jnp.sum(
            theta**2, axis=-1
        )
        return jnp.mean(logq - loglik - logprior)

    return loss


def term4(z_mean, log_z_sig):
    """Lognormal-entropy term ("Eq. 23", ``:338-340``)."""
    d = z_mean.shape[-1]
    loss = -0.5 * jnp.sum(log_z_sig, axis=-1) - jnp.sum(z_mean, axis=-1)
    return jnp.mean(loss) - 0.5 * d * math.log(2.0 * math.pi) - 0.5 * d


def term5(theta_mean, theta_sig, z_mean, z_sig, e_data, batch_h, sig_eta, pairing="cross",
          fullcov=False, theta_data=None):
    """E[log p(z|theta)] via lognormal moment identities ("Eq. 25", ``:347-364``).

    batch_h: thetas (N, d_theta) -> h (N, d_z) (second output of fh).
    ``fullcov=True``: ``theta_sig`` carries the (B, d, d) Cholesky factor
    of the full-covariance posterior instead of per-dim variances.
    ``theta_data`` overrides the draws entirely (already-reparameterized
    (B*ne, d) samples — the flow posterior path, which has no moment
    parameterization to thread through).
    """
    d_z = z_mean.shape[-1]
    if theta_data is None:
        if fullcov:
            theta_data = reparameterize_fullcov(theta_mean, theta_sig, e_data)
        else:
            theta_data = reparameterize(theta_mean, theta_sig, e_data)
    h_data = batch_h(theta_data)  # (B*ne, d_z)
    zm = z_mean[:, None, :]
    zs = z_sig[:, None, :]
    l1 = -0.5 / sig_eta * jnp.sum(jnp.exp(2.0 * zm + 2.0 * zs), axis=-1)  # (B, 1)
    if pairing == "cross":
        h = h_data[None, :, :]  # (1, B*ne, d)
    elif pairing == "per_sample":
        h = h_data.reshape(z_mean.shape[0], e_data.shape[0], d_z)
    else:
        raise ValueError(f"unknown pairing {pairing!r}")
    l2 = -0.5 / sig_eta * jnp.sum(-2.0 * h * jnp.exp(zm + 0.5 * zs) + h**2, axis=-1)
    l3 = -0.5 * d_z * math.log(2.0 * math.pi * sig_eta)
    return jnp.mean(l1 + l2) + l3


def moment_match_loss(z_mean, z_sig, logz_mean_post, logz_sig_post):
    """MSE anchoring to cached posterior log-z moments (``:373-375``)."""
    return jnp.mean((z_mean - logz_mean_post) ** 2) + jnp.mean(
        (z_sig - logz_sig_post) ** 2
    )


def make_loss_step2(batch_h, e_data, sig_eta, alpha, pairing="cross",
                    fullcov=False, flow=False):
    """loss((y, logz_mean_post, logz_sig_post), outputs) for step 2.

    outputs = (theta_mean, theta_sig, z_mean, z_sig, log_z_sig); with
    ``fullcov=True`` the ``theta_sig`` slot carries the posterior Cholesky
    factor (B, d, d) and term5's theta draws use it.

    ``flow=True``: outputs = (theta_data, z_mean, z_sig, log_z_sig) where
    ``theta_data`` is the (B*ne, d) block of ALREADY-reparameterized flow
    samples (``ThetaPosteriorFlowNet`` draws inside the net; there are no
    moment parameters to thread through) — routed to term5's
    ``theta_data`` hook. Per-observation pairing only.
    """
    if flow and pairing != "per_sample":
        raise ValueError('flow step-2 loss requires pairing="per_sample"')

    def loss(batch, outputs, e=None):
        e = e_data if e is None else e
        _, logz_mean_post, logz_sig_post = batch
        if flow:
            theta_data, z_mean, z_sig, log_z_sig = outputs
            theta_mean = theta_sig = None
        else:
            theta_mean, theta_sig, z_mean, z_sig, log_z_sig = outputs
            theta_data = None
        mm = moment_match_loss(z_mean, z_sig, logz_mean_post, logz_sig_post)
        if alpha == 0.0:
            # skip terms 4/5 entirely: on problems where the lognormal
            # moment identities overflow (h spanning many decades),
            # 0 * inf would poison the pure moment-matching loss
            return mm
        t4 = term4(z_mean, log_z_sig)
        t5 = term5(theta_mean, theta_sig, z_mean, z_sig, e, batch_h, sig_eta,
                   pairing, fullcov=fullcov, theta_data=theta_data)
        return (t4 - t5) * alpha + mm

    return loss
