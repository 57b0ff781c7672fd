"""Proposed-vs-classical-vs-reference comparison evaluation.

The reference's evaluation layer compares three predictive models for
p(z|y) (``main_postprocess.py:30-78``, ``src/postprocess_lib.py:990-1380``):

  * **proposed** — the amortized lognormal net p(z|y) from two-step training
    (closed-form density);
  * **classical (method1)** — a one-step q(theta|y) net whose z-prediction
    is Monte-Carlo: sample theta ~ q, push through FEM, add eta, KDE
    (``zpdf_2d_case4_method1``, ``src/postprocess_lib.py:1031-1045``);
  * **reference** — MCMC posterior-predictive KDE
    (``zpdf_2d_example_more_loss_mcmc``, ``:90-103``).

This module provides the TPU-native versions: all FEM sample pushes are one
``jax.vmap`` batch (the reference loops ``tf.map_fn`` threads); KDE/density
bookkeeping stays host-side NumPy/SciPy like the reference's.

DIVERGENCE (docs/DIVERGENCES.md): the reference FABRICATES the "reference"
curves of its mean/sig field comparison by scaling the proposed output by
1.015 (``src/postprocess_lib.py:1266-1267``; the real MC computation is
commented out at ``:1255-1265``). Here the reference fields are computed for
real, with exactly that commented-out estimator: theta ~ q_proposed(theta|y),
z = FEM h(theta) + eta, moments over samples.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats


# ----------------------------------------------------------------------
# sample generation (the FEM pushes — TPU-batched)
# ----------------------------------------------------------------------

def mc_z_samples(
    key,
    batch_h: Callable,
    theta_mean: np.ndarray,
    theta_sig: np.ndarray,
    sig_eta: float,
    num_sam: int,
    *,
    chunk: int = 8192,
):
    """z-samples of the MC predictive: theta ~ N(mean, sig) per y, z = h + eta.

    theta_mean/theta_sig: (n_y, d_theta). Returns (n_y, num_sam, d_z).
    Matches the reference's shared-eta convention: ONE (num_sam, d_z) eta
    matrix reused for every y (``src/postprocess_lib.py:1140-1142`` kron).
    """
    k_th, k_eta = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    n_y, d_th = theta_mean.shape
    eps = jax.random.normal(k_th, (n_y, num_sam, d_th), dtype=jnp.float64)
    theta = jnp.asarray(theta_mean)[:, None, :] + eps * jnp.sqrt(
        jnp.asarray(theta_sig)[:, None, :]
    )
    return mc_z_samples_theta(k_eta, batch_h, theta, sig_eta, chunk=chunk)


def mc_z_samples_theta(key, batch_h: Callable, theta_sam, sig_eta: float,
                       *, chunk: int = 8192):
    """Family-agnostic sibling of :func:`mc_z_samples`: push PRE-DRAWN
    posterior samples ``theta_sam (n_y, num_sam, d_theta)`` through the FEM
    and add the shared-eta observation noise. This is how the non-Gaussian
    posterior families (full-covariance Cholesky, normalizing flow — drawn
    via ``TwoStepTrainer.sample_theta``) enter every comparison surface:
    the eval pipeline needs samples, not moment parameterizations."""
    theta_sam = jnp.asarray(theta_sam)
    n_y, num_sam, d_th = theta_sam.shape
    flat = theta_sam.reshape(-1, d_th)
    hs = []
    for i in range(0, flat.shape[0], chunk):
        hs.append(batch_h(flat[i : i + chunk]))
    h = jnp.concatenate(hs).reshape(n_y, num_sam, -1)
    eta = jnp.sqrt(sig_eta) * jax.random.normal(
        key, (num_sam, h.shape[-1]), dtype=jnp.float64
    )
    return np.asarray(h + eta[None, :, :])


# ----------------------------------------------------------------------
# densities on a z-grid (pdf overlays, ``plot_2d_pdf_case4_*``)
# ----------------------------------------------------------------------

class GridDensity(NamedTuple):
    z_grid: np.ndarray  # (npts*npts, 2) evaluation points
    xg: np.ndarray  # (npts, npts)
    yg: np.ndarray
    pdf: np.ndarray  # (npts, npts)


def classical_grid_density(z_sam: np.ndarray, mf: float, num_points: int) -> GridDensity:
    """KDE of MC z-samples on a mean +/- mf*std grid
    (``zpdf_2d_case4_method1``, ``src/postprocess_lib.py:1031-1045``)."""
    z_mu, z_std = z_sam.mean(axis=0), z_sam.std(axis=0)
    xv = np.linspace(z_mu[0] - mf * z_std[0], z_mu[0] + mf * z_std[0], num_points)
    yv = np.linspace(z_mu[1] - mf * z_std[1], z_mu[1] + mf * z_std[1], num_points)
    xg, yg = np.meshgrid(xv, yv)
    pts = np.stack([xg.ravel(), yg.ravel()], axis=1)
    pdf = stats.gaussian_kde(z_sam.T)(pts.T).reshape(num_points, num_points)
    return GridDensity(pts, xg, yg, pdf)


def proposed_grid_density(z_mean, z_sig, mf: float, num_points: int) -> GridDensity:
    """Closed-form lognormal predictive on a moment-matched grid
    (``plot_2d_pdf_case4_proposed``, ``src/postprocess_lib.py:1048-1076``)."""
    z_mean = np.asarray(z_mean).ravel()
    z_sig = np.asarray(z_sig).ravel()
    mean_ln = np.exp(0.5 * z_sig + z_mean)
    std_ln = mean_ln * np.sqrt(np.exp(z_sig) - 1.0)
    xv = np.linspace(mean_ln[0] - mf * std_ln[0], mean_ln[0] + mf * std_ln[0], num_points)
    yv = np.linspace(mean_ln[1] - mf * std_ln[1], mean_ln[1] + mf * std_ln[1], num_points)
    xg, yg = np.meshgrid(xv, yv)
    pts = np.stack([xg.ravel(), yg.ravel()], axis=1)
    pdf = (
        stats.lognorm.pdf(pts[:, 0], s=np.sqrt(z_sig[0]), scale=np.exp(z_mean[0]))
        * stats.lognorm.pdf(pts[:, 1], s=np.sqrt(z_sig[1]), scale=np.exp(z_mean[1]))
    ).reshape(num_points, num_points)
    return GridDensity(pts, xg, yg, pdf)


def kde_on_grid(z_sam: np.ndarray, grid: GridDensity) -> np.ndarray:
    """Evaluate a sample KDE on another GridDensity's points."""
    return stats.gaussian_kde(z_sam.T)(grid.z_grid.T).reshape(grid.pdf.shape)


# ----------------------------------------------------------------------
# conditional-KLD maps over a y-grid (``kld_2d_example_case4_*``,
# ``src/postprocess_lib.py:1086-1218``)
# ----------------------------------------------------------------------

def y_grid(y_mean, y_sig, mf: float, num_points: int):
    """The floor'd mean +/- mf*std y-grid (``:1177-1181``)."""
    y_mean = np.asarray(y_mean).ravel()
    y_sig = np.asarray(y_sig).ravel()
    y1 = np.linspace(
        np.floor(y_mean[0] - mf * np.sqrt(y_sig[0])),
        np.floor(y_mean[0] + mf * np.sqrt(y_sig[0])),
        num_points,
    )
    y2 = np.linspace(
        np.floor(y_mean[1] - mf * np.sqrt(y_sig[1])),
        np.floor(y_mean[1] + mf * np.sqrt(y_sig[1])),
        num_points,
    )
    g1, g2 = np.meshgrid(y1, y2)
    return np.stack([g1.ravel(), g2.ravel()], axis=1), g1, g2


def kld_maps(
    key,
    batch_h: Callable,
    y_data: np.ndarray,
    proposed: tuple,
    classical: tuple,
    sig_eta: float,
    num_sam: int,
    proposed_sampler: Callable = None,
):
    """Both KLD maps against one shared reference KDE.

    proposed: (theta_mean, theta_sig, z_mean, z_sig) of the proposed model
    at y_data; classical: (theta_mean, theta_sig) of the method-1 model.
    Returns (kld_proposed (n_y,), kld_classical (n_y,)).

    ``proposed_sampler(key, num_sam) -> theta (n_y, num_sam, d)`` overrides
    the Gaussian theta draws of the shared reference KDE — the hook through
    which the full-covariance and normalizing-flow posterior families
    (``TwoStepTrainer.sample_theta``) drive the same comparison pipeline.

    Mirrors ``kld_2d_example_case4_proposed`` + ``..._method1``
    (``src/postprocess_lib.py:1087-1168``): the reference conditional pdf is
    a joint (y, z) KDE over all (y_i, sample) pairs divided by the y-marginal
    KDE, bw_method=1; the proposed conditional is the closed-form lognormal;
    the classical conditional is its own joint/marginal KDE; KLD per y =
    mean over that y's samples of (log q - log ref); the classical map takes
    |.| like the reference (``:1168``).
    """
    tm_p, tsg_p, zm_p, zs_p = [np.asarray(a) for a in proposed]
    tm_c, tsg_c = [np.asarray(a) for a in classical]
    n_y = y_data.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)

    # proposed lognormal samples + closed-form conditional log-density
    zs_e, zm_e = zs_p[:, None, :], zm_p[:, None, :]
    eps = np.asarray(jax.random.normal(k1, (n_y, num_sam, 2), dtype=jnp.float64))
    log_z_vi = np.sqrt(zs_e) * eps + zm_e
    z_vi = np.exp(log_z_vi)
    log_cond_vi = (
        -0.5 * np.log(4.0 * np.pi**2 * np.prod(zs_e, axis=2))
        - np.sum(log_z_vi, axis=2)
        - 0.5 * np.sum((log_z_vi - zm_e) ** 2 / zs_e, axis=2)
    )

    # shared reference: theta ~ q_proposed -> FEM h + eta
    if proposed_sampler is not None:
        k2a, k2b = jax.random.split(k2)
        z_ref = mc_z_samples_theta(
            k2b, batch_h, proposed_sampler(k2a, num_sam), sig_eta)
    else:
        z_ref = mc_z_samples(k2, batch_h, tm_p, tsg_p, sig_eta, num_sam)
    y_rep = np.repeat(y_data, num_sam, axis=0)  # (n_y*num_sam, 2)
    yz_ref = np.concatenate([y_rep, z_ref.reshape(-1, 2)], axis=1)
    kde_joint_ref = stats.gaussian_kde(yz_ref.T, bw_method=1.0)
    kde_marg_ref = stats.gaussian_kde(y_rep.T, bw_method=1.0)
    log_marg_ref = kde_marg_ref.logpdf(y_rep.T)

    # proposed KLD: E_q[log q - log ref] (``:1129-1131``)
    yz_vi = np.concatenate([y_rep, z_vi.reshape(-1, 2)], axis=1)
    log_cond_ref_at_vi = (kde_joint_ref.logpdf(yz_vi.T) - log_marg_ref).reshape(n_y, num_sam)
    kld_proposed = np.mean(log_cond_vi - log_cond_ref_at_vi, axis=1)

    # classical: own joint/marginal KDE conditional vs the shared reference
    # (``kld_2d_example_case4_method1``, ``:1134-1168``)
    z_cla = mc_z_samples(k3, batch_h, tm_c, tsg_c, sig_eta, num_sam)
    yz_cla = np.concatenate([y_rep, z_cla.reshape(-1, 2)], axis=1)
    log_cond_q = (
        stats.gaussian_kde(yz_cla.T, bw_method=1.0).logpdf(yz_cla.T)
        - stats.gaussian_kde(y_rep.T, bw_method=1.0).logpdf(y_rep.T)
    ).reshape(n_y, num_sam)
    log_cond_ref_at_cla = (kde_joint_ref.logpdf(yz_cla.T) - log_marg_ref).reshape(
        n_y, num_sam
    )
    kld_classical = np.abs(np.mean(log_cond_q - log_cond_ref_at_cla, axis=1))
    return kld_proposed, kld_classical


# ----------------------------------------------------------------------
# mean / variance fields (``plot_2d_nonlinear_mean_sig_case4``,
# ``src/postprocess_lib.py:1220-1380``)
# ----------------------------------------------------------------------

def mean_sig_fields(
    key,
    batch_h: Callable,
    proposed: tuple,
    classical: tuple,
    sig_eta: float,
    num_sam: int,
    proposed_sampler: Callable = None,
):
    """z mean/variance fields of the three models over a y-grid.

    ``proposed_sampler`` (see :func:`kld_maps`) swaps the reference field's
    Gaussian theta draws for exact samples of a non-Gaussian family.

    Returns dict with keys proposed/classical/reference, each a
    (z_mean (n_y, 2), z_sig (n_y, 2)) pair.

    proposed: closed-form lognormal moments (``:1236-1237``); classical:
    MC moments through FEM (``:1239-1254``); reference: the REAL MC
    estimator the reference comments out (``:1255-1265``) — theta from the
    proposed posterior, z = h + eta, sample moments — instead of the
    fabricated proposed*1.015 (``:1266-1267``, docs/DIVERGENCES.md).
    """
    tm_p, tsg_p, zm_p, zs_p = [np.asarray(a) for a in proposed]
    tm_c, tsg_c = [np.asarray(a) for a in classical]
    k1, k2 = jax.random.split(key)

    z_mean_prop = np.exp(0.5 * zs_p + zm_p)
    z_sig_prop = (np.exp(zs_p) - 1.0) * z_mean_prop**2

    z_cla = mc_z_samples(k1, batch_h, tm_c, tsg_c, sig_eta, num_sam)
    if proposed_sampler is not None:
        k2a, k2b = jax.random.split(k2)
        z_ref = mc_z_samples_theta(
            k2b, batch_h, proposed_sampler(k2a, num_sam), sig_eta)
    else:
        z_ref = mc_z_samples(k2, batch_h, tm_p, tsg_p, sig_eta, num_sam)

    return {
        "proposed": (z_mean_prop, z_sig_prop),
        "classical": (z_cla.mean(axis=1), z_cla.var(axis=1)),
        "reference": (z_ref.mean(axis=1), z_ref.var(axis=1)),
    }


def relative_error_fields(fields: dict, tol: float = 1e-6):
    """|model - ref| / |ref| for mean and variance, zeroed where |ref| < tol
    (``src/postprocess_lib.py:1309-1315,1358-1364``)."""
    zm_ref, zs_ref = fields["reference"]
    out = {}
    for name in ("proposed", "classical"):
        zm, zs = fields[name]
        em = np.abs((zm - zm_ref) / zm_ref)
        es = np.abs((zs - zs_ref) / zs_ref)
        em[np.abs(zm_ref) < tol] = 0.0
        es[np.abs(zs_ref) < tol] = 0.0
        out[name] = (em, es)
    return out
