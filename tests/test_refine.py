"""Semi-amortized per-observation refinement (`vi.refine`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.vi.refine import refine_posterior

A = np.array([[1.0, 1.0], [0.0, 0.15]])
SIG_E = 0.05
Y = np.array([0.9, 0.1])
PREC = np.eye(2) + A.T @ A / SIG_E
SIGMA = np.linalg.inv(PREC)
MU = SIGMA @ (A.T @ Y / SIG_E)


def test_refine_recovers_exact_posterior_from_collapsed_init():
    """From a deliberately COLLAPSED init (the amortization-gap failure
    mode: tiny variances, biased mean), refinement converges to the exact
    correlated posterior."""
    batch_f = lambda th: th @ jnp.asarray(A).T
    mu0 = jnp.asarray(MU + 0.5)  # biased
    L0 = 0.01 * jnp.eye(2)  # collapsed
    mu, L, losses = refine_posterior(
        batch_f, Y, SIG_E, mu0, L0, key=jax.random.PRNGKey(0),
        steps=4000, ne=16, lr=2e-2,
    )
    np.testing.assert_allclose(np.asarray(mu), MU, atol=0.05)
    np.testing.assert_allclose(np.asarray(L @ L.T), SIGMA, rtol=0.2, atol=5e-4)
    assert float(losses[-100:].mean()) < float(losses[:100].mean())


@pytest.mark.slow
def test_refine_field_posterior_matches_laplace():
    """Through the FEM field solver: the refined q matches the Laplace
    approximation of the same log-posterior (near-Gaussian target) in both
    mean and marginal stds."""
    from vbicm_tpu.config import ProblemConfig
    from vbicm_tpu.eval import laplace_posterior
    from vbicm_tpu.eval.mcmc import make_fem_logpost
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.prob.randomfield import build_kl_expansion, make_fh_fun_field

    model = build_fem_model(cooks_membrane_mesh(10, 5), dense=True)
    kl = build_kl_expansion(model, n_modes=4, corr_len=15.0, sigma=0.3)
    cfg = ProblemConfig(theta_dim=4, y_dim=2 * 8, ele_id=5, sig_e=1e-3)
    probes = tuple(range(8, 55, 6))
    fh = make_fh_fun_field(model, kl, cfg, probe_nodes=probes, tol=1e-11)
    theta_true = jnp.asarray([0.7, -0.4, 0.2, 0.9])
    y_obs = fh(theta_true)[0] + 0.01

    lres = laplace_posterior(
        make_fem_logpost(fh, y_obs, cfg.sig_e), jnp.zeros(4), tol=1e-7
    )
    batch_f = lambda th: jax.vmap(fh)(th)[0]
    # warm init, as in the intended use (the amortized head's output is
    # within a few tenths of the mode with O(0.1-1) scales); a cold
    # N(0, I) start needs several times more steps — the broad-q phase
    # floods Adam's second moments with huge likelihood-misfit gradients
    mu0 = jnp.asarray(theta_true) + jnp.asarray([0.3, -0.25, 0.3, -0.3])
    L0 = 0.3 * jnp.eye(4)
    mu, L, _ = refine_posterior(
        batch_f, y_obs, cfg.sig_e, mu0, L0,
        key=jax.random.PRNGKey(1), steps=3000, ne=16, lr=1e-2,
    )
    vi_std = np.sqrt(np.asarray(jnp.sum(L**2, -1)))
    la_std = np.sqrt(np.diag(lres.cov))
    # mean agreement in POSTERIOR-std units (weak directions are broad, and
    # the VI mean is the posterior mean, not the mode, off-Gaussian)
    zgap = np.abs(np.asarray(mu) - lres.theta_map) / la_std
    assert np.all(zgap < 0.6), (zgap, la_std)
    ratio = vi_std / la_std
    assert np.all(ratio > 0.7) and np.all(ratio < 1.4), ratio


def test_refine_chunked_matches_monolithic():
    """chunk_steps carries the optimizer state and the lr schedule's step
    count across device programs, so the trajectory is IDENTICAL to the
    single-scan form (same keys, same updates) — including a tail chunk
    that does not divide steps evenly."""
    f = lambda th: jnp.tanh(th) * jnp.asarray([2.0, -1.0])
    batch_f = lambda th: f(th)
    y = jnp.asarray([0.8, -0.2])
    kw = dict(key=jax.random.PRNGKey(3), steps=50, ne=4, lr=5e-2)
    mu0, L0 = jnp.zeros(2), 0.4 * jnp.eye(2)
    mu_a, L_a, h_a = refine_posterior(batch_f, y, 0.05, mu0, L0, **kw)
    mu_b, L_b, h_b = refine_posterior(batch_f, y, 0.05, mu0, L0,
                                      chunk_steps=15, **kw)
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_a), atol=1e-12)
    np.testing.assert_allclose(np.asarray(L_b), np.asarray(L_a), atol=1e-12)
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_a), atol=1e-10)
