"""Full-covariance amortized posterior (posterior="fullcov").

Beyond the reference (independent Gaussians per dim,
``main_custom_training.py:128-176``): on correlated posteriors the
mean-field ELBO optimum matches the PRECISION diagonal, so its marginal
stds underestimate the truth; the Cholesky head recovers the exact
covariance on linear-Gaussian problems where it is representable.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vbicm_tpu.config import ProblemConfig, TrainConfig
from vbicm_tpu.models.mlp import ThetaPosteriorFullCovNet, marginal_variance
from vbicm_tpu.vi.elbo import (
    make_loss_step1,
    make_loss_step1_fullcov,
    reparameterize_fullcov,
)
from vbicm_tpu.vi.train import TwoStepTrainer

# strongly correlated linear-Gaussian model: f = A theta, prior N(0, I)
A = np.array([[1.0, 1.0], [0.0, 0.15]])
SIG_E = 0.05  # noise VARIANCE
Y = np.array([0.9, 0.1])
# exact posterior: Prec = I + A^T A / sig_e, Sigma = Prec^-1,
# mu = Sigma A^T y / sig_e
PREC = np.eye(2) + A.T @ A / SIG_E
SIGMA = np.linalg.inv(PREC)
MU = SIGMA @ (A.T @ Y / SIG_E)


def _optimize(loss_builder, params, n_steps=6000, lr=2e-2, seed=0):
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def run(params, opt_state, key):
        def body(carry, k):
            p, o = carry

            def obj(p):
                e = jax.random.normal(k, (16, 2))
                return loss_builder(p, e)

            _, g = jax.value_and_grad(obj)(p)
            up, o = opt.update(g, o, p)
            return (optax.apply_updates(p, up), o), None

        (params, opt_state), _ = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, n_steps)
        )
        return params

    return run(params, opt_state, jax.random.PRNGKey(seed))


def test_fullcov_recovers_correlated_gaussian_exactly():
    """Direct (mu, L) optimization of the full-covariance step-1 ELBO on a
    correlated linear-Gaussian model recovers the EXACT posterior mean and
    covariance; the mean-field optimum on the same problem lands on the
    precision diagonal, underestimating the dominant marginal ~4x."""
    f = lambda th: th @ jnp.asarray(A).T
    y = jnp.asarray(Y)[None, :]

    fc_loss = make_loss_step1_fullcov(f, jnp.zeros((16, 2)), SIG_E)

    def fc_obj(p, e):
        mu, log_diag, off = p
        L = jnp.zeros((1, 2, 2))
        L = L.at[:, 1, 0].set(off)
        L = L.at[:, 0, 0].set(jnp.exp(0.5 * log_diag[:, 0]))
        L = L.at[:, 1, 1].set(jnp.exp(0.5 * log_diag[:, 1]))
        return fc_loss(y, (mu, L, log_diag), e)

    p0 = (jnp.zeros((1, 2)), jnp.zeros((1, 2)), jnp.zeros((1,)))
    mu, log_diag, off = _optimize(fc_obj, p0)
    L = np.zeros((2, 2))
    L[0, 0] = np.exp(0.5 * float(log_diag[0, 0]))
    L[1, 1] = np.exp(0.5 * float(log_diag[0, 1]))
    L[1, 0] = float(off[0])
    cov = L @ L.T
    np.testing.assert_allclose(np.asarray(mu)[0], MU, atol=0.05)
    np.testing.assert_allclose(cov, SIGMA, rtol=0.15, atol=5e-4)

    # mean-field control: fitted variances track 1/diag(Prec), NOT the
    # marginals Sigma_ii — the measured underdispersion the Cholesky head
    # removes (Sigma_00 / (1/Prec_00) ~ 17x here)
    mf_loss = make_loss_step1(f, jnp.zeros((16, 2)), SIG_E, "per_sample")

    def mf_obj(p, e):
        mu, log_sig = p
        return mf_loss(y, (mu, jnp.exp(log_sig), log_sig), e)

    mu_mf, log_sig_mf = _optimize(mf_obj, (jnp.zeros((1, 2)), jnp.zeros((1, 2))))
    var_mf = np.exp(np.asarray(log_sig_mf))[0]
    np.testing.assert_allclose(var_mf, 1.0 / np.diag(PREC), rtol=0.3)
    assert SIGMA[0, 0] > 5.0 * var_mf[0]  # the mean-field gap is real


def test_fullcov_net_shapes_and_meanfield_init():
    """Cholesky head: L lower-triangular with exp(0.5*log_diag) diagonal;
    zero-initialized off-diagonal head -> starts exactly mean-field."""
    net = ThetaPosteriorFullCovNet(hidden=16, n_layers=2, theta_dim=3)
    y = jnp.ones((4, 5))
    params = net.init(jax.random.PRNGKey(0), y)
    tm, L, log_diag = net.apply(params, y)
    assert tm.shape == (4, 3) and L.shape == (4, 3, 3) and log_diag.shape == (4, 3)
    L_np = np.asarray(L)
    assert np.allclose(np.triu(L_np, 1), 0.0)  # upper always zero
    assert np.allclose(np.tril(L_np, -1), 0.0)  # zero-init off-diag
    np.testing.assert_allclose(
        np.asarray(marginal_variance(L)), np.exp(np.asarray(log_diag)), rtol=1e-12
    )
    th = reparameterize_fullcov(tm, L, jnp.zeros((2, 3)))
    np.testing.assert_allclose(
        np.asarray(th), np.repeat(np.asarray(tm), 2, axis=0), rtol=1e-12
    )


def test_fullcov_trainer_end_to_end():
    """TwoStepTrainer(posterior="fullcov") end-to-end on a correlated
    linear map: both steps run, bridge samples through L, predict returns
    marginal variances, predict_cholesky the factor."""

    def fh(th):
        f = jnp.asarray(A) @ th
        h = jnp.exp(0.2 * th[:1] + 1.0)
        return f, h

    rng = np.random.default_rng(0)
    n = 96
    thetas = rng.standard_normal((n, 2))
    y_data = thetas @ A.T + np.sqrt(SIG_E) * rng.standard_normal((n, 2))
    e_data = rng.standard_normal((4, 2))

    cfg = ProblemConfig(theta_dim=2, y_dim=2, z_dim=1, sig_e=SIG_E, sig_eta=1e-4)
    tcfg = TrainConfig(batch_size=32, num_epoch1=3, num_epoch2=2,
                       pairing="per_sample", posterior="fullcov",
                       resample_e=True, num_neuron=16, scan_epochs=False)
    tr = TwoStepTrainer(None, cfg, tcfg, fh=fh)
    res = tr.fit(y_data, e_data, jax.random.PRNGKey(1))
    assert np.isfinite(res.hist_step1).all() and np.isfinite(res.hist_step2).all()
    tm, tsig, zm, zs = tr.predict(res.theta_params, res.z_params, y_data[:5])
    assert tsig.shape == (5, 2) and np.all(np.asarray(tsig) > 0)
    mu, L = tr.predict_cholesky(res.theta_params, y_data[:5])
    np.testing.assert_allclose(
        np.asarray(marginal_variance(L)), np.asarray(tsig), rtol=1e-12
    )

    with pytest.raises(ValueError, match="per_sample"):
        TwoStepTrainer(None, cfg, TrainConfig(posterior="fullcov"), fh=fh)
    with pytest.raises(ValueError, match="posterior family"):
        TwoStepTrainer(None, cfg, TrainConfig(posterior="wat"), fh=fh)
