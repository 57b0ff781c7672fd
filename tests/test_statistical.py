"""Statistical validation (BASELINE 'posterior accuracy'): the trained VI
posterior must agree with the MCMC reference posterior on the same FEM model,
and the step-2 predictive must match the posterior-predictive moments.

Uses the mathematically-correct per-sample ELBO pairing for a clean
statistical check (the reference-cross mode is parity-tested elsewhere).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import ProblemConfig, TrainConfig
from vbicm_tpu.eval.mcmc import make_fem_logpost, metropolis, posterior_predictive_z
from vbicm_tpu.prob.datagen import generate_data_fem
from vbicm_tpu.solver import make_fh_fun
from vbicm_tpu.vi.train import TwoStepTrainer


@pytest.fixture(scope="module")
def trained(cooks_model):
    # amortization needs data: with 1024 points / 120 epochs the VI
    # conditional means track MCMC to <0.1 (verified empirically); smaller
    # runs underfit the inference net, not the method.
    fh = make_fh_fun(cooks_model)
    ds = generate_data_fem(
        jax.random.PRNGKey(7), jax.jit(jax.vmap(fh)), n_sam=1024, ne_sam=8
    )
    tcfg = TrainConfig(
        batch_size=64, num_epoch1=120, num_epoch2=100, pairing="per_sample"
    )
    trainer = TwoStepTrainer(cooks_model, ProblemConfig(), tcfg)
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(8))
    return cooks_model, trainer, res, ds


def test_vi_posterior_vs_mcmc(trained):
    model, trainer, res, ds = trained
    fh = make_fh_fun(model)
    y_test = ds.y_data[3]

    tm, tsig, _, _ = trainer.predict(res.theta_params, res.z_params, y_test[None])
    tm, tsig = np.asarray(tm)[0], np.asarray(tsig)[0]

    logpost = make_fem_logpost(fh, y_test, sig_e=trainer.cfg.sig_e)
    mc = metropolis(
        jax.random.PRNGKey(9), logpost, d=2, n_samples=1500, burn=500,
        n_chains=8, step_size=0.6,
    )
    s = mc.samples.reshape(-1, 2)

    # theta_1 (E-scale) is identified by the data: VI and MCMC must agree
    assert abs(tm[0] - s[:, 0].mean()) < 0.25, (tm, s.mean(axis=0))
    # theta_2 is barely identified -> posterior ~ prior; both should say so
    assert abs(tm[1] - s[:, 1].mean()) < 0.5
    assert 0.5 < np.sqrt(tsig[1]) < 1.5  # near the prior std 1
    # posterior std of theta_1: same order between VI and MCMC (mean-field
    # VI typically slightly tighter)
    ratio = np.sqrt(tsig[0]) / s[:, 0].std()
    assert 0.4 < ratio < 1.8, ratio


def test_step2_predictive_matches_posterior_moments(trained):
    model, trainer, res, ds = trained
    _, _, zm, zs = trainer.predict(res.theta_params, res.z_params, ds.y_data)
    # step-2 anchors z_mean/z_sig to the cached bridge moments
    rmse_m = float(np.sqrt(np.mean((np.asarray(zm) - res.logz_mean_post) ** 2)))
    assert rmse_m < 0.08, rmse_m
    # predictive median exp(z_mean) should be near the observed z scale
    med = np.exp(np.asarray(zm))
    assert 0.5 < float(np.median(med / ds.z_data)) < 2.0


def test_predictive_vs_mcmc_posterior_predictive(trained):
    model, trainer, res, ds = trained
    fh = make_fh_fun(model)
    y_test = ds.y_data[3]
    _, _, zm, zs = trainer.predict(res.theta_params, res.z_params, y_test[None])
    zm = np.asarray(zm)[0]

    logpost = make_fem_logpost(fh, y_test, sig_e=trainer.cfg.sig_e)
    mc = metropolis(
        jax.random.PRNGKey(10), logpost, d=2, n_samples=1000, burn=400,
        n_chains=8, step_size=0.6,
    )
    s = mc.samples.reshape(-1, 2)
    z_mc = posterior_predictive_z(
        jax.random.PRNGKey(11), jax.jit(jax.vmap(fh)), s[:2000], trainer.cfg.sig_eta
    )
    # compare log-z means: VI predictive vs MCMC posterior predictive
    logz_mc = np.log(z_mc).mean(axis=0)
    np.testing.assert_allclose(zm, logz_mc, atol=0.25)
