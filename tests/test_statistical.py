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

    # chain quality gate: the "ground truth" must itself be converged
    # (round-2 weak #8: tolerances were hand-picked with no ESS control)
    assert np.all(mc.rhat < 1.05), mc.rhat
    assert np.all(mc.ess > 200), mc.ess
    mcse = mc.mean_mcse()

    # theta_1 (E-scale) is identified by the data: VI and MCMC must agree
    # within a VI-approximation budget (0.15, calibrated: this config
    # empirically tracks to <0.1) plus the chain's own uncertainty
    assert abs(tm[0] - s[:, 0].mean()) < 0.15 + 5 * mcse[0], (tm, s.mean(axis=0))
    # theta_2 is barely identified -> posterior ~ prior; both should say so
    assert abs(tm[1] - s[:, 1].mean()) < 0.4 + 5 * mcse[1]
    assert 0.6 < np.sqrt(tsig[1]) < 1.4  # near the prior std 1
    # posterior std of theta_1: same order between VI and MCMC (mean-field
    # VI typically slightly tighter)
    ratio = np.sqrt(tsig[0]) / s[:, 0].std()
    assert 0.5 < ratio < 1.6, ratio


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


@pytest.mark.slow
def test_posterior_accuracy_vs_mcmc_quantified(cooks_model):
    """Quantified, reference-anchored posterior accuracy (round-1 review
    item: pin VI vs MCMC with real tolerances).

    Finding that calibrates the bounds (docs/PARITY.md): the REFERENCE'S OWN
    trained posterior does not track the per-y exact posterior — its
    cross-pairing term2 (each y against every FEM sample in the batch,
    main_custom_training.py:199-214) optimizes an AGGREGATE posterior whose
    mean is nearly y-independent (~0.16 for all y) and whose variance is
    ~1.8x the exact one. The mathematically-intended per-sample pairing
    (TrainConfig.pairing='per_sample') DOES track MCMC. This test trains the
    per-sample mode briefly and pins it to MCMC with calibrated tolerances:
    25 epochs / n=2048 gives |VI mean - MCMC mean| <= 0.45 at probe y's with
    strongly y-dependent MCMC means (range ~1.4), and variance ratio in
    [0.8, 2.5] (the ne_sam=4 common-random-number design bounds how sharp
    the variance estimate can get).
    """
    import jax
    import jax.numpy as jnp

    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.eval.mcmc import make_fem_logpost, metropolis
    from vbicm_tpu.prob.datagen import load_dataset
    from vbicm_tpu.solver import make_fh_fun
    from vbicm_tpu.vi.train import TwoStepTrainer

    import os

    ds_path = "/root/reference/data_fem_test_big_noise.h5"
    if not os.path.exists(ds_path):
        pytest.skip("reference dataset absent")
    cfg = ProblemConfig()
    ds = load_dataset(ds_path)
    y = jnp.asarray(ds.y_data[:2048])
    e = jnp.asarray(ds.e_data)

    tcfg = TrainConfig(batch_size=64, num_epoch1=25, pairing="per_sample")
    tr = TwoStepTrainer(cooks_model, cfg, tcfg, results_path=None, verbose=False)
    params, _ = tr.train_step1(y, e, jax.random.PRNGKey(5))

    fh = make_fh_fun(cooks_model, cfg)
    diffs, ratios, mcmc_means = [], [], []
    for iy in (0, 7, 42):
        y0 = jnp.asarray(ds.y_data[iy])
        tm, tsg, _ = tr.theta_net.apply(params, y0[None])
        logpost = make_fem_logpost(fh, y0, cfg.sig_e)
        ch = metropolis(jax.random.PRNGKey(iy), logpost, n_chains=8,
                        n_samples=2000, burn=800, step_size=0.4)
        assert np.all(ch.rhat < 1.05), (iy, ch.rhat)
        assert np.all(ch.ess > 200), (iy, ch.ess)
        s = np.asarray(ch.samples.reshape(-1, 2))
        diffs.append(abs(float(tm[0, 0]) - s[:, 0].mean()))
        ratios.append(float(tsg[0, 0]) / s[:, 0].var())
        mcmc_means.append(s[:, 0].mean())

    # the probe posteriors really are y-dependent (spread ~1.4 units)...
    assert max(mcmc_means) - min(mcmc_means) > 0.8, mcmc_means
    # ...and the per-sample VI tracks them within the calibrated band
    assert max(diffs) < 0.45, (diffs, mcmc_means)
    assert all(0.8 < r < 2.5 for r in ratios), ratios
