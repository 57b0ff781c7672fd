"""Normalizing-flow posterior family (models.flow + vi pipeline wiring).

The flow generalizes the reference's posterior-family slot
(``main_custom_training.py:128-176``): its two Gaussian families
(mean-field reference head, full-covariance Cholesky head) cannot
represent a curved posterior no matter how the moments are fit. Tests:

  * the free sharp test — zero-initialized couplings make the flow EXACTLY
    the mean-field base at init (samples and log-density, to the ulp);
  * two-step training end-to-end (step 1 + bridge + step 2 + predict +
    sample_theta + export) for the flow family;
  * the existence proof — on a banana posterior (y = theta2 + a*theta1^2)
    the trained flow's full-data ELBO beats the trained full-covariance
    Gaussian's by a clear margin (lower loss = smaller KL(q || posterior),
    same normalizer, same data).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import ProblemConfig, TrainConfig
from vbicm_tpu.models.flow import ThetaPosteriorFlowNet, flow_moments
from vbicm_tpu.prob.analytic import (
    f_fun_2d_case3,
    generate_data_2d_case3,
    h_fun_2d_case3,
)
from vbicm_tpu.prob.datagen import generate_data_fem
from vbicm_tpu.vi.elbo import make_loss_step1_flow, make_loss_step1_fullcov
from vbicm_tpu.vi.train import TwoStepTrainer


def _fh_case3(theta):
    return f_fun_2d_case3(theta), h_fun_2d_case3(theta)


def test_flow_init_equals_meanfield_base():
    """Zero-init couplings: theta == mu + exp(0.5*log_sig)*e and logq ==
    the exact diagonal-Gaussian log-density — bitwise-level agreement, no
    tolerance games."""
    net = ThetaPosteriorFlowNet()
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(jax.random.PRNGKey(1), (5, 2), jnp.float64)
    e = jax.random.normal(jax.random.PRNGKey(2), (7, 2), jnp.float64)
    params = net.init(key, y, e)
    theta, logq = net.apply(params, y, e)
    mu, log_sig = net.apply(params, y, method=ThetaPosteriorFlowNet.base)
    theta_base = mu[:, None, :] + jnp.exp(0.5 * log_sig)[:, None, :] * e[None]
    np.testing.assert_array_equal(np.asarray(theta), np.asarray(theta_base))
    logq_base = (
        -0.5 * 2 * math.log(2 * math.pi)
        - 0.5 * jnp.sum(e**2, axis=-1)[None, :]
        - 0.5 * jnp.sum(log_sig, axis=-1)[:, None]
    )
    np.testing.assert_array_equal(np.asarray(logq), np.asarray(logq_base))


def test_flow_logq_change_of_variables():
    """After a gradient-free random perturbation of the coupling heads, the
    reported logq still satisfies the change of variables: density of the
    pushforward checked against a numerical Jacobian of e -> theta."""
    net = ThetaPosteriorFlowNet(n_couplings=2)
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 2), jnp.float64)
    e = jax.random.normal(jax.random.PRNGKey(2), (1, 2), jnp.float64)
    params = net.init(jax.random.PRNGKey(0), y, e)
    # make the couplings non-trivial
    params = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jax.random.normal(jax.random.PRNGKey(3), a.shape, a.dtype),
        params,
    )

    def push(e_vec):
        theta, _ = net.apply(params, y, e_vec[None, :])
        return theta[0, 0]

    theta, logq = net.apply(params, y, e)
    J = jax.jacfwd(push)(e[0])
    # q(theta) = N(e) / |det J|
    log_n_e = -math.log(2 * math.pi) - 0.5 * float(jnp.sum(e**2))
    expected = log_n_e - float(jnp.log(jnp.abs(jnp.linalg.det(J))))
    assert abs(float(logq[0, 0]) - expected) < 1e-10


@pytest.mark.slow
def test_flow_two_step_end_to_end():
    """fit() for posterior='flow' runs step 1 + bridge + step 2 and every
    eval surface (predict moments, family-agnostic sampling, export)."""
    ds = generate_data_2d_case3(jax.random.PRNGKey(0), 64)
    cfg = ProblemConfig(theta_dim=2, y_dim=2, z_dim=2, sig_e=0.1**2,
                        sig_eta=0.01**2)
    tcfg = TrainConfig(batch_size=16, num_epoch1=3, num_epoch2=3,
                       pairing="per_sample", posterior="flow")
    tr = TwoStepTrainer(None, cfg, tcfg, fh=_fh_case3)
    res = tr.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(1))
    assert np.isfinite(res.hist_step1).all()
    assert np.isfinite(res.hist_step2).all()

    tm, tsig, zm, zs = tr.predict(res.theta_params, res.z_params,
                                  ds.y_data[:4])
    assert tm.shape == (4, 2) and tsig.shape == (4, 2)
    assert np.isfinite(np.asarray(tsig)).all() and (np.asarray(tsig) > 0).all()

    th = tr.sample_theta(res.theta_params, ds.y_data[:4], ds.e_data)
    assert th.shape == (4, ds.e_data.shape[0], 2)

    # flow_moments agrees with a direct MC estimate through the net
    key = jax.random.PRNGKey(7)
    m, v = flow_moments(tr.theta_net, res.theta_params, ds.y_data[:4], key,
                        n_mc=128)
    e = jax.random.normal(key, (128, 2), jnp.float64)
    th2, _ = tr.theta_net.apply(res.theta_params, jnp.asarray(ds.y_data[:4]),
                                e)
    np.testing.assert_allclose(np.asarray(m), np.asarray(jnp.mean(th2, 1)),
                               rtol=1e-12)

    # export: the MC-moment server round-trips through StableHLO
    from vbicm_tpu.utils.export import export_fn, load_exported, make_vi_server

    e_mc = jax.random.normal(jax.random.PRNGKey(9), (32, 2), jnp.float64)
    srv = make_vi_server(tr.theta_net, res.theta_params, tr.z_net,
                         res.z_params, flow_e=e_mc)
    blob = export_fn(srv, jnp.asarray(ds.y_data[:4]), batch_polymorphic=True)
    out = load_exported(blob)(jnp.asarray(ds.y_data[:8]))
    ref = srv(jnp.asarray(ds.y_data[:8]))
    np.testing.assert_allclose(np.asarray(out["theta_mean"]),
                               np.asarray(ref["theta_mean"]), rtol=1e-12)


@pytest.mark.slow
def test_flow_beats_gaussian_on_banana():
    """On the banana posterior y = theta2 + a*theta1^2 + eps the flow's
    trained full-data ELBO beats the full-covariance Gaussian's: the KL gap
    of the best Gaussian to the curved posterior is structural (no moment
    fit removes the curvature), the affine couplings bend with it.
    Calibrated margin: measured gap ~1.5 nats at this budget; asserted 0.5.
    """
    a = 2.0

    def fh(th):
        y = (th[1] + a * th[0] ** 2)[None]
        h = (jnp.exp(0.3 * th[0]) + 0.2)[None]
        return y, h

    sig_e = 0.05**2
    ds = generate_data_fem(
        jax.random.PRNGKey(0), jax.jit(jax.vmap(fh)), n_sam=512, ne_sam=8,
        d_y=1, d_theta=2, sig_e=sig_e, sig_eta=1e-4,
    )
    ynorm = (np.mean(ds.y_data, 0), np.std(ds.y_data, 0))
    cfg = ProblemConfig(theta_dim=2, y_dim=1, z_dim=1, sig_e=sig_e,
                        sig_eta=1e-4)
    batch_f = lambda th: jax.vmap(fh)(th)[0]
    e_eval = jax.random.normal(jax.random.PRNGKey(99), (64, 2), jnp.float64)

    evals = {}
    for fam in ("fullcov", "flow"):
        tcfg = TrainConfig(batch_size=64, num_epoch1=300,
                           pairing="per_sample", posterior=fam,
                           scan_epochs=True)
        tr = TwoStepTrainer(None, cfg, tcfg, fh=fh, y_norm=ynorm)
        p, _ = tr.train_step1(ds.y_data, ds.e_data, jax.random.PRNGKey(2))
        if fam == "flow":
            lf = make_loss_step1_flow(batch_f, sig_e)
            out = tr.theta_net.apply(p, jnp.asarray(ds.y_data), e_eval)
            evals[fam] = float(lf(jnp.asarray(ds.y_data), out))
        else:
            lf = make_loss_step1_fullcov(batch_f, e_eval, sig_e)
            out = tr.theta_net.apply(p, jnp.asarray(ds.y_data))
            evals[fam] = float(lf(jnp.asarray(ds.y_data), out))
    assert evals["flow"] < evals["fullcov"] - 0.5, evals
