"""VI layer tests: ELBO terms, dataset generation, two-step training smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import ProblemConfig, TrainConfig
from vbicm_tpu.prob.datagen import generate_data_fem, load_dataset, save_dataset
from vbicm_tpu.solver import make_fh_fun
from vbicm_tpu.vi.elbo import (
    make_loss_step1,
    moment_match_loss,
    reparameterize,
    term1,
    term2,
    term3,
    term4,
    term5,
)
from vbicm_tpu.vi.train import TwoStepTrainer


def test_term1_term3_closed_form():
    # for log_sig = 0 (sig = 1), mean = 0: term1 = -0.5 d log 2pi - 0.5 d
    d = 2
    ls = jnp.zeros((5, d))
    np.testing.assert_allclose(
        float(term1(ls)), -0.5 * d * np.log(2 * np.pi) - 0.5 * d, atol=1e-12
    )
    tm = jnp.zeros((5, d))
    tsig = jnp.ones((5, d))
    np.testing.assert_allclose(
        float(term3(tm, tsig)), -0.5 * d * np.log(2 * np.pi) - 0.5 * d, atol=1e-12
    )


def test_reparameterize_layout():
    tm = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    tsig = jnp.ones((2, 2)) * 4.0
    e = jnp.array([[0.5, -0.5], [1.0, 1.0], [0.0, 0.0]])
    th = reparameterize(tm, tsig, e)
    assert th.shape == (6, 2)
    # row ordering: y0's ne samples first, then y1's
    np.testing.assert_allclose(np.asarray(th[0]), [1 + 2 * 0.5, 2 - 2 * 0.5])
    np.testing.assert_allclose(np.asarray(th[3]), [3 + 2 * 0.5, 4 - 2 * 0.5])


def test_term2_cross_vs_per_sample():
    """Cross pairing (reference broadcast) vs per-sample pairing differ
    unless B = 1, in which case they coincide."""
    key = jax.random.PRNGKey(0)
    f = lambda th: th * 2.0  # identity-ish linear map
    y = jax.random.normal(key, (3, 2))
    tm = jax.random.normal(jax.random.PRNGKey(1), (3, 2))
    tsig = jnp.ones((3, 2)) * 0.1
    e = jax.random.normal(jax.random.PRNGKey(2), (4, 2))
    t_cross = float(term2(y, tm, tsig, e, f, 0.1, "cross"))
    t_per = float(term2(y, tm, tsig, e, f, 0.1, "per_sample"))
    assert t_cross != pytest.approx(t_per)
    t_cross1 = float(term2(y[:1], tm[:1], tsig, e, f, 0.1, "cross"))
    t_per1 = float(term2(y[:1], tm[:1], tsig[:1], e, f, 0.1, "per_sample"))
    np.testing.assert_allclose(t_cross1, t_per1, rtol=1e-12)


def test_step1_grad_finite_at_variance_underflow():
    """Collapsed variance head (log_sig so negative that exp(log_sig)
    flushes to 0) must NOT produce a NaN gradient: the loss value stays
    finite, so without the exp(0.5*log_sig) reparameterization the 0*inf
    chain rule of sqrt(exp(.)) silently poisons the optimizer (observed at
    epoch 19 of the sharp-likelihood random-field run before one NaN batch
    killed it)."""
    f = lambda th: jnp.sin(th)
    e = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2)))
    loss_fn = make_loss_step1(f, e, 1e-3, "per_sample")
    y = jnp.asarray(np.random.default_rng(1).normal(size=(3, 2)))

    def objective(lts):
        tm = jnp.zeros((3, 2))
        return loss_fn(y, (tm, jnp.exp(lts), lts))

    for bad in (-800.0, -100.0, -38.0):  # f64 underflow, TPU f32 flush, edge
        lts = jnp.full((3, 2), bad)
        val, grad = jax.value_and_grad(objective)(lts)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all(), f"NaN grad at lts={bad}"


def test_resample_e_calibrates_linear_gaussian():
    """With fresh reparameterization draws every step (resample_e), the
    step-1 ELBO fixed point is the TRUE posterior: for the linear-Gaussian
    case-1 model (f = 2*theta, prior N(0,1)) the closed-form posterior for
    one y is N(2y/sig_e / (1 + 4/sig_e), 1/(1 + 4/sig_e)). Optimizing
    (mu, log_sig) directly through make_loss_step1 must recover both to a
    few percent — the calibration property the fixed-CRN reference scheme
    does not have (it fits the particular ne_sam draws)."""
    import optax

    sig_e = 0.1
    yv = 1.3
    prec = 1.0 + 4.0 / sig_e
    post_mean = (2.0 * yv / sig_e) / prec
    post_var = 1.0 / prec

    f = lambda th: 2.0 * th
    e_shape = (8, 1)
    loss_fn = make_loss_step1(f, jnp.zeros(e_shape), sig_e, "per_sample")
    y = jnp.array([[yv]])

    opt = optax.adam(2e-2)
    params = (jnp.zeros((1, 1)), jnp.zeros((1, 1)))  # (mu, log_sig)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def obj(p):
            mu, lts = p
            e = jax.random.normal(key, e_shape)
            return loss_fn(y, (mu, jnp.exp(lts), lts), e)

        _, grads = jax.value_and_grad(obj)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    @jax.jit
    def run(params, opt_state, key):
        def body(carry, k):
            p, o = carry
            return step(p, o, k), None

        keys = jax.random.split(key, 4000)
        (params, opt_state), _ = jax.lax.scan(body, (params, opt_state), keys)
        return params

    mu, lts = run(params, opt_state, jax.random.PRNGKey(0))
    # average the tail jitter out with a second short run at lower lr
    assert abs(float(mu[0, 0]) - post_mean) < 0.05 * abs(post_mean) + 0.02
    got_var = float(jnp.exp(lts[0, 0]))
    assert abs(got_var - post_var) < 0.3 * post_var, (got_var, post_var)


def test_term2_manual_value():
    """term2 cross mode against a hand-rolled numpy evaluation."""
    rng = np.random.default_rng(0)
    y = rng.normal(size=(2, 2))
    tm = rng.normal(size=(2, 2))
    tsig = np.abs(rng.normal(size=(2, 2))) + 0.5
    e = rng.normal(size=(3, 2))
    sig_e = 0.1
    f = lambda th: jnp.sin(th)
    theta = e[None] * np.sqrt(tsig)[:, None] + tm[:, None]  # (2, 3, 2)
    f_np = np.sin(theta.reshape(-1, 2))  # (6, 2)
    l2 = -0.5 / sig_e * ((y[:, None, :] - f_np[None]) ** 2).sum(-1)  # (2, 6)
    expected = -0.5 * 2 * np.log(2 * np.pi * sig_e) + l2.mean()
    got = float(term2(jnp.asarray(y), jnp.asarray(tm), jnp.asarray(tsig), jnp.asarray(e), f, sig_e))
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_term4_term5_shapes_and_values():
    rng = np.random.default_rng(1)
    zm = jnp.asarray(rng.normal(size=(3, 2)) * 0.1)
    lzs = jnp.asarray(rng.normal(size=(3, 2)) * 0.1)
    zs = jnp.exp(lzs)
    t4 = float(term4(zm, lzs))
    d = 2
    expected4 = (
        float(jnp.mean(-0.5 * jnp.sum(lzs, -1) - jnp.sum(zm, -1)))
        - 0.5 * d * np.log(2 * np.pi)
        - 0.5 * d
    )
    np.testing.assert_allclose(t4, expected4, rtol=1e-12)

    tm = jnp.asarray(rng.normal(size=(3, 2)))
    tsig = jnp.ones((3, 2)) * 0.2
    e = jnp.asarray(rng.normal(size=(4, 2)))
    h = lambda th: jnp.exp(0.1 * th) + 1.0
    t5 = float(term5(tm, tsig, zm, zs, e, h, 3e-3))
    assert np.isfinite(t5)


@pytest.fixture(scope="module")
def small_fem_data(cooks_model):
    fh = make_fh_fun(cooks_model)
    batch_fh = jax.jit(jax.vmap(fh))
    ds = generate_data_fem(
        jax.random.PRNGKey(0), batch_fh, n_sam=64, ne_sam=4, sig_e=1e-1, sig_eta=3e-3
    )
    return ds


def test_generate_data_fem(small_fem_data):
    ds = small_fem_data
    assert ds.y_data.shape == (64, 2)
    assert ds.z_data.shape == (64, 2)
    assert ds.e_data.shape == (4, 2)
    assert np.all(ds.z_data > 0)  # von Mises + small noise stays positive
    np.testing.assert_allclose(ds.log_z_data, np.log(ds.z_data), atol=1e-12)


def test_dataset_roundtrip(tmp_path, small_fem_data):
    p = str(tmp_path / "ds.h5")
    save_dataset(small_fem_data, p)
    ds2 = load_dataset(p)
    np.testing.assert_allclose(ds2.y_data, small_fem_data.y_data)
    np.testing.assert_allclose(ds2.e_data, small_fem_data.e_data)


def test_load_reference_dataset():
    import os

    path = "/root/reference/data_fem_test_big_noise.h5"
    if not os.path.exists(path):
        pytest.skip("reference mount absent")
    ds = load_dataset(path)
    assert ds.y_data.shape == (10000, 2)
    assert ds.e_data.shape == (4, 2)
    # values consistent with the generating process
    assert np.all(ds.z_data > 0)
    assert abs(ds.y_data.mean()) < 10


@pytest.mark.slow
def test_two_step_training_smoke(cooks_model, small_fem_data):
    """Short run: both losses must decrease (BASELINE configs[2/3] smoke)."""
    ds = small_fem_data
    tcfg = TrainConfig(batch_size=32, num_epoch1=5, num_epoch2=5)
    trainer = TwoStepTrainer(cooks_model, ProblemConfig(), tcfg)
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(0))
    assert res.hist_step1[-1] < res.hist_step1[0]
    assert res.hist_step2[-1] < res.hist_step2[0]
    assert np.isfinite(res.hist_step1).all() and np.isfinite(res.hist_step2).all()
    # predictive moments should be close to the bridge targets after step 2
    tm, tsig, zm, zs = trainer.predict(res.theta_params, res.z_params, ds.y_data)
    assert zm.shape == (64, 2)
    mse = float(np.mean((np.asarray(zm) - res.logz_mean_post) ** 2))
    assert mse < 1.0


@pytest.mark.slow
def test_two_step_training_resample_clip_smoke(cooks_model, small_fem_data):
    """resample_e + clip_grad_norm exercise the per-step key threading
    (scan path AND remainder batch) and the chained-optimizer lr access."""
    ds = small_fem_data
    tcfg = TrainConfig(batch_size=24, num_epoch1=3, num_epoch2=3,
                       resample_e=True, clip_grad_norm=1e4,
                       lr_decay_mode="fixed", lr_patience=1)
    trainer = TwoStepTrainer(cooks_model, ProblemConfig(), tcfg)
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(0))
    assert np.isfinite(res.hist_step1).all() and np.isfinite(res.hist_step2).all()
    assert res.hist_step1[-1] < res.hist_step1[0]


def test_lr_decay_modes(cooks_model, small_fem_data):
    """Reference quirk: with positive losses the decay never fires; the
    'fixed' mode fires on plateau."""
    ds = small_fem_data
    tcfg = TrainConfig(batch_size=64, num_epoch1=1, lr_patience=2)
    trainer = TwoStepTrainer(cooks_model, ProblemConfig(), tcfg)
    hist = np.array([5.0, 4.0, 6.0, 7.0])  # rising after epoch 1
    # reference mode: hist[epoch-patience] > 0 -> 0 - positive < 0 -> no fire
    opt = trainer._opt_step1()
    params = trainer.theta_net.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))
    state = opt.init(params)
    lr0 = float(state.hyperparams["learning_rate"])
    state, fired = trainer._lr_decay(state, hist, 2, loss_val=6.0)
    assert not fired and float(state.hyperparams["learning_rate"]) == lr0
    # fixed mode fires when loss increased over the window
    trainer.tcfg = TrainConfig(batch_size=64, lr_patience=2, lr_decay_mode="fixed")
    state, fired = trainer._lr_decay(state, np.array([5.0, 4.0, 8.0, 7.0]), 2, loss_val=8.0)
    assert fired
    assert float(state.hyperparams["learning_rate"]) == pytest.approx(lr0 * 0.9)


def test_checkpoint_resume(tmp_path, cooks_model, small_fem_data):
    """Full-state resume: 2+2 epochs with resume == 4 straight epochs."""
    ds = small_fem_data
    tcfg = TrainConfig(batch_size=64, num_epoch1=4, flg_lr_decay=False)
    key = jax.random.PRNGKey(5)

    t_full = TwoStepTrainer(cooks_model, ProblemConfig(), tcfg)
    p_full, h_full = t_full.train_step1(ds.y_data, ds.e_data, key, num_epochs=4)

    # NOTE: resume replays the SAME epoch key stream because the trainer
    # splits from the same root key; run 2 epochs, checkpoint, resume to 4
    t_a = TwoStepTrainer(
        cooks_model, ProblemConfig(), TrainConfig(batch_size=64, num_epoch1=2, flg_lr_decay=False),
        results_path=str(tmp_path),
    )
    # save_freq = max(1, 2//5) = 1 -> checkpoint every epoch incl. full state
    t_a.train_step1(ds.y_data, ds.e_data, key, num_epochs=2)

    t_b = TwoStepTrainer(
        cooks_model, ProblemConfig(), tcfg, results_path=str(tmp_path)
    )
    p_res, h_res = t_b.train_step1(ds.y_data, ds.e_data, key, num_epochs=4, resume=True)
    # epochs 0-1 from the checkpointed history, 2-3 trained fresh
    assert h_res[2] != 0 and h_res[3] != 0
    assert np.isfinite(h_res).all()
    # resume fast-forwards the per-epoch key stream, so the resumed run
    # continues the EXACT trajectory of the straight run (same perms, same
    # reparameterization keys, full optimizer state from the checkpoint)
    np.testing.assert_allclose(h_res[2:], h_full[2:], rtol=1e-9)


def test_corrupt_latest_falls_back_to_numbered(tmp_path, cooks_model, small_fem_data):
    """A truncated `latest.msgpack` (worker crash caught a pre-atomic write
    mid-stream — observed on the axon tunnel 2026-08-21) must NOT crash the
    resume: load_ckpt degrades to the best numbered epoch-params file with a
    rebuilt loss history, and training continues."""
    import os

    ds = small_fem_data
    key = jax.random.PRNGKey(5)
    t_a = TwoStepTrainer(
        cooks_model, ProblemConfig(),
        TrainConfig(batch_size=64, num_epoch1=2, flg_lr_decay=False),
        results_path=str(tmp_path),
    )
    _, h_a = t_a.train_step1(ds.y_data, ds.e_data, key, num_epochs=2)

    # simulate the observed corruption: zero-byte latest bundle
    latest = os.path.join(str(tmp_path), "step1", "latest.msgpack")
    with open(latest, "wb"):
        pass
    assert os.path.getsize(latest) == 0

    t_b = TwoStepTrainer(
        cooks_model, ProblemConfig(),
        TrainConfig(batch_size=64, num_epoch1=4, flg_lr_decay=False),
        results_path=str(tmp_path),
    )
    p_res, h_res = t_b.train_step1(ds.y_data, ds.e_data, key, num_epochs=4,
                                   resume=True)
    # epochs 0-1 recovered from the numbered filenames, 2-3 trained fresh
    np.testing.assert_allclose(h_res[:2], h_a[:2], rtol=1e-6)
    assert h_res[2] != 0 and h_res[3] != 0 and np.isfinite(h_res).all()


def test_ckpt_every_overrides_default_cadence(tmp_path, cooks_model, small_fem_data):
    """TrainConfig.ckpt_every=1 writes a checkpoint file per epoch in BOTH
    steps (the crash-cadence mitigation, KNOWN_ISSUES round-5 escalation);
    the default keeps the reference's num_epochs//5 spacing."""
    import glob
    import os

    ds = small_fem_data
    key = jax.random.PRNGKey(5)
    out = str(tmp_path / "every")
    tcfg = TrainConfig(batch_size=64, num_epoch1=10, num_epoch2=3,
                       flg_lr_decay=False, ckpt_every=1)
    tr = TwoStepTrainer(cooks_model, ProblemConfig(), tcfg, results_path=out)
    tr.fit(ds.y_data, ds.e_data, key)
    n1 = len([p for p in glob.glob(os.path.join(out, "step1", "*.msgpack"))
              if not p.endswith("latest.msgpack")])
    n2 = len([p for p in glob.glob(os.path.join(out, "step2", "*.msgpack"))
              if not p.endswith("latest.msgpack")])
    assert n1 == 10 and n2 == 3

    # default cadence unchanged: 10 epochs -> every 2nd epoch
    out0 = str(tmp_path / "default")
    tcfg0 = TrainConfig(batch_size=64, num_epoch1=10, flg_lr_decay=False)
    tr0 = TwoStepTrainer(cooks_model, ProblemConfig(), tcfg0, results_path=out0)
    tr0.train_step1(ds.y_data, ds.e_data, key)
    n0 = len([p for p in glob.glob(os.path.join(out0, "step1", "*.msgpack"))
              if not p.endswith("latest.msgpack")])
    assert n0 == 5


def test_ckpt_chunk_midepoch_crash_resume(tmp_path, cooks_model, small_fem_data):
    """Sub-epoch (scan-chunk) checkpointing: a run killed MID-epoch resumes
    at the last banked chunk and continues the exact trajectory of an
    uninterrupted run (the round-5 worker-crash mitigation)."""
    ds = small_fem_data
    key = jax.random.PRNGKey(5)
    # 64 obs / batch 16 = 4 full batches; scan_chunk=1 -> 4 chunks/epoch
    tcfg = TrainConfig(batch_size=16, num_epoch1=3, flg_lr_decay=False,
                       scan_chunk=1, ckpt_chunk=True)

    t_full = TwoStepTrainer(cooks_model, ProblemConfig(), tcfg)
    p_full, h_full = t_full.train_step1(ds.y_data, ds.e_data, key, num_epochs=3)

    class Boom(RuntimeError):
        pass

    class CrashingTrainer(TwoStepTrainer):
        """Injects a crash at the Nth scan-chunk dispatch (the sharding
        hook runs exactly once per chunk)."""

        crash_after = 6  # dies in epoch 1, after banking its 2nd chunk

        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self._chunks_seen = 0

        def _maybe_shard_batched(self, x):
            self._chunks_seen += 1
            if self._chunks_seen > self.crash_after:
                raise Boom()
            return super()._maybe_shard_batched(x)

    out = str(tmp_path)
    t_a = CrashingTrainer(cooks_model, ProblemConfig(), tcfg, results_path=out)
    with pytest.raises(Boom):
        t_a.train_step1(ds.y_data, ds.e_data, key, num_epochs=3)

    t_b = TwoStepTrainer(cooks_model, ProblemConfig(), tcfg, results_path=out)
    p_res, h_res = t_b.train_step1(ds.y_data, ds.e_data, key, num_epochs=3,
                                   resume=True)
    np.testing.assert_allclose(h_res[1:], h_full[1:], rtol=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from vbicm_tpu.utils.checkpoint import load_orbax, save_orbax

    tree = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)},
        "epoch": np.asarray(7),
    }
    p = str(tmp_path / "ckpt")
    save_orbax(p, tree)
    restored = load_orbax(p, tree)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))
    assert int(restored["epoch"]) == 7


def test_analytic_case3_dataset_and_two_step():
    """2-D case-3 dataset flow (reference generate_data_2d_case3) through
    the FULL two-step trainer with an analytic fh override — completing the
    analytic-cases component beyond the 1-D case-1 generator."""
    from vbicm_tpu.prob.analytic import (
        f_fun_2d_case3,
        generate_data_1d_case2,
        generate_data_2d_case3,
        h_fun_2d_case3,
    )
    from vbicm_tpu.vi.train import TwoStepTrainer

    ds2 = generate_data_1d_case2(jax.random.PRNGKey(3), 256)
    assert ds2.y_data.shape == (256, 1) and np.isfinite(ds2.log_z_data).all()

    ds = generate_data_2d_case3(jax.random.PRNGKey(0), 512)
    assert ds.y_data.shape == (512, 2) and ds.e_data.shape == (4, 2)
    # dataset matches the closed forms up to the declared noise levels
    resid_y = ds.y_data - np.asarray(f_fun_2d_case3(jnp.asarray(ds.theta_data)))
    assert abs(resid_y.std() - np.sqrt(0.1)) < 0.08

    def fh(theta):
        return f_fun_2d_case3(theta), h_fun_2d_case3(theta)

    tcfg = TrainConfig(batch_size=128, num_epoch1=8, num_epoch2=8,
                       pairing="per_sample", lr=2e-4, alpha=0.0)
    tr = TwoStepTrainer(None, ProblemConfig(), tcfg, fh=fh,
                        results_path=None, verbose=False)
    res = tr.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(1))
    assert np.isfinite(res.hist_step1).all()
    assert np.isfinite(res.hist_step2).all()
    # the z-predictive mean should correlate with the bridge targets
    _, _, zm, zs = tr.predict(res.theta_params, res.z_params,
                              jnp.asarray(ds.y_data))
    corr = np.corrcoef(np.asarray(zm)[:, 0], res.logz_mean_post[:, 0])[0, 1]
    assert corr > 0.7, corr


def test_checkpoint_resume_step2(tmp_path, cooks_model, small_fem_data):
    """Step-2 resume symmetry (round-2 weak #6): 2+2 epochs with resume
    continues from the checkpointed optimizer state, and the FINAL bundle
    carries opt_state so a finished run is also restartable."""
    import os

    ds = small_fem_data
    key = jax.random.PRNGKey(7)
    tcfg4 = TrainConfig(batch_size=64, num_epoch1=2, num_epoch2=4, flg_lr_decay=False)

    t_full = TwoStepTrainer(cooks_model, ProblemConfig(), tcfg4)
    k1, k2, k3 = jax.random.split(key, 3)
    theta_params, _ = t_full.train_step1(ds.y_data, ds.e_data, k1, num_epochs=2)
    lm, ls = t_full.bridge(ds.y_data, ds.e_data, theta_params, k2)
    _, h_full = t_full.train_step2(ds.y_data, ds.e_data, theta_params, lm, ls, k3)

    t_a = TwoStepTrainer(
        cooks_model, ProblemConfig(), tcfg4, results_path=str(tmp_path)
    )
    t_a.train_step2(ds.y_data, ds.e_data, theta_params, lm, ls, k3, num_epochs=2)

    t_b = TwoStepTrainer(
        cooks_model, ProblemConfig(), tcfg4, results_path=str(tmp_path)
    )
    zp_res, h_res = t_b.train_step2(
        ds.y_data, ds.e_data, theta_params, lm, ls, k3, num_epochs=4, resume=True
    )
    assert h_res[2] != 0 and h_res[3] != 0
    assert np.isfinite(h_res).all()
    # resume fast-forwards the per-epoch key stream: exact continuation
    np.testing.assert_allclose(h_res[2:], h_full[2:], rtol=1e-9)

    # final bundle restores the full state: resuming at the SAME epoch count
    # is a no-op train (start_epoch == num_epochs) returning identical params
    t_c = TwoStepTrainer(
        cooks_model, ProblemConfig(), tcfg4, results_path=str(tmp_path)
    )
    zp_again, _ = t_c.train_step2(
        ds.y_data, ds.e_data, theta_params, lm, ls, k3, num_epochs=4, resume=True
    )
    flat_a = jax.tree_util.tree_leaves(zp_res)
    flat_b = jax.tree_util.tree_leaves(zp_again)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    assert os.path.exists(os.path.join(str(tmp_path), "step2", "latest.msgpack"))
