"""Scaled random-field material inversion, end-to-end amortized VI.

The parameter-dimension scaling demonstration (no reference counterpart —
the reference's material is two scalars, ``model_property_cards.py:25``):
a 16-mode KL expansion of the log-Young's-modulus field on the refined
Cook's membrane, inferred from 50 displacement probes by the SAME two-step
amortized-VI machinery as the scalar pipeline (`vi/train.py` — every layer
is dimension-generic in theta).

TPU path: the per-element-coefficient solver in structured-grid mode
(reshape/slice gather-scatter), f32 CG + one f64 refinement pass,
preconditioned by the mean-field two-level cycle (spectral coarse solve,
conv-form transfers) — 776 fwd / 470 grad solves/s at 80x40, B=32 (v5e),
27x over the f64 Jacobi baseline.

Artifacts: results_randomfield/summary.json + checkpoints — amortized
posterior accuracy is reported as log-field errors of the posterior-mean
field vs the generating field on held-out data, with the posterior-std
calibration (z-score RMS ~ 1 when the VI variances are honest).
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=80)
    ap.add_argument("--ny", type=int, default=40)
    ap.add_argument("--n-modes", type=int, default=16)
    ap.add_argument("--corr-len", type=float, default=12.0)
    ap.add_argument("--sigma", type=float, default=0.3)
    ap.add_argument("--n-data", type=int, default=2048)
    ap.add_argument("--epochs1", type=int, default=60)
    ap.add_argument("--epochs2", type=int, default=20)
    ap.add_argument("--results", type=str, default="results_randomfield")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import vbicm_tpu

    vbicm_tpu.enable_x64()
    vbicm_tpu.enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.prob.datagen import generate_data_fem
    from vbicm_tpu.prob.randomfield import (
        build_kl_expansion,
        field_from_theta,
        make_fh_fun_field,
        make_mean_field_preconditioner,
    )
    from vbicm_tpu.vi.train import TwoStepTrainer

    print(f"backend: {jax.default_backend()}")
    nx, ny, ratio = args.nx, args.ny, 4
    t0 = time.time()
    model = build_fem_model(cooks_membrane_mesh(nx, ny), dense=False)
    coarse = build_fem_model(
        cooks_membrane_mesh(nx // ratio, ny // ratio), dense=True
    )
    kl = build_kl_expansion(
        model, n_modes=args.n_modes, corr_len=args.corr_len, sigma=args.sigma
    )
    # probe grid: 50 nodes spread over the membrane (a field needs many
    # probes to be identifiable; 2 dofs each -> y_dim = 100)
    rows = np.arange(4, ny + 1, max(1, ny // 5))[:5]
    cols = np.arange(8, nx + 1, max(1, nx // 10))[:10]
    probes = (rows[:, None] * (nx + 1) + cols[None, :] + 1).reshape(-1)
    cfg = ProblemConfig(
        theta_dim=args.n_modes, y_dim=2 * len(probes),
        ele_id=(ny // 2) * nx + nx // 4, sig_e=1e-3, sig_eta=1e-4,
    )
    prec = make_mean_field_preconditioner(
        coarse, nx // ratio, ny // ratio, ratio, model.free_mask,
        nu=0.3, E0=float(np.exp(kl.mean_log)),
    )
    fh = make_fh_fun_field(
        model, kl, cfg, probe_nodes=probes, cg_dtype=jnp.float32,
        refine_iters=1, tol=3e-3, preconditioner=prec, grid=(nx, ny),
    )
    build_s = time.time() - t0
    print(f"model ({model.ndof} dofs, {model.nele} elements), "
          f"{args.n_modes}-mode KL, {len(probes)} probes in {build_s:.1f}s")
    summary = {"config": vars(args), "ndof": model.ndof,
               "n_probes": int(len(probes)), "build_s": round(build_s, 1)}

    t0 = time.time()
    ds = generate_data_fem(
        jax.random.PRNGKey(args.seed), jax.jit(jax.vmap(fh)),
        n_sam=args.n_data, ne_sam=4, d_y=cfg.y_dim, d_theta=args.n_modes,
        sig_e=cfg.sig_e, sig_eta=cfg.sig_eta, chunk=512,
    )
    datagen_s = time.time() - t0
    print(f"{args.n_data}-point dataset (field-solver sweep) in {datagen_s:.1f}s")
    summary["datagen_s"] = round(datagen_s, 1)

    # Field inversion needs the per-observation ELBO pairing: the reference's
    # cross-pairing trains an AGGREGATE posterior (round-2 finding — its mean
    # is nearly y-independent), useless for recovering a per-sample field.
    # Wider heads than the reference's 20 neurons: the map is R^100 -> R^16.
    tcfg = TrainConfig(batch_size=64, num_epoch1=args.epochs1,
                       num_epoch2=args.epochs2, pairing="per_sample",
                       lr_decay_mode="fixed", num_neuron=64)
    trainer = TwoStepTrainer(None, cfg, tcfg, fh=fh,
                             results_path=args.results, verbose=True,
                             y_norm=(ds.y_mean, ds.y_std))
    t0 = time.time()
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(args.seed + 1))
    train_s = time.time() - t0
    n_steps = (args.n_data // 64) * (args.epochs1 + args.epochs2)
    print(f"two-step field-VI training: {train_s:.1f}s "
          f"({n_steps / train_s:.2f} steps/s, 256 field solves/step)")
    summary["train_s"] = round(train_s, 1)
    summary["train_steps_per_sec"] = round(n_steps / train_s, 3)
    summary["step1_last"] = float(res.hist_step1[-1])
    summary["step2_last"] = float(res.hist_step2[-1])

    # held-out evaluation: amortized posterior vs the generating field
    n_test = 256
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(args.seed + 2), 3)
    t_true = jax.random.normal(k1, (n_test, args.n_modes))
    y_clean, _ = jax.jit(jax.vmap(fh))(t_true)
    y_obs = y_clean + np.sqrt(cfg.sig_e) * jax.random.normal(k2, y_clean.shape)
    tm, tsig, _, _ = trainer.predict(res.theta_params, res.z_params, y_obs)
    # log-field error: KL-basis weighted -> field-space via the modes
    logE_err = (np.asarray(tm) - np.asarray(t_true)) @ kl.modes  # (n_test, nele)
    prior_scale = np.sqrt((kl.modes**2).sum(0)).mean()  # prior field std
    rmse_field = float(np.sqrt((logE_err**2).mean()))
    # tsig is the posterior VARIANCE (exp of the log-sig head) — z-scores
    # normalize by the std
    zscore = (np.asarray(tm) - np.asarray(t_true)) / np.sqrt(np.asarray(tsig))
    summary["test_logfield_rmse"] = round(rmse_field, 5)
    summary["prior_logfield_std"] = round(float(prior_scale), 5)
    summary["posterior_contraction"] = round(rmse_field / prior_scale, 4)
    summary["zscore_rms"] = round(float(np.sqrt((zscore**2).mean())), 3)
    print(f"held-out ({n_test}): log-field RMSE {rmse_field:.4f} "
          f"(prior std {prior_scale:.4f}, contraction "
          f"{rmse_field / prior_scale:.3f}), z-score RMS "
          f"{summary['zscore_rms']:.2f}")

    os.makedirs(args.results, exist_ok=True)
    with open(os.path.join(args.results, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"summary -> {args.results}/summary.json")


if __name__ == "__main__":
    main()
