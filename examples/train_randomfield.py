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
calibration (z-score RMS ~ 1 when the VI variances are honest), HMC moment
checks on held-out observations, and the inferred field exported as XDMF
cell attributes. Default posterior="fullcov": the mean-field head cannot
REPRESENT this correlated posterior (its optimum matches the precision
diagonal — VI/MC std ratios to 0.01 measured by the HMC check); the
Cholesky head removes that representation error. Held-out calibration is
additionally limited by the AMORTIZATION gap at small n_data (z-med ~9 at
n_data=256 with either head; see vi/refine.py) — the reported z-scores
measure both effects, and the HMC/Laplace checks arbitrate per
observation. Per-observation refinement (`vi.refine.refine_posterior`,
warm-started from the amortized head) restores calibration where needed.
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
    # 100 step-1 epochs: the variance head converges much more slowly than
    # the mean head under resample_e (60 epochs leaves posterior stds far
    # too small; z-score RMS 111 -> 17 between 60 and 100 epochs at 80x40)
    ap.add_argument("--epochs1", type=int, default=100)
    ap.add_argument("--epochs2", type=int, default=20)
    ap.add_argument("--results", type=str, default="results_randomfield")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mcmc-check", type=int, default=2,
                    help="held-out observations to validate against HMC")
    ap.add_argument("--posterior", choices=["meanfield", "fullcov"],
                    default="fullcov",
                    help="q(theta|y) family; fullcov (Cholesky head) calibrates the posterior stds on this correlated target")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debug without the TPU tunnel)")
    ap.add_argument("--ratio", type=int, default=4,
                    help="fine/coarse cell ratio of the mean-field preconditioner")
    args = ap.parse_args()
    if args.nx % args.ratio or args.ny % args.ratio:
        raise SystemExit(
            f"--nx/--ny must be divisible by --ratio={args.ratio} "
            "(the mean-field preconditioner coarsens the structured grid)"
        )

    import vbicm_tpu

    vbicm_tpu.enable_x64()
    vbicm_tpu.enable_compilation_cache()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
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
    nx, ny, ratio = args.nx, args.ny, args.ratio
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
    # resample_e: with the fixed-CRN scheme the sharp likelihood
    # (sig_e=1e-3, 100 probe dims) drives the variance head to fit the 4
    # particular draws — posterior variances collapse orders of magnitude
    # below truth (z-score RMS >> 1). Fresh draws per step keep the MC
    # gradient unbiased; the fixed point is the actual posterior
    # (calibration pinned in test_resample_e_calibrates_linear_gaussian).
    tcfg = TrainConfig(batch_size=64, num_epoch1=args.epochs1,
                       num_epoch2=args.epochs2, pairing="per_sample",
                       lr_decay_mode="fixed", num_neuron=64,
                       resample_e=True, clip_grad_norm=1e5,
                       posterior=args.posterior)
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
    # median |z| alongside the RMS: the RMS is dominated by variance-head
    # extrapolation outliers on held-out y at small n_data (a few collapsed
    # posterior variances can blow it up while the bulk stays calibrated)
    summary["zscore_median_abs"] = round(float(np.median(np.abs(zscore))), 3)
    print(f"held-out ({n_test}): log-field RMSE {rmse_field:.4f} "
          f"(prior std {prior_scale:.4f}, contraction "
          f"{rmse_field / prior_scale:.3f}), z-score RMS "
          f"{summary['zscore_rms']:.2f}")

    # persist before the (long) HMC phase: the axon worker can crash
    # mid-run and the training numbers must survive it
    os.makedirs(args.results, exist_ok=True)

    def _flush():
        with open(os.path.join(args.results, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)

    _flush()

    # inferred-field visualization: true log-field vs amortized posterior
    # mean/std (closed form through the KL basis) for the first held-out
    # observation, as cell fields on the mesh (ParaView-ready)
    from vbicm_tpu.eval.xdmf import write_xdmf
    from vbicm_tpu.prob.randomfield import posterior_field_moments

    if args.posterior == "fullcov":
        # project the FULL covariance into the field: off-diagonal theta
        # correlations change the per-element std (|L^T m_e|, not the
        # marginal-variance quadrature)
        _, L0 = trainer.predict_cholesky(res.theta_params, y_obs[:1])
        log_mean, log_std = posterior_field_moments(kl, tm[0], L=np.asarray(L0[0]))
    else:
        log_mean, log_std = posterior_field_moments(kl, tm[0], tsig[0])
    log_true = kl.mean_log + np.asarray(t_true[0]) @ kl.modes
    write_xdmf(
        os.path.join(args.results, "field.h5"), model, [np.zeros(model.ndof)],
        cell_fields={"logE_true": log_true, "logE_post_mean": log_mean,
                     "logE_post_std": log_std},
    )

    # MAP + Laplace baseline on the same held-out observations — the
    # classical deterministic approximation (~300 solves per y vs HMC's
    # ~77k): reports mode agreement with the VI mean and Laplace-vs-VI
    # marginal stds
    if args.mcmc_check > 0:
        from vbicm_tpu.eval import laplace_posterior

        lrows = []
        for i in range(args.mcmc_check):
            from vbicm_tpu.eval.mcmc import make_fem_logpost as _mklp

            lp = _mklp(fh, y_obs[i], cfg.sig_e)
            lres = laplace_posterior(lp, jnp.asarray(tm[i]), tol=1e-6)
            l_std = np.sqrt(np.diag(lres.cov))
            vi_std = np.sqrt(np.asarray(tsig[i]))
            lrows.append({
                "grad_norm": float(lres.grad_norm),
                "map_vs_vi_mean_max": round(float(
                    np.max(np.abs(lres.theta_map - np.asarray(tm[i])))), 4),
                "vi_over_laplace_std_range": [round(float(r), 3) for r in
                                              (np.min(vi_std / l_std),
                                               np.max(vi_std / l_std))],
            })
            print(f"Laplace check y[{i}]: |MAP - VI mean|_max "
                  f"{lrows[-1]['map_vs_vi_mean_max']}, VI/Laplace std range "
                  f"{lrows[-1]['vi_over_laplace_std_range']}")
        summary["laplace_checks"] = lrows
        _flush()

    # gradient-guided MCMC ground truth on a few held-out observations:
    # the amortized posterior must track per-y HMC moments (the reference
    # validates its 2-parameter posterior the same way with random-walk
    # Metropolis, src/postprocess_lib.py:90-103 — here the target is
    # 16-dimensional, where HMC's gradient guidance is what keeps ESS up).
    if args.mcmc_check > 0:
        from vbicm_tpu.eval.mcmc import hmc, make_fem_logpost

        rows = []
        for i in range(args.mcmc_check):
            logpost = make_fem_logpost(fh, y_obs[i], cfg.sig_e)
            # precondition with the VI posterior geometry (identity-mass
            # HMC would be limited by the SHARPEST posterior direction —
            # leading modes have std ~1e-2 while weakly-identified ones
            # stay near the prior's 1.0): sample xi with
            # theta = mu_vi + C_vi xi (C = Cholesky factor when the
            # full-covariance head is on, diag stds otherwise), a fixed
            # affine map, then push samples back
            mu_i = jnp.asarray(tm[i])
            if args.posterior == "fullcov":
                _, L_all = trainer.predict_cholesky(res.theta_params, y_obs[i:i+1])
                C_i = jnp.asarray(L_all[0])
            else:
                C_i = jnp.diag(jnp.sqrt(jnp.asarray(tsig[i])))
            logpost_w = lambda xi: logpost(mu_i + C_i @ xi)
            res_h = hmc(jax.random.PRNGKey(100 + i), logpost_w, d=args.n_modes,
                        n_samples=400, burn=200, n_chains=8, n_leapfrog=8)
            flat = res_h.samples.reshape(-1, args.n_modes)
            flat = np.asarray(mu_i) + flat @ np.asarray(C_i).T
            mc_mean, mc_std = flat.mean(0), flat.std(0)
            vi_mean = np.asarray(tm[i])
            vi_std = np.sqrt(np.asarray(tsig[i]))
            # semi-amortized refinement from the amortized init: the
            # per-observation pass that closes the held-out amortization
            # gap (vi/refine.py) — reported against the same HMC moments
            from vbicm_tpu.vi.refine import refine_posterior

            mu_r, L_r, _ = refine_posterior(
                lambda th: jax.vmap(fh)(th)[0], y_obs[i], cfg.sig_e,
                mu_i, C_i if args.posterior == "fullcov"
                else jnp.diag(jnp.sqrt(jnp.asarray(tsig[i]))),
                key=jax.random.PRNGKey(500 + i), steps=1500, ne=8,
            )
            r_std = np.sqrt(np.asarray(jnp.sum(L_r**2, -1)))
            rows.append({
                "accept": round(float(res_h.accept_rate), 3),
                "min_ess": round(float(res_h.ess.min()), 1),
                "max_rhat": round(float(res_h.rhat.max()), 4),
                "mean_rmse_vs_mcse": round(float(np.sqrt(np.mean(
                    (vi_mean - mc_mean) ** 2 / (mc_std**2 + 1e-12)))), 3),
                "std_ratio_range": [round(float(r), 3) for r in
                                    (np.min(vi_std / mc_std), np.max(vi_std / mc_std))],
                "refined_mean_rmse_vs_mcse": round(float(np.sqrt(np.mean(
                    (np.asarray(mu_r) - mc_mean) ** 2 / (mc_std**2 + 1e-12)))), 3),
                "refined_std_ratio_range": [round(float(r), 3) for r in
                                            (np.min(r_std / mc_std),
                                             np.max(r_std / mc_std))],
            })
            print(f"HMC check y[{i}]: accept {rows[-1]['accept']}, "
                  f"min ESS {rows[-1]['min_ess']}, "
                  f"mean err/mc-std {rows[-1]['mean_rmse_vs_mcse']}, "
                  f"VI/MC std ratio {rows[-1]['std_ratio_range']}; REFINED "
                  f"err {rows[-1]['refined_mean_rmse_vs_mcse']}, std ratio "
                  f"{rows[-1]['refined_std_ratio_range']}")
            summary["hmc_checks"] = rows
            _flush()

    print(f"summary -> {args.results}/summary.json")


if __name__ == "__main__":
    main()
