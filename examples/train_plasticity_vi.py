"""Two-step VI training through J2 FLOW plasticity — amortized inversion
of yield parameters from a path-dependent elastoplastic response.

New capability class vs the reference (which only ALLOCATES the inelastic
storage, ``src/fem_preprocess.py:486-501``, behind the empty
``mat_type == 99`` driver stub): every likelihood evaluation runs the full
incremental load history (a ``lax.scan`` of Newton solves with radial-return
constitutive updates), and every gradient composes per-step discrete
adjoints backward through that history.  The observation y is the probe
displacement at full load; the latent parameters are (sig_y, H_iso) of the
hardening curve — quantities a purely elastic inversion cannot see.
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-data", type=int, default=1000)
    ap.add_argument("--ne-sam", type=int, default=4)
    ap.add_argument("--epochs1", type=int, default=20)
    ap.add_argument("--epochs2", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--nx", type=int, default=8)
    ap.add_argument("--ny", type=int, default=4)
    ap.add_argument("--n-steps", type=int, default=5, help="load increments")
    ap.add_argument("--sig-y0", type=float, default=0.2, help="median yield stress")
    ap.add_argument("--H0", type=float, default=2.0, help="median hardening modulus")
    ap.add_argument("--two-level", action="store_true",
                    help="elastic two-level preconditioner for every Newton "
                         "CG (scaled structured meshes, e.g. --nx 80 --ny 40)")
    ap.add_argument("--ratio", type=int, default=4,
                    help="fine/coarse grid ratio for --two-level")
    ap.add_argument("--cg-tol", type=float, default=1e-10)
    ap.add_argument("--n-validate", type=int, default=4,
                    help="held-out observations refined + compared to the "
                         "amortized posterior")
    ap.add_argument("--results", type=str, default="results_vi_plasticity")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scan-chunk", type=int, default=0,
                    help="batches per device program (pick a divisor of "
                         "n_data//batch_size); at scaled meshes a monolithic "
                         "epoch scan over the Newton histories is the "
                         "long-program class that trips the TPU worker "
                         "(docs/KNOWN_ISSUES.md)")
    ap.add_argument("--resume", action="store_true",
                    help="continue from trainer checkpoints after an "
                         "intermittent TPU-worker crash "
                         "(docs/KNOWN_ISSUES.md)")
    args = ap.parse_args()

    import vbicm_tpu

    vbicm_tpu.enable_x64()
    vbicm_tpu.enable_compilation_cache()
    import jax

    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.prob.datagen import generate_data_fem
    from vbicm_tpu.solver import make_fh_fun_plasticity
    from vbicm_tpu.vi.train import TwoStepTrainer

    print(f"backend: {jax.default_backend()}")
    build_t0 = time.time()
    # matrix-free beyond ~1k elements: the Newton CG runs on element-level
    # HVPs either way, dense only feeds the Jacobi diagonal precompute
    dense = args.nx * args.ny <= 800
    model = build_fem_model(cooks_membrane_mesh(args.nx, args.ny), dense=dense)
    # probe ids scaled to the coarser default mesh (node/element counts differ
    # from the 20x10 reference card)
    cfg = ProblemConfig(node_id=model.nnodes, ele_id=model.nele // 2)
    step_kw = {"cg_tol": args.cg_tol}
    if args.two_level:
        from vbicm_tpu.ops.plasticity import make_elastic_two_level_precond

        ncx, ncy = args.nx // args.ratio, args.ny // args.ratio
        coarse = build_fem_model(cooks_membrane_mesh(ncx, ncy), dense=True)
        step_kw["precond"] = make_elastic_two_level_precond(
            model, coarse, ncx, ncy, args.ratio
        )
    fh = make_fh_fun_plasticity(
        model, cfg, sig_y0=args.sig_y0, H0=args.H0, n_steps=args.n_steps,
        **step_kw,
    )
    build_s = time.time() - build_t0
    print(f"model ({model.ndof} dofs"
          f"{', elastic two-level precond' if args.two_level else ''}) "
          f"in {build_s:.1f}s")

    # dataset cache: deterministic in (mesh, material, seed, sizes) — a
    # crash-retry loop (--resume) must not re-pay the n_data elastoplastic
    # history solves on every attempt (same rationale as
    # examples/arbitrate_scaled_posterior.py's arb_cache)
    import os

    from vbicm_tpu.prob.datagen import MeasurementDataset

    os.makedirs(args.results, exist_ok=True)
    cache = os.path.join(args.results, "dataset_cache.npz")
    t0 = time.time()
    if args.resume and os.path.exists(cache):
        import numpy as _np

        z = dict(_np.load(cache, allow_pickle=False))
        ds = MeasurementDataset(**{k: z[k] for k in (
            "y_data", "z_data", "log_z_data", "e_data", "y_mean", "y_std",
            "z_mean", "z_std", "theta_data")})
        datagen_s = time.time() - t0
        print(f"loaded {args.n_data} elastoplastic data points from {cache}")
    else:
        ds = generate_data_fem(
            jax.random.PRNGKey(args.seed), jax.jit(jax.vmap(fh)),
            n_sam=args.n_data, ne_sam=args.ne_sam,
            sig_e=cfg.sig_e, sig_eta=cfg.sig_eta, chunk=512,
        )
        datagen_s = time.time() - t0
        import numpy as _np

        _np.savez(cache, y_data=ds.y_data, z_data=ds.z_data,
                  log_z_data=ds.log_z_data, e_data=ds.e_data,
                  y_mean=ds.y_mean, y_std=ds.y_std, z_mean=ds.z_mean,
                  z_std=ds.z_std, theta_data=ds.theta_data)
        print(f"generated {args.n_data} elastoplastic data points in {datagen_s:.1f}s")

    # fixed-mode lr decay: the reference quirk never fires on positive
    # losses (see train_viscoelastic_vi.py) — this problem's loss is
    # positive throughout, so reference mode would hold lr at 1e-3 forever
    # per-sample pairing: see train_viscoelastic_vi.py — the reference's
    # cross-pairing broadcast floors the loss on sharp likelihoods
    # ckpt_every=1 + chunk bundles when --scan-chunk is set: the worker-crash
    # cadence at scaled meshes is shorter than the default num_epoch//5
    # checkpoint interval (docs/KNOWN_ISSUES.md, round-5 escalation)
    tcfg = TrainConfig(
        batch_size=args.batch_size, num_epoch1=args.epochs1,
        num_epoch2=args.epochs2, lr_decay_mode="fixed",
        pairing="per_sample", scan_chunk=args.scan_chunk,
        ckpt_every=1 if args.scan_chunk else 0,
        ckpt_chunk=bool(args.scan_chunk),
    )
    # standardized net inputs (see train_viscoelastic_vi.py: un-normalized
    # trajectory inputs leave the posterior net unable to resolve the
    # high-SNR likelihood's theta signal)
    trainer = TwoStepTrainer(
        None, cfg, tcfg, fh=fh, results_path=args.results, verbose=True,
        bridge_chunk=512, y_norm=(ds.y_mean, ds.y_std),
    )
    t0 = time.time()
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(args.seed + 1),
                      resume=args.resume)
    train_s = time.time() - t0
    n_steps = (args.epochs1 + args.epochs2) * (args.n_data // args.batch_size)
    print(
        f"total training time: {train_s:.1f}s ({n_steps / train_s:.2f} steps/s, "
        f"{args.batch_size * args.ne_sam} x {args.n_steps}-increment "
        "elastoplastic histories per step-1 step)"
    )
    print(f"final step1 loss: {res.hist_step1[-1]:.6f}")
    print(f"final step2 loss: {res.hist_step2[-1]:.3e}")

    # persist training metrics BEFORE the validation phase: a worker crash
    # during the refinement probes must not lose the training record
    summary = {
        "config": vars(args),
        "ndof": model.ndof,
        "build_s": round(build_s, 1),
        "datagen_s": round(datagen_s, 1),
        "train_s": round(train_s, 1),
        "train_steps_per_sec": round(n_steps / train_s, 3),
        "step1_last": float(res.hist_step1[-1]),
        "step2_last": float(res.hist_step2[-1]),
    }
    with open(f"{args.results}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)

    # posterior sanity: per-observation SVI refinement (the exact posterior
    # up to refinement tolerance) from the amortized init — amortized mean
    # must sit within ~a posterior std of the refined mean
    import jax.numpy as jnp
    import numpy as np

    from vbicm_tpu.vi.refine import refine_posterior

    batch_f = lambda th: jax.vmap(fh)(th)[0]
    validations = []
    for i in range(args.n_validate):
        y_obs = ds.y_data[i]
        tm, tsg, _, _ = trainer.predict(res.theta_params, res.z_params,
                                        y_obs[None])
        mu, L, _ = refine_posterior(
            batch_f, jnp.asarray(y_obs), cfg.sig_e, jnp.asarray(tm[0]),
            jnp.diag(jnp.sqrt(jnp.asarray(tsg[0]))),
            key=jax.random.PRNGKey(100 + i), steps=1500, ne=16, lr=1e-2,
            # a monolithic 1500-step scan over scaled Newton histories is
            # the long-program crash class (docs/KNOWN_ISSUES.md)
            chunk_steps=150,
        )
        std_r = np.sqrt(np.diag(np.asarray(L @ L.T)))
        zgap = np.abs(np.asarray(tm[0]) - np.asarray(mu)) / std_r
        th_true = np.asarray(ds.theta_data[i])
        validations.append({
            "amortized_mean": np.asarray(tm[0]).tolist(),
            "refined_mean": np.asarray(mu).tolist(),
            "refined_std": std_r.tolist(),
            "zgap_amortized": zgap.tolist(),
            "true_theta": th_true.tolist(),
            "zgap_refined_to_truth": (
                np.abs(np.asarray(mu) - th_true) / std_r
            ).tolist(),
        })
        print(f"obs {i}: amortized {validations[-1]['amortized_mean']} "
              f"refined {validations[-1]['refined_mean']} zgap {zgap}")

    summary["validation_vs_refined"] = validations
    with open(f"{args.results}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
