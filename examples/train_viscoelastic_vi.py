"""Two-step VI training through generalized-Maxwell viscoelasticity —
amortized inversion of Prony-series parameters from a creep TRAJECTORY.

Rate-dependent sibling of ``train_plasticity_vi.py`` on the reference's
allocated-but-driverless inelastic surface (``src/fem_preprocess.py:
486-501``, empty ``mat_type == 99`` driver): every likelihood evaluation
integrates the hereditary response (a ``lax.scan`` of spectral affine
solves with exponential-integrator branch updates), and gradients flow
through the whole time history via the solver's eigen-coordinate custom
VJP.  The observation y is the probe-displacement trajectory under a step
load (creep test); the latent parameters are (branch fraction g,
relaxation time tau) of the Prony series — quantities invisible to any
single-snapshot elastic inversion.

Validation: the amortized posterior at held-out observations is refined
per-observation (``vi.refine``) and compared against the Laplace
approximation of the exact log-posterior (near-Gaussian regime).
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
    ap.add_argument("--n-steps", type=int, default=8, help="time steps")
    ap.add_argument("--dt", type=float, default=0.25)
    ap.add_argument("--g0", type=float, default=0.4, help="median branch fraction")
    ap.add_argument("--tau0", type=float, default=1.0, help="median relaxation time")
    ap.add_argument("--num-neuron", type=int, default=64,
                    help="posterior-net width; the default 20-neuron "
                         "reference net plateaus ~140x above the loss "
                         "floor on this high-SNR trajectory inversion "
                         "(sig_e=1e-3 on a ~4-unit creep curve)")
    ap.add_argument("--n-validate", type=int, default=4,
                    help="held-out observations refined + Laplace-checked")
    ap.add_argument("--results", type=str, default="results_vi_viscoelastic")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true",
                    help="continue from trainer checkpoints after an "
                         "intermittent TPU-worker crash "
                         "(docs/KNOWN_ISSUES.md)")
    args = ap.parse_args()

    import vbicm_tpu

    vbicm_tpu.enable_x64()
    vbicm_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.eval.laplace import laplace_posterior
    from vbicm_tpu.eval.mcmc import make_fem_logpost
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.prob.datagen import generate_data_fem
    from vbicm_tpu.solver import make_fh_fun_viscoelastic
    from vbicm_tpu.vi.refine import refine_posterior
    from vbicm_tpu.vi.train import TwoStepTrainer

    print(f"backend: {jax.default_backend()}")
    model = build_fem_model(cooks_membrane_mesh(args.nx, args.ny), dense=True)
    cfg = ProblemConfig(
        node_id=model.nnodes, ele_id=model.nele // 2,
        y_dim=2 * args.n_steps, sig_e=1e-3, sig_eta=1e-4,
    )
    fh = make_fh_fun_viscoelastic(
        model, cfg, g0=args.g0, tau0=args.tau0, dt=args.dt,
        n_steps=args.n_steps,
    )

    t0 = time.time()
    ds = generate_data_fem(
        jax.random.PRNGKey(args.seed), jax.jit(jax.vmap(fh)),
        n_sam=args.n_data, ne_sam=args.ne_sam, d_y=2 * args.n_steps,
        sig_e=cfg.sig_e, sig_eta=cfg.sig_eta, chunk=512,
    )
    datagen_s = time.time() - t0
    print(f"generated {args.n_data} creep trajectories in {datagen_s:.1f}s")

    # lr_decay_mode="fixed": the reference decay quirk fires iff a PAST
    # loss was negative (config.py TrainConfig notes); this problem's
    # step-1 loss is ~1e3 positive, so in reference mode the lr never
    # decays and training ends in an SGD noise ball (measured round 5:
    # loss oscillating 700-1200 after 150 epochs). The plateau-detecting
    # fixed mode anneals it. Reference-parity runs keep the quirk.
    # pairing="per_sample": the reference's cross-pairing quirk scores
    # every y against EVERY posterior sample in the batch; at sig_e=1e-3
    # the j!=i pairs carry the full inter-observation spread and floor the
    # loss at ~(spread)^2/(2 sig_e) ~ 7e2 regardless of the net (measured:
    # cross plateaus 700-1100; per-sample converges). Harmless at the
    # reference's sig_e=0.1; fatal on high-SNR likelihoods.
    tcfg = TrainConfig(
        batch_size=args.batch_size, num_epoch1=args.epochs1,
        num_epoch2=args.epochs2, lr_decay_mode="fixed",
        num_neuron=args.num_neuron, pairing="per_sample",
    )
    # y_norm is ESSENTIAL here: the creep trajectories sit at ~4 units
    # with only ~0.1 units of theta-induced variation, and the likelihood
    # resolves 1e-3 (sig_e) — un-standardized inputs ask the MLP to
    # resolve 3e-4 relative input differences (measured round 5: the
    # un-normalized net plateaus at loss ~900-1100 regardless of width or
    # epochs; standardized inputs make the informative variation O(1))
    trainer = TwoStepTrainer(
        None, cfg, tcfg, fh=fh, results_path=args.results, verbose=True,
        bridge_chunk=512, y_norm=(ds.y_mean, ds.y_std),
    )
    t0 = time.time()
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(args.seed + 1),
                      resume=args.resume)
    train_s = time.time() - t0
    n_steps_tr = (args.epochs1 + args.epochs2) * (args.n_data // args.batch_size)
    print(
        f"total training time: {train_s:.1f}s ({n_steps_tr / train_s:.2f} steps/s, "
        f"{args.batch_size * args.ne_sam} x {args.n_steps}-step "
        "viscoelastic trajectories per step-1 step)"
    )
    print(f"final step1 loss: {res.hist_step1[-1]:.6f}")
    print(f"final step2 loss: {res.hist_step2[-1]:.3e}")

    # --- per-observation validation: amortized -> refine -> vs Laplace ---
    batch_f = lambda th: jax.vmap(fh)(th)[0]
    validations = []
    for i in range(args.n_validate):
        y_obs = ds.y_data[i]
        tm, tsg, _, _ = trainer.predict(res.theta_params, res.z_params,
                                        y_obs[None])
        mu, L, _ = refine_posterior(
            batch_f, y_obs, cfg.sig_e, jnp.asarray(tm[0]),
            jnp.diag(jnp.sqrt(jnp.asarray(tsg[0]))),
            key=jax.random.PRNGKey(100 + i), steps=1500, ne=16, lr=1e-2,
        )
        lap = laplace_posterior(make_fem_logpost(fh, y_obs, cfg.sig_e),
                                jnp.asarray(tm[0]))
        la_std = np.sqrt(np.diag(np.asarray(lap.cov)))
        validations.append({
            "amortized_mean": np.asarray(tm[0]).tolist(),
            "refined_mean": np.asarray(mu).tolist(),
            "laplace_mean": np.asarray(lap.theta_map).tolist(),
            "refined_std": np.sqrt(np.diag(np.asarray(L @ L.T))).tolist(),
            "laplace_std": la_std.tolist(),
            "zgap_refined": (np.abs(np.asarray(mu) - np.asarray(lap.theta_map))
                             / la_std).tolist(),
        })
        print(f"obs {i}: refined {validations[-1]['refined_mean']} "
              f"laplace {validations[-1]['laplace_mean']} "
              f"zgap {validations[-1]['zgap_refined']}")

    import os

    os.makedirs(args.results, exist_ok=True)
    with open(f"{args.results}/summary.json", "w") as f:
        json.dump(
            {
                "config": vars(args),
                "datagen_s": round(datagen_s, 1),
                "train_s": round(train_s, 1),
                "train_steps_per_sec": round(n_steps_tr / train_s, 3),
                "step1_last": float(res.hist_step1[-1]),
                "step2_last": float(res.hist_step2[-1]),
                "validation_vs_laplace": validations,
            },
            f, indent=1,
        )


if __name__ == "__main__":
    main()
