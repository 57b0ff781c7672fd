"""Posterior validation for a finished train_scaled_3d run, standalone.

Loads the newest step-1/step-2 parameter checkpoints from the results
directory (written by ``TwoStepTrainer._save_ckpt``), regenerates the same
dataset, and runs the per-observation refinement probe — so the expensive
training does not need to rerun to (re)validate the posterior. The refine
scan is CHUNKED (``refine_posterior(chunk_steps=...)``): a monolithic
1500-step scan over the 3-D Pallas-stencil solve runs long enough to trip
the TPU worker ("TPU worker process crashed or restarted", observed twice).
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import argparse
import dataclasses
import glob
import json
import os


def newest_params(results, subdir, template):
    from flax import serialization

    cands = [p for p in glob.glob(os.path.join(results, subdir, "*.msgpack"))
             if not p.endswith("latest.msgpack")]
    if not cands:
        raise SystemExit(f"no checkpoints under {results}/{subdir}")
    # reference naming {epoch:02d}-{loss:.8f}: lexical max = newest epoch
    path = max(cands)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read()), path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=32)
    ap.add_argument("--ny", type=int, default=8)
    ap.add_argument("--nz", type=int, default=8)
    ap.add_argument("--ratio", type=int, default=2)
    ap.add_argument("--n-data", type=int, default=2000)
    ap.add_argument("--n-validate", type=int, default=4)
    ap.add_argument("--refine-steps", type=int, default=1500)
    ap.add_argument("--chunk-steps", type=int, default=150)
    ap.add_argument("--results", type=str, default="results_scaled_3d")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import vbicm_tpu

    vbicm_tpu.enable_x64()
    vbicm_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vbicm_tpu.config import ProblemConfig, SectionCard, TrainConfig
    from vbicm_tpu.mesh.solid3d import beam_hex8_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.prob.datagen import generate_data_fem
    from vbicm_tpu.solver import make_fh_fun, make_two_level_solver_box3d
    from vbicm_tpu.vi.refine import refine_posterior
    from vbicm_tpu.vi.train import TwoStepTrainer

    print(f"backend: {jax.default_backend()}")
    sec = SectionCard(stype=4)
    tip = (0.0, 0.0, -0.02)
    model = build_fem_model(
        beam_hex8_mesh(args.nx, args.ny, args.nz, tip_force=tip), sec,
        dense=False,
    )
    cells_c = (args.nx // args.ratio, args.ny // args.ratio,
               args.nz // args.ratio)
    coarse = build_fem_model(beam_hex8_mesh(*cells_c, tip_force=tip), sec,
                             dense=True)
    solve2l = make_two_level_solver_box3d(
        model, coarse, cells_c, args.ratio,
        cg_dtype=jnp.float32, refine_iters=1, tol=3e-3, maxiter=400,
        coarse_f32_precision=jax.lax.Precision.DEFAULT,
        refine_residual="compensated",
    )
    e0 = ((args.nz - 1) * args.ny + args.ny // 2) * args.nx + 1
    cfg = dataclasses.replace(
        ProblemConfig(), y_dim=3, node_id=model.nnodes, ele_id=e0 + 1,
        nipt_id=(1, 5),
    )
    fh = make_fh_fun(model, cfg, solve_free=solve2l)

    ds = generate_data_fem(
        jax.random.PRNGKey(args.seed), jax.jit(jax.vmap(fh)),
        n_sam=args.n_data, ne_sam=4, d_y=3, sig_e=cfg.sig_e,
        sig_eta=cfg.sig_eta, chunk=512,
    )

    tcfg = TrainConfig(batch_size=64)
    trainer = TwoStepTrainer(None, cfg, tcfg, fh=fh,
                             results_path=args.results,
                             y_norm=(ds.y_mean, ds.y_std))
    y0 = jnp.asarray(ds.y_data[:2])
    tp_t = trainer.theta_net.init(jax.random.PRNGKey(0), y0)
    zp_t = trainer.z_net.init(jax.random.PRNGKey(0), y0)
    theta_params, p1 = newest_params(args.results, "step1", tp_t)
    z_params, p2 = newest_params(args.results, "step2", zp_t)
    print(f"loaded {p1} and {p2}")

    batch_f = lambda th: jax.vmap(fh)(th)[0]
    validations = []
    for i in range(args.n_validate):
        y_obs = jnp.asarray(ds.y_data[i])
        tm, tsg, _, _ = trainer.predict(theta_params, z_params, y_obs[None])
        mu, L, _ = refine_posterior(
            batch_f, y_obs, cfg.sig_e, jnp.asarray(tm[0]),
            jnp.diag(jnp.sqrt(jnp.asarray(tsg[0]))),
            key=jax.random.PRNGKey(200 + i), steps=args.refine_steps,
            ne=16, lr=1e-2, chunk_steps=args.chunk_steps,
        )
        std_r = np.sqrt(np.diag(np.asarray(L @ L.T)))
        zgap = np.abs(np.asarray(tm[0]) - np.asarray(mu)) / std_r
        th_true = np.asarray(ds.theta_data[i])
        validations.append({
            "amortized_mean": np.asarray(tm[0]).tolist(),
            "amortized_std": np.sqrt(np.asarray(tsg[0])).tolist(),
            "refined_mean": np.asarray(mu).tolist(),
            "refined_std": std_r.tolist(),
            "zgap_amortized": zgap.tolist(),
            # the latent truth that generated this observation: the exact
            # posterior mean should sit within ~2 refined-std of it, which
            # arbitrates "refinement diverged" vs "amortized net underfit"
            "true_theta": th_true.tolist(),
            "zgap_refined_to_truth": (
                np.abs(np.asarray(mu) - th_true) / std_r
            ).tolist(),
        })
        print(f"obs {i}: amortized {validations[-1]['amortized_mean']} "
              f"refined {validations[-1]['refined_mean']} "
              f"true {th_true} zgap {zgap}")

    spath = os.path.join(args.results, "summary.json")
    summary = {}
    if os.path.exists(spath):
        with open(spath) as f:
            summary = json.load(f)
    summary["validation_vs_refined"] = validations
    with open(spath, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"updated {spath}")


if __name__ == "__main__":
    main()
