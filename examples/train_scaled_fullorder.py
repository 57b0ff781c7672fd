"""Scaled FULL-ORDER two-step VI training (round-2 verdict item 1).

BASELINE.json configs[4] run end-to-end with no reduced-order shortcut:
the refined Cook's mesh (160x80 = 12,800 quad4 elements, 26,082 dofs), the
ELBO's observation operator routed through the structured-grid two-level
solver (``make_two_level_solver(use_stencil=True)`` — Pallas row-stencil
matvec + reshape transfer operators, f32 CG + refinement), 256 vmapped
full-order solves (64-batch x 4 posterior samples) per training step,
10k-point dataset, the reference's 20+20-epoch schedule.

Speed mode (default): split-f32 refinement residuals — kappa-limited
~3e-4 relative solves, 75x below the observation noise sig_e = 0.3
(ops/solve.py docstring); ``--exact`` switches to f64 residuals.

For the accuracy cross-check the SAME dataset then trains the certified
ROM path (``examples/train_scaled_rom.py`` flow), and the two posteriors /
predictives are compared map-to-map. Artifacts: results_scaled_fullorder/
(checkpoints, temp_data.mat, summary.json).
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
    ap.add_argument("--nx", type=int, default=160)
    ap.add_argument("--ny", type=int, default=80)
    ap.add_argument("--n-data", type=int, default=10000)
    ap.add_argument("--epochs1", type=int, default=20)
    ap.add_argument("--epochs2", type=int, default=20)
    ap.add_argument("--results", type=str, default="results_scaled_fullorder")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--exact", action="store_true",
                    help="f64 refinement residuals instead of split-f32")
    ap.add_argument("--skip-rom-compare", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoints in --results")
    args = ap.parse_args()

    import vbicm_tpu

    vbicm_tpu.enable_x64()
    vbicm_tpu.enable_compilation_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.prob.datagen import generate_data_fem
    from vbicm_tpu.solver import make_fh_fun, make_two_level_solver
    from vbicm_tpu.vi.train import TwoStepTrainer

    print(f"backend: {jax.default_backend()}")
    summary = {"config": vars(args)}
    t0 = time.time()
    model = build_fem_model(cooks_membrane_mesh(args.nx, args.ny), dense=False)
    coarse = build_fem_model(
        cooks_membrane_mesh(args.nx // 4, args.ny // 4), dense=True
    )
    cfg = dataclasses.replace(
        ProblemConfig(), node_id=model.nnodes, ele_id=(args.ny // 2) * args.nx + 12
    )
    solve2l = make_two_level_solver(
        model, coarse, args.nx // 4, args.ny // 4, 4,
        cg_dtype=jnp.float32, refine_iters=1, tol=3e-3, maxiter=400,
        use_stencil=True, coarse_f32_precision=jax.lax.Precision.DEFAULT,
        refine_residual="f64" if args.exact else "split_f32",
    )
    fh = make_fh_fun(model, cfg, solve_free=solve2l)
    build_s = time.time() - t0
    print(f"model ({model.ndof} dofs) + two-level stencil solver in {build_s:.1f}s")
    summary["ndof"] = model.ndof
    summary["build_s"] = round(build_s, 1)

    t0 = time.time()
    ds = generate_data_fem(
        jax.random.PRNGKey(args.seed), jax.jit(jax.vmap(fh)),
        n_sam=args.n_data, ne_sam=4, sig_e=cfg.sig_e, sig_eta=cfg.sig_eta,
        chunk=2048,
    )
    datagen_s = time.time() - t0
    print(f"{args.n_data}-point dataset (full-order sweep) in {datagen_s:.1f}s")
    summary["datagen_s"] = round(datagen_s, 1)

    tcfg = TrainConfig(batch_size=64, num_epoch1=args.epochs1, num_epoch2=args.epochs2)
    trainer = TwoStepTrainer(None, cfg, tcfg, fh=fh,
                             results_path=args.results, verbose=True)
    t0 = time.time()
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(args.seed + 1),
                      resume=args.resume)
    train_s = time.time() - t0
    n_steps = (args.n_data // 64) * (args.epochs1 + args.epochs2)
    print(f"two-step FULL-ORDER training: {train_s:.1f}s "
          f"({n_steps / train_s:.2f} steps/s at 256 full-order solves/step)")
    print(f"step1 last-batch {res.hist_step1[-1]:.4f}, step2 {res.hist_step2[-1]:.3e}")
    summary["train_s"] = round(train_s, 1)
    summary["train_steps_per_sec"] = round(n_steps / train_s, 3)
    summary["step1_last"] = float(res.hist_step1[-1])
    summary["step2_last"] = float(res.hist_step2[-1])

    if not args.skip_rom_compare:
        from vbicm_tpu.rom import build_reduced_basis, make_fh_fun_rom

        t0 = time.time()
        rb = build_reduced_basis(model, tol=1e-10)
        fh_rom = make_fh_fun_rom(model, rb, cfg)
        tr_rom = TwoStepTrainer(None, cfg, tcfg, fh=fh_rom, results_path=None)
        res_rom = tr_rom.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(args.seed + 1))
        print(f"ROM-path training on the SAME dataset: {time.time()-t0:.1f}s")

        y_all = jnp.asarray(ds.y_data)
        tm_f, tsg_f, _ = trainer.theta_net.apply(res.theta_params, y_all)
        tm_r, tsg_r, _ = tr_rom.theta_net.apply(res_rom.theta_params, y_all)
        zm_f, zs_f, _ = trainer.z_net.apply(res.z_params, y_all)
        zm_r, zs_r, _ = tr_rom.z_net.apply(res_rom.z_params, y_all)
        summary["posterior_vs_rom"] = dict(
            theta_mean_rmse=float(jnp.sqrt(jnp.mean((tm_f - tm_r) ** 2))),
            theta_mean_scale=float(jnp.std(tm_r)),
            theta_sig_rmse=float(jnp.sqrt(jnp.mean((tsg_f - tsg_r) ** 2))),
            theta_sig_scale=float(jnp.std(tsg_r)),
            z_mean_rmse=float(jnp.sqrt(jnp.mean((zm_f - zm_r) ** 2))),
            z_mean_scale=float(jnp.std(zm_r)),
            z_sig_rmse=float(jnp.sqrt(jnp.mean((zs_f - zs_r) ** 2))),
            z_sig_scale=float(jnp.std(zs_r)),
            step1_last_rom=float(res_rom.hist_step1[-1]),
            step2_last_rom=float(res_rom.hist_step2[-1]),
        )
        print("posterior full-order vs ROM:",
              json.dumps(summary["posterior_vs_rom"], indent=1))

    os.makedirs(args.results, exist_ok=True)
    with open(os.path.join(args.results, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.results}/summary.json")


if __name__ == "__main__":
    main()
