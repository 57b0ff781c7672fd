"""Arbitrate the full-order vs ROM posterior theta-mean gap at 160x80.

Round-3 result (`results_scaled_fullorder/summary.json::posterior_vs_rom`):
the two-step nets trained through the full-order two-level stencil solver
and through the certified ROM (solve agreement ~1e-7) disagree by
theta_mean_rmse 0.0122 vs theta_mean_scale 0.0417 — a 29% relative gap.
One of three explanations must hold:

  (a) the ROM path biases the posterior (solver error — implausible at
      1e-7 solve agreement vs sig_e = 0.1 observation noise);
  (b) the bridge / step-2 coupling amplifies tiny fh differences;
  (c) SGD training noise: theta is weakly identified here (the amortized
      posterior std is ~0.45 while the mean's spread across observations
      is only 0.0417), so independently-trained nets place the mean
      anywhere inside a training-noise ball much wider than the signal.

This driver decides it by measurement, reproducing the original runs
exactly (same dataset seed, same training seed, identical schedules):

  1. retrain BOTH paths on the SAME regenerated dataset (reproduces the
     gap measured in round 3);
  2. retrain the ROM path AGAIN with a different training seed only —
     same fh, same data: the seed-to-seed theta_mean_rmse is the pure
     training-noise floor. If the full-vs-ROM gap sits at this floor, the
     gap is (c), not a path bias;
  3. exact-posterior probes: on the observations where the two nets
     disagree most (plus random ones), run per-observation SVI refinement
     (`vi.refine`, fresh-noise full-covariance — the exact posterior up to
     refinement tolerance) from a NEUTRAL init through BOTH the full-order
     and ROM observation operators. The refined means agree between
     operators (solve-level check) and give the exact posterior mean; each
     net's distance to it, in units of the exact posterior std, says which
     path (if either) is biased.

Writes an `arbitration` block into results_scaled_fullorder/summary.json.

Reference surface: the posterior comparison of `main_postprocess.py:65-78`;
the gap itself is between two implementations of this repo (no reference
counterpart — its single path has no ROM to disagree with).
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import argparse
import dataclasses
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=160)
    ap.add_argument("--ny", type=int, default=80)
    ap.add_argument("--n-data", type=int, default=10000)
    ap.add_argument("--epochs1", type=int, default=20)
    ap.add_argument("--epochs2", type=int, default=20)
    ap.add_argument("--n-probe", type=int, default=16,
                    help="observations probed with exact-posterior refinement")
    ap.add_argument("--refine-steps", type=int, default=2000)
    ap.add_argument("--results", type=str, default="results_scaled_fullorder")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scan-chunk", type=int, default=13,
                    help="batches per device program (156 %% it == 0 avoids "
                         "a second epoch-scan compile)")
    ap.add_argument("--resume", action="store_true",
                    help="continue from trainer checkpoints and the probe "
                         "journal — the axon TPU worker crashes "
                         "INTERMITTENTLY on long runs (docs/KNOWN_ISSUES."
                         "md); run under a retry loop with this flag")
    args = ap.parse_args()

    import vbicm_tpu

    vbicm_tpu.enable_x64()
    vbicm_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.prob.datagen import generate_data_fem
    from vbicm_tpu.rom import build_reduced_basis, make_fh_fun_rom
    from vbicm_tpu.solver import make_fh_fun, make_two_level_solver
    from vbicm_tpu.vi.refine import refine_posterior
    from vbicm_tpu.vi.train import TwoStepTrainer

    print(f"backend: {jax.default_backend()}")
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
        refine_residual="split_f32",
    )
    fh = make_fh_fun(model, cfg, solve_free=solve2l)
    # ROM basis + dataset are deterministic in (mesh, seed, sizes); cache
    # them across --resume retries — the intermittent worker crash makes
    # the external retry loop pay the greedy RB build (~1-2 min) and the
    # 10k-solve datagen on EVERY attempt otherwise
    from vbicm_tpu.prob.datagen import MeasurementDataset
    from vbicm_tpu.rom.reduced_basis import ReducedBasis

    os.makedirs(args.results, exist_ok=True)
    cache = os.path.join(args.results, "arb_cache.npz")
    if args.resume and os.path.exists(cache):
        import numpy as _np

        z = dict(_np.load(cache, allow_pickle=False))
        rb = ReducedBasis(
            Q=z["Q"], g=z["g"], V=z["V"], f_r=z["f_r"], ff=float(z["ff"]),
            m=z["m"], G=z["G"],
            t_snapshots=tuple(z["t_snapshots"].tolist()),
            max_rel_residual=float(z["max_rel_residual"]),
        )
        ds = MeasurementDataset(
            y_data=z["y_data"], z_data=z["z_data"],
            log_z_data=z["log_z_data"], e_data=z["e_data"],
            y_mean=z["y_mean"], y_std=z["y_std"], z_mean=z["z_mean"],
            z_std=z["z_std"], theta_data=z["theta_data"],
        )
        fh_rom = make_fh_fun_rom(model, rb, cfg)
        print(f"model + solver in {time.time()-t0:.1f}s "
              f"(ROM basis r={rb.r} + dataset from {cache})")
    else:
        rb = build_reduced_basis(model, tol=1e-10)
        fh_rom = make_fh_fun_rom(model, rb, cfg)
        print(f"model + solver + ROM in {time.time()-t0:.1f}s")

        # same dataset as the round-3 run (same key, same sizes)
        t0 = time.time()
        ds = generate_data_fem(
            jax.random.PRNGKey(args.seed), jax.jit(jax.vmap(fh)),
            n_sam=args.n_data, ne_sam=4, sig_e=cfg.sig_e,
            sig_eta=cfg.sig_eta, chunk=2048,
        )
        print(f"dataset in {time.time()-t0:.1f}s")
        import numpy as _np

        _np.savez(
            cache, Q=rb.Q, g=rb.g, V=rb.V, f_r=rb.f_r, ff=rb.ff, m=rb.m,
            G=rb.G, t_snapshots=_np.asarray(rb.t_snapshots),
            max_rel_residual=rb.max_rel_residual,
            y_data=ds.y_data, z_data=ds.z_data, log_z_data=ds.log_z_data,
            e_data=ds.e_data, y_mean=ds.y_mean, y_std=ds.y_std,
            z_mean=ds.z_mean, z_std=ds.z_std, theta_data=ds.theta_data,
        )
    # scan_chunk: identical update trajectory, but each device program is
    # args.scan_chunk batches instead of 156 — a monolithic epoch scan over
    # the full-order two-level solver tripped the TPU worker here, and so
    # did a 39-batch chunk (observed 2026-08-20, twice): the crash is
    # INTERMITTENT, so the defense is short programs + checkpoint/resume
    # under an external retry loop, not a chunk size alone.
    # ckpt_every=1: the worker crash interval here has been observed SHORTER
    # than the default num_epochs//5 checkpoint cadence — retries made zero
    # forward progress (attempts 3-5 on 2026-08-20 all died between epoch 4
    # and the epoch-7 checkpoint). Per-epoch checkpoints bound the loss per
    # crash to one epoch (~40 s full-order).
    # ckpt_chunk: by mid-round-5 the crash interval dropped BELOW one
    # full-order epoch (~40 s + 90-220 s rebuild per retry), so even
    # per-epoch checkpoints stopped banking progress; chunk-level bundles
    # (every 13 batches, ~4 s) survive arbitrarily short attempt windows.
    tcfg = TrainConfig(batch_size=64, num_epoch1=args.epochs1,
                       num_epoch2=args.epochs2, scan_chunk=args.scan_chunk,
                       ckpt_every=1, ckpt_chunk=True)

    def train(fh_used, train_seed, tag):
        t0 = time.time()
        tr = TwoStepTrainer(
            None, cfg, tcfg, fh=fh_used,
            results_path=os.path.join(args.results, "arb_ckpt", tag),
        )
        res = tr.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(train_seed),
                     resume=args.resume)
        print(f"[{tag}] trained in {time.time()-t0:.1f}s "
              f"(step1 {res.hist_step1[-1]:.4f}, step2 {res.hist_step2[-1]:.3e})")
        return tr, res

    tr_f, res_f = train(fh, args.seed + 1, "full-order")
    tr_r, res_r = train(fh_rom, args.seed + 1, "ROM same-seed")
    tr_r2, res_r2 = train(fh_rom, args.seed + 101, "ROM reseeded")

    y_all = jnp.asarray(ds.y_data)
    tm_f, tsg_f, _ = tr_f.theta_net.apply(res_f.theta_params, y_all)
    tm_r, tsg_r, _ = tr_r.theta_net.apply(res_r.theta_params, y_all)
    tm_r2, _, _ = tr_r2.theta_net.apply(res_r2.theta_params, y_all)

    def rmse(a, b):
        return float(jnp.sqrt(jnp.mean((a - b) ** 2)))

    gap_paths = rmse(tm_f, tm_r)          # full-order vs ROM, same seed
    noise_floor = rmse(tm_r, tm_r2)       # ROM vs ROM, seeds differ only
    scale = float(jnp.std(tm_r))
    print(f"theta-mean gap full-vs-ROM (same seed): {gap_paths:.5f}")
    print(f"theta-mean training-noise floor (ROM reseeded): {noise_floor:.5f}")
    print(f"theta-mean scale across observations:  {scale:.5f}")

    # --- exact-posterior probes -------------------------------------------
    # where the nets disagree most, plus evenly-spaced observations
    dis = np.asarray(jnp.linalg.norm(tm_f - tm_r, axis=1))
    order = np.argsort(-dis)
    n_half = args.n_probe // 2
    idx = np.concatenate([
        order[:n_half],
        np.linspace(0, args.n_data - 1, args.n_probe - n_half).astype(int),
    ])
    idx = np.unique(idx)

    batch_f_full = lambda th: jax.vmap(fh)(th)[0]
    batch_f_rom = lambda th: jax.vmap(fh_rom)(th)[0]
    # incremental probe journal: each completed probe is appended to disk so
    # a retried run (--resume) skips it
    os.makedirs(args.results, exist_ok=True)
    jpath = os.path.join(args.results, "arb_probes.jsonl")
    done = {}
    if args.resume and os.path.exists(jpath):
        with open(jpath) as f:
            for line in f:
                rec = json.loads(line)
                done[rec["obs"]] = rec
        print(f"resuming probes: {len(done)} already journaled")
    probes = []
    t0 = time.time()
    for n, i in enumerate(idx):
        if int(i) in done:
            probes.append(done[int(i)])
            continue
        y_obs = y_all[i]
        mu_x, L_x, _ = refine_posterior(
            batch_f_rom, y_obs, cfg.sig_e, jnp.zeros(2), 0.3 * jnp.eye(2),
            key=jax.random.PRNGKey(1000 + int(i)), steps=args.refine_steps,
            ne=16, lr=1e-2, chunk_steps=250,
        )
        std_x = np.sqrt(np.diag(np.asarray(L_x @ L_x.T)))
        rec = {
            "obs": int(i),
            "exact_mean": np.asarray(mu_x).tolist(),
            "exact_std": std_x.tolist(),
            "zgap_fullorder": (np.abs(np.asarray(tm_f[i] - mu_x)) / std_x).tolist(),
            "zgap_rom": (np.abs(np.asarray(tm_r[i] - mu_x)) / std_x).tolist(),
            "zgap_rom_reseeded": (np.abs(np.asarray(tm_r2[i] - mu_x)) / std_x).tolist(),
        }
        # solve-level check on a few probes: refine through the FULL-ORDER
        # operator from the same init must land on the same exact mean
        if n < 3:
            # chunked: a monolithic refine scan over the full-order
            # two-level solver is the long-program class that crashes the
            # TPU worker (docs/KNOWN_ISSUES.md)
            mu_xf, L_xf, _ = refine_posterior(
                batch_f_full, y_obs, cfg.sig_e, jnp.zeros(2), 0.3 * jnp.eye(2),
                key=jax.random.PRNGKey(1000 + int(i)),
                steps=args.refine_steps, ne=16, lr=1e-2, chunk_steps=250,
            )
            rec["exact_mean_fullorder_op"] = np.asarray(mu_xf).tolist()
            rec["operator_mean_gap_in_std"] = (
                np.abs(np.asarray(mu_xf - mu_x)) / std_x
            ).tolist()
        probes.append(rec)
        with open(jpath, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"probe {n}/{len(idx)} obs {i}: zgap_full "
              f"{rec['zgap_fullorder']} zgap_rom {rec['zgap_rom']}")
    print(f"probes in {time.time()-t0:.1f}s")

    def agg(key):
        v = np.asarray([p[key] for p in probes])
        return {"mean": float(v.mean()), "max": float(v.max())}

    arb = {
        "theta_mean_gap_full_vs_rom": gap_paths,
        "theta_mean_noise_floor_rom_reseeded": noise_floor,
        "theta_mean_scale": scale,
        "gap_over_noise_floor": gap_paths / max(noise_floor, 1e-30),
        "zgap_fullorder": agg("zgap_fullorder"),
        "zgap_rom": agg("zgap_rom"),
        "zgap_rom_reseeded": agg("zgap_rom_reseeded"),
        "probes": probes,
        "step1_last": {"fullorder": float(res_f.hist_step1[-1]),
                       "rom": float(res_r.hist_step1[-1]),
                       "rom_reseeded": float(res_r2.hist_step1[-1])},
        "step2_last": {"fullorder": float(res_f.hist_step2[-1]),
                       "rom": float(res_r.hist_step2[-1]),
                       "rom_reseeded": float(res_r2.hist_step2[-1])},
    }
    # verdict by measurement
    if arb["gap_over_noise_floor"] < 2.0:
        arb["verdict"] = (
            "training noise: the full-vs-ROM gap is within 2x the "
            "seed-to-seed noise floor of a single path; neither operator "
            "biases the posterior"
        )
    elif arb["zgap_fullorder"]["mean"] < arb["zgap_rom"]["mean"]:
        arb["verdict"] = "full-order posterior is closer to exact; ROM path biased"
    else:
        arb["verdict"] = "ROM posterior is closer to exact; full-order path biased"
    print("ARBITRATION:", arb["verdict"])

    os.makedirs(args.results, exist_ok=True)
    spath = os.path.join(args.results, "summary.json")
    summary = {}
    if os.path.exists(spath):
        with open(spath) as f:
            summary = json.load(f)
    summary["arbitration"] = arb
    with open(spath, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote arbitration block to {spath}")


if __name__ == "__main__":
    main()
