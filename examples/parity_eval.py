"""Deterministic training-parity evaluation vs the reference's shipped
checkpoints.

The reference's per-epoch history entries are single LAST-BATCH loss draws
with huge variance (its own step-1 history ranges 1.45..5.96 before ending
at 3.8168 — ``results_2steps_proposed1/step1/train_hist_step1.h5``), so
chasing the scalar 3.8168 is chasing noise. The deterministic quantities
that define "same training result" are:

  * the FULL-DATASET step-1 ELBO (mean over the fixed batch partition,
    e_data common random numbers fixed) evaluated on trained weights;
  * the posterior map y -> (theta_mean, theta_sig) over the dataset;
  * the step-1->2 bridge moments vs the reference's cached
    ``temp_data.mat``;
  * the predictive map y -> (z_mean, z_sig).

This script loads the reference's Keras checkpoints
(``results_2steps_proposed1``) into our flax nets (eval/reference_ckpt.py)
and compares those quantities against our trained parameters. Emits JSON.
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", type=str, default="results_proposed1_repro_10k",
                    help="results dir with step1/latest.msgpack + step2/latest.msgpack")
    ap.add_argument("--ref", type=str, default="/root/reference/results_2steps_proposed1")
    ap.add_argument("--dataset", type=str,
                    default="/root/reference/data_fem_test_big_noise.h5")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import vbicm_tpu

    vbicm_tpu.enable_x64()
    vbicm_tpu.enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.eval.reference_ckpt import (
        load_temp_data_moments,
        load_theta_params,
        load_z_params,
    )
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.models.mlp import init_vi_networks
    from vbicm_tpu.prob.datagen import load_dataset
    from vbicm_tpu.solver import make_fh_fun
    from vbicm_tpu.utils.checkpoint import load_msgpack
    from vbicm_tpu.vi.elbo import make_loss_step1, make_loss_step2
    from vbicm_tpu.vi.train import TwoStepTrainer

    ds = load_dataset(args.dataset)
    y_data = jnp.asarray(ds.y_data)
    e_data = jnp.asarray(ds.e_data)
    n, bs = y_data.shape[0], args.batch_size
    print(f"dataset: {n} points, ne_sam={e_data.shape[0]}, backend={jax.default_backend()}")

    model = build_fem_model(cooks_membrane_mesh(20, 10))
    cfg = ProblemConfig()
    fh = make_fh_fun(model, cfg, factor_dtype=jnp.float32, refine_iters=1)
    batch_fh = jax.vmap(fh)
    batch_f = lambda th: batch_fh(th)[0]
    batch_h = lambda th: batch_fh(th)[1]

    tcfg = TrainConfig()
    loss1 = make_loss_step1(batch_f, e_data, cfg.sig_e, tcfg.pairing)
    loss2 = make_loss_step2(batch_h, e_data, cfg.sig_eta, tcfg.alpha, tcfg.pairing)

    theta_net, th0, z_net, z0 = init_vi_networks(jax.random.PRNGKey(0))

    @jax.jit
    def batch_loss1(params, yb):
        return loss1(yb, theta_net.apply(params, yb))

    @jax.jit
    def batch_loss2(theta_params, z_params, yb, lm_b, ls_b):
        tm, tsg, _ = theta_net.apply(theta_params, yb)
        zm, zs, lzs = z_net.apply(z_params, yb)
        return loss2((yb, lm_b, ls_b), (tm, tsg, zm, zs, lzs))

    def epoch_eval1(params):
        losses = [
            float(batch_loss1(params, y_data[i : i + bs]))
            for i in range(0, n - bs + 1, bs)
        ]
        a = np.array(losses)
        return dict(mean=float(a.mean()), std=float(a.std()),
                    min=float(a.min()), max=float(a.max()))

    def epoch_eval2(tp, zp, lm, ls):
        losses = [
            float(batch_loss2(tp, zp, y_data[i:i+bs], lm[i:i+bs], ls[i:i+bs]))
            for i in range(0, n - bs + 1, bs)
        ]
        a = np.array(losses)
        return dict(mean=float(a.mean()), std=float(a.std()),
                    min=float(a.min()), max=float(a.max()))

    out = {}

    # ----- reference weights -----
    import glob
    import os

    ref_step1 = sorted(glob.glob(os.path.join(args.ref, "step1", "19-*.h5")))[0]
    ref_theta = load_theta_params(ref_step1)
    out["ref_step1_eval"] = epoch_eval1(ref_theta)
    print(f"reference step-1 full-data loss: {out['ref_step1_eval']}")

    lm_ref, ls_ref = load_temp_data_moments(os.path.join(args.ref, "temp_data.mat"))
    lm_ref, ls_ref = jnp.asarray(lm_ref), jnp.asarray(ls_ref)
    ref_z = load_z_params(os.path.join(args.ref, "step2", "final_model_step2.h5"))
    out["ref_step2_eval"] = epoch_eval2(ref_theta, ref_z, lm_ref, ls_ref)
    print(f"reference step-2 full-data loss: {out['ref_step2_eval']}")

    # ----- our weights -----
    ours_ok = os.path.exists(os.path.join(args.ours, "step1", "latest.msgpack"))
    if ours_ok:
        trainer = TwoStepTrainer(model, cfg, tcfg, results_path=args.ours)
        opt1 = trainer._opt_step1()
        got = trainer.load_ckpt("step1", th0, opt1.init(th0))
        our_theta = got[0]
        out["our_step1_eval"] = epoch_eval1(our_theta)
        print(f"our step-1 full-data loss:       {out['our_step1_eval']}")

        opt2 = trainer._opt_step2()
        got2 = trainer.load_ckpt("step2", z0, opt2.init(z0))
        our_z = got2[0] if got2 else None

        # our bridge moments: the persisted training targets when available
        # (fair step-2 eval: each z-net against what its training minimized —
        # the eta draw differs per run by design, like the reference's),
        # else a fresh bridge
        temp_path = os.path.join(args.ours, "temp_data.mat")
        if os.path.exists(temp_path):
            lm_ours, ls_ours = load_temp_data_moments(temp_path)
        else:
            lm_ours, ls_ours = trainer.bridge(
                y_data, e_data, our_theta, jax.random.PRNGKey(7)
            )
        out["bridge_moment_rmse_vs_tempdata"] = dict(
            logz_mean=float(np.sqrt(np.mean((lm_ours - np.asarray(lm_ref)) ** 2))),
            logz_sig=float(np.sqrt(np.mean((ls_ours - np.asarray(ls_ref)) ** 2))),
            logz_mean_scale=float(np.std(np.asarray(lm_ref))),
            logz_sig_scale=float(np.std(np.asarray(ls_ref))),
        )
        print(f"bridge moments vs temp_data.mat: {out['bridge_moment_rmse_vs_tempdata']}")

        if our_z is not None:
            out["our_step2_eval"] = epoch_eval2(
                our_theta, our_z, jnp.asarray(lm_ours), jnp.asarray(ls_ours)
            )
            print(f"our step-2 full-data loss:       {out['our_step2_eval']}")

        # posterior / predictive map agreement over the whole dataset
        tm_r, tsg_r, _ = theta_net.apply(ref_theta, y_data)
        tm_o, tsg_o, _ = theta_net.apply(our_theta, y_data)
        out["posterior_map"] = dict(
            theta_mean_rmse=float(jnp.sqrt(jnp.mean((tm_r - tm_o) ** 2))),
            theta_mean_scale=float(jnp.std(tm_r)),
            theta_sig_rmse=float(jnp.sqrt(jnp.mean((tsg_r - tsg_o) ** 2))),
            theta_sig_scale=float(jnp.std(tsg_r)),
        )
        print(f"posterior map ours vs reference: {out['posterior_map']}")
        if our_z is not None:
            zm_r, zs_r, _ = z_net.apply(ref_z, y_data)
            zm_o, zs_o, _ = z_net.apply(our_z, y_data)
            out["predictive_map"] = dict(
                z_mean_rmse=float(jnp.sqrt(jnp.mean((zm_r - zm_o) ** 2))),
                z_mean_scale=float(jnp.std(zm_r)),
                z_sig_rmse=float(jnp.sqrt(jnp.mean((zs_r - zs_o) ** 2))),
                z_sig_scale=float(jnp.std(zs_r)),
            )
            print(f"predictive map ours vs reference: {out['predictive_map']}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
