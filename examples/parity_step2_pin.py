"""Pin the step-2 parity residual (round-2 verdict item 2).

Round 2 left one loose end: our end-to-end step-2 full-data loss (8.2e-5)
sits above the reference's (3.1e-5), attributed — but not proven — to the
eta-draw noise in the ne_sam=4 bridge targets (the reference's
``temp_data.mat`` is itself one noisy draw of the moment-matching targets,
``main_custom_training.py:310-328``).

Two decisive experiments:

A. Train OUR step 2 against the REFERENCE'S OWN shipped targets
   (``results_2steps_proposed1/temp_data.mat``) with its step-1 weights
   frozen — identical targets, identical frozen posterior. If the trainer
   is equivalent, the full-data loss must land at the reference's own
   level (~3.1e-5), eliminating bridge noise as a variable.

B. Bridge-noise scaling: K independent bridges (fresh eta draws) at
   ne_sam = 4 / 16 / 64. The moment-matching floor of the step-2 loss is
   the across-draw variance of the targets themselves (the z-net fits the
   mean of its own targets' distribution, leaving Var[targets] as
   irreducible in-expectation MSE against a fresh draw); it must scale
   ~1/ne_sam.

Usage: python examples/parity_step2_pin.py --out PARITY_STEP2.json
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", type=str, default="/root/reference/results_2steps_proposed1")
    ap.add_argument("--dataset", type=str,
                    default="/root/reference/data_fem_test_big_noise.h5")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--bridges", type=int, default=6)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out", type=str, default="PARITY_STEP2.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-train", action="store_true",
                    help="only run the bridge-variance sweep (part B)")
    args = ap.parse_args()

    import vbicm_tpu

    vbicm_tpu.enable_x64()
    vbicm_tpu.enable_compilation_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import glob

    import jax.numpy as jnp
    import numpy as np

    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.eval.reference_ckpt import (
        load_temp_data_moments,
        load_theta_params,
        load_z_params,
    )
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.prob.datagen import load_dataset
    from vbicm_tpu.vi.elbo import make_loss_step2
    from vbicm_tpu.vi.train import TwoStepTrainer

    ds = load_dataset(args.dataset)
    y_data = jnp.asarray(ds.y_data)
    e_data = jnp.asarray(ds.e_data)
    n, bs = y_data.shape[0], args.batch_size
    print(f"dataset: {n} points, backend={jax.default_backend()}")

    model = build_fem_model(cooks_membrane_mesh(20, 10))
    cfg = ProblemConfig()
    tcfg = TrainConfig(batch_size=bs, num_epoch2=args.epochs)
    trainer = TwoStepTrainer(
        model, cfg, tcfg, factor_dtype=jnp.float32, refine_iters=1
    )

    ref_step1 = sorted(glob.glob(os.path.join(args.ref, "step1", "19-*.h5")))[0]
    ref_theta = load_theta_params(ref_step1)
    lm_ref, ls_ref = load_temp_data_moments(os.path.join(args.ref, "temp_data.mat"))
    lm_ref, ls_ref = jnp.asarray(lm_ref), jnp.asarray(ls_ref)
    ref_z = load_z_params(os.path.join(args.ref, "step2", "final_model_step2.h5"))

    batch_h = lambda th: trainer._batch_fh(th)[1]
    loss2 = make_loss_step2(batch_h, e_data, cfg.sig_eta, tcfg.alpha, tcfg.pairing)

    @jax.jit
    def batch_loss2(tp, zp, yb, lm_b, ls_b):
        tm, tsg, _ = trainer.theta_net.apply(tp, yb)
        zm, zs, lzs = trainer.z_net.apply(zp, yb)
        return loss2((yb, lm_b, ls_b), (tm, tsg, zm, zs, lzs))

    def full_eval(tp, zp, lm, ls):
        losses = [
            float(batch_loss2(tp, zp, y_data[i:i+bs], lm[i:i+bs], ls[i:i+bs]))
            for i in range(0, n - bs + 1, bs)
        ]
        a = np.array(losses)
        return dict(mean=float(a.mean()), std=float(a.std()))

    out = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)

    # ---- A: our trainer on the reference's own targets/frozen posterior ----
    if not args.skip_train:
        ref_level = full_eval(ref_theta, ref_z, lm_ref, ls_ref)
        print(f"reference z-weights on its targets: {ref_level}")
        out["ref_z_on_ref_targets"] = ref_level

        z_params, hist = trainer.train_step2(
            y_data, e_data, ref_theta, lm_ref, ls_ref,
            jax.random.PRNGKey(args.seed),
        )
        ours_level = full_eval(ref_theta, z_params, lm_ref, ls_ref)
        print(f"our z (trained on ref targets):     {ours_level}")
        out["our_z_on_ref_targets"] = ours_level
        out["step2_hist_on_ref_targets"] = [float(x) for x in hist]

    # ---- B: bridge-target variance vs ne_sam ----
    key = jax.random.PRNGKey(args.seed + 100)
    sweep = {}
    for ne in (4, 16, 64):
        if ne == e_data.shape[0]:
            e_ne = e_data
        else:
            key, k_e = jax.random.split(key)
            e_ne = jax.random.normal(k_e, (ne, e_data.shape[1]), y_data.dtype)
        lms, lss = [], []
        for k in range(args.bridges):
            key, k_eta = jax.random.split(key)
            lm_k, ls_k = trainer.bridge(y_data, e_ne, ref_theta, k_eta)
            lms.append(lm_k)
            lss.append(ls_k)
        lm_st = np.stack(lms)  # (K, n, d)
        ls_st = np.stack(lss)

        def decompose(st):
            """Across-draw target variance, split into the COMMON component
            (the eta draw is SHARED by every y — main_custom_training.py:
            318-320 — so most of the draw-to-draw movement is a coherent
            across-y shift a smooth net f(y) simply follows) and the
            IDIOSYNCRATIC per-y remainder, which is the component that
            actually limits how reproducible the fitted net is."""
            total = float(st.var(axis=0, ddof=1).mean())
            shift = st.mean(axis=1, keepdims=True)  # (K, 1, d) common shift
            idio = float((st - shift).var(axis=0, ddof=1).mean())
            return total, idio

        tot_lm, idio_lm = decompose(lm_st)
        tot_ls, idio_ls = decompose(ls_st)
        sweep[str(ne)] = dict(
            var_logz_mean=tot_lm, var_logz_mean_idio=idio_lm,
            var_logz_sig=tot_ls, var_logz_sig_idio=idio_ls,
            idio_floor=idio_lm + idio_ls,
        )
        print(f"ne_sam={ne}: target var mean={tot_lm:.3e} (idio {idio_lm:.3e}) "
              f"sig={tot_ls:.3e} (idio {idio_ls:.3e})")
    out["bridge_variance_sweep"] = sweep

    f4 = sweep["4"]["idio_floor"]
    f16 = sweep["16"]["idio_floor"]
    f64 = sweep["64"]["idio_floor"]
    out["floor_scaling"] = dict(ratio_4_16=f4 / f16, ratio_16_64=f16 / f64)
    print(f"idiosyncratic floor scaling 4->16: {f4/f16:.2f}x, "
          f"16->64: {f16/f64:.2f}x (1/ne would be 4x each)")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
