"""Two-step VI training driver — the reference `main_custom_training.py`
pipeline end to end: generate (or load) the dataset, fit q(theta|y), bridge,
fit p(z|y), save checkpoints + history.
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-data", type=int, default=1000)
    ap.add_argument("--ne-sam", type=int, default=4)
    ap.add_argument("--epochs1", type=int, default=20)
    ap.add_argument("--epochs2", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--dataset", type=str, default=None, help="HDF5 dataset to load instead of generating")
    ap.add_argument("--results", type=str, default="results_vi")
    ap.add_argument("--x64", action="store_true", default=True)
    ap.add_argument("--f32", dest="x64", action="store_false")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.x64:
        import vbicm_tpu

        vbicm_tpu.enable_x64()
    vbicm_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.prob.datagen import generate_data_fem, load_dataset, save_dataset
    from vbicm_tpu.solver import make_fh_fun
    from vbicm_tpu.vi.train import TwoStepTrainer

    print(f"backend: {jax.default_backend()}")
    model = build_fem_model(cooks_membrane_mesh(20, 10))
    cfg = ProblemConfig()

    if args.dataset:
        ds = load_dataset(args.dataset)
        print(f"loaded {ds.n_sam} samples, {ds.ne_sam} reparam seeds from {args.dataset}")
    else:
        fh = make_fh_fun(model, cfg, factor_dtype=jnp.float32, refine_iters=1)
        t0 = time.time()
        ds = generate_data_fem(
            jax.random.PRNGKey(args.seed),
            jax.jit(jax.vmap(fh)),
            n_sam=args.n_data,
            ne_sam=args.ne_sam,
            sig_e=cfg.sig_e,
            sig_eta=cfg.sig_eta,
            chunk=4096,
        )
        print(f"generated {args.n_data} data points in {time.time()-t0:.1f}s")
        save_dataset(ds, "data_fem_generated.h5")

    tcfg = TrainConfig(
        batch_size=args.batch_size, num_epoch1=args.epochs1, num_epoch2=args.epochs2
    )
    trainer = TwoStepTrainer(
        model, cfg, tcfg,
        factor_dtype=jnp.float32, refine_iters=1,
        results_path=args.results, verbose=True,
    )
    t0 = time.time()
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(args.seed + 1))
    print(f"total training time: {time.time()-t0:.1f}s")
    print(f"final step1 loss: {res.hist_step1[-1]:.6f}  (reference @20 epochs: 3.8168)")
    print(f"final step2 loss: {res.hist_step2[-1]:.3e}  (reference @20 epochs: 2.247e-05)")

    import h5py

    with h5py.File(f"{args.results}/train_hist.h5", "w") as f:
        f["train_loss_step1"] = res.hist_step1
        f["train_loss_step2"] = res.hist_step2


if __name__ == "__main__":
    main()
