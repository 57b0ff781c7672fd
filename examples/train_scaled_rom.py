"""Scaled-configuration VI training: the full two-step amortized-VB pipeline
on the REFINED Cook's mesh (~160x80 = 12,800 elements, ~26k dofs,
BASELINE.json configs[4]) with the certified reduced-basis observation
operator inside the ELBO.

The dense spectral path cannot factor a 26k-dof operator, and full-order CG
at ~400 solves/s would make a 10k-point schedule take hours. The certified
ROM (rom/reduced_basis.py, greedy to 1e-10 true residual, ~160k solves/s)
makes the scaled problem train at the SAME speed as the 20x10 one — and the
trainer consumes it through the same ``fh`` override as any other forward
model. A full-order spot check validates the trained posterior's FEM
consistency at the end.
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
    ap.add_argument("--nx", type=int, default=160)
    ap.add_argument("--ny", type=int, default=80)
    ap.add_argument("--n-data", type=int, default=10000)
    ap.add_argument("--epochs1", type=int, default=20)
    ap.add_argument("--epochs2", type=int, default=20)
    ap.add_argument("--results", type=str, default="results_scaled_rom")
    ap.add_argument("--seed", type=int, default=0)
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
    from vbicm_tpu.rom import build_reduced_basis, make_fh_fun_rom
    from vbicm_tpu.solver import make_fh_fun, make_two_level_solver
    from vbicm_tpu.vi.train import TwoStepTrainer

    print(f"backend: {jax.default_backend()}")
    t0 = time.time()
    model = build_fem_model(cooks_membrane_mesh(args.nx, args.ny), dense=False)
    # probe roughly where the 20x10 case probes (tip node; interior element)
    cfg = dataclasses.replace(
        ProblemConfig(), node_id=model.nnodes, ele_id=(args.ny // 2) * args.nx + 12
    )
    rb = build_reduced_basis(model, tol=1e-10)
    fh = make_fh_fun_rom(model, rb, cfg)
    print(f"model ({model.ndof} dofs) + certified ROM (r={rb.r}, "
          f"residual {rb.max_rel_residual:.1e}) in {time.time()-t0:.1f}s")

    t0 = time.time()
    ds = generate_data_fem(
        jax.random.PRNGKey(args.seed), jax.jit(jax.vmap(fh)),
        n_sam=args.n_data, ne_sam=4, sig_e=cfg.sig_e, sig_eta=cfg.sig_eta,
        chunk=8192,
    )
    print(f"{args.n_data}-point dataset in {time.time()-t0:.1f}s")

    tcfg = TrainConfig(batch_size=64, num_epoch1=args.epochs1, num_epoch2=args.epochs2)
    trainer = TwoStepTrainer(None, cfg, tcfg, fh=fh,
                             results_path=args.results, verbose=True)
    t0 = time.time()
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(args.seed + 1))
    print(f"two-step training on the {args.nx}x{args.ny} mesh: {time.time()-t0:.1f}s")
    print(f"step1 last-batch {res.hist_step1[-1]:.4f}, step2 {res.hist_step2[-1]:.3e}")

    # full-order spot check: posterior means pushed through the TWO-LEVEL
    # full-order solver agree with the ROM observation operator
    coarse = build_fem_model(cooks_membrane_mesh(args.nx // 4, args.ny // 4), dense=True)
    solve2l = make_two_level_solver(
        model, coarse, args.nx // 4, args.ny // 4, 4,
        cg_dtype=jnp.float32, refine_iters=1, tol=3e-3, maxiter=400,
    )
    fh_full = jax.jit(jax.vmap(make_fh_fun(model, cfg, solve_free=solve2l)))
    tm, _, _ = trainer.theta_net.apply(res.theta_params, jnp.asarray(ds.y_data[:16]))
    y_rom, h_rom = jax.jit(jax.vmap(fh))(tm)
    y_full, h_full = fh_full(tm)
    err = float(jnp.max(jnp.abs(y_rom - y_full)) / jnp.max(jnp.abs(y_full)))
    print(f"ROM vs full-order at 16 posterior means: rel err {err:.2e}")
    assert err < 1e-5


if __name__ == "__main__":
    main()
