"""Scaled-configuration benchmark (BASELINE.json configs[4]).

Refined Cook's mesh (~160x80 = 12,800 quad4 elements, ~26k dofs), 256
posterior samples per step. Two paths are timed:

  * fem_solves_per_sec_cg    — matrix-free Jacobi-PCG, vmapped over the
    sample batch (the honest full-order path; shards over chips via
    parallel.solve_sharded on real slices);
  * fem_solves_per_sec_rom   — certified reduced-basis path: greedy RB built
    offline from ~10 sparse direct solves, then each sample costs O(r^2).

Prints one JSON line per metric. bench.py remains the headline metric.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.rom import build_reduced_basis, make_fh_fun_rom
    from vbicm_tpu.solver import make_fh_fun

    jax.config.update("jax_enable_x64", True)
    nx, ny, n_sam = 160, 80, 256
    t0 = time.time()
    model = build_fem_model(cooks_membrane_mesh(nx, ny), dense=False)
    build_s = time.time() - t0

    thetas = jnp.asarray(np.random.default_rng(0).normal(size=(n_sam, 2)))

    # --- ROM path -----------------------------------------------------
    t0 = time.time()
    rb = build_reduced_basis(model, tol=1e-10)
    rom_offline_s = time.time() - t0
    fh_rom = jax.jit(jax.vmap(make_fh_fun_rom(model, rb)))
    y, h = fh_rom(thetas)
    jax.block_until_ready(y)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        y, h = fh_rom(thetas)
    jax.block_until_ready(y)
    dt_rom = (time.perf_counter() - t0) / iters
    print(
        json.dumps(
            {
                "metric": "scaled_fem_solves_per_sec_rom",
                "value": round(n_sam / dt_rom, 1),
                "unit": "solves/s",
                "mesh": f"{nx}x{ny}",
                "rom_basis": rb.r,
                "rom_offline_s": round(rom_offline_s, 2),
                "certified_rel_residual": rb.max_rel_residual,
            }
        )
    )

    # --- full-order path: two-level (spectral-coarse) preconditioned CG ---
    from vbicm_tpu.solver import make_two_level_solver

    # NOTE: vmapped f32 CG misbehaves on the axon TPU runtime (correct on
    # CPU and single-sample TPU — see docs/KNOWN_ISSUES.md), so the
    # full-order metric times the jitted single-sample solve.
    n_cg = 8
    coarse = build_fem_model(cooks_membrane_mesh(40, 20), dense=True)
    solve2l = make_two_level_solver(
        model, coarse, 40, 20, nx // 40,
        cg_dtype=jnp.float32, refine_iters=2, tol=1e-4, maxiter=400,
    )
    fh_cg = jax.jit(make_fh_fun(model, solve_free=solve2l))
    y0, h0 = fh_cg(thetas[0])
    jax.block_until_ready(y0)
    t0 = time.perf_counter()
    ys = [fh_cg(thetas[i])[0] for i in range(n_cg)]
    jax.block_until_ready(ys)
    dt_cg = time.perf_counter() - t0
    # cross-check ROM against full-order
    y_rom, h_rom = fh_rom(thetas)
    err = float(jnp.max(jnp.abs(y_rom[:n_cg] - jnp.stack(ys))))
    print(
        json.dumps(
            {
                "metric": "scaled_fem_solves_per_sec_fullorder_2level",
                "value": round(n_cg / dt_cg, 2),
                "unit": "solves/s",
                "mesh": f"{nx}x{ny}",
                "rom_vs_cg_max_err": err,
                "model_build_s": round(build_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
