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

    # --- full-order path: two-level (spectral-coarse) preconditioned CG,
    #     VMAPPED over the full 256-sample batch (BASELINE configs[4]) ---
    # Round-1's "vmapped CG misbehaves" was root-caused to the batched
    # affine-combine tensordot lowering to a single bf16 pass at default
    # TPU precision; ops.solve now uses constant-operand per-part matvecs
    # (docs/KNOWN_ISSUES.md) and the vmapped solve matches per-sample to
    # 1e-13 at this size.
    from vbicm_tpu.solver import make_two_level_solver

    # config from the round-2 sweeps vs the certified ROM oracle: f32 CG at
    # tol 3e-3 + ONE f64 refinement lands ~1e-08 relative (observation
    # noise is 0.3) — round-1's 179 solves/s ran at gratuitous 2e-13
    # use_stencil: whole CG iteration in structured-grid form (Pallas row
    # stencil matvec + reshape-based transfer operators) — 701 vs 530
    # solves/s for the element gather/scatter path (round-2 sweep; equal to
    # f32 rounding). Coarse level 40x20 at ratio 4 with DEFAULT-precision
    # (single-bf16-pass) coarse matmuls: within noise of the 80x40/HIGHEST
    # level (742 vs 701) at 30x cheaper setup (6.6 vs 203 s eigh) — the
    # preconditioner only shapes the Krylov space, accuracy comes from CG
    # on the exact operator + the f64 refinement.
    # Round 3: refinement residuals now use COMPENSATED f32 stencil
    # arithmetic (Dekker TwoProd / Knuth TwoSum, ops/stencil_compensated.py)
    # instead of the emulated-f64 element matvec that used to eat >half the
    # solve (143 ms/batch); same ~2e-8 final accuracy, 1148 -> 2820 solves/s.
    coarse = build_fem_model(cooks_membrane_mesh(nx // 4, ny // 4), dense=True)
    solve2l = make_two_level_solver(
        model, coarse, nx // 4, ny // 4, 4,
        cg_dtype=jnp.float32, refine_iters=1, tol=3e-3, maxiter=400,
        use_stencil=True, coarse_f32_precision=jax.lax.Precision.DEFAULT,
        refine_residual="compensated",
    )
    fh_cg_one = jax.jit(make_fh_fun(model, solve_free=solve2l))
    fh_cg = jax.jit(jax.vmap(make_fh_fun(model, solve_free=solve2l)))
    yb, hb = fh_cg(thetas)
    jax.block_until_ready(yb)
    t0 = time.perf_counter()
    yb, hb = fh_cg(thetas)
    jax.block_until_ready(yb)
    dt_cg = time.perf_counter() - t0
    # correctness: batched == per-sample, and ROM agrees with full order
    n_chk = 4
    y_ps = jnp.stack([fh_cg_one(thetas[i])[0] for i in range(n_chk)])
    vmap_vs_ps = float(jnp.max(jnp.abs(yb[:n_chk] - y_ps)))
    y_rom, h_rom = fh_rom(thetas)
    err = float(jnp.max(jnp.abs(y_rom - yb)))
    from vbicm_tpu.utils.roofline import compiled_costs, mfu_fields

    fl, by = compiled_costs(jax.vmap(make_fh_fun(model, solve_free=solve2l)), thetas)
    print(
        json.dumps(
            {
                "metric": "scaled_fem_solves_per_sec_fullorder_2level",
                "value": round(n_sam / dt_cg, 2),
                "unit": "solves/s",
                "mesh": f"{nx}x{ny}",
                "batch": n_sam,
                "vmap_vs_persample_max_err": vmap_vs_ps,
                "rom_vs_cg_max_err": err,
                "model_build_s": round(build_s, 2),
                **mfu_fields(fl, by, 1.0 / dt_cg),
            }
        )
    )

    # speed mode: split-f32 refinement residual (kappa-limited ~3e-4
    # relative — 75x below the VI observation noise; docstring in
    # ops/solve.py::make_matfree_affine_solver)
    solve_sp = make_two_level_solver(
        model, coarse, nx // 4, ny // 4, 4,
        cg_dtype=jnp.float32, refine_iters=1, tol=3e-3, maxiter=400,
        use_stencil=True, coarse_f32_precision=jax.lax.Precision.DEFAULT,
        refine_residual="split_f32",
    )
    fh_sp = jax.jit(jax.vmap(make_fh_fun(model, solve_free=solve_sp)))
    ysp, _ = fh_sp(thetas)
    jax.block_until_ready(ysp)
    t0 = time.perf_counter()
    ysp, _ = fh_sp(thetas)
    jax.block_until_ready(ysp)
    dt_sp = time.perf_counter() - t0
    sp_err = float(jnp.max(jnp.abs(ysp - yb)) / jnp.max(jnp.abs(yb)))
    print(
        json.dumps(
            {
                "metric": "scaled_fem_solves_per_sec_fullorder_splitres",
                "value": round(n_sam / dt_sp, 2),
                "unit": "solves/s",
                "mesh": f"{nx}x{ny}",
                "batch": n_sam,
                "rel_err_vs_f64_mode": sp_err,
            }
        )
    )

    # gradient (adjoint) path at the scaled config: value_and_grad of a
    # scalar functional through the batched two-level solve — the cost
    # shape of full-order VI training (forward + adjoint CG per sample)
    def scalar_obj(th):
        y, h = jax.vmap(make_fh_fun(model, solve_free=solve2l))(th)
        return jnp.sum(y**2) + jnp.sum(h**2)

    vg = jax.jit(jax.value_and_grad(scalar_obj))
    val, g = vg(thetas)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    val, g = vg(thetas)
    jax.block_until_ready(g)
    dt_g = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "scaled_grad_fh_per_sec_fullorder",
                "value": round(n_sam / dt_g, 2),
                "unit": "grad-samples/s",
                "mesh": f"{nx}x{ny}",
                "batch": n_sam,
                "grad_finite": bool(jnp.all(jnp.isfinite(g))),
            }
        )
    )

    # full-order TRAINING step at the scaled config (round-2 verdict item 1;
    # the end-to-end 20+20-epoch run lives in examples/train_scaled_fullorder
    # .py — results_scaled_fullorder/summary.json): one jitted step-1 ELBO
    # step, 64-batch x 4 samples = 256 full-order solves + adjoints
    import optax

    from vbicm_tpu.models.mlp import ThetaPosteriorNet
    from vbicm_tpu.vi.elbo import make_loss_step1

    fh_tr = make_fh_fun(model, solve_free=solve_sp)
    batch_f = lambda th: jax.vmap(fh_tr)(th)[0]
    key = jax.random.PRNGKey(0)
    e_data = jax.random.normal(key, (4, 2), jnp.float64)
    net = ThetaPosteriorNet()
    yb = jax.random.normal(jax.random.PRNGKey(1), (64, 2), jnp.float64)
    params = net.init(jax.random.PRNGKey(2), yb)
    loss_fn = make_loss_step1(batch_f, e_data, 0.1)
    opt = optax.adam(1e-3, b1=0.99, eps=1e-10)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, y_batch):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(y_batch, net.apply(p, y_batch))
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = train_step(params, opt_state, yb)
    jax.block_until_ready(loss)
    n_it = 5
    t0 = time.perf_counter()
    for _ in range(n_it):
        params, opt_state, loss = train_step(params, opt_state, yb)
    jax.block_until_ready(loss)
    dt_tr = (time.perf_counter() - t0) / n_it
    print(
        json.dumps(
            {
                "metric": "scaled_train_steps_per_sec_fullorder",
                "value": round(1.0 / dt_tr, 3),
                "unit": "steps/s",
                "mesh": f"{nx}x{ny}",
                "solves_per_step": 256,
                "loss_finite": bool(jnp.isfinite(loss)),
            }
        )
    )


def bench_3d():
    """3-D scaled config: 64x16x16 hex8 box beam (16,384 elements, 56,355
    dofs), batched two-level structured-grid solves — the 3-D extension
    beyond the reference (its element library is 2-D only). Config from the
    round-2 sweep: 16x4x4 coarse at ratio 4, f32 CG tol 3e-3, TWO f64
    refinements -> 3.3e-8 relative of the f64 solve at 38.8 solves/s
    (1 refinement: 62 solves/s at 1e-5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time, json

    from vbicm_tpu.mesh.solid3d import beam_hex8_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.solver import make_two_level_solver_box3d

    jax.config.update("jax_enable_x64", True)
    ncx, ncy, ncz, R, B = 16, 4, 4, 4, 64
    nx, ny, nz = ncx * R, ncy * R, ncz * R
    sec = SectionCard(stype=4)
    t0 = time.time()
    fine = build_fem_model(beam_hex8_mesh(nx, ny, nz, lx=4.0), sec, dense=False)
    build_s = time.time() - t0
    coarse = build_fem_model(beam_hex8_mesh(ncx, ncy, ncz, lx=4.0), sec, dense=True)
    s = make_two_level_solver_box3d(
        fine, coarse, (ncx, ncy, ncz), R,
        cg_dtype=jnp.float32, refine_iters=2, tol=3e-3, maxiter=1500,
        coarse_f32_precision=jax.lax.Precision.DEFAULT,
        refine_residual="compensated",
    )
    rng = np.random.default_rng(0)
    lams = jnp.asarray(rng.uniform(8, 16, B))
    mus = jnp.asarray(rng.uniform(5, 10, B))
    sv = jax.jit(jax.vmap(s))
    u = sv(lams, mus)
    jax.block_until_ready(u)
    t0 = time.perf_counter()
    u = sv(lams, mus)
    jax.block_until_ready(u)
    dt = time.perf_counter() - t0
    s64 = make_two_level_solver_box3d(
        fine, coarse, (ncx, ncy, ncz), R, tol=1e-11, maxiter=3000
    )
    u_ora = s64(lams[0], mus[0])
    err = float(jnp.max(jnp.abs(u[0] - u_ora)) / jnp.max(jnp.abs(u_ora)))
    from vbicm_tpu.utils.roofline import compiled_costs, mfu_fields

    fl3, by3 = compiled_costs(jax.vmap(s), lams, mus)
    print(
        json.dumps(
            {
                "metric": "scaled3d_fem_solves_per_sec_fullorder",
                "value": round(B / dt, 2),
                "unit": "solves/s",
                "mesh": f"hex8 {nx}x{ny}x{nz}",
                "ndof": fine.ndof,
                "batch": B,
                "rel_err_vs_f64": err,
                "model_build_s": round(build_s, 1),
                **mfu_fields(fl3, by3, 1.0 / dt),
            }
        )
    )


def bench_field():
    """Random-field (per-element coefficient) solver at 80x40: structured-grid
    gather/scatter, f32 CG + one f64 refinement, mean-field two-level
    preconditioner — forward and adjoint throughput over the sample batch
    (the hot path of the KL field-inversion family, no reference
    counterpart)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time, json

    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.ops.element import lame_from_Ev
    from vbicm_tpu.ops.solve import make_field_solver
    from vbicm_tpu.prob.randomfield import (
        build_kl_expansion,
        field_from_theta,
        make_mean_field_preconditioner,
    )
    from vbicm_tpu.utils.roofline import compiled_costs, mfu_fields

    jax.config.update("jax_enable_x64", True)
    nx, ny, ratio, n_modes = 80, 40, 4, 16
    t0 = time.time()
    model = build_fem_model(cooks_membrane_mesh(nx, ny), dense=False)
    coarse = build_fem_model(cooks_membrane_mesh(nx // ratio, ny // ratio), dense=True)
    kl = build_kl_expansion(model, n_modes=n_modes, corr_len=12.0, sigma=0.3)
    build_s = time.time() - t0
    lam1, mu1 = lame_from_Ev(1.0, 0.3)
    ke_unit = lam1 * jnp.asarray(model.ke_lam) + mu1 * jnp.asarray(model.ke_mu)
    prec = make_mean_field_preconditioner(
        coarse, nx // ratio, ny // ratio, ratio, model.free_mask,
        nu=0.3, E0=float(np.exp(kl.mean_log)),
    )
    solve = make_field_solver(
        ke_unit, np.asarray(model.lm), model.free_mask, model.ndof,
        cg_dtype=jnp.float32, refine_iters=1, tol=3e-3,
        preconditioner=prec, grid=(nx, ny),
    )
    b = jnp.asarray(model.f_ext)
    rng = np.random.default_rng(0)

    for B in (32, 256):
        thetas = jnp.asarray(rng.normal(size=(B, n_modes)))
        Es = jax.vmap(lambda t: field_from_theta(kl, t))(thetas)
        fwd = jax.jit(jax.vmap(lambda E: solve(E, b)))
        u = fwd(Es)
        jax.block_until_ready(u)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            u = fwd(Es)
        jax.block_until_ready(u)
        dt = (time.perf_counter() - t0) / iters
        fl, by = compiled_costs(jax.vmap(lambda E: solve(E, b)), Es)
        print(json.dumps({
            "metric": "scaled_field_solves_per_sec",
            "value": round(B / dt, 1),
            "unit": "solves/s",
            "mesh": f"{nx}x{ny}",
            "kl_modes": n_modes,
            "batch": B,
            "model_build_s": round(build_s, 1),
            **mfu_fields(fl, by, 1.0 / dt),
        }))

    B = 256
    thetas = jnp.asarray(rng.normal(size=(B, n_modes)))

    def obj(th):
        u = solve(field_from_theta(kl, th), b)
        return jnp.sum(u**2)

    gradv = jax.jit(jax.vmap(jax.grad(obj)))
    g = gradv(thetas)
    jax.block_until_ready(g)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        g = gradv(thetas)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "scaled_field_grad_samples_per_sec",
        "value": round(B / dt, 1),
        "unit": "grad-samples/s",
        "mesh": f"{nx}x{ny}",
        "kl_modes": n_modes,
        "batch": B,
    }))


def serving_metric():
    """Amortized-inference serving throughput: y -> (posterior, predictive)
    net evaluation, the deployment-time query path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time, json

    from vbicm_tpu.models.mlp import init_vi_networks

    theta_net, tp, z_net, zp = init_vi_networks(jax.random.PRNGKey(0))

    @jax.jit
    def predict(y):
        tm, tsg, _ = theta_net.apply(tp, y)
        zm, zs, _ = z_net.apply(zp, y)
        return tm, tsg, zm, zs

    B = 65536
    y = jnp.asarray(np.random.default_rng(0).normal(size=(B, 2)))
    out = predict(y)
    jax.block_until_ready(out)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        out = predict(y)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": "serving_queries_per_sec",
        "value": round(B / dt, 0),
        "unit": "queries/s",
        "batch": B,
    }))



def bench_plasticity():
    """Path-dependent throughput: J2 elastoplastic load HISTORIES per second
    (Cook's 20x10, 5 increments each, vmapped material batch B=64), forward
    and through the per-step discrete adjoints (grad)."""
    import time, json

    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.ops.plasticity import J2Material, make_plasticity_solver
    from vbicm_tpu.solver import material_coeffs

    jax.config.update("jax_enable_x64", True)
    model = build_fem_model(cooks_membrane_mesh(20, 10), dense=True)
    lam, mu = material_coeffs(2, 20.0, 0.3)
    n_steps, B = 5, 64
    solve = make_plasticity_solver(model, n_steps=n_steps, cg_tol=1e-10)

    def final_u(sig_y):
        u, _ = solve(J2Material(lam=jnp.asarray(lam), mu=jnp.asarray(mu),
                                sig_y=sig_y, H_iso=jnp.asarray(2.0)))
        return u

    sig_ys = jnp.asarray(np.random.default_rng(0).uniform(0.12, 0.3, B))
    fwd = jax.jit(jax.vmap(final_u))
    jax.block_until_ready(fwd(sig_ys))
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(sig_ys)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": "plasticity_histories_per_sec_fwd",
        "value": round(B / dt, 1),
        "unit": "histories/s",
        "batch": B, "n_steps": n_steps,
    }))

    grad_fn = jax.jit(jax.vmap(jax.grad(lambda s: jnp.sum(final_u(s) ** 2))))
    jax.block_until_ready(grad_fn(sig_ys))
    t0 = time.perf_counter()
    for _ in range(n):
        g = grad_fn(sig_ys)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": "plasticity_histories_per_sec_grad",
        "value": round(B / dt, 1),
        "unit": "histories/s",
        "batch": B, "n_steps": n_steps,
    }))


if __name__ == "__main__":
    main()
    bench_3d()
    bench_field()
    serving_metric()
    bench_plasticity()
