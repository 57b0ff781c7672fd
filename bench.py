"""Benchmark: ELBO training throughput on the reference workload.

Headline metric (BASELINE configs[4], the hardware-meaningful number): the
full jitted step-1 VI training step on the SCALED 160x80 mesh (26k dofs) at
batch 64 x ne_sam 4 = 256 two-level stencil solves per step — nets forward,
ELBO, gradients through the adjoint solve, Adam update. vs_baseline is
measured against the round-3 full-order training rate (3.644 steps/s,
``results_scaled_fullorder/summary.json``) — the reference publishes no
scaled numbers (BASELINE.md).

The reference-workload parity anchor (north star: >=50 steps/s at 64
posterior samples on Cook's 20x10) stays as ``elbo_steps_per_sec_b64`` —
per its own roofline fields it measures dispatch latency, not hardware.

Run on the default backend (TPU via axon). Uses the production fast path:
float32 Cholesky factorization + float64-grade iterative refinement.
Off-TPU the scaled sections are skipped and the parity anchor is the
headline.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

# Persistent compilation cache: compiles through the axon remote-compile
# relay run 30-300s; warming the cache once makes subsequent bench runs
# (e.g. the driver's end-of-round invocation) start in seconds.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main():
    from vbicm_tpu.config import ProblemConfig
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.models.mlp import ThetaPosteriorNet
    from vbicm_tpu.solver import make_fh_fun
    from vbicm_tpu.vi.elbo import make_loss_step1

    jax.config.update("jax_enable_x64", True)
    on_tpu = jax.default_backend() == "tpu"

    batch_size, ne_sam = 64, 4
    dtype = jnp.float64
    model = build_fem_model(cooks_membrane_mesh(20, 10), dtype=dtype)
    cfg = ProblemConfig()
    fh = make_fh_fun(model, cfg, factor_dtype=jnp.float32, refine_iters=1)
    batch_f = lambda th: jax.vmap(fh)(th)[0]

    key = jax.random.PRNGKey(0)
    e_data = jax.random.normal(key, (ne_sam, 2), dtype)
    net = ThetaPosteriorNet(dtype=dtype)
    y = jax.random.normal(jax.random.PRNGKey(1), (batch_size, 2), dtype)
    params = net.init(jax.random.PRNGKey(2), y)
    loss_fn = make_loss_step1(batch_f, e_data, cfg.sig_e)

    opt = optax.adam(1e-3, b1=0.99, eps=1e-10)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, y_batch):
        def objective(p):
            return loss_fn(y_batch, net.apply(p, y_batch))

        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # Production path: one lax.scan dispatch per epoch (vi.train
    # scan_epochs mode) — the B=64 step is dispatch-bound per-step.
    nb = 156  # one 10k-point epoch
    ys = jax.random.normal(jax.random.PRNGKey(3), (nb, batch_size, 2), dtype)

    @jax.jit
    def epoch_scan(params, opt_state, ys):
        def body(carry, yb):
            p, o = carry
            p, o, loss = train_step(p, o, yb)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), ys)
        return params, opt_state, losses[-1]

    params, opt_state, loss = epoch_scan(params, opt_state, ys)
    jax.block_until_ready(loss)

    n_iter = 4 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(n_iter):
        params, opt_state, loss = epoch_scan(params, opt_state, ys)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / (n_iter * nb)
    steps_per_sec = 1.0 / dt

    # roofline accounting: XLA's own FLOP/byte counts for the compiled
    # training step -> achieved TFLOP/s and fraction of chip peak
    from vbicm_tpu.utils.roofline import compiled_costs, mfu_fields

    flops_ep, bytes_ep = compiled_costs(epoch_scan, params, opt_state, ys)
    mfu = mfu_fields(flops_ep and flops_ep / nb, bytes_ep and bytes_ep / nb,
                     steps_per_sec)

    out = {
        "metric": "elbo_steps_per_sec_b64",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / 50.0, 3),
        "elbo_steps_per_sec_b64": round(steps_per_sec, 3),
        "elbo_vs_north_star": round(steps_per_sec / 50.0, 3),
        **mfu,
    }

    # --- scaled hardware-meaningful metrics (round-3 verdict item 3 /
    # round-4 item 8): the B=64 parity anchor measures dispatch latency on
    # a 462-dof mesh (MFU 7e-5 by its own fields); these sections put the
    # machine numbers — the scaled 26k-dof FULL TRAINING STEP (promoted to
    # the headline), the scaled stencil two-level solve path, the raw
    # stencil-matvec bandwidth fraction, and the 3-D 56k-dof solve — into
    # the SAME driver-parsed JSON line. Each section is fail-soft so a
    # headline always prints.
    if on_tpu:
        try:
            out.update(_scaled_2d_fields())
            if "scaled2d_train_steps_per_sec" in out:
                out["metric"] = "scaled2d_train_steps_per_sec"
                out["value"] = out["scaled2d_train_steps_per_sec"]
                out["unit"] = "steps/s"
                # no published reference number at this scale; baseline is
                # the round-3 measured full-order training rate
                out["vs_baseline"] = round(
                    out["scaled2d_train_steps_per_sec"] / 3.644, 3)
                out["baseline_note"] = (
                    "vs r3 full-order 160x80 training rate 3.644 steps/s "
                    "(results_scaled_fullorder); BASELINE configs[4] has "
                    "no published number")
        except Exception as exc:  # pragma: no cover - bench resilience
            out["scaled2d_error"] = repr(exc)[:200]
        try:
            out.update(_scaled_3d_fields())
        except Exception as exc:  # pragma: no cover - bench resilience
            out["scaled3d_error"] = repr(exc)[:200]
    # on-chip test-lane record (round-4 verdict item 4): written by
    # `VBICM_TEST_PLATFORM=tpu pytest -m tpu_lane` via tests/conftest.py
    try:
        lane_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "results_tpu_lane", "summary.json")
        if os.path.exists(lane_path):
            with open(lane_path) as f:
                lane = json.load(f)
            out["tpu_lane_passed"] = lane.get("passed")
            out["tpu_lane_tests"] = lane.get("tests")
            out["tpu_lane_wall_s"] = lane.get("wall_s")
            out["tpu_lane_date"] = lane.get("date")
    except Exception as exc:  # pragma: no cover - bench resilience
        out["tpu_lane_error"] = repr(exc)[:200]

    print(json.dumps(out))


def _scaled_2d_fields():
    """160x80 (26k-dof) scaled metrics (BASELINE configs[4]): the FULL
    jitted VI training step (B=64 x ne_sam 4 = 256 two-level stencil solves
    + adjoint gradients + Adam — the round's headline), the B=256 batched
    two-level solve rate, and the raw Pallas row-stencil matvec measured
    against its algorithmic HBM-bandwidth bound. All with XLA roofline
    fields."""
    import dataclasses

    import optax

    from vbicm_tpu.config import ProblemConfig
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.models.mlp import ThetaPosteriorNet
    from vbicm_tpu.ops.stencil import make_stencil_affine_matvec
    from vbicm_tpu.solver import make_fh_fun, make_two_level_solver
    from vbicm_tpu.utils.roofline import compiled_costs, device_peaks, mfu_fields
    from vbicm_tpu.vi.elbo import make_loss_step1

    nx, ny, B = 160, 80, 256
    model = build_fem_model(cooks_membrane_mesh(nx, ny), dense=False)
    coarse = build_fem_model(cooks_membrane_mesh(nx // 4, ny // 4), dense=True)
    solve2l = make_two_level_solver(
        model, coarse, nx // 4, ny // 4, 4,
        cg_dtype=jnp.float32, refine_iters=1, tol=3e-3, maxiter=400,
        use_stencil=True, coarse_f32_precision=jax.lax.Precision.DEFAULT,
        refine_residual="compensated",
    )
    fh = make_fh_fun(model, solve_free=solve2l)
    fh_b = jax.jit(jax.vmap(fh))
    thetas = jnp.asarray(np.random.default_rng(0).normal(size=(B, 2)))
    y, _ = fh_b(thetas)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y, _ = fh_b(thetas)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0
    fl, by = compiled_costs(jax.vmap(fh), thetas)
    fields = {
        "scaled2d_solves_per_sec": round(B / dt, 1),
        "scaled2d_mesh": f"{nx}x{ny}",
        "scaled2d_ndof": model.ndof,
        "scaled2d_batch": B,
    }
    fields.update({f"scaled2d_{k}": v
                   for k, v in mfu_fields(fl, by, 1.0 / dt).items()})

    # --- full VI training step at this scale (the headline): identical
    # per-step work to the scaled runs (examples/train_scaled_vi.py /
    # arbitrate_scaled_posterior.py step 1) — batch 64 x ne_sam 4 = 256
    # reparameterized two-level solves, ELBO, adjoint grads, Adam.
    cfg = dataclasses.replace(
        ProblemConfig(), node_id=model.nnodes, ele_id=(ny // 2) * nx + 12)
    fh_t = make_fh_fun(model, cfg, solve_free=solve2l)
    batch_f = lambda th: jax.vmap(fh_t)(th)[0]
    bsz, ne_sam = 64, 4
    e_data = jax.random.normal(jax.random.PRNGKey(0), (ne_sam, 2),
                               jnp.float64)
    net = ThetaPosteriorNet(dtype=jnp.float64)
    yb = jax.random.normal(jax.random.PRNGKey(1), (bsz, 2), jnp.float64)
    params = net.init(jax.random.PRNGKey(2), yb)
    loss_fn = make_loss_step1(batch_f, e_data, cfg.sig_e)
    opt = optax.adam(1e-3, b1=0.99, eps=1e-10)
    opt_state = opt.init(params)

    def train_step(params, opt_state, y_batch):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(y_batch, net.apply(p, y_batch)))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    tstep = jax.jit(train_step)
    params2, opt2, loss = tstep(params, opt_state, yb)
    jax.block_until_ready(loss)
    n_it = 12
    t0 = time.perf_counter()
    p, o = params2, opt2
    for _ in range(n_it):
        p, o, loss = tstep(p, o, yb)
    jax.block_until_ready(loss)
    dt_t = (time.perf_counter() - t0) / n_it
    fl_t, by_t = compiled_costs(train_step, params, opt_state, yb)
    fields["scaled2d_train_steps_per_sec"] = round(1.0 / dt_t, 3)
    fields["scaled2d_train_batch"] = bsz
    fields["scaled2d_train_ne_sam"] = ne_sam
    fields.update({f"scaled2d_train_{k}": v
                   for k, v in mfu_fields(fl_t, by_t, 1.0 / dt_t).items()})

    # raw stencil matvec vs its bandwidth bound. Algorithmic minimum HBM
    # traffic per batched application: read u (B*ndof f32) + write out +
    # read the 9-offset block tables once (shared across the batch; VMEM-
    # resident rows inside the kernel). Speed-of-light time = bytes / peak.
    affine, _, _ = make_stencil_affine_matvec(model, nx, ny)
    c32 = jnp.asarray(np.random.default_rng(1).uniform(1, 2, (B, 2)), jnp.float32)
    u32 = jnp.asarray(np.random.default_rng(2).normal(size=(B, model.ndof)),
                      jnp.float32)
    mv = jax.jit(jax.vmap(affine))
    q = mv(c32, u32)
    jax.block_until_ready(q)
    n_it = 20
    t0 = time.perf_counter()
    for _ in range(n_it):
        q = mv(c32, u32)
    jax.block_until_ready(q)
    dt_mv = (time.perf_counter() - t0) / n_it
    NY, NX = ny + 1, nx + 1
    min_bytes = 4.0 * (2 * B * model.ndof + 2 * NY * NX * 36)
    _, peak_hbm = device_peaks()
    achieved_gbs = min_bytes / dt_mv / 1e9
    fields.update({
        "stencil_matvec_ms": round(dt_mv * 1e3, 3),
        "stencil_matvec_min_bytes": min_bytes,
        "stencil_matvec_gbs": round(achieved_gbs, 1),
        "stencil_bw_fraction": round(achieved_gbs / peak_hbm, 4),
    })
    return fields


def _scaled_3d_fields():
    """3-D 64x16x16 hex8 (56k dofs) B=64 batched box two-level solves/s
    with roofline fields — beyond the reference (2-D only)."""
    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.mesh.solid3d import beam_hex8_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.solver import make_two_level_solver_box3d
    from vbicm_tpu.utils.roofline import compiled_costs, mfu_fields

    ncx, ncy, ncz, R, B = 16, 4, 4, 4, 64
    sec = SectionCard(stype=4)
    fine = build_fem_model(
        beam_hex8_mesh(ncx * R, ncy * R, ncz * R, lx=4.0), sec, dense=False)
    coarse = build_fem_model(beam_hex8_mesh(ncx, ncy, ncz, lx=4.0), sec,
                             dense=True)
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
    fl, by = compiled_costs(jax.vmap(s), lams, mus)
    fields = {
        "scaled3d_solves_per_sec": round(B / dt, 2),
        "scaled3d_ndof": fine.ndof,
        "scaled3d_batch": B,
    }
    fields.update({f"scaled3d_{k}": v
                   for k, v in mfu_fields(fl, by, 1.0 / dt).items()})
    return fields


if __name__ == "__main__":
    main()
