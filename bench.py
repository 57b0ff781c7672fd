"""Benchmark: ELBO training throughput on the reference workload.

Metric (BASELINE.json north star): ELBO steps/sec at 64 posterior-sample
batch on one TPU chip — one "step" = the full jitted step-1 training step
(nets forward, 64x4 = 256 reparameterized FEM assembles+solves, ELBO,
gradients through the adjoint solve, Adam update), exactly the per-step work
of ``main_custom_training.py``'s ``train_step``.

vs_baseline is measured against the 50 steps/sec north-star target (the
reference publishes no numbers; see BASELINE.md).

Run on the default backend (TPU via axon). Uses the production fast path:
float32 Cholesky factorization + float64-grade iterative refinement.
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

    print(
        json.dumps(
            {
                "metric": "elbo_steps_per_sec_b64",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / 50.0, 3),
                **mfu,
            }
        )
    )


if __name__ == "__main__":
    main()
