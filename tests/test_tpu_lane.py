"""Purpose-built on-chip lane tests (``VBICM_TEST_PLATFORM=tpu -m tpu_lane``).

Small, fast equivalents of the heavy CPU end-to-end tests, targeting
exactly the TPU-only numerics classes catalogued in docs/KNOWN_ISSUES.md
(bf16 batched contractions, Pallas stencil under vmap, converged-lane CG,
f32-factor + refinement) — shapes kept tiny so compile, not compute,
bounds the lane. They also run in the CPU suite as ordinary tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import ProblemConfig
from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.solver import make_fh_fun, make_two_level_solver


@pytest.mark.tpu_lane
@pytest.mark.slow
def test_lane_batched_two_level_vs_persample():
    """Vmapped two-level stencil CG (Pallas f32 hot loop on TPU, one f64
    refinement) at B=4 with a conditioning spread, against the per-sample
    calls of the SAME solver — the converged-lane / batched-contraction
    trap class."""
    nx, ny, ratio = 40, 20, 4
    model = build_fem_model(cooks_membrane_mesh(nx, ny), dense=False)
    coarse = build_fem_model(cooks_membrane_mesh(nx // ratio, ny // ratio),
                             dense=True)
    solve = make_two_level_solver(
        model, coarse, nx // ratio, ny // ratio, ratio,
        cg_dtype=jnp.float32, refine_iters=1, tol=3e-3, maxiter=400,
        use_stencil=True, coarse_f32_precision=jax.lax.Precision.DEFAULT,
        refine_residual="compensated",
    )
    lams = jnp.asarray([8.0, 11.54, 15.0, 30.0])
    mus = jnp.asarray([5.0, 7.69, 9.0, 3.0])
    ub = np.asarray(jax.jit(jax.vmap(solve))(lams, mus))
    for i in range(4):
        ui = np.asarray(solve(lams[i], mus[i]))
        # identical algorithm; vmapped lanes may take the batch-consensus
        # iteration count, so agreement is at the refinement tolerance
        np.testing.assert_allclose(ub[i], ui, atol=1e-6 * np.abs(ui).max())


@pytest.mark.tpu_lane
def test_lane_train_step1_decreases():
    """Three jitted step-1 ELBO training steps on the reference mesh
    (B=8, ne=2) — finite and decreasing on the production f32-factor path."""
    import optax

    from vbicm_tpu.models.mlp import ThetaPosteriorNet
    from vbicm_tpu.vi.elbo import make_loss_step1

    model = build_fem_model(cooks_membrane_mesh(20, 10))
    fh = make_fh_fun(model, ProblemConfig(), factor_dtype=jnp.float32,
                     refine_iters=1)
    batch_f = lambda th: jax.vmap(fh)(th)[0]
    e_data = jax.random.normal(jax.random.PRNGKey(0), (2, 2), jnp.float64)
    net = ThetaPosteriorNet()
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 2), jnp.float64)
    params = net.init(jax.random.PRNGKey(2), y)
    loss_fn = make_loss_step1(batch_f, e_data, 0.1)
    opt = optax.adam(1e-2, b1=0.99, eps=1e-10)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, g = jax.value_and_grad(
            lambda p: loss_fn(y, net.apply(p, y)))(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(4):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.tpu_lane
@pytest.mark.slow
def test_lane_plasticity_history_vmap():
    """One vmapped J2 load history (B=2, 2 increments, tiny mesh) against
    the per-sample solve — the lax.scan-of-Newton path on-chip."""
    from vbicm_tpu.ops.plasticity import J2Material, make_plasticity_solver
    from vbicm_tpu.solver import material_coeffs

    model = build_fem_model(cooks_membrane_mesh(8, 4), dense=True)
    lam, mu = material_coeffs(2, 20.0, 0.3)
    solve = make_plasticity_solver(model, n_steps=2, cg_tol=1e-10)

    def final_u(sig_y):
        u, _ = solve(J2Material(lam=jnp.asarray(lam), mu=jnp.asarray(mu),
                                sig_y=sig_y, H_iso=jnp.asarray(2.0)))
        return u

    sig_ys = jnp.asarray([0.15, 0.25])
    ub = np.asarray(jax.jit(jax.vmap(final_u))(sig_ys))
    for i in range(2):
        ui = np.asarray(final_u(sig_ys[i]))
        np.testing.assert_allclose(ub[i], ui, atol=1e-8 * np.abs(ui).max())
