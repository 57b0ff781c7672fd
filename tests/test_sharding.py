"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates the multi-chip design without TPU hardware: sample-axis-sharded
FEM batches and fully sharded training steps must agree with the
single-device path (SURVEY §4(e)).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import ProblemConfig, TrainConfig
from vbicm_tpu.parallel import get_mesh, make_sharded_batch_fh, shard_batch
from vbicm_tpu.prob.datagen import generate_data_fem
from vbicm_tpu.solver import make_fh_fun
from vbicm_tpu.vi.train import TwoStepTrainer


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 fake CPU devices"
    return get_mesh(8)


def test_sharded_batch_fh_matches_single(cooks_model, mesh):
    fh = make_fh_fun(cooks_model)
    thetas = jnp.asarray(np.random.default_rng(0).normal(size=(64, 2)))
    y_ref, h_ref = jax.jit(jax.vmap(fh))(thetas)

    sharded = make_sharded_batch_fh(fh, mesh)
    th_sharded = shard_batch(thetas, mesh)
    y_s, h_s = sharded(th_sharded)
    # each device solved its own shard of K(theta) systems
    assert len(y_s.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_ref), atol=1e-12)


@pytest.mark.slow
def test_sharded_training_step_matches_single(cooks_model, mesh):
    """One epoch of step-1 training, sharded vs unsharded, same key."""
    fh = make_fh_fun(cooks_model)
    ds = generate_data_fem(
        jax.random.PRNGKey(0), jax.jit(jax.vmap(fh)), n_sam=64, ne_sam=4
    )
    tcfg = TrainConfig(batch_size=32, num_epoch1=2)
    key = jax.random.PRNGKey(42)

    t_single = TwoStepTrainer(cooks_model, ProblemConfig(), tcfg)
    p1, h1 = t_single.train_step1(ds.y_data, ds.e_data, key, num_epochs=2)

    t_sharded = TwoStepTrainer(cooks_model, ProblemConfig(), tcfg, mesh=mesh)
    p2, h2 = t_sharded.train_step1(ds.y_data, ds.e_data, key, num_epochs=2)

    np.testing.assert_allclose(h1, h2, rtol=1e-8)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_matrix_free_solver_under_mesh(cooks_mesh, mesh):
    """Element-operator CG path works with a sharded sample axis too."""
    from vbicm_tpu.model import build_fem_model

    mf_model = build_fem_model(cooks_mesh, dense=False)
    fh = make_fh_fun(mf_model)
    thetas = jnp.asarray(np.random.default_rng(1).normal(size=(16, 2)))
    y_ref, _ = jax.jit(jax.vmap(fh))(thetas)
    sharded = make_sharded_batch_fh(fh, mesh)
    y_s, _ = sharded(shard_batch(thetas, mesh))
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_ref), atol=1e-8)


@pytest.mark.slow
def test_element_sharded_solver(cooks_mesh, mesh):
    """Domain-decomposed CG: element shards + psum == dense solve; grads too."""
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.ops.element import lame_from_Ev
    from vbicm_tpu.parallel.solve_sharded import make_element_sharded_solver
    from vbicm_tpu.solver import make_solver

    model = build_fem_model(cooks_mesh)  # dense parts available for oracle
    sharded = make_element_sharded_solver(model, mesh, tol=1e-13)
    lam, mu = lame_from_Ev(20.0, 0.3)
    c = jnp.array([lam, mu])
    f = np.asarray(model.f_ext)
    u_sharded = sharded(c, jnp.asarray(f))
    u_dense = make_solver(model)(c[0], c[1])
    np.testing.assert_allclose(np.asarray(u_sharded), np.asarray(u_dense), atol=1e-8)

    # gradient through the sharded solve
    def loss(cc):
        return jnp.sum(sharded(cc, jnp.asarray(f))[-2:])

    g = jax.grad(loss)(c)
    eps = 1e-5
    for i in range(2):
        fd = (loss(c.at[i].add(eps)) - loss(c.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4)


@pytest.mark.slow
def test_two_level_solver_accuracy_and_grad(cooks_mesh):
    """Two-level (spectral-coarse) preconditioned CG on a refined mesh:
    matches the dense answer; gradient matches FD. (Small 40x20 fine mesh
    with 20x10 coarse so the test stays fast.)"""
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.ops.element import lame_from_Ev
    from vbicm_tpu.solver import make_solver, make_two_level_solver

    fine = build_fem_model(cooks_membrane_mesh(40, 20), dense=True)
    fine_mf = build_fem_model(cooks_membrane_mesh(40, 20), dense=False)
    coarse = build_fem_model(cooks_membrane_mesh(20, 10), dense=True)
    solve2l = make_two_level_solver(fine_mf, coarse, 20, 10, 2, tol=1e-12, maxiter=300)
    lam, mu = lame_from_Ev(20.0, 0.3)
    u2 = solve2l(jnp.asarray(lam), jnp.asarray(mu))
    u_ref = make_solver(fine)(jnp.asarray(lam), jnp.asarray(mu))
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u_ref), atol=1e-8)

    def loss(c):
        return jnp.sum(solve2l(c[0], c[1])[-2:])

    c0 = jnp.array([lam, mu])
    g = jax.grad(loss)(c0)
    eps = 1e-5
    for i in range(2):
        fd = (loss(c0.at[i].add(eps)) - loss(c0.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4)


def test_two_level_mixed_precision(cooks_mesh):
    """f32 CG + two-level + refinement reaches f64 accuracy in few outers."""
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.ops.element import lame_from_Ev
    from vbicm_tpu.solver import make_solver, make_two_level_solver

    fine_mf = build_fem_model(cooks_membrane_mesh(40, 20), dense=False)
    fine = build_fem_model(cooks_membrane_mesh(40, 20), dense=True)
    coarse = build_fem_model(cooks_membrane_mesh(20, 10), dense=True)
    solve2l = make_two_level_solver(
        fine_mf, coarse, 20, 10, 2,
        cg_dtype=jnp.float32, refine_iters=3, tol=1e-4, maxiter=200,
    )
    lam, mu = lame_from_Ev(20.0, 0.3)
    u2 = solve2l(jnp.asarray(lam), jnp.asarray(mu))
    u_ref = make_solver(fine)(jnp.asarray(lam), jnp.asarray(mu))
    rel = np.linalg.norm(np.asarray(u2 - u_ref)) / np.linalg.norm(np.asarray(u_ref))
    assert rel < 1e-8, rel


def test_2d_mesh_sample_by_element_sharding(cooks_mesh):
    """Combined DP x DD on a (2, 4) mesh: samples over 'data', elements over
    'dd', collectives compiler-inserted (parallel.mesh.make_2d_sharded_solver)
    — exact vs the unsharded matrix-free solver."""
    import numpy as np
    from jax.sharding import Mesh

    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.ops.element import lame_from_Ev
    from vbicm_tpu.ops.solve import make_matfree_affine_solver
    from vbicm_tpu.parallel.mesh import make_2d_sharded_solver

    model = build_fem_model(cooks_mesh, dense=False)
    mesh2d = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "dd"))
    solve_batch = make_2d_sharded_solver(model, mesh2d, tol=1e-12, maxiter=3000)

    B = 4
    rng = np.random.default_rng(0)
    E = 20.0 * np.exp(0.1 * rng.standard_normal(B))
    v = 0.3 + 0.01 * rng.standard_normal(B)
    lam, mu = np.asarray(lame_from_Ev(jnp.asarray(E), jnp.asarray(v)))
    cs = jnp.stack([jnp.asarray(lam), jnp.asarray(mu)], axis=1)

    us = np.asarray(solve_batch(cs))

    base = make_matfree_affine_solver(
        jnp.stack([model.ke_lam, model.ke_mu]), model.lm, model.free_mask,
        model.ndof, tol=1e-12, maxiter=3000,
    )
    f_masked = model.f_ext * model.free_mask
    ref = np.stack([np.asarray(base(cs[i], f_masked)) for i in range(B)])
    np.testing.assert_allclose(us, ref, rtol=1e-10, atol=1e-13)


@pytest.mark.slow
def test_training_step_with_dd_sharded_inner_solve(cooks_mesh):
    """Round-2 verdict item 4: a step-1 TRAINING step whose inner FEM solve
    is element-sharded on a hybrid (data x dd) mesh — the custom-VJP CG
    composed through value_and_grad + Adam — matches the dense-path
    training step loss-for-loss and parameter-for-parameter."""
    from jax.sharding import Mesh

    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.parallel.mesh import make_dd_solve_free

    model = build_fem_model(cooks_mesh, dense=False)
    mesh2d = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "dd"))
    cfg = ProblemConfig()
    fh_dd = make_fh_fun(model, cfg,
                        solve_free=make_dd_solve_free(model, mesh2d, tol=1e-12))

    dense_model = build_fem_model(cooks_mesh, dense=True)
    fh_dense = make_fh_fun(dense_model, cfg)
    ds = generate_data_fem(
        jax.random.PRNGKey(3), jax.jit(jax.vmap(fh_dense)), n_sam=32, ne_sam=4
    )
    tcfg = TrainConfig(batch_size=16, num_epoch1=2, scan_epochs=False)
    key = jax.random.PRNGKey(21)

    t_dense = TwoStepTrainer(dense_model, cfg, tcfg)
    p_ref, h_ref = t_dense.train_step1(ds.y_data, ds.e_data, key, num_epochs=2)

    t_dd = TwoStepTrainer(None, cfg, tcfg, fh=fh_dd, mesh=mesh2d)
    p_dd, h_dd = t_dd.train_step1(ds.y_data, ds.e_data, key, num_epochs=2)

    np.testing.assert_allclose(h_dd, h_ref, rtol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(p_dd), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)
