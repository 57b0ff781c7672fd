"""Random-field (KL log-modulus) inversion: per-element-coefficient solver,
KL expansion, observation operator, and amortized VI in theta-dim > 2.

No counterpart in the reference (homogeneous two-scalar material); this is
the parameter-dimension scaling axis of the framework.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import MaterialCard, ProblemConfig, TrainConfig
from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.element import lame_from_Ev
from vbicm_tpu.ops.solve import make_field_solver
from vbicm_tpu.prob.datagen import generate_data_fem
from vbicm_tpu.prob.randomfield import (
    build_kl_expansion,
    element_centroids,
    field_from_theta,
    make_fh_fun_field,
)
from vbicm_tpu.solver import fea_solution
from vbicm_tpu.vi.train import TwoStepTrainer

NU = 0.3
N_MODES = 6


@pytest.fixture(scope="module")
def small_model():
    return build_fem_model(cooks_membrane_mesh(10, 5), dense=True)


@pytest.fixture(scope="module")
def kl(small_model):
    return build_kl_expansion(small_model, n_modes=N_MODES, corr_len=15.0, sigma=0.3)


# 10 displacement probes spread over the mesh: 6 KL modes are exactly
# identifiable (3 probes are NOT — the MAP then finds a different
# min-norm field; verified while calibrating this test)
PROBES = tuple(range(8, 67, 6))
CFG = ProblemConfig(theta_dim=N_MODES, y_dim=2 * len(PROBES), ele_id=5)


def test_kl_modes_orthonormal_and_sorted(small_model, kl):
    """phi_k orthonormal under the uniform element weight; eigenvalues
    sorted descending; modes carry sqrt(lambda)."""
    assert kl.modes.shape == (N_MODES, small_model.nele)
    w = 1.0 / small_model.nele
    phi = kl.modes / np.sqrt(kl.eigvals)[:, None]
    gram = (phi * w) @ phi.T
    np.testing.assert_allclose(gram, np.eye(N_MODES), atol=1e-10)
    assert np.all(np.diff(kl.eigvals) <= 0)
    assert np.all(kl.eigvals > 0)


def test_field_solver_constant_field_matches_homogeneous(small_model):
    lam1, mu1 = lame_from_Ev(1.0, NU)
    ke_unit = lam1 * jnp.asarray(small_model.ke_lam) + mu1 * jnp.asarray(
        small_model.ke_mu
    )
    solve = make_field_solver(
        ke_unit, np.asarray(small_model.lm), small_model.free_mask,
        small_model.ndof,
    )
    u = solve(jnp.full((small_model.nele,), 20.0), small_model.f_ext)
    u_hom = fea_solution(small_model, MaterialCard(E=20.0, v=NU)).u
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_hom), atol=1e-10)


def test_field_fh_gradients_vs_fd(small_model, kl):
    fh = make_fh_fun_field(small_model, kl, CFG, probe_nodes=PROBES)

    def loss(t):
        y, h = fh(t)
        return jnp.sum(y**2) + jnp.sum(h)

    t0 = jnp.asarray(np.random.default_rng(0).standard_normal(N_MODES) * 0.5)
    g = np.asarray(jax.grad(loss)(t0))
    t0n = np.asarray(t0)
    eps = 1e-6
    fd = np.zeros(N_MODES)
    for i in range(N_MODES):
        tp, tm = t0n.copy(), t0n.copy()
        tp[i] += eps
        tm[i] -= eps
        fd[i] = (float(loss(jnp.asarray(tp))) - float(loss(jnp.asarray(tm)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-5, atol=1e-6)


def test_field_map_inversion_recovers_truth(small_model, kl):
    """Deterministic inversion sanity: gradient descent on the (noise-free)
    data misfit + prior recovers the generating KL coefficients — the
    observation layout is actually informative about the field."""
    fh = make_fh_fun_field(small_model, kl, CFG, probe_nodes=PROBES)
    t_true = jnp.asarray([0.8, -0.5, 0.3, 0.0, 0.0, 0.0])
    y_obs, _ = fh(t_true)

    def neglogpost(t):
        y, _ = fh(t)
        return 0.5 * jnp.sum((y - y_obs) ** 2) / 1e-6 + 0.5 * jnp.sum(t**2)

    import optax

    opt = optax.adam(0.1)
    t = jnp.zeros(N_MODES)
    state = opt.init(t)
    val_grad = jax.jit(jax.value_and_grad(neglogpost))
    for _ in range(400):
        v, g = val_grad(t)
        upd, state = opt.update(g, state)
        t = optax.apply_updates(t, upd)
    # leading (data-informed) modes recovered; trailing shrink to prior
    err = np.asarray(t - t_true)
    assert np.abs(err).max() < 0.02, (t, t_true)
    # the recovered FIELD matches everywhere data constrains it
    E_t = np.asarray(field_from_theta(kl, t))
    E_true = np.asarray(field_from_theta(kl, t_true))
    assert np.abs(np.log(E_t) - np.log(E_true)).mean() < 1e-3


@pytest.mark.slow
def test_vi_through_field_model_smoke(small_model, kl):
    """Amortized two-step VI with theta_dim=6, y_dim=20 — every layer
    (datagen, ELBO, nets, bridge, step 2) is dimension-generic."""
    fh = make_fh_fun_field(small_model, kl, CFG, probe_nodes=PROBES)
    ds = generate_data_fem(
        jax.random.PRNGKey(11), jax.jit(jax.vmap(fh)), n_sam=64, ne_sam=4,
        d_y=CFG.y_dim, d_theta=N_MODES, sig_e=1e-3, sig_eta=1e-4,
    )
    tcfg = TrainConfig(batch_size=32, num_epoch1=5, num_epoch2=5)
    trainer = TwoStepTrainer(None, CFG, tcfg, fh=fh)
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(1))
    assert np.isfinite(res.hist_step1).all() and np.isfinite(res.hist_step2).all()
    assert res.hist_step1[-1] < res.hist_step1[0]
    assert res.hist_step2[-1] < res.hist_step2[0]
    tm, tsig, zm, zs = trainer.predict(res.theta_params, res.z_params, ds.y_data[:4])
    assert tm.shape == (4, N_MODES) and zm.shape == (4, 2)


def test_centroids_shape(small_model):
    c = element_centroids(small_model)
    assert c.shape == (small_model.nele, 2)
    # Cook's membrane: x in [0, 48], y in [0, 60]
    assert c[:, 0].min() > 0 and c[:, 0].max() < 48


def test_field_solver_grid_mode_matches_gather(small_model, kl):
    """grid=(nx, ny) structured mode (reshape/slice gather-scatter) ==
    the lm-table mode, values and E-gradients."""
    nx, ny = 10, 5
    lam1, mu1 = lame_from_Ev(1.0, NU)
    ke_unit = lam1 * jnp.asarray(small_model.ke_lam) + mu1 * jnp.asarray(
        small_model.ke_mu
    )
    b = jnp.asarray(small_model.f_ext)
    kw = dict(tol=1e-12, maxiter=4000)
    s_lm = make_field_solver(
        ke_unit, np.asarray(small_model.lm), small_model.free_mask,
        small_model.ndof, **kw,
    )
    s_gr = make_field_solver(
        ke_unit, np.asarray(small_model.lm), small_model.free_mask,
        small_model.ndof, grid=(nx, ny), **kw,
    )
    theta = jax.random.normal(jax.random.PRNGKey(7), (N_MODES,))
    E = field_from_theta(kl, theta, small_model.dtype)
    np.testing.assert_allclose(
        np.asarray(s_gr(E, b)), np.asarray(s_lm(E, b)), atol=1e-12
    )
    g_lm = jax.grad(lambda ee: jnp.sum(s_lm(ee, b) ** 2))(E)
    g_gr = jax.grad(lambda ee: jnp.sum(s_gr(ee, b) ** 2))(E)
    np.testing.assert_allclose(np.asarray(g_gr), np.asarray(g_lm), rtol=1e-9)
    # a wrong grid declaration is rejected, not silently mis-assembled
    with pytest.raises(ValueError):
        make_field_solver(
            ke_unit, np.asarray(small_model.lm), small_model.free_mask,
            small_model.ndof, grid=(5, 10), **kw,
        )


def test_randomized_kl_matches_dense_eigh(small_model, kl):
    """The scaled-mesh randomized subspace iteration reproduces the dense
    eigh KL basis (eigenvalues to machine precision; modes up to sign)."""
    kl_r = build_kl_expansion(
        small_model, n_modes=N_MODES, corr_len=15.0, sigma=0.3,
        dense_eigh_threshold=0,  # force the randomized path on this mesh
    )
    np.testing.assert_allclose(kl_r.eigvals, kl.eigvals, rtol=1e-8)
    for k in range(N_MODES):
        dot = float(kl.modes[k] @ kl_r.modes[k]) / float(kl.modes[k] @ kl.modes[k])
        np.testing.assert_allclose(abs(dot), 1.0, rtol=1e-8)


def test_mean_field_preconditioner_parity():
    """Two-level mean-field-preconditioned field solve == Jacobi-CG solve
    (same operator, different preconditioner) on a structured mesh."""
    from vbicm_tpu.prob.randomfield import make_mean_field_preconditioner

    ratio = 4
    nx, ny = 16, 8
    model = build_fem_model(cooks_membrane_mesh(nx, ny), dense=False)
    coarse = build_fem_model(
        cooks_membrane_mesh(nx // ratio, ny // ratio), dense=True
    )
    klm = build_kl_expansion(model, n_modes=N_MODES, corr_len=15.0, sigma=0.3)
    lam1, mu1 = lame_from_Ev(1.0, NU)
    ke_unit = lam1 * jnp.asarray(model.ke_lam) + mu1 * jnp.asarray(model.ke_mu)
    theta = jax.random.normal(jax.random.PRNGKey(3), (N_MODES,))
    E = field_from_theta(klm, theta, model.dtype)
    b = jnp.asarray(model.f_ext)
    solve_j = make_field_solver(
        ke_unit, np.asarray(model.lm), model.free_mask, model.ndof, tol=1e-12
    )
    prec = make_mean_field_preconditioner(
        coarse, nx // ratio, ny // ratio, ratio, model.free_mask, nu=NU, E0=20.0
    )
    solve_p = make_field_solver(
        ke_unit, np.asarray(model.lm), model.free_mask, model.ndof, tol=1e-12,
        preconditioner=prec,
    )
    uj = solve_j(E, b)
    up = solve_p(E, b)
    np.testing.assert_allclose(np.asarray(up), np.asarray(uj), atol=1e-9)
    # gradients agree through both solvers (custom VJP composes with prec)
    def loss(s, t):
        return jnp.sum(s(field_from_theta(klm, t, model.dtype), b) ** 2)

    gj = jax.grad(lambda t: loss(solve_j, t))(theta)
    gp = jax.grad(lambda t: loss(solve_p, t))(theta)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gj), rtol=1e-6)


# ---------------------------------------------------------------- 3-D box


@pytest.fixture(scope="module")
def box_model():
    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.mesh.solid3d import beam_hex8_mesh

    return build_fem_model(
        beam_hex8_mesh(4, 2, 2, lx=4.0), SectionCard(stype=4), dense=True
    )


def test_field_solver_grid_mode_matches_gather_3d(box_model):
    """grid=(nx, ny, nz) structured hex8 mode == the lm-table mode,
    values and E-gradients (3-D sibling of the 2-D grid-mode pin)."""
    model = box_model
    lam1, mu1 = lame_from_Ev(1.0, NU)
    ke_unit = lam1 * jnp.asarray(model.ke_lam) + mu1 * jnp.asarray(model.ke_mu)
    b = jnp.asarray(model.f_ext)
    kw = dict(tol=1e-12, maxiter=4000)
    s_lm = make_field_solver(
        ke_unit, np.asarray(model.lm), model.free_mask, model.ndof, **kw
    )
    s_gr = make_field_solver(
        ke_unit, np.asarray(model.lm), model.free_mask, model.ndof,
        grid=(4, 2, 2), **kw,
    )
    klb = build_kl_expansion(model, n_modes=N_MODES, corr_len=2.0, sigma=0.3)
    theta = jax.random.normal(jax.random.PRNGKey(11), (N_MODES,))
    E = field_from_theta(klb, theta, model.dtype)
    np.testing.assert_allclose(
        np.asarray(s_gr(E, b)), np.asarray(s_lm(E, b)), atol=1e-12
    )
    g_lm = jax.grad(lambda ee: jnp.sum(s_lm(ee, b) ** 2))(E)
    g_gr = jax.grad(lambda ee: jnp.sum(s_gr(ee, b) ** 2))(E)
    np.testing.assert_allclose(np.asarray(g_gr), np.asarray(g_lm), rtol=1e-9)
    with pytest.raises(ValueError):
        make_field_solver(
            ke_unit, np.asarray(model.lm), model.free_mask, model.ndof,
            grid=(2, 2, 4), **kw,
        )


def test_field_fh_3d_smoke_and_grad(box_model):
    """make_fh_fun_field on a hex8 box (stype=4): finite outputs, finite
    theta-gradient through the field solve + von Mises probe."""
    model = box_model
    klb = build_kl_expansion(model, n_modes=N_MODES, corr_len=2.0, sigma=0.3)
    cfg = ProblemConfig(
        theta_dim=N_MODES, y_dim=3 * 4, ele_id=8, nipt_id=(1, 5),
        sig_e=1e-2, sig_eta=1e-3,
    )
    probes = [model.nnodes, model.nnodes - 1, model.nnodes - 4, 20]
    fh = make_fh_fun_field(
        model, klb, cfg, probe_nodes=probes, nu=NU, grid=(4, 2, 2)
    )
    theta = jax.random.normal(jax.random.PRNGKey(5), (N_MODES,))
    y, h = fh(theta)
    assert y.shape == (12,) and h.shape == (2,)
    assert np.isfinite(np.asarray(y)).all() and np.isfinite(np.asarray(h)).all()
    g = jax.grad(lambda t: jnp.sum(fh(t)[0] ** 2) + jnp.sum(fh(t)[1]))(theta)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_mean_field_preconditioner_box3d_parity():
    """3-D mean-field two-level preconditioned field solve == Jacobi-CG on
    a structured box, values and theta-gradients."""
    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.mesh.solid3d import beam_hex8_mesh
    from vbicm_tpu.prob.randomfield import make_mean_field_preconditioner_box3d

    ratio = 2
    cells = (8, 4, 4)
    model = build_fem_model(
        beam_hex8_mesh(*cells, lx=8.0), SectionCard(stype=4), dense=False
    )
    coarse = build_fem_model(
        beam_hex8_mesh(*(c // ratio for c in cells), lx=8.0),
        SectionCard(stype=4), dense=True,
    )
    klb = build_kl_expansion(model, n_modes=N_MODES, corr_len=3.0, sigma=0.3)
    lam1, mu1 = lame_from_Ev(1.0, NU)
    ke_unit = lam1 * jnp.asarray(model.ke_lam) + mu1 * jnp.asarray(model.ke_mu)
    theta = jax.random.normal(jax.random.PRNGKey(3), (N_MODES,))
    E = field_from_theta(klb, theta, model.dtype)
    b = jnp.asarray(model.f_ext)
    solve_j = make_field_solver(
        ke_unit, np.asarray(model.lm), model.free_mask, model.ndof, tol=1e-12
    )
    prec = make_mean_field_preconditioner_box3d(
        coarse, tuple(c // ratio for c in cells), ratio, model.free_mask,
        nu=NU, E0=20.0,
    )
    solve_p = make_field_solver(
        ke_unit, np.asarray(model.lm), model.free_mask, model.ndof, tol=1e-12,
        preconditioner=prec, grid=cells,
    )
    uj = solve_j(E, b)
    up = solve_p(E, b)
    np.testing.assert_allclose(np.asarray(up), np.asarray(uj), atol=1e-9)

    def loss(s, t):
        return jnp.sum(s(field_from_theta(klb, t, model.dtype), b) ** 2)

    gj = jax.grad(lambda t: loss(solve_j, t))(theta)
    gp = jax.grad(lambda t: loss(solve_p, t))(theta)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gj), rtol=1e-6)


def test_posterior_field_moments_and_xdmf_cell_fields(tmp_path, small_model, kl):
    """Closed-form log-field moments under a mean-field q match MC, and the
    XDMF export round-trips them as per-element cell attributes."""
    from vbicm_tpu.eval.xdmf import write_xdmf
    from vbicm_tpu.prob.randomfield import posterior_field_moments

    rng = np.random.default_rng(0)
    tm = rng.standard_normal(N_MODES)
    tv = rng.uniform(0.1, 0.5, N_MODES)
    log_mean, log_std = posterior_field_moments(kl, tm, tv)
    # MC check of the linear-Gaussian pushforward
    th = tm + np.sqrt(tv) * rng.standard_normal((200_000, N_MODES))
    logE = th @ kl.modes + kl.mean_log
    np.testing.assert_allclose(log_mean, logE.mean(0), atol=5e-3)
    np.testing.assert_allclose(log_std, logE.std(0), rtol=2e-2)

    path = str(tmp_path / "field.h5")
    write_xdmf(path, small_model, [np.zeros(small_model.ndof)],
               cell_fields={"logE_post_mean": log_mean, "logE_post_std": log_std})
    import h5py

    with h5py.File(path) as f:
        np.testing.assert_array_equal(f["cell_logE_post_mean"][...], log_mean)
        np.testing.assert_array_equal(f["cell_logE_post_std"][...], log_std)
    xml = open(str(tmp_path / "field.xdmf")).read()
    assert 'Attribute Name="logE_post_std"' in xml and 'Center="Cell"' in xml
    with pytest.raises(ValueError):
        write_xdmf(path, small_model, [np.zeros(small_model.ndof)],
                   cell_fields={"bad": log_mean[:-1]})


# ---------------------------------------------------------------- field ROM


@pytest.mark.slow
def test_field_rom_certified_and_matches_full(small_model, kl):
    """Certified field RB-ROM == the full-order field solve, values and
    theta-gradients, on fresh prior draws (the affine-in-E reduction needs
    no EIM — rom/field.py module docstring)."""
    from vbicm_tpu.rom import build_reduced_basis_field, make_fh_fun_field_rom

    model = small_model
    rb = build_reduced_basis_field(
        model, kl, nu=NU, n_candidates=128, n_validate=32, tol=1e-9,
        max_basis=120, seed=0,
    )
    assert rb.max_rel_residual < 1e-9
    # the held-out certificate is the honest number (48-draw pools overfit:
    # train 3e-13 but val 7e-3 — the measured envelope in rom/field.py)
    assert rb.val_max_rel_residual < 1e-10
    cfg = ProblemConfig(theta_dim=N_MODES, y_dim=2 * len(PROBES), ele_id=5)
    fh_rom = make_fh_fun_field_rom(model, kl, rb, cfg, probe_nodes=PROBES)
    fh_full = make_fh_fun_field(model, kl, cfg, probe_nodes=PROBES, nu=NU,
                                tol=1e-12, maxiter=4000)
    thetas = jax.random.normal(jax.random.PRNGKey(7), (5, N_MODES))
    y_r, h_r = jax.vmap(fh_rom)(thetas)
    y_f, h_f = jax.vmap(fh_full)(thetas)
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_f), rtol=2e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(h_r), np.asarray(h_f), rtol=2e-7)

    def obj(fh, th):
        y, h = fh(th)
        return jnp.sum(y**2) + jnp.sum(h)

    g_r = jax.grad(lambda t: obj(fh_rom, t))(thetas[0])
    g_f = jax.grad(lambda t: obj(fh_full, t))(thetas[0])
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g_f), rtol=1e-5)


def test_posterior_field_moments_fullcov(kl):
    """Full-covariance field projection |L^T m_e| == MC, and differs from
    the marginal-variance (mean-field) formula when theta is correlated."""
    from vbicm_tpu.prob.randomfield import posterior_field_moments

    rng = np.random.default_rng(1)
    tm = rng.standard_normal(N_MODES)
    A = rng.standard_normal((N_MODES, N_MODES)) * 0.3
    L = np.linalg.cholesky(A @ A.T + 0.05 * np.eye(N_MODES))
    _, std_fc = posterior_field_moments(kl, tm, L=L)
    th = tm + rng.standard_normal((200_000, N_MODES)) @ L.T
    logE = th @ kl.modes + kl.mean_log
    np.testing.assert_allclose(std_fc, logE.std(0), rtol=2e-2)
    _, std_mf = posterior_field_moments(kl, tm, np.diag(L @ L.T))
    assert np.max(np.abs(std_mf - std_fc) / std_fc) > 0.05  # correlations matter
    with pytest.raises(ValueError):
        posterior_field_moments(kl, tm)
    with pytest.raises(ValueError):
        posterior_field_moments(kl, tm, np.ones(N_MODES), L=L)
