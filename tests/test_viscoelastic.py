"""Generalized-Maxwell viscoelasticity (ops.viscoelastic): integrator
exactness, elastic limits, creep physics, and parameter gradients through
the trajectory.

Rate-dependent sibling of the J2 plasticity family on the reference's
driverless inelastic storage (``src/fem_preprocess.py:486-501``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.viscoelastic import (
    MaxwellMaterial,
    make_viscoelastic_solver,
    relaxation_modulus,
)
from vbicm_tpu.solver import material_coeffs

LAM, MU = material_coeffs(2, 20.0, 0.3)


def _mat(mu_ratio=0.5, tau=1.0):
    """Instantaneous moduli = reference card (lam, MU); one branch carrying
    ``mu_ratio`` of the shear stiffness."""
    return MaxwellMaterial(
        lam=jnp.asarray(LAM),
        mu_inf=jnp.asarray(MU * (1 - mu_ratio)),
        mu=jnp.asarray([MU * mu_ratio]),
        tau=jnp.asarray([tau]),
    )


def test_recurrence_is_exact_for_ramp_hold():
    """The Herrmann-Peterson recurrence is EXACT for piecewise-linear
    strain: a single-branch ramp(t_r)-then-hold shear history must match
    the closed-form hereditary integral to machine precision at ANY dt.

        s(t >= t_r) = 2 mu (e/t_r) tau (1 - e^{-t_r/tau}) e^{-(t-t_r)/tau}
    """
    mu_b, tau, e_amp, t_r, dt = 3.0, 0.7, 0.02, 0.3, 0.1
    n_ramp = int(round(t_r / dt))
    n_hold = 20
    a = np.exp(-dt / tau)
    b = -np.expm1(-dt / tau) / (dt / tau)
    de = e_amp / n_ramp
    s = 0.0
    ts, ss = [], []
    for n in range(n_ramp + n_hold):
        inc = de if n < n_ramp else 0.0
        s = a * s + 2 * mu_b * b * inc
        ts.append((n + 1) * dt)
        ss.append(s)
    ts, ss = np.asarray(ts), np.asarray(ss)
    hold = ts >= t_r - 1e-12
    s_exact = (
        2 * mu_b * (e_amp / t_r) * tau * (1 - np.exp(-t_r / tau))
        * np.exp(-(ts[hold] - t_r) / tau)
    )
    np.testing.assert_allclose(ss[hold], s_exact, rtol=1e-12)


def test_relaxation_modulus_prony():
    mat = _mat(0.4, 2.0)
    t = jnp.asarray([0.0, 1.0, 10.0])
    g = np.asarray(relaxation_modulus(mat, t))
    assert abs(g[0] - MU) < 1e-12  # instantaneous = mu0
    # t = 5 tau: branch decayed to e^-5 = 0.0067 of its modulus
    expected = 0.6 * MU + 0.4 * MU * np.exp(-5.0)
    np.testing.assert_allclose(g[2], expected, rtol=1e-12)


@pytest.fixture(scope="module")
def model():
    return build_fem_model(cooks_membrane_mesh(8, 4), dense=True)


def _elastic_u(model, lam, mu):
    K = np.zeros((model.ndof, model.ndof))
    lm = np.asarray(model.lm)
    ke = lam * np.asarray(model.ke_lam) + mu * np.asarray(model.ke_mu)
    for e in range(lm.shape[0]):
        K[np.ix_(lm[e], lm[e])] += ke[e]
    free = np.asarray(model.free_dof)
    u = np.zeros(model.ndof)
    u[free] = np.linalg.solve(K[np.ix_(free, free)], np.asarray(model.f_ext)[free])
    return u


def test_instantaneous_limit_matches_elastic(model):
    """tau >> total time: no relaxation happens; every step equals the
    elastic solve at the instantaneous moduli (lam, mu0)."""
    mat = _mat(0.5, tau=1e8)
    solve = make_viscoelastic_solver(model, dt=0.1, n_steps=4)
    res = solve(mat)
    u_el = _elastic_u(model, LAM, MU)
    for k in range(4):
        # spectral-solve roundoff feeds the history: measured drift
        # ~1.5e-9/step, far below any physical relaxation
        np.testing.assert_allclose(
            np.asarray(res.u[k]), u_el, rtol=0, atol=1e-7
        )


def test_longtime_creep_reaches_relaxed_modulus(model):
    """Constant load, t >> tau: the displacement converges to the elastic
    solve at the RELAXED moduli (K_b unchanged, mu -> mu_inf)."""
    mat = _mat(0.5, tau=0.05)
    solve = make_viscoelastic_solver(model, dt=0.1, n_steps=40)
    res = solve(mat)
    kb = LAM + 2 * MU / 3
    mu_rel = 0.5 * MU
    u_rel = _elastic_u(model, kb - 2 * mu_rel / 3, mu_rel)
    np.testing.assert_allclose(
        np.asarray(res.u[-1]), u_rel, rtol=0,
        atol=1e-6 * np.abs(u_rel).max(),
    )
    # creep: tip deflection magnitude strictly grows from glassy to relaxed
    tip = np.abs(np.asarray(res.u)[:, -1])
    assert (np.diff(tip) > -1e-12).all()
    assert tip[-1] > 1.2 * tip[0]


def test_parameter_gradients_fd(model):
    """Gradients of a trajectory functional w.r.t. every Maxwell parameter
    (through scan-of-spectral-solves) vs central finite differences."""
    solve = make_viscoelastic_solver(model, dt=0.2, n_steps=6)

    def loss(mu_inf, mu_b, tau):
        mat = MaxwellMaterial(
            lam=jnp.asarray(LAM), mu_inf=mu_inf,
            mu=jnp.asarray([mu_b]), tau=jnp.asarray([tau]),
        )
        res = solve(mat)
        return jnp.sum(res.u[-1] ** 2) + jnp.sum(res.u[2] ** 2)

    args = (jnp.asarray(0.5 * MU), jnp.asarray(0.5 * MU), jnp.asarray(0.4))
    g = jax.grad(loss, argnums=(0, 1, 2))(*args)
    for i, name in enumerate(["mu_inf", "mu_b", "tau"]):
        h = 1e-6 * max(1.0, abs(float(args[i])))
        ap = list(args)
        ap[i] = args[i] + h
        am = list(args)
        am[i] = args[i] - h
        fd = (float(loss(*ap)) - float(loss(*am))) / (2 * h)
        np.testing.assert_allclose(float(g[i]), fd, rtol=5e-6,
                                   err_msg=name)
        assert abs(float(g[i])) > 1e-10, name


def test_vmap_material_batch(model):
    """vmap over a relaxation-time batch == per-sample loop."""
    solve = make_viscoelastic_solver(model, dt=0.1, n_steps=5)

    def tip(tau):
        res = solve(MaxwellMaterial(
            lam=jnp.asarray(LAM), mu_inf=jnp.asarray(0.5 * MU),
            mu=jnp.asarray([0.5 * MU]), tau=jnp.asarray([tau]),
        ))
        return res.u[-1]

    taus = jnp.asarray([0.05, 0.5, 5.0])
    batched = jax.vmap(tip)(taus)
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(batched[k]), np.asarray(tip(taus[k])),
            rtol=0, atol=1e-12,
        )


# ---------------------------------------------------------------------------
# VI through the viscoelastic trajectory (make_fh_fun_viscoelastic)
# ---------------------------------------------------------------------------


def test_fh_viscoelastic_shapes_and_creep(model):
    """Observation operator sanity: trajectory shape, positive von Mises
    probe, and monotone creep growth under the step load."""
    from vbicm_tpu.config import ProblemConfig
    from vbicm_tpu.solver import make_fh_fun_viscoelastic

    cfg = ProblemConfig(node_id=model.nnodes, ele_id=model.nele // 2)
    n_steps = 6
    fh = make_fh_fun_viscoelastic(model, cfg, n_steps=n_steps)
    y, h = fh(jnp.zeros(2))
    assert y.shape == (2 * n_steps,) and h.shape == (2,)
    assert np.isfinite(np.asarray(y)).all()
    assert (np.asarray(h) > 0).all()
    # creep: |u_y(t)| strictly increases under the constant load
    uy = np.abs(np.asarray(y).reshape(n_steps, 2)[:, 1])
    assert (np.diff(uy) > 0).all()


@pytest.mark.slow
def test_fh_viscoelastic_gradients_vs_fd(model):
    """theta-gradients through the whole lax.scan of spectral affine solves
    against central finite differences; both Prony parameters observable."""
    from vbicm_tpu.config import ProblemConfig
    from vbicm_tpu.solver import make_fh_fun_viscoelastic

    cfg = ProblemConfig(node_id=model.nnodes, ele_id=model.nele // 2)
    fh = make_fh_fun_viscoelastic(model, cfg, n_steps=5)

    def loss(t):
        y, h = jax.vmap(fh)(t)
        return jnp.sum(y**2) + jnp.sum(h)

    th = jnp.asarray(np.random.default_rng(0).standard_normal((2, 2)))
    g = np.asarray(jax.grad(loss)(th))
    t0 = np.asarray(th)
    eps = 1e-6
    fd = np.zeros_like(t0)
    for i in range(t0.shape[0]):
        for j in range(2):
            tp, tm = t0.copy(), t0.copy()
            tp[i, j] += eps
            tm[i, j] -= eps
            fd[i, j] = (
                float(loss(jnp.asarray(tp))) - float(loss(jnp.asarray(tm)))
            ) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=5e-6)
    assert np.abs(g).min() > 1e-8  # both parameters observable


@pytest.mark.slow
def test_two_step_vi_through_viscoelasticity(model):
    """End-to-end amortized VI: dataset generated by the Maxwell creep
    forward model, both steps trained THROUGH the time-integration scan —
    the rate-dependent sibling of test_two_step_vi_through_plasticity."""
    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.prob.datagen import generate_data_fem
    from vbicm_tpu.solver import make_fh_fun_viscoelastic
    from vbicm_tpu.vi.train import TwoStepTrainer

    n_steps = 4
    cfg = ProblemConfig(node_id=model.nnodes, ele_id=model.nele // 2,
                        y_dim=2 * n_steps, sig_e=1e-2, sig_eta=1e-4)
    fh = make_fh_fun_viscoelastic(model, cfg, n_steps=n_steps)
    ds = generate_data_fem(
        jax.random.PRNGKey(3), jax.jit(jax.vmap(fh)), n_sam=32, ne_sam=4,
        d_y=2 * n_steps, sig_e=1e-2, sig_eta=1e-4,
    )
    tcfg = TrainConfig(batch_size=16, num_epoch1=10, num_epoch2=6)
    trainer = TwoStepTrainer(None, cfg, tcfg, fh=fh)
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(0))
    assert np.isfinite(res.hist_step1).all() and np.isfinite(res.hist_step2).all()
    # last-batch losses are MC-noisy (ne=4); compare the trend, not a pair
    assert np.mean(res.hist_step1[-3:]) < res.hist_step1[0]
    assert res.hist_step2[-1] < res.hist_step2[0]


@pytest.mark.slow
def test_viscoelastic_posterior_vs_laplace(model):
    """Amortized posterior + per-observation SVI refinement against the
    Laplace baseline on one tight-noise creep observation: the refined
    full-covariance posterior must land on the Laplace mode/scales (the
    posterior is near-Gaussian at this noise level)."""
    from vbicm_tpu.config import ProblemConfig
    from vbicm_tpu.eval.laplace import laplace_posterior
    from vbicm_tpu.eval.mcmc import make_fem_logpost
    from vbicm_tpu.vi.refine import refine_posterior
    from vbicm_tpu.solver import make_fh_fun_viscoelastic

    n_steps = 5
    sig_e = 1e-4
    cfg = ProblemConfig(node_id=model.nnodes, ele_id=model.nele // 2,
                        y_dim=2 * n_steps, sig_e=sig_e)
    fh = make_fh_fun_viscoelastic(model, cfg, n_steps=n_steps)
    theta_true = jnp.array([0.7, -0.4])
    y_obs, _ = fh(theta_true)

    logpost = make_fem_logpost(fh, y_obs, sig_e)
    lap = laplace_posterior(logpost, jnp.zeros(2))
    batch_f = lambda th: jax.vmap(fh)(th)[0]
    mu, L, hist = refine_posterior(
        batch_f, y_obs, sig_e, jnp.zeros(2), 0.3 * jnp.eye(2),
        key=jax.random.PRNGKey(1), steps=3000, ne=16, lr=1e-2,
    )
    la_std = np.sqrt(np.diag(np.asarray(lap.cov)))
    vi_std = np.sqrt(np.diag(np.asarray(L @ L.T)))
    # mean agreement in posterior-std units; std ratio bracketed (same
    # criteria as test_refine_field_posterior_matches_laplace)
    zgap = np.abs(np.asarray(mu) - np.asarray(lap.theta_map)) / la_std
    assert np.all(zgap < 0.6), (zgap, la_std)
    ratio = vi_std / la_std
    assert np.all(ratio > 0.7) and np.all(ratio < 1.4), ratio
