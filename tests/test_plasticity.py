"""J2 flow plasticity (ops.plasticity): variational identity, radial-return
consistency, closed-form shear hardening, irreversibility, dissipation,
Bauschinger effect, and parameter gradients through the load history.

The reference allocates the inelastic storage (``src/fem_preprocess.py:
486-501``) behind the empty ``mat_type == 99`` driver stub
(``src/mat_subroutine.py:210-215``); every behavior pinned here is new
capability on that surface.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.mesh.feap import MeshData
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.ops.plasticity import (
    J2Material,
    PlasticState,
    incremental_energy,
    init_state,
    make_plasticity_solver,
    make_plasticity_step,
    plastic_dissipation,
    recover_sig6,
    return_map,
    solve_plasticity,
)
from vbicm_tpu.solver import material_coeffs

LAM, MU = material_coeffs(2, 20.0, 0.3)  # reference material card E=20, v=0.3


def _rand_state(rng, shape=()):
    """Random ADMISSIBLE history: deviatoric eps_p and beta (6-comp tensor
    layout (11, 22, 33, 12, 23, 31))."""

    def dev6(a):
        a = a.copy()
        a[..., :3] -= a[..., :3].sum(axis=-1, keepdims=True) / 3.0
        return a

    eps_p = dev6(rng.standard_normal(shape + (6,)) * 0.01)
    beta = dev6(rng.standard_normal(shape + (6,)) * 0.05)
    alpha = np.abs(rng.standard_normal(shape)) * 0.02
    return PlasticState(
        eps_p=jnp.asarray(eps_p), alpha=jnp.asarray(alpha), beta=jnp.asarray(beta)
    )


MAT = J2Material(
    lam=jnp.asarray(LAM), mu=jnp.asarray(MU), sig_y=jnp.asarray(0.3),
    H_iso=jnp.asarray(2.0), H_kin=jnp.asarray(1.0),
)


def test_variational_identity():
    """grad of the incremental pseudo-potential IS the radial-return stress
    (rows s11, s22, t12 against the engineering-strain input) — in BOTH the
    elastic and the plastic regime, from a non-trivial history."""
    rng = np.random.default_rng(0)
    state = _rand_state(rng)
    for amp in (1e-4, 5e-2):  # elastic / deep plastic
        eps3 = jnp.asarray(rng.standard_normal(3) * amp)
        sig6, _, dg = return_map(eps3, state, MAT)
        g = jax.grad(incremental_energy)(eps3, state, MAT)
        np.testing.assert_allclose(
            np.asarray(sig6)[[0, 1, 3]], np.asarray(g), rtol=1e-12, atol=1e-14
        )
    assert float(dg) > 0.0  # the large-amplitude case actually yielded


def test_return_map_consistency():
    """After a plastic return: yield function == 0 at the updated state,
    plastic strain stays deviatoric, the flow is associative (deps_p
    parallel to the updated relative stress deviator)."""
    rng = np.random.default_rng(1)
    state = _rand_state(rng)
    eps3 = jnp.asarray(rng.standard_normal(3) * 0.05)
    sig6, new, dg = return_map(eps3, state, MAT)
    assert float(dg) > 0
    sig6 = np.asarray(sig6)
    dev = sig6.copy()
    dev[:3] -= sig6[:3].sum() / 3.0
    xi = dev - np.asarray(new.beta)
    q = np.sqrt(1.5 * ((xi[:3] ** 2).sum() + 2 * (xi[3:] ** 2).sum()))
    f_new = q - (float(MAT.sig_y) + float(MAT.H_iso) * float(new.alpha))
    assert abs(f_new) < 1e-10
    epd = np.asarray(new.eps_p)
    assert abs(epd[:3].sum()) < 1e-12
    deps = epd - np.asarray(state.eps_p)
    cos = np.dot(deps[:3], xi[:3]) + 2 * np.dot(deps[3:], xi[3:])
    assert cos / (np.linalg.norm(deps) * np.linalg.norm(xi)) > 0.99


@pytest.fixture(scope="module")
def cooks_model():
    return build_fem_model(cooks_membrane_mesh(8, 4), dense=True)


def test_elastic_limit_matches_linear(cooks_model):
    """sig_y -> huge: the full incremental machinery reproduces the linear
    elastic solve (scipy partitioned oracle) to machine precision."""
    m = cooks_model
    mat = J2Material(lam=jnp.asarray(LAM), mu=jnp.asarray(MU),
                     sig_y=jnp.asarray(1e6))
    res = solve_plasticity(m, mat, n_steps=3)
    assert bool(res.converged.all())
    assert float(res.state.alpha.max()) == 0.0

    K = np.zeros((m.ndof, m.ndof))
    lm = np.asarray(m.lm)
    ke = LAM * np.asarray(m.ke_lam) + MU * np.asarray(m.ke_mu)
    for e in range(lm.shape[0]):
        K[np.ix_(lm[e], lm[e])] += ke[e]
    free = np.asarray(m.free_dof)
    u_ref = np.zeros(m.ndof)
    u_ref[free] = np.linalg.solve(K[np.ix_(free, free)], np.asarray(m.f_ext)[free])
    np.testing.assert_allclose(np.asarray(res.u), u_ref, rtol=0, atol=1e-9)


# ---------------------------------------------------------------------------
# homogeneous simple-shear patch (kinematically driven boundary)
# ---------------------------------------------------------------------------


def shear_patch_mesh(n: int = 2, gamma: float = 1.0) -> MeshData:
    """[0,1]^2, n x n quad4, every boundary node driven with the affine
    simple-shear field u = (gamma*y, 0); interior nodes free.  The exact
    solution is homogeneous shear (patch test), so per-qpt quantities are
    uniform and comparable to the 1-point closed form."""
    xs = np.linspace(0.0, 1.0, n + 1)
    X, Y = np.meshgrid(xs, xs)
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)
    conn = []
    for r in range(n):
        for c in range(n):
            n0 = r * (n + 1) + c
            conn.append((n0, n0 + 1, n0 + n + 2, n0 + n + 1))
    conn = np.asarray(conn, dtype=np.int32)
    bnd = [
        i for i in range(coords.shape[0])
        if min(coords[i]) == 0.0 or max(coords[i]) == 1.0
    ]
    bc_nodes, bc_flags, disp_nodes, disp_vals = [], [], [], []
    for i in bnd:
        y = coords[i, 1]
        if y == 0.0:
            bc_nodes.append(i)
            bc_flags.append((1, 1))
        else:
            bc_nodes.append(i)
            bc_flags.append((0, 1))  # u_y = 0 fixed
            disp_nodes.append(i)
            disp_vals.append((gamma * y, 0.0))
    return MeshData(
        coords=coords,
        conn=conn,
        bc_nodes=np.asarray(bc_nodes, dtype=np.int32),
        bc_flags=np.asarray(bc_flags, dtype=np.int32),
        load_nodes=np.zeros((0,), dtype=np.int32),
        load_vals=np.zeros((0, 2)),
        disp_nodes=np.asarray(disp_nodes, dtype=np.int32),
        disp_vals=np.asarray(disp_vals),
    )


def _shear_curve(gamma_max, n_steps, mat):
    """tau(gamma) on the driven patch; returns (gammas, taus, model, result)."""
    model = build_fem_model(shear_patch_mesh(2, gamma_max), dense=True)
    step = make_plasticity_step(model)
    state = init_state(model.nele, model.nqpt, model.dtype)
    u = jnp.zeros((model.ndof,), model.dtype)
    gammas = np.linspace(gamma_max / n_steps, gamma_max, n_steps)
    taus = []
    for g in gammas:
        factor = g / gamma_max
        u, state_new, it, conv = step(mat, state, jnp.asarray(factor), u)
        assert bool(conv)
        sig6 = recover_sig6(model, u, state, mat, factor=factor)
        s = np.asarray(sig6)[..., 3]
        assert np.allclose(s, s.flat[0], atol=1e-10)  # homogeneous
        taus.append(float(s.flat[0]))
        state = state_new
    return gammas, np.asarray(taus), model, state


@pytest.mark.slow
def test_shear_hardening_slope():
    """Monotonic simple shear: elastic slope mu, yield at tau_y = sig_y/sqrt(3),
    then the closed-form elastoplastic slope mu*H/(H + 3 mu)."""
    sig_y, H = 0.05, 3.0
    mat = J2Material(lam=jnp.asarray(LAM), mu=jnp.asarray(MU),
                     sig_y=jnp.asarray(sig_y), H_iso=jnp.asarray(H))
    gam, tau, _, state = _shear_curve(0.05, 25, mat)
    # elastic slope (first increments, below yield)
    np.testing.assert_allclose(tau[0] / gam[0], MU, rtol=1e-10)
    # plastic tangent slope from the last two increments
    slope = (tau[-1] - tau[-2]) / (gam[-1] - gam[-2])
    np.testing.assert_allclose(slope, MU * H / (H + 3.0 * MU), rtol=1e-8)
    assert float(state.alpha.min()) > 0  # everything yielded
    # stress level consistency: tau = tau_y + slope*(gamma - gamma_y)
    tau_y = sig_y / np.sqrt(3.0)
    gam_y = tau_y / MU
    np.testing.assert_allclose(
        tau[-1], tau_y + MU * H / (H + 3.0 * MU) * (gam[-1] - gam_y), rtol=1e-8
    )


@pytest.mark.slow
def test_kinematic_equals_isotropic_monotonic():
    """Under MONOTONIC proportional loading, linear kinematic and linear
    isotropic hardening with the same modulus give the same stress curve."""
    m_iso = J2Material(lam=jnp.asarray(LAM), mu=jnp.asarray(MU),
                       sig_y=jnp.asarray(0.05), H_iso=jnp.asarray(2.0))
    m_kin = J2Material(lam=jnp.asarray(LAM), mu=jnp.asarray(MU),
                       sig_y=jnp.asarray(0.05), H_kin=jnp.asarray(2.0))
    _, tau_i, _, _ = _shear_curve(0.04, 10, m_iso)
    _, tau_k, _, _ = _shear_curve(0.04, 10, m_kin)
    np.testing.assert_allclose(tau_i, tau_k, rtol=1e-9)


@pytest.mark.slow
def test_bauschinger_effect():
    """Load to plastic shear then REVERSE to the opposite strain: the
    kinematic-hardening material re-yields earlier (back-stress translation)
    than the isotropic one — strictly more reverse plastic flow."""
    gmax = 0.04

    def cycle_alpha(mat):
        model = build_fem_model(shear_patch_mesh(2, gmax), dense=True)
        step = make_plasticity_step(model)
        state = init_state(model.nele, model.nqpt, model.dtype)
        u = jnp.zeros((model.ndof,), model.dtype)
        for factor in list(np.linspace(0.1, 1.0, 10)) + list(
            np.linspace(0.8, -1.0, 10)
        ):
            u, state, _, conv = step(mat, state, jnp.asarray(factor), u)
            assert bool(conv)
        return float(state.alpha.mean())

    a_kin = cycle_alpha(
        J2Material(lam=jnp.asarray(LAM), mu=jnp.asarray(MU),
                   sig_y=jnp.asarray(0.05), H_kin=jnp.asarray(2.0))
    )
    a_iso = cycle_alpha(
        J2Material(lam=jnp.asarray(LAM), mu=jnp.asarray(MU),
                   sig_y=jnp.asarray(0.05), H_iso=jnp.asarray(2.0))
    )
    assert a_kin > a_iso * 1.05


@pytest.mark.slow
def test_unload_irreversibility(cooks_model):
    """Cook's membrane loaded into the plastic range then force-unloaded:
    permanent deformation remains; the same cycle at elastic sig_y returns
    to (numerically) zero."""
    m = cooks_model
    plastic = J2Material(lam=jnp.asarray(LAM), mu=jnp.asarray(MU),
                         sig_y=jnp.asarray(0.15), H_iso=jnp.asarray(2.0))
    res = solve_plasticity(m, plastic, n_steps=8, unload=True)
    assert bool(res.converged.all())
    assert float(res.state.alpha.max()) > 1e-4  # actually yielded
    resid = float(jnp.linalg.norm(res.u))
    assert resid > 1e-3

    elastic = plastic._replace(sig_y=jnp.asarray(1e6))
    res_e = solve_plasticity(m, elastic, n_steps=8, unload=True)
    assert float(jnp.linalg.norm(res_e.u)) < 1e-10


@pytest.mark.slow
def test_dissipation_nonnegative(cooks_model):
    d = plastic_dissipation(
        cooks_model,
        J2Material(lam=jnp.asarray(LAM), mu=jnp.asarray(MU),
                   sig_y=jnp.asarray(0.15), H_iso=jnp.asarray(2.0)),
        n_steps=6,
    )
    assert float(d) > 0.0
    d0 = plastic_dissipation(
        cooks_model,
        J2Material(lam=jnp.asarray(LAM), mu=jnp.asarray(MU),
                   sig_y=jnp.asarray(1e6)),
        n_steps=6,
    )
    assert abs(float(d0)) < 1e-12


@pytest.fixture(scope="module")
def small_model():
    return build_fem_model(cooks_membrane_mesh(4, 2), dense=True)


@pytest.mark.slow
def test_parameter_gradients_fd(small_model):
    """Gradients of a response functional through the FULL path-dependent
    history (3 steps + unload, scan of custom-VJP Newton solves) against
    central finite differences, for every J2 parameter."""
    m = small_model

    def loss(sig_y, H_iso, mu):
        mat = J2Material(lam=jnp.asarray(LAM), mu=mu, sig_y=sig_y, H_iso=H_iso)
        # tight Newton/CG tolerances: the FD baseline needs the forward
        # solve converged well below the FD increment (measured: default
        # tolerances leave ~5e-4 relative FD noise at h=1e-4)
        solve = make_plasticity_solver(
            m, n_steps=3, unload=True, tol_cr=1e-18, cg_tol=1e-14
        )
        u, state = solve(mat)
        return jnp.sum(u**2) + 10.0 * jnp.sum(state.alpha * m.dvol)

    args = (jnp.asarray(0.15), jnp.asarray(2.0), jnp.asarray(MU))
    g = jax.grad(loss, argnums=(0, 1, 2))(*args)
    for i, name in enumerate(["sig_y", "H_iso", "mu"]):
        h = 1e-5 * max(1.0, abs(float(args[i])))
        ap = list(args)
        ap[i] = args[i] + h
        am = list(args)
        am[i] = args[i] - h
        fd = (float(loss(*ap)) - float(loss(*am))) / (2 * h)
        assert abs(float(g[i]) - fd) <= 2e-5 * max(1.0, abs(fd)), (
            f"{name}: adjoint {float(g[i])} vs FD {fd}"
        )
    assert abs(float(g[0])) > 1e-8  # sig_y actually matters (plastic regime)


@pytest.mark.slow
def test_fh_plasticity_gradients_vs_fd(small_model):
    """theta-gradients of the elastoplastic observation operator (through
    the scan of custom-VJP Newton steps) against central finite
    differences, in the yielded regime."""
    from vbicm_tpu.config import ProblemConfig
    from vbicm_tpu.solver import make_fh_fun_plasticity

    m = small_model
    cfg = ProblemConfig(node_id=m.nnodes, ele_id=m.nele // 2)
    fh = make_fh_fun_plasticity(m, cfg, sig_y0=0.15, H0=2.0, n_steps=3)

    def loss(t):
        y, h = jax.vmap(fh)(t)
        return jnp.sum(y**2) + jnp.sum(h)

    th = jnp.asarray(np.random.default_rng(0).standard_normal((2, 2)))
    g = np.asarray(jax.grad(loss)(th))
    t0 = np.asarray(th)
    eps = 1e-5
    fd = np.zeros_like(t0)
    for i in range(t0.shape[0]):
        for j in range(2):
            tp, tm = t0.copy(), t0.copy()
            tp[i, j] += eps
            tm[i, j] -= eps
            fd[i, j] = (
                float(loss(jnp.asarray(tp))) - float(loss(jnp.asarray(tm)))
            ) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-5)
    assert np.abs(g).min() > 1e-8  # both parameters observable


@pytest.mark.slow
def test_two_step_vi_through_plasticity(small_model):
    """End-to-end amortized VI: dataset generated by the elastoplastic
    forward model, both steps trained THROUGH the load-history scan."""
    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.prob.datagen import generate_data_fem
    from vbicm_tpu.solver import make_fh_fun_plasticity
    from vbicm_tpu.vi.train import TwoStepTrainer

    m = small_model
    cfg = ProblemConfig(node_id=m.nnodes, ele_id=m.nele // 2)
    fh = make_fh_fun_plasticity(m, cfg, sig_y0=0.15, H0=2.0, n_steps=3)
    ds = generate_data_fem(
        jax.random.PRNGKey(3), jax.jit(jax.vmap(fh)), n_sam=32, ne_sam=4,
        sig_e=1e-2, sig_eta=1e-4,
    )
    tcfg = TrainConfig(batch_size=16, num_epoch1=4, num_epoch2=4)
    trainer = TwoStepTrainer(None, cfg, tcfg, fh=fh)
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(0))
    assert np.isfinite(res.hist_step1).all() and np.isfinite(res.hist_step2).all()
    assert res.hist_step1[-1] < res.hist_step1[0]
    assert res.hist_step2[-1] < res.hist_step2[0]


@pytest.mark.slow
def test_plasticity_3d_hex8():
    """The SAME J2 machinery on a 3-D hex8 cantilever (stype=4, 6 strain
    rows): elastic-limit parity with the linear 3-D solve, real yielding at
    low sig_y, and an FD-checked sig_y gradient through the history."""
    from vbicm_tpu.config import SectionCard
    from vbicm_tpu.mesh import beam_hex8_mesh
    from vbicm_tpu.solver import fea_solution

    mesh = beam_hex8_mesh(4, 2, 2, lx=4.0, tip_force=(0.0, 0.0, -0.2))
    m = build_fem_model(mesh, SectionCard(intp=2, stype=4), dense=True)
    lam, mu = material_coeffs(4, 20.0, 0.3)

    elastic = J2Material(lam=jnp.asarray(lam), mu=jnp.asarray(mu),
                         sig_y=jnp.asarray(1e6))
    res = solve_plasticity(m, elastic, n_steps=2)
    assert bool(res.converged.all())
    u_lin = fea_solution(m).u
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(u_lin),
                               rtol=0, atol=1e-9)

    def loss(sig_y):
        mat = J2Material(lam=jnp.asarray(lam), mu=jnp.asarray(mu),
                         sig_y=sig_y, H_iso=jnp.asarray(2.0))
        u, state = make_plasticity_solver(m, n_steps=3)(mat)
        return jnp.sum(u**2), state

    g, state = jax.grad(loss, has_aux=True)(jnp.asarray(0.2))
    assert float(state.alpha.max()) > 1e-5  # yielded
    h = 1e-5
    fd = (float(loss(jnp.asarray(0.2 + h))[0]) -
          float(loss(jnp.asarray(0.2 - h))[0])) / (2 * h)
    np.testing.assert_allclose(float(g), fd, rtol=1e-5)


@pytest.mark.slow
def test_two_level_preconditioned_plasticity():
    """Elastic two-level preconditioner on the elastoplastic tangent CG
    (structured 16x8 Cook's, coarse 8x4): identical converged history to
    the Jacobi path — the scaled-mesh plasticity configuration."""
    from vbicm_tpu.ops.plasticity import make_elastic_two_level_precond

    fine = build_fem_model(cooks_membrane_mesh(16, 8), dense=True)
    coarse = build_fem_model(cooks_membrane_mesh(8, 4), dense=True)
    prec = make_elastic_two_level_precond(fine, coarse, 8, 4, 2)
    mat = J2Material(lam=jnp.asarray(LAM), mu=jnp.asarray(MU),
                     sig_y=jnp.asarray(0.15), H_iso=jnp.asarray(2.0))
    res_j = solve_plasticity(fine, mat, n_steps=4)
    res_p = solve_plasticity(fine, mat, n_steps=4, precond=prec)
    assert bool(res_j.converged.all()) and bool(res_p.converged.all())
    assert float(res_p.state.alpha.max()) > 1e-4  # actually plastic
    np.testing.assert_allclose(
        np.asarray(res_p.u), np.asarray(res_j.u), rtol=0, atol=1e-8
    )


@pytest.mark.slow
def test_vmap_material_batch(small_model):
    """vmap over a batch of yield stresses == per-sample loop (batched
    while_loop solves through the scan)."""
    m = small_model
    solve = make_plasticity_solver(m, n_steps=3)

    def final_u(sig_y):
        u, _ = solve(J2Material(lam=jnp.asarray(LAM), mu=jnp.asarray(MU),
                                sig_y=sig_y, H_iso=jnp.asarray(2.0)))
        return u

    sig_ys = jnp.asarray([0.12, 0.2, 1e6])
    batched = jax.vmap(final_u)(sig_ys)
    for k in range(3):
        # batched while_loops iterate until ALL lanes converge — extra
        # Newton/CG iterations shift the converged point by ~1e-11
        np.testing.assert_allclose(
            np.asarray(batched[k]), np.asarray(final_u(sig_ys[k])),
            rtol=0, atol=1e-9,
        )
