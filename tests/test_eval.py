"""Eval layer: MCMC sampler correctness, KDE/KLD, plots, XDMF."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.eval.mcmc import make_fem_logpost, metropolis, posterior_predictive_z
from vbicm_tpu.eval.postprocess import (
    gaussian_kde_pdf,
    kld_gaussian_kde,
    lognormal_pdf_2d,
    plot_deformed_mesh,
    von_mises_field,
)
from vbicm_tpu.eval.xdmf import write_xdmf
from vbicm_tpu.solver import fea_solution, make_fh_fun
from vbicm_tpu.config import MaterialCard


def test_metropolis_standard_normal():
    """Sampler recovers N(0, I) moments on an analytic target, burn-in
    adaptation lands near the target acceptance, and diagnostics certify
    the chain (split-R-hat ~ 1, healthy bulk ESS)."""
    logpost = lambda th: -0.5 * jnp.sum(th**2)
    res = metropolis(
        jax.random.PRNGKey(0), logpost, d=2, n_samples=4000, burn=500, n_chains=8,
        step_size=5.0,  # deliberately far off; adaptation must recover
    )
    s = res.samples.reshape(-1, 2)
    assert 0.15 < res.accept_rate < 0.5  # adapted toward target 0.3
    assert res.step_size.shape == (8,)
    assert np.all(res.step_size < 5.0)  # scales pulled down from 5.0
    np.testing.assert_allclose(s.mean(axis=0), 0.0, atol=0.06)
    np.testing.assert_allclose(s.std(axis=0), 1.0, atol=0.06)
    assert np.all(res.rhat < 1.02), res.rhat
    assert np.all(res.ess > 500), res.ess  # of 32000 draws
    # posterior-mean MCSE = sd/sqrt(ESS) really bounds the observed error
    assert np.all(np.abs(s.mean(axis=0)) < 6 * res.mean_mcse())


def test_ess_rhat_calibration():
    """ess_rhat on IID draws reports ESS ~ N and R-hat ~ 1; on a stuck
    chain it flags divergence."""
    from vbicm_tpu.eval.mcmc import ess_rhat

    rng = np.random.default_rng(0)
    iid = rng.standard_normal((4, 2000, 2))
    ess, rhat = ess_rhat(iid)
    assert np.all(rhat < 1.01)
    assert np.all(ess > 0.6 * 8000), ess
    # chains stuck at different values: R-hat blows up, ESS collapses
    stuck = np.stack([np.full((2000, 2), m, float) for m in (-3, -1, 1, 3)])
    stuck += 0.01 * rng.standard_normal(stuck.shape)
    ess_s, rhat_s = ess_rhat(stuck)
    assert np.all(rhat_s > 3.0)
    assert np.all(ess_s < 100)


def test_fem_logpost_and_short_chain(cooks_model):
    """Short FEM-chain smoke: posterior concentrates near truth."""
    fh = make_fh_fun(cooks_model)
    theta_true = jnp.array([0.5, -0.5])
    y_clean, _ = fh(theta_true)
    logpost = make_fem_logpost(fh, y_clean, sig_e=1e-3)
    res = metropolis(
        jax.random.PRNGKey(1), logpost, d=2, n_samples=400, burn=200, n_chains=4,
        step_size=0.15,
    )
    s = res.samples.reshape(-1, 2)
    # theta_1 is strongly identified by displacements (E-scale)
    assert abs(s[:, 0].mean() - 0.5) < 0.2
    # posterior predictive through the batched map
    batch_fh = jax.jit(jax.vmap(fh))
    z = posterior_predictive_z(jax.random.PRNGKey(2), batch_fh, s[:200], 3e-3)
    assert z.shape == (200, 2)
    assert np.all(np.isfinite(z))


def test_kde_and_lognormal_pdf():
    rng = np.random.default_rng(0)
    logz = rng.normal(size=(4000, 2)) * 0.1 + np.array([0.5, 0.3])
    z = np.exp(logz)
    pts = z[:100]
    pdf_kde = gaussian_kde_pdf(z, pts)
    pdf_ln = lognormal_pdf_2d(pts, [0.5, 0.3], [0.01, 0.01])
    assert pdf_kde.shape == (100,)
    # densities agree within KDE smoothing error
    ratio = pdf_kde / pdf_ln
    assert 0.5 < np.median(ratio) < 2.0
    # KLD of a distribution against (a density close to) itself is small
    kld = kld_gaussian_kde(z, lambda p: lognormal_pdf_2d(p, [0.5, 0.3], [0.01, 0.01]))
    assert abs(kld) < 0.5


def test_plots_and_xdmf(tmp_path, cooks_model):
    sol = fea_solution(cooks_model, MaterialCard())
    fig = plot_deformed_mesh(cooks_model, sol.u, mag=1.0, path=str(tmp_path / "mesh.png"))
    assert os.path.exists(tmp_path / "mesh.png")
    vm = von_mises_field(cooks_model, sol)
    assert vm.shape == (200,)
    assert np.all(vm > 0)
    write_xdmf(str(tmp_path / "out.h5"), cooks_model, [np.zeros_like(np.asarray(sol.u)), np.asarray(sol.u)])
    assert os.path.exists(tmp_path / "out.h5")
    assert os.path.exists(tmp_path / "out.xdmf")
    import h5py

    with h5py.File(tmp_path / "out.h5") as f:
        assert f["topology"].shape == (200, 4)
        assert f["step1"].shape == (231, 2)


def test_1d_pdf_plot_family(tmp_path):
    from vbicm_tpu.eval.postprocess import (
        lognormal_pdf_1d,
        normal_pdf_1d,
        plot_pdf_comparison_1d,
    )

    rng = np.random.default_rng(0)
    logz = rng.normal(size=8000) * 0.2 + 0.5
    z = np.exp(logz)
    pts = np.linspace(z.min(), z.max(), 200)
    pdf_ln = lognormal_pdf_1d(pts, 0.5, 0.04)
    # lognormal density integrates to ~1 over the support
    np.testing.assert_allclose(np.trapezoid(pdf_ln, pts), 1.0, atol=0.02)
    pdf_n = normal_pdf_1d(pts, float(z.mean()), float(z.var()))
    fig = plot_pdf_comparison_1d(
        pts, {"VI lognormal": pdf_ln, "Gaussian fit": pdf_n},
        samples=z, path=str(tmp_path / "pdf1d.png"),
    )
    import os

    assert os.path.exists(tmp_path / "pdf1d.png")


def test_comparison_mc_samples_and_fields():
    """eval.comparison: MC z-samples, KLD maps, and mean/sig fields on a
    tiny model — shapes, finiteness, and the self-consistency property that
    the 'reference' fields (MC through the same posterior) agree with the
    classical fields when classical == proposed posterior."""
    from vbicm_tpu.eval import comparison as cmp
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model

    model = build_fem_model(cooks_membrane_mesh(6, 3))
    from vbicm_tpu.config import ProblemConfig
    import dataclasses

    cfg = dataclasses.replace(ProblemConfig(), node_id=model.nnodes, ele_id=5)
    fh = make_fh_fun(model, cfg)
    batch_fh = jax.jit(jax.vmap(fh))
    batch_h = lambda th: batch_fh(th)[1]

    n_y, num_sam = 9, 24
    rng = np.random.default_rng(0)
    tm = rng.normal(size=(n_y, 2)) * 0.3
    tsg = np.full((n_y, 2), 0.04)
    key = jax.random.PRNGKey(0)

    z = cmp.mc_z_samples(key, batch_h, tm, tsg, 3e-3, num_sam)
    assert z.shape == (n_y, num_sam, 2) and np.isfinite(z).all()

    # lognormal moments roughly matching the MC push
    lz = np.log(np.clip(z, 1e-12, None))
    zm, zs = lz.mean(axis=1), np.maximum(lz.var(axis=1), 1e-6)

    fields = cmp.mean_sig_fields(key, batch_h, (tm, tsg, zm, zs), (tm, tsg),
                                 3e-3, num_sam)
    for name in ("proposed", "classical", "reference"):
        m, s = fields[name]
        assert m.shape == (n_y, 2) and np.isfinite(m).all()
        assert s.shape == (n_y, 2) and np.isfinite(s).all()
    # classical and reference use the SAME posterior here -> same
    # distribution; means agree to MC error
    m_c, _ = fields["classical"]
    m_r, _ = fields["reference"]
    np.testing.assert_allclose(m_c, m_r, rtol=0.2, atol=0.02)

    rel = cmp.relative_error_fields(fields)
    assert np.isfinite(rel["proposed"][0]).all()

    y_data = rng.normal(size=(n_y, 2)) * 0.05
    kld_p, kld_c = cmp.kld_maps(key, batch_h, y_data, (tm, tsg, zm, zs),
                                (tm, tsg), 3e-3, num_sam)
    assert kld_p.shape == (n_y,) and np.isfinite(kld_p).all()
    assert kld_c.shape == (n_y,) and np.isfinite(kld_c).all()


def test_comparison_grid_densities():
    from vbicm_tpu.eval import comparison as cmp

    rng = np.random.default_rng(1)
    z_sam = np.exp(rng.normal(size=(500, 2)) * 0.2 + np.log(0.25))
    gd = cmp.classical_grid_density(z_sam, mf=3.0, num_points=40)
    assert gd.pdf.shape == (40, 40) and gd.pdf.min() >= 0.0
    gd2 = cmp.proposed_grid_density(np.log([0.25, 0.25]), [0.04, 0.04],
                                    mf=3.0, num_points=40)
    # densities roughly integrate to 1 over their grids
    for g in (gd, gd2):
        dx = g.xg[0, 1] - g.xg[0, 0]
        dy = g.yg[1, 0] - g.yg[0, 0]
        total = g.pdf.sum() * dx * dy
        assert 0.6 < total < 1.1, total
    # cross-evaluate KDE on the proposed grid
    pdf_x = cmp.kde_on_grid(z_sam, gd2)
    assert pdf_x.shape == gd2.pdf.shape


def test_mass_matrix_and_modal_analysis():
    """Consistent mass (reference dynamics card, dormant there): total mass
    is exact, rigid-translation property holds, and the fundamental
    longitudinal frequency of a slender fixed-free bar matches the rod
    formula f1 = (pi/2L) sqrt(E/rho) to a few percent."""
    import dataclasses

    from vbicm_tpu.mesh.feap import MeshData
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.eval.modal import assemble_mass, natural_frequencies
    from vbicm_tpu.config import SectionCard

    # slender rectangular bar: L=10, H=0.5, fixed at x=0, plane stress
    L, H, nx, ny = 10.0, 0.5, 40, 2
    xs = np.linspace(0, L, nx + 1)
    ys = np.linspace(0, H, ny + 1)
    X, Y = np.meshgrid(xs, ys)
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)
    conn = []
    for r in range(ny):
        for c in range(nx):
            n0 = r * (nx + 1) + c
            conn.append((n0, n0 + 1, n0 + nx + 2, n0 + nx + 1))
    conn = np.array(conn, dtype=np.int32)
    bc = np.arange(ny + 1, dtype=np.int32) * (nx + 1)
    mesh = MeshData(
        coords=coords, conn=conn,
        bc_nodes=bc, bc_flags=np.ones((ny + 1, 2), dtype=np.int32),
        load_nodes=np.array([nx], dtype=np.int32), load_vals=np.array([[1.0, 0.0]]),
        disp_nodes=np.zeros((0,), dtype=np.int32), disp_vals=np.zeros((0, 2)),
        space_dim=2, max_node_dof=2, max_ele_node=4,
    )
    thk = 1.0
    model = build_fem_model(mesh, SectionCard(stype=1, thk=thk), with_mass=True)

    # total mass: sum over x-x block of M equals rho * V (use full dofs)
    rho = 2.5
    me = rho * np.asarray(model.me_unit)
    total = me[:, 0::2, 0::2].sum()
    np.testing.assert_allclose(total, rho * L * H * thk, rtol=1e-12)

    E, v = 20.0, 0.0  # nu=0 isolates the 1-D rod behavior
    w, phi = natural_frequencies(model, E=E, v=v, density=rho, n_modes=6)
    # rod modes: w_k = (2k-1) pi/(2L) sqrt(E/rho); transverse bending modes
    # are lower, so search the computed spectrum for the rod fundamental
    w_rod = np.pi / (2 * L) * np.sqrt(E / rho)
    rel = np.abs(w / w_rod - 1.0)
    assert rel.min() < 0.02, (w, w_rod)


def test_hmc_standard_normal_and_efficiency():
    """HMC recovers N(0, I), adaptation lands near target acceptance, and
    per-GRADIENT-evaluation ESS beats random-walk by a wide margin (the
    point of using the FEM adjoint in the sampler)."""
    from vbicm_tpu.eval.mcmc import hmc

    logpost = lambda th: -0.5 * jnp.sum(th**2)
    res = hmc(
        jax.random.PRNGKey(0), logpost, d=2, n_samples=1500, burn=300,
        n_chains=8, step_size=1.0, n_leapfrog=8,
    )
    s = res.samples.reshape(-1, 2)
    assert res.accept_rate > 0.55, res.accept_rate
    np.testing.assert_allclose(s.mean(axis=0), 0.0, atol=0.08)
    np.testing.assert_allclose(s.std(axis=0), 1.0, atol=0.08)
    assert np.all(res.rhat < 1.02), res.rhat
    # efficiency: gradient guidance + step-size jitter give near-IID
    # draws — ESS a large fraction of N where random-walk manages ~10%
    # per kept draw. (Per-gradient cost the two tie on an easy isotropic
    # 2-D target; HMC's per-evaluation edge appears on correlated/scale-
    # separated posteriors, which is why it exists here at all.)
    n_total = 1500 * 8
    assert res.ess.min() > 0.25 * n_total, res.ess
    rw = metropolis(
        jax.random.PRNGKey(1), logpost, d=2, n_samples=1500, burn=300,
        n_chains=8, step_size=1.0,
    )
    assert res.ess.min() > 2.0 * rw.ess.min(), (res.ess, rw.ess)


def test_hmc_fem_posterior_matches_metropolis(cooks_model):
    """HMC through the FEM adjoint and RW-Metropolis agree on the
    posterior of the identified parameter."""
    from vbicm_tpu.eval.mcmc import hmc

    fh = make_fh_fun(cooks_model)
    theta_true = jnp.array([0.8, 0.2])
    y_clean, _ = fh(theta_true)
    logpost = make_fem_logpost(fh, y_clean, sig_e=1e-2)
    h = hmc(
        jax.random.PRNGKey(3), logpost, d=2, n_samples=400, burn=200,
        n_chains=4, step_size=0.3, n_leapfrog=6,
    )
    m = metropolis(
        jax.random.PRNGKey(4), logpost, d=2, n_samples=800, burn=300,
        n_chains=4, step_size=0.3,
    )
    hs = h.samples.reshape(-1, 2)
    ms = m.samples.reshape(-1, 2)
    assert h.accept_rate > 0.4
    tol = 5 * (h.mean_mcse() + m.mean_mcse())
    assert abs(hs[:, 0].mean() - ms[:, 0].mean()) < max(tol[0], 0.15)
    assert 0.5 < hs[:, 0].std() / ms[:, 0].std() < 2.0


@pytest.mark.slow
def test_comparison_pipeline_all_posterior_families():
    """The comparison surfaces (kld_maps / mean_sig_fields) run for every
    posterior family — meanfield, fullcov, flow — through the
    family-agnostic ``TwoStepTrainer.theta_sampler`` hook (the reference
    pipeline, ``main_postprocess.py:65-78``, supports only its mean-field
    family)."""
    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.eval import comparison as cmp
    from vbicm_tpu.prob.analytic import (
        f_fun_2d_case3,
        generate_data_2d_case3,
        h_fun_2d_case3,
    )
    from vbicm_tpu.vi.train import TwoStepTrainer

    def fh(th):
        return f_fun_2d_case3(th), h_fun_2d_case3(th)

    batch_h = lambda th: jax.vmap(fh)(th)[1]
    ds = generate_data_2d_case3(jax.random.PRNGKey(0), 32)
    cfg = ProblemConfig(theta_dim=2, y_dim=2, z_dim=2, sig_e=0.1**2,
                        sig_eta=0.01**2)
    n_y, num_sam = 6, 16
    y_eval = np.asarray(ds.y_data[:n_y])
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(0)
    tm_c = rng.normal(size=(n_y, 2)) * 0.3  # classical stand-in
    tsg_c = np.full((n_y, 2), 0.04)

    for fam in ("meanfield", "fullcov", "flow"):
        tcfg = TrainConfig(batch_size=16, num_epoch1=2, num_epoch2=2,
                           pairing="per_sample", posterior=fam)
        tr = TwoStepTrainer(None, cfg, tcfg, fh=fh)
        res = tr.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(1))
        tm, tsg, zm, zs = tr.predict(res.theta_params, res.z_params, y_eval)
        zs = np.maximum(np.asarray(zs), 1e-6)
        sampler = tr.theta_sampler(res.theta_params, y_eval)
        th = sampler(key, num_sam)
        assert th.shape == (n_y, num_sam, 2) and np.isfinite(
            np.asarray(th)).all()

        fields = cmp.mean_sig_fields(
            key, batch_h, (np.asarray(tm), np.asarray(tsg), np.asarray(zm),
                           zs), (tm_c, tsg_c), cfg.sig_eta, num_sam,
            proposed_sampler=sampler)
        for name in ("proposed", "classical", "reference"):
            m, s = fields[name]
            assert m.shape == (n_y, 2) and np.isfinite(m).all(), (fam, name)

        kld_p, kld_c = cmp.kld_maps(
            key, batch_h, y_eval, (np.asarray(tm), np.asarray(tsg),
                                   np.asarray(zm), zs), (tm_c, tsg_c),
            cfg.sig_eta, num_sam, proposed_sampler=sampler)
        assert kld_p.shape == (n_y,) and np.isfinite(kld_p).all(), fam
        assert kld_c.shape == (n_y,) and np.isfinite(kld_c).all(), fam
