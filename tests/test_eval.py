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
    """Sampler recovers N(0, I) moments on an analytic target."""
    logpost = lambda th: -0.5 * jnp.sum(th**2)
    res = metropolis(
        jax.random.PRNGKey(0), logpost, d=2, n_samples=4000, burn=500, n_chains=8,
        step_size=1.0,
    )
    s = res.samples.reshape(-1, 2)
    assert 0.1 < res.accept_rate < 0.9
    np.testing.assert_allclose(s.mean(axis=0), 0.0, atol=0.05)
    np.testing.assert_allclose(s.std(axis=0), 1.0, atol=0.05)


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
