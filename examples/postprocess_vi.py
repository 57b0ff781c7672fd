"""Postprocess / evaluation driver — reference `main_postprocess.py`
equivalent: loads (or quickly trains) a VI model, then produces

  * deformed-mesh plot + XDMF export (fem_test.py postprocess stack),
  * VI predictive density vs MCMC posterior-predictive density heatmaps
    (the reference's plot_2d_pdf_more_loss_mcmc, case 4),
  * a KLD(MCMC || VI) summary number.

Unlike the reference, the "reference curves" here are REAL MCMC output
(see docs/DIVERGENCES.md #7).
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_postprocess")
    ap.add_argument("--quick-train-epochs", type=int, default=40)
    ap.add_argument("--n-data", type=int, default=512)
    ap.add_argument("--mcmc-samples", type=int, default=2000)
    args = ap.parse_args()

    import vbicm_tpu

    vbicm_tpu.enable_x64()
    import jax
    import jax.numpy as jnp

    from vbicm_tpu.config import MaterialCard, ProblemConfig, TrainConfig
    from vbicm_tpu.eval.mcmc import make_fem_logpost, metropolis, posterior_predictive_z
    from vbicm_tpu.eval.postprocess import (
        gaussian_kde_pdf,
        kld_gaussian_kde,
        lognormal_pdf_2d,
        plot_deformed_mesh,
    )
    from vbicm_tpu.eval.xdmf import write_xdmf
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.prob.datagen import generate_data_fem
    from vbicm_tpu.solver import fea_solution, make_fh_fun
    from vbicm_tpu.vi.train import TwoStepTrainer

    os.makedirs(args.out, exist_ok=True)
    model = build_fem_model(cooks_membrane_mesh(20, 10))
    cfg = ProblemConfig()

    # --- forward postprocess (fem_test.py stack) ----------------------
    sol = fea_solution(model, MaterialCard())
    plot_deformed_mesh(model, sol.u, mag=1.0, path=f"{args.out}/deformed_shape.png")
    write_xdmf(f"{args.out}/xdmf_topology.h5", model, [np.asarray(sol.u)])
    print(f"wrote {args.out}/deformed_shape.png and XDMF export")

    # --- quick VI train + MCMC comparison -----------------------------
    fh = make_fh_fun(model, cfg)
    batch_fh = jax.jit(jax.vmap(fh))
    ds = generate_data_fem(
        jax.random.PRNGKey(0), batch_fh, n_sam=args.n_data, ne_sam=8
    )
    tcfg = TrainConfig(
        batch_size=64,
        num_epoch1=args.quick_train_epochs,
        num_epoch2=args.quick_train_epochs,
        pairing="per_sample",
    )
    trainer = TwoStepTrainer(model, cfg, tcfg, verbose=False)
    res = trainer.fit(ds.y_data, ds.e_data, jax.random.PRNGKey(1))

    y_test = ds.y_data[1]
    tm, tsig, zm, zs = trainer.predict(res.theta_params, res.z_params, y_test[None])
    zm, zs = np.asarray(zm)[0], np.asarray(zs)[0]

    logpost = make_fem_logpost(fh, y_test, cfg.sig_e)
    mc = metropolis(
        jax.random.PRNGKey(2), logpost, d=2,
        n_samples=args.mcmc_samples // 8, burn=400, n_chains=8, step_size=0.6,
    )
    theta_s = mc.samples.reshape(-1, 2)
    z_mc = posterior_predictive_z(jax.random.PRNGKey(3), batch_fh, theta_s, cfg.sig_eta)

    # density grids around the VI predictive (reference plotting ranges)
    mf = 3.0
    xs = np.linspace(np.exp(zm[0] - mf * np.sqrt(zs[0])), np.exp(zm[0] + mf * np.sqrt(zs[0])), 80)
    ys = np.linspace(np.exp(zm[1] - mf * np.sqrt(zs[1])), np.exp(zm[1] + mf * np.sqrt(zs[1])), 80)
    XG, YG = np.meshgrid(xs, ys)
    pts = np.stack([XG.ravel(), YG.ravel()], axis=1)
    pdf_mcmc = gaussian_kde_pdf(z_mc, pts).reshape(XG.shape)
    pdf_vi = lognormal_pdf_2d(pts, zm, zs).reshape(XG.shape)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5), sharex=True, sharey=True)
    for ax, pdf, title in [
        (axes[0], pdf_mcmc, "MCMC posterior predictive (reference)"),
        (axes[1], pdf_vi, "VI lognormal predictive"),
    ]:
        c = ax.pcolormesh(XG, YG, pdf, shading="gouraud", vmin=0, vmax=pdf_mcmc.max())
        ax.set_xlabel("z1 (von Mises @ qpt 1)")
        ax.set_title(title)
        fig.colorbar(c, ax=ax)
    axes[0].set_ylabel("z2 (von Mises @ qpt 3)")
    fig.savefig(f"{args.out}/prediction_pdf.png", dpi=150, bbox_inches="tight")

    kld = kld_gaussian_kde(z_mc, lambda p: lognormal_pdf_2d(p, zm, zs))
    print(f"VI predictive moments: mean {zm}, var {zs}")
    print(f"MCMC predictive log-z mean: {np.log(z_mc).mean(axis=0)}")
    print(f"KLD(MCMC || VI) = {kld:.4f}")
    print(f"wrote {args.out}/prediction_pdf.png")


if __name__ == "__main__":
    main()
