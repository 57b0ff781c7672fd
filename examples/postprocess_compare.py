"""Three-way model comparison — the reference's ``main_postprocess.py``
evaluation: proposed (two-step lognormal net) vs classical method-1
(one-step posterior net + MC push) vs the MCMC/MC reference, producing

  * pdf overlays at a probe y (``plot_2d_pdf_case4_method1/proposed``,
    ``src/postprocess_lib.py:990-1084``) + scalar KLDs,
  * conditional-KLD maps over a y-grid (``plot_2d_nonlinear_kld_case4``,
    ``:1170-1218``),
  * z mean/variance fields + relative errors
    (``plot_2d_nonlinear_mean_sig_case4``, ``:1220-1380``) — with REAL
    reference fields (docs/DIVERGENCES.md: the reference fabricates them
    by scaling the proposed output x1.015).

Models can come from our training results (``--proposed results_dir`` with
step1/step2 latest.msgpack) or directly from the reference's shipped Keras
checkpoints (``--proposed reference``), since eval/reference_ckpt.py loads
those into the same flax nets.
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import argparse
import json
import os

import numpy as np


def _load_models(src, trainer, theta_net, z_net, th0, z0, ref_root):
    """Return (theta_params, z_params|None) from a results dir or 'reference'."""
    import glob

    from vbicm_tpu.eval.reference_ckpt import load_theta_params, load_z_params

    if src == "reference":
        step1 = sorted(glob.glob(os.path.join(ref_root, "step1", "19-*.h5")))[0]
        tp = load_theta_params(step1)
        z2 = os.path.join(ref_root, "step2", "final_model_step2.h5")
        zp = load_z_params(z2) if os.path.exists(z2) else None
        return tp, zp
    if src == "reference_method1":
        tp = load_theta_params(os.path.join(os.path.dirname(ref_root), "results_method1",
                                            "final_model_step1.keras"))
        return tp, None
    # plain msgpack load from an arbitrary results dir
    from vbicm_tpu.utils.checkpoint import load_msgpack

    tp = load_msgpack(os.path.join(src, "step1", "latest.msgpack"),
                      {"params": th0, "opt_state": trainer._opt_step1().init(th0),
                       "epoch": 0, "hist": np.zeros(0)})["params"]
    z_path = os.path.join(src, "step2", "latest.msgpack")
    zp = None
    if os.path.exists(z_path):
        zp = load_msgpack(z_path, {"params": z0,
                                   "opt_state": trainer._opt_step2().init(z0),
                                   "epoch": 0, "hist": np.zeros(0)})["params"]
    return tp, zp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proposed", default="reference",
                    help="results dir with step1/step2 msgpack, or 'reference'")
    ap.add_argument("--method1", default="reference_method1",
                    help="results dir (step1 only), or 'reference_method1'")
    ap.add_argument("--ref-root", default="/root/reference/results_2steps_proposed1")
    ap.add_argument("--dataset", default="/root/reference/data_fem_test_big_noise.h5")
    ap.add_argument("--out", default="results_compare")
    ap.add_argument("--probe-y", type=float, nargs=2, default=[0.1, 0.1])
    ap.add_argument("--num-points", type=int, default=20, help="y-grid side (KLD/fields)")
    ap.add_argument("--num-sam", type=int, default=50, help="MC samples per y (fields)")
    ap.add_argument("--kld-sam", type=int, default=10, help="MC samples per y (KLD maps)")
    ap.add_argument("--pdf-sam", type=int, default=1000)
    ap.add_argument("--mcmc-sam", type=int, default=2000)
    args = ap.parse_args()

    import vbicm_tpu

    vbicm_tpu.enable_x64()
    vbicm_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.eval import comparison as cmp
    from vbicm_tpu.eval.mcmc import make_fem_logpost, metropolis, posterior_predictive_z
    from vbicm_tpu.eval.postprocess import kld_gaussian_kde, lognormal_pdf_2d
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.models.mlp import init_vi_networks
    from vbicm_tpu.prob.datagen import load_dataset
    from vbicm_tpu.solver import make_fh_fun
    from vbicm_tpu.vi.train import TwoStepTrainer

    os.makedirs(args.out, exist_ok=True)
    model = build_fem_model(cooks_membrane_mesh(20, 10))
    cfg = ProblemConfig()
    fh = make_fh_fun(model, cfg, factor_dtype=jnp.float32, refine_iters=1)
    batch_fh = jax.jit(jax.vmap(fh))
    batch_h = lambda th: batch_fh(th)[1]

    theta_net, th0, z_net, z0 = init_vi_networks(jax.random.PRNGKey(0))
    trainer = TwoStepTrainer(model, cfg, TrainConfig(), results_path=None)
    trainer_stub = trainer  # only used for optimizer templates

    tp_prop, zp_prop = _load_models(args.proposed, trainer_stub, theta_net, z_net,
                                    th0, z0, args.ref_root)
    tp_cla, _ = _load_models(args.method1, trainer_stub, theta_net, z_net,
                             th0, z0, args.ref_root)
    if zp_prop is None:
        raise SystemExit("proposed model has no step-2 (z) parameters")
    print(f"proposed={args.proposed}  method1={args.method1}")

    ds = load_dataset(args.dataset)
    y_mean = ds.y_data.mean(axis=0)
    y_var = ds.y_data.var(axis=0)
    summary = {}

    # ---------- pdf overlays + scalar KLDs at the probe y ----------
    y0 = np.array([args.probe_y])
    tm_p, tsg_p, _ = theta_net.apply(tp_prop, jnp.asarray(y0))
    zm_p, zs_p, _ = z_net.apply(zp_prop, jnp.asarray(y0))
    tm_c, tsg_c, _ = theta_net.apply(tp_cla, jnp.asarray(y0))

    key = jax.random.PRNGKey(42)
    k_cla, k_mcmc, k_pp = jax.random.split(key, 3)
    z_cla = cmp.mc_z_samples(k_cla, batch_h, np.asarray(tm_c),
                             np.asarray(tsg_c), cfg.sig_eta, args.pdf_sam)[0]

    # MCMC reference posterior-predictive at y0 (real chains, not KDE-of-VI)
    logpost = make_fem_logpost(fh, jnp.asarray(y0[0]), cfg.sig_e)
    chains = metropolis(k_mcmc, logpost, n_chains=8,
                        n_samples=args.mcmc_sam, burn=500, step_size=0.25)
    theta_mc = np.asarray(chains.samples.reshape(-1, 2))[:: max(1, (8 * args.mcmc_sam) // 4000)]
    z_mc = np.asarray(
        posterior_predictive_z(k_pp, batch_fh, jnp.asarray(theta_mc), cfg.sig_eta)
    )

    grid = cmp.proposed_grid_density(np.asarray(zm_p)[0], np.asarray(zs_p)[0],
                                     mf=4.0, num_points=200)
    pdf_cla = cmp.kde_on_grid(z_cla, grid)
    pdf_mc = cmp.kde_on_grid(z_mc, grid)

    fig, axes = plt.subplots(1, 3, figsize=(14, 4), constrained_layout=True)
    vmax = pdf_mc.max()
    for ax, (name, pdf) in zip(
        axes, [("MCMC reference", pdf_mc), ("proposed (lognormal net)", grid.pdf),
               ("classical method-1 (MC+KDE)", pdf_cla)]
    ):
        c = ax.pcolormesh(grid.xg, grid.yg, pdf, cmap="viridis", vmin=0.0,
                          vmax=vmax, shading="gouraud")
        ax.set_title(name)
        ax.set_xlabel("$z_1$")
        ax.set_ylabel("$z_2$")
        fig.colorbar(c, ax=ax)
    fig.suptitle(f"p(z | y={args.probe_y}) — three-way comparison")
    fig.savefig(f"{args.out}/pdf_comparison_case4.png", dpi=120)
    plt.close(fig)

    kld_prop = kld_gaussian_kde(
        z_mc, lambda p: lognormal_pdf_2d(p, np.asarray(zm_p)[0], np.asarray(zs_p)[0])
    )
    from scipy import stats as sstats

    kde_cla = sstats.gaussian_kde(z_cla.T)
    kld_cla = kld_gaussian_kde(z_mc, lambda p: kde_cla(p.T))
    summary["probe_kld_mcmc_vs_proposed"] = float(kld_prop)
    summary["probe_kld_mcmc_vs_classical"] = float(kld_cla)
    print(f"KLD(MCMC || proposed) = {kld_prop:.4f}")
    print(f"KLD(MCMC || classical) = {kld_cla:.4f}")

    # ---------- conditional-KLD maps over the y-grid ----------
    y_grid_pts, g1, g2 = cmp.y_grid(y_mean, y_var, mf=4.0, num_points=args.num_points)
    tm_pg, tsg_pg, _ = theta_net.apply(tp_prop, jnp.asarray(y_grid_pts))
    zm_pg, zs_pg, _ = z_net.apply(zp_prop, jnp.asarray(y_grid_pts))
    tm_cg, tsg_cg, _ = theta_net.apply(tp_cla, jnp.asarray(y_grid_pts))
    kld_p_map, kld_c_map = cmp.kld_maps(
        jax.random.PRNGKey(3), batch_h, y_grid_pts,
        (tm_pg, tsg_pg, zm_pg, zs_pg), (tm_cg, tsg_cg),
        cfg.sig_eta, args.kld_sam,
    )
    fig, axes = plt.subplots(1, 2, figsize=(10, 4), constrained_layout=True)
    vmax = max(kld_p_map.max(), 1e-12)
    for ax, (name, m) in zip(axes, [("proposed", kld_p_map), ("classical", kld_c_map)]):
        c = ax.pcolormesh(g1, g2, m.reshape(args.num_points, args.num_points),
                          cmap="viridis", vmin=0.0, vmax=vmax, shading="gouraud")
        ax.set_xlabel("$y_1$")
        ax.set_ylabel("$y_2$")
        ax.set_title(f"KLD map — {name}")
        fig.colorbar(c, ax=ax)
    fig.savefig(f"{args.out}/kld_maps_case4.png", dpi=120)
    plt.close(fig)
    summary["kld_map_mean_proposed"] = float(np.mean(kld_p_map))
    summary["kld_map_mean_classical"] = float(np.mean(kld_c_map))
    print(f"mean conditional KLD over y-grid: proposed {np.mean(kld_p_map):.4f}, "
          f"classical {np.mean(kld_c_map):.4f}")

    # ---------- mean / variance fields + relative errors ----------
    fields = cmp.mean_sig_fields(
        jax.random.PRNGKey(4), batch_h,
        (tm_pg, tsg_pg, zm_pg, zs_pg), (tm_cg, tsg_cg),
        cfg.sig_eta, args.num_sam,
    )
    rel = cmp.relative_error_fields(fields)
    nP = args.num_points
    for stat_i, stat_name in ((0, "mean"), (1, "sig")):
        fig, axes = plt.subplots(2, 3, figsize=(13, 7), constrained_layout=True)
        ref_f = fields["reference"][stat_i]
        for col, name in enumerate(("proposed", "classical", "reference")):
            f = fields[name][stat_i]
            for row in range(2):
                c = axes[row, col].pcolormesh(
                    g1, g2, f[:, row].reshape(nP, nP), cmap="viridis",
                    vmin=ref_f[:, row].min(), vmax=ref_f[:, row].max(),
                    shading="gouraud")
                axes[row, col].set_title(f"z{row+1} {stat_name} — {name}")
                axes[row, col].set_xlabel("$y_1$")
                axes[row, col].set_ylabel("$y_2$")
                fig.colorbar(c, ax=axes[row, col])
        fig.savefig(f"{args.out}/{stat_name}_fields_case4.png", dpi=120)
        plt.close(fig)

        fig, axes = plt.subplots(2, 2, figsize=(9, 7), constrained_layout=True)
        for col, name in enumerate(("proposed", "classical")):
            e = rel[name][stat_i]
            for row in range(2):
                vmax_e = max(rel["classical"][stat_i][:, row].max(), 1e-12)
                c = axes[row, col].pcolormesh(
                    g1, g2, e[:, row].reshape(nP, nP), cmap="viridis",
                    vmin=0.0, vmax=vmax_e, shading="gouraud")
                axes[row, col].set_title(f"z{row+1} {stat_name} rel err — {name}")
                fig.colorbar(c, ax=axes[row, col])
        fig.savefig(f"{args.out}/rel_err_{stat_name}_case4.png", dpi=120)
        plt.close(fig)
        for name in ("proposed", "classical"):
            summary[f"rel_err_{stat_name}_{name}_mean"] = float(rel[name][stat_i].mean())
            summary[f"rel_err_{stat_name}_{name}_max"] = float(rel[name][stat_i].max())

    with open(f"{args.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.out}/ (5 plot files + summary.json)")
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
