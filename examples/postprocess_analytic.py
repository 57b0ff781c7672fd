"""Case-1/2/3 evaluation parity: the analytic-case slice of the reference's
postprocess layer (``src/postprocess_lib.py:28-988``), rebuilt with REAL
references.

Per case this script trains the two-step VI (proposed) and the one-step
classical method-1 baseline on the closed-form forward maps
(``prob/analytic.py``), then produces the reference's artifact families:

  * predictive-PDF overlays at probe y's — proposed (parametric) vs
    classical (MC push + KDE) vs the EXACT conditional by dense theta
    quadrature (``eval/analytic_ref.py``; the reference's own case-1
    "reference" curve has a broken variance formula and its case-1
    classical KLD pushes through the case-2 h_fun — see DIVERGENCES);
  * KLD-vs-y curves (cases 1/2) / KLD maps (case 3) against the exact
    conditional;
  * predictive mean/std curves (fields for case 3) + relative errors;
  * summary.json with the scalar diagnostics.

Outputs to ``results_compare_analytic/case{1,2,3}/``.

Usage: python examples/postprocess_analytic.py [--cases 1 2 3] [--epochs 120]
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--n-data", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--out", default="results_compare_analytic")
    ap.add_argument("--pdf-sam", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the JAX_PLATFORMS env var "
                         "is overridden by the axon sitecustomize)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from scipy import stats as sstats

    from vbicm_tpu.config import ProblemConfig, TrainConfig
    from vbicm_tpu.eval import analytic_ref as aref
    from vbicm_tpu.prob import analytic as ana
    from vbicm_tpu.vi.train import TwoStepTrainer

    SIG_E, SIG_ETA = 0.1, 3e-3
    TGRID = np.linspace(-6.0, 6.0, 4001)

    import dataclasses

    def train_case(fh, ds, *, lognormal: bool, lr=1e-3, dim=1, epochs=None):
        """(trainer, theta_params, z_params): step 1 per-sample pairing,
        step 2 pure moment matching (alpha=0) on lognormal (log-z) or
        Gaussian (direct-z) bridge targets."""
        ep = epochs or args.epochs
        tcfg = TrainConfig(batch_size=256, num_epoch1=ep, num_epoch2=ep,
                           pairing="per_sample", lr=lr, alpha=0.0,
                           lr_decay_mode="fixed", lr_patience=40)
        cfgP = dataclasses.replace(
            ProblemConfig(), theta_dim=dim, y_dim=dim, z_dim=dim)
        # frozen input standardization: case-2/3 observations span decades
        # (y1 up to ~30); raw inputs stall the 20-neuron amortized nets
        tr = TwoStepTrainer(None, cfgP, tcfg, fh=fh,
                            y_norm=(ds.y_mean, ds.y_std))
        key = jax.random.PRNGKey(args.seed)
        k1, k2, k3 = jax.random.split(key, 3)
        tp, h1 = tr.train_step1(ds.y_data, ds.e_data, k1)
        if lognormal:
            lm, ls = tr.bridge(ds.y_data, ds.e_data, tp, k2)
        else:
            # direct-z (Gaussian) bridge moments for cases whose z can be
            # negative: same sweep as bridge() without the log
            y = jnp.asarray(ds.y_data)
            e = jnp.asarray(ds.e_data)
            tm, tsg, _ = tr.theta_net.apply(tp, y)
            th = e[None, :, :] * jnp.sqrt(tsg)[:, None, :] + tm[:, None, :]
            th = th.reshape(-1, th.shape[-1])
            _, h = jax.jit(tr._batch_fh)(th)
            h = h.reshape(y.shape[0], e.shape[0], -1)
            eta = jnp.sqrt(SIG_ETA) * jax.random.normal(k2, (e.shape[0], h.shape[-1]))
            z = h + eta[None, :, :]
            lm, ls = np.asarray(z.mean(axis=1)), np.asarray(z.var(axis=1))
        zp, h2 = tr.train_step2(ds.y_data, ds.e_data, tp, lm, ls, k3)
        return tr, tp, zp, float(h1[-1]), float(h2[-1])

    def classical_pdf(tr, tp, y0, h_fun, key, z_grid):
        """Method-1: MC theta from q, push through h, add eta, KDE."""
        tm, tsg, _ = tr.theta_net.apply(tp, jnp.asarray(y0)[None])
        th = (np.sqrt(np.asarray(tsg)[0]) * np.random.default_rng(key).standard_normal(
            (args.pdf_sam, tm.shape[-1])) + np.asarray(tm)[0])
        z = np.asarray(h_fun(jnp.asarray(th))) + np.sqrt(SIG_ETA) * \
            np.random.default_rng(key + 1).standard_normal((args.pdf_sam, tm.shape[-1]))
        pdfs = []
        for j in range(z.shape[1]):
            pdfs.append(sstats.gaussian_kde(z[:, j])(z_grid[j]))
        return z, pdfs

    os.makedirs(args.out, exist_ok=True)

    # ================= case 1: 1-D linear (everything closed-form) ========
    if 1 in args.cases:
        print("== case 1 (1-D linear)")
        d = os.path.join(args.out, "case1")
        os.makedirs(d, exist_ok=True)
        summary = {}

        def fh1(th):
            return ana.f_fun_1d_case1(th), ana.h_fun_1d_case1(th)

        ds = ana._analytic_dataset(
            jax.random.PRNGKey(args.seed), ana.f_fun_1d_case1,
            ana.h_fun_1d_case1, args.n_data, 1, SIG_E, SIG_ETA, 8)
        tr, tp, zp, l1, l2 = train_case(fh1, ds, lognormal=False, dim=1)
        summary["loss_step1"], summary["loss_step2"] = l1, l2

        # closed forms: theta|y = N(2y/(4+se), 1/(1+4/se)); z = 3 theta + eta
        s2p = 1.0 / (1.0 + 4.0 / SIG_E)
        probe_ys = [-2.0, 0.0, 1.0, 3.0]
        fig, axes = plt.subplots(1, len(probe_ys), figsize=(4 * len(probe_ys), 3.2),
                                 constrained_layout=True)
        kld_p, kld_c = [], []
        for ax, y0 in zip(axes, probe_ys):
            m_true = 6.0 * y0 / (4.0 + SIG_E)
            v_true = 9.0 * s2p + SIG_ETA
            zg = np.linspace(m_true - 5 * np.sqrt(v_true), m_true + 5 * np.sqrt(v_true), 600)
            pdf_true = aref.gaussian_pdf_grid(zg, m_true, v_true)
            # quadrature agrees with the closed form (sanity, recorded)
            pdf_quad = aref.predictive_pdf_1d(
                y0, ana.f_fun_1d_case1, ana.h_fun_1d_case1, SIG_E, SIG_ETA, TGRID, zg)
            summary.setdefault("quad_vs_closed_max_abs", 0.0)
            summary["quad_vs_closed_max_abs"] = max(
                summary["quad_vs_closed_max_abs"], float(np.abs(pdf_quad - pdf_true).max()))

            zm, zs, _ = tr.z_net.apply(zp, jnp.asarray([[y0]]))
            pdf_prop = aref.gaussian_pdf_grid(zg, float(zm[0, 0]), float(zs[0, 0]))
            _, (pdf_cla,) = classical_pdf(tr, tp, np.asarray([y0]), ana.h_fun_1d_case1,
                                          args.seed, [zg])
            kld_p.append(aref.kld_gaussian_exact(m_true, v_true,
                                                 float(zm[0, 0]), float(zs[0, 0])))
            kld_c.append(aref.kld_grid(pdf_true, pdf_cla, zg))
            ax.plot(zg, pdf_true, "k-", label="exact")
            ax.plot(zg, pdf_prop, "b--", label="proposed")
            ax.plot(zg, pdf_cla, "r:", label="classical")
            ax.set_title(f"y = {y0}")
            ax.set_xlabel("z")
        axes[0].set_ylabel("p(z|y)")
        axes[0].legend()
        fig.savefig(f"{d}/pdf_overlays.png", dpi=120)
        plt.close(fig)
        summary["probe_ys"] = probe_ys
        summary["kld_exact_vs_proposed"] = kld_p
        summary["kld_exact_vs_classical"] = kld_c

        # KLD + mean/std curves over a y line
        yline = np.linspace(-6, 6, 41)
        zm, zs, _ = tr.z_net.apply(zp, jnp.asarray(yline)[:, None])
        m_true = 6.0 * yline / (4.0 + SIG_E)
        v_true = 9.0 * s2p + SIG_ETA
        kld_line = [aref.kld_gaussian_exact(mt, v_true, float(m), float(v))
                    for mt, m, v in zip(m_true, np.asarray(zm)[:, 0], np.asarray(zs)[:, 0])]
        fig, axes = plt.subplots(1, 3, figsize=(13, 3.2), constrained_layout=True)
        axes[0].plot(yline, kld_line, "b-")
        axes[0].set_xlabel("y"); axes[0].set_ylabel("KL(exact || proposed)")
        axes[1].plot(yline, m_true, "k-", label="exact")
        axes[1].plot(yline, np.asarray(zm)[:, 0], "b--", label="proposed")
        axes[1].set_xlabel("y"); axes[1].set_ylabel("E[z|y]"); axes[1].legend()
        axes[2].plot(yline, np.full_like(yline, np.sqrt(v_true)), "k-")
        axes[2].plot(yline, np.sqrt(np.asarray(zs)[:, 0]), "b--")
        axes[2].set_xlabel("y"); axes[2].set_ylabel("std[z|y]")
        fig.savefig(f"{d}/kld_mean_sig_vs_y.png", dpi=120)
        plt.close(fig)
        summary["kld_line_mean"] = float(np.mean(kld_line))
        summary["mean_rel_err_max"] = float(
            np.max(np.abs(np.asarray(zm)[:, 0] - m_true) / np.maximum(np.abs(m_true), 1e-2)))
        # the reference's own case-1 variance formula drops the h' factor 9
        summary["reference_var_formula"] = SIG_ETA + s2p
        summary["correct_var"] = v_true
        with open(f"{d}/summary.json", "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary, indent=1))

    # ================= case 2: 1-D nonlinear (bimodal posterior) ==========
    if 2 in args.cases:
        print("== case 2 (1-D quadratic/exponential)")
        d = os.path.join(args.out, "case2")
        os.makedirs(d, exist_ok=True)
        summary = {}

        def fh2(th):
            return ana.f_fun_1d_case2(th), ana.h_fun_1d_case2(th)

        ds = ana.generate_data_1d_case2(jax.random.PRNGKey(args.seed), args.n_data,
                                        sig_e=SIG_E, sig_eta=SIG_ETA, ne_sam=8)
        tr, tp, zp, l1, l2 = train_case(fh2, ds, lognormal=True, dim=1)
        summary["loss_step1"], summary["loss_step2"] = l1, l2

        probe_ys = [2.5, 4.0, 6.0]
        fig, axes = plt.subplots(1, len(probe_ys), figsize=(4 * len(probe_ys), 3.2),
                                 constrained_layout=True)
        kld_p, kld_c = [], []
        for ax, y0 in zip(axes, probe_ys):
            me, ve = aref.predictive_moments_1d(
                y0, ana.f_fun_1d_case2, ana.h_fun_1d_case2, SIG_E, SIG_ETA, TGRID)
            zg = np.linspace(max(1e-3, me - 6 * np.sqrt(ve)), me + 6 * np.sqrt(ve), 800)
            pdf_true = aref.predictive_pdf_1d(
                y0, ana.f_fun_1d_case2, ana.h_fun_1d_case2, SIG_E, SIG_ETA, TGRID, zg)
            zm, zs, _ = tr.z_net.apply(zp, jnp.asarray([[y0]]))
            pdf_prop = aref.lognormal_pdf_grid(zg, float(zm[0, 0]), float(zs[0, 0]))
            _, (pdf_cla,) = classical_pdf(tr, tp, np.asarray([y0]), ana.h_fun_1d_case2,
                                          args.seed, [zg])
            # reference's metric direction (KL(q || ref), mode-seeking —
            # src/postprocess_lib.py:487-545 samples FROM the VI model);
            # the coverage direction is recorded alongside: a mean-field q
            # mode-collapses on this symmetric bimodal posterior, so
            # KL(exact || q) is large BY DESIGN of the approximation
            kld_p.append((aref.kld_grid(pdf_prop, pdf_true, zg),
                          aref.kld_grid(pdf_true, pdf_prop, zg)))
            kld_c.append((aref.kld_grid(pdf_cla, pdf_true, zg),
                          aref.kld_grid(pdf_true, pdf_cla, zg)))
            ax.plot(zg, pdf_true, "k-", label="exact (quadrature)")
            ax.plot(zg, pdf_prop, "b--", label="proposed (lognormal)")
            ax.plot(zg, pdf_cla, "r:", label="classical (MC+KDE)")
            ax.set_title(f"y = {y0}")
            ax.set_xlabel("z")
        axes[0].set_ylabel("p(z|y)")
        axes[0].legend()
        fig.savefig(f"{d}/pdf_overlays.png", dpi=120)
        plt.close(fig)
        summary["probe_ys"] = probe_ys
        summary["kld_proposed_vs_exact"] = [k[0] for k in kld_p]
        summary["kld_classical_vs_exact"] = [k[0] for k in kld_c]
        summary["kld_coverage_exact_vs_proposed"] = [k[1] for k in kld_p]
        summary["kld_coverage_exact_vs_classical"] = [k[1] for k in kld_c]

        # mean/std + KLD over the reachable y line (f >= 2)
        yline = np.linspace(2.05, 8.0, 40)
        zm, zs, _ = tr.z_net.apply(zp, jnp.asarray(yline)[:, None])
        m_prop = np.exp(np.asarray(zm)[:, 0] + 0.5 * np.asarray(zs)[:, 0])
        v_prop = (np.exp(np.asarray(zs)[:, 0]) - 1.0) * m_prop**2
        mv = [aref.predictive_moments_1d(y0, ana.f_fun_1d_case2, ana.h_fun_1d_case2,
                                         SIG_E, SIG_ETA, TGRID) for y0 in yline]
        m_true = np.array([x[0] for x in mv]); v_true = np.array([x[1] for x in mv])
        fig, axes = plt.subplots(1, 2, figsize=(9, 3.2), constrained_layout=True)
        axes[0].plot(yline, m_true, "k-", label="exact")
        axes[0].plot(yline, m_prop, "b--", label="proposed")
        axes[0].set_xlabel("y"); axes[0].set_ylabel("E[z|y]"); axes[0].legend()
        axes[1].plot(yline, np.sqrt(v_true), "k-")
        axes[1].plot(yline, np.sqrt(v_prop), "b--")
        axes[1].set_xlabel("y"); axes[1].set_ylabel("std[z|y]")
        fig.savefig(f"{d}/mean_sig_vs_y.png", dpi=120)
        plt.close(fig)
        summary["mean_rel_err_mean"] = float(np.mean(np.abs(m_prop - m_true) / m_true))
        with open(f"{d}/summary.json", "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary, indent=1))

    # ================= case 3: 2-D separable ==============================
    if 3 in args.cases:
        print("== case 3 (2-D)")
        d = os.path.join(args.out, "case3")
        os.makedirs(d, exist_ok=True)
        summary = {}

        def fh3(th):
            return ana.f_fun_2d_case3(th), ana.h_fun_2d_case3(th)

        ds = ana.generate_data_2d_case3(jax.random.PRNGKey(args.seed), args.n_data,
                                        sig_e=SIG_E, sig_eta=SIG_ETA, ne_sam=8)
        tr, tp, zp, l1, l2 = train_case(fh3, ds, lognormal=True, dim=2,
                                        epochs=args.epochs * 5 // 2)
        summary["loss_step1"], summary["loss_step2"] = l1, l2

        # per-coordinate exact conditionals (the case factorizes)
        f1 = lambda t: 2.0 * t**2 + 2.0
        f2 = lambda t: t**4 + t + 1.0
        h1 = lambda t: np.exp(t) + 0.2
        h2 = lambda t: np.exp(t) + 0.1

        y0 = np.array([3.0, 1.5])
        zm, zs, _ = tr.z_net.apply(zp, jnp.asarray(y0)[None])
        fig, axes = plt.subplots(1, 2, figsize=(9, 3.2), constrained_layout=True)
        klds = []
        for j, (ax, fj, hj) in enumerate(zip(axes, (f1, f2), (h1, h2))):
            me, ve = aref.predictive_moments_1d(y0[j], fj, hj, SIG_E, SIG_ETA, TGRID)
            zg = np.linspace(max(1e-3, me - 6 * np.sqrt(ve)), me + 6 * np.sqrt(ve), 800)
            pdf_true = aref.predictive_pdf_1d(y0[j], fj, hj, SIG_E, SIG_ETA, TGRID, zg)
            pdf_prop = aref.lognormal_pdf_grid(zg, float(zm[0, j]), float(zs[0, j]))
            klds.append(aref.kld_grid(pdf_prop, pdf_true, zg))
            ax.plot(zg, pdf_true, "k-", label="exact")
            ax.plot(zg, pdf_prop, "b--", label="proposed")
            ax.set_xlabel(f"$z_{j+1}$")
            ax.legend()
        fig.suptitle(f"p(z|y={list(y0)}) marginals")
        fig.savefig(f"{d}/pdf_overlays.png", dpi=120)
        plt.close(fig)
        summary["probe_y"] = y0.tolist()
        summary["kld_marginals"] = klds

        # KLD map over the reachable y-grid (sum of the two marginal KLDs)
        g1 = np.linspace(2.05, 8.0, 15)
        g2 = np.linspace(0.0, 6.0, 15)
        Y1, Y2 = np.meshgrid(g1, g2, indexing="ij")
        ys = np.stack([Y1.ravel(), Y2.ravel()], axis=1)
        zmg, zsg, _ = tr.z_net.apply(zp, jnp.asarray(ys))
        kmap = np.zeros(len(ys))
        for i, yy in enumerate(ys):
            for j, (fj, hj) in enumerate(zip((f1, f2), (h1, h2))):
                me, ve = aref.predictive_moments_1d(yy[j], fj, hj, SIG_E, SIG_ETA, TGRID)
                zg = np.linspace(max(1e-3, me - 6 * np.sqrt(ve)), me + 6 * np.sqrt(ve), 300)
                pdf_true = aref.predictive_pdf_1d(yy[j], fj, hj, SIG_E, SIG_ETA, TGRID, zg)
                pdf_prop = aref.lognormal_pdf_grid(zg, float(zmg[i, j]), float(zsg[i, j]))
                kmap[i] += aref.kld_grid(pdf_prop, pdf_true, zg)
        fig, ax = plt.subplots(1, 1, figsize=(5, 4), constrained_layout=True)
        c = ax.pcolormesh(Y1, Y2, kmap.reshape(Y1.shape), cmap="viridis", shading="gouraud")
        ax.set_xlabel("$y_1$"); ax.set_ylabel("$y_2$")
        ax.set_title("KL(proposed || exact)")
        fig.colorbar(c, ax=ax)
        fig.savefig(f"{d}/kld_map.png", dpi=120)
        plt.close(fig)
        summary["kld_map_mean"] = float(kmap.mean())
        summary["kld_map_max"] = float(kmap.max())
        with open(f"{d}/summary.json", "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
