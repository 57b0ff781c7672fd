"""Arbitration machinery for the full-order vs ROM posterior gap
(examples/arbitrate_scaled_posterior.py, round-3 verdict item 4).

The scaled-config arbitration rests on one testable claim: per-observation
SVI refinement from a NEUTRAL init lands on the same exact posterior
whether the observation operator is the full-order solve or the certified
ROM — i.e. the ~1e-7 solve difference between the paths cannot move the
exact posterior at the observation-noise scale. If that holds, any
remaining disagreement between the two AMORTIZED nets is training noise
(measured in the example by reseeding), not an operator bias.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.config import ProblemConfig
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.rom import build_reduced_basis, make_fh_fun_rom
from vbicm_tpu.solver import make_fh_fun
from vbicm_tpu.vi.refine import refine_posterior


@pytest.mark.slow
def test_refined_posterior_operator_invariance():
    """Refinement through the full-order operator and through the certified
    ROM, same init / same noise key, must agree far below the posterior
    std — the ROM path cannot bias the exact posterior."""
    model = build_fem_model(cooks_membrane_mesh(20, 10), dense=True)
    cfg = ProblemConfig()
    fh = make_fh_fun(model, cfg)
    rb = build_reduced_basis(model, tol=1e-10)
    fh_rom = make_fh_fun_rom(model, rb, cfg)

    theta_true = jnp.array([0.5, -0.3])
    y_obs, _ = fh(theta_true)

    mus, stds = [], []
    for f in (fh, fh_rom):
        batch_f = lambda th, f=f: jax.vmap(f)(th)[0]
        mu, L, hist = refine_posterior(
            batch_f, y_obs, cfg.sig_e, jnp.zeros(2), 0.3 * jnp.eye(2),
            key=jax.random.PRNGKey(7), steps=1200, ne=16, lr=1e-2,
        )
        assert np.isfinite(np.asarray(hist)).all()
        mus.append(np.asarray(mu))
        stds.append(np.sqrt(np.diag(np.asarray(L @ L.T))))

    std = stds[0]
    # identical refinement noise (same key) -> the ONLY difference is the
    # operator; 1e-7-certified ROM must not move the mean at posterior scale
    gap_in_std = np.abs(mus[0] - mus[1]) / std
    assert np.all(gap_in_std < 0.05), (gap_in_std, mus, std)
    np.testing.assert_allclose(stds[0], stds[1], rtol=0.05)
