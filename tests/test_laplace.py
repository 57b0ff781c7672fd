"""MAP + Laplace posterior (`eval.laplace`) — the classical-Bayes baseline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbicm_tpu.eval import laplace_posterior
from vbicm_tpu.eval.mcmc import make_fem_logpost

# correlated linear-Gaussian: exact posterior known in closed form
A = np.array([[1.0, 1.0], [0.0, 0.15]])
SIG_E = 0.05
Y = np.array([0.9, 0.1])
PREC = np.eye(2) + A.T @ A / SIG_E
SIGMA = np.linalg.inv(PREC)
MU = SIGMA @ (A.T @ Y / SIG_E)


def test_laplace_exact_on_linear_gaussian():
    """Gaussian posterior: Laplace IS exact — mode and covariance to
    machine precision."""
    Aj, yj = jnp.asarray(A), jnp.asarray(Y)

    def logpost(t):
        r = yj - Aj @ t
        return -0.5 * jnp.sum(r**2) / SIG_E - 0.5 * jnp.sum(t**2)

    res = laplace_posterior(logpost, jnp.zeros(2))
    assert res.converged and res.grad_norm < 1e-8
    np.testing.assert_allclose(res.theta_map, MU, atol=1e-8)
    np.testing.assert_allclose(res.cov, SIGMA, rtol=1e-8)


@pytest.mark.slow
def test_laplace_through_field_solver():
    """End-to-end through the differentiable FEM field solve: L-BFGS
    converges, the Hessian (forward-over-reverse through the adjoint VJP)
    is PD, and the mode reproduces the observation."""
    from vbicm_tpu.config import ProblemConfig
    from vbicm_tpu.mesh import cooks_membrane_mesh
    from vbicm_tpu.model import build_fem_model
    from vbicm_tpu.prob.randomfield import build_kl_expansion, make_fh_fun_field

    model = build_fem_model(cooks_membrane_mesh(10, 5), dense=True)
    kl = build_kl_expansion(model, n_modes=4, corr_len=15.0, sigma=0.3)
    cfg = ProblemConfig(theta_dim=4, y_dim=2 * 8, ele_id=5, sig_e=1e-3)
    probes = tuple(range(8, 55, 6))
    fh = make_fh_fun_field(model, kl, cfg, probe_nodes=probes, tol=1e-12)
    theta_true = jnp.asarray([0.7, -0.4, 0.2, 0.9])
    y_obs = fh(theta_true)[0]  # noise-free: mode must sit near theta_true
    logpost = make_fem_logpost(fh, y_obs, cfg.sig_e)
    res = laplace_posterior(logpost, jnp.zeros(4), tol=1e-7)
    assert res.grad_norm < 1e-6
    # identifiable modes recovered; posterior stds contracted below prior
    np.testing.assert_allclose(res.theta_map, np.asarray(theta_true), atol=0.05)
    stds = np.sqrt(np.diag(res.cov))
    assert np.all(stds < 1.0) and np.all(stds > 0)
    # quadratic-expansion sanity: one-sigma steps along the COVARIANCE
    # eigenvectors drop the logpost by ~0.5 (coordinate-axis steps do not
    # on a correlated posterior — the same geometry that breaks mean-field)
    evals, evecs = np.linalg.eigh(res.cov)
    for k in range(4):
        dt = np.sqrt(evals[k]) * evecs[:, k]
        drop = res.logpost_map - float(logpost(jnp.asarray(res.theta_map + dt)))
        assert 0.3 < drop < 0.8, (k, drop)


def test_laplace_rejects_saddle():
    logpost = lambda t: 0.5 * t[0] ** 2 - 0.5 * t[1] ** 2  # saddle at 0
    with pytest.raises(ValueError, match="positive definite"):
        laplace_posterior(logpost, jnp.asarray([0.3, 0.2]), max_iters=5)
