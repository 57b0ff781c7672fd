"""Linearized (eigenvalue) buckling analysis.

The reference's geometric-stiffness hook is the dormant ``isw=3`` switch
whose element code does not exist (``src/mat_subroutine.py:64-77`` routes to
nothing). This completes the capability the autodiff way: the geometric
stiffness is the load-factor derivative of the EXACT finite-strain tangent,

    K_T(s) = Hess_u Pi_fs(s * u0),     K_G := d/ds K_T(s) |_{s=0}

evaluated as a double ``jvp`` of the Neo-Hookean potential (``ops.
finite_strain``) — no hand-derived initial-stress matrix, and consistent
with the same energy the nonlinear solver minimizes. Classical linearized
buckling then reads: K phi = lambda_cr * (-K_G) phi, smallest positive
lambda_cr.

Host-scale analysis (like ``eval.modal``): the dense K_G build is one
vmapped pass of ndof double-jvps — fine for evaluation meshes, not a
training hot path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model import FemModel
from ..ops.element import material_coeffs
from ..ops.finite_strain import NeoHookean, make_total_potential
from ..solver import fea_solution


def geometric_stiffness(model: FemModel, lam, mu, u0) -> np.ndarray:
    """Dense K_G on the free dofs: K_G[i,j] = d/ds Hess(Pi)(s*u0)[i,j] at
    s = 0, via nested jvp (exact, from the finite-strain energy)."""
    pot = make_total_potential(model)
    mat = NeoHookean(lam=jnp.asarray(lam), mu=jnp.asarray(mu))
    mask = model.free_mask
    u0 = jnp.asarray(u0) * mask

    grad_u = jax.grad(lambda u: pot(u, mat))

    def kg_col(v):
        # g(s) = K_T(s*u0) @ v ; column = g'(0)
        def hvp_at(s):
            _, hv = jax.jvp(grad_u, (s * u0,), (v,))
            return hv

        _, col = jax.jvp(hvp_at, (jnp.asarray(0.0, model.dtype),), (jnp.asarray(1.0, model.dtype),))
        return col * mask

    free = np.asarray(model.free_dof)
    eye = jnp.zeros((free.shape[0], model.ndof), model.dtype)
    eye = eye.at[jnp.arange(free.shape[0]), jnp.asarray(free)].set(1.0)
    cols = jax.lax.map(kg_col, eye, batch_size=64)  # (nfree, ndof)
    return np.asarray(cols)[:, free].T


def buckling_factors(
    model: FemModel,
    *,
    E: float = 20.0,
    v: float = 0.3,
    n_modes: int = 4,
):
    """Critical load factors and free-dof buckling modes for the model's
    ``f_ext`` load pattern.

    Returns (factors (n_modes,), modes (nfree, n_modes)): the load
    ``factor * f_ext`` is the linearized-buckling critical load. Factors are
    the smallest-magnitude positive generalized eigenvalues of
    K phi = factor * (-K_G) phi.
    """
    import scipy.linalg

    if model.k_lam_ff is None:
        raise ValueError("buckling analysis needs a dense model (dense=True)")
    c0, c1 = material_coeffs(model.stype, E, v)
    lam, mu = float(c0), float(c1)
    if model.stype not in (2, 4):
        raise NotImplementedError("plane strain (2) or 3-D (4) models")
    if model.has_prescribed:
        # geometric_stiffness scales only the free-dof state by s while
        # make_total_potential adds u_prescribed at full value, so K_G would
        # not be the load-factor derivative of the tangent for a
        # displacement-driven model.
        raise NotImplementedError(
            "linearized buckling requires a force-driven model; prescribed "
            "nonzero displacements are not scaled with the load factor"
        )

    u0 = fea_solution(model, _material_from(lam, mu)).u
    Kg = geometric_stiffness(model, lam, mu, u0)
    K = lam * np.asarray(model.k_lam_ff) + mu * np.asarray(model.k_mu_ff)

    # K phi = f * (-Kg) phi  <=>  (-Kg) phi = (1/f) K phi: eigh with B = K SPD
    mu_eig, phi = scipy.linalg.eigh(-0.5 * (Kg + Kg.T), K)
    pos = mu_eig > 1e-12
    factors = 1.0 / mu_eig[pos]
    order = np.argsort(factors)
    factors = factors[order][:n_modes]
    modes = phi[:, pos][:, order][:, :n_modes]
    return factors, modes


def _material_from(lam, mu):
    from ..config import MaterialCard

    E = mu * (3.0 * lam + 2.0 * mu) / (lam + mu)
    v = lam / (2.0 * (lam + mu))
    return MaterialCard(E=E, v=v)
