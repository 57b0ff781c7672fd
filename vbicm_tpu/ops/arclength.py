"""Arc-length (Riks/Crisfield) continuation for limit-point problems.

The reference carries a full arc-length control card
(``model_property_cards.py:65-68``: scheme_type, max_disp, cdof/cnode,
arclen parameters) but NO implementation — its solver module only has the
one-iteration linear driver. This module implements cylindrical arc-length
continuation on the energy-based nonlinear material (``ops.nonlinear``):

    unknowns (u, load factor t) with  R(u, t) = grad Pi_int(u) - t * f = 0
    constraint per increment:         || u - u_prev ||^2 = dl^2

Each corrector iteration is the bordered Newton step solved by the
Batoz-Dhatt two-solve scheme (both against the SAME tangent, so the
HVP-CG machinery is reused):

    K_T du_bar = -R,   K_T du_t = f
    dt = -(a + D^T du_bar) / (D^T du_t),   D = u - u_prev,
                                           a = (||D||^2 - dl^2) / 2
    du = du_bar + dt * du_t

which traces the equilibrium path THROUGH limit points where pure load
control (``solve_nonlinear_stepped``) must stop. jit/vmap-compatible inner
solves; the increment loop runs on the host (path tracing is inherently
sequential and data-dependent).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .newton import NewtonResult  # noqa: F401  (same result conventions)
from .nonlinear import PowerLawMaterial, make_potential
from .solve import pcg


class ArcLengthPath(NamedTuple):
    u: np.ndarray  # (n_steps+1, ndof) equilibrium states (includes t=0)
    t: np.ndarray  # (n_steps+1,) load factors
    converged: np.ndarray  # (n_steps,) per-increment flags


def trace_arclength(
    model,
    lam,
    mu,
    *,
    g0: float = 0.05,
    m: float = 1.0,
    dl: float = 0.5,
    n_steps: int = 20,
    t0_step: float = 0.1,
    max_iter: int = 20,
    tol: float = 1e-10,
    cg_tol: float = 1e-12,
    cg_maxiter: int = 4000,
) -> ArcLengthPath:
    """Trace the load-displacement path with fixed arc length ``dl``.

    The first increment is load-controlled to ``t = t0_step`` (predictor
    seed); every subsequent increment advances by arc length ``dl`` in
    ``||du||`` (cylindrical constraint, load term excluded) with a secant
    predictor. Returns the full path for plotting/limit-load extraction.
    """
    mask = model.free_mask
    f = model.f_ext * mask
    mat = PowerLawMaterial(lam=jnp.asarray(lam), mu=jnp.asarray(mu), g0=g0, m=m)
    potential = make_potential(model, f_ext=jnp.zeros_like(f))  # internal only
    grad_u = jax.grad(potential, argnums=0)

    from .assembly import make_sorted_scatter

    scatter = make_sorted_scatter(jnp.asarray(model.lm), model.ndof)
    ke = jnp.asarray(lam) * model.ke_lam + jnp.asarray(mu) * model.ke_mu
    d = scatter(jnp.diagonal(ke, axis1=-2, axis2=-1))
    d = jnp.where(mask > 0, jnp.where(d == 0, 1.0, d), 1.0)
    minv = 1.0 / d

    def r_int(u):
        return grad_u(u, mat) * mask

    @jax.jit
    def tangent_solves(u, rhs1, rhs2):
        def hvp(v):
            vm = v * mask
            _, hv = jax.jvp(r_int, (u,), (vm,))
            return hv * mask + v * (1.0 - mask)

        x1, _, _ = pcg(hvp, rhs1 * mask, minv, tol=cg_tol, maxiter=cg_maxiter)
        x2, _, _ = pcg(hvp, rhs2 * mask, minv, tol=cg_tol, maxiter=cg_maxiter)
        return x1 * mask, x2 * mask

    r_int_j = jax.jit(r_int)

    us = [np.zeros(model.ndof)]
    ts = [0.0]
    flags = []
    u = jnp.zeros((model.ndof,), model.dtype)
    t = 0.0

    for step in range(n_steps):
        u_prev = u
        t_prev = t
        if step == 0:
            # load-controlled seed increment
            t = t0_step
            for _ in range(max_iter):
                R = r_int_j(u) - t * f
                du_bar, _ = tangent_solves(u, -R, f)
                u = u + du_bar
                if float(jnp.linalg.norm(r_int_j(u) - t * f)) < tol:
                    break
            ok = float(jnp.linalg.norm(r_int_j(u) - t * f)) < 1e-6
        else:
            # secant predictor along the last increment, rescaled to dl
            du_dir = u - jnp.asarray(us[-2]) if len(us) >= 2 else u
            nrm = float(jnp.linalg.norm(du_dir))
            scale = dl / max(nrm, 1e-30)
            u = u_prev + scale * du_dir
            t = t_prev + scale * (t_prev - (ts[-2] if len(ts) >= 2 else 0.0))
            ok = False
            for _ in range(max_iter):
                R = r_int_j(u) - t * f
                du_bar, du_t = tangent_solves(u, -R, f)
                D = u - u_prev
                denom = float(jnp.vdot(D, du_t))
                a = 0.5 * (float(jnp.vdot(D, D)) - dl * dl)
                if abs(denom) < 1e-30:
                    break
                dt = -(a + float(jnp.vdot(D, du_bar))) / denom
                u = u + du_bar + dt * du_t
                t = t + dt
                res = float(jnp.linalg.norm(r_int_j(u) - t * f))
                arc = abs(float(jnp.vdot(u - u_prev, u - u_prev)) - dl * dl)
                if res < tol and arc < 1e-8 * dl * dl + 1e-14:
                    ok = True
                    break
        us.append(np.asarray(u))
        ts.append(float(t))
        flags.append(ok if step > 0 else bool(ok))

    return ArcLengthPath(u=np.stack(us), t=np.asarray(ts), converged=np.asarray(flags))
