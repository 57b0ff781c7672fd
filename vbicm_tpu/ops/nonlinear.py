"""Nonlinear (power-law secant) material through the Newton driver.

The reference carries full nonlinear-solution control cards (NR, line
search, arc length — ``model_property_cards.py:39-68``) but ships only the
one-iteration linear path live. This module puts real weight on the
``ops.newton`` API with a TPU-first formulation:

  * the material is defined by a per-quadrature-point strain ENERGY
    density; the global residual is ``jax.grad`` of the total potential —
    no hand-derived residual/tangent code (the reference's per-element
    ``isw`` switch, ``src/mat_subroutine.py:22-77``, becomes one autodiff);
  * the Newton tangent solve is matrix-free CG whose matvec is a
    Hessian-vector product (``jax.jvp`` of the residual) — exact consistent
    tangent, batched over (element, qpt) on the MXU, no assembled K_T;
  * parameter gradients go through the CONVERGED state by the implicit
    function theorem (custom VJP: one adjoint tangent solve + a VJP of the
    residual w.r.t. parameters), not by unrolling the Newton loop — the
    same adjoint pattern as the linear solvers in ``ops.solve``.

Material: compressible power-law (Ramberg-Osgood-type deformation theory)

    psi(eps) = 0.5 * K * tr(eps)^2 ,  K = lam + 2 mu / 3
             + (mu * g0^2 / (2 m)) * ((1 + (gbar/g0)^2)^m - 1)

with gbar^2 = 2 eps_dev : eps_dev. ``m = 1`` recovers linear elasticity
EXACTLY (psi -> 0.5 K tr^2 + mu dev:dev = 0.5 lam tr^2 + mu eps:eps);
``m < 1`` is shear softening. Plane strain.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .newton import NewtonResult, newton_raphson
from .solve import pcg


class PowerLawMaterial(NamedTuple):
    lam: jax.Array  # first Lame parameter
    mu: jax.Array  # shear modulus (initial)
    g0: float = 0.05  # reference shear strain
    m: float = 1.0  # hardening exponent; 1.0 = linear elasticity


def strain_energy_density(eps3, mat: PowerLawMaterial):
    """psi per qpt from the engineering-strain 3-vector (e11, e22, g12)."""
    e11, e22, g12 = eps3[..., 0], eps3[..., 1], eps3[..., 2]
    tr = e11 + e22
    # plane-strain deviatoric part (e33 = 0): dev = eps - tr/3 I
    d11 = e11 - tr / 3.0
    d22 = e22 - tr / 3.0
    d33 = -tr / 3.0
    dev2 = d11**2 + d22**2 + d33**2 + 0.5 * g12**2  # eps_dev : eps_dev
    gbar2 = 2.0 * dev2
    # volumetric with the BULK modulus K = lam + 2mu/3 so that m=1 recovers
    # psi = 0.5 lam tr^2 + mu eps:eps (= 0.5 K tr^2 + mu dev:dev) exactly
    vol = 0.5 * (mat.lam + 2.0 * mat.mu / 3.0) * tr**2
    x = gbar2 / (mat.g0**2)
    # mu * g0^2/(2m) * ((1+x)^m - 1); smooth at x=0 for any m
    dev_e = mat.mu * mat.g0**2 / (2.0 * mat.m) * ((1.0 + x) ** mat.m - 1.0)
    return vol + dev_e


def stress6_power_law(eps3, mat: PowerLawMaterial):
    """Closed-form 6-stress ``sigma = d psi / d eps`` for the power-law
    material under plane strain (e33 = 0), in the reference's storage layout
    [s11, s22, s33, t12, t23, t31] (``src/mat_subroutine.py:76-81``).

    sigma = K tr(eps) I + 2 mu_sec dev(eps),  mu_sec = mu (1 + gbar^2/g0^2)^(m-1)

    ``m = 1`` reduces to :func:`stress6_plane_strain` exactly. Engineering
    shear: t12 = mu_sec * g12 (dev_12 = g12/2). A unit test pins this
    against ``jax.grad`` of :func:`strain_energy_density`.
    """
    e11, e22, g12 = eps3[..., 0], eps3[..., 1], eps3[..., 2]
    tr = e11 + e22
    d11 = e11 - tr / 3.0
    d22 = e22 - tr / 3.0
    d33 = -tr / 3.0
    dev2 = d11**2 + d22**2 + d33**2 + 0.5 * g12**2
    gbar2 = 2.0 * dev2
    mu_sec = mat.mu * (1.0 + gbar2 / mat.g0**2) ** (mat.m - 1.0)
    bulk = (mat.lam + 2.0 * mat.mu / 3.0) * tr
    s11 = bulk + 2.0 * mu_sec * d11
    s22 = bulk + 2.0 * mu_sec * d22
    s33 = bulk + 2.0 * mu_sec * d33
    t12 = mu_sec * g12
    zero = jnp.zeros_like(t12)
    return jnp.stack([s11, s22, s33, t12, zero, zero], axis=-1)


def make_potential(model, f_ext=None) -> Callable:
    """Total potential ``Pi(u_free_masked, mat) = sum_qpt w psi - f.u``.

    u is a full-dof vector with fixed dofs held at zero by masking inside.
    """
    B = model.B
    dvol = model.dvol
    lm = model.lm
    mask = model.free_mask
    f = model.f_ext * model.free_mask if f_ext is None else f_ext

    if getattr(model, "stype", 2) != 2:
        raise NotImplementedError(
            "the power-law energy density is written for plane strain "
            "(e33 = 0 deviatoric split); stype 1/3 would misread the "
            "strain rows"
        )

    def potential(u, mat: PowerLawMaterial):
        um = u * mask
        eps3 = jnp.einsum("eqai,ei->eqa", B, um[lm])
        psi = strain_energy_density(eps3, mat)
        return jnp.sum(psi * dvol) - jnp.vdot(f, um)

    return potential


def make_nonlinear_solver(
    model,
    *,
    g0: float = 0.05,
    m: float = 1.0,
    tol_cr: float = 1e-12,
    max_iter: int = 25,
    cg_tol: float = 1e-12,
    cg_maxiter: int = 4000,
    backtrack: int = 8,
) -> Callable:
    """Differentiable nonlinear solve ``u(lam, mu) -> (ndof,)``.

    Forward: Newton with autodiff residual and matrix-free HVP-CG tangent
    solves (Jacobi preconditioner from the LINEAR operator's diagonal — a
    good scale proxy for moderate softening). Backward: implicit-function-
    theorem adjoint at the converged state.
    """
    potential = make_potential(model)
    mask = model.free_mask
    # Jacobi preconditioner from the linear elastic diagonal (c-dependent)
    from .assembly import make_sorted_scatter

    scatter = make_sorted_scatter(jnp.asarray(model.lm), model.ndof)

    def _linear_diag(lam, mu):
        ke = lam * model.ke_lam + mu * model.ke_mu
        d = scatter(jnp.diagonal(ke, axis1=-2, axis2=-1))
        d = jnp.where(mask > 0, jnp.where(d == 0, 1.0, d), 1.0)
        return 1.0 / d

    def _solve_newton(lam, mu):
        mat = PowerLawMaterial(lam=lam, mu=mu, g0=g0, m=m)
        grad_u = jax.grad(potential, argnums=0)

        def residual(u):
            return grad_u(u, mat) * mask

        minv = _linear_diag(lam, mu)

        def tangent_solve(u, r):
            def hvp(v):
                vm = v * mask
                _, hv = jax.jvp(residual, (u,), (vm,))
                return hv * mask + v * (1.0 - mask)

            du, _, _ = pcg(hvp, -r * mask, minv, tol=cg_tol, maxiter=cg_maxiter)
            return du * mask

        res = newton_raphson(
            residual, tangent_solve, jnp.zeros((model.ndof,), model.dtype),
            tol_cr=tol_cr, max_iter=max_iter, backtrack=backtrack,
        )
        return res

    @jax.custom_vjp
    def solve(lam, mu):
        return _solve_newton(lam, mu).u

    def _fwd(lam, mu):
        u = _solve_newton(lam, mu).u
        return u, (lam, mu, u)

    def _bwd(saved, ubar):
        lam, mu, u = saved
        mat = PowerLawMaterial(lam=lam, mu=mu, g0=g0, m=m)
        grad_u = jax.grad(potential, argnums=0)

        def residual_of(u_, lam_, mu_):
            mat_ = PowerLawMaterial(lam=lam_, mu=mu_, g0=g0, m=m)
            return grad_u(u_, mat_) * mask

        # adjoint: K_T(u)^T w = ubar  (K_T symmetric — energy Hessian)
        def hvp(v):
            vm = v * mask
            _, hv = jax.jvp(lambda x: residual_of(x, lam, mu), (u,), (vm,))
            return hv * mask + v * (1.0 - mask)

        minv = _linear_diag(lam, mu)
        w, _, _ = pcg(hvp, ubar * mask, minv, tol=cg_tol, maxiter=cg_maxiter)
        # dL/dtheta = -w^T dR/dtheta at fixed u
        _, vjp_theta = jax.vjp(lambda l_, m_: residual_of(u, l_, m_), lam, mu)
        glam, gmu = vjp_theta(-w * mask)
        return glam, gmu

    solve.defvjp(_fwd, _bwd)
    return solve


def solve_nonlinear(model, lam, mu, **kw) -> NewtonResult:
    """Convenience: full NewtonResult (iterations, tolerance, converged)."""
    potential = make_potential(model)
    solver = make_nonlinear_solver(model, **kw)
    # re-run the newton driver for the diagnostics (cheap relative to use)
    g0 = kw.get("g0", 0.05)
    m = kw.get("m", 1.0)
    mat = PowerLawMaterial(lam=lam, mu=mu, g0=g0, m=m)
    mask = model.free_mask
    grad_u = jax.grad(potential, argnums=0)

    def residual(u):
        return grad_u(u, mat) * mask

    from .assembly import make_sorted_scatter

    scatter = make_sorted_scatter(jnp.asarray(model.lm), model.ndof)
    ke = lam * model.ke_lam + mu * model.ke_mu
    d = scatter(jnp.diagonal(ke, axis1=-2, axis2=-1))
    d = jnp.where(mask > 0, jnp.where(d == 0, 1.0, d), 1.0)
    minv = 1.0 / d

    def tangent_solve(u, r):
        def hvp(v):
            vm = v * mask
            _, hv = jax.jvp(residual, (u,), (vm,))
            return hv * mask + v * (1.0 - mask)

        du, _, _ = pcg(hvp, -r * mask, minv,
                       tol=kw.get("cg_tol", 1e-12), maxiter=kw.get("cg_maxiter", 4000))
        return du * mask

    return newton_raphson(
        residual, tangent_solve, jnp.zeros((model.ndof,), model.dtype),
        tol_cr=kw.get("tol_cr", 1e-12), max_iter=kw.get("max_iter", 25),
        backtrack=kw.get("backtrack", 8),
    )


def solve_nonlinear_stepped(model, lam, mu, *, n_steps: int = 5,
                            load_factor: float = 1.0, **kw) -> NewtonResult:
    """Incremental load stepping (the reference's ``numsteps``/``load_factor``
    cards, ``model_property_cards.py:39-48``): the external load ramps to
    ``load_factor`` of f_ext in ``n_steps`` increments, each solved by
    warm-started Newton — the standard way to track strongly softening
    equilibrium paths (a cold full-load Newton jumps far outside the basin).
    NOTE: a saturating secant (m <= 0.5) has a LIMIT LOAD; beyond it no
    equilibrium exists and the last increment reports converged=False —
    that is the physics, use the returned flag."""
    g0 = kw.get("g0", 0.05)
    m = kw.get("m", 1.0)
    mask = model.free_mask
    mat = PowerLawMaterial(lam=lam, mu=mu, g0=g0, m=m)
    from .assembly import make_sorted_scatter

    scatter = make_sorted_scatter(jnp.asarray(model.lm), model.ndof)
    ke = lam * model.ke_lam + mu * model.ke_mu
    d = scatter(jnp.diagonal(ke, axis1=-2, axis2=-1))
    d = jnp.where(mask > 0, jnp.where(d == 0, 1.0, d), 1.0)
    minv = 1.0 / d

    u = jnp.zeros((model.ndof,), model.dtype)
    res = None
    for k in range(1, n_steps + 1):
        factor = load_factor * k / n_steps
        potential = make_potential(model, f_ext=factor * model.f_ext * mask)
        grad_u = jax.grad(potential, argnums=0)

        def residual(x):
            return grad_u(x, mat) * mask

        def tangent_solve(x, r):
            def hvp(v):
                vm = v * mask
                _, hv = jax.jvp(residual, (x,), (vm,))
                return hv * mask + v * (1.0 - mask)

            du, _, _ = pcg(hvp, -r * mask, minv,
                           tol=kw.get("cg_tol", 1e-12),
                           maxiter=kw.get("cg_maxiter", 4000))
            return du * mask

        res = newton_raphson(
            residual, tangent_solve, u,
            tol_cr=kw.get("tol_cr", 1e-12),
            max_iter=kw.get("max_iter", 25),
            backtrack=kw.get("backtrack", 8),
        )
        u = res.u
    return res
