"""Finite-strain (hyperelastic) kinematics through the energy-based driver.

The reference's element library carries large-displacement hooks that are
never wired (``BmL`` B-matrices and the geometric-stiffness ``isw=3`` branch,
``src/fem_preprocess.py:780-799``, ``src/mat_subroutine.py:64-77`` — the
isw=3 element code itself does not exist). This module completes the
capability the TPU-first way, extending ``ops.nonlinear``'s design:

  * kinematics per quadrature point: deformation gradient
    ``F = I + du/dX`` from the precomputed shape gradients (recovered from
    the model's B-matrices — no new geometry pass);
  * material: compressible Neo-Hookean strain energy
        psi(F) = mu/2 (I1 - 3) - mu ln J + lam/2 (ln J)^2
    (I1 = tr(F^T F) with the out-of-plane stretch = 1 under plane strain,
    J = det F). Its small-strain expansion is exactly isotropic linear
    elasticity with the same (lam, mu);
  * residual = ``jax.grad`` of the total potential, consistent tangent =
    Hessian-vector products under matrix-free CG, parameter gradients by
    the implicit function theorem at the converged state — identical
    structure to ``ops.nonlinear.make_nonlinear_solver``.

Nonzero prescribed (Dirichlet) displacements are supported by splitting
``u_total = u*mask + u_prescribed`` inside the potential, so homogeneous-
deformation patch tests drive the solver through its public API.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .newton import NewtonResult, newton_raphson
from .solve import pcg


class NeoHookean(NamedTuple):
    lam: jax.Array
    mu: jax.Array


def shape_gradients_from_B(model):
    """Recover per-(element, qpt) global shape gradients G (nele, nqpt, nel,
    ndm) from the model's strain-displacement matrices: row d of B holds
    dN_i/dx_d at column ndm*i+d (see ``ops.element.bmatrix``/``bmatrix_3d``)."""
    if model.stype not in (2, 4):
        # Plane stress (1) is also rejected: the Neo-Hookean energy assumes
        # F33 = 1 (plane-strain kinematics) and material_coeffs(stype=1)
        # returns condensed plane-stress coefficients, not Lame (lam, mu).
        raise NotImplementedError(
            "finite-strain kinematics assume Cartesian plane-strain (stype=2) "
            "or 3-D (stype=4); plane stress / axisymmetric models are rejected"
        )
    ndm = model.ndm
    B = np.asarray(model.B)  # (nele, nqpt, nrows, ndm*nel)
    nel = B.shape[-1] // ndm
    G = np.stack([B[:, :, d, d::ndm] for d in range(ndm)], axis=-1)
    return jnp.asarray(G, model.dtype), nel, ndm


def deformation_gradient(G, ue, ndm: int):
    """F (..., ndm, ndm) from shape gradients G (..., nel, ndm) and element
    displacements ue (..., nel, ndm) (node-major): F = I + sum_i u_i (x)
    dN_i/dX."""
    grad_u = jnp.einsum("...ia,...ib->...ab", ue, G)  # du_a/dX_b
    return grad_u + jnp.eye(ndm, dtype=G.dtype)


def _lnJ_I1(F, ndm: int):
    """(ln det F, tr(F^T F) embedded in 3-D) with the plane-strain
    out-of-plane stretch F33 = 1."""
    if ndm == 2:
        J = F[..., 0, 0] * F[..., 1, 1] - F[..., 0, 1] * F[..., 1, 0]
        I1 = jnp.sum(F * F, axis=(-2, -1)) + 1.0
    else:
        J = jnp.linalg.det(F)
        I1 = jnp.sum(F * F, axis=(-2, -1))
    return jnp.log(J), I1


def psi_neo_hookean(F, mat: NeoHookean, ndm: int):
    """Strain-energy density per quadrature point."""
    lnJ, I1 = _lnJ_I1(F, ndm)
    return 0.5 * mat.mu * (I1 - 3.0) - mat.mu * lnJ + 0.5 * mat.lam * lnJ**2


def pk1_stress(F, mat: NeoHookean, ndm: int):
    """First Piola-Kirchhoff stress P = dpsi/dF (autodiff of the energy —
    the finite-strain analogue of the reference's isw stress branch)."""
    flat = F.reshape(-1, ndm, ndm)
    p = jax.vmap(jax.grad(lambda f: psi_neo_hookean(f, mat, ndm)))(flat)
    return p.reshape(F.shape)


def cauchy_stress(F, mat: NeoHookean, ndm: int):
    """Cauchy stress sigma = P F^T / J."""
    P = pk1_stress(F, mat, ndm)
    if ndm == 2:
        J = F[..., 0, 0] * F[..., 1, 1] - F[..., 0, 1] * F[..., 1, 0]
    else:
        J = jnp.linalg.det(F)
    return jnp.einsum("...ab,...cb->...ac", P, F) / J[..., None, None]


def make_total_potential(model, f_ext=None) -> Callable:
    """``Pi(u_free, mat) = sum_qpt dvol * psi(F) - f . u`` with fixed dofs
    carried by the model's prescribed values (zero by default)."""
    G, nel, ndm = shape_gradients_from_B(model)
    dvol = model.dvol
    lm = model.lm
    mask = model.free_mask
    f = model.f_ext * mask if f_ext is None else f_ext

    u_presc = np.zeros(model.ndof)
    if model.has_prescribed:
        u_presc[np.asarray(model.supp_dof)] = np.asarray(model.u_supp)
    u_presc = jnp.asarray(u_presc, model.dtype)

    def potential(u, mat: NeoHookean):
        ut = u * mask + u_presc
        ue = ut[lm].reshape(lm.shape[0], nel, ndm)  # (nele, nel, ndm)
        F = deformation_gradient(G, ue[:, None, :, :], ndm)  # (nele, nqpt, ndm, ndm)
        psi = psi_neo_hookean(F, mat, ndm)
        return jnp.sum(psi * dvol) - jnp.vdot(f, ut)

    return potential


def _linear_jacobi(model):
    from .assembly import make_sorted_scatter

    scatter = make_sorted_scatter(jnp.asarray(model.lm), model.ndof)
    mask = model.free_mask

    def minv(lam, mu):
        ke = lam * model.ke_lam + mu * model.ke_mu
        d = scatter(jnp.diagonal(ke, axis1=-2, axis2=-1))
        d = jnp.where(mask > 0, jnp.where(d == 0, 1.0, d), 1.0)
        return 1.0 / d

    return minv


def solve_finite_strain(
    model,
    lam,
    mu,
    *,
    n_steps: int = 1,
    tol_cr: float = 1e-12,
    max_iter: int = 30,
    cg_tol: float = 1e-12,
    cg_maxiter: int = 4000,
    backtrack: int = 10,
) -> NewtonResult:
    """Forward finite-strain solve with diagnostics (NewtonResult). The
    external load ramps in ``n_steps`` warm-started increments (reference
    ``numsteps`` card semantics) — use >1 for large loads."""
    mask = model.free_mask
    mat = NeoHookean(lam=lam, mu=mu)
    minv = _linear_jacobi(model)(lam, mu)

    u = jnp.zeros((model.ndof,), model.dtype)
    res = None
    for k in range(1, n_steps + 1):
        potential = make_total_potential(model, f_ext=(k / n_steps) * model.f_ext * mask)
        grad_u = jax.grad(potential, argnums=0)

        def residual(x):
            return grad_u(x, mat) * mask

        def tangent_solve(x, r):
            def hvp(v):
                vm = v * mask
                _, hv = jax.jvp(residual, (x,), (vm,))
                return hv * mask + v * (1.0 - mask)

            du, _, _ = pcg(hvp, -r * mask, minv, tol=cg_tol, maxiter=cg_maxiter)
            return du * mask

        res = newton_raphson(
            residual, tangent_solve, u,
            tol_cr=tol_cr, max_iter=max_iter, backtrack=backtrack,
        )
        u = res.u
    return res


def make_finite_strain_solver(
    model,
    *,
    n_steps: int = 1,
    tol_cr: float = 1e-12,
    max_iter: int = 30,
    cg_tol: float = 1e-12,
    cg_maxiter: int = 4000,
    backtrack: int = 10,
) -> Callable:
    """Differentiable ``u(lam, mu) -> (ndof,)`` finite-strain solve.

    Backward pass: implicit-function-theorem adjoint at the converged state
    (one symmetric tangent solve + a parameter VJP of the residual) — the
    Newton/load-step iteration is never unrolled.
    """
    mask = model.free_mask
    potential = make_total_potential(model)
    minv_of = _linear_jacobi(model)

    def _forward(lam, mu):
        return solve_finite_strain(
            model, lam, mu,
            n_steps=n_steps, tol_cr=tol_cr, max_iter=max_iter,
            cg_tol=cg_tol, cg_maxiter=cg_maxiter, backtrack=backtrack,
        ).u

    @jax.custom_vjp
    def solve(lam, mu):
        return _forward(lam, mu)

    def _fwd(lam, mu):
        u = _forward(lam, mu)
        return u, (lam, mu, u)

    def _bwd(saved, ubar):
        lam, mu, u = saved
        grad_u = jax.grad(potential, argnums=0)

        def residual_of(x, lam_, mu_):
            return grad_u(x, NeoHookean(lam=lam_, mu=mu_)) * mask

        def hvp(v):
            vm = v * mask
            _, hv = jax.jvp(lambda x: residual_of(x, lam, mu), (u,), (vm,))
            return hv * mask + v * (1.0 - mask)

        minv = minv_of(lam, mu)
        w, _, _ = pcg(hvp, ubar * mask, minv, tol=cg_tol, maxiter=cg_maxiter)
        _, vjp_theta = jax.vjp(lambda l_, m_: residual_of(u, l_, m_), lam, mu)
        glam, gmu = vjp_theta(-w * mask)
        return glam, gmu

    solve.defvjp(_fwd, _bwd)
    return solve
