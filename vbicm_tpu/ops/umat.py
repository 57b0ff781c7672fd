"""User-material (umat) extension point.

The reference stubs a user-material hook at ``mat_type == 99``
(``src/mat_subroutine.py:210-215`` routes to a ``umat_*`` subroutine that
does not exist). The TPU-native equivalent is an ENERGY-density callable:
instead of a FORTRAN-style "strain in, stress + tangent out" subroutine, the
user supplies one pure function

    psi(eps, mat) -> energy density per quadrature point

(small strain: ``eps`` is the engineering-strain vector the model's
B-matrices produce — 3 rows in 2-D, 6 in 3-D; finite strain:
``psi(F, mat)`` on the deformation gradient), plus any material-parameter
pytree ``mat``. Everything else — residual (``jax.grad`` of the total
potential), consistent tangent (Hessian-vector products under matrix-free
CG), parameter gradients (implicit-function-theorem adjoint at the
converged state) — is derived automatically, exactly like the built-in
power-law (``ops.nonlinear``) and Neo-Hookean (``ops.finite_strain``)
materials, which are themselves instances of this pattern.

This is strictly more capable than the reference's hook: the user writes
ONE scalar function and gets the stress, the exact consistent tangent, and
dLoss/dMaterial for free; and the solve vmaps/shards like every other
solver in the package.

Ships with a J2 deformation-theory (Hencky) material with linear isotropic
hardening as the demonstration umat.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .newton import NewtonResult, newton_raphson
from .solve import pcg


def make_umat_potential(model, psi: Callable, f_ext=None, *,
                        kind: str = "small_strain") -> Callable:
    """Total potential ``Pi(u, mat) = sum_qpt dvol psi(.) - f . u`` for a
    user energy density.

    kind="small_strain": ``psi(eps, mat)`` on the engineering-strain vector
    from the model's precomputed B-matrices (any stype the B rows encode).
    kind="finite_strain": ``psi(F, mat)`` on the deformation gradient
    (plane strain / 3-D only — same restriction as ``ops.finite_strain``).
    Fixed dofs are masked; nonzero prescribed displacements are carried via
    the model's Dirichlet values (finite-strain path, matching
    ``make_total_potential``).
    """
    lm = model.lm
    dvol = model.dvol
    mask = model.free_mask
    f = model.f_ext * mask if f_ext is None else f_ext

    if kind == "small_strain":
        B = model.B

        def potential(u, mat):
            um = u * mask
            eps = jnp.einsum("eqai,ei->eqa", B, um[lm])
            return jnp.sum(psi(eps, mat) * dvol) - jnp.vdot(f, um)

        return potential

    if kind == "finite_strain":
        from .finite_strain import deformation_gradient, shape_gradients_from_B

        G, nel, ndm = shape_gradients_from_B(model)
        u_presc = np.zeros(model.ndof)
        if model.has_prescribed:
            u_presc[np.asarray(model.supp_dof)] = np.asarray(model.u_supp)
        u_presc = jnp.asarray(u_presc, model.dtype)

        def potential(u, mat):
            ut = u * mask + u_presc
            ue = ut[lm].reshape(lm.shape[0], nel, ndm)
            F = deformation_gradient(G, ue[:, None, :, :], ndm)
            return jnp.sum(psi(F, mat) * dvol) - jnp.vdot(f, ut)

        return potential

    raise ValueError(f"unknown umat kind {kind!r}")



def _jacobi_minv(model, precond_moduli):
    """Inverse Jacobi diagonal of the (lam0, mu0) linear-elastic proxy —
    the tangent-CG preconditioner shared by make_umat_solver/solve_umat."""
    from .assembly import make_sorted_scatter

    scatter = make_sorted_scatter(jnp.asarray(model.lm), model.ndof)
    lam0, mu0 = precond_moduli
    ke = lam0 * model.ke_lam + mu0 * model.ke_mu
    d = scatter(jnp.diagonal(ke, axis1=-2, axis2=-1))
    mask = model.free_mask
    d = jnp.where(mask > 0, jnp.where(d == 0, 1.0, d), 1.0)
    return 1.0 / d


def _newton_loadsteps(
    model, psi, mat, minv, *, kind, n_steps, cg_tol, cg_maxiter, tol_cr,
    max_iter, backtrack,
) -> NewtonResult:
    """The shared Newton/load-stepping loop of make_umat_solver and
    solve_umat: ramped f_ext, autodiff residual, HVP-CG tangent solve."""
    mask = model.free_mask
    u = jnp.zeros((model.ndof,), model.dtype)
    res = None
    for k in range(1, n_steps + 1):
        pot_k = make_umat_potential(
            model, psi, f_ext=(k / n_steps) * model.f_ext * mask, kind=kind
        )
        grad_u = jax.grad(pot_k, argnums=0)

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


def make_umat_solver(
    model,
    psi: Callable,
    *,
    kind: str = "small_strain",
    precond_moduli: tuple = (11.538461538461538, 7.6923076923076925),
    n_steps: int = 1,
    tol_cr: float = 1e-12,
    max_iter: int = 30,
    cg_tol: float = 1e-12,
    cg_maxiter: int = 4000,
    backtrack: int = 10,
) -> Callable:
    """Differentiable ``solve(mat) -> u (ndof,)`` for a user energy density.

    ``mat`` is ANY pytree of material parameters; gradients flow to every
    array leaf via the implicit-function-theorem adjoint (custom VJP — the
    Newton/load-step iteration is never unrolled). ``precond_moduli`` =
    (lam, mu) of a linear-elastic proxy used only for the Jacobi
    preconditioner of the tangent CG (defaults to E=20, v=0.3 — the
    reference's material card); it affects iteration counts, never results.
    """
    mask = model.free_mask
    potential = make_umat_potential(model, psi, kind=kind)
    minv = _jacobi_minv(model, precond_moduli)

    def _newton(mat) -> NewtonResult:
        return _newton_loadsteps(
            model, psi, mat, minv, kind=kind, n_steps=n_steps,
            cg_tol=cg_tol, cg_maxiter=cg_maxiter, tol_cr=tol_cr,
            max_iter=max_iter, backtrack=backtrack,
        )

    @jax.custom_vjp
    def solve(mat):
        return _newton(mat).u

    def _fwd(mat):
        u = _newton(mat).u
        return u, (mat, u)

    def _bwd(saved, ubar):
        mat, u = saved
        grad_u = jax.grad(potential, argnums=0)

        def residual_of(x, m):
            return grad_u(x, m) * mask

        def hvp(v):
            vm = v * mask
            _, hv = jax.jvp(lambda x: residual_of(x, mat), (u,), (vm,))
            return hv * mask + v * (1.0 - mask)

        # adjoint tangent solve (energy Hessian — symmetric)
        w, _, _ = pcg(hvp, ubar * mask, minv, tol=cg_tol, maxiter=cg_maxiter)
        # dL/dmat = -w^T dR/dmat at fixed u, for every leaf of the pytree
        _, vjp_mat = jax.vjp(lambda m: residual_of(u, m), mat)
        (gmat,) = vjp_mat(-w * mask)
        return (gmat,)

    solve.defvjp(_fwd, _bwd)
    return solve


def solve_umat(model, psi, mat, **kw) -> NewtonResult:
    """Forward umat solve with Newton diagnostics (iterations/converged)."""
    kind = kw.pop("kind", "small_strain")
    precond_moduli = kw.pop("precond_moduli", (11.538461538461538, 7.6923076923076925))
    n_steps = kw.pop("n_steps", 1)
    minv = _jacobi_minv(model, precond_moduli)
    return _newton_loadsteps(
        model, psi, mat, minv, kind=kind, n_steps=n_steps,
        cg_tol=kw.get("cg_tol", 1e-12), cg_maxiter=kw.get("cg_maxiter", 4000),
        tol_cr=kw.get("tol_cr", 1e-12), max_iter=kw.get("max_iter", 30),
        backtrack=kw.get("backtrack", 10),
    )


# ---------------------------------------------------------------------------
# Demonstration umat: J2 deformation theory (Hencky) with linear hardening
# ---------------------------------------------------------------------------


class J2DeformationMaterial(NamedTuple):
    """Hencky (total-strain) J2 material with linear isotropic hardening.

    Equivalent-stress curve: q(e) = 3 mu e up to the yield strain
    e_y = sig_y / (3 mu), then q = sig_y + H (e - e_y). ``H = 3 mu``
    recovers linear elasticity exactly.
    """

    lam: jax.Array
    mu: jax.Array
    sig_y: jax.Array  # initial yield stress
    H: jax.Array  # linear hardening modulus (slope of q vs e_eq)


def j2_deformation_psi(eps, mat: J2DeformationMaterial):
    """Energy density: 0.5 K tr^2 + integral of q(e) de (plane strain,
    engineering-strain vector (e11, e22, g12))."""
    e11, e22, g12 = eps[..., 0], eps[..., 1], eps[..., 2]
    tr = e11 + e22
    d11 = e11 - tr / 3.0
    d22 = e22 - tr / 3.0
    d33 = -tr / 3.0
    dev2 = d11**2 + d22**2 + d33**2 + 0.5 * g12**2
    e_eq = jnp.sqrt(2.0 / 3.0 * dev2 + 1e-30)

    K = mat.lam + 2.0 * mat.mu / 3.0
    e_y = mat.sig_y / (3.0 * mat.mu)
    psi_el = 1.5 * mat.mu * e_eq**2
    dp = e_eq - e_y
    psi_pl = 1.5 * mat.mu * e_y**2 + mat.sig_y * dp + 0.5 * mat.H * dp**2
    return 0.5 * K * tr**2 + jnp.where(e_eq <= e_y, psi_el, psi_pl)
