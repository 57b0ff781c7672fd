"""Transient (implicit Newmark-beta) structural dynamics.

The reference gates a dynamics path behind its solution-control card
(``dynamics`` flag, ``model_property_cards.py:33``; consistent mass
``me = dvol * Nm^T den Nm``, ``src/mat_subroutine.py:74-75``; Mg assembly
``src/fem_solver.py:255-258``) but ships it off and has no time integrator.
This module completes the capability TPU-first:

  * constant-coefficient linear dynamics means the effective operator
    ``K_eff = K + (gamma/(beta dt)) C + (1/(beta dt^2)) M`` is factored
    ONCE on the host; the device carries ``K_eff^{-1}`` so every time step
    is three dense MXU matvecs (M-, C- and K_eff^{-1}-applies) — no
    triangular solves (sequential-bound on TPU) in the hot loop;
  * the time loop is a single ``lax.scan`` — one compiled dispatch for the
    whole trajectory, differentiable end-to-end through the scan;
  * Rayleigh damping ``C = a M + b K`` keeps everything in the span of the
    precomputed (M, K) pair.

Average-acceleration defaults (beta=1/4, gamma=1/2): unconditionally
stable, second-order, energy-conserving for undamped free vibration.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model import FemModel
from .element import material_coeffs


def make_newmark_integrator(
    model: FemModel,
    *,
    E: float = 20.0,
    v: float = 0.3,
    density: float = 1.0,
    rayleigh: Tuple[float, float] = (0.0, 0.0),
    dt: float,
    beta: float = 0.25,
    gamma: float = 0.5,
):
    """Build ``integrate(u0, v0, F) -> (us, vels, accs)`` on the free dofs.

    ``F`` is the (nsteps, nfree) external load at steps 1..nsteps (use
    ``jnp.outer(scale_t, model.f_free)`` for proportional loading); ``u0``,
    ``v0`` are (nfree,) initial displacement/velocity. Returns the full
    (nsteps, nfree) trajectories. Everything under one ``lax.scan``.
    """
    from ..eval.modal import assemble_mass

    if model.k_lam_ff is None:
        raise ValueError("transient dynamics needs a dense model (dense=True)")
    c0, c1 = material_coeffs(model.stype, E, v)
    K = float(c0) * np.asarray(model.k_lam_ff) + float(c1) * np.asarray(model.k_mu_ff)
    if model.has_springs:
        free = np.asarray(model.free_dof)
        K[np.diag_indices_from(K)] += np.asarray(model.spring_diag)[free]
    M = assemble_mass(model, density)
    a_r, b_r = (float(rayleigh[0]), float(rayleigh[1]))
    C = a_r * M + b_r * K
    b1 = 1.0 / (beta * dt * dt)
    b2 = 1.0 / (beta * dt)
    b3 = 1.0 / (2.0 * beta) - 1.0
    g1 = gamma / (beta * dt)
    g2 = gamma / beta - 1.0
    g3 = dt * (gamma / (2.0 * beta) - 1.0)
    Keff_inv = np.linalg.inv(K + g1 * C + b1 * M)
    M_inv = np.linalg.inv(M)

    dtt = model.dtype
    Kj = jnp.asarray(K, dtt)
    Mj = jnp.asarray(M, dtt)
    Cj = jnp.asarray(C, dtt)
    Keff_inv_j = jnp.asarray(Keff_inv, dtt)
    M_inv_j = jnp.asarray(M_inv, dtt)
    hp = jax.lax.Precision.HIGHEST

    damped = a_r != 0.0 or b_r != 0.0

    def integrate(u0, v0, F, f0=None):
        # consistent initial acceleration: M a0 = f(t=0) - C v0 - K u0.
        # ``f0`` is the load AT t=0; it defaults to F[0] (exact for step /
        # constant loads) — pass it explicitly for ramps/sinusoids whose
        # t=0 value differs from the step-1 value.
        f_t0 = F[0] if f0 is None else f0
        a0 = M_inv_j @ (f_t0 - (Cj @ v0 if damped else 0.0) - Kj @ u0)

        def step(carry, f):
            u, vel, acc = carry
            rhs = f + jnp.matmul(
                Mj, b1 * u + b2 * vel + b3 * acc, precision=hp
            )
            if damped:  # trace-time: skip the dense zero-C matvec otherwise
                rhs = rhs + jnp.matmul(
                    Cj, g1 * u + g2 * vel + g3 * acc, precision=hp
                )
            u1 = jnp.matmul(Keff_inv_j, rhs, precision=hp)
            acc1 = b1 * (u1 - u) - b2 * vel - b3 * acc
            vel1 = vel + dt * ((1.0 - gamma) * acc + gamma * acc1)
            return (u1, vel1, acc1), (u1, vel1, acc1)

        _, (us, vels, accs) = jax.lax.scan(step, (u0, v0, a0), F)
        return us, vels, accs

    return integrate


def make_newmark_finite_strain(
    model: FemModel,
    mat,
    *,
    density: float = 1.0,
    dt: float,
    beta: float = 0.25,
    gamma: float = 0.5,
    newton_tol: float = 1e-12,
    newton_iter: int = 20,
    cg_tol: float = 1e-11,
    cg_maxiter: int = 2000,
):
    """Implicit NONLINEAR (finite-strain Neo-Hookean) Newmark dynamics.

    Composition of the energy-based finite-strain module and the Newmark
    scheme, fully matrix-free: each time step solves
    ``M a(u) + grad Psi(u) = f`` by Newton with the exact consistent
    tangent ``b1 M + H_Psi(u)`` applied as an autodiff HVP inside CG, and
    the whole trajectory is ONE ``lax.scan`` (the Newton and CG loops are
    ``lax.while_loop``s, so everything jits/differentiates). The linear
    small-amplitude limit reproduces ``make_newmark_integrator``.

    ``mat``: a ``NeoHookean(lam, mu)``. Returns
    ``integrate(u0, v0, F, f0=None) -> (us, vels, accs)`` on FULL dof
    vectors (fixed dofs zero); ``F (nsteps, ndof)`` external loads.
    """
    from .assembly import make_sorted_scatter
    from .finite_strain import NeoHookean, _linear_jacobi, make_total_potential
    from .newton import newton_raphson
    from .solve import pcg

    if model.me_unit is None:
        raise ValueError("build the model with with_mass=True")
    mask = model.free_mask
    lm = model.lm
    scatter = make_sorted_scatter(lm, model.ndof)
    me = density * model.me_unit

    def Mv(v):
        return scatter(jnp.einsum("eij,ej->ei", me, v[lm]))

    b1 = 1.0 / (beta * dt * dt)
    b2 = 1.0 / (beta * dt)
    b3 = 1.0 / (2.0 * beta) - 1.0

    # elastic-only potential (external work handled explicitly per step)
    potential = make_total_potential(model, f_ext=jnp.zeros(model.ndof, model.dtype))
    grad_int = jax.grad(potential, argnums=0)
    # Jacobi preconditioner of the effective tangent b1*M + K_lin
    m_diag = scatter(jnp.diagonal(me, axis1=-2, axis2=-1))
    k_minv = _linear_jacobi(model)(mat.lam, mat.mu)
    d_eff = 1.0 / k_minv + b1 * m_diag
    d_eff = jnp.where(mask > 0, d_eff, 1.0)
    minv_eff = 1.0 / d_eff
    m_only_minv = jnp.where(mask > 0, 1.0 / jnp.where(m_diag == 0, 1.0, m_diag), 1.0)

    def integrate(u0, v0, F, f0=None):
        f_t0 = F[0] if f0 is None else f0
        # consistent a0: M a0 = f(0) - grad Psi(u0), solved by CG on M
        r0 = (f_t0 - grad_int(u0, mat)) * mask

        def mv_mass(v):
            return Mv(v * mask) * mask + v * (1.0 - mask)

        a0, _, _ = pcg(mv_mass, r0, m_only_minv, tol=cg_tol, maxiter=cg_maxiter)
        a0 = a0 * mask

        def step(carry, f):
            u_n, v_n, a_n = carry

            def residual(u):
                acc = b1 * (u - u_n) - b2 * v_n - b3 * a_n
                return (Mv(acc * mask) + grad_int(u, mat) - f) * mask

            def tangent_solve(x, r):
                def hvp(v):
                    vm = v * mask
                    _, hv = jax.jvp(residual, (x,), (vm,))
                    return hv * mask + v * (1.0 - mask)

                du, _, _ = pcg(hvp, -r * mask, minv_eff, tol=cg_tol, maxiter=cg_maxiter)
                return du * mask

            res = newton_raphson(
                residual, tangent_solve, u_n, tol_cr=newton_tol,
                max_iter=newton_iter,
            )
            u1 = res.u
            a1 = (b1 * (u1 - u_n) - b2 * v_n - b3 * a_n) * mask
            v1 = v_n + dt * ((1.0 - gamma) * a_n + gamma * a1)
            return (u1, v1, a1), (u1, v1, a1)

        _, (us, vels, accs) = jax.lax.scan(step, (u0 * mask, v0 * mask, a0), F)
        return us, vels, accs

    return integrate


def total_energy(model: FemModel, us, vels, *, E=20.0, v=0.3, density=1.0):
    """Trajectory of total mechanical energy 0.5 v'Mv + 0.5 u'Ku (free dofs)
    — the conservation diagnostic for undamped average-acceleration runs."""
    from ..eval.modal import assemble_mass

    c0, c1 = material_coeffs(model.stype, E, v)
    Kh = float(c0) * np.asarray(model.k_lam_ff) + float(c1) * np.asarray(
        model.k_mu_ff
    )
    if model.has_springs:
        # the integrator's operator includes diag(s) — so must the energy
        free = np.asarray(model.free_dof)
        Kh[np.diag_indices_from(Kh)] += np.asarray(model.spring_diag)[free]
    K = jnp.asarray(Kh, model.dtype)
    M = jnp.asarray(assemble_mass(model, density), model.dtype)
    ke = 0.5 * jnp.einsum("ti,ij,tj->t", vels, M, vels)
    pe = 0.5 * jnp.einsum("ti,ij,tj->t", us, K, us)
    return ke + pe
