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
