"""Newton-Raphson driver for (future) nonlinear problems.

The reference carries a full nonlinear solver configuration (NR control,
line search, arc length — ``model_property_cards.py:39-68``) but ships with
``solver=1`` and only the one-iteration linear path live
(``src/fem_solver.py:68-126``). This module provides the generic NR loop as
a first-class API so nonlinear materials slot in later without touching the
training stack: a residual function, a tangent-solve, and the reference's
convergence semantics (energy norm ``|du . R|`` by default, residual norm
with ``tol_Rforce=1``, ``src/fem_solver.py:106-113``).

For the linear problem the loop converges in exactly one iteration and
reproduces the linear solve bit-for-bit — tested against ``fea_solution``.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class NewtonResult(NamedTuple):
    u: jax.Array
    iterations: jax.Array
    tol: jax.Array  # final convergence measure
    converged: jax.Array


def newton_raphson(
    residual: Callable,
    tangent_solve: Callable,
    u0,
    *,
    tol_cr: float = 1e-10,
    max_iter: int = 10,
    use_residual_norm: bool = False,
    backtrack: int = 0,
) -> NewtonResult:
    """Solve ``residual(u) = 0`` by Newton iteration.

    residual: u -> R (same shape as u; must vanish on fixed dofs).
    tangent_solve: (u, R) -> du with ``K_T(u) du = -R`` (any of the
    differentiable solvers in ``ops.solve`` partial-applied).
    Convergence: energy norm ``|du . R_new|`` (reference ``tol_Rforce=0``)
    or residual 2-norm. Pure ``lax.while_loop`` — jit/vmap compatible.

    ``backtrack > 0`` enables a monotone-residual line search (the
    reference's line-search control card, ``model_property_cards.py:50-56``):
    the step is halved up to ``backtrack`` times until ``|R(u + s du)| <=
    |R(u)|`` — essential for strongly softening materials where the full
    Newton step overshoots.
    """
    r0 = residual(u0)

    def cond(state):
        u, r, tol, it, converged = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(converged))

    def body(state):
        u, r, _, it, _ = state
        du = tangent_solve(u, r)
        rn_prev = jnp.vdot(r, r)
        u_new = u + du
        r_new = residual(u_new)
        if backtrack > 0:
            def ls_cond(ls):
                s, u_t, r_t, k = ls
                return jnp.logical_and(jnp.vdot(r_t, r_t) > rn_prev, k < backtrack)

            def ls_body(ls):
                s, _, _, k = ls
                s2 = 0.5 * s
                u_t = u + s2 * du
                return s2, u_t, residual(u_t), k + 1

            _, u_new, r_new, _ = jax.lax.while_loop(
                ls_cond, ls_body, (jnp.asarray(1.0, u0.dtype), u_new, r_new, jnp.array(0))
            )
        if use_residual_norm:
            tol = jnp.linalg.norm(r_new)
        else:
            tol = jnp.abs(jnp.vdot(du, r_new))
        return u_new, r_new, tol, it + 1, tol < tol_cr

    big = jnp.asarray(jnp.inf, u0.dtype)
    u, r, tol, it, conv = jax.lax.while_loop(
        cond, body, (u0, r0, big, jnp.array(0), jnp.array(False))
    )
    return NewtonResult(u=u, iterations=it, tol=tol, converged=conv)
