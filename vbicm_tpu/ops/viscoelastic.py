"""Linear viscoelasticity: generalized Maxwell (Prony series) with history.

Second member of the path-dependent material family (with J2 plasticity,
``ops.plasticity``) on the reference's allocated-but-driverless inelastic
storage surface (``src/fem_preprocess.py:486-501``, ``ele_hsv`` history
slots; empty ``mat_type == 99`` driver, ``src/mat_subroutine.py:210-215``).
Rate-DEPENDENT where plasticity is rate-independent: stress relaxation,
creep, hereditary integrals.

Model: deviatoric generalized Maxwell solid, elastic bulk response.

    sigma_dev(t) = 2 mu_inf e(t) + sum_i s_i(t),
    tau_i ds_i/dt + s_i = 2 mu_i tau_i de/dt

TPU-first formulation — exponential time integrator + affine solves:

  * The exact integrator for piecewise-linear strain (Herrmann-Peterson
    recurrence) is

        s_i^{n+1} = a_i s_i^n + 2 mu_i b_i (e^{n+1} - e^n),
        a_i = exp(-dt/tau_i),   b_i = (1 - a_i) / (dt/tau_i)

    which makes every time step LINEAR in u^{n+1} with an effective shear
    modulus mu_eff = mu_inf + sum_i mu_i b_i and a known history load.
    Each step is therefore ONE spectral affine solve
    (``ops.solve.make_spectral_affine_solver`` — two MXU matmuls) with a
    history right-hand side; the whole trajectory is a ``lax.scan`` of
    solves, no Newton iteration anywhere.
  * Gradients w.r.t. (mu_inf, mu_i, tau_i, lam) flow through the scan via
    the solver's eigen-coordinate custom VJP — no bespoke adjoint needed
    (every step is already a differentiable primitive).

Limits pinned in tests/test_viscoelastic.py: dt/tau -> 0 freezes the
branches at the INSTANTANEOUS modulus mu_0 = mu_inf + sum mu_i (elastic
parity with the linear solver); dt/tau -> inf relaxes to the LONG-TERM
modulus mu_inf; the point-wise relaxation function under a strain step
matches the Prony series G(t) = mu_inf + sum_i mu_i exp(-t/tau_i) to 1e-12;
creep compliance is monotone; parameter gradients match finite differences
through the full trajectory.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MaxwellMaterial(NamedTuple):
    """(lam, mu_inf + sum mu) are the INSTANTANEOUS Lame parameters (the
    t=0 elastic response); the bulk modulus K_b = lam + 2 mu_0 / 3 stays
    elastic (no bulk viscosity).  mu / tau: Prony branch shear moduli and
    relaxation times, shape (n_branch,)."""

    lam: jax.Array
    mu_inf: jax.Array
    mu: jax.Array  # (nb,)
    tau: jax.Array  # (nb,)

    @property
    def mu0(self):
        """Instantaneous (glassy) shear modulus."""
        return self.mu_inf + jnp.sum(self.mu)

    @property
    def k_bulk(self):
        return self.lam + 2.0 * self.mu0 / 3.0


def relaxation_modulus(mat: MaxwellMaterial, t):
    """G(t) = mu_inf + sum_i mu_i exp(-t/tau_i) — the Prony series."""
    return mat.mu_inf + jnp.sum(
        mat.mu * jnp.exp(-t[..., None] / mat.tau), axis=-1
    )


def _branch_coeffs(mat: MaxwellMaterial, dt):
    """a_i = exp(-dt/tau_i); b_i = (1-a_i)/(dt/tau_i), the exact exponential
    integrator weights (b -> 1 as dt/tau -> 0; smooth via expm1)."""
    x = dt / mat.tau
    a = jnp.exp(-x)
    # (1 - e^-x)/x, accurate for small x
    b = -jnp.expm1(-x) / jnp.where(x == 0, 1.0, x)
    b = jnp.where(x == 0, jnp.ones_like(b), b)
    return a, b


class ViscoResult(NamedTuple):
    u: jax.Array  # (n_steps, ndof) displacement trajectory
    s: jax.Array  # (nb, nele, nqpt, 3) final branch deviatoric stresses


def _strain_op(model):
    """eps3(u_total) per qpt and its transpose (internal-force scatter)."""
    from .assembly import make_sorted_scatter

    B = model.B
    lm = model.lm
    dvol = model.dvol
    scatter = make_sorted_scatter(jnp.asarray(lm), model.ndof)

    def eps_of(ut):
        return jnp.einsum("eqai,ei->eqa", B, ut[lm])

    def fint_of(sig3):
        fe = jnp.einsum("eqai,eqa,eq->ei", B, sig3, dvol)
        return scatter(fe)

    return eps_of, fint_of


def _dev3(eps3):
    """Plane-strain deviatoric strain in B-rows form (e11, e22, g12):
    returns the TENSOR deviatoric components (d11, d22, d33, d12)."""
    tr = eps3[..., 0] + eps3[..., 1]
    d11 = eps3[..., 0] - tr / 3.0
    d22 = eps3[..., 1] - tr / 3.0
    d33 = -tr / 3.0
    d12 = 0.5 * eps3[..., 2]
    return jnp.stack([d11, d22, d33, d12], axis=-1)


def make_viscoelastic_solver(
    model,
    *,
    dt: float,
    n_steps: int,
    load_history: Callable | None = None,
) -> Callable:
    """``solve(mat) -> ViscoResult`` — quasi-static viscoelastic trajectory
    under the model's external load scaled by ``load_history(t)`` (default:
    unit step at t=0, i.e. a CREEP test).  Plane strain.

    Each step solves the linear system

        K(lam, mu_eff) u^{n+1} = f_ext(t) - f_hist(s^n, e^n)

    through the spectral pencil solver (differentiable in coefficients AND
    rhs), so the whole trajectory differentiates in every material
    parameter by plain autodiff through the scan.
    """
    if getattr(model, "stype", 2) != 2:
        raise NotImplementedError("viscoelasticity: plane-strain models only")
    if not model.dense:
        raise ValueError("viscoelasticity uses the dense spectral path; "
                         "build the model with dense=True")
    from .solve import make_spectral_affine_solver

    parts = jnp.stack([model.k_lam_ff, model.k_mu_ff])
    solve_ff = make_spectral_affine_solver(parts)
    free = jnp.asarray(model.free_dof)
    mask = model.free_mask
    eps_of, fint_of = _strain_op(model)
    f_ext = model.f_ext * mask
    nele, nqpt = model.nele, model.nqpt
    dtype = model.dtype
    ts = (jnp.arange(1, n_steps + 1, dtype=dtype)) * dt
    if load_history is None:
        load_history = lambda t: jnp.ones_like(t)

    def solve(mat: MaxwellMaterial):
        a, b = _branch_coeffs(mat, jnp.asarray(dt, dtype))
        mu_eff = mat.mu_inf + jnp.sum(mat.mu * b)
        # elastic bulk: sigma = K_b tr I + 2 mu_eff dev + sig_hist
        # == lam_eff tr I + 2 mu_eff eps with lam_eff = K_b - 2 mu_eff / 3,
        # so the precomputed (k_lam, k_mu) affine pencil serves every step
        lam_eff = mat.k_bulk - 2.0 * mu_eff / 3.0
        nb = mat.mu.shape[0]
        s0 = jnp.zeros((nb, nele, nqpt, 4), dtype)
        e0 = jnp.zeros((nele, nqpt, 4), dtype)
        u0 = jnp.zeros((model.ndof,), dtype)

        def body(carry, t):
            s, e_prev, _ = carry
            # known history stress: sum_i a_i s_i^n - 2 (sum_i mu_i b_i) e^n
            # (deviatoric 4-tensor); B-rows (11, 22, 12); the s33 row does
            # no virtual work under plane strain (delta e33 = 0)
            sig_hist4 = jnp.einsum("i,ieqa->eqa", a, s) - 2.0 * jnp.sum(
                mat.mu * b
            ) * e_prev
            f_h = fint_of(
                jnp.stack(
                    [sig_hist4[..., 0], sig_hist4[..., 1], sig_hist4[..., 3]],
                    axis=-1,
                )
            )
            rhs = (load_history(t) * f_ext - f_h)[free]
            coeffs = jnp.stack([lam_eff, mu_eff])
            uf = solve_ff(coeffs, rhs)
            ut = jnp.zeros((model.ndof,), dtype).at[free].set(uf)
            e_new = _dev3(eps_of(ut))
            s_new = a[:, None, None, None] * s + 2.0 * (mat.mu * b)[
                :, None, None, None
            ] * (e_new - e_prev)[None]
            return (s_new, e_new, ut), ut

        (s, _, _), us = jax.lax.scan(body, (s0, e0, u0), ts)
        return ViscoResult(u=us, s=s[..., [0, 1, 3]])

    return solve
