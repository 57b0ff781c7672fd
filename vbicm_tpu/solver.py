"""Forward FEM solve and the differentiable observation operator.

The functional replacement for the reference's solver drivers
(``FemSolver.fea_solution`` in ``src/fem_solver.py:13`` /
``src/fem_solver_tf.py:14``): one pure function from material parameters to
the full solution state, differentiable end to end through the linear solve
(custom VJP, see ``ops.solve``), with the probe observables
``fh(theta) -> (y, h)`` of ``src/data_generation_2sam_more_loss.py:177-192``
as a ``vmap``-able pure function.

For the reference's linear problem the "Newton" iteration collapses to a
single solve ``K(lam, mu) u_f = f_f`` (the reference runs exactly one NR
iteration too, with the convergence check disabled in the TF path,
``src/fem_solver_tf.py:183``).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .config import MaterialCard, ProblemConfig
from .model import FemModel
from .ops.element import (
    eps33_plane_stress,
    material_coeffs,
    stress6_plane_strain,
    stress6_plane_stress,
)
from .ops.solve import (
    make_dense_affine_solver,
    make_matfree_affine_solver,
    make_spectral_affine_solver,
)
from .ops.vonmises import von_mises_reference


@struct.dataclass
class FemSolution:
    """Result of one forward analysis (reference out_data equivalents)."""

    u: jax.Array  # (ndof,) nodal displacements, supports = 0
    strain: jax.Array  # (nele, nqpt, 6) [e11, e22, e33, g12, g23, g31]
    stress: jax.Array  # (nele, nqpt, 6) [s11, s22, s33, t12, t23, t31]
    reactions: jax.Array  # (ndof,) support reactions (nonzero on supp dofs)

    def nodal_disp(self, nnodes: int, ndm: int = 2) -> jax.Array:
        """(ndm, nnodes) layout of the reference's ``nodal_disp``
        (``src/fem_solver.py:153``). For models with equality constraints
        expand first: ``expand_dofs(model, sol.u).reshape(nnodes, ndm).T``."""
        return self.u.reshape(nnodes, ndm).T


def expand_dofs(model: FemModel, v) -> jax.Array:
    """Solver-space vector -> full node-dof layout (pure gather; identity
    for unconstrained models). Use for nodal presentation of u/reactions on
    models built with ``eq_groups``."""
    return v[model.dof_map]


def make_solver(
    model: FemModel,
    *,
    method: str = "spectral",
    factor_dtype=None,
    refine_iters: int = 0,
    cg_tol: float = 1e-12,
    cg_maxiter: int = 4000,
) -> Callable:
    """Build ``solve_free(lam, mu) -> u (ndof,)`` for this model.

    Dense models, method:
      * "spectral" (default) — one-time (K_lam, K_mu) pencil diagonalization;
        every solve is two MXU matmuls + a diagonal scale (see
        ``ops.solve.make_spectral_affine_solver``). ``factor_dtype`` selects
        the matmul precision of the apply.
      * "cholesky"/"inverse" — per-sample factorization paths.
    Matrix-free models: Jacobi-PCG on the element operator.
    """
    if model.has_springs and not model.dense:
        raise NotImplementedError(
            "nodal springs are carried as a third dense affine part; build "
            "the model with dense=True (the reference's spring card targets "
            "small compliant-mechanism models, src/fem_solver.py:277-286)"
        )
    if model.dense:
        if model.has_springs:
            # 3-term affine c0*K_lam + c1*K_mu + 1*diag(s): the 2-term
            # spectral pencil no longer applies — Cholesky/inverse paths
            # are P-generic, so route "spectral" to "cholesky".
            s_ff = jnp.diag(model.spring_diag[model.free_dof])
            parts = jnp.stack([model.k_lam_ff, model.k_mu_ff, s_ff])
            base = make_dense_affine_solver(
                parts,
                factor_dtype=factor_dtype,
                refine_iters=refine_iters,
                method="cholesky" if method == "spectral" else method,
            )
            rhs = _make_lifted_rhs(model)
            embed = _make_free_embed(model, with_prescribed=True)
            one = jnp.asarray(1.0, model.dtype)

            def solve_free(lam, mu):
                coeffs = jnp.stack([lam, mu, one])
                return embed(base(coeffs, rhs(lam, mu)))

            return solve_free
        parts = jnp.stack([model.k_lam_ff, model.k_mu_ff])
        if method == "spectral":
            base = make_spectral_affine_solver(
                parts, apply_dtype=factor_dtype, refine_iters=refine_iters
            )
        else:
            base = make_dense_affine_solver(
                parts, factor_dtype=factor_dtype, refine_iters=refine_iters, method=method
            )
        rhs = _make_lifted_rhs(model)
        embed = _make_free_embed(model, with_prescribed=True)

        def solve_free(lam, mu):
            coeffs = jnp.stack([lam, mu])
            return embed(base(coeffs, rhs(lam, mu)))

        return solve_free

    ke_parts = jnp.stack([model.ke_lam, model.ke_mu])
    base = make_matfree_affine_solver(
        ke_parts,
        model.lm,
        model.free_mask,
        model.ndof,
        tol=cg_tol,
        maxiter=cg_maxiter,
        cg_dtype=factor_dtype,
        refine_iters=refine_iters,
    )
    f_masked = model.f_ext * model.free_mask
    if model.has_prescribed:
        g_lam_full = _embed_free_vec(model, model.g_lam_f)
        g_mu_full = _embed_free_vec(model, model.g_mu_f)
        u_s_full = _prescribed_full(model)

        def solve_free(lam, mu):
            b = f_masked - lam * g_lam_full - mu * g_mu_full
            return base(jnp.stack([lam, mu]), b) + u_s_full

        return solve_free

    def solve_free(lam, mu):
        coeffs = jnp.stack([lam, mu])
        return base(coeffs, f_masked)

    return solve_free


def _embed_free_vec(model: FemModel, v_f):
    """Static (build-time) embed of a free-dof vector into full dof space."""
    import numpy as np

    full = np.zeros(model.ndof)
    full[np.asarray(model.free_dof)] = np.asarray(v_f)
    return jnp.asarray(full, model.dtype)


def _make_free_embed(model: FemModel, *, with_prescribed: bool = False):
    """free-dof vector -> full-dof vector with zeros (or, when
    ``with_prescribed``, the model's prescribed ``u_supp`` values) on
    supports, as a pure GATHER through a static permutation (``.at[free].set``
    scatter is miscompiled under vmap on the axon TPU runtime,
    docs/KNOWN_ISSUES.md)."""
    import numpy as np

    order = np.concatenate([np.asarray(model.free_dof), np.asarray(model.supp_dof)])
    inv = jnp.asarray(np.argsort(order).astype(np.int32))
    nsupp = int(model.supp_dof.shape[0])
    u_s = model.u_supp if with_prescribed and model.has_prescribed else None

    def embed(u_f):
        tail = (
            jnp.zeros((nsupp,), u_f.dtype)
            if u_s is None
            else u_s.astype(u_f.dtype)
        )
        padded = jnp.concatenate([u_f, tail])
        return padded[inv]

    return embed


def _make_lifted_rhs(model: FemModel):
    """``rhs(c0, c1) -> f_free - c0*g_lam_f - c1*g_mu_f`` (Dirichlet lift;
    reference src/fem_solver.py:74-101). Constant when nothing prescribed."""
    if not model.has_prescribed:
        return lambda c0, c1: model.f_free
    return lambda c0, c1: model.f_free - c0 * model.g_lam_f - c1 * model.g_mu_f


def _prescribed_full(model: FemModel):
    """Static full-dof vector of prescribed values (zeros on free dofs)."""
    import numpy as np

    full = np.zeros(model.ndof)
    full[np.asarray(model.supp_dof)] = np.asarray(model.u_supp)
    return jnp.asarray(full, model.dtype)


def _stress6(model: FemModel, eps3, c0, c1):
    if model.stype == 2:
        return stress6_plane_strain(eps3, c0, c1)
    if model.stype == 3:
        from .ops.element import stress6_axisym

        return stress6_axisym(eps3, c0, c1)
    if model.stype == 4:  # 3-D solid: eps3 is the full 6-strain
        from .ops.element import stress6_3d

        return stress6_3d(eps3, c0, c1)
    return stress6_plane_stress(eps3, c0, c1)


def recover_fields(model: FemModel, u, c0, c1) -> Tuple[jax.Array, jax.Array]:
    """Per-(element, qpt) strain/stress 6-vectors from the displacement field.

    (c0, c1) are the affine material coefficients — (lam, mu) for plane
    strain, (b, a) for plane stress (see ``ops.element.material_coeffs``).
    Matches reference storage (``src/mat_subroutine.py:76-81``): plane strain
    stores e33 = 0 but s33 = lam*(e11+e22); plane stress stores s33 = 0 but
    e33 = -v/(1-v)*(e11+e22) (``src/mat_subroutine.py:51-52,289``).
    """
    ue = u[model.lm]  # (nele, edof)
    eps3 = jnp.einsum("eqai,ei->eqa", model.B, ue)  # (nele, nqpt, 3/4/6)
    sig6 = _stress6(model, eps3, c0, c1)
    zero = jnp.zeros_like(eps3[..., 0])
    if model.stype == 4:
        # 3-D solid: B already produces the full 6-strain
        return eps3, sig6
    if model.stype == 3:
        # axisym strain rows are [e_rr, e_zz, e_hoop, g_rz] already
        eps6 = jnp.stack(
            [eps3[..., 0], eps3[..., 1], eps3[..., 2], eps3[..., 3], zero, zero],
            axis=-1,
        )
        return eps6, sig6
    if model.stype == 1:
        e33 = eps33_plane_stress(eps3, c0 / c1)  # v = b/a
    else:
        e33 = zero
    eps6 = jnp.stack(
        [eps3[..., 0], eps3[..., 1], e33, eps3[..., 2], zero, zero], axis=-1
    )
    return eps6, sig6


def fea_solution(
    model: FemModel,
    material: MaterialCard = MaterialCard(),
    *,
    solve_free: Optional[Callable] = None,
) -> FemSolution:
    """Full forward analysis for a given material (reference ``fea_solution``)."""
    c0, c1 = material_coeffs(model.stype, material.E, material.v)
    c0 = jnp.asarray(c0, model.dtype)
    c1 = jnp.asarray(c1, model.dtype)
    if solve_free is None:
        solve_free = make_solver(model)
    u = solve_free(c0, c1)
    eps6, sig6 = recover_fields(model, u, c0, c1)
    # support reactions = F_int on supported dofs (reference
    # ``update_nodal_data``, src/fem_solver.py:155-160)
    ke = c0 * model.ke_lam + c1 * model.ke_mu
    fe = jnp.einsum("eij,ej->ei", ke, u[model.lm])
    f_int = jnp.zeros((model.ndof,), dtype=u.dtype).at[model.lm.reshape(-1)].add(fe.reshape(-1))
    if model.has_springs:
        # spring internal force ks*u (reference F_int update,
        # src/fem_solver.py:285-286)
        f_int = f_int + model.spring_diag * u
    reactions = f_int * (1.0 - model.free_mask)
    return FemSolution(u=u, strain=eps6, stress=sig6, reactions=reactions)


def probe_von_mises(model: FemModel, u, c0, c1, ele_id: int, nipt_id) -> jax.Array:
    """Reference-convention von Mises at 1-based element/qpt probe ids
    (``src/fem_postprocess.py:163-170``). (c0, c1) = affine material
    coefficients (lam, mu) for plane strain."""
    e = ele_id - 1
    q = jnp.asarray(nipt_id) - 1
    ue = u[model.lm[e]]
    eps3 = jnp.einsum("qai,i->qa", model.B[e, q], ue)
    sig6 = _stress6(model, eps3, c0, c1)
    return von_mises_reference(sig6)


def make_fh_fun(
    model: FemModel,
    cfg: ProblemConfig = ProblemConfig(),
    *,
    method: str = "spectral",
    factor_dtype=None,
    refine_iters: int = 0,
    cg_tol: float = 1e-12,
    cg_maxiter: int = 4000,
    solve_free: Optional[Callable] = None,
) -> Callable:
    """Build the observation operator ``fh(theta) -> (y, h)``.

    ``solve_free`` overrides the solver (e.g. a two-level preconditioned one
    from :func:`make_two_level_solver`).

    theta: (2,) standard-normal parameters; the map to (E, nu) follows
    ``main_custom_training.py:32`` / ``src/data_generation_2sam_more_loss.py:182-186``:
        E  = exp(std0 * t0 + mean0)
        nu = 0.5 * sigmoid(std1 * t1 + mean1)
    y = (ux, uy) at ``cfg.node_id``; h = reference von Mises at
    ``cfg.ele_id``, qpts ``cfg.nipt_id``. Batch with ``jax.vmap(fh)``.
    """
    if solve_free is None:
        solve_free = make_solver(
            model,
            method=method,
            factor_dtype=factor_dtype,
            refine_iters=refine_iters,
            cg_tol=cg_tol,
            cg_maxiter=cg_maxiter,
        )
    tm = jnp.asarray(cfg.theta_map.theta_mean, model.dtype)
    ts = jnp.asarray(cfg.theta_map.theta_std, model.dtype)
    if not (1 <= cfg.node_id <= model.nnodes):
        raise ValueError(f"probe node_id {cfg.node_id} outside [1, {model.nnodes}]")
    if not (1 <= cfg.ele_id <= model.nele):
        raise ValueError(f"probe ele_id {cfg.ele_id} outside [1, {model.nele}]")
    # probe indices live in the full node-dof layout; map into the solver
    # (reduced) space — identity unless equality constraints are active
    obs_full = model.ndm * (cfg.node_id - 1) + np.arange(model.ndm)
    obs_dofs = jnp.asarray(np.asarray(model.dof_map)[obs_full])
    e = cfg.ele_id - 1
    q = jnp.asarray(cfg.nipt_id, dtype=jnp.int32) - 1
    B_probe = model.B[e, q]  # (nq, 3, 8)
    lm_probe = model.lm[e]

    def fh(theta):
        theta = jnp.asarray(theta, model.dtype)
        E = jnp.exp(ts[0] * theta[0] + tm[0])
        v = 0.5 * jax.nn.sigmoid(ts[1] * theta[1] + tm[1])
        c0, c1 = material_coeffs(model.stype, E, v)
        u = solve_free(c0, c1)
        y = u[obs_dofs]
        eps3 = jnp.einsum("qai,i->qa", B_probe, u[lm_probe])
        sig6 = _stress6(model, eps3, c0, c1)
        h = von_mises_reference(sig6)
        return y, h

    return fh


def make_fh_fun_nonlinear(
    model: FemModel,
    cfg: ProblemConfig = ProblemConfig(),
    *,
    g0: float = 0.05,
    m: float = 1.0,
    **newton_kw,
) -> Callable:
    """Observation operator ``fh(theta) -> (y, h)`` through the NONLINEAR
    power-law forward model (``ops.nonlinear``) — amortized VI on a
    nonlinear constitutive law, beyond the reference's linear-only pipeline
    (its nonlinear control cards, ``model_property_cards.py:39-68``, are
    dormant).

    Same theta -> (E, nu) map and probe layout as :func:`make_fh_fun`;
    (E, nu) -> Lame (lam, mu) feeds :func:`ops.nonlinear.make_nonlinear_solver`
    (Newton + HVP-CG tangent, implicit-adjoint VJP), and the probe stress is
    the power-law secant stress ``stress6_power_law`` so h(theta) is the von
    Mises of the ACTUAL nonlinear constitutive response. ``m = 1`` reproduces
    :func:`make_fh_fun` exactly (a test pins values and gradients).

    Batch with ``jax.vmap(fh)`` — the Newton/CG ``lax.while_loop``s batch
    natively. Pass straight into ``TwoStepTrainer(fh=...)``.
    """
    from .ops.nonlinear import (
        PowerLawMaterial,
        make_nonlinear_solver,
        stress6_power_law,
    )

    solve = make_nonlinear_solver(model, g0=g0, m=m, **newton_kw)
    tm = jnp.asarray(cfg.theta_map.theta_mean, model.dtype)
    ts = jnp.asarray(cfg.theta_map.theta_std, model.dtype)
    if not (1 <= cfg.node_id <= model.nnodes):
        raise ValueError(f"probe node_id {cfg.node_id} outside [1, {model.nnodes}]")
    if not (1 <= cfg.ele_id <= model.nele):
        raise ValueError(f"probe ele_id {cfg.ele_id} outside [1, {model.nele}]")
    obs_full = model.ndm * (cfg.node_id - 1) + np.arange(model.ndm)
    obs_dofs = jnp.asarray(np.asarray(model.dof_map)[obs_full])
    e = cfg.ele_id - 1
    q = jnp.asarray(cfg.nipt_id, dtype=jnp.int32) - 1
    B_probe = model.B[e, q]
    lm_probe = model.lm[e]

    def fh(theta):
        theta = jnp.asarray(theta, model.dtype)
        E = jnp.exp(ts[0] * theta[0] + tm[0])
        v = 0.5 * jax.nn.sigmoid(ts[1] * theta[1] + tm[1])
        lam, mu = material_coeffs(model.stype, E, v)
        u = solve(lam, mu)
        y = u[obs_dofs]
        eps3 = jnp.einsum("qai,i->qa", B_probe, u[lm_probe])
        sig6 = stress6_power_law(eps3, PowerLawMaterial(lam=lam, mu=mu, g0=g0, m=m))
        h = von_mises_reference(sig6)
        return y, h

    return fh


def make_fh_fun_plasticity(
    model: FemModel,
    cfg: ProblemConfig = ProblemConfig(),
    *,
    E: float = 20.0,
    v: float = 0.3,
    sig_y0: float = 0.2,
    H0: float = 2.0,
    theta_std=(0.1, 0.1),
    n_steps: int = 5,
    load_factor: float = 1.0,
    **step_kw,
) -> Callable:
    """Observation operator ``fh(theta) -> (y, h)`` through the J2 FLOW
    plasticity forward model (``ops.plasticity``) — amortized inversion of
    YIELD parameters from a path-dependent elastoplastic response, a
    capability class the reference only allocates storage for
    (``src/fem_preprocess.py:486-501``, empty ``mat_type == 99`` driver).

    theta: (2,) standard-normal; lognormal map onto the J2 hardening curve
    (elastic moduli held at the reference material card):

        sig_y = sig_y0 * exp(theta_std[0] * t0)
        H_iso = H0    * exp(theta_std[1] * t1)

    y = probe displacements at full load AFTER the incremental history
    (n_steps increments, scan of custom-VJP Newton solves); h = reference
    von Mises of the ACTUAL elastoplastic probe stress.  Gradients flow
    through the whole load history (per-step discrete adjoints).  Batch
    with ``jax.vmap(fh)``; pass straight into ``TwoStepTrainer(fh=...)``.
    """
    from .ops.plasticity import (
        J2Material,
        make_plasticity_solver,
        stress_from_converged,
    )

    if model.stype != 2:
        raise NotImplementedError("plasticity fh: plane-strain models only")
    solve = make_plasticity_solver(
        model, n_steps=n_steps, load_factor=load_factor, **step_kw
    )
    lam0, mu0 = material_coeffs(model.stype, E, v)
    ts = jnp.asarray(theta_std, model.dtype)
    if not (1 <= cfg.node_id <= model.nnodes):
        raise ValueError(f"probe node_id {cfg.node_id} outside [1, {model.nnodes}]")
    if not (1 <= cfg.ele_id <= model.nele):
        raise ValueError(f"probe ele_id {cfg.ele_id} outside [1, {model.nele}]")
    obs_full = model.ndm * (cfg.node_id - 1) + np.arange(model.ndm)
    obs_dofs = jnp.asarray(np.asarray(model.dof_map)[obs_full])
    e = cfg.ele_id - 1
    q = jnp.asarray(cfg.nipt_id, dtype=jnp.int32) - 1
    B_probe = model.B[e, q]
    lm_probe = model.lm[e]

    def fh(theta):
        theta = jnp.asarray(theta, model.dtype)
        mat = J2Material(
            lam=jnp.asarray(lam0, model.dtype),
            mu=jnp.asarray(mu0, model.dtype),
            sig_y=sig_y0 * jnp.exp(ts[0] * theta[0]),
            H_iso=H0 * jnp.exp(ts[1] * theta[1]),
        )
        u, state = solve(mat)
        y = u[obs_dofs]
        eps3 = jnp.einsum("qai,i->qa", B_probe, u[lm_probe])
        sig6 = stress_from_converged(eps3, jax.tree_util.tree_map(
            lambda a: a[e, q], state), mat)
        h = von_mises_reference(sig6)
        return y, h

    return fh


def make_fh_fun_viscoelastic(
    model: FemModel,
    cfg: ProblemConfig = ProblemConfig(),
    *,
    E: float = 20.0,
    v: float = 0.3,
    g0: float = 0.4,
    tau0: float = 1.0,
    theta_std=(0.3, 0.5),
    dt: float = 0.25,
    n_steps: int = 8,
    obs_steps=None,
    load_history=None,
) -> Callable:
    """Observation operator ``fh(theta) -> (y, h)`` through the generalized-
    Maxwell viscoelastic forward model (``ops.viscoelastic``) — amortized
    inversion of PRONY-SERIES parameters from a creep/relaxation
    displacement TRAJECTORY. Fills the same reference surface as the
    plasticity operator (``src/fem_preprocess.py:486-501`` inelastic
    storage, empty ``mat_type == 99`` driver) with the rate-DEPENDENT
    member of the path-dependent family.

    theta: (2,) standard-normal; lognormal map onto the single Prony branch
    (instantaneous shear modulus mu0 from the elastic card held fixed —
    identifiability: the t=0 response pins mu0, the transient pins the
    branch):

        g   = g0   * exp(theta_std[0] * t0)   (branch fraction, sigmoid-capped < 1)
        tau = tau0 * exp(theta_std[1] * t1)   (relaxation time)

    so mu_1 = g * mu0 and mu_inf = (1 - g) * mu0.

    y = probe displacements (both dofs of ``cfg.node_id``) at the
    ``obs_steps`` time indices (default: every step — the full creep
    trajectory, y_dim = 2 * n_steps); h = reference von Mises of the
    ACTUAL viscoelastic probe stress (elastic bulk + Prony deviatoric
    branches) at the final time, at ``cfg.nipt_id`` of ``cfg.ele_id``.
    Gradients flow through the whole ``lax.scan`` trajectory (every step is
    a spectral affine solve with a custom VJP). Batch with
    ``jax.vmap(fh)``; pass straight into ``TwoStepTrainer(fh=...)``.
    """
    from .ops.viscoelastic import MaxwellMaterial, _dev3, make_viscoelastic_solver

    if model.stype != 2:
        raise NotImplementedError("viscoelastic fh: plane-strain models only")
    solve = make_viscoelastic_solver(
        model, dt=dt, n_steps=n_steps, load_history=load_history
    )
    lam0, mu0 = material_coeffs(model.stype, E, v)
    ts = jnp.asarray(theta_std, model.dtype)
    if not (1 <= cfg.node_id <= model.nnodes):
        raise ValueError(f"probe node_id {cfg.node_id} outside [1, {model.nnodes}]")
    if not (1 <= cfg.ele_id <= model.nele):
        raise ValueError(f"probe ele_id {cfg.ele_id} outside [1, {model.nele}]")
    obs_full = model.ndm * (cfg.node_id - 1) + np.arange(model.ndm)
    obs_dofs = jnp.asarray(np.asarray(model.dof_map)[obs_full])
    if obs_steps is None:
        obs_steps = np.arange(n_steps)
    obs_steps = jnp.asarray(np.asarray(obs_steps, dtype=np.int32))
    e = cfg.ele_id - 1
    q = jnp.asarray(cfg.nipt_id, dtype=jnp.int32) - 1
    B_probe = model.B[e, q]
    lm_probe = model.lm[e]

    def fh(theta):
        theta = jnp.asarray(theta, model.dtype)
        # branch fraction in (0, 1): lognormal ratio through g/(1+g) keeps
        # mu_inf > 0 for every theta draw (a raw lognormal can exceed 1)
        r = g0 / (1.0 - g0) * jnp.exp(ts[0] * theta[0])
        g = r / (1.0 + r)
        tau = tau0 * jnp.exp(ts[1] * theta[1])
        mat = MaxwellMaterial(
            lam=jnp.asarray(lam0, model.dtype),
            mu_inf=(1.0 - g) * mu0,
            mu=(g * mu0)[None],
            tau=tau[None],
        )
        res = solve(mat)
        y = res.u[obs_steps][:, obs_dofs].reshape(-1)
        # probe stress at final time: elastic bulk + mu_inf deviatoric +
        # Prony branch stresses (s33 recovered from the traceless property)
        u_fin = res.u[-1]
        # B_probe already gathers the cfg.nipt_id quadrature points, so
        # every per-qpt array below is (nq_sel, ...) — no second q-gather
        eps3 = jnp.einsum("qai,i->qa", B_probe, u_fin[lm_probe])  # (nq_sel, 3)
        dev_q = _dev3(eps3)  # (nq_sel, 4): d11, d22, d33, d12
        s_br = res.s[:, e, q]  # (nb, nq_sel, 3): s11, s22, s12
        s_sum = jnp.sum(s_br, axis=0)  # (nq_sel, 3)
        sd11 = 2.0 * mat.mu_inf * dev_q[..., 0] + s_sum[..., 0]
        sd22 = 2.0 * mat.mu_inf * dev_q[..., 1] + s_sum[..., 1]
        sd33 = -(sd11 + sd22)  # deviatoric: traceless
        t12 = 2.0 * mat.mu_inf * dev_q[..., 3] + s_sum[..., 2]
        tr = eps3[..., 0] + eps3[..., 1]
        p = mat.k_bulk * tr
        zero = jnp.zeros_like(sd11)
        sig6 = jnp.stack(
            [sd11 + p, sd22 + p, sd33 + p, t12, zero, zero], axis=-1
        )
        h = von_mises_reference(sig6)
        return y, h

    return fh


def make_coarse_spectral_apply(
    coarse_model: FemModel, *, f32_precision=jax.lax.Precision.HIGHEST
) -> Callable:
    """Exact coarse-grid solve ``(coeffs, r_full) -> K_c(coeffs)^-1 r_full``
    via the coarse pencil diagonalization — the coarse component of the
    two-level preconditioner (``ops.multigrid``). Matches the input dtype
    (f32 inside mixed-precision CG, f64 otherwise).

    ``f32_precision``: matmul precision of the f32 path. HIGHEST (default)
    is 6 bf16 MXU passes per matmul; inside the two-level PRECONDITIONER
    ``Precision.DEFAULT`` (one bf16 pass) is safe — the preconditioner only
    shapes the Krylov space, CG itself and the f64 refinement run on the
    exact operator — and makes the coarse apply ~6x cheaper."""
    import numpy as np
    import scipy.linalg

    g, V = scipy.linalg.eigh(
        np.asarray(coarse_model.k_lam_ff), np.asarray(coarse_model.k_mu_ff)
    )
    tables = {
        jnp.dtype(jnp.float64): (jnp.asarray(g), jnp.asarray(V)),
        jnp.dtype(jnp.float32): (
            jnp.asarray(g, jnp.float32),
            jnp.asarray(V, jnp.float32),
        ),
    }
    free = coarse_model.free_dof
    embed = _make_free_embed(coarse_model)

    def apply(coeffs, r_full):
        gj, Vj = tables[jnp.dtype(r_full.dtype)]
        r_f = r_full[free]
        d = coeffs[0].astype(r_full.dtype) * gj + coeffs[1].astype(r_full.dtype)
        hp = (
            f32_precision
            if r_full.dtype == jnp.float32
            else jax.lax.Precision.HIGHEST
        )
        u_f = jnp.matmul(Vj, jnp.matmul(Vj.T, r_f, precision=hp) / d, precision=hp)
        return embed(u_f)

    return apply


def make_two_level_solver(
    model: FemModel,
    coarse_model: FemModel,
    nx_coarse: int,
    ny_coarse: int,
    ratio: int,
    *,
    cg_dtype=None,
    refine_iters: int = 0,
    tol: float = 1e-10,
    maxiter: int = 500,
    omega: float = 0.6,
    use_stencil: bool = False,
    coarse_f32_precision=jax.lax.Precision.HIGHEST,
    refine_residual: str = "f64",
    cycle: str = "additive",
    transfer: str = "conv",
    with_rhs_solver: bool = False,
) -> Callable:
    """Matrix-free solver with the spectral-coarse two-level preconditioner
    — the production full-order path for refined Cook's meshes. Returns
    ``solve_free(c0, c1) -> u (ndof,)`` with the adjoint custom VJP.
    With ``with_rhs_solver=True`` returns ``(solve_free, solve_rhs)`` where
    ``solve_rhs(coeffs (2,), b (ndof,)) -> u`` solves against an arbitrary
    masked right-hand side with the same preconditioned CG (used by e.g.
    the matrix-free modal solver, ``eval.modal``).

    ``use_stencil``: run the whole CG iteration in structured-grid form —
    K_p applied as the 9-point block stencil (``ops.stencil``, Pallas row
    kernel for the f32 batched hot loop) and the preconditioner transfers
    as conv-form grid operators (``ops.multigrid.make_grid_transfer_conv``)
    — eliminating every gather/scatter from the hot loop. The fine grid is
    (nx_coarse*ratio, ny_coarse*ratio).

    ``refine_residual="compensated"`` (requires ``use_stencil``) computes
    refinement residuals at f64 accuracy from pure-f32 stencil arithmetic
    (``ops.stencil_compensated``) — removes the emulated-f64 matvec that
    otherwise dominates the mixed-precision solve.

    ``cycle``: "additive" (Jacobi + coarse summed; no extra matvecs) or
    "vcycle" (symmetric multiplicative V(1,1), requires ``use_stencil``) —
    see ``ops.multigrid.make_two_level_vcycle_preconditioner``.

    ``transfer`` (with ``use_stencil``): preconditioner coarse-path form,
    identical math in all three (solve parity 7e-8, tested):
      * "conv" (default) — XLA conv emitters; production.
      * "matmul" — tensor-product MXU matmuls
        (``ops.multigrid.make_grid_transfer_matmul``).
      * "dense" (additive cycle only) — the whole restrict/coarse-solve/
        prolong chain folded into two dense MXU matmuls against
        A = V^T R (``ops.multigrid.make_dense_coarse_correction``).
    Round-3 measurements at 160x80 B=256 (v5e): conv 98.1 ms/batch,
    matmul 100.0, dense 137.6 — in-loop XLA fuses the conv/spectral chain
    well enough that the folded form's 2x175 MB A-matrix HBM reads per CG
    iteration are a net loss; conv stays the default."""
    if model.has_constraints or coarse_model.has_constraints:
        raise NotImplementedError(
            "the geometric prolongation assumes the unconstrained Cook's "
            "node-dof layout; use the Jacobi-PCG or element-sharded solvers "
            "for equality-constrained models"
        )
    if model.has_springs or coarse_model.has_springs:
        raise NotImplementedError(
            "nodal springs are carried on the dense solver path only "
            "(see make_solver); the two-level operator would silently "
            "drop them"
        )
    from .ops.multigrid import cooks_prolongation, make_two_level_preconditioner
    from .ops.solve import make_matfree_affine_solver

    idx, w = cooks_prolongation(nx_coarse, ny_coarse, ratio)
    coarse_apply = make_coarse_spectral_apply(
        coarse_model, f32_precision=coarse_f32_precision
    )
    part_matvec = diag_parts = affine_matvec = grid_transfer = None
    if use_stencil:
        from .ops.multigrid import (
            make_grid_transfer_conv,
            make_grid_transfer_matmul,
        )
        from .ops.stencil import make_stencil_affine_matvec

        affine_matvec, part_matvec, diag_parts = make_stencil_affine_matvec(
            model, nx_coarse * ratio, ny_coarse * ratio
        )
        # conv-form transfers: exactly the bilinear P / P^T pair of
        # make_grid_transfer (1e-16 parity, adjoint to rounding), but via
        # XLA's TPU conv emitters — 0.74 -> 0.44 ms/CG-iteration of
        # preconditioner overhead at 160x80 B=256 (in-loop, round 3)
        if transfer == "matmul":
            grid_transfer = make_grid_transfer_matmul(nx_coarse, ny_coarse, ratio)
        elif transfer == "conv":
            grid_transfer = make_grid_transfer_conv(nx_coarse, ny_coarse, ratio)
        elif transfer == "dense":
            grid_transfer = None  # whole coarse correction folds into prec
        else:
            raise ValueError(f"unknown transfer {transfer!r}")
    elif transfer != "conv":
        # symmetric with the cycle="vcycle" guard: a non-default transfer
        # on the element (non-stencil) path would otherwise be silently
        # ignored and the caller would benchmark the wrong configuration
        raise ValueError(f"transfer={transfer!r} needs use_stencil=True")
    residual_fn = None
    if refine_residual == "compensated":
        if not use_stencil:
            raise ValueError("refine_residual='compensated' needs use_stencil=True")
        from .ops.stencil_compensated import make_compensated_residual

        residual_fn = make_compensated_residual(
            model, nx_coarse * ratio, ny_coarse * ratio
        )
    if cycle == "vcycle":
        if not use_stencil:
            raise ValueError("cycle='vcycle' needs use_stencil=True")
        if transfer == "dense":
            raise ValueError("transfer='dense' is additive-cycle only")
        from .ops.multigrid import make_two_level_vcycle_preconditioner

        mask_f32 = jnp.asarray(model.free_mask, jnp.float32)

        def _masked_mv(coeffs, x):
            return affine_matvec(coeffs, x * mask_f32) * mask_f32

        # NOTE: deliberately NOT the additive `omega` — the V-cycle
        # smoother must satisfy omega < 2/lambda_max(D^-1 K) ~ 0.5 for
        # quad4/hex8 elasticity (see make_two_level_vcycle_preconditioner)
        prec = make_two_level_vcycle_preconditioner(
            _masked_mv, grid_transfer, coarse_apply, model.free_mask,
        )
    elif cycle == "additive":
        if use_stencil and transfer == "dense":
            from .ops.multigrid import make_dense_coarse_correction

            corr = make_dense_coarse_correction(
                coarse_model, nx_coarse, ny_coarse, ratio, model.free_mask
            )
            _maskj = jnp.asarray(model.free_mask)

            def prec(coeffs, diag_inv, r):
                rm = r * _maskj.astype(r.dtype)
                return omega * diag_inv * rm + corr(coeffs, rm)

        else:
            prec, _, _ = make_two_level_preconditioner(
                idx, w, coarse_apply, model.free_mask, omega=omega,
                grid_transfer=grid_transfer,
            )
    else:
        raise ValueError(f"unknown cycle {cycle!r}")
    ke_parts = jnp.stack([model.ke_lam, model.ke_mu])
    base = make_matfree_affine_solver(
        ke_parts,
        model.lm,
        model.free_mask,
        model.ndof,
        tol=tol,
        maxiter=maxiter,
        cg_dtype=cg_dtype,
        refine_iters=refine_iters,
        preconditioner=prec,
        part_matvec=part_matvec,
        diag_parts=diag_parts,
        affine_matvec=affine_matvec,
        refine_residual=refine_residual,
        residual_fn=residual_fn,
    )
    f_masked = model.f_ext * model.free_mask
    if model.has_prescribed:
        g_lam_full = _embed_free_vec(model, model.g_lam_f)
        g_mu_full = _embed_free_vec(model, model.g_mu_f)
        u_s_full = _prescribed_full(model)

        def solve_free(c0, c1):
            b = f_masked - c0 * g_lam_full - c1 * g_mu_full
            return base(jnp.stack([c0, c1]), b) + u_s_full

        return (solve_free, base) if with_rhs_solver else solve_free

    def solve_free(c0, c1):
        return base(jnp.stack([c0, c1]), f_masked)

    return (solve_free, base) if with_rhs_solver else solve_free


def make_fh_fun_batched(
    model: FemModel,
    solve_batch: Callable,
    cfg: ProblemConfig = ProblemConfig(),
) -> Callable:
    """Batched observation operator ``fh_b(thetas (B, 2)) -> (y (B, 2),
    h (B, nq))`` — the natively-batched sibling of ``jax.vmap(make_fh_fun)``
    for solvers that take the whole sample batch at once
    (:func:`make_two_level_solver_batched`). Identical math: theta->(E, nu)
    per `main_custom_training.py:32`, y = displacement probe at
    ``cfg.node_id``, h = reference von Mises at ``cfg.ele_id``/``cfg.nipt_id``.
    """
    tm = jnp.asarray(cfg.theta_map.theta_mean, model.dtype)
    ts = jnp.asarray(cfg.theta_map.theta_std, model.dtype)
    if not (1 <= cfg.node_id <= model.nnodes):
        raise ValueError(f"probe node_id {cfg.node_id} outside [1, {model.nnodes}]")
    if not (1 <= cfg.ele_id <= model.nele):
        raise ValueError(f"probe ele_id {cfg.ele_id} outside [1, {model.nele}]")
    obs_full = model.ndm * (cfg.node_id - 1) + np.arange(model.ndm)
    obs_dofs = jnp.asarray(np.asarray(model.dof_map)[obs_full])
    e = cfg.ele_id - 1
    q = jnp.asarray(cfg.nipt_id, dtype=jnp.int32) - 1
    B_probe = model.B[e, q]  # (nq, 3, 8)
    lm_probe = model.lm[e]

    def fh_b(thetas):
        thetas = jnp.asarray(thetas, model.dtype)
        E = jnp.exp(ts[0] * thetas[:, 0] + tm[0])
        v = 0.5 * jax.nn.sigmoid(ts[1] * thetas[:, 1] + tm[1])
        c0, c1 = material_coeffs(model.stype, E, v)
        u = solve_batch(c0, c1)  # (B, ndof)
        y = u[:, obs_dofs]
        eps3 = jnp.einsum("qai,bi->bqa", B_probe, u[:, lm_probe])
        sig6 = jax.vmap(_stress6, in_axes=(None, 0, 0, 0))(model, eps3, c0, c1)
        h = von_mises_reference(sig6)
        return y, h

    return fh_b


def make_two_level_solver_batched(
    model: FemModel,
    coarse_model: FemModel,
    nx_coarse: int,
    ny_coarse: int,
    ratio: int,
    *,
    refine_iters: int = 1,
    tol: float = 1e-10,
    maxiter: int = 500,
    omega: float = 0.6,
    coarse_f32_precision=jax.lax.Precision.DEFAULT,
    refine_residual: str = "compensated",
) -> Callable:
    """Natively-BATCHED variant of ``make_two_level_solver(use_stencil=True)``
    — the round-3 answer to the "fused CG iteration" item. Returns
    ``solve_batch(lam (B,), mu (B,)) -> u (B, ndof)`` with the adjoint
    custom VJP, replacing ``jax.vmap(make_two_level_solver(...))``.

    Same math and same components (Pallas row-stencil matvec, conv-form
    grid transfers, spectral coarse solve), but the PCG itself is written
    over the (B, n) block (``ops.solve.pcg_two_level_batched``): converged
    lanes freeze via scalar alpha/beta masking instead of the four
    (B, n)-sized ``jnp.where`` selects the vmapped while_loop needs, and
    the preconditioned residual is never materialized (its dot folds into
    small-space reductions, its value into the p-update). The CG hot loop
    always runs float32 (as the production vmapped config); ``refine_iters``
    outer refinements with "compensated" (default; f64-grade residuals from
    f32 stencil arithmetic) or "f64" (element-path) residuals recover
    accuracy exactly as in ``make_matfree_affine_solver``.

    The CG hot loop runs f32 unconditionally (the production vmapped
    config); f64 applications (refinement residuals, adjoint cotangents)
    stay on the element/compensated paths.
    """
    if model.has_constraints or coarse_model.has_constraints:
        raise NotImplementedError("unconstrained Cook's layout only")
    if model.has_springs or coarse_model.has_springs:
        raise NotImplementedError("nodal springs: dense solver path only")
    from .ops.multigrid import make_grid_transfer_conv
    from .ops.solve import pcg_two_level_batched
    from .ops.stencil import make_stencil_affine_matvec

    nx_f, ny_f = nx_coarse * ratio, ny_coarse * ratio
    if model.ndof != (nx_f + 1) * (ny_f + 1) * 2:
        raise ValueError("fine model does not match coarse * ratio")

    affine_matvec, _part_mv, diag_parts = make_stencil_affine_matvec(
        model, nx_f, ny_f
    )
    prolong, restrict = make_grid_transfer_conv(nx_coarse, ny_coarse, ratio)
    coarse_apply = make_coarse_spectral_apply(
        coarse_model, f32_precision=coarse_f32_precision
    )
    mv_b = jax.vmap(affine_matvec)      # f32 batch -> Pallas row kernel
    prolong_b = jax.vmap(prolong)
    restrict_b = jax.vmap(restrict)
    coarse_b = jax.vmap(coarse_apply)

    mask32 = jnp.asarray(model.free_mask, jnp.float32)
    mask64 = jnp.asarray(model.free_mask)
    diag32 = jnp.asarray(diag_parts, jnp.float32)  # (2, ndof)

    if refine_residual == "compensated":
        from .ops.stencil_compensated import make_compensated_residual

        _res_one = make_compensated_residual(model, nx_f, ny_f)

        def _residual_b(coeffs_b, b, x):
            # barrier-fenced for the same fusion blowup as the vmapped path
            xb = jax.lax.optimization_barrier(x)
            r = jax.vmap(_res_one)(coeffs_b, b, xb)
            return jax.lax.optimization_barrier(r)

    elif refine_residual == "f64":
        from .ops.assembly import make_sorted_scatter

        _scatter = make_sorted_scatter(model.lm, model.ndof)
        _lm = jnp.asarray(model.lm)
        _parts64 = jnp.stack([model.ke_lam, model.ke_mu])

        def _ku64_one(coeffs, x):
            ue = (x * mask64)[_lm]
            q = None
            for p in range(2):
                qp = jnp.einsum(
                    "eij,ej->ei", _parts64[p], ue,
                    precision=jax.lax.Precision.HIGHEST,
                )
                cp = coeffs[p]
                q = cp * qp if q is None else q + cp * qp
            return _scatter(q) * mask64

        def _residual_b(coeffs_b, b, x):
            return b - jax.vmap(_ku64_one)(coeffs_b, x)

    else:
        raise ValueError(f"unknown refine_residual {refine_residual!r}")

    def _cg_b(coeffs_b, b64):
        """One batched f32 two-level CG; b64 (B, ndof) masked."""
        c32 = coeffs_b.astype(jnp.float32)
        b32 = b64.astype(jnp.float32)
        d = c32[:, 0:1] * diag32[0][None, :] + c32[:, 1:2] * diag32[1][None, :]
        d = jnp.where(mask32 > 0, jnp.where(d == 0, 1.0, d), 1.0)

        def mv(p):
            return mv_b(c32, p) * mask32

        x, _ = pcg_two_level_batched(
            mv, b32, 1.0 / d, c32, restrict_b, prolong_b, coarse_b, mask32,
            omega=omega, tol=tol, maxiter=maxiter,
        )
        return x

    def _solve_once_b(coeffs_b, b):
        x = _cg_b(coeffs_b, b).astype(b.dtype)
        for _ in range(refine_iters):
            r = _residual_b(coeffs_b, b, x)
            x = x + _cg_b(coeffs_b, r).astype(b.dtype)
        return x * mask64

    # f64 element-path per-part matvec for the adjoint coefficient
    # cotangents (same policy as make_matfree_affine_solver: cotangents
    # never run the f32 stencil)
    from .ops.assembly import make_sorted_scatter as _mss

    _scatter_adj = _mss(model.lm, model.ndof)
    _lm_adj = jnp.asarray(model.lm)
    _parts_adj = jnp.stack([model.ke_lam, model.ke_mu])

    def _part_mv64_one(p, x):
        qe = jnp.einsum(
            "eij,ej->ei", _parts_adj[p], x[_lm_adj],
            precision=jax.lax.Precision.HIGHEST,
        )
        return _scatter_adj(qe)

    @jax.custom_vjp
    def _solve(coeffs_b, f_b):
        return _solve_once_b(coeffs_b, f_b)

    def _fwd(coeffs_b, f_b):
        u = _solve_once_b(coeffs_b, f_b)
        return u, (coeffs_b, u)

    def _bwd(res, ubar):
        coeffs_b, u = res
        w = _solve_once_b(coeffs_b, ubar * mask64)
        cbar = []
        for p in range(2):
            ku = jax.vmap(lambda x, _p=p: _part_mv64_one(_p, x))(u)
            cbar.append(-jnp.einsum("bi,bi->b", w, ku * mask64))
        return jnp.stack(cbar, axis=1).astype(coeffs_b.dtype), w

    _solve.defvjp(_fwd, _bwd)

    f_masked = model.f_ext * model.free_mask

    if model.has_prescribed:
        g_lam_full = _embed_free_vec(model, model.g_lam_f)
        g_mu_full = _embed_free_vec(model, model.g_mu_f)
        u_s_full = _prescribed_full(model)

        def solve_batch(lam, mu):
            coeffs_b = jnp.stack([lam, mu], axis=1)
            b = (
                f_masked[None, :]
                - lam[:, None] * g_lam_full[None, :]
                - mu[:, None] * g_mu_full[None, :]
            )
            return _solve(coeffs_b, b) + u_s_full[None, :]

        return solve_batch

    def solve_batch(lam, mu):
        coeffs_b = jnp.stack([lam, mu], axis=1)
        b = jnp.broadcast_to(f_masked[None, :], (lam.shape[0], model.ndof))
        return _solve(coeffs_b, b)

    return solve_batch


def make_three_level_solver(
    model: FemModel,
    mid_model: FemModel,
    coarse_model: FemModel,
    nx_coarse: int,
    ny_coarse: int,
    ratio_mc: int,
    ratio_fm: int,
    *,
    cg_dtype=None,
    refine_iters: int = 0,
    tol: float = 1e-10,
    maxiter: int = 800,
    omega: float = 0.6,
    omega_mid: float = 0.6,
    use_stencil: bool = True,
    coarse_f32_precision=jax.lax.Precision.DEFAULT,
    refine_residual: str = "f64",
) -> Callable:
    """Three-level (fine Jacobi + mid Jacobi + spectral-coarse) matrix-free
    solver for refined Cook's meshes — ``make_two_level_solver`` with the
    exact spectral solve pushed one level further down
    (``ops.multigrid.make_three_level_preconditioner``), so the one-time
    eigh setup runs on a mesh ``ratio_fm^2``x smaller. Mesh sizes:
    coarse (nx_coarse x ny_coarse) --ratio_mc--> mid --ratio_fm--> fine.

    Returns ``solve_free(c0, c1) -> u (ndof,)`` with the adjoint VJP.
    """
    if model.has_constraints or model.has_springs:
        raise NotImplementedError(
            "structured multilevel solvers assume the unconstrained, "
            "spring-free Cook's layout (see make_two_level_solver)"
        )
    from .ops.multigrid import (
        make_grid_transfer_conv,
        make_three_level_preconditioner,
    )
    from .ops.solve import make_matfree_affine_solver
    from .ops.stencil import make_stencil_affine_matvec

    nx_mid, ny_mid = nx_coarse * ratio_mc, ny_coarse * ratio_mc
    nx_f, ny_f = nx_mid * ratio_fm, ny_mid * ratio_fm
    if model.ndof != (nx_f + 1) * (ny_f + 1) * 2:
        raise ValueError("fine model does not match coarse * ratio_mc * ratio_fm")
    gt1 = make_grid_transfer_conv(nx_mid, ny_mid, ratio_fm)
    gt2 = make_grid_transfer_conv(nx_coarse, ny_coarse, ratio_mc)
    coarse_apply = make_coarse_spectral_apply(
        coarse_model, f32_precision=coarse_f32_precision
    )
    from .ops.assembly import make_sorted_scatter
    import numpy as np

    scatter_m = make_sorted_scatter(jnp.asarray(mid_model.lm), mid_model.ndof)
    mid_diag_parts = jnp.stack([
        scatter_m(jnp.diagonal(mid_model.ke_lam, axis1=-2, axis2=-1)),
        scatter_m(jnp.diagonal(mid_model.ke_mu, axis1=-2, axis2=-1)),
    ])
    prec = make_three_level_preconditioner(
        gt1, gt2, mid_diag_parts, mid_model.free_mask, coarse_apply,
        model.free_mask, omega=omega, omega_mid=omega_mid,
    )
    affine_matvec = part_matvec = diag_parts = None
    if use_stencil:
        affine_matvec, part_matvec, diag_parts = make_stencil_affine_matvec(
            model, nx_f, ny_f
        )
    residual_fn = None
    if refine_residual == "compensated":
        if not use_stencil:
            raise ValueError("refine_residual='compensated' needs use_stencil=True")
        from .ops.stencil_compensated import make_compensated_residual

        residual_fn = make_compensated_residual(model, nx_f, ny_f)
    ke_parts = jnp.stack([model.ke_lam, model.ke_mu])
    base = make_matfree_affine_solver(
        ke_parts,
        model.lm,
        model.free_mask,
        model.ndof,
        tol=tol,
        maxiter=maxiter,
        cg_dtype=cg_dtype,
        refine_iters=refine_iters,
        preconditioner=prec,
        part_matvec=part_matvec,
        diag_parts=diag_parts,
        affine_matvec=affine_matvec,
        refine_residual=refine_residual,
        residual_fn=residual_fn,
    )
    f_masked = model.f_ext * model.free_mask
    if model.has_prescribed:
        g_lam_full = _embed_free_vec(model, model.g_lam_f)
        g_mu_full = _embed_free_vec(model, model.g_mu_f)
        u_s_full = _prescribed_full(model)

        def solve_free(c0, c1):
            b = f_masked - c0 * g_lam_full - c1 * g_mu_full
            return base(jnp.stack([c0, c1]), b) + u_s_full

        return solve_free

    def solve_free(c0, c1):
        return base(jnp.stack([c0, c1]), f_masked)

    return solve_free


def make_finverter_vector(model: FemModel, info) -> jax.Array:
    """Compliant-mechanism output-functional vector Lv (reference
    ``finverter_info``, ``src/fem_solver.py:266-274``): ±1 at the 0-based
    ``(node, direction, sign)`` output dofs; the design objective is
    ``Lv @ u`` (differentiable through any solver path)."""
    import numpy as np

    L = np.zeros(model.ndof)
    dof_map = np.asarray(model.dof_map)
    for node, direction, sign in info:
        L[dof_map[model.ndm * int(node) + int(direction)]] += float(sign)
    return jnp.asarray(L, model.dtype)


def make_two_level_solver_box3d(
    model: FemModel,
    coarse_model: FemModel,
    cells_coarse,
    ratio: int,
    *,
    cg_dtype=None,
    refine_iters: int = 0,
    tol: float = 1e-10,
    maxiter: int = 500,
    omega: float = 0.6,
    use_pallas: bool = True,
    coarse_f32_precision=jax.lax.Precision.HIGHEST,
    refine_residual: str = "f64",
    cycle: str = "additive",
    with_rhs_solver: bool = False,
) -> Callable:
    """Two-level (spectral-coarse + Jacobi) matrix-free solver for
    structured hex8 BOX meshes (``mesh/solid3d.py`` numbering) — the 3-D
    sibling of ``make_two_level_solver``, with the whole CG hot loop in
    structured-grid form: 27-point block-stencil matvec
    (``ops.stencil3d``; the f32 batched hot loop dispatches to the Pallas
    row kernel ``ops.stencil3d_pallas`` unless ``use_pallas=False``) +
    tensor-product trilinear transfer operators
    (``ops.multigrid.make_grid_transfer_nd``), both gather-free.

    ``cells_coarse`` = coarse (nx, ny, nz) cell counts; the fine model must
    be the same box at ``cells_coarse * ratio``. Returns
    ``solve_free(c0, c1) -> u (ndof,)`` with the adjoint custom VJP."""
    if model.has_constraints or model.has_springs:
        raise NotImplementedError("unconstrained spring-free box meshes only")
    from .ops.multigrid import make_grid_transfer_nd, make_two_level_preconditioner
    from .ops.solve import make_matfree_affine_solver
    from .ops.stencil3d import make_stencil_affine_matvec_3d

    ncx, ncy, ncz = cells_coarse
    nx, ny, nz = ncx * ratio, ncy * ratio, ncz * ratio
    grid_transfer = make_grid_transfer_nd((ncz, ncy, ncx), ratio, 3)
    coarse_apply = make_coarse_spectral_apply(
        coarse_model, f32_precision=coarse_f32_precision
    )
    affine_matvec, part_matvec, diag_parts = make_stencil_affine_matvec_3d(
        model, nx, ny, nz, use_pallas=use_pallas
    )
    if cycle == "vcycle":
        from .ops.multigrid import make_two_level_vcycle_preconditioner

        mask_f32 = jnp.asarray(model.free_mask, jnp.float32)

        def _masked_mv(coeffs, x):
            return affine_matvec(coeffs, x * mask_f32) * mask_f32

        # NOTE: deliberately NOT the additive `omega` — the V-cycle
        # smoother must satisfy omega < 2/lambda_max(D^-1 K) ~ 0.5 for
        # quad4/hex8 elasticity (see make_two_level_vcycle_preconditioner)
        prec = make_two_level_vcycle_preconditioner(
            _masked_mv, grid_transfer, coarse_apply, model.free_mask,
        )
    elif cycle == "additive":
        prec, _, _ = make_two_level_preconditioner(
            None, None, coarse_apply, model.free_mask, omega=omega,
            grid_transfer=grid_transfer,
        )
    else:
        raise ValueError(f"unknown cycle {cycle!r}")
    residual_fn = None
    if refine_residual == "compensated":
        from .ops.stencil_compensated import make_compensated_residual_3d

        residual_fn = make_compensated_residual_3d(model, nx, ny, nz)
    ke_parts = jnp.stack([model.ke_lam, model.ke_mu])
    base = make_matfree_affine_solver(
        ke_parts,
        model.lm,
        model.free_mask,
        model.ndof,
        tol=tol,
        maxiter=maxiter,
        cg_dtype=cg_dtype,
        refine_iters=refine_iters,
        preconditioner=prec,
        part_matvec=part_matvec,
        diag_parts=diag_parts,
        affine_matvec=affine_matvec,
        refine_residual=refine_residual,
        residual_fn=residual_fn,
    )
    f_masked = model.f_ext * model.free_mask
    if model.has_prescribed:
        g_lam_full = _embed_free_vec(model, model.g_lam_f)
        g_mu_full = _embed_free_vec(model, model.g_mu_f)
        u_s_full = _prescribed_full(model)

        def solve_free(c0, c1):
            b = f_masked - c0 * g_lam_full - c1 * g_mu_full
            return base(jnp.stack([c0, c1]), b) + u_s_full

        return (solve_free, base) if with_rhs_solver else solve_free

    def solve_free(c0, c1):
        return base(jnp.stack([c0, c1]), f_masked)

    return (solve_free, base) if with_rhs_solver else solve_free


def element_strain_energy(model: FemModel, u, c0, c1) -> jax.Array:
    """Per-element strain energy 0.5 u_e^T k_e(c) u_e (reference
    ``strain_energy_flag`` output, src/fem_solver.py:231-233). Returns
    (nele,); sums to 0.5 f^T u for a linear force-controlled problem."""
    ue = u[model.lm]
    ke_ue = c0 * jnp.einsum("eij,ej->ei", model.ke_lam, ue) + c1 * jnp.einsum(
        "eij,ej->ei", model.ke_mu, ue
    )
    return 0.5 * jnp.einsum("ei,ei->e", ue, ke_ue)
