"""Rate-independent J2 (von Mises) flow plasticity with history.

The reference allocates the full FEAP-heritage inelastic storage — per-qpt
plastic strain ``ele_pstrain``, history variables ``ele_hsv``, flow
direction ``ele_nvec``, plastic multiplier ``ele_gamma`` and the
elastic/inelastic/plastic energy split (``src/fem_preprocess.py:486-501``)
— but the material driver behind it is the empty ``mat_type == 99`` stub
(``src/mat_subroutine.py:210-215``). This module puts a real
PATH-DEPENDENT material on that surface: small-strain associative J2
plasticity with linear isotropic + kinematic (Prager) hardening, radial
return mapping, loading/unloading irreversibility, and gradients of any
functional of the response with respect to the material parameters
*through the entire load history*.

TPU-first formulation — variational constitutive updates:

  * Each load increment is posed as the minimization of an INCREMENTAL
    potential (Ortiz-Stainier form).  For linear-hardening J2 the inner
    minimization over the plastic multiplier has the closed form

        psi_inc(eps; state_n) = 0.5 K tr(eps)^2
                              + mu || dev(eps) - eps_p_n ||^2
                              - <f_trial>^2 / (2 (3 mu + H_iso + H_kin))

    whose strain gradient is EXACTLY the radial-return stress and whose
    Hessian is the symmetric algorithmic consistent tangent.  One scalar
    ``jnp.where``-free smooth-a.e. function therefore replaces the
    reference-style "strain in, stress + tangent out" subroutine: the
    residual is ``jax.grad`` of the incremental total potential, the
    consistent tangent is a Hessian-vector product (``jax.jvp`` of the
    residual) under matrix-free Jacobi-PCG, batched over (element, qpt)
    on the MXU.
  * History (eps_p, alpha, beta) is a pytree carried through a
    ``lax.scan`` over load steps; each step's Newton solve is wrapped in
    a ``jax.custom_vjp`` whose backward pass is one adjoint tangent
    solve + VJPs of the residual and of the explicit state-update map —
    the discrete adjoint of path-dependent plasticity, composed in
    reverse by scan's autodiff.  The Newton/CG ``while_loop``s are never
    unrolled.
  * Everything vmaps: a batch of material-parameter samples (amortized
    VI) runs the whole elastoplastic history as batched while_loops.

Validation (tests/test_plasticity.py): radial-return consistency (f=0
after return), the variational identity (grad psi_inc == radial-return
stress to machine precision), elastic-limit parity with the linear
solver, the closed-form shear hardening slope mu*H/(H + 3 mu), residual
plastic strain + elastic unloading hysteresis, non-negative dissipation,
and finite-difference checks of parameter gradients through multi-step
histories with unloading.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .newton import newton_raphson
from .solve import pcg


class J2Material(NamedTuple):
    """Linear isotropic elasticity + J2 flow with linear hardening.

    q(alpha) = sig_y + H_iso * alpha; Prager back stress rate
    (2/3) H_kin * deps_p.  ``H_iso = H_kin = 0`` is perfect plasticity;
    ``sig_y -> inf`` recovers linear elasticity exactly.
    """

    lam: jax.Array
    mu: jax.Array
    sig_y: jax.Array
    H_iso: jax.Array = 0.0
    H_kin: jax.Array = 0.0


class PlasticState(NamedTuple):
    """Per-quadrature-point history, leading dims (nele, nqpt).

    Symmetric-tensor components ordered (11, 22, 33, 12, 23, 31) with
    TENSOR shears (not engineering).  eps_p and beta are deviatoric by
    construction.  This is the reference's ``ele_pstrain`` / ``ele_hsv``
    storage (``src/fem_preprocess.py:493-497``) as an immutable pytree —
    one layout serves plane strain AND 3-D hex8 solids.
    """

    eps_p: jax.Array  # (..., 6)
    alpha: jax.Array  # (...,)
    beta: jax.Array  # (..., 6)


def init_state(nele: int, nqpt: int, dtype=jnp.float64) -> PlasticState:
    return PlasticState(
        eps_p=jnp.zeros((nele, nqpt, 6), dtype),
        alpha=jnp.zeros((nele, nqpt), dtype),
        beta=jnp.zeros((nele, nqpt, 6), dtype),
    )


def _eps_t6(epsB):
    """B-matrix strain rows -> tensor 6-vector (11, 22, 33, 12, 23, 31).

    Plane strain (3 rows, ``bmatrix``): (e11, e22, g12) -> (e11, e22, 0,
    g12/2, 0, 0).  3-D (6 rows, ``bmatrix_3d``): engineering shears halved.
    """
    z = jnp.zeros_like(epsB[..., 0])
    if epsB.shape[-1] == 3:
        return jnp.stack(
            [epsB[..., 0], epsB[..., 1], z, 0.5 * epsB[..., 2], z, z], axis=-1
        )
    if epsB.shape[-1] == 6:
        return jnp.concatenate([epsB[..., :3], 0.5 * epsB[..., 3:]], axis=-1)
    raise ValueError(f"expected 3 or 6 strain rows, got {epsB.shape[-1]}")


_DEV_MASK = (1.0, 1.0, 1.0, 0.0, 0.0, 0.0)


def _dev6(a6):
    tr = a6[..., 0] + a6[..., 1] + a6[..., 2]
    return a6 - (tr[..., None] / 3.0) * jnp.asarray(_DEV_MASK, a6.dtype)


def _norm6_sq(a6):
    """||A||^2 with each off-diagonal pair counted twice."""
    return jnp.sum(a6[..., :3] ** 2, axis=-1) + 2.0 * jnp.sum(
        a6[..., 3:] ** 2, axis=-1
    )


def _trial(epsB, state: PlasticState, mat: J2Material):
    """Shared elastic-trial pieces of psi_inc and the return map."""
    eps = _eps_t6(epsB)
    tr = eps[..., 0] + eps[..., 1] + eps[..., 2]
    ee = _dev6(eps) - state.eps_p  # elastic deviatoric strain (eps_p deviatoric)
    xi = 2.0 * mat.mu * ee - state.beta  # relative (shifted) deviatoric stress
    # SCALE-INVARIANT zero guard (the double-where trick). Additive-epsilon
    # guards fail somewhere: 1e-300 underflows in f32, and finfo.tiny
    # underflows on TPU where emulated f64 carries only the f32 EXPONENT
    # range — both give n_hat = 0/0 = NaN at the virgin (zero-stress)
    # state.  Here xi_norm is 1 where xi == 0 (safe divisor, zero n_hat)
    # and q_tr is exactly 0 there, with clean gradients on both branches.
    norm2 = _norm6_sq(xi)
    pos = norm2 > 0
    xi_norm = jnp.sqrt(jnp.where(pos, norm2, 1.0))
    q_tr = jnp.sqrt(1.5) * jnp.where(pos, xi_norm, 0.0)
    f_tr = q_tr - (mat.sig_y + mat.H_iso * state.alpha)
    return eps, ee, tr, xi, xi_norm, f_tr


def incremental_energy(epsB, state: PlasticState, mat: J2Material):
    """The closed-form incremental pseudo-potential per qpt (module doc).

    ``jax.grad`` of this w.r.t. the B-strain rows IS the radial-return
    stress (variational constitutive update) — pinned by
    test_plasticity.py::test_variational_identity.
    """
    _, ee, tr, _, _, f_tr = _trial(epsB, state, mat)
    K = mat.lam + 2.0 * mat.mu / 3.0
    denom = 3.0 * mat.mu + mat.H_iso + mat.H_kin
    fp = jax.nn.relu(f_tr)
    return 0.5 * K * tr**2 + mat.mu * _norm6_sq(ee) - 0.5 * fp**2 / denom


def return_map(epsB, state: PlasticState, mat: J2Material):
    """Radial return: (sig6, new_state, dgamma) from total strain + history.

    sig6 in the reference storage layout [s11, s22, s33, t12, t23, t31]
    (``src/mat_subroutine.py:76-81``); dgamma is the equivalent-plastic-
    strain increment (the reference's ``ele_gamma`` slot).
    """
    eps, ee, tr, xi, xi_norm, f_tr = _trial(epsB, state, mat)
    K = mat.lam + 2.0 * mat.mu / 3.0
    denom = 3.0 * mat.mu + mat.H_iso + mat.H_kin
    dgamma = jax.nn.relu(f_tr) / denom
    n_hat = xi / xi_norm[..., None]
    scale = jnp.sqrt(1.5) * dgamma[..., None]
    sig_dev = 2.0 * mat.mu * (ee - scale * n_hat)
    p = (K * tr)[..., None] * jnp.asarray(_DEV_MASK, eps.dtype)  # tr eps_p = 0
    eps_p_new = state.eps_p + scale * n_hat
    alpha_new = state.alpha + dgamma
    beta_new = state.beta + (2.0 / 3.0) * mat.H_kin * scale * n_hat
    new_state = PlasticState(eps_p=eps_p_new, alpha=alpha_new, beta=beta_new)
    return sig_dev + p, new_state, dgamma


class PlasticityResult(NamedTuple):
    u: jax.Array  # (ndof,) converged displacement at the final step
    state: PlasticState  # final history
    state_prev: PlasticState  # history at the START of the final increment
    iterations: jax.Array  # (n_steps,) Newton iterations per step
    converged: jax.Array  # (n_steps,) bool


def _check_supported(model):
    if getattr(model, "stype", 2) not in (2, 4):
        raise NotImplementedError(
            "J2 flow plasticity supports plane strain (stype=2) and 3-D "
            "solids (stype=4); plane stress would need a condensation "
            "iteration and axisymmetry a hoop-strain plastic row"
        )
    if getattr(model, "has_constraints", False):
        raise NotImplementedError(
            "plasticity x equality constraints: the strain gather uses the "
            "unconstrained lm map"
        )


def _prescribed_lift(model):
    """Full-dof vector of prescribed (Dirichlet) displacement values —
    zero when the model has none.  Ramped by the load factor inside the
    step (proportional displacement control)."""
    import numpy as np

    up = np.zeros(model.ndof)
    if getattr(model, "has_prescribed", False):
        up[np.asarray(model.supp_dof)] = np.asarray(model.u_supp)
    return jnp.asarray(up, model.dtype)


def _linear_minv(model):
    """Jacobi preconditioner from the linear elastic diagonal — a scale
    proxy for the elastoplastic tangent (softer in plastic zones; affects
    CG iteration counts only, never results)."""
    from .assembly import make_sorted_scatter

    scatter = make_sorted_scatter(jnp.asarray(model.lm), model.ndof)
    mask = model.free_mask

    def minv(mat: J2Material):
        ke = mat.lam * model.ke_lam + mat.mu * model.ke_mu
        d = scatter(jnp.diagonal(ke, axis1=-2, axis2=-1))
        d = jnp.where(mask > 0, jnp.where(d == 0, 1.0, d), 1.0)
        return 1.0 / d

    return minv


_STEP_CACHE: dict = {}


def make_plasticity_step(model, **kw) -> Callable:
    """Cached factory for :func:`_build_plasticity_step` — returns the SAME
    function object for the same (model, options).  Required, not just an
    optimization: a ``jax.custom_vjp`` function freshly created INSIDE a
    traced context (e.g. ``solve_plasticity`` under ``jax.grad`` under the
    trainer's epoch ``lax.scan``) trips XLA lowering ("no constant handler
    for DynamicJaxprTracer") because the un-cached jaxpr captures tracers
    as constants; one shared object also reuses the compiled Newton step
    across calls."""
    key = tuple(sorted(kw.items()))
    mid = id(model)
    entry = _STEP_CACHE.get(mid)
    if entry is None or entry[0]() is not model:
        import weakref

        try:
            ref = weakref.ref(model, lambda _, mid=mid: _STEP_CACHE.pop(mid, None))
        except TypeError:  # not weakref-able: hold a strong ref
            ref = (lambda m: (lambda: m))(model)
        entry = (ref, {})
        _STEP_CACHE[mid] = entry
    steps = entry[1]
    if key not in steps:
        steps[key] = _build_plasticity_step(model, **kw)
    return steps[key]


def _build_plasticity_step(
    model,
    *,
    tol_cr: float = 1e-12,
    max_iter: int = 30,
    cg_tol: float = 1e-12,
    cg_maxiter: int = 4000,
    backtrack: int = 10,
    precond=None,
) -> Callable:
    """One differentiable load increment:

        step(mat, state, factor, u0) -> (u, new_state, iters, converged)

    Forward: Newton on ``grad_u Pi_inc`` with HVP-CG tangent solves, warm
    started at u0.  Backward (custom VJP): the discrete adjoint — one
    symmetric tangent solve at the converged state plus VJPs of the
    residual and of the explicit return-map state update, with cotangents
    flowing into BOTH the parameters and the incoming state (so scan's
    reverse pass composes the full path-dependent sensitivity).  u0 gets a
    zero cotangent: the converged solution does not depend on the warm
    start.
    """
    _check_supported(model)
    if model.dtype == jnp.float32:
        # f32 floors: the f64-grade defaults sit below f32 resolution —
        # Newton/CG would burn max_iter without converging further
        tol_cr = max(tol_cr, 1e-9)
        cg_tol = max(cg_tol, 3e-7)
    B = model.B
    lm = model.lm
    dvol = model.dvol
    mask = model.free_mask
    f_ext = model.f_ext * mask
    u_presc = _prescribed_lift(model)
    minv_of = _linear_minv(model)

    def potential(u, mat, state, factor):
        # proportional loading: prescribed displacements ramp with the
        # same factor as the external load (displacement control)
        ut = u * mask + factor * u_presc
        eps3 = jnp.einsum("eqai,ei->eqa", B, ut[lm])
        return jnp.sum(incremental_energy(eps3, state, mat) * dvol) - factor * jnp.vdot(
            f_ext, ut
        )

    grad_u = jax.grad(potential, argnums=0)

    def residual(u, mat, state, factor):
        return grad_u(u, mat, state, factor) * mask

    def state_update(u, mat, state, factor):
        ut = u * mask + factor * u_presc
        eps3 = jnp.einsum("eqai,ei->eqa", B, ut[lm])
        _, new_state, _ = return_map(eps3, state, mat)
        return new_state

    def _newton(mat, state, factor, u0):
        # ``precond``: callable r -> z (e.g. the elastic two-level
        # preconditioner from make_elastic_two_level_precond) replacing the
        # per-material Jacobi diagonal — iteration counts only, never results
        minv = precond if precond is not None else minv_of(mat)

        def res(u):
            return residual(u, mat, state, factor)

        def tangent_solve(u, r):
            def hvp(v):
                vm = v * mask
                _, hv = jax.jvp(res, (u,), (vm,))
                return hv * mask + v * (1.0 - mask)

            du, _, _ = pcg(hvp, -r * mask, minv, tol=cg_tol, maxiter=cg_maxiter)
            return du * mask

        return newton_raphson(
            res, tangent_solve, u0 * mask,
            tol_cr=tol_cr, max_iter=max_iter, backtrack=backtrack,
        )

    @jax.custom_vjp
    def step(mat, state, factor, u0):
        r = _newton(mat, state, factor, u0)
        # return the TOTAL displacement (free part + ramped Dirichlet lift);
        # every internal consumer re-masks, so the lift never double-counts
        u_tot = r.u * mask + factor * u_presc
        return u_tot, state_update(r.u, mat, state, factor), r.iterations, r.converged

    def _fwd(mat, state, factor, u0):
        out = step(mat, state, factor, u0)
        u = out[0]
        return out, (mat, state, factor, u)

    def _bwd(saved, cotangents):
        mat, state, factor, u = saved
        ubar, sbar_out, _, _ = cotangents

        # 1) explicit state update g(u, mat, state, factor): pull sbar_out back
        _, vjp_g = jax.vjp(state_update, u, mat, state, factor)
        gu, gmat_g, gstate_g, gfac_g = vjp_g(sbar_out)
        ubar_tot = (ubar + gu) * mask

        # 2) adjoint tangent solve K w = ubar_tot (K = Hessian of Pi_inc,
        #    symmetric by the variational form)
        def res_u(u_):
            return residual(u_, mat, state, factor)

        def hvp(v):
            vm = v * mask
            _, hv = jax.jvp(res_u, (u,), (vm,))
            return hv * mask + v * (1.0 - mask)

        minv = precond if precond is not None else minv_of(mat)
        w, _, _ = pcg(hvp, ubar_tot, minv, tol=cg_tol, maxiter=cg_maxiter)

        # 3) implicit terms: -w^T dR/d(mat, state, factor) at fixed u
        _, vjp_r = jax.vjp(
            lambda m_, s_, f_: residual(u, m_, s_, f_), mat, state, factor
        )
        gmat_r, gstate_r, gfac_r = vjp_r(-w * mask)

        gmat = jax.tree_util.tree_map(jnp.add, gmat_g, gmat_r)
        gstate = jax.tree_util.tree_map(jnp.add, gstate_g, gstate_r)
        # the returned u_tot carries the ramped lift: d u_tot / d factor = u_presc
        gfac = gfac_g + gfac_r + jnp.vdot(ubar, u_presc)
        return gmat, gstate, gfac, jnp.zeros_like(u)

    step.defvjp(_fwd, _bwd)
    return step


def solve_plasticity(
    model,
    mat: J2Material,
    *,
    n_steps: int = 10,
    load_factor: float = 1.0,
    unload: bool = False,
    **step_kw,
) -> PlasticityResult:
    """Incremental elastoplastic solve: ramp f_ext to ``load_factor`` in
    ``n_steps`` equal increments (the reference's ``numsteps`` load control,
    ``model_property_cards.py:39-48``), carrying the plastic history through
    a ``lax.scan``.  ``unload=True`` appends a ramp back to zero load —
    the returned u is then the RESIDUAL (permanent) deformation.

    Differentiable in ``mat`` through the whole history (per-step discrete
    adjoints composed by scan); vmaps over a batch of materials.
    """
    step = make_plasticity_step(model, **step_kw)
    dtype = model.dtype
    up = jnp.linspace(load_factor / n_steps, load_factor, n_steps, dtype=dtype)
    if unload:
        down = jnp.linspace(
            load_factor * (n_steps - 1) / n_steps, 0.0, n_steps, dtype=dtype
        )
        factors = jnp.concatenate([up, down])
    else:
        factors = up
    state0 = init_state(model.nele, model.nqpt, dtype)
    u0 = jnp.zeros((model.ndof,), dtype)

    def body(carry, factor):
        u, state, _ = carry
        u_new, state_new, it, conv = step(mat, state, factor, u)
        return (u_new, state_new, state), (it, conv)

    (u, state, state_prev), (iters, convs) = jax.lax.scan(
        body, (u0, state0, state0), factors
    )
    return PlasticityResult(
        u=u, state=state, state_prev=state_prev, iterations=iters, converged=convs
    )


def make_plasticity_solver(
    model,
    *,
    n_steps: int = 10,
    load_factor: float = 1.0,
    unload: bool = False,
    **step_kw,
) -> Callable:
    """``solve(mat) -> (u, state)`` — the differentiable production entry
    point (final displacement + final history).  Use ``recover_sig6`` /
    ``stress_from_converged`` for stresses."""
    # build (and cache) the step NOW, outside any trace: a custom_vjp
    # object first created inside a traced context breaks XLA lowering
    # under an outer scan (see make_plasticity_step)
    make_plasticity_step(model, **step_kw)

    def solve(mat: J2Material):
        r = solve_plasticity(
            model, mat, n_steps=n_steps, load_factor=load_factor,
            unload=unload, **step_kw,
        )
        return r.u, r.state

    return solve


def recover_sig6(model, u, state_prev: PlasticState, mat: J2Material,
                 factor: float = 1.0):
    """Per-qpt 6-stress (nele, nqpt, 6) from a converged displacement and
    the history AT THE START of its increment (the return map re-applied —
    exactly the stress the residual equilibrated).  ``factor`` scales the
    prescribed-displacement lift (the step's load factor)."""
    ut = u * model.free_mask + factor * _prescribed_lift(model)
    eps3 = jnp.einsum("eqai,ei->eqa", model.B, ut[model.lm])
    sig6, _, _ = return_map(eps3, state_prev, mat)
    return sig6


def make_elastic_two_level_precond(
    model,
    coarse_model,
    nx_coarse: int,
    ny_coarse: int,
    ratio: int,
    *,
    E0: float = 20.0,
    nu: float = 0.3,
    omega: float = 0.6,
) -> Callable:
    """Two-level preconditioner ``r -> z`` built at the ELASTIC moduli, for
    structured Cook's-type grids — plug into
    ``make_plasticity_step(precond=...)`` / ``make_plasticity_solver``.

    The elastoplastic consistent tangent is spectrally bounded between the
    elastic operator scaled by the algorithmic shear ratio H/(H + 3 mu)
    (fully yielded) and 1 (elastic), so the FIXED spectral coarse solve +
    conv-form transfers (the same machinery as the random-field mean-field
    preconditioner, ``prob.randomfield.make_mean_field_preconditioner``)
    precondition every Newton iteration of every load step with no
    per-state setup.  Contained plasticity keeps the equivalence tight;
    perfect plasticity (H -> 0) degrades gracefully toward the Jacobi half.
    Affects CG iteration counts only, never results (pinned in tests).
    """
    from .element import material_coeffs
    from .multigrid import make_grid_transfer_conv, make_two_level_preconditioner
    from ..solver import make_coarse_spectral_apply

    coarse_apply = make_coarse_spectral_apply(coarse_model)
    gt = make_grid_transfer_conv(nx_coarse, ny_coarse, ratio)
    prec2, _, _ = make_two_level_preconditioner(
        None, None, coarse_apply, model.free_mask, omega=omega, grid_transfer=gt
    )
    lam0, mu0 = material_coeffs(2, E0, nu)
    coeffs0 = jnp.asarray([lam0, mu0], model.dtype)
    minv0 = _linear_minv(model)(
        J2Material(lam=jnp.asarray(lam0, model.dtype),
                   mu=jnp.asarray(mu0, model.dtype),
                   sig_y=jnp.asarray(1.0, model.dtype))
    )

    def prec(r):
        return prec2(coeffs0.astype(r.dtype), minv0.astype(r.dtype), r)

    return prec


def stress_from_converged(epsB, state: PlasticState, mat: J2Material):
    """Stress at a CONVERGED step from its END-of-step history: the radial
    return leaves sigma = K tr(eps) I + 2 mu (dev(eps) - eps_p_new), so the
    elastic law at the updated plastic strain recovers it exactly (pinned
    against :func:`return_map` in the tests).  Cheap probe-stress path —
    no pre-step state needed."""
    eps = _eps_t6(epsB)
    tr = eps[..., 0] + eps[..., 1] + eps[..., 2]
    K = mat.lam + 2.0 * mat.mu / 3.0
    sig_dev = 2.0 * mat.mu * (_dev6(eps) - state.eps_p)
    return sig_dev + (K * tr)[..., None] * jnp.asarray(_DEV_MASK, eps.dtype)


def plastic_dissipation(model, mat: J2Material, *, n_steps: int = 10,
                        load_factor: float = 1.0, **step_kw):
    """Total plastic dissipation sum_steps sum_qpt dvol sigma : deps_p —
    the reference's ``ele_penergy`` slot (``src/fem_preprocess.py:500``).
    Non-negative by the second law (associative flow); a test asserts it.
    """
    step = make_plasticity_step(model, **step_kw)
    dtype = model.dtype
    factors = jnp.linspace(load_factor / n_steps, load_factor, n_steps, dtype=dtype)
    state0 = init_state(model.nele, model.nqpt, dtype)
    u0 = jnp.zeros((model.ndof,), dtype)
    B, lm, mask, dvol = model.B, model.lm, model.free_mask, model.dvol

    def body(carry, factor):
        u, state = carry
        u_new, state_new, _, _ = step(mat, state, factor, u)
        eps3 = jnp.einsum("eqai,ei->eqa", B, (u_new * mask)[lm])
        sig6, _, _ = return_map(eps3, state, mat)
        deps = state_new.eps_p - state.eps_p
        # sigma : deps_p with the symmetric 12-pair counted twice
        sp = (
            sig6[..., 0] * deps[..., 0]
            + sig6[..., 1] * deps[..., 1]
            + sig6[..., 2] * deps[..., 2]
            + 2.0 * sig6[..., 3] * deps[..., 3]
        )
        return (u_new, state_new), jnp.sum(sp * dvol)

    (_, _), d = jax.lax.scan(body, (u0, state0), factors)
    return jnp.sum(d)
