"""FemModel: the immutable preprocessed FEM problem as a JAX pytree.

Replaces the reference's mutable class-attribute global state
(``PreProcessing.model_data/sol_data/out_data``, ``src/fem_preprocess.py:25-30``)
and its ``model_file.mat`` round-trip with a single frozen pytree built once
on the host. Everything downstream (forward solves, data generation, VI
training, MCMC) consumes it as a constant — pure functions, no hidden state,
which is also what makes every path trivially ``jit``/``vmap``/``shard_map``
compatible.

DOF convention (matches reference ``assign_dof_parfor_topopt``,
``src/fem_preprocess.py:291-443``, converted to 0-based): node n owns dofs
(2n, 2n+1) — interleaved x/y. Element dof map ``lm[e] = [2c0, 2c0+1, 2c1,
2c1+1, ...]`` for connectivity ``conn[e] = [c0..c3]``.

Precomputed at build (trace) time, all theta-independent:
  * per-(element, qpt) B-matrices and ``dvol = thk * detJ * w``
    (the reference recomputes these inside every traced solve,
    ``src/fem_solver_tf.py:271-333``);
  * affine element stiffness parts ``ke_lam``/``ke_mu`` (see ``ops.element``);
  * for ``dense=True``: assembled free-free blocks ``k_lam_ff``/``k_mu_ff``
    so a sample's operator is a 2-term axpy.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .config import SectionCard
from .mesh.feap import MeshData
from .ops import quadrature
from .ops.element import C_LAM3, C_MU3


@struct.dataclass
class FemModel:
    # geometry / topology
    coords: jax.Array  # (nnodes, 2)
    conn: jax.Array  # (nele, 4) int32
    lm: jax.Array  # (nele, 8) int32
    free_dof: jax.Array  # (nfree,) int32
    supp_dof: jax.Array  # (nsupp,) int32
    free_mask: jax.Array  # (ndof,) model dtype, 1 on free dofs
    # loading
    f_ext: jax.Array  # (ndof,)
    f_free: jax.Array  # (nfree,)
    # prescribed (Dirichlet) displacements on supported dofs, aligned with
    # supp_dof (reference ``Us``, src/fem_preprocess.py:443). Zero for
    # force-controlled models. g_*_f are the precomputed affine lift vectors
    # (K_lam @ u_s)[free] / (K_mu @ u_s)[free], so the effective RHS of a
    # solve with coefficients (c0, c1) is f_free - c0*g_lam_f - c1*g_mu_f
    # (reference embeds Us into u_n1 before assembly, src/fem_solver.py:74-101,
    # which yields the same lifted system).
    u_supp: jax.Array  # (nsupp,)
    g_lam_f: jax.Array  # (nfree,)
    g_mu_f: jax.Array  # (nfree,)
    # precomputed element quantities
    B: jax.Array  # (nele, nqpt, 3, 8)
    dvol: jax.Array  # (nele, nqpt)
    ke_lam: jax.Array  # (nele, 8, 8)
    ke_mu: jax.Array  # (nele, 8, 8)
    # dense affine parts on free dofs (None for matrix-free models)
    k_lam_ff: Optional[jax.Array]  # (nfree, nfree)
    k_mu_ff: Optional[jax.Array]
    # consistent UNIT-DENSITY element mass blocks (reference dynamics card,
    # me = dvol * Nm^T den Nm, src/mat_subroutine.py:74-75); None unless
    # built with with_mass=True. Scale by density: M_e = rho * me_unit.
    me_unit: Optional[jax.Array] = None  # (nele, edof, edof)
    # nodal-spring diagonal (solver dof space): K(c) = c0*K_lam + c1*K_mu
    # + diag(spring_diag). Reference "nodal_spring" card
    # (src/fem_solver.py:277-286 — unreachable there: gated behind the
    # unimplemented large-displacement chain). None when no springs.
    spring_diag: Optional[jax.Array] = None  # (ndof,)
    # static metadata
    nnodes: int = struct.field(pytree_node=False, default=0)
    nele: int = struct.field(pytree_node=False, default=0)
    ndof: int = struct.field(pytree_node=False, default=0)
    nfree: int = struct.field(pytree_node=False, default=0)
    nqpt: int = struct.field(pytree_node=False, default=0)
    thk: float = struct.field(pytree_node=False, default=10.0)
    stype: int = struct.field(pytree_node=False, default=2)
    # dofs per node: 2 for plane/axisym problems, 3 for 3-D solids
    ndm: int = struct.field(pytree_node=False, default=2)
    dense: bool = struct.field(pytree_node=False, default=True)
    has_prescribed: bool = struct.field(pytree_node=False, default=False)
    # equality (multi-point) constraints: full node-dof space -> solver
    # (reduced) dof space. Identity when no constraints. All solver-space
    # vectors (u, f_ext, reactions) expand to node-dof space via
    # ``v[dof_map]`` — a pure gather (vmap-safe).
    dof_map: Optional[jax.Array] = None  # (ndof_full,) int32
    ndof_full: int = struct.field(pytree_node=False, default=0)
    has_constraints: bool = struct.field(pytree_node=False, default=False)
    has_springs: bool = struct.field(pytree_node=False, default=False)

    @property
    def dtype(self):
        return self.coords.dtype


def _dof_maps(mesh: MeshData, ndm: int = 2):
    """ID/LM/free/supported dof index arrays, 0-based interleaved.

    ``ndm`` = dofs per node (2 for plane problems, 3 for solids)."""
    nnodes = mesh.nnodes
    ndof = nnodes * ndm
    lm = np.empty((mesh.nele, ndm * mesh.max_ele_node), dtype=np.int32)
    for d in range(ndm):
        lm[:, d::ndm] = mesh.conn * ndm + d

    fixed = np.zeros(ndof, dtype=bool)
    for node, flags in zip(mesh.bc_nodes, mesh.bc_flags):
        for d in range(ndm):
            if flags[d]:
                fixed[ndm * node + d] = True
    # prescribed displacements also mark dofs as supported
    # (reference merges DISPlacement rows into the support table,
    #  src/fem_preprocess.py:252-262)
    for node, vals in zip(mesh.disp_nodes, mesh.disp_vals):
        for d in range(ndm):
            if vals[d] != 0.0:
                fixed[ndm * node + d] = True

    supp_dof = np.nonzero(fixed)[0].astype(np.int32)
    free_dof = np.nonzero(~fixed)[0].astype(np.int32)

    # prescribed values on the final support set (reference D_all_dof,
    # src/fem_preprocess.py:372-410: a DISP row writes its value only into
    # dofs that ended up supported — nonzero-value rows marked themselves
    # supported above; zero-value rows only stick on BOUNdary-fixed dofs)
    prescribed = np.zeros(ndof, dtype=np.float64)
    for node, vals in zip(mesh.disp_nodes, mesh.disp_vals):
        for d in range(ndm):
            if fixed[ndm * node + d]:
                prescribed[ndm * node + d] = vals[d]
    return lm, free_dof, supp_dof, prescribed


def _load_vector(mesh: MeshData, ndof: int, ndm: int = 2):
    f = np.zeros(ndof, dtype=np.float64)
    for node, vals in zip(mesh.load_nodes, mesh.load_vals):
        for d in range(ndm):
            f[ndm * node + d] += vals[d]
    return f


def _apply_eq_constraints(eq_groups, nnodes, lm, free_dof, supp_dof, prescribed, f_ext, ndm: int = 2):
    """Equality (multi-point) constraints via master-dof renumbering.

    Mirrors the reference's eqcgroup semantics (``src/fem_preprocess.py:
    308-324``): each group is a list of (node, direction) pairs (0-based
    here) that SHARE one unknown; unconstrained dofs keep their relative
    order with ids 0..numdof-1 and group k becomes reduced dof numdof+k
    (the reference's numbering, 0-based). Returns the reduced-space
    (lm, free_dof, supp_dof, prescribed, f_ext, dof_map, ndof_red):
    loads accumulate into the shared dof; a group is fixed/prescribed if
    ANY member is (values must agree)."""
    ndof_full = nnodes * ndm
    fixed = np.zeros(ndof_full, dtype=bool)
    fixed[supp_dof] = True

    group_of = -np.ones(ndof_full, dtype=np.int64)
    for k, group in enumerate(eq_groups):
        for node, direction in group:
            d = ndm * node + direction
            if group_of[d] != -1:
                raise ValueError(f"dof (node {node}, dir {direction}) appears in two groups")
            group_of[d] = k

    n_groups = len(eq_groups)
    uncon = group_of == -1
    numdof = int(uncon.sum())
    dof_map = np.zeros(ndof_full, dtype=np.int32)
    dof_map[uncon] = np.arange(numdof, dtype=np.int32)
    dof_map[~uncon] = (numdof + group_of[~uncon]).astype(np.int32)
    ndof_red = numdof + n_groups

    lm_red = dof_map[lm]
    f_red = np.zeros(ndof_red)
    np.add.at(f_red, dof_map, f_ext)
    fixed_red = np.zeros(ndof_red, dtype=bool)
    np.logical_or.at(fixed_red, dof_map, fixed)
    pres_red = np.zeros(ndof_red)
    # a prescribed member imposes its value on the whole group
    np.maximum.at(pres_red, dof_map, prescribed)
    pres_min = np.zeros(ndof_red)
    np.minimum.at(pres_min, dof_map, prescribed)
    both = (pres_red != 0.0) & (pres_min != 0.0) & (pres_red != pres_min)
    if both.any():
        raise ValueError("conflicting prescribed values inside an equality group")
    pres_red = np.where(pres_red != 0.0, pres_red, pres_min)

    supp_red = np.nonzero(fixed_red)[0].astype(np.int32)
    free_red = np.nonzero(~fixed_red)[0].astype(np.int32)
    return lm_red.astype(np.int32), free_red, supp_red, pres_red, f_red, dof_map, ndof_red


try:  # optional C++ fast path (native/geometry.cpp); NumPy fallback below
    from . import _native
except ImportError:  # pragma: no cover
    _native = None


def _element_geometry(coords, conn, qpts, qwts, thk):
    """Host-side (NumPy) B-matrix / dvol precompute for all (elem, qpt)."""
    nele = conn.shape[0]
    nqpt = qpts.shape[0]
    xl = coords[conn]  # (nele, 4, 2)

    s = np.array([-1.0, 1.0, 1.0, -1.0])
    t = np.array([-1.0, -1.0, 1.0, 1.0])
    B = np.zeros((nele, nqpt, 3, 8))
    dvol = np.zeros((nele, nqpt))
    for q in range(nqpt):
        xi, eta = qpts[q]
        dn_dxi = 0.25 * s * (1.0 + t * eta)  # (4,)
        dn_deta = 0.25 * t * (1.0 + s * xi)
        dn_nat = np.stack([dn_dxi, dn_deta], axis=1)  # (4, 2)
        # J[e] = dn_nat.T @ xl[e] : (nele, 2, 2)
        J = np.einsum("na,enb->eab", dn_nat, xl)
        detj = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
        inv_t = (
            np.stack(
                [
                    np.stack([J[:, 1, 1], -J[:, 1, 0]], axis=-1),
                    np.stack([-J[:, 0, 1], J[:, 0, 0]], axis=-1),
                ],
                axis=1,
            )
            / detj[:, None, None]
        )
        dn_glob = np.einsum("na,eab->enb", dn_nat, inv_t)  # (nele, 4, 2)
        B[:, q, 0, 0::2] = dn_glob[:, :, 0]
        B[:, q, 1, 1::2] = dn_glob[:, :, 1]
        B[:, q, 2, 0::2] = dn_glob[:, :, 1]
        B[:, q, 2, 1::2] = dn_glob[:, :, 0]
        dvol[:, q] = thk * detj * qwts[q]
    return B, dvol


def build_fem_model(
    mesh: MeshData,
    section: SectionCard = SectionCard(),
    *,
    dense: Optional[bool] = None,
    dtype=jnp.float64,
    eq_groups=None,
    body_force=None,
    with_mass: bool = False,
    nodal_springs=None,
) -> FemModel:
    """Preprocess a mesh into the frozen FemModel pytree.

    ``dense=None`` auto-selects: dense affine K parts when the free-dof count
    is small enough for batched Cholesky (< 4096), matrix-free otherwise.

    ``eq_groups``: optional equality (multi-point) constraints — a sequence
    of groups, each a sequence of 0-based ``(node, direction)`` pairs whose
    dofs share one unknown (reference eqcgroup card,
    ``src/fem_preprocess.py:308-324``). The model's solver space is then the
    REDUCED dof space; ``model.dof_map`` gathers solver-space vectors back
    to the full node-dof layout.

    ``body_force``: optional ``(bx, by)`` constant body-force density per
    unit volume (reference part-card ``body``; its residual term
    ``-dvol*(Nm^T body)``, ``src/mat_subroutine.py:113-122``) — added to
    ``f_ext`` as the consistent nodal load.

    ``nodal_springs``: optional sequence of 0-based ``(node, direction, ks)``
    grounded nodal springs (reference ``nodal_spring`` card,
    ``src/fem_solver.py:277-286`` — unreachable there behind the
    unimplemented large-displacement chain). The operator becomes the
    3-term affine ``c0*K_lam + c1*K_mu + diag(s)``; dense solver paths
    carry it exactly (the 2-term spectral pencil does not apply — the
    dense solver falls back to Cholesky).
    """
    is3d = mesh.max_node_dof == 3 or mesh.space_dim == 3
    if is3d:
        if mesh.max_ele_node != 8 or mesh.space_dim != 3 or mesh.max_node_dof != 3:
            raise NotImplementedError(
                "3-D solids: 8-node hexahedra with 3 dofs/node only"
            )
        if section.stype != 4:
            raise ValueError(
                "3-D solid meshes take stype=4 (the reference's full 3-D "
                "isotropic_elasticity branch, src/mat_subroutine.py:303-311)"
            )
    else:
        if section.etype != 1 or mesh.max_ele_node not in (3, 4, 8, 9, 12, 16):
            raise NotImplementedError("unsupported element family")
        if section.stype not in (1, 2, 3):
            raise NotImplementedError(
                "plane strain (2), plane stress (1) and axisymmetric-without-"
                "torsion (3) supported in 2-D; stype 4 is the 3-D solid path "
                "(hex meshes)"
            )

    ndm = 3 if is3d else 2
    nel = mesh.max_ele_node
    lm, free_dof, supp_dof, prescribed = _dof_maps(mesh, ndm)
    ndof = mesh.nnodes * ndm
    f_ext = _load_vector(mesh, ndof, ndm)

    ndof_full = ndof
    dof_map_np = np.arange(ndof, dtype=np.int32)
    has_constraints = bool(eq_groups)
    if is3d:
        qpts, qwts = quadrature.int3d(min(5, max(1, section.intp)))
    else:
        qpts, qwts = quadrature.quadr2d(section.intp, nel)
    if is3d:
        from .ops.element import C_LAM6, C_MU6

        B, dvol = _element_geometry_3d(mesh.coords, mesh.conn, qpts, qwts)
        ke_lam = _ke_part_host(B, np.asarray(C_LAM6), dvol)
        ke_mu = _ke_part_host(B, np.asarray(C_MU6), dvol)
    elif section.stype == 3:
        # axisymmetric (no torsion): 4-row B with the hoop N/r row,
        # dvol = 2*pi*r*detJ*w (reference convention, src/mat_subroutine.py:
        # 67-70; its stype-3 constitutive driver is an empty stub — this
        # path completes the capability with the standard formulation)
        from .ops.element import C_AX_LAM4, C_AX_MU4

        B, dvol = _element_geometry_axisym(mesh.coords, mesh.conn, qpts, qwts)
        ke_lam = _ke_part_host(B, np.asarray(C_AX_LAM4), dvol)
        ke_mu = _ke_part_host(B, np.asarray(C_AX_MU4), dvol)
    elif _native is not None and section.stype == 2 and nel == 4:
        B, dvol, ke_lam, ke_mu = _native.precompute_quad4(
            np.ascontiguousarray(mesh.coords),
            np.ascontiguousarray(mesh.conn, dtype=np.int32),
            np.ascontiguousarray(qpts),
            np.ascontiguousarray(qwts),
            float(section.thk),
        )
    elif nel != 4:
        if section.stype == 2:
            C0, C1 = C_LAM3, C_MU3
        else:
            from .ops.element import C_PS_A, C_PS_B

            C0, C1 = C_PS_B, C_PS_A
        if _native is not None:
            # C++ generic-element fast path: shape derivatives evaluated
            # per quadrature point here (tiny), hot loops in native code
            from .ops.shape import shape_natural

            fn = shape_natural(nel)
            # one vmapped dispatch for all quadrature points (eager per-qpt
            # evaluation costs ~0.7 s of op-dispatch overhead alone)
            dshp = np.asarray(
                jax.vmap(lambda p: fn(p[0], p[1])[1])(jnp.asarray(qpts))
            )  # (nqpt, nel, 2)
            B, dvol, ke_lam, ke_mu = _native.precompute_generic(
                np.ascontiguousarray(mesh.coords),
                np.ascontiguousarray(mesh.conn, dtype=np.int32),
                np.ascontiguousarray(dshp),
                np.ascontiguousarray(qwts),
                float(section.thk),
                np.ascontiguousarray(np.asarray(C0, dtype=np.float64)),
                np.ascontiguousarray(np.asarray(C1, dtype=np.float64)),
            )
        else:
            B, dvol = element_geometry_generic(
                mesh.coords, mesh.conn, qpts, qwts, section.thk
            )
            ke_lam = _ke_part_host(B, np.asarray(C0), dvol)
            ke_mu = _ke_part_host(B, np.asarray(C1), dvol)
    else:
        B, dvol = _element_geometry(mesh.coords, mesh.conn, qpts, qwts, section.thk)
        # affine element stiffness parts: ke_p = sum_q dvol_q B^T C_p B.
        # For plane stress the basis is (C_PS_B, C_PS_A) with coefficients
        # (b, a) = (v*E/(1-v^2), E/(1-v^2)); slot layout keeps part 1 SPD
        # in both stypes (see ops.element.material_coeffs).
        if section.stype == 2:
            C0, C1 = C_LAM3, C_MU3
        else:
            from .ops.element import C_PS_A, C_PS_B

            C0, C1 = C_PS_B, C_PS_A
        ke_lam = _ke_part_host(B, np.asarray(C0), dvol)
        ke_mu = _ke_part_host(B, np.asarray(C1), dvol)

    def _shape_values_at_qpts():
        from .ops.shape import shape_natural, shape_natural_3d

        if is3d:
            fn_n = shape_natural_3d(nel)
            return np.asarray(
                jax.vmap(lambda p: fn_n(p[0], p[1], p[2])[0])(jnp.asarray(qpts))
            )  # (nqpt, nel)
        fn_n = shape_natural(nel)
        return np.asarray(jax.vmap(lambda p: fn_n(p[0], p[1])[0])(jnp.asarray(qpts)))

    me_unit = None
    if with_mass:
        # consistent unit-density mass: M_e[ndm*i+d, ndm*j+d] = sum_q dvol N_i N_j
        # (reference me = dvol * Nm^T den Nm, gated by its dynamics card)
        Nq = _shape_values_at_qpts()
        m_nodes = np.einsum("eq,qi,qj->eij", np.asarray(dvol), Nq, Nq)  # (nele, nel, nel)
        me_unit = np.zeros((mesh.nele, ndm * nel, ndm * nel))
        for d in range(ndm):
            me_unit[:, d::ndm, d::ndm] = m_nodes

    if body_force is not None and any(float(b) != 0.0 for b in body_force):
        # consistent body-force load: f[ndm*i+d] += b_d * sum_q dvol[e,q] N_i(q)
        # (reference residual term -dvol*(Nm^T body), src/mat_subroutine.py:113-122
        # — dormant there: the shipped part card carries body = 0)
        Nq = _shape_values_at_qpts()  # (nqpt, nel)
        w_node = np.einsum("eq,qi->ei", np.asarray(dvol), Nq)  # (nele, nel)
        fb = np.zeros(ndof)
        for d in range(ndm):
            np.add.at(
                fb,
                ndm * mesh.conn.reshape(-1) + d,
                (w_node * float(body_force[d])).reshape(-1),
            )
        f_ext = f_ext + fb

    if has_constraints:
        lm, free_dof, supp_dof, prescribed, f_ext, dof_map_np, ndof = (
            _apply_eq_constraints(
                eq_groups, mesh.nnodes, lm, free_dof, supp_dof, prescribed, f_ext, ndm
            )
        )

    spring_diag = None
    if nodal_springs:
        sd = np.zeros(ndof)
        for node, direction, ks in nodal_springs:
            np.add.at(sd, dof_map_np[ndm * int(node) + int(direction)], float(ks))
        spring_diag = sd

    nfree = free_dof.shape[0]
    if dense is None:
        dense = nfree <= 4096

    k_lam_ff = k_mu_ff = None
    if dense:
        K_lam = np.zeros((ndof, ndof))
        K_mu = np.zeros((ndof, ndof))
        edof = lm.shape[1]
        for e in range(lm.shape[0]):
            idx = lm[e]
            if has_constraints:
                # np.add.at, NOT fancy-index += : equality constraints can
                # put the SAME reduced dof twice in one element's map, and
                # += drops duplicate contributions
                ii = np.repeat(idx, edof)
                jj = np.tile(idx, edof)
                np.add.at(K_lam, (ii, jj), ke_lam[e].ravel())
                np.add.at(K_mu, (ii, jj), ke_mu[e].ravel())
            else:  # unconstrained element maps are duplicate-free
                K_lam[np.ix_(idx, idx)] += ke_lam[e]
                K_mu[np.ix_(idx, idx)] += ke_mu[e]
        k_lam_ff = K_lam[np.ix_(free_dof, free_dof)]
        k_mu_ff = K_mu[np.ix_(free_dof, free_dof)]

    free_mask = np.zeros(ndof)
    free_mask[free_dof] = 1.0

    # Dirichlet-lift vectors: g_p = (K_p @ u_s_full)[free] via per-element
    # matvec + scatter on the host (works for dense and matrix-free models)
    has_prescribed = bool(np.any(prescribed != 0.0))
    u_supp = prescribed[supp_dof]
    g_lam = np.zeros(ndof)
    g_mu = np.zeros(ndof)
    if has_prescribed:
        us_e = prescribed[lm]  # (nele, edof)
        np.add.at(g_lam, lm.reshape(-1), np.einsum("eij,ej->ei", ke_lam, us_e).reshape(-1))
        np.add.at(g_mu, lm.reshape(-1), np.einsum("eij,ej->ei", ke_mu, us_e).reshape(-1))

    as_dt = lambda x: jnp.asarray(x, dtype=dtype)
    return FemModel(
        coords=as_dt(mesh.coords),
        conn=jnp.asarray(mesh.conn, dtype=jnp.int32),
        lm=jnp.asarray(lm, dtype=jnp.int32),
        free_dof=jnp.asarray(free_dof, dtype=jnp.int32),
        supp_dof=jnp.asarray(supp_dof, dtype=jnp.int32),
        free_mask=as_dt(free_mask),
        f_ext=as_dt(f_ext),
        f_free=as_dt(f_ext[free_dof]),
        u_supp=as_dt(u_supp),
        g_lam_f=as_dt(g_lam[free_dof]),
        g_mu_f=as_dt(g_mu[free_dof]),
        B=as_dt(B),
        dvol=as_dt(dvol),
        ke_lam=as_dt(ke_lam),
        ke_mu=as_dt(ke_mu),
        k_lam_ff=as_dt(k_lam_ff) if k_lam_ff is not None else None,
        k_mu_ff=as_dt(k_mu_ff) if k_mu_ff is not None else None,
        me_unit=as_dt(me_unit) if me_unit is not None else None,
        spring_diag=as_dt(spring_diag) if spring_diag is not None else None,
        nnodes=mesh.nnodes,
        nele=mesh.nele,
        ndof=ndof,
        nfree=int(nfree),
        nqpt=int(qpts.shape[0]),
        thk=float(section.thk),
        stype=section.stype,
        ndm=ndm,
        dense=bool(dense),
        has_prescribed=has_prescribed,
        dof_map=jnp.asarray(dof_map_np),
        ndof_full=int(ndof_full),
        has_constraints=has_constraints,
        has_springs=spring_diag is not None,
    )


def _ke_part_host(B, C, dvol):
    """Host precompute ``ke[e] = sum_q dvol[e,q] B[e,q]^T C B[e,q]`` as
    batched BLAS matmuls — the generic ``np.einsum`` form is not
    BLAS-lowerable and costs ~1000 s at 16k hex elements (measured);
    this form is <1 s."""
    nele, nqpt, nr, edof = B.shape
    CBw = np.matmul(C[None, None], B) * dvol[:, :, None, None]
    Bf = B.reshape(nele, nqpt * nr, edof)
    return np.matmul(Bf.transpose(0, 2, 1), CBw.reshape(nele, nqpt * nr, edof))


def _hex8_dn_host(qpts):
    """Pure-NumPy trilinear (hex8) natural derivatives at all quadrature
    points at once: (nqpt, 8, 3). Must stay equal to the per-point jnp
    closure ``ops.shape.hex8_natural`` (asserted by
    ``tests/test_solid3d.py::test_hex8_host_dn_matches_shape_library``);
    only the ``_HEX_*`` sign constants are shared."""
    from .ops.shape import _HEX_XI as s, _HEX_ETA as t, _HEX_ZETA as r

    qpts = np.asarray(qpts)
    xi = qpts[:, 0][:, None]
    eta = qpts[:, 1][:, None]
    zeta = qpts[:, 2][:, None]
    return np.stack(
        [
            0.125 * s * (1.0 + t * eta) * (1.0 + r * zeta),
            0.125 * t * (1.0 + s * xi) * (1.0 + r * zeta),
            0.125 * r * (1.0 + s * xi) * (1.0 + t * eta),
        ],
        axis=2,
    )  # (nqpt, nel, 3)


def _element_geometry_3d(coords, conn, qpts, qwts):
    """3-D solid B-matrix / dvol precompute: B (nele, nqpt, 6, 3*nel) with
    strain rows [e11, e22, e33, g12, g23, g31], dvol = detJ * w."""
    from .ops.shape import shape_natural_3d

    conn = np.asarray(conn)
    nele, nel = conn.shape
    nqpt = qpts.shape[0]
    xl = np.asarray(coords)[conn]  # (nele, nel, 3)

    # Pure-NumPy trilinear derivatives for all qpts at once: evaluating the
    # jnp shape closure per-qpt costs ~150 eager device ops, which over the
    # axon tunnel dominated the 3-D model build (measured ~19 min at
    # 32x8x8 before this host-side path; <1 s after).
    if nel == 8:
        dn_all = _hex8_dn_host(qpts)
    else:  # pragma: no cover - no other 3-D family yet
        fn = shape_natural_3d(nel)
        dn_all = np.stack(
            [
                np.asarray(fn(float(q[0]), float(q[1]), float(q[2]))[1])
                for q in np.asarray(qpts)
            ]
        )

    B = np.zeros((nele, nqpt, 6, 3 * nel))
    dvol = np.zeros((nele, nqpt))
    for q in range(nqpt):
        dn_nat = dn_all[q]  # (nel, 3)
        J = np.einsum("na,enb->eab", dn_nat, xl)  # (nele, 3, 3)
        detj = np.linalg.det(J)
        if (detj <= 0.0).any():
            raise ValueError("non-positive Jacobian in a hex element")
        invJ = np.linalg.inv(J)
        # dn_nat = dn_glob @ J^T  =>  dn_glob[n, b] = sum_a dn_nat[n, a] * invJ[b, a]
        dn_glob = np.einsum("na,eba->enb", dn_nat, invJ)  # (nele, nel, 3)
        B[:, q, 0, 0::3] = dn_glob[:, :, 0]
        B[:, q, 1, 1::3] = dn_glob[:, :, 1]
        B[:, q, 2, 2::3] = dn_glob[:, :, 2]
        B[:, q, 3, 0::3] = dn_glob[:, :, 1]
        B[:, q, 3, 1::3] = dn_glob[:, :, 0]
        B[:, q, 4, 1::3] = dn_glob[:, :, 2]
        B[:, q, 4, 2::3] = dn_glob[:, :, 1]
        B[:, q, 5, 0::3] = dn_glob[:, :, 2]
        B[:, q, 5, 2::3] = dn_glob[:, :, 0]
        dvol[:, q] = detj * qwts[q]
    return B, dvol


def _element_geometry_axisym(coords, conn, qpts, qwts):
    """Axisymmetric 4-row B (rows [e_rr, e_zz, e_hoop = N/r, g_rz]) and
    dvol = 2*pi*r*detJ*w, any element family. Coordinates are (r, z);
    r must be > 0 on all quadrature points."""
    from .ops.shape import shape_natural

    conn = np.asarray(conn)
    nele, nel = conn.shape
    nqpt = qpts.shape[0]
    fn = shape_natural(nel)
    Nq = np.asarray(jax.vmap(lambda p: fn(p[0], p[1])[0])(jnp.asarray(qpts)))
    Dq = np.asarray(jax.vmap(lambda p: fn(p[0], p[1])[1])(jnp.asarray(qpts)))
    xl = np.asarray(coords)[conn]  # (nele, nel, 2) = (r, z)

    B = np.zeros((nele, nqpt, 4, 2 * nel))
    dvol = np.zeros((nele, nqpt))
    for q in range(nqpt):
        dn_nat = Dq[q]  # (nel, 2)
        J = np.einsum("na,enb->eab", dn_nat, xl)
        detj = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
        inv_t = (
            np.stack(
                [
                    np.stack([J[:, 1, 1], -J[:, 1, 0]], axis=-1),
                    np.stack([-J[:, 0, 1], J[:, 0, 0]], axis=-1),
                ],
                axis=1,
            )
            / detj[:, None, None]
        )
        dn_glob = np.einsum("na,eab->enb", dn_nat, inv_t)  # (nele, nel, 2)
        r_q = xl[:, :, 0] @ Nq[q]  # (nele,)
        if (r_q <= 0.0).any():
            raise ValueError("axisymmetric mesh must have r > 0 at all qpts")
        B[:, q, 0, 0::2] = dn_glob[:, :, 0]
        B[:, q, 1, 1::2] = dn_glob[:, :, 1]
        B[:, q, 2, 0::2] = Nq[q][None, :] / r_q[:, None]
        B[:, q, 3, 0::2] = dn_glob[:, :, 1]
        B[:, q, 3, 1::2] = dn_glob[:, :, 0]
        dvol[:, q] = 2.0 * np.pi * r_q * detj * qwts[q]
    return B, dvol


def element_geometry_generic(coords, conn, qpts, qwts, thk):
    """B-matrix / dvol precompute for ANY supported element order (3/4/8/9/
    12/16 nodes) via the ``ops.shape`` natural-shape dispatch — the
    generalization hook for higher-order meshes (the quad4 fast paths above
    remain the default). Returns (B (nele, nqpt, 3, 2*nel), dvol).
    """
    from .ops.shape import shape_natural

    conn = np.asarray(conn)
    nele, nel = conn.shape
    nqpt = qpts.shape[0]
    fn = shape_natural(nel)
    xl = np.asarray(coords)[conn]  # (nele, nel, 2)

    B = np.zeros((nele, nqpt, 3, 2 * nel))
    dvol = np.zeros((nele, nqpt))
    for q in range(nqpt):
        _, dn_nat_j = fn(float(qpts[q, 0]), float(qpts[q, 1]))
        dn_nat = np.asarray(dn_nat_j)  # (nel, 2)
        J = np.einsum("na,enb->eab", dn_nat, xl)
        detj = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
        inv_t = (
            np.stack(
                [
                    np.stack([J[:, 1, 1], -J[:, 1, 0]], axis=-1),
                    np.stack([-J[:, 0, 1], J[:, 0, 0]], axis=-1),
                ],
                axis=1,
            )
            / detj[:, None, None]
        )
        dn_glob = np.einsum("na,eab->enb", dn_nat, inv_t)
        B[:, q, 0, 0::2] = dn_glob[:, :, 0]
        B[:, q, 1, 1::2] = dn_glob[:, :, 1]
        B[:, q, 2, 0::2] = dn_glob[:, :, 1]
        B[:, q, 2, 1::2] = dn_glob[:, :, 0]
        dvol[:, q] = thk * detj * qwts[q]
    return B, dvol
