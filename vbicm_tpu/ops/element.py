"""Element-level kernels: B-matrices, constitutive law, stiffness, stress.

TPU-first reformulation of the reference's per-point scalar loops
(``src/mat_subroutine.py:7-183``, ``src/mat_subroutine_tf.py:8-390``):
everything is a closed-form batched tensor contraction, evaluated under
``vmap`` over (element, quadrature point) and, at training time, over the
posterior-sample axis.

Key structural idea — *affine material decomposition*. Isotropic linear
elasticity is affine in the Lame parameters:

    C(E, nu) = lam(E, nu) * C_LAM + mu(E, nu) * C_MU

so the element stiffness splits as ``ke = lam * ke_lam + mu * ke_mu`` with
theta-independent ``ke_lam = sum_q dvol_q B^T C_LAM B`` (and likewise mu).
Those are precomputed once at model build; a per-sample "assembly" is then a
2-term axpy instead of a quadrature loop. This is what lets the TPU path
amortize all FEM geometry work across the whole VI training run.

Voigt conventions follow the reference: in-plane strain vector
``eps3 = [e11, e22, gamma12]`` (engineering shear), reduced stiffness rows
[0, 1, 3] of the 4x4 plane-strain matrix (``src/mat_subroutine.py:291-299``),
stress stored as the 6-vector ``[s11, s22, s33, t12, t23, t31]``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Reduced (3x3) constitutive basis for plane strain:
#   C3 = lam * C_LAM3 + mu * C_MU3, acting on [e11, e22, gamma12].
C_LAM3 = np.array([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
C_MU3 = np.array([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 0.0, 1.0]])

# Axisymmetric (stype 3, no torsion) affine basis acting on
# [e_rr, e_zz, e_hoop, gamma_rz] (reference isotropic elasticity restricted
# to the 4 axisym components; its stype-3 constitutive driver is an empty
# stub, src/mat_subroutine.py:300-302 — this completes the capability):
#   C4 = lam * C_AX_LAM4 + mu * C_AX_MU4
C_AX_LAM4 = np.array([
    [1.0, 1.0, 1.0, 0.0],
    [1.0, 1.0, 1.0, 0.0],
    [1.0, 1.0, 1.0, 0.0],
    [0.0, 0.0, 0.0, 0.0],
])
C_AX_MU4 = np.array([
    [2.0, 0.0, 0.0, 0.0],
    [0.0, 2.0, 0.0, 0.0],
    [0.0, 0.0, 2.0, 0.0],
    [0.0, 0.0, 0.0, 1.0],
])


def lame_from_Ev(E, v):
    """Lame parameters (lam, mu) from Young's modulus / Poisson ratio."""
    lam = v * E / ((1.0 + v) * (1.0 - 2.0 * v))
    mu = 0.5 * E / (1.0 + v)
    return lam, mu


def plane_strain_C3(E, v):
    """Reduced 3x3 plane-strain stiffness (rows/cols [0,1,3] of the 4x4).

    Matches reference ``isotropic_elasticity`` stype=2
    (``src/mat_subroutine.py:291-299``).
    """
    lam, mu = lame_from_Ev(E, v)
    dt = jnp.result_type(E, 1.0)
    return lam * jnp.asarray(C_LAM3, dt) + mu * jnp.asarray(C_MU3, dt)


def plane_stress_C3(E, v):
    """Plane-stress 3x3 stiffness (reference ``isotropic_elasticity`` stype=1,
    ``src/mat_subroutine.py:283-290``)."""
    c = E / (1.0 - v**2)
    z = jnp.zeros_like(jnp.asarray(E) * jnp.asarray(v))
    one = z + 1.0
    return c * jnp.stack(
        [
            jnp.stack([one, v + z, z]),
            jnp.stack([v + z, one, z]),
            jnp.stack([z, z, (1.0 - v) / 2.0 + z]),
        ]
    )


def bmatrix(dn_glob):
    """Strain-displacement matrix for one quadrature point.

    dn_glob: (nel, 2) global shape gradients. Returns B (3, 2*nel) with dof
    ordering interleaved [u1x, u1y, u2x, ...] (reference ``calculate_Bm_Nm``,
    ``src/mat_subroutine.py:125-137``).
    """
    nel = dn_glob.shape[0]
    dt = dn_glob.dtype
    b = jnp.zeros((3, 2 * nel), dtype=dt)
    cols_x = jnp.arange(nel) * 2
    cols_y = cols_x + 1
    b = b.at[0, cols_x].set(dn_glob[:, 0])
    b = b.at[1, cols_y].set(dn_glob[:, 1])
    b = b.at[2, cols_x].set(dn_glob[:, 1])
    b = b.at[2, cols_y].set(dn_glob[:, 0])
    return b


def element_stiffness_parts(B, dvol):
    """Theta-independent stiffness parts for one element.

    B: (nqpt, 3, 2*nel) global B-matrices; dvol: (nqpt,) = thk * detJ * w.
    Returns (ke_lam, ke_mu), each (2*nel, 2*nel), with
    ``ke = lam*ke_lam + mu*ke_mu = sum_q dvol_q B_q^T C(lam,mu) B_q``.
    """
    dt = B.dtype
    clam = jnp.asarray(C_LAM3, dt)
    cmu = jnp.asarray(C_MU3, dt)
    ke_lam = jnp.einsum("qai,ab,qbj,q->ij", B, clam, B, dvol)
    ke_mu = jnp.einsum("qai,ab,qbj,q->ij", B, cmu, B, dvol)
    return ke_lam, ke_mu


def stress6_plane_strain(eps3, lam, mu):
    """Full 6-component stress from in-plane strain (plane strain).

    eps3: (..., 3) = [e11, e22, gamma12]. Returns (..., 6) stress
    [s11, s22, s33, t12, t23, t31] — the layout the reference stores in
    ``out_data['ele_stress']`` (``src/mat_subroutine.py:76-81,291-299``):
    s33 = lam*(e11+e22) is carried even though e33 = 0.
    """
    e11 = eps3[..., 0]
    e22 = eps3[..., 1]
    g12 = eps3[..., 2]
    tr = e11 + e22
    s11 = lam * tr + 2.0 * mu * e11
    s22 = lam * tr + 2.0 * mu * e22
    s33 = lam * tr
    t12 = mu * g12
    zero = jnp.zeros_like(s11)
    return jnp.stack([s11, s22, s33, t12, zero, zero], axis=-1)


def elasticity_C6(E, v):
    """Full 3-D isotropic 6x6 stiffness (reference ``isotropic_elasticity``
    stype=4, ``src/mat_subroutine.py:303-311``), Voigt order
    [e11, e22, e33, g12, g23, g31]."""
    lam, mu = lame_from_Ev(E, v)
    dt = jnp.result_type(E, 1.0)
    cl = jnp.zeros((6, 6), dt).at[:3, :3].set(1.0)
    cm = jnp.diag(jnp.asarray([2.0, 2.0, 2.0, 1.0, 1.0, 1.0], dt))
    return lam * cl + mu * cm


# Full 3-D affine constitutive basis, Voigt order
# [e11, e22, e33, g12, g23, g31] (engineering shears):
#   C6(E, v) = lam * C_LAM6 + mu * C_MU6  (same split as elasticity_C6)
C_LAM6 = np.zeros((6, 6))
C_LAM6[:3, :3] = 1.0
C_MU6 = np.diag([2.0, 2.0, 2.0, 1.0, 1.0, 1.0])


def bmatrix_3d(dn_glob):
    """3-D strain-displacement matrix for one quadrature point.

    dn_glob: (nel, 3) global shape gradients. Returns B (6, 3*nel), strain
    rows [e11, e22, e33, g12, g23, g31], dof ordering interleaved
    [u1x, u1y, u1z, u2x, ...] (the 3-D extension of the reference's
    ``calculate_Bm_Nm`` layout, ``src/mat_subroutine.py:125-137``).
    """
    nel = dn_glob.shape[0]
    b = jnp.zeros((6, 3 * nel), dtype=dn_glob.dtype)
    cx = jnp.arange(nel) * 3
    cy = cx + 1
    cz = cx + 2
    b = b.at[0, cx].set(dn_glob[:, 0])
    b = b.at[1, cy].set(dn_glob[:, 1])
    b = b.at[2, cz].set(dn_glob[:, 2])
    b = b.at[3, cx].set(dn_glob[:, 1])
    b = b.at[3, cy].set(dn_glob[:, 0])
    b = b.at[4, cy].set(dn_glob[:, 2])
    b = b.at[4, cz].set(dn_glob[:, 1])
    b = b.at[5, cx].set(dn_glob[:, 2])
    b = b.at[5, cz].set(dn_glob[:, 0])
    return b


def stress6_3d(eps6, lam, mu):
    """Full 3-D isotropic stress from the 6-strain (engineering shears):
    s_i = lam*tr(e) + 2*mu*e_i (normals), t_ij = mu*g_ij — the reference's
    ``isotropic_elasticity`` stype=4 law (``src/mat_subroutine.py:303-311``)
    applied directly."""
    lam = jnp.asarray(lam)[..., None]
    mu = jnp.asarray(mu)[..., None]
    tr = (eps6[..., 0] + eps6[..., 1] + eps6[..., 2])[..., None]
    normals = lam * tr + 2.0 * mu * eps6[..., :3]
    shears = mu * eps6[..., 3:]
    return jnp.concatenate([normals, shears], axis=-1)


def bmatrix_axisym(dn_glob, n, r):
    """Axisymmetric (no torsion) 4-row B-matrix (reference
    ``calculate_Bm_Nm`` stype=3, ``src/mat_subroutine.py:138-151``):
    rows [e_rr, e_zz, e_hoop = N/r, gamma_rz]; dof order interleaved.

    dn_glob: (nel, 2) global gradients; n: (nel,) shape values; r: radius at
    the quadrature point.
    """
    nel = dn_glob.shape[0]
    b = jnp.zeros((4, 2 * nel), dtype=dn_glob.dtype)
    cx = jnp.arange(nel) * 2
    cy = cx + 1
    b = b.at[0, cx].set(dn_glob[:, 0])
    b = b.at[1, cy].set(dn_glob[:, 1])
    b = b.at[2, cx].set(n / r)
    b = b.at[3, cx].set(dn_glob[:, 1])
    b = b.at[3, cy].set(dn_glob[:, 0])
    return b


def plane_stress_condensation(C6):
    """Static condensation of the out-of-plane row/col for plane stress with
    a general 6x6 tangent (reference ``plane_stress_Ct``,
    ``src/mat_subroutine.py:253-272``): eliminates index 2 (e33) from the
    [0, 1, 3] x [0, 1, 3] block. For isotropic elasticity this reproduces
    ``plane_stress_C3`` exactly."""
    idx = jnp.asarray([0, 1, 3])
    Caa = C6[jnp.ix_(idx, idx)]
    Ca3 = C6[idx, 2][:, None]
    C3a = C6[2, idx][None, :]
    c33 = C6[2, 2]
    return Caa - (Ca3 @ C3a) / c33


# Plane-stress 2-term affine basis: C_ps(E, v) = a*C_PS_A + b*C_PS_B with
# a = E/(1-v^2), b = v*a. C_PS_A is SPD (so it can serve as the spectral
# pencil's B-matrix), C_PS_B is the coupling part.
C_PS_A = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.5]])
C_PS_B = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, -0.5]])


def material_coeffs(stype: int, E, v):
    """Affine coefficients (c0, c1) for K = c0*K_p0 + c1*K_p1.

    stype=2 (plane strain): (lam, mu) with parts (C_LAM3, C_MU3).
    stype=1 (plane stress): (b, a) = (v*E/(1-v^2), E/(1-v^2)) with parts
    (C_PS_B, C_PS_A) — part 1 is the SPD one in both cases, as the spectral
    solver requires.
    """
    if stype == 2:
        return lame_from_Ev(E, v)
    if stype == 1:
        a = E / (1.0 - v**2)
        return v * a, a
    if stype == 3:  # axisymmetric: Lame pair with parts (C_AX_LAM4, C_AX_MU4)
        return lame_from_Ev(E, v)
    if stype == 4:  # 3-D solid: Lame pair with parts (C_LAM6, C_MU6)
        return lame_from_Ev(E, v)
    raise NotImplementedError(f"stype {stype}")


def stress6_plane_stress(eps3, b, a):
    """Plane-stress 6-stress from in-plane strain with affine coeffs (b, a):
    s11 = a*e11 + b*e22, s22 = a*e22 + b*e11, t12 = (a-b)/2*g12, s33 = 0
    (reference ``isotropic_elasticity`` stype=1, ``src/mat_subroutine.py:283-290``).
    """
    e11 = eps3[..., 0]
    e22 = eps3[..., 1]
    g12 = eps3[..., 2]
    s11 = a * e11 + b * e22
    s22 = a * e22 + b * e11
    t12 = 0.5 * (a - b) * g12
    zero = jnp.zeros_like(s11)
    return jnp.stack([s11, s22, zero, t12, zero, zero], axis=-1)


def eps33_plane_stress(eps3, v):
    """Out-of-plane strain under plane stress: e33 = -v/(1-v)*(e11+e22)
    (reference ``isotropic_elasticity`` stype=1, ``src/mat_subroutine.py:289``)."""
    return -v / (1.0 - v) * (eps3[..., 0] + eps3[..., 1])


def stress6_axisym(eps4, lam, mu):
    """Axisymmetric stress 6-vector [s_rr, s_zz, s_hoop, t_rz, 0, 0] from
    the 4-strain [e_rr, e_zz, e_hoop, g_rz] (isotropic)."""
    tr = eps4[..., 0] + eps4[..., 1] + eps4[..., 2]
    s0 = lam * tr + 2.0 * mu * eps4[..., 0]
    s1 = lam * tr + 2.0 * mu * eps4[..., 1]
    s2 = lam * tr + 2.0 * mu * eps4[..., 2]
    s3 = mu * eps4[..., 3]
    zero = jnp.zeros_like(s0)
    return jnp.stack([s0, s1, s2, s3, zero, zero], axis=-1)
