"""2-D isoparametric shape functions (closed form, vectorizable).

Replaces the reference's per-point scalar routines (``shapef``/``shp2d``
family, ``src/fem_preprocess.py:823-1174``) with array-valued closed forms
usable under ``vmap`` over (element, quadrature-point). The quad4 path is
the hot one (the Cook's meshes are pure quad4); 8/9-node serendipity and
Lagrange quads are provided for forward compatibility.

Conventions (same as reference ``shapef``): given natural coords (xi, eta)
and element node coordinates ``xl`` of shape (nel, 2) in counter-clockwise
corner order (-,-), (+,-), (+,+), (-,+):

  * ``N`` (nel,) shape functions,
  * ``dN`` (nel, 2) global derivatives [dN/dx, dN/dy],
  * ``detj`` scalar Jacobian determinant.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Corner signs for bilinear quads, order (-,-), (+,-), (+,+), (-,+)
_XI_S = np.array([-1.0, 1.0, 1.0, -1.0])
_ETA_S = np.array([-1.0, -1.0, 1.0, 1.0])


def quad4_natural(xi, eta):
    """N and natural derivatives for a bilinear quad. Shapes: (4,), (4, 2)."""
    s = jnp.asarray(_XI_S, dtype=jnp.result_type(xi, 1.0))
    t = jnp.asarray(_ETA_S, dtype=jnp.result_type(xi, 1.0))
    n = 0.25 * (1.0 + s * xi) * (1.0 + t * eta)
    dn_dxi = 0.25 * s * (1.0 + t * eta)
    dn_deta = 0.25 * t * (1.0 + s * xi)
    return n, jnp.stack([dn_dxi, dn_deta], axis=1)


def quad8_natural(xi, eta):
    """8-node serendipity quad: corners then mid-sides (bottom,right,top,left)."""
    dt = jnp.result_type(xi, 1.0)
    s = jnp.asarray(_XI_S, dtype=dt)
    t = jnp.asarray(_ETA_S, dtype=dt)
    nc = 0.25 * (1.0 + s * xi) * (1.0 + t * eta) * (s * xi + t * eta - 1.0)
    dnc_dxi = 0.25 * s * (1.0 + t * eta) * (2.0 * s * xi + t * eta)
    dnc_deta = 0.25 * t * (1.0 + s * xi) * (s * xi + 2.0 * t * eta)
    # mid-side nodes at (0,-1), (1,0), (0,1), (-1,0)
    nm = jnp.stack(
        [
            0.5 * (1.0 - xi * xi) * (1.0 - eta),
            0.5 * (1.0 + xi) * (1.0 - eta * eta),
            0.5 * (1.0 - xi * xi) * (1.0 + eta),
            0.5 * (1.0 - xi) * (1.0 - eta * eta),
        ]
    )
    dnm_dxi = jnp.stack(
        [
            -xi * (1.0 - eta),
            0.5 * (1.0 - eta * eta),
            -xi * (1.0 + eta),
            -0.5 * (1.0 - eta * eta),
        ]
    )
    dnm_deta = jnp.stack(
        [
            -0.5 * (1.0 - xi * xi),
            -eta * (1.0 + xi),
            0.5 * (1.0 - xi * xi),
            -eta * (1.0 - xi),
        ]
    )
    n = jnp.concatenate([nc, nm])
    dn = jnp.stack([jnp.concatenate([dnc_dxi, dnm_dxi]), jnp.concatenate([dnc_deta, dnm_deta])], axis=1)
    return n, dn


def quad9_natural(xi, eta):
    """9-node Lagrange quad (tensor-product quadratic), node 9 at center.

    Standard construction: corners pick up +1/4 of the center bubble,
    mid-sides -1/2 (so the 9 functions sum to one).
    """
    n8, dn8 = quad8_natural(xi, eta)
    bubble = (1.0 - xi * xi) * (1.0 - eta * eta)
    db = jnp.stack([-2.0 * xi * (1.0 - eta * eta), -2.0 * eta * (1.0 - xi * xi)])  # (2,)
    corr = jnp.concatenate([jnp.full((4,), -0.25), jnp.full((4,), 0.5)])
    n = jnp.concatenate([n8 - corr * bubble, jnp.array([bubble])])
    dn = jnp.concatenate([dn8 - corr[:, None] * db[None, :], db[None, :]], axis=0)
    return n, dn


def isoparametric(xl, n_dn):
    """Map natural-derivative shapes to global derivatives.

    xl: (nel, 2) node coords; n_dn: (N (nel,), dN_nat (nel, 2)).
    Returns (N, dN_global (nel,2), detj).
    """
    n, dn_nat = n_dn
    # J[a, b] = sum_i dN_i/dxi_a * x_i[b]
    jac = dn_nat.T @ xl  # (2, 2): rows d/dxi, d/deta; cols x, y
    detj = jac[0, 0] * jac[1, 1] - jac[0, 1] * jac[1, 0]
    # dn_nat = dn_glob @ jac.T  =>  dn_glob = dn_nat @ jac^{-T}
    inv_t = jnp.array([[jac[1, 1], -jac[1, 0]], [-jac[0, 1], jac[0, 0]]]) / detj
    dn_glob = dn_nat @ inv_t
    return n, dn_glob, detj


def quad4_shape(xi, eta, xl):
    """Shape functions + global gradients + detJ for one bilinear quad point.

    Equivalent to reference ``shapef`` (``src/fem_preprocess.py:904-971``):
    shp[2]=N, shp[0]=dN/dx, shp[1]=dN/dy, xsj=detJ.
    """
    return isoparametric(xl, quad4_natural(xi, eta))


def tri3_natural(xi, eta):
    """Degenerate 3-node triangle via the collapsed quad (reference
    ``shp2d`` nel==3 path, ``src/fem_preprocess.py:888-890``: node 3
    absorbs node 4)."""
    n4, dn4 = quad4_natural(xi, eta)
    n = jnp.stack([n4[0], n4[1], n4[2] + n4[3]])
    dn = jnp.stack([dn4[0], dn4[1], dn4[2] + dn4[3]])
    return n, dn


def _lagrange_cubic_1d(x):
    """1-D cubic Lagrange basis at nodes (-1, -1/3, 1/3, 1); returns
    (values (4,), derivatives (4,))."""
    nodes = jnp.asarray([-1.0, -1.0 / 3.0, 1.0 / 3.0, 1.0])
    vals = []
    ders = []
    for i in range(4):
        others = [j for j in range(4) if j != i]
        denom = 1.0
        for j in others:
            denom = denom * (nodes[i] - nodes[j])
        num = 1.0
        for j in others:
            num = num * (x - nodes[j])
        vals.append(num / denom)
        d = 0.0
        for k in others:
            term = 1.0
            for j in others:
                if j != k:
                    term = term * (x - nodes[j])
            d = d + term
        ders.append(d / denom)
    return jnp.stack(vals), jnp.stack(ders)


# 16-node Lagrange quad node ordering: corners, then edge nodes CCW
# (2 per edge: bottom, right, top, left), then the 4 interior nodes
# (matches the nodal-rule layout of reference ``int2dn`` l=16,
#  ``src/fem_preprocess.py:620-624``).
_Q16_IJ = [
    (0, 0), (3, 0), (3, 3), (0, 3),          # corners
    (1, 0), (2, 0), (3, 1), (3, 2),          # bottom, right edges
    (2, 3), (1, 3), (0, 2), (0, 1),          # top, left edges
    (1, 1), (2, 1), (2, 2), (1, 2),          # interior
]


def quad16_natural(xi, eta):
    """16-node bicubic Lagrange quad (reference ``shp2dc`` capability,
    ``src/fem_preprocess.py:973-1033``)."""
    lx, dlx = _lagrange_cubic_1d(xi)
    ly, dly = _lagrange_cubic_1d(eta)
    n = jnp.stack([lx[i] * ly[j] for i, j in _Q16_IJ])
    dn = jnp.stack(
        [jnp.stack([dlx[i] * ly[j], lx[i] * dly[j]]) for i, j in _Q16_IJ]
    )
    return n, dn


# 12-node cubic serendipity: corners then 2 nodes per edge CCW
_Q12_CORNER_S = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
_Q12_EDGE = [
    # (xi_i, eta_i, which axis is the third-point axis)
    (-1.0 / 3.0, -1.0, 0), (1.0 / 3.0, -1.0, 0),   # bottom
    (1.0, -1.0 / 3.0, 1), (1.0, 1.0 / 3.0, 1),     # right
    (1.0 / 3.0, 1.0, 0), (-1.0 / 3.0, 1.0, 0),     # top
    (-1.0, 1.0 / 3.0, 1), (-1.0, -1.0 / 3.0, 1),   # left
]


def quad12_natural(xi, eta):
    """12-node cubic serendipity quad (reference ``shp2ds`` capability,
    ``src/fem_preprocess.py:1035-1120``). Standard closed forms:
      corner:  N = (1/32)(1+xi_i xi)(1+eta_i eta)(9(xi^2+eta^2) - 10)
      edge:    N = (9/32)(1+xi_i' ...)(1 - s^2)(1+9 s s_i) on the edge axis.
    """
    vals = []
    ders = []
    for sx, sy in _Q12_CORNER_S:
        r2 = xi * xi + eta * eta
        n = (1.0 + sx * xi) * (1.0 + sy * eta) * (9.0 * r2 - 10.0) / 32.0
        dx = (sx * (1.0 + sy * eta) * (9.0 * r2 - 10.0) + (1.0 + sx * xi) * (1.0 + sy * eta) * 18.0 * xi) / 32.0
        dy = (sy * (1.0 + sx * xi) * (9.0 * r2 - 10.0) + (1.0 + sx * xi) * (1.0 + sy * eta) * 18.0 * eta) / 32.0
        vals.append(n)
        ders.append(jnp.stack([dx, dy]))
    for xi_i, eta_i, axis in _Q12_EDGE:
        if axis == 0:  # node varies along xi; eta = +-1 edge
            n = 9.0 / 32.0 * (1.0 + eta_i * eta) * (1.0 - xi * xi) * (1.0 + 9.0 * xi_i * xi)
            dx = 9.0 / 32.0 * (1.0 + eta_i * eta) * (-2.0 * xi * (1.0 + 9.0 * xi_i * xi) + (1.0 - xi * xi) * 9.0 * xi_i)
            dy = 9.0 / 32.0 * eta_i * (1.0 - xi * xi) * (1.0 + 9.0 * xi_i * xi)
        else:  # node varies along eta; xi = +-1 edge
            n = 9.0 / 32.0 * (1.0 + xi_i * xi) * (1.0 - eta * eta) * (1.0 + 9.0 * eta_i * eta)
            dy = 9.0 / 32.0 * (1.0 + xi_i * xi) * (-2.0 * eta * (1.0 + 9.0 * eta_i * eta) + (1.0 - eta * eta) * 9.0 * eta_i)
            dx = 9.0 / 32.0 * xi_i * (1.0 - eta * eta) * (1.0 + 9.0 * eta_i * eta)
        vals.append(n)
        ders.append(jnp.stack([dx, dy]))
    return jnp.stack(vals), jnp.stack(ders)


# --- 3-D solid elements -----------------------------------------------------
# Corner signs for the trilinear hex, bottom quad CCW then top quad CCW:
# (-,-,-), (+,-,-), (+,+,-), (-,+,-), (-,-,+), (+,-,+), (+,+,+), (-,+,+)
_HEX_XI = np.array([-1.0, 1.0, 1.0, -1.0, -1.0, 1.0, 1.0, -1.0])
_HEX_ETA = np.array([-1.0, -1.0, 1.0, 1.0, -1.0, -1.0, 1.0, 1.0])
_HEX_ZETA = np.array([-1.0, -1.0, -1.0, -1.0, 1.0, 1.0, 1.0, 1.0])


def hex8_natural(xi, eta, zeta):
    """Trilinear 8-node hexahedron. Returns (N (8,), dN_natural (8, 3)).

    The reference's shape library is 2-D only (``src/fem_preprocess.py:
    823-1174``) but it carries 3-D quadrature (``int3d``, ``:647-744``) and
    the full 3-D constitutive law (``isotropic_elasticity`` stype=4,
    ``src/mat_subroutine.py:303-311``); this element closes that gap.
    """
    dt = jnp.result_type(xi, 1.0)
    s = jnp.asarray(_HEX_XI, dtype=dt)
    t = jnp.asarray(_HEX_ETA, dtype=dt)
    r = jnp.asarray(_HEX_ZETA, dtype=dt)
    n = 0.125 * (1.0 + s * xi) * (1.0 + t * eta) * (1.0 + r * zeta)
    dn_dxi = 0.125 * s * (1.0 + t * eta) * (1.0 + r * zeta)
    dn_deta = 0.125 * t * (1.0 + s * xi) * (1.0 + r * zeta)
    dn_dzeta = 0.125 * r * (1.0 + s * xi) * (1.0 + t * eta)
    return n, jnp.stack([dn_dxi, dn_deta, dn_dzeta], axis=1)


def shape_natural_3d(nel: int):
    """3-D element dispatch: nel -> (N, dN_natural) over (xi, eta, zeta)."""
    if nel == 8:
        return hex8_natural
    raise ValueError(f"unsupported 3-D element node count {nel}")


_NATURAL_BY_NEL = None


def shape_natural(nel: int):
    """Dispatch mirroring reference ``shp2d`` (``src/fem_preprocess.py:848-902``):
    nel -> (N, dN_natural) function. Supported: 3, 4, 8, 9, 12, 16."""
    global _NATURAL_BY_NEL
    if _NATURAL_BY_NEL is None:
        _NATURAL_BY_NEL = {
            3: tri3_natural,
            4: quad4_natural,
            8: quad8_natural,
            9: quad9_natural,
            12: quad12_natural,
            16: quad16_natural,
        }
    try:
        return _NATURAL_BY_NEL[nel]
    except KeyError:
        raise ValueError(f"unsupported element node count {nel}") from None
