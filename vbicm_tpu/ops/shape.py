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
