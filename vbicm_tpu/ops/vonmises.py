"""Deviatoric projectors and the reference's von Mises recovery.

The reference computes "von Mises" stress as

    vm = sqrt(0.5 * || P6 @ sig6 ||^2)

where ``P6`` is the 9-space symmetric deviatoric projector restricted to the
rows/columns [0, 4, 8, 3, 7, 2] (i.e. [s11, s22, s33, s21, s32, s31]) —
``src/fem_postprocess.py:163-170`` with ``Pdevs`` from
``src/fem_preprocess.py:32-42``. Because only one of each symmetric shear
pair survives the restriction, the shear rows carry a factor 1/2:

    P6 @ sig6 = [dev(s)_11, dev(s)_22, dev(s)_33, t12/2, t23/2, t31/2]

Note this is NOT the textbook von Mises sqrt(3 J2); it is the quantity the
reference trains and validates on, so we reproduce it exactly (the dataset,
the ELBO's h(theta) and the MCMC ground truth all use it). A standard
``von_mises_classical`` is provided alongside for downstream users.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _pdevs9() -> np.ndarray:
    """9x9 deviatoric projector P = I_sym - (1/3) I (x) I on row-major tensors."""
    eye9 = np.zeros((9, 9))
    # symmetrizer: (e_ij + e_ji)/2
    for i in range(3):
        for j in range(3):
            r = 3 * i + j
            eye9[r, 3 * i + j] += 0.5
            eye9[r, 3 * j + i] += 0.5
    vol = np.zeros((9, 9))
    diag = [0, 4, 8]
    for r in diag:
        for c in diag:
            vol[r, c] = 1.0 / 3.0
    return eye9 - vol


PDEVS9 = _pdevs9()
PVOL9 = np.zeros((9, 9))
for _r in (0, 4, 8):
    for _c in (0, 4, 8):
        PVOL9[_r, _c] = 1.0 / 3.0

# Restriction to the 6-vector [s11, s22, s33, t12(=s21), t23(=s32), t31(=s31)]
_IDX6 = np.array([0, 4, 8, 3, 7, 2])
PDEVS6 = PDEVS9[np.ix_(_IDX6, _IDX6)]


def von_mises_reference(sig6):
    """Reference-convention von Mises: sqrt(0.5 * sum((PDEVS6 @ sig6)^2)).

    sig6: (..., 6) stress [s11, s22, s33, t12, t23, t31].
    """
    p6 = jnp.asarray(PDEVS6, sig6.dtype)
    s = sig6 @ p6.T
    return jnp.sqrt(0.5 * jnp.sum(s * s, axis=-1))


def von_mises_classical(sig6):
    """Textbook von Mises sqrt(3 J2) = sqrt(1.5 s:s) for comparison/plots."""
    s11, s22, s33, t12, t23, t31 = (sig6[..., i] for i in range(6))
    p = (s11 + s22 + s33) / 3.0
    d11, d22, d33 = s11 - p, s22 - p, s33 - p
    j2 = 0.5 * (d11**2 + d22**2 + d33**2) + t12**2 + t23**2 + t31**2
    return jnp.sqrt(3.0 * j2)
