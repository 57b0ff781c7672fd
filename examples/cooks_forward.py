"""Forward Cook's-membrane analysis through the public API.

TPU-native equivalent of the reference's `fem_test.py` smoke driver:
build the model, solve, report tip displacement and the von Mises probe
(element 12, qpts {1,3}).
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import numpy as np

import vbicm_tpu
from vbicm_tpu import MaterialCard, build_fem_model, fea_solution
from vbicm_tpu.mesh import cooks_membrane_mesh
from vbicm_tpu.solver import probe_von_mises
from vbicm_tpu.ops.element import lame_from_Ev

vbicm_tpu.enable_x64()

mesh = cooks_membrane_mesh(20, 10)
model = build_fem_model(mesh)
mat = MaterialCard(E=20.0, v=0.3)
sol = fea_solution(model, mat)

u = np.asarray(sol.u)
print(f"tip (node 231) displacement: ux={u[460]:+.9f}  uy={u[461]:+.9f}")
lam, mu = lame_from_Ev(mat.E, mat.v)
vm = probe_von_mises(model, sol.u, lam, mu, 12, np.array([1, 3]))
print(f"von Mises @ elem 12, qpts (1,3): {np.asarray(vm)}")
print(f"reaction balance (sum Ry): {np.asarray(sol.reactions)[1::2].sum():+.6f}")
