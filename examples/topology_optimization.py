"""SIMP compliance minimization on a cantilever — the optimizer the
reference's dormant topopt plumbing (``*_topopt`` preprocessing, Ktl_ele,
strain energy, force-inverter hooks) never shipped.

The sensitivity is jax.grad THROUGH the FEM solve (verified against the
classic adjoint formula in tests/test_topopt.py); each OC iteration is one
jitted value_and_grad of the filter->SIMP->assemble->Cholesky->compliance
pipeline.

Run: python examples/topology_optimization.py
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import numpy as np

import vbicm_tpu

vbicm_tpu.enable_x64()

from vbicm_tpu.mesh.rect import cantilever_quad4_mesh  # noqa: E402
from vbicm_tpu.model import build_fem_model  # noqa: E402
from vbicm_tpu.ops.topopt import optimize_compliance  # noqa: E402


def main():
    nx, ny = 48, 16
    model = build_fem_model(cantilever_quad4_mesh(nx, ny), dense=True)
    volfrac = 0.4

    def cb(it, c, rho):
        if it % 10 == 0:
            print(f"iter {it:3d}: compliance {c:.4e}, vol {float(rho.mean()):.3f}")

    rho, hist = optimize_compliance(
        model, volfrac=volfrac, n_iter=60, rmin=1.8, callback=cb
    )
    print(
        f"final compliance {hist['compliance'][-1]:.4e} "
        f"({hist['compliance'][-1] / hist['compliance'][0]:.2f}x initial), "
        f"vol {hist['vol'][-1]:.3f}"
    )
    # ASCII density map (top row first)
    _ascii_map(rho, nx, ny)

    # --- force inverter: the design problem the reference's spring /
    # finverter hooks target (src/fem_solver.py:264-286) ---------------
    from vbicm_tpu.mesh.rect import inverter_quad4_mesh
    from vbicm_tpu.ops.topopt import optimize_mechanism
    from vbicm_tpu.solver import make_finverter_vector

    nx = ny = 32
    mesh, in_node, out_node = inverter_quad4_mesh(nx, ny)
    k = 20.0
    m2 = build_fem_model(
        mesh, dense=True, nodal_springs=[(in_node, 0, k), (out_node, 0, k)]
    )
    Lv = make_finverter_vector(m2, [(out_node, 0, 1)])
    rho2, hist2 = optimize_mechanism(m2, Lv, volfrac=0.3, n_iter=60, rmin=1.4)
    print(
        f"\nforce inverter: output u_x {hist2['objective'][0]:+.4f} (uniform) "
        f"-> {hist2['objective'][-1]:+.4f} (optimized) — motion inverted, "
        f"vol {hist2['vol'][-1]:.3f}"
    )
    _ascii_map(rho2, nx, ny)


def _ascii_map(rho, nx, ny):
    g = np.asarray(rho).reshape(ny, nx)
    chars = " .:-=+*#%@"
    for row in g[::-1]:
        print("".join(chars[min(9, int(v * 9.999))] for v in row))


if __name__ == "__main__":
    main()
