"""Structural-analysis tour: the capabilities beyond the reference's linear
static path, in one script on the Cook's membrane.

  1. modal analysis — natural frequencies from the consistent mass matrix;
  2. transient dynamics — Newmark ring-down of the statically loaded
     membrane after load release, with the energy-conservation diagnostic;
  3. linearized buckling — critical load factor of the f_ext pattern via
     the autodiff geometric stiffness;
  4. finite strain — Neo-Hookean large-displacement solve vs the linear one.

All reference cards for these exist but are gated off or route to code
that does not exist there (dynamics/mass: model_property_cards.py:33,
src/fem_solver.py:255-258; large displacement: src/mat_subroutine.py
isw=3 hooks).

Run: python examples/structural_analysis.py
"""
# Allow running directly from a repo checkout without installation.
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys
import jax
import jax.numpy as jnp
import numpy as np

import vbicm_tpu

vbicm_tpu.enable_x64()

from vbicm_tpu.config import MaterialCard  # noqa: E402
from vbicm_tpu.eval.buckling import buckling_factors  # noqa: E402
from vbicm_tpu.eval.modal import natural_frequencies  # noqa: E402
from vbicm_tpu.mesh import cooks_membrane_mesh  # noqa: E402
from vbicm_tpu.model import build_fem_model  # noqa: E402
from vbicm_tpu.ops.dynamics import make_newmark_integrator, total_energy  # noqa: E402
from vbicm_tpu.ops.finite_strain import solve_finite_strain  # noqa: E402
from vbicm_tpu.ops.element import material_coeffs  # noqa: E402
from vbicm_tpu.solver import fea_solution  # noqa: E402


def main():
    model = build_fem_model(cooks_membrane_mesh(8, 4), dense=True, with_mass=True)
    rho = 1.0

    # 1. modal
    w, _ = natural_frequencies(model, density=rho, n_modes=3)
    print(f"natural frequencies (rad/s): {np.round(w, 4)}")

    # 2. ring-down: static solution released at t=0, 2 fundamental periods
    sol = fea_solution(model, MaterialCard())
    u0 = jnp.asarray(sol.u)[np.asarray(model.free_dof)]
    T = 2 * np.pi / float(w[0])
    dt, nsteps = T / 200, 400
    integ = make_newmark_integrator(model, density=rho, dt=dt)
    us, vels, _ = integ(u0, jnp.zeros_like(u0), jnp.zeros((nsteps, model.nfree)))
    en = np.asarray(total_energy(model, us, vels, density=rho))
    print(
        f"Newmark ring-down: {nsteps} steps, dt={dt:.4f}; "
        f"energy drift {abs(en[-1] - en[0]) / en[0]:.2e} (conservative)"
    )

    # 3. buckling
    factors, _ = buckling_factors(model, n_modes=2)
    print(f"linearized buckling load factors: {np.round(factors, 2)}")

    # 4. finite strain (Neo-Hookean) vs linear kinematics
    c0, c1 = material_coeffs(model.stype, 20.0, 0.3)
    res = solve_finite_strain(model, float(c0), float(c1), n_steps=2)
    tip = model.nnodes - 1
    uy_lin = float(sol.u[2 * tip + 1])
    uy_nl = float(res.u[2 * tip + 1])
    print(
        f"tip uy: linear {uy_lin:+.4f}, Neo-Hookean {uy_nl:+.4f} "
        f"(finite-strain stiffening {100 * (1 - uy_nl / uy_lin):.1f}%); "
        f"Newton iters {int(res.iterations)}, tol {float(res.tol):.1e}, "
        f"converged {bool(res.converged)}"
    )


if __name__ == "__main__":
    main()
