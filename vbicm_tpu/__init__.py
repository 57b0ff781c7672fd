"""vbicm_tpu — TPU-native variational-Bayesian inference for computational mechanics.

A ground-up JAX/XLA rebuild of the capabilities of
``nfeng2022/Variational-Bayesian-Inference-for-Computational-Mechanics``:
an amortized variational-Bayes network that infers material parameters
(Young's modulus E, Poisson ratio nu) and predicts unobservable mechanical
response (von Mises stress) from measured displacements, with a fully
differentiable finite-element forward model inside the ELBO.

Design (TPU-first, not a port):
  * one pure-functional FEM core (no twin NumPy/TF solvers, no mutable
    class-level globals as in reference ``src/fem_preprocess.py:25-30``);
  * affine stiffness decomposition ``K(lam, mu) = lam*K_lam + mu*K_mu``
    precomputed once, so per-sample "assembly" is an O(n^2) axpy instead of
    re-integrating elements (reference re-assembles per solve,
    ``src/fem_solver_tf.py:229-341``);
  * batched Cholesky solve with a custom VJP (adjoint solve reuses the
    factorization) instead of differentiating through a dense solve;
  * ``jax.vmap`` over the posterior-sample axis and ``shard_map`` over a
    device mesh for multi-chip sample parallelism (reference's only
    concurrency is ``tf.map_fn(parallel_iterations=12)``,
    ``src/data_generation_2sam_more_loss.py:173-175``);
  * matrix-free preconditioned CG for refined meshes where a dense factor
    does not fit.

Precision: the reference runs float64 end to end
(``main_custom_training.py:109``). Call :func:`enable_x64` (or set
``JAX_ENABLE_X64=1``) for parity-grade accuracy; the TPU fast path uses
float32 factorization + float64 iterative refinement (see ``ops.solve``).
"""

__version__ = "0.1.0"


def enable_x64() -> None:
    """Enable float64 in JAX (parity mode, matches the reference's f64 run)."""
    import jax

    jax.config.update("jax_enable_x64", True)


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache. On the axon TPU tunnel every new
    shape compiles through a remote relay (30-300 s); a warm cache makes
    repeat runs of the drivers/benchmarks start in seconds."""
    import os

    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from . import config  # noqa: E402
from .config import MaterialCard, SectionCard, ProblemConfig  # noqa: E402
from .model import FemModel, build_fem_model  # noqa: E402
from .solver import FemSolution, fea_solution, make_fh_fun  # noqa: E402

__all__ = [
    "enable_x64",
    "config",
    "MaterialCard",
    "SectionCard",
    "ProblemConfig",
    "FemModel",
    "build_fem_model",
    "FemSolution",
    "fea_solution",
    "make_fh_fun",
]
