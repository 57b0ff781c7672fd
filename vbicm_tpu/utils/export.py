"""AOT serving export: freeze trained models (and even the FEM operator)
into portable StableHLO artifacts via ``jax.export``.

Production-deployment surface the reference does not have: its serving
story is "load the Keras .h5 in a Python process with TF installed"
(``main_postprocess.py:26-45``).  Here the trained amortized-VI model — or
any jittable function in the package, including the differentiable FEM
observation operator itself — is ahead-of-time lowered, serialized to a
single self-contained StableHLO blob, and can be reloaded and executed
WITHOUT any of this package's code (any JAX runtime, or any StableHLO
consumer: XLA AOT, IREE, ...).  Exports are shape-polymorphic in the batch
dimension, so one artifact serves any request size.

Typical flow::

    server = make_vi_server(theta_net, res.theta_params, z_net, res.z_params)
    blob = export_fn(server, example_y, batch_polymorphic=True)
    save_exported("model.stablehlo", server, example_y, batch_polymorphic=True)
    ...
    serve = load_exported("model.stablehlo")     # no vbicm_tpu needed
    out = serve(y_batch)                         # dict of posterior moments
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _specs(example_args, batch_polymorphic: bool):
    """ShapeDtypeStructs for export; leading dim symbolic if requested."""
    from jax import export as jx

    def spec(a):
        a = jnp.asarray(a)
        if batch_polymorphic and a.ndim >= 1:
            (b,) = jx.symbolic_shape("b")
            return jax.ShapeDtypeStruct((b, *a.shape[1:]), a.dtype)
        return jax.ShapeDtypeStruct(a.shape, a.dtype)

    return jax.tree_util.tree_map(spec, example_args)


def export_fn(fn: Callable, *example_args, batch_polymorphic: bool = False) -> bytes:
    """Lower ``fn`` (jittable, closed over all parameters) at the example
    argument shapes and serialize to a self-contained StableHLO blob.

    ``batch_polymorphic=True`` makes the LEADING axis of every array
    argument a symbolic dimension ``b`` — the exported artifact then
    executes at any batch size (pinned by a test).
    """
    from jax import export as jx

    specs = _specs(example_args, batch_polymorphic)
    exported = jx.export(jax.jit(fn))(*specs)
    return exported.serialize()


def save_exported(path: str, fn: Callable, *example_args,
                  batch_polymorphic: bool = False) -> None:
    with open(path, "wb") as f:
        f.write(export_fn(fn, *example_args, batch_polymorphic=batch_polymorphic))


def load_exported(path_or_bytes) -> Callable:
    """Rehydrate a serialized export into a callable.  Needs only JAX —
    none of this package's model/solver code."""
    from jax import export as jx

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jx.deserialize(blob)
    return exported.call


def make_vi_server(theta_net, theta_params, z_net, z_params,
                   flow_e=None) -> Callable:
    """The inference-server kernel: ``serve(y) -> dict`` of every quantity
    the reference's postprocess reads off the trained nets
    (``src/postprocess_lib.py:990-1084``), in one fused batched call:

    - posterior  q(theta|y):   theta_mean, theta_sig
    - predictive p(z|y) lognormal(mu, sig): log-space moments AND the
      physical-space mean/std via the lognormal identities
      E[z] = exp(mu + sig^2/2), Var[z] = (exp(sig^2)-1) exp(2 mu + sig^2)
      (the same identities the step-2 loss uses,
      ``main_custom_training.py:347-364``).

    Closed over the trained parameters — ready for :func:`export_fn`.

    ``flow_e``: for the normalizing-flow posterior family
    (``models.flow.ThetaPosteriorFlowNet``) pass a fixed (n_mc, d_theta)
    block of base draws; the server then reports deterministic Monte-Carlo
    posterior moments (the flow has no closed-form moments). The draws are
    baked into the exported artifact, so serving stays a pure function of y.
    """
    from ..models.mlp import marginal_variance

    def serve(y):
        if flow_e is not None:
            theta_sam, _ = theta_net.apply(theta_params, y, flow_e)
            theta_mean = jnp.mean(theta_sam, axis=1)
            theta_sig = jnp.var(theta_sam, axis=1)
        else:
            theta_mean, theta_sig, _ = theta_net.apply(theta_params, y)
            if theta_sig.ndim == 3:
                # full-covariance family: the head carries the Cholesky
                # factor; report the marginal variances diag(L L^T)
                theta_sig = marginal_variance(theta_sig)
        z_mu, z_sig, _ = z_net.apply(z_params, y)
        z_var = z_sig**2
        z_mean_phys = jnp.exp(z_mu + 0.5 * z_var)
        z_std_phys = jnp.sqrt((jnp.exp(z_var) - 1.0) * jnp.exp(2.0 * z_mu + z_var))
        return {
            "theta_mean": theta_mean,
            "theta_sig": theta_sig,
            "logz_mean": z_mu,
            "logz_sig": z_sig,
            "z_mean": z_mean_phys,
            "z_std": z_std_phys,
        }

    return serve
