"""Alias package: the full project name, importable form.

The framework lives in :mod:`vbicm_tpu` (the dash-separated project name
"variational-bayesian-inference-for-computational-mechanics_tpu" is not a
valid Python identifier). This alias re-exports everything and registers
the submodules so both import roots work:

    import variational_bayesian_inference_for_computational_mechanics_tpu as vb
    vb.build_fem_model(...)
"""
import sys as _sys

import vbicm_tpu as _pkg
from vbicm_tpu import *  # noqa: F401,F403
from vbicm_tpu import (  # noqa: F401
    config, mesh, model, models, ops, parallel, prob, rom, solver, utils, vi,
)
from vbicm_tpu import eval as eval_  # noqa: F401  ('eval' shadows the builtin)

for _name, _mod in list(_sys.modules.items()):
    if _name.startswith("vbicm_tpu"):
        _sys.modules[__name__ + _name[len("vbicm_tpu"):]] = _mod

__all__ = _pkg.__all__
__version__ = _pkg.__version__
