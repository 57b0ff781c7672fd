"""The full two-step VI pipeline on a 3-D hex8 model — the probabilistic
layer is ndm-generic (y = 3-dof displacement probe, z = von Mises at hex
quadrature points). Nothing comparable exists in the reference (2-D only)."""
import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from vbicm_tpu.config import ProblemConfig, SectionCard, TrainConfig
from vbicm_tpu.mesh.solid3d import beam_hex8_mesh
from vbicm_tpu.model import build_fem_model
from vbicm_tpu.prob.datagen import generate_data_fem
from vbicm_tpu.solver import make_fh_fun
from vbicm_tpu.vi.train import TwoStepTrainer


@pytest.mark.slow
def test_two_step_vi_on_hex_beam():
    model = build_fem_model(
        beam_hex8_mesh(4, 2, 2, lx=4.0), SectionCard(stype=4), dense=True
    )
    cfg = dataclasses.replace(
        ProblemConfig(), y_dim=3, node_id=model.nnodes, ele_id=8, nipt_id=(1, 5)
    )
    fh = make_fh_fun(model, cfg)
    y, h = fh(jnp.zeros(2))
    assert y.shape == (3,) and h.shape == (2,)

    ds = generate_data_fem(
        jax.random.PRNGKey(0), jax.jit(jax.vmap(fh)), n_sam=64, ne_sam=2, d_y=3
    )
    tcfg = TrainConfig(batch_size=16, num_epoch1=3, num_epoch2=3)
    trainer = TwoStepTrainer(model, cfg, tcfg)
    res = trainer.fit(
        ds.y_data, ds.e_data, jax.random.PRNGKey(1), epochs1=3, epochs2=3
    )
    assert np.isfinite(res.hist_step1).all() and np.isfinite(res.hist_step2).all()
    # ELBO trains: step-1 loss decreases over the short schedule
    assert res.hist_step1[-1] < res.hist_step1[0]
