"""Configuration dataclasses.

Replaces the reference's hard-coded property-card dictionaries
(``model_property_cards.py:5-75``) and the script-top hyperparameter block
(``main_custom_training.py:19-38,87-107``) with typed, immutable configs.
Every semantic knob of the reference is preserved; dormant nonlinear-solver
cards (arc length, line search, NR control) are kept as data so future
nonlinear solvers can consume them.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class MaterialCard:
    """Isotropic elastic material (reference ``model_property_cards.py:25``)."""

    E: float = 20.0
    v: float = 0.3
    mat_type: int = 1  # 1 = elastic isotropic

    @property
    def lam(self) -> float:
        return self.v * self.E / ((1.0 + self.v) * (1.0 - 2.0 * self.v))

    @property
    def mu(self) -> float:
        return 0.5 * self.E / (1.0 + self.v)


@dataclasses.dataclass(frozen=True)
class SectionCard:
    """2-D section (reference ``model_property_cards.py:28-29``).

    stype: 1 = plane stress, 2 = plane strain, 3 = axisymmetric,
    4 = axisymmetric + torsion. etype: 1 = quadrilateral.
    """

    intp: int = 2  # Gauss order per direction (2 -> 2x2 rule)
    thk: float = 10.0
    etype: int = 1
    stype: int = 2
    eform: int = 1


@dataclasses.dataclass(frozen=True)
class SolverControl:
    """Solver switches (reference ``model_property_cards.py:39-68``).

    The reference problem is linear (``solver=1``); NR/arc-length/line-search
    cards are retained for forward compatibility with nonlinear materials.
    """

    solver: int = 1  # 1 linear | 2 nonlinear
    max_iter: int = 10
    tol_cr: float = 1.0e-10
    tol_Rforce: int = 0  # 1 -> residual norm, 0 -> energy norm
    numsteps: int = 1
    strain_energy_flag: int = 0
    print_flag: int = 0


@dataclasses.dataclass(frozen=True)
class ThetaMap:
    """theta -> (E, nu) reparameterization (``main_custom_training.py:32``,
    ``src/data_generation_2sam_more_loss.py:182-186``):

        E  = exp(theta_std[0] * t0 + theta_mean[0])
        nu = 0.5 * sigmoid(theta_std[1] * t1 + theta_mean[1])
    """

    theta_mean: Tuple[float, float] = (float(np.log(20.0)), 0.0)
    theta_std: Tuple[float, float] = (0.1, 0.015)


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """Observation / probe configuration (``main_custom_training.py:21-38``).

    y = nodal displacement (ux, uy) at ``node_id`` (1-based),
    h = reference-convention von Mises stress at element ``ele_id`` (1-based),
    quadrature points ``nipt_id`` (1-based).
    ``sig_e`` / ``sig_eta`` are noise *variances* (the reference uses them as
    variances inside the likelihoods and takes sqrt for sampling).
    """

    y_dim: int = 2
    theta_dim: int = 2
    z_dim: int = 2
    sig_e: float = 1.0e-1
    sig_eta: float = 3.0e-3
    node_id: int = 231
    ele_id: int = 12
    nipt_id: Tuple[int, ...] = (1, 3)
    theta_map: ThetaMap = dataclasses.field(default_factory=ThetaMap)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Two-step VI training hyperparameters (``main_custom_training.py:87-107``)."""

    num_neuron: int = 20
    num_layers1: int = 3
    num_layers2: int = 3
    alpha: float = 1.0e-7
    lr: float = 1.0e-3
    flg_lr_decay: bool = True
    lr_patience: int = 5
    decay_rate: float = 0.9
    batch_size: int = 64
    num_epoch1: int = 200
    num_epoch2: int = 200
    # Reference quirks, replicated by default and switchable:
    #  * pairing="cross": term2/term5 broadcast every y in the batch against
    #    every FEM sample in the batch (B x B*ne pairs), which is what the
    #    reference's expand_dims/broadcast actually computes
    #    (``main_custom_training.py:199-214,347-364``).
    #  * pairing="per_sample": the mathematically intended ELBO pairing
    #    (each y against only its own ne_sam posterior samples).
    pairing: str = "cross"
    #  * lr_decay_mode="reference": decay check reads the *unwritten* current
    #    epoch slot (``main_custom_training.py:286-294``), so it fires iff the
    #    loss lr_patience epochs ago was negative.
    #  * lr_decay_mode="fixed": decay when loss increased over the window.
    lr_decay_mode: str = "reference"
    seed: int = 0
    # Run each epoch's full-batch steps as ONE lax.scan dispatch (identical
    # update sequence; ~2x wall-clock on TPU where the B=64 step is
    # dispatch-bound). The remainder batch still runs as a single step.
    scan_epochs: bool = True
    # With scan_epochs: cap each device program to this many scanned batches
    # (0 = whole epoch in one scan). Host loop between chunks, optimizer
    # state carried — the update trajectory is IDENTICAL; only program
    # length changes. Set for very expensive per-batch forward models
    # (hundreds of inner CG iterations per step): monolithic epoch scans
    # there can trip the TPU worker (docs/KNOWN_ISSUES.md).
    # Prefer a value that divides the epoch's full-batch count
    # (n_sam // batch_size): a shorter final chunk compiles a SECOND
    # epoch-scan executable per distinct length (one-time, per step) —
    # harmless for cheap fh's, minutes for two-level-solver fh's. The
    # update trajectory is identical either way.
    scan_chunk: int = 0
    # Checkpoint cadence in epochs for BOTH steps. 0 (default) keeps the
    # reference's convention of num_epochs // 5. Long runs through expensive
    # fh's on axon should set 1: the intermittent TPU worker crash
    # (docs/KNOWN_ISSUES.md) means an external retry loop pays back only the
    # epochs since the last checkpoint — at //5 cadence a 20-epoch run can
    # lose 4 full-order epochs per crash, which stalls forward progress
    # entirely when the crash interval is shorter than that.
    ckpt_every: int = 0
    # Checkpoint after EVERY scan chunk within an epoch (both steps; only
    # active in scan_epochs mode). The round-5 escalation of the worker
    # crash (docs/KNOWN_ISSUES.md) killed runs faster than a full 160x80
    # epoch (~40 s) completes, so even ckpt_every=1 made no progress;
    # chunk-level bundles (~every scan_chunk batches, a few seconds) bound
    # the loss per crash to one chunk. Sub-epoch bundles write only
    # ``latest.msgpack`` (the numbered per-epoch files keep the
    # reference's completed-epoch meaning); resume re-derives the
    # interrupted epoch's keys, so the continuation trajectory is exact.
    # Costs one host sync + ~16 KB write per chunk — negligible against
    # expensive-fh chunks, wasteful for cheap ones.
    ckpt_chunk: bool = False
    # Optional global-norm gradient clip (optax.clip_by_global_norm) applied
    # before Adam in BOTH steps. None (default) = reference parity (no
    # clipping). Sharp-likelihood problems (small sig_e, many probes — the
    # random-field inversion) see per-batch gradient norms of 1e3-1e4 with
    # occasional excursions; a clip around 10x the typical norm keeps one
    # bad batch from derailing the optimizer without biasing steady-state
    # updates.
    clip_grad_norm: float | None = None
    # Resample the reparameterization draws every training step (textbook
    # SVI) instead of reusing the dataset's fixed e_data seeds (the
    # reference's common-random-numbers scheme, ``main_custom_training.py:
    # 202-208``). Fixed CRN makes the step-1 MC objective DETERMINISTIC in
    # (mu, sig), so the optimizer can exploit the particular draws: with a
    # sharp likelihood the variance head collapses orders of magnitude
    # below the true posterior variance (the ne_sam=4 sample set is fitted,
    # not the expectation). Fresh draws keep the gradient an unbiased
    # estimator of the true ELBO gradient; the fixed-point variance is then
    # the actual posterior variance. Default False = reference parity.
    resample_e: bool = False
    # Posterior family of q(theta|y): "meanfield" (reference parity —
    # independent Gaussians per dim) or "fullcov" (Cholesky head
    # Sigma = L L^T, ``models.mlp.ThetaPosteriorFullCovNet``). On
    # correlated posteriors the mean-field optimum matches the precision
    # diagonal, underestimating marginal stds (measured down to 0.01x MCMC
    # on the random-field family); "fullcov" removes that representation
    # error (held-out calibration at small n_data is separately limited by
    # the amortization gap — see vi.refine). Requires
    # pairing="per_sample" (the cross-pairing broadcast is a mean-field
    # reference quirk).
    # "flow" (conditional affine-coupling flow on top of the mean-field
    # base, ``models.flow.ThetaPosteriorFlowNet``) additionally removes the
    # GAUSSIAN restriction — curved/skewed posteriors (nonlinear forward
    # maps with weakly identified parameters) are representable; the flow
    # starts exactly mean-field (zero-init couplings) and its exact
    # log-density keeps the ELBO a plain reparameterized MC average.
    posterior: str = "meanfield"
    # Number of affine coupling layers of the "flow" posterior (ignored by
    # the Gaussian families) and the tanh bound on each layer's log-scale
    # output (overflow guard inside jit).
    flow_couplings: int = 4
    flow_s_cap: float = 3.0
