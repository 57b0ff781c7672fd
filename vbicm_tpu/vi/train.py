"""Two-step VI trainer.

Functional rebuild of the reference training harness
(``main_custom_training.py:243-434``):

  step 1: fit q(theta|y) by reparameterized ELBO with the FEM inside the
          likelihood — Adam(lr=1e-3, beta1=0.99, beta2=0.999, eps=1e-10)
          (``:243``);
  bridge: push posterior samples for every y through one big batched FEM
          sweep, cache log-z moments (``:310-328``);
  step 2: fit the lognormal predictive p(z|y) with step-1 parameters frozen
          — Adam with Keras defaults (lr=1e-3, beta1=0.9, eps=1e-7)
          (``:389``), loss = alpha*(term4 - term5) + moment matching.

Training-semantics parity points, all replicated:
  * fixed e_data common-random-number seeds in every loss evaluation;
  * last-batch loss is what goes into the history (``:294,428``);
  * checkpoints every num_epoch//5 epochs, filename ``{epoch:02d}-
    {loss:.8f}`` (``:282-283,416-417``);
  * the lr-decay quirk: the check reads the current epoch's history slot
    *before* it is written (``:286-294``), so with positive losses it never
    fires. ``lr_decay_mode="fixed"`` gives the intended decay-on-plateau.

TPU mapping: the whole train step (nets + reparameterization + B*ne batched
FEM solves + ELBO + Adam update) is ONE jitted function; with a device mesh
the batch axis is sharded and XLA lowers the gradient reduction to psum over
ICI. The reference runs 256 sequential FEM graphs per step through
tf.map_fn threads; here it is a single batched Cholesky on the MXU.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..config import ProblemConfig, TrainConfig
from ..model import FemModel
from ..models.mlp import (
    ThetaPosteriorFullCovNet,
    ThetaPosteriorNet,
    ZPredictiveNet,
    marginal_variance,
)
from ..solver import make_fh_fun
from .elbo import (
    make_loss_step1,
    make_loss_step1_flow,
    make_loss_step1_fullcov,
    make_loss_step2,
)


@dataclasses.dataclass
class TrainResult:
    theta_params: Any
    z_params: Any
    hist_step1: np.ndarray
    hist_step2: np.ndarray
    logz_mean_post: np.ndarray
    logz_sig_post: np.ndarray
    # wall time per epoch (host-observed); epoch 0 includes the compile,
    # so steady-state throughput = steps / sum(times[1:])
    epoch_times_step1: Any = None
    epoch_times_step2: Any = None


def _atomic_write(path, data):
    """Write-then-rename so a crash mid-write never leaves a truncated file
    at `path` (os.replace is atomic on POSIX). The axon worker crash was
    observed to land exactly inside a checkpoint write (zero-byte
    latest.msgpack, 2026-08-21)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _batches(n, batch_size):
    """Split n into (n_full, remainder) batch sizes."""
    return n // batch_size, n % batch_size


class TwoStepTrainer:
    def __init__(
        self,
        model: Optional[FemModel],
        cfg: ProblemConfig = ProblemConfig(),
        tcfg: TrainConfig = TrainConfig(),
        *,
        factor_dtype=None,
        refine_iters: int = 0,
        mesh=None,
        dtype=jnp.float64,
        results_path: Optional[str] = None,
        verbose: bool = False,
        fh=None,
        fh_batch=None,
        y_norm=None,
        bridge_chunk: int = 4096,
    ):
        """``fh`` overrides the forward model: any pure ``theta -> (y, h)``
        (e.g. the analytic validation cases in ``prob.analytic`` or a ROM
        ``make_fh_fun_rom``) — the trainer only needs the observation
        operator, not the FEM model itself.

        ``fh_batch`` overrides the BATCHED form ``thetas (B,2) -> (y, h)``
        directly (instead of ``jax.vmap(fh)``) — for natively-batched
        solvers (``make_fh_fun_batched`` over
        ``make_two_level_solver_batched``) whose CG loop is written over
        the whole sample block.

        ``y_norm=(mean, std)`` bakes frozen input standardization into both
        nets (see ``models.mlp._normalize``) — needed when y spans decades
        (analytic case 2/3); ``None`` preserves reference parity.

        ``bridge_chunk`` bounds the FEM-sweep batch of the step-1->2 bridge
        (n*ne posterior samples total) — lower it for large models so the
        sweep's compiled batch fits HBM (the default 4096 OOMs beyond ~5k
        dofs on a 16 GB chip)."""
        self.cfg = cfg
        self.tcfg = tcfg
        self.mesh = mesh
        self.dtype = dtype
        self.results_path = results_path
        self.verbose = verbose
        self.bridge_chunk = int(bridge_chunk)

        if fh is None and fh_batch is None:
            fh = make_fh_fun(model, cfg, factor_dtype=factor_dtype, refine_iters=refine_iters)
        self._fh = fh
        self._batch_fh = jax.vmap(fh) if fh_batch is None else fh_batch
        shift = scale = None
        if y_norm is not None:
            shift = tuple(float(v) for v in np.asarray(y_norm[0]).ravel())
            scale = tuple(float(v) for v in np.asarray(y_norm[1]).ravel())
        self.fullcov = tcfg.posterior == "fullcov"
        self.flow = tcfg.posterior == "flow"
        if tcfg.posterior not in ("meanfield", "fullcov", "flow"):
            raise ValueError(f"unknown posterior family {tcfg.posterior!r}")
        if (self.fullcov or self.flow) and tcfg.pairing != "per_sample":
            raise ValueError(
                f'posterior="{tcfg.posterior}" requires pairing="per_sample" '
                "(the cross-pairing broadcast is a mean-field reference quirk)"
            )
        if self.flow:
            from ..models.flow import ThetaPosteriorFlowNet

            self.theta_net = ThetaPosteriorFlowNet(
                tcfg.num_neuron, tcfg.num_layers1, cfg.theta_dim, dtype,
                y_shift=shift, y_scale=scale,
                n_couplings=tcfg.flow_couplings, s_cap=tcfg.flow_s_cap)
        else:
            theta_net_cls = (
                ThetaPosteriorFullCovNet if self.fullcov else ThetaPosteriorNet
            )
            self.theta_net = theta_net_cls(
                tcfg.num_neuron, tcfg.num_layers1, cfg.theta_dim, dtype,
                y_shift=shift, y_scale=scale)
        self.z_net = ZPredictiveNet(
            tcfg.num_neuron, tcfg.num_layers2, cfg.z_dim, dtype,
            y_shift=shift, y_scale=scale)

    # ------------------------------------------------------------------
    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        dummy = jnp.zeros((1, self.cfg.y_dim), self.dtype)
        return self._init_theta(k1, dummy), self.z_net.init(k2, dummy)

    def _init_theta(self, key, y_dummy):
        if self.flow:
            e_dummy = jnp.zeros((1, self.cfg.theta_dim), self.dtype)
            return self.theta_net.init(key, y_dummy, e_dummy)
        return self.theta_net.init(key, y_dummy)

    # ------------------------------------------------------------------
    def _maybe_shard(self, x):
        if self.mesh is None:
            return x
        from ..parallel.mesh import shard_batch

        return shard_batch(x, self.mesh)

    def _maybe_shard_batched(self, x):
        """(n_batches, bs, d) epoch tensor: shard the PER-STEP batch axis
        (axis 1) across the mesh; the scan axis stays replicated."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(None, "data", *([None] * (x.ndim - 2)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def _with_clip(self, opt):
        if self.tcfg.clip_grad_norm is None:
            return opt
        return optax.chain(
            optax.clip_by_global_norm(float(self.tcfg.clip_grad_norm)), opt
        )

    def _opt_step1(self):
        return self._with_clip(optax.inject_hyperparams(optax.adam)(
            learning_rate=self.tcfg.lr, b1=0.99, b2=0.999, eps=1e-10
        ))

    def _opt_step2(self):
        return self._with_clip(optax.inject_hyperparams(optax.adam)(
            learning_rate=self.tcfg.lr, b1=0.9, b2=0.999, eps=1e-7
        ))

    def _lr_decay(self, opt_state, hist, epoch, loss_val=0.0):
        """Reference (``:286-294``) or fixed decay-on-plateau.

        The reference statement order reads a still-zero CURRENT history
        slot, so its comparison is hardcoded as ``0.0 - hist[epoch -
        lr_patience]`` below — with positive losses the decay never fires
        (quirk preserved regardless of when the caller fills hist[epoch]).
        The fixed mode uses the actual current loss against the one
        lr_patience epochs ago.
        """
        t = self.tcfg
        if not t.flg_lr_decay or epoch % t.lr_patience != 0 or epoch == 0:
            return opt_state, False
        if t.lr_decay_mode == "reference":
            # hist[epoch] has NOT been written yet -> reads 0.0
            fire = (0.0 - hist[epoch - t.lr_patience]) > 0
        else:
            fire = (loss_val - hist[epoch - t.lr_patience]) > 0
        if fire:
            # with clip_grad_norm the optimizer is a chain and the
            # inject_hyperparams state is its last element
            hp_state = opt_state
            if not hasattr(hp_state, "hyperparams"):
                hp_state = opt_state[-1]
            hp_state.hyperparams["learning_rate"] = (
                hp_state.hyperparams["learning_rate"] * t.decay_rate
            )
        return opt_state, bool(fire)

    def _save_ckpt(self, subdir, epoch, loss, params, opt_state=None, hist=None,
                   batches_done=0):
        """Periodic checkpoint: params in the reference's ``{epoch:02d}-
        {loss:.8f}`` naming (``main_custom_training.py:282-283``), plus a
        ``latest`` full-state bundle (params + optimizer state + epoch +
        loss history) for exact resume — which the reference cannot do (it
        saves model weights only).

        ``batches_done > 0`` marks a SUB-epoch bundle: epoch ``epoch`` is in
        progress with that many batches consumed (always a scan-chunk
        boundary). Only the ``latest`` bundle is written then — the numbered
        params file keeps the reference's completed-epoch meaning."""
        if self.results_path is None:
            return
        d = os.path.join(self.results_path, subdir)
        os.makedirs(d, exist_ok=True)
        if batches_done == 0:
            fname = os.path.join(d, f"{epoch:02d}-{loss:.8f}.msgpack")
            _atomic_write(fname, serialization.to_bytes(params))
        if opt_state is not None:
            state = {
                "params": params,
                "opt_state": opt_state,
                "epoch": epoch,
                "batches_done": batches_done,
                "hist": np.asarray(hist) if hist is not None else np.zeros(0),
            }
            _atomic_write(os.path.join(d, "latest.msgpack"),
                          serialization.to_bytes(state))

    def _load_numbered_fallback(self, subdir, template_params):
        """Best-effort restore from the reference-style numbered params
        files when the `latest` bundle is unreadable. Returns
        (params, last_completed_epoch, hist) or None if no numbered file
        parses."""
        d = os.path.join(self.results_path or "", subdir)
        recs = []
        try:
            names = os.listdir(d)
        except OSError:
            return None
        for name in names:
            stem, _, ext = name.rpartition(".")
            if ext != "msgpack" or "-" not in stem:
                continue
            ep_s, _, loss_s = stem.partition("-")
            try:
                recs.append((int(ep_s), float(loss_s), name))
            except ValueError:
                continue
        for ep, _, name in sorted(recs, reverse=True):
            try:
                with open(os.path.join(d, name), "rb") as f:
                    params = serialization.from_bytes(template_params, f.read())
            except Exception:
                continue
            hist = np.zeros(ep + 1)
            for e2, loss2, _ in recs:
                if e2 <= ep:
                    hist[e2] = loss2
            return params, ep, hist
        return None

    def load_ckpt(self, subdir, template_params, template_opt_state):
        """Restore a ``latest`` full-state bundle; returns (params,
        opt_state, start_epoch, hist, start_batch) or None if absent.

        ``start_batch > 0`` means epoch ``start_epoch`` was interrupted
        after that many batches (a scan-chunk boundary): rerun it from
        there — its permutation/reparameterization keys are recomputed
        from the fast-forwarded key stream, so the continuation is the
        exact trajectory."""
        path = os.path.join(self.results_path or "", subdir, "latest.msgpack")
        if self.results_path is None or not os.path.exists(path):
            return None
        template = {
            "params": template_params,
            "opt_state": template_opt_state,
            "epoch": 0,
            "batches_done": 0,
            "hist": np.zeros(0),
        }
        with open(path, "rb") as f:
            data = f.read()
        try:
            try:
                state = serialization.from_bytes(template, data)
            except ValueError:
                # pre-round-5 bundle without the batches_done field
                t2 = dict(template)
                del t2["batches_done"]
                state = serialization.from_bytes(t2, data)
                state["batches_done"] = 0
        except Exception:
            # `latest` is corrupt (a worker crash caught a pre-atomic-write
            # bundle mid-write: zero-byte / truncated msgpack was observed
            # 2026-08-21 on the axon tunnel). Degrade to the best numbered
            # epoch file: params restored exactly, optimizer state fresh,
            # loss history rebuilt from the `{epoch:02d}-{loss:.8f}`
            # filenames — an approximate resume beats crashing the retry
            # loop. Writes are atomic (os.replace) now, so this only fires
            # on legacy leftovers.
            fb = self._load_numbered_fallback(subdir, template_params)
            if fb is None:
                raise
            params, epoch, hist = fb
            print(f"[ckpt] {path} corrupt; fell back to epoch {epoch} "
                  f"params file (optimizer state reset)")
            return params, template_opt_state, epoch + 1, hist, 0
        bd = int(state["batches_done"])
        if bd > 0:
            return (state["params"], state["opt_state"], int(state["epoch"]),
                    state["hist"], bd)
        return (state["params"], state["opt_state"], int(state["epoch"]) + 1,
                state["hist"], 0)

    # ------------------------------------------------------------------
    def train_step1(self, y_data, e_data, key, num_epochs=None, resume=False):
        """Fit q(theta|y). Returns (theta_params, loss history).

        ``resume=True`` restores params/optimizer/epoch from the latest
        full-state checkpoint under ``results_path/step1`` if present.
        """
        t = self.tcfg
        self._epoch_times_step1 = []
        num_epochs = num_epochs if num_epochs is not None else t.num_epoch1
        y_data = jnp.asarray(y_data, self.dtype)
        e_data = jnp.asarray(e_data, self.dtype)
        n = y_data.shape[0]

        batch_f = lambda th: self._batch_fh(th)[0]
        if self.flow:
            loss_fn = make_loss_step1_flow(batch_f, self.cfg.sig_e)
        elif self.fullcov:
            loss_fn = make_loss_step1_fullcov(batch_f, e_data, self.cfg.sig_e)
        else:
            loss_fn = make_loss_step1(batch_f, e_data, self.cfg.sig_e, t.pairing)

        key, k_init = jax.random.split(key)
        params = self._init_theta(k_init, y_data[:1])
        opt = self._opt_step1()
        opt_state = opt.init(params)
        start_epoch, start_batch = 0, 0
        hist = np.zeros(num_epochs)
        if resume:
            restored = self.load_ckpt("step1", params, opt_state)
            if restored is not None:
                params, opt_state, start_epoch, old_hist, start_batch = restored
                hist[: min(len(old_hist), num_epochs)] = old_hist[:num_epochs]
                # fast-forward the per-epoch key stream so a resumed run
                # continues the EXACT trajectory an uninterrupted run with
                # this key would have taken (a partially-done start_epoch
                # re-derives ITS keys inside the loop below)
                for _ in range(start_epoch):
                    key, _, _ = jax.random.split(key, 3)

        @jax.jit
        def step(params, opt_state, y_batch, e_key):
            def objective(p):
                e = (
                    jax.random.normal(e_key, e_data.shape, e_data.dtype)
                    if t.resample_e
                    else e_data
                )
                if self.flow:
                    # the flow reparameterizes INSIDE the net (theta, logq)
                    outputs = self.theta_net.apply(p, y_batch, e)
                    return loss_fn(y_batch, outputs)
                outputs = self.theta_net.apply(p, y_batch)
                return loss_fn(y_batch, outputs, e)

            loss, grads = jax.value_and_grad(objective)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def epoch_scan(params, opt_state, y_batches, e_keys):
            # one device dispatch per EPOCH instead of per step — the B=64
            # train step is dispatch-bound on TPU (measured ~2x wall-clock:
            # 905 vs 472 steps/s for a 156-batch epoch on v5e). Identical
            # update sequence to the per-step loop.
            def body(carry, batch):
                p, o = carry
                yb, kb = batch
                p, o, loss = step(p, o, yb, kb)
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (y_batches, e_keys)
            )
            return params, opt_state, losses[-1]

        save_freq = (t.ckpt_every if t.ckpt_every > 0
                     else max(1, num_epochs // 5))
        loss_val = 0.0
        for epoch in range(start_epoch, num_epochs):
            tic = time.time()
            key, k_perm, k_e = jax.random.split(key, 3)
            perm = jax.random.permutation(k_perm, n)
            y_shuf = y_data[perm]
            n_full, rem = _batches(n, t.batch_size)
            e_keys = jax.random.split(k_e, n_full + 1)
            if t.scan_epochs and n_full > 1:
                yb_all = y_shuf[: n_full * t.batch_size].reshape(
                    n_full, t.batch_size, -1
                )
                # scan_chunk > 0 bounds each device program to that many
                # batches (host loop between chunks; optimizer state carries,
                # so the trajectory is IDENTICAL to the single scan). Very
                # expensive fh's need this: a 156-step epoch scan whose body
                # is 256 two-level CG solves can run long enough to trip the
                # TPU worker (same failure class as vi.refine chunk_steps).
                ck = t.scan_chunk if t.scan_chunk > 0 else n_full
                for s in range(0, n_full, ck):
                    if epoch == start_epoch and s + ck <= start_batch:
                        continue  # chunk already banked before the crash
                    params, opt_state, loss_val = epoch_scan(
                        params, opt_state,
                        self._maybe_shard_batched(yb_all[s : s + ck]),
                        e_keys[s : min(s + ck, n_full)],
                    )
                    if t.ckpt_chunk and (s + ck < n_full or rem):
                        # bank every scan chunk: on this backend the worker
                        # can crash faster than an epoch completes
                        # (KNOWN_ISSUES round-5 escalation). The final
                        # chunk of a rem-free epoch is covered by the
                        # epoch-level save immediately after.
                        self._save_ckpt("step1", epoch, float(loss_val),
                                        params, opt_state, hist,
                                        batches_done=min(s + ck, n_full))
            else:
                for b in range(n_full):
                    yb = y_shuf[b * t.batch_size : (b + 1) * t.batch_size]
                    params, opt_state, loss_val = step(
                        params, opt_state, self._maybe_shard(yb), e_keys[b])
            if rem:
                yb = y_shuf[n_full * t.batch_size :]
                params, opt_state, loss_val = step(
                    params, opt_state, self._maybe_shard(yb), e_keys[n_full])
            loss_val = float(loss_val)
            self._epoch_times_step1.append(time.time() - tic)
            if self.verbose:
                print(f"[step1] epoch {epoch}: loss {loss_val:.6f} ({time.time()-tic:.2f}s)")
            # write the epoch's loss BEFORE bundling: a resume of an
            # already-complete run must restore the full history, not a
            # zero final slot (_lr_decay is unaffected — its reference
            # mode hardcodes 0.0 for the current slot and both modes read
            # only PAST slots)
            hist[epoch] = loss_val
            if (epoch + 1) % save_freq == 0:
                self._save_ckpt("step1", epoch, loss_val, params, opt_state, hist)
            opt_state, fired = self._lr_decay(opt_state, hist, epoch, loss_val)
        return params, hist

    # ------------------------------------------------------------------
    def bridge(self, y_data, e_data, theta_params, key, chunk=None):
        """Posterior-sample sweep -> cached log-z moments (``:310-328``)."""
        chunk = self.bridge_chunk if chunk is None else chunk
        y_data = jnp.asarray(y_data, self.dtype)
        e_data = jnp.asarray(e_data, self.dtype)
        n, ne = y_data.shape[0], e_data.shape[0]
        if self.flow:
            # the flow reparameterizes inside the net: (n, ne, d) samples
            # drawn through the coupling stack from the fixed e_data seeds
            theta_sam, _ = self.theta_net.apply(theta_params, y_data, e_data)
        else:
            theta_mean, theta_sig, _ = self.theta_net.apply(theta_params, y_data)
            if self.fullcov:
                # theta_sig carries the Cholesky factor: theta = mu + L e
                theta_sam = theta_mean[:, None, :] + jnp.einsum(
                    "bij,nj->bni", theta_sig, e_data
                )
            else:
                theta_std = jnp.sqrt(theta_sig)
                theta_sam = (
                    e_data[None, :, :] * theta_std[:, None, :]
                    + theta_mean[:, None, :]
                )
        theta_sam = theta_sam.reshape(-1, theta_sam.shape[-1])  # (n*ne, d)

        batch_fh = jax.jit(self._batch_fh)
        hs = []
        for i in range(0, theta_sam.shape[0], chunk):
            _, h_i = batch_fh(theta_sam[i : i + chunk])
            hs.append(h_i)
        h_sam = jnp.concatenate(hs).reshape(n, ne, -1)

        # reference draws ONE (ne, d_z) noise matrix shared by every y
        eta = jnp.sqrt(self.cfg.sig_eta) * jax.random.normal(
            key, (ne, h_sam.shape[-1]), self.dtype
        )
        z_sam = h_sam + eta[None, :, :]
        logz = jnp.log(z_sam)
        return np.asarray(jnp.mean(logz, axis=1)), np.asarray(jnp.var(logz, axis=1))

    # ------------------------------------------------------------------
    def train_step2(
        self, y_data, e_data, theta_params, logz_mean_post, logz_sig_post, key,
        num_epochs=None, resume=False,
    ):
        """Fit p(z|y) with theta-net frozen. Returns (z_params, history).

        ``resume=True`` restores params/optimizer/epoch from the latest
        full-state checkpoint under ``results_path/step2`` if present
        (symmetric with ``train_step1`` — the reference can only restart
        step 2 from scratch, ``main_custom_training.py:416-434``).
        """
        t = self.tcfg
        self._epoch_times_step2 = []
        num_epochs = num_epochs if num_epochs is not None else t.num_epoch2
        y_data = jnp.asarray(y_data, self.dtype)
        e_data = jnp.asarray(e_data, self.dtype)
        logz_mean_post = jnp.asarray(logz_mean_post, self.dtype)
        logz_sig_post = jnp.asarray(logz_sig_post, self.dtype)
        n = y_data.shape[0]

        batch_h = lambda th: self._batch_fh(th)[1]
        loss_fn = make_loss_step2(batch_h, e_data, self.cfg.sig_eta, t.alpha,
                                  t.pairing, fullcov=self.fullcov,
                                  flow=self.flow)

        key, k_init = jax.random.split(key)
        z_params = self.z_net.init(k_init, y_data[:1])
        opt = self._opt_step2()
        opt_state = opt.init(z_params)
        start_epoch, start_batch = 0, 0
        hist = np.zeros(num_epochs)
        if resume:
            restored = self.load_ckpt("step2", z_params, opt_state)
            if restored is not None:
                z_params, opt_state, start_epoch, old_hist, start_batch = restored
                hist[: min(len(old_hist), num_epochs)] = old_hist[:num_epochs]
                # fast-forward the per-epoch key stream (see train_step1)
                for _ in range(start_epoch):
                    key, _, _ = jax.random.split(key, 3)

        @jax.jit
        def step(z_params, opt_state, y_b, lm_b, ls_b, e_key):
            # theta-net frozen: apply under stop_gradient semantics by not
            # differentiating w.r.t. theta_params at all
            e = (
                jax.random.normal(e_key, e_data.shape, e_data.dtype)
                if t.resample_e
                else e_data
            )
            if self.flow:
                # flow reparameterizes inside the net; hand term5 the
                # already-drawn (B*ne, d) sample block via its theta_data
                # hook (make_loss_step2(flow=True))
                theta_sam, _ = self.theta_net.apply(theta_params, y_b, e)
                theta_data = theta_sam.reshape(-1, theta_sam.shape[-1])
            else:
                theta_mean, theta_sig, _ = self.theta_net.apply(theta_params, y_b)

            def objective(zp):
                z_mean, z_sig, log_z_sig = self.z_net.apply(zp, y_b)
                if self.flow:
                    outputs = (theta_data, z_mean, z_sig, log_z_sig)
                else:
                    outputs = (theta_mean, theta_sig, z_mean, z_sig, log_z_sig)
                if t.resample_e:
                    return loss_fn((y_b, lm_b, ls_b), outputs, e)
                return loss_fn((y_b, lm_b, ls_b), outputs)

            loss, grads = jax.value_and_grad(objective)(z_params)
            updates, opt_state = opt.update(grads, opt_state, z_params)
            z_params = optax.apply_updates(z_params, updates)
            return z_params, opt_state, loss

        @jax.jit
        def epoch_scan(z_params, opt_state, yb_all, lm_all, ls_all, e_keys):
            # one dispatch per epoch (see train_step1)
            def body(carry, batch):
                p, o = carry
                yb, lm_b, ls_b, kb = batch
                p, o, loss = step(p, o, yb, lm_b, ls_b, kb)
                return (p, o), loss

            (z_params, opt_state), losses = jax.lax.scan(
                body, (z_params, opt_state), (yb_all, lm_all, ls_all, e_keys)
            )
            return z_params, opt_state, losses[-1]

        save_freq = (t.ckpt_every if t.ckpt_every > 0
                     else max(1, num_epochs // 5))
        loss_val = 0.0
        for epoch in range(start_epoch, num_epochs):
            tic = time.time()
            key, k_perm, k_e = jax.random.split(key, 3)
            perm = jax.random.permutation(k_perm, n)
            y_s, lm_s, ls_s = y_data[perm], logz_mean_post[perm], logz_sig_post[perm]
            n_full, rem = _batches(n, t.batch_size)
            e_keys = jax.random.split(k_e, n_full + 1)
            if t.scan_epochs and n_full > 1:
                cut = n_full * t.batch_size
                rs = lambda a: a[:cut].reshape(n_full, t.batch_size, -1)
                yb_all, lm_all, ls_all = rs(y_s), rs(lm_s), rs(ls_s)
                # see train_step1: chunked scanning bounds device-program
                # time for expensive fh's, identical trajectory
                ck = t.scan_chunk if t.scan_chunk > 0 else n_full
                for s in range(0, n_full, ck):
                    if epoch == start_epoch and s + ck <= start_batch:
                        continue  # chunk already banked before the crash
                    z_params, opt_state, loss_val = epoch_scan(
                        z_params, opt_state,
                        self._maybe_shard_batched(yb_all[s : s + ck]),
                        self._maybe_shard_batched(lm_all[s : s + ck]),
                        self._maybe_shard_batched(ls_all[s : s + ck]),
                        e_keys[s : min(s + ck, n_full)],
                    )
                    if t.ckpt_chunk and (s + ck < n_full or rem):
                        self._save_ckpt("step2", epoch, float(loss_val),
                                        z_params, opt_state, hist,
                                        batches_done=min(s + ck, n_full))
            else:
                for b in range(n_full):
                    sl = slice(b * t.batch_size, (b + 1) * t.batch_size)
                    z_params, opt_state, loss_val = step(
                        z_params, opt_state,
                        self._maybe_shard(y_s[sl]),
                        self._maybe_shard(lm_s[sl]),
                        self._maybe_shard(ls_s[sl]),
                        e_keys[b],
                    )
            if rem:
                sl = slice(n_full * t.batch_size, n)
                z_params, opt_state, loss_val = step(
                    z_params, opt_state,
                    self._maybe_shard(y_s[sl]),
                    self._maybe_shard(lm_s[sl]),
                    self._maybe_shard(ls_s[sl]),
                    e_keys[n_full],
                )
            loss_val = float(loss_val)
            self._epoch_times_step2.append(time.time() - tic)
            if self.verbose:
                print(f"[step2] epoch {epoch}: loss {loss_val:.3e} ({time.time()-tic:.2f}s)")
            hist[epoch] = loss_val  # before bundling — see train_step1
            if (epoch + 1) % save_freq == 0:
                self._save_ckpt("step2", epoch, loss_val, z_params, opt_state, hist)
            opt_state, fired = self._lr_decay(opt_state, hist, epoch, loss_val)
        if self.results_path is not None:
            # final bundle carries the optimizer state too, so a killed run
            # resumes exactly (round-2 weak #6: asymmetric checkpointing)
            self._save_ckpt("step2", num_epochs - 1, loss_val, z_params, opt_state, hist)
        return z_params, hist

    # ------------------------------------------------------------------
    def fit(self, y_data, e_data, key, *, epochs1=None, epochs2=None,
            resume=False) -> TrainResult:
        """``resume=True`` restores both steps from their latest full-state
        checkpoints under ``results_path`` (a crashed run continues from the
        last save instead of restarting)."""
        k1, k2, k3 = jax.random.split(key, 3)
        theta_params, hist1 = self.train_step1(y_data, e_data, k1, epochs1,
                                               resume=resume)
        lm_post, ls_post = self.bridge(y_data, e_data, theta_params, k2)
        if self.results_path is not None:
            # persist the bridge targets like the reference's temp_data.mat
            # (main_custom_training.py:310-328) so step-2 losses can be
            # re-evaluated deterministically later
            import scipy.io as sio

            os.makedirs(self.results_path, exist_ok=True)
            sio.savemat(
                os.path.join(self.results_path, "temp_data.mat"),
                {"logz_mean_post": lm_post, "logz_sig_post": ls_post},
            )
        z_params, hist2 = self.train_step2(
            y_data, e_data, theta_params, lm_post, ls_post, k3, epochs2,
            resume=resume,
        )
        return TrainResult(
            theta_params=theta_params,
            z_params=z_params,
            hist_step1=hist1,
            hist_step2=hist2,
            logz_mean_post=lm_post,
            logz_sig_post=ls_post,
            epoch_times_step1=list(self._epoch_times_step1),
            epoch_times_step2=list(self._epoch_times_step2),
        )

    # ------------------------------------------------------------------
    def predict(self, theta_params, z_params, y, *, key=None, n_mc=256):
        """Full model outputs like the reference's ``final_model_test``
        (theta_mean, theta_sig, z_mean, z_sig). With the full-covariance
        posterior, theta_sig is the MARGINAL variance diag(L L^T) — use
        :meth:`predict_cholesky` for the full factor. With the flow
        posterior the moments are ``n_mc``-sample Monte-Carlo estimates
        (``models.flow.flow_moments``); ``key`` seeds the base draws
        (deterministic PRNGKey(0) default)."""
        y = jnp.asarray(y, self.dtype)
        if self.flow:
            from ..models.flow import flow_moments

            key = jax.random.PRNGKey(0) if key is None else key
            theta_mean, theta_sig = flow_moments(
                self.theta_net, theta_params, y, key, n_mc=n_mc)
        else:
            theta_mean, theta_sig, _ = self.theta_net.apply(theta_params, y)
            if self.fullcov:
                theta_sig = marginal_variance(theta_sig)
        z_mean, z_sig, _ = self.z_net.apply(z_params, y)
        return theta_mean, theta_sig, z_mean, z_sig

    def theta_sampler(self, theta_params, y):
        """``sampler(key, num_sam) -> theta (n_y, num_sam, d)`` closure for
        the eval surfaces (``eval.comparison.kld_maps`` /
        ``mean_sig_fields`` ``proposed_sampler`` hook) — exact posterior
        draws for ANY family, so the comparison pipeline never needs to
        know the parameterization."""
        y = jnp.asarray(y, self.dtype)

        def sampler(key, num_sam):
            e = jax.random.normal(key, (num_sam, self.cfg.theta_dim),
                                  self.dtype)
            return self.sample_theta(theta_params, y, e)

        return sampler

    def sample_theta(self, theta_params, y, e):
        """Posterior draws theta ~ q(.|y) from base noise ``e (ne, d)``:
        (B, ne, d) — family-agnostic (meanfield/fullcov/flow), the sampling
        surface the eval pipelines (comparison, refine, MCMC warm starts)
        use so they need not know the family's parameterization."""
        y = jnp.asarray(y, self.dtype)
        e = jnp.asarray(e, self.dtype)
        if self.flow:
            theta, _ = self.theta_net.apply(theta_params, y, e)
            return theta
        theta_mean, theta_sig, _ = self.theta_net.apply(theta_params, y)
        if self.fullcov:
            return theta_mean[:, None, :] + jnp.einsum(
                "bij,nj->bni", theta_sig, e)
        return (
            e[None, :, :] * jnp.sqrt(theta_sig)[:, None, :]
            + theta_mean[:, None, :]
        )

    def predict_cholesky(self, theta_params, y):
        """(theta_mean, L) of the full-covariance posterior — e.g. for
        HMC mass-matrix preconditioning or correlated posterior sampling."""
        if not self.fullcov:
            raise ValueError("predict_cholesky requires posterior='fullcov'")
        y = jnp.asarray(y, self.dtype)
        theta_mean, L, _ = self.theta_net.apply(theta_params, y)
        return theta_mean, L
