"""Training orchestration: optax optimizer, curriculum, LR schedule,
evaluation, checkpointing.

Reproduces the reference training protocol (reference: src/grappa/training/
lightning_model.py:13-314 and trainrun.py:24-175) as an explicit jit-
compiled loop:
  * curriculum: epochs < start_qm_epochs train on classical parameters only
    (energy/gradient weights zero), then QM energy+force training
  * optimizer restarts at given epochs with linear LR warmup
  * plateau decay: `patience` epochs without improvement of
    early_stopping_loss (3*E_rmse_avg + F_rmse_avg by default) -> lr *= decay
  * optional param_loss_epochs switch-off, per-dataset parameter-loss weights
  * wall-clock time limit, finish criterion for unpromising runs
  * checkpoints: best (by early_stopping_loss) + last, with full config

The train step is one jit program; loss weights and learning rate enter as
traced scalars so none of the schedule changes trigger recompilation.
"""
from __future__ import annotations

import json
import os
import threading
import time
import zlib
from pathlib import Path
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from grappa_tpu.data.graph_batch import GraphBatch
from grappa_tpu.data.loader import GraphLoader
from grappa_tpu.models import mm_energy
from grappa_tpu.train.evaluator import (
    StreamingEvaluator, early_stopping_loss)
from grappa_tpu.train.loss import LossWeights, molwise_loss


def make_optimizer(grad_clip: float = 10.0, weight_decay: float = 0.0):
    """Adam with global-norm clipping; the LR is applied as a traced scalar
    in the train step (optax.scale(-1) at the end), so schedule changes never
    recompile."""
    steps = [optax.clip_by_global_norm(grad_clip), optax.scale_by_adam()]
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale(-1.0))
    return optax.chain(*steps)


def make_train_step(model, tx, donate: bool = True) -> Callable:
    """Returns jitted (params, opt_state, batch, weights, lr, rng) ->
    (params, opt_state, loss, aux).

    donate: donate the params/opt_state buffers to the step (callers rebind
    the returned trees, so the old copies are dead — donation lets XLA update
    the ~3x-model-size optimizer state in place instead of allocating a
    second copy in HBM). Pass False if the same params/opt_state objects are
    reused across calls (some tests do)."""

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, batch: GraphBatch, weights: LossWeights,
             lr, rng):
        def loss_fn(p):
            pred = model.apply(p, batch, deterministic=False,
                               rngs={'dropout': rng})
            return molwise_loss(batch, pred, weights)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss, aux

    return step


def make_scan_epoch_step(model, tx, donate: bool = True) -> Callable:
    """One XLA dispatch per EPOCH: lax.scan of the train step over
    device-resident stacked batches.

    On tunneled/remote chips every dispatch costs ~ms of host round-trip,
    which dominates a step that computes in a few ms — the step breakdown
    in PERF.md shows the pipeline is dispatch-bound, not compute-bound.
    Scanning the whole epoch inside one jit amortizes that cost to once
    per epoch. Requires cache_batches + fixed_pad (uniform shapes).

    Returns jitted (params, opt_state, batches, weights, perm, lrs, rngs)
    -> (params, opt_state, losses) where batches/weights are pytrees with
    a leading n_steps axis, perm is the epoch's shuffle of that axis, and
    lrs/rngs hold one entry per step."""
    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def epoch(params, opt_state, batches, weights, perm, lrs, rngs):
        shuffled_b = jax.tree.map(lambda x: jnp.take(x, perm, axis=0),
                                  batches)
        shuffled_w = jax.tree.map(lambda x: jnp.take(x, perm, axis=0),
                                  weights)

        def body(carry, xs):
            p, o = carry
            batch, w, lr, rng = xs

            def loss_fn(pp):
                pred = model.apply(pp, batch, deterministic=False,
                                   rngs={'dropout': rng})
                return molwise_loss(batch, pred, w)

            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            updates, o2 = tx.update(grads, o, p)
            updates = jax.tree.map(lambda u: u * lr, updates)
            return (optax.apply_updates(p, updates), o2), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            (shuffled_b, shuffled_w, lrs, rngs))
        return params, opt_state, losses

    return epoch


def make_eval_step(model) -> Callable:
    @jax.jit
    def step(params, batch: GraphBatch):
        pred = model.apply(params, batch)
        return mm_energy.energy_and_gradient(batch, pred)
    return step


def make_scan_eval_epoch(model) -> Callable:
    """ONE dispatch for a whole validation pass: lax.scan of
    forward + energy/forces + the per-molecule metric accumulators over
    stacked device-resident val batches. The per-batch loop costs 2 host
    round-trips per batch (eval + metric fetch) on tunneled chips; this
    returns the whole epoch's accumulator arrays in a single transfer."""
    from grappa_tpu.train.evaluator import _per_mol_sqerr

    @jax.jit
    def epoch(params, batches):
        def body(_, batch):
            pred = model.apply(params, batch)
            energy, gradient = mm_energy.energy_and_gradient(batch, pred)
            return None, _per_mol_sqerr(batch, energy, gradient)

        _, outs = jax.lax.scan(body, None, batches)
        return outs

    return epoch


class Trainer:
    def __init__(self, model, params,
                 train_loader: GraphLoader, val_loader: Optional[GraphLoader],
                 lit_config: Dict, trainer_config: Dict,
                 out_dir: Optional[str] = None,
                 full_config: Optional[Dict] = None,
                 log_fn: Optional[Callable[[Dict], None]] = None,
                 seed: int = 0,
                 cache_batches: bool = False,
                 mesh=None,
                 prng_impl: str = 'rbg',
                 scan_epochs: Optional[bool] = None):
        """mesh: a jax.sharding.Mesh with a 'dp' axis enables data-parallel
        training — every optimizer step consumes mesh-size loader batches
        (which must share padded shapes: the loader's fixed_pad default),
        computes per-device gradients and psum-averages them over ICI.

        scan_epochs: run each epoch as ONE jit dispatch (lax.scan over the
        device-resident batch cache) — amortizes the per-dispatch host
        round-trip that dominates on tunneled chips. Requires
        cache_batches and uniform batch shapes (fixed_pad). Combined with
        mesh it scans whole data-parallel groups per dispatch
        (parallel.dp.make_dp_scan_epoch_step). None reads
        trainer_config['scan_epochs'] (default off)."""
        self.model = model
        self.params = params
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.cfg = lit_config
        self.trainer_cfg = trainer_config
        self.out_dir = Path(out_dir) if out_dir else None
        self.full_config = full_config or {}
        self.log_fn = log_fn or (lambda d: None)

        self.tx = make_optimizer(
            grad_clip=trainer_config.get('gradient_clip_val', 10.0),
            weight_decay=lit_config.get('weight_decay', 0.0))
        self.opt_state = self.tx.init(self.params)
        self.mesh = mesh
        if mesh is not None:
            from grappa_tpu.parallel.dp import make_dp_train_step, replicate
            self._n_dev = int(mesh.devices.size)
            self.dp_train_step = make_dp_train_step(model, self.tx, mesh)
            self.params = replicate(self.params, mesh)
            self.opt_state = replicate(self.opt_state, mesh)
        self.train_step = make_train_step(model, self.tx)
        self.eval_step = make_eval_step(model)

        self.lr = float(lit_config['lr'])
        self.start_qm_epochs = int(lit_config.get('start_qm_epochs', 1))
        self.restarts = sorted(set(
            [self.start_qm_epochs] + list(lit_config.get('add_restarts', []))))
        if lit_config.get('param_loss_epochs') is not None:
            self.restarts = sorted(set(
                self.restarts + [int(lit_config['param_loss_epochs'])]))
        self.warmup_steps = int(lit_config.get('warmup_steps', 200))
        self._warmup_step: Optional[int] = None

        # device-resident batch cache: collate one epoch of batches once,
        # keep them in HBM and reshuffle their order per epoch. Removes the
        # per-step host->device upload entirely (the training bottleneck on
        # tunneled/remote chips); conformer subsampling is frozen to the
        # cached draw. Only for datasets whose batches fit in HBM.
        self.cache_batches = cache_batches
        self._batch_cache = None
        if scan_epochs is None:
            scan_epochs = bool(trainer_config.get('scan_epochs', False))
        if scan_epochs and not cache_batches:
            raise ValueError("scan_epochs requires cache_batches=True "
                             "(the scan consumes device-resident batches)")
        self.scan_epochs = scan_epochs
        if scan_epochs and val_loader is not None and not val_loader.fixed_pad:
            # the scanned validation pass stacks the val cache into one
            # leading axis — sequential loaders default to per-batch bucket
            # padding (non-uniform shapes), so use a trainer-local shallow
            # copy flipped to the fixed worst-case PadSpec (conf masks make
            # padding metric-neutral; equivalence tested in
            # test_scanned_validation_matches_loop). The caller's loader is
            # NOT mutated: a later evaluation pass over the same object
            # keeps its bucketed shapes.
            import copy as _copy
            self.val_loader = val_loader = _copy.copy(val_loader)
            val_loader.fixed_pad = True
        self._scan_cache = None
        self._dp_scan_cache = None
        if scan_epochs:
            if mesh is not None:
                from grappa_tpu.parallel.dp import make_dp_scan_epoch_step
                self.dp_scan_step = make_dp_scan_epoch_step(model, self.tx,
                                                            mesh)
            else:
                self.scan_step = make_scan_epoch_step(model, self.tx)

        # async checkpointing: snapshot params/opt on DEVICE (cheap HBM
        # copy), then stream the device->host pull + file write on a
        # background thread while training continues. On tunneled chips the
        # pull runs at ~6 MB/s, so a 490 MB params+Adam last.ckpt costs ~86 s
        # — synchronous saves made checkpoint I/O ~90% of the measured proxy
        # epoch wall clock (benchmarks/epoch_profile.py). Skip-if-busy
        # throttling makes the effective checkpoint cadence "as often as the
        # tunnel sustains" with zero training stalls. Default off (bit-stable
        # tests); production/proxy configs enable it.
        self.async_checkpoints = bool(
            trainer_config.get('async_checkpoints', False))
        self._ckpt_thread: Optional[threading.Thread] = None
        self._ckpt_error: Optional[BaseException] = None
        self._snapshot = jax.jit(lambda t: jax.tree.map(jnp.copy, t))

        self.epoch = 0
        self.global_step = 0
        self.best_loss = float('inf')
        # device-side copy of the best params (cheap HBM copy, no host
        # transfer), refreshed at every improvement. Guarantees fit() can
        # flush the true best to disk at exit even when the improvement's
        # async best.ckpt save was skipped (writer busy / throttled) and no
        # later improvement occurred — without it those params are lost
        # (the training step donates the live buffers).
        self._best_snapshot = None   # (device params, epoch)
        # plateau-decay baseline, separate from best_loss: best_loss stays a
        # monotone global best (it gates best.ckpt, like the reference's
        # Lightning checkpoint monitor, lightning_trainer.py:53-84), while
        # this baseline is reset after an LR decay so the patience counter
        # measures progress since the decay, not since the global best.
        self.plateau_baseline = float('inf')
        self.epochs_without_improvement = 0
        self.elapsed_time = 0.0       # wall time from previous runs (s)
        self._fit_start: Optional[float] = None
        # rbg (XLA RngBitGenerator) keys: ~8% faster full train step than
        # the threefry default on TPU — the ~40 dropout masks per step are
        # a real cost (PERF.md step breakdown). Pass 'threefry2x32' to
        # reproduce old runs bit-for-bit.
        self._rng = jax.random.key(seed, impl=prng_impl)
        self.evaluator = StreamingEvaluator()
        self.history: list = []

    # ------------------------------------------------------------------
    def _loss_weights(self, ds_names: Sequence[str],
                      num_mols: int) -> LossWeights:
        cfg = self.cfg
        qm = self.epoch >= self.start_qm_epochs
        param_w = float(cfg.get('param_weight', 1e-3)) if qm else 1e-3
        if (cfg.get('param_loss_epochs') is not None
                and self.epoch >= cfg['param_loss_epochs']):
            param_w = 0.0
        overrides = cfg.get('param_weights_by_dataset', {})
        pw = np.full(num_mols, param_w, np.float32)
        for i, n in enumerate(ds_names):
            if n in overrides:
                pw[i] = overrides[n]
        return LossWeights(
            energy=jnp.float32(cfg.get('energy_weight', 1.0) if qm else 0.0),
            gradient=jnp.float32(cfg.get('gradient_weight', 0.8) if qm else 0.0),
            param=jnp.asarray(pw),
            proper_reg=jnp.float32(cfg.get('proper_regularisation', 0.0)),
            improper_reg=jnp.float32(cfg.get('improper_regularisation', 0.0)),
        )

    def _step_lr(self) -> float:
        if self._warmup_step is not None:
            if self._warmup_step >= self.warmup_steps:
                self._warmup_step = None
                return self.lr
            lr = self._warmup_step / self.warmup_steps * self.lr
            self._warmup_step += 1
            return lr
        return self.lr

    # ------------------------------------------------------------------
    def profile_steps(self, n_steps: int = 5, trace_dir: str = '/tmp/grappa_tpu_trace'):
        """Capture a jax profiler trace of n_steps training steps
        (view with tensorboard or xprof; the TPU-side analog of the
        reference's lightning profiler="simple")."""
        import itertools
        batch_iter = iter(self.train_loader)
        with jax.profiler.trace(trace_dir):
            for batch, ds_names in itertools.islice(batch_iter, n_steps):
                weights = self._loss_weights(ds_names, batch.num_mols)
                self._rng, step_rng = jax.random.split(self._rng)
                self.params, self.opt_state, loss, _ = self.train_step(
                    self.params, self.opt_state, batch, weights,
                    jnp.float32(self.lr), step_rng)
            jax.block_until_ready(loss)
        return trace_dir

    def train_epoch(self) -> float:
        if self.epoch in self.restarts:
            self.opt_state = self.tx.init(self.params)
            self._warmup_step = 0

        losses = []
        if self.mesh is not None and self.scan_epochs:
            losses = self._train_epoch_dp_scan()
        elif self.mesh is not None:
            losses = self._train_epoch_dp()
        elif self.scan_epochs:
            losses = self._train_epoch_scan()
        else:
            for batch, ds_names in self._train_batches():
                weights = self._loss_weights(ds_names, batch.num_mols)
                lr = jnp.float32(self._step_lr())
                self._rng, step_rng = jax.random.split(self._rng)
                self.params, self.opt_state, loss, _ = self.train_step(
                    self.params, self.opt_state, batch, weights, lr, step_rng)
                losses.append(loss)
                self.global_step += 1
        mean_loss = float(np.mean([float(l) for l in losses])) if losses else 0.0
        self.log_fn({'epoch': self.epoch, 'train_loss': mean_loss,
                     'lr': self.lr})
        return mean_loss

    def _train_epoch_dp(self):
        """One epoch of data-parallel steps: group mesh-size loader batches
        (identical padded shapes via fixed_pad) into one shard_map step.

        A trailing group smaller than the mesh is NOT dropped: it is padded
        by cycling its batches, with the k real batches' loss weights scaled
        by n_dev/k and the padding replicas' weights zeroed — the device
        pmean then equals the mean gradient (and loss) over the real batches
        only, i.e. the same update the group would get on one device."""
        from grappa_tpu.parallel.dp import shard_batches, stack_loss_weights
        losses = []
        group, names_group = [], []

        def run_group(group, names_group):
            n_real = len(group)
            weights = [self._loss_weights(n, b.num_mols)
                       for b, n in zip(group, names_group)]
            if n_real < self._n_dev:
                scale = jnp.float32(self._n_dev / n_real)
                weights = [jax.tree.map(lambda x: x * scale, w)
                           for w in weights]
                for i in range(self._n_dev - n_real):
                    group.append(group[i % n_real])
                    weights.append(jax.tree.map(jnp.zeros_like,
                                                weights[i % n_real]))
            stacked = shard_batches(group)
            lr = jnp.float32(self._step_lr())
            self._rng, step_rng = jax.random.split(self._rng)
            rngs = jax.random.split(step_rng, self._n_dev)
            self.params, self.opt_state, loss, _ = self.dp_train_step(
                self.params, self.opt_state, stacked,
                stack_loss_weights(weights), lr, rngs)
            losses.append(loss)
            self.global_step += 1

        for batch, ds_names in self._train_batches():
            group.append(batch)
            names_group.append(ds_names)
            if len(group) == self._n_dev:
                run_group(group, names_group)
                group, names_group = [], []
        if group:
            run_group(group, names_group)
        return losses

    def _train_epoch_scan(self):
        """One dispatch for the whole epoch: scan the train step over the
        stacked device-resident batch cache (see make_scan_epoch_step)."""
        from grappa_tpu.data.graph_batch import stack_batches

        if self._scan_cache is None:
            pairs = [(jax.device_put(b), n) for b, n in self.train_loader]
            shapes = {tuple(x.shape for x in jax.tree.leaves(b))
                      for b, _ in pairs}
            if len(shapes) != 1:
                raise ValueError(
                    "scan_epochs needs uniform batch shapes — use a "
                    "loader with fixed_pad=True (the training default)")
            batches = stack_batches([b for b, _ in pairs])
            self._scan_cache = (batches,
                                [(n, b.num_mols) for b, n in pairs])

        batches, names_mols = self._scan_cache
        n_steps = len(names_mols)
        # loss weights are epoch-dependent (start_qm_epochs curriculum,
        # param_loss_epochs switch-off) — restack them every epoch; they
        # are tiny, and the jitted epoch fn sees identical shapes/dtypes
        weights = jax.tree.map(
            lambda *xs: jnp.stack(xs, axis=0),
            *[self._loss_weights(n, m) for n, m in names_mols])
        # per-step LR (advances the warmup counter exactly like the loop)
        lrs = jnp.asarray([self._step_lr() for _ in range(n_steps)],
                          jnp.float32)
        self._rng, step_rng = jax.random.split(self._rng)
        rngs = jax.random.split(step_rng, n_steps)
        perm = jnp.asarray(np.random.default_rng(
            int(jax.random.randint(self._rng, (), 0, 2 ** 31 - 1))
        ).permutation(n_steps))
        self.params, self.opt_state, losses = self.scan_step(
            self.params, self.opt_state, batches, weights, perm, lrs, rngs)
        self.global_step += n_steps
        return list(np.asarray(losses))

    def _train_epoch_dp_scan(self):
        """One dispatch per data-parallel epoch (parallel.dp.
        make_dp_scan_epoch_step). The flat slot cache holds the real
        batches first and padding replicas last; trailing-group weight
        scaling is positional (slot_scale), so the per-epoch shuffle of
        the REAL slots keeps the loop path's exact group semantics."""
        from grappa_tpu.data.graph_batch import stack_batches
        from grappa_tpu.parallel.dp import stack_loss_weights

        n_dev = self._n_dev
        if self._dp_scan_cache is None:
            pairs = [(jax.device_put(b), n) for b, n in self.train_loader]
            shapes = {tuple(x.shape for x in jax.tree.leaves(b))
                      for b, _ in pairs}
            if len(shapes) != 1:
                raise ValueError(
                    "scan_epochs needs uniform batch shapes — use a "
                    "loader with fixed_pad=True (the training default)")
            n_real = len(pairs)
            n_groups = -(-n_real // n_dev)
            n_slots = n_groups * n_dev
            slots_b = [b for b, _ in pairs]
            for i in range(n_slots - n_real):   # padding replicas (zeroed
                slots_b.append(pairs[i % n_real][0])   # via slot_scale)
            scale = np.ones(n_slots, np.float32)
            k = n_real - (n_groups - 1) * n_dev
            if k < n_dev:
                scale[(n_groups - 1) * n_dev:n_real] = n_dev / k
                scale[n_real:] = 0.0
            self._dp_scan_cache = (
                stack_batches(slots_b), jnp.asarray(scale),
                [(n, b.num_mols) for b, n in pairs],
                n_real, n_groups, n_slots)

        flat_b, scale, names_mols, n_real, n_groups, n_slots = \
            self._dp_scan_cache
        # restack the epoch-dependent loss weights (curriculum) each epoch,
        # mirroring the loop path; padding slots replicate real weights and
        # are zeroed positionally via slot_scale
        base_w = [self._loss_weights(n, m) for n, m in names_mols]
        slots_w = list(base_w)
        for i in range(n_slots - n_real):
            slots_w.append(base_w[i % n_real])
        flat_w = stack_loss_weights(slots_w)
        host_rng = np.random.default_rng(
            int(jax.random.randint(self._rng, (), 0, 2 ** 31 - 1)))
        perm = jnp.asarray(np.concatenate([
            host_rng.permutation(n_real), np.arange(n_real, n_slots)]))
        lrs = jnp.asarray([self._step_lr() for _ in range(n_groups)],
                          jnp.float32)
        self._rng, step_rng = jax.random.split(self._rng)
        rngs = jax.random.split(step_rng, n_slots).reshape(n_groups, n_dev)
        self.params, self.opt_state, losses = self.dp_scan_step(
            self.params, self.opt_state, flat_b, flat_w, scale, perm,
            lrs, rngs)
        self.global_step += n_groups
        return list(np.asarray(losses))

    def _train_batches(self):
        if not self.cache_batches:
            return iter(self.train_loader)
        if self._batch_cache is None:
            self._batch_cache = [
                (jax.device_put(batch), ds_names)
                for batch, ds_names in self.train_loader
            ]
        order = np.random.default_rng(
            int(jax.random.randint(self._rng, (), 0, 2**31 - 1))
        ).permutation(len(self._batch_cache))
        return iter([self._batch_cache[i] for i in order])

    def validate(self) -> Dict[str, Dict[str, float]]:
        if self.val_loader is None:
            return {}
        if self.scan_epochs and self.cache_batches:
            # one dispatch + one host fetch for the whole validation pass
            # (vs 2 round-trips per batch); requires uniform val shapes,
            # which fixed_pad gives — fall back to the loop otherwise
            if getattr(self, '_val_scan_cache', None) is None:
                from grappa_tpu.data.graph_batch import stack_batches
                staged = [(jax.device_put(b), n) for b, n in self.val_loader]
                shapes = {tuple(x.shape for x in jax.tree.leaves(b))
                          for b, _ in staged}
                if len(shapes) == 1:
                    self._val_scan_cache = (
                        stack_batches([b for b, _ in staged]),
                        [n for _, n in staged])
                    self._val_scan_step = make_scan_eval_epoch(self.model)
                    # only the stacked copy stays resident: keeping the
                    # per-batch staging list too would double the HBM held
                    # for the validation set (it is only needed by the
                    # non-uniform-shape fallback loop below)
                    self._val_cache = None
                else:
                    self._val_scan_cache = False
                    self._val_cache = staged
            if self._val_scan_cache is not False:
                stacked, names = self._val_scan_cache
                outs = jax.tree.map(np.asarray,
                                    self._val_scan_step(self.params, stacked))
                e_se, n_conf, g_se, n_vec = outs
                for bi, ds_names in enumerate(names):
                    self.evaluator.accumulate(e_se[bi], n_conf[bi],
                                              g_se[bi], n_vec[bi], ds_names)
                return self.evaluator.pool()

        if self.cache_batches:
            if getattr(self, '_val_cache', None) is None:
                self._val_cache = [(jax.device_put(b), n)
                                   for b, n in self.val_loader]
            batches = self._val_cache
        else:
            batches = self.val_loader

        for batch, ds_names in batches:
            energy, gradient = self.eval_step(self.params, batch)
            self.evaluator.step(batch, energy, gradient, ds_names)
        return self.evaluator.pool()

    # ------------------------------------------------------------------
    def fit(self, max_epochs: Optional[int] = None) -> Dict:
        """Train until `self.epoch` reaches max_epochs (ABSOLUTE, like the
        reference's Lightning max_epochs — a resumed run continues to the
        same target instead of running max_epochs more)."""
        if max_epochs is None:  # explicit 0 means "train nothing"
            max_epochs = int(self.trainer_cfg.get('max_epochs', 100))
        time_limit_h = self.cfg.get('time_limit')
        # per-session bound: measured from THIS fit() call only (no
        # elapsed_time), so a resume under the same flag gets a fresh budget
        session_limit_h = self.cfg.get('session_time_limit')
        finish_criterion = {
            float(k): float(v)
            for k, v in (self.cfg.get('finish_criterion') or {}).items()}
        es_energy_w = float(self.cfg.get('early_stopping_energy_weight', 3.0))
        ckpt_every = int(self.trainer_cfg.get('checkpoint_every', 5))
        self._last_best_save = -ckpt_every
        start_time = time.time()
        # checkpoints written during fit must include the in-flight session
        # time, so a resumed run's time_limit/finish_criterion budget is
        # cumulative (reference: elapsed_time is "time from a previous run")
        self._fit_start = start_time

        try:
            self._fit_loop(max_epochs, finish_criterion, time_limit_h,
                           session_limit_h, es_energy_w, ckpt_every,
                           start_time)
        except BaseException:
            # join the in-flight async writer before unwinding: an orphaned
            # daemon thread can finish its (now stale) last.ckpt write AFTER
            # safe_trainrun's in-process retry resumed from that file,
            # silently rolling the resume point back. The original exception
            # is what matters — a writer error is swallowed here.
            if self._ckpt_thread is not None:
                try:
                    self._join_ckpt_thread()
                except Exception:
                    pass
            raise

        if self.out_dir:
            # if the latest improvement's best-save was skipped (async
            # writer busy / throttle window), flush the device-held best
            # snapshot now — otherwise the run's best params never reach
            # disk (fit only guarantees last.ckpt below)
            if (self._best_snapshot is not None
                    and self._best_snapshot[1] > self._last_best_save):
                best_params, best_epoch = self._best_snapshot
                self._join_ckpt_thread()
                _write_checkpoint(self.out_dir / 'best.ckpt', best_params,
                                  None, self._ckpt_meta(epoch=best_epoch))
                self._last_best_save = best_epoch
            # the fit-exit resume point must be on disk before returning
            self.save_checkpoint(self.out_dir / 'last.ckpt', blocking=True)
        else:
            self._join_ckpt_thread()
        # fold this session's wall time into the stored total so a later
        # fit() (or a save outside fit) doesn't double-count it
        self.elapsed_time += time.time() - start_time
        self._fit_start = None
        return {'best_early_stopping_loss': self.best_loss,
                'epochs': self.epoch, 'history': self.history}

    def _fit_loop(self, max_epochs, finish_criterion, time_limit_h,
                  session_limit_h, es_energy_w, ckpt_every, start_time):
        while self.epoch < max_epochs:
            t_ep = time.time()
            self.train_epoch()
            t_train = time.time() - t_ep
            t_val0 = time.time()
            metrics = self.validate()
            t_val = time.time() - t_val0
            es_loss = early_stopping_loss(metrics, es_energy_w)
            self.history.append({'epoch': self.epoch, 'metrics': metrics,
                                 'early_stopping_loss': es_loss})
            self.log_fn({'epoch': self.epoch, 'val_metrics': metrics,
                         'early_stopping_loss': es_loss,
                         't_train': round(t_train, 3),
                         't_val': round(t_val, 3)})

            if self.epoch >= self.start_qm_epochs and np.isfinite(es_loss):
                if es_loss < self.best_loss:
                    # monotone global best — gates best.ckpt only
                    self.best_loss = es_loss
                    # keep the best params alive on device regardless of
                    # whether the disk save below happens: the fit-exit
                    # flush writes them if the last improvement's save was
                    # skipped (test_best_ckpt_flushed_at_fit_exit)
                    self._best_snapshot = (self._snapshot(self.params),
                                           self.epoch)
                    # best checkpoints: params only (no optimizer state) and
                    # throttled — device->host transfer of the full Adam
                    # state is expensive on tunneled chips. An async save
                    # skipped because the writer is busy does NOT advance
                    # the throttle clock, so the next improvement retries.
                    if self.out_dir and (
                            self.epoch - self._last_best_save >= ckpt_every):
                        if self.save_checkpoint(self.out_dir / 'best.ckpt',
                                                include_opt_state=False):
                            self._last_best_save = self.epoch
                if es_loss < self.plateau_baseline:
                    self.plateau_baseline = es_loss
                    self.epochs_without_improvement = 0
                else:
                    self.epochs_without_improvement += 1
                    patience = int(self.cfg.get('patience', 50))
                    if patience > 0 and self.epochs_without_improvement > patience:
                        self.lr *= float(self.cfg.get('lr_decay', 0.8))
                        self.epochs_without_improvement = 0
                        self.plateau_baseline = es_loss

            # the epoch is COMPLETE here — count it before any early exit,
            # so the final checkpoint records it and a resume does not
            # retrain it
            self.epoch += 1

            elapsed_h = (time.time() - start_time + self.elapsed_time) / 3600.0
            relevant = [v for k, v in finish_criterion.items() if k < elapsed_h]
            if relevant and es_loss > min(relevant):
                break
            if time_limit_h is not None and elapsed_h > time_limit_h:
                break
            if session_limit_h is not None and (
                    (time.time() - start_time) / 3600.0 > session_limit_h):
                break

            if self.out_dir and self.epoch % ckpt_every == 0:
                self.save_checkpoint(self.out_dir / 'last.ckpt')

    # ------------------------------------------------------------------
    # checkpointing: msgpack params + optimizer + json sidecar
    def _join_ckpt_thread(self):
        """Wait for an in-flight async checkpoint write and surface its
        error (if any) to the caller."""
        if self._ckpt_thread is not None:
            self._ckpt_thread.join()
            self._ckpt_thread = None
        if self._ckpt_error is not None:
            err, self._ckpt_error = self._ckpt_error, None
            raise RuntimeError('async checkpoint write failed') from err

    def _ckpt_meta(self, epoch: Optional[int] = None) -> Dict:
        elapsed = self.elapsed_time + (
            time.time() - self._fit_start if self._fit_start else 0.0)
        return {
            'epoch': self.epoch if epoch is None else int(epoch),
            'global_step': self.global_step,
            'lr': self.lr, 'best_loss': self.best_loss,
            'plateau_baseline': self.plateau_baseline,
            'elapsed_time': elapsed,
            'config': _jsonable(self.full_config),
        }

    def save_checkpoint(self, path, include_opt_state: bool = True,
                        blocking: Optional[bool] = None) -> bool:
        """Write params (+ optimizer state) and a json sidecar to `path`.

        blocking=None resolves to `not self.async_checkpoints`. A
        non-blocking save snapshots the trees on device and returns
        immediately while a background thread streams them to disk; if a
        previous async write is still in flight it is SKIPPED (returns
        False) — on slow tunnels this self-throttles checkpoint cadence to
        whatever the link sustains without ever stalling training."""
        path = Path(path)
        if blocking is None:
            blocking = not self.async_checkpoints
        meta = self._ckpt_meta()
        if blocking:
            # serialize with any in-flight async write to the same tree
            self._join_ckpt_thread()
            _write_checkpoint(path, self.params,
                              self.opt_state if include_opt_state else None,
                              meta)
            return True
        if self._ckpt_thread is not None and self._ckpt_thread.is_alive():
            return False
        self._join_ckpt_thread()   # reap the finished thread + its errors
        # device-side copies: the training step donates self.params /
        # self.opt_state buffers, so the writer must hold its own
        params = self._snapshot(self.params)
        opt = self._snapshot(self.opt_state) if include_opt_state else None

        def work():
            try:
                _write_checkpoint(path, params, opt, meta)
            except BaseException as exc:   # surfaced on next join
                self._ckpt_error = exc

        self._ckpt_thread = threading.Thread(
            target=work, name='grappa-ckpt-writer', daemon=True)
        self._ckpt_thread.start()
        return True

    def load_checkpoint(self, path):
        path = Path(path)
        _verify_checkpoint(path)
        self.params = serialization.from_bytes(
            self.params, (path / 'params.msgpack').read_bytes())
        if (path / 'opt_state.msgpack').exists():
            self.opt_state = serialization.from_bytes(
                self.opt_state, (path / 'opt_state.msgpack').read_bytes())
        meta = json.loads((path / 'meta.json').read_text())
        self.epoch = meta['epoch']
        self.global_step = meta['global_step']
        self.lr = meta['lr']
        self.best_loss = meta['best_loss']
        self.plateau_baseline = meta.get('plateau_baseline', meta['best_loss'])
        self.elapsed_time = meta.get('elapsed_time', 0.0)


def _write_checkpoint(path: Path, params, opt_state, meta: Dict):
    """Serialize a checkpoint with per-file atomic replaces (tmp +
    os.replace), params -> opt_state -> meta -> manifest. A crash mid-write
    can never truncate an existing checkpoint file (the old resume point
    survives). Per-file replaces alone could still leave a MIXED checkpoint
    (params one save newer than the Adam state/meta), so a manifest with a
    crc32 per payload is written LAST: `_verify_checkpoint` detects any
    torn combination instead of silently resuming from mismatched state."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    crcs = {}

    def atomic_write(name: str, data: bytes):
        crcs[name] = zlib.crc32(data)
        tmp = path / (name + '.tmp')
        tmp.write_bytes(data)
        os.replace(tmp, path / name)

    atomic_write('params.msgpack', serialization.to_bytes(params))
    if opt_state is not None:
        atomic_write('opt_state.msgpack', serialization.to_bytes(opt_state))
    else:
        # a params-only save (best.ckpt) must invalidate any stale opt
        # state left from an older layout of the same directory
        (path / 'opt_state.msgpack').unlink(missing_ok=True)
    atomic_write('meta.json', json.dumps(meta, indent=1).encode())
    atomic_write('manifest.json', json.dumps(crcs).encode())


def _verify_checkpoint(path: Path):
    """Raise if the checkpoint directory is a torn mix of two saves (crash
    between the per-file atomic replaces). Checkpoints from before the
    manifest existed verify trivially."""
    manifest = path / 'manifest.json'
    if not manifest.exists():
        return
    crcs = json.loads(manifest.read_text())
    for name, crc in crcs.items():
        if name == 'manifest.json':
            continue
        f = path / name
        if not f.exists() or zlib.crc32(f.read_bytes()) != crc:
            raise RuntimeError(
                f'checkpoint {path} is torn: {name} does not match its '
                f'manifest (crash between per-file writes?). Resume from '
                f'a different checkpoint (best.ckpt / an older copy) or '
                f'delete the directory to restart.')


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj
