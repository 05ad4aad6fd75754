"""Multi-device parallelism via jax.sharding meshes + shard_map.

The reference is strictly single-device (reference: src/grappa/training/
lightning_trainer.py:92 constructs pl.Trainer with no strategy/devices);
this module supplies the parallelism the TPU build needs as first-class
components (SURVEY.md section 2.12):

  * Data parallelism: molecule batches sharded over a 1-D `dp` mesh axis;
    each device computes the loss/grads of its sub-batch; gradients are
    psum-averaged over ICI by XLA collectives inside one shard_map program.
  * Conformer-axis parallelism (the framework's sequence-parallel analog):
    the conformer axis of the energy/force computation is embarrassingly
    parallel given parameters; jit with NamedSharding on the conf axis lets
    XLA partition the geometry + energy work across devices (GSPMD), used
    for conformation-heavy evaluation sets.

Tensor parallelism is intentionally not applied by default: the model is
256-512 wide, so weights fit trivially per device and TP would trade fast
batch math for collective latency. Pipeline/expert parallelism have no
counterpart in this model family (no layer pipeline worth splitting, no MoE).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from grappa_tpu.data.graph_batch import GraphBatch, stack_batches
from grappa_tpu.models import mm_energy
from grappa_tpu.train.loss import LossWeights, molwise_loss


def make_mesh(n_devices: int = None, axis: str = 'dp') -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_devices]), (axis,))


def shard_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack same-shape per-device batches along a leading `dp` axis."""
    return stack_batches(batches)


def _squeeze0(tree):
    return jax.tree.map(lambda x: x.squeeze(0), tree)


def make_dp_train_step(model, tx, mesh: Mesh, donate: bool = True) -> Callable:
    """One data-parallel training step.

    Args (per call):
      params, opt_state: replicated pytrees
      batches: GraphBatch stacked with leading axis == mesh size
      weights: LossWeights stacked likewise (per-device per-mol param vector)
      lr: scalar
      rngs: (n_dev,) stacked PRNG keys
    Returns (params, opt_state, loss, aux) with loss/aux pmean-ed over
    devices (same signature as the single-device train step).
    """

    def local_step(params, opt_state, batch, weights, lr, rng):
        batch = _squeeze0(batch)
        weights = _squeeze0(weights)
        rng = rng.reshape(())

        def loss_fn(p):
            pred = model.apply(p, batch, deterministic=False,
                               rngs={'dropout': rng})
            return molwise_loss(batch, pred, weights)

        (loss, aux), grads = jax.value_and_grad(loss_fn,
                                                has_aux=True)(params)
        grads = jax.lax.pmean(grads, 'dp')      # ICI all-reduce by XLA
        loss = jax.lax.pmean(loss, 'dp')
        aux = jax.lax.pmean(aux, 'dp')
        updates, new_opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss, aux

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P('dp'), P('dp'), P(), P('dp')),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    # donate the replicated params/opt_state: callers rebind the returned
    # trees, and in-place optimizer updates halve the HBM high-water mark
    return jax.jit(sharded, donate_argnums=(0, 1) if donate else ())


def make_dp_scan_epoch_step(model, tx, mesh: Mesh,
                            donate: bool = True) -> Callable:
    """One XLA dispatch per data-parallel EPOCH: lax.scan of the dp train
    step over the stacked device-resident batch cache (the multi-chip
    analog of trainer.make_scan_epoch_step — dispatch latency rides DCN/
    the tunnel once per epoch instead of once per step).

    Returns jitted
      (params, opt_state, flat_batches, flat_weights, slot_scale, perm,
       lrs, rngs) -> (params, opt_state, losses)
    where flat_batches/flat_weights carry a leading slot axis of length
    n_groups*n_dev (real batches first, padding replicas last), slot_scale
    is the per-SLOT weight factor (1 for full groups, n_dev/k for the
    trailing group's k real slots, 0 for padding — the same zero-padding
    trick as Trainer._train_epoch_dp), perm permutes the REAL slots for
    the epoch shuffle, lrs is (n_groups,), rngs is (n_groups, n_dev)."""
    from functools import partial

    def local_step(params, opt_state, batch, weights, lr, rng):
        batch = _squeeze0(batch)
        weights = _squeeze0(weights)
        rng = rng.reshape(())

        def loss_fn(p):
            pred = model.apply(p, batch, deterministic=False,
                               rngs={'dropout': rng})
            return molwise_loss(batch, pred, weights)

        (loss, aux), grads = jax.value_and_grad(loss_fn,
                                                has_aux=True)(params)
        grads = jax.lax.pmean(grads, 'dp')
        loss = jax.lax.pmean(loss, 'dp')
        updates, new_opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        return optax.apply_updates(params, updates), new_opt_state, loss

    def sharded_epoch(params, opt_state, batches, weights, lrs, rngs):
        # per-device view: batches/weights leaves (n_groups, 1, ...)
        def body(carry, xs):
            p, o = carry
            batch, w, lr, rng = xs
            p, o, loss = local_step(p, o, batch, w, lr, rng)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (batches, weights, lrs, rngs))
        return params, opt_state, losses

    run = jax.shard_map(
        sharded_epoch, mesh=mesh,
        in_specs=(P(), P(), P(None, 'dp'), P(None, 'dp'), P(),
                  P(None, 'dp')),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def epoch(params, opt_state, flat_batches, flat_weights, slot_scale,
              perm, lrs, rngs):
        n_dev = mesh.devices.size
        b = jax.tree.map(lambda x: jnp.take(x, perm, axis=0), flat_batches)
        w = jax.tree.map(
            lambda x: (jnp.take(x, perm, axis=0)
                       * slot_scale.reshape((-1,) + (1,) * (x.ndim - 1))),
            flat_weights)
        grouped_b = jax.tree.map(
            lambda x: x.reshape((-1, n_dev) + x.shape[1:]), b)
        grouped_w = jax.tree.map(
            lambda x: x.reshape((-1, n_dev) + x.shape[1:]), w)
        return run(params, opt_state, grouped_b, grouped_w, lrs, rngs)

    return epoch


def make_dp_eval_step(model, mesh: Mesh) -> Callable:
    """Data-parallel inference: returns per-device stacked (energy, gradient)."""

    def local_eval(params, batch):
        batch = _squeeze0(batch)
        pred = model.apply(params, batch)
        energy, gradient = mm_energy.energy_and_gradient(batch, pred)
        return energy[None], gradient[None]

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(), P('dp')), out_specs=(P('dp'), P('dp')),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_conf_sharded_energy_fn(mesh: Mesh) -> Callable:
    """Energy/forces with the conformer axis sharded across the mesh.

    The per-conformer MM energy is independent given parameters, so XLA
    (GSPMD) splits the geometry and per-term energy work along the conf axis
    with no communication except the final per-molecule layout.
    """

    def fn(batch: GraphBatch, params):
        return mm_energy.energy_and_gradient(batch, params)

    jitted = jax.jit(fn)

    def run(batch: GraphBatch, params):
        n_dev = mesh.devices.size
        if batch.num_confs % n_dev != 0:
            raise ValueError(
                f"conformer axis ({batch.num_confs}) must be divisible by the "
                f"mesh size ({n_dev}); pad n_confs to a multiple (the loader's "
                f"conf buckets can be set accordingly)")
        conf_sharding = NamedSharding(mesh, P(None, 'dp', None))
        energy_sharding = NamedSharding(mesh, P(None, 'dp'))
        batch = batch.replace(
            xyz=jax.device_put(batch.xyz, conf_sharding),
            conf_mask=jax.device_put(batch.conf_mask, energy_sharding),
            energy_ref=jax.device_put(batch.energy_ref, energy_sharding),
            gradient_ref=jax.device_put(batch.gradient_ref, conf_sharding),
        )
        return jitted(batch, params)

    return run


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def stack_loss_weights(weights: Sequence[LossWeights]) -> LossWeights:
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *weights)
