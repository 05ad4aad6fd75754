"""Atom-partitioned (sequence-parallel analog) sharding for macromolecules.

The reference has no multi-device path at all (SURVEY §2.12); for grappa the
"long sequence" axes are conformers (see dp.make_conf_sharded_energy_fn) and
ATOMS/TUPLES of one giant molecule. This module shards the node and tuple
axes of a GraphBatch across the mesh and jits the full prediction + force
computation over it: the GNN's neighbor gathers and the per-molecule segment
sums then become XLA (GSPMD) collectives over ICI — the generalized halo
exchange, chosen and scheduled by the compiler instead of hand-written
ring passes.

Usage:
    mesh = make_mesh(n_devices)
    pad = atom_sharded_pad_spec([graph], n_confs, mesh)
    batch = collate([graph], pad=pad)
    fwd = make_atom_sharded_forward(model, mesh)
    energy, gradient = fwd(params, shard_batch_by_atoms(batch, mesh))
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from grappa_tpu.data.graph_batch import (GraphBatch, MolGraph, PadSpec, TERMS,
                                         _round_up)
from grappa_tpu.models import mm_energy


def atom_sharded_pad_spec(graphs: Sequence[MolGraph], n_confs: int,
                          mesh: Mesh) -> PadSpec:
    """PadSpec whose node and tuple counts are multiples of the mesh size."""
    n_dev = mesh.devices.size
    base = PadSpec.for_graphs(graphs, n_confs)
    return PadSpec(
        n_nodes=_round_up(base.n_nodes, n_dev, n_dev),
        n_tuples={t: _round_up(base.n_tuples[t], n_dev, n_dev)
                  for t in TERMS},
        n_confs=n_confs,
    )


def shard_batch_by_atoms(batch: GraphBatch, mesh: Mesh) -> GraphBatch:
    """Place the batch with node- and tuple-indexed arrays sharded over the
    mesh's 'dp' axis (leading axis) and molecule-level arrays replicated."""
    n_dev = mesh.devices.size
    if batch.num_nodes % n_dev != 0:
        raise ValueError(
            f"node axis ({batch.num_nodes}) must be divisible by the mesh "
            f"size ({n_dev}); use atom_sharded_pad_spec")
    for t in TERMS:
        if batch.terms[t].idxs.shape[0] % n_dev != 0:
            raise ValueError(
                f"tuple axis of {t} ({batch.terms[t].idxs.shape[0]}) must be "
                f"divisible by the mesh size ({n_dev}); use "
                f"atom_sharded_pad_spec")

    def ns(spec):
        return NamedSharding(mesh, spec)

    node, rep = ns(P('dp')), ns(P())
    terms = {
        t: tb.replace(
            idxs=node, mask=node, mol=node, k_ref=node,
            eq_ref=(node if tb.eq_ref is not None else None))
        for t, tb in batch.terms.items()
    }
    shardings = batch.replace(
        feats={k: node for k in batch.feats},
        node_mask=node, node_mol=node,
        neighbors=node, neighbor_mask=node,
        xyz=node, gradient_ref=node,
        conf_mask=rep, energy_ref=rep,
        terms=terms,
    )
    return jax.device_put(batch, shardings)


def make_atom_sharded_train_step(model, tx, mesh: Mesh,
                                 donate: bool = True) -> Callable:
    """Full TRAINING step (grad-of-grad loss through the forces) on an
    atom-sharded batch: (params, opt_state, batch, weights, lr, rng) ->
    (params, opt_state, loss, aux).

    Params/optimizer state are replicated; the batch is sharded by
    shard_batch_by_atoms. GSPMD partitions the double-backward along the
    node/tuple axes and inserts the halo-exchange/psum collectives; the
    gradient trees are constrained back to replicated so the optimizer
    update is identical on every device. This is the prescribed path for
    molecules past the single-chip HBM limit (~50k atoms, PERF.md) —
    equality with the single-device step is tested on the 8-device CPU
    mesh at 5k atoms (tests/test_parallel.py)."""
    import optax

    from grappa_tpu.train.loss import molwise_loss

    rep = NamedSharding(mesh, P())

    # donate params/opt_state like make_train_step (trainer.py): the
    # sharded step exists because HBM is the constraint, so don't hold a
    # second optimizer-state copy across the update
    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, batch: GraphBatch, weights, lr, rng):
        def loss_fn(p):
            pred = model.apply(p, batch, deterministic=False,
                               rngs={'dropout': rng})
            return molwise_loss(batch, pred, weights)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.with_sharding_constraint(
            grads, jax.tree.map(lambda _: rep, grads))
        updates, new_opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss, aux

    return step


def make_atom_sharded_forward(model, mesh: Mesh) -> Callable:
    """jitted (params, sharded_batch) -> (energy (M,C), gradient (N,C,3)).

    With the batch sharded by shard_batch_by_atoms, GSPMD partitions the
    GNN message passing, the tuple heads and the force computation along
    the node/tuple axes and inserts the necessary collectives."""

    @jax.jit
    def fwd(params, batch: GraphBatch):
        pred = model.apply(params, batch)
        return mm_energy.energy_and_gradient(batch, pred)

    return fwd
