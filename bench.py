"""Benchmark: full training-step throughput of the flagship model on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured quantity is complete training steps per second (model forward,
MM energy, forces via grad, energy+force+param loss, grad-of-grad backward,
Adam update) on an espaloma-like batch: 128 molecules x 32 conformers, mixed
sizes. vs_baseline compares against a torch-CPU implementation of the same
architecture/step (benchmarks/torch_baseline.py) — a conservative stand-in
for the reference's torch/DGL loop (the reference publishes no throughput
numbers, BASELINE.md). The torch measurement is cached in
bench_torch_baseline.json after the first run.
"""
import json
import time
from pathlib import Path

import numpy as np

N_MOLS = 128
N_CONFS = 32
SEED = 123


def build_batch():
    from grappa_tpu.data import MolGraph, collate
    from grappa_tpu.data.loader import bucketed_pad_spec
    from grappa_tpu.data.synthetic import make_moldata

    rng = np.random.default_rng(SEED)
    graphs = []
    for i in range(N_MOLS):
        n_atoms = int(rng.integers(8, 44))
        graphs.append(MolGraph.from_moldata(
            make_moldata(seed=SEED + i, n_confs=N_CONFS, n_atoms=n_atoms)))
    pad = bucketed_pad_spec(graphs, N_CONFS)
    return collate(graphs, pad=pad, n_confs=N_CONFS), graphs


def batch_to_arrays(batch):
    """Host arrays for the torch baseline (same padded shapes)."""
    feats = np.concatenate(
        [np.asarray(batch.feats[k]).reshape(batch.num_nodes, -1)
         for k in ('atomic_number', 'ring_encoding', 'degree', 'charge_model')],
        axis=1).astype(np.float32)
    return {
        'feats': feats,
        'charges': np.asarray(batch.feats['partial_charge'], np.float32),
        'neighbors': np.asarray(batch.neighbors),
        'neighbor_mask': np.asarray(batch.neighbor_mask),
        'xyz': np.asarray(batch.xyz),
        'energy_ref': np.asarray(batch.energy_ref),
        'gradient_ref': np.asarray(batch.gradient_ref),
        'term_idxs': {t: np.asarray(batch.terms[t].idxs)
                      for t in batch.terms},
        'term_mol': {t: np.asarray(batch.terms[t].mol)
                     for t in batch.terms},
        'num_mols': batch.num_mols,
    }


def measure_jax(batch, n_steps=100, n_warmup=10) -> float:
    import jax
    import jax.numpy as jnp
    from grappa_tpu.models.grappa_model import make_model, get_default_model_config
    from grappa_tpu.train.loss import LossWeights
    from grappa_tpu.train.trainer import make_optimizer, make_train_step

    model = make_model(get_default_model_config())
    params = jax.jit(model.init)(jax.random.key(0), batch)
    tx = make_optimizer()
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    weights = LossWeights(
        energy=jnp.float32(1.0), gradient=jnp.float32(0.8),
        param=jnp.full(batch.num_mols, 1e-3, jnp.float32),
        proper_reg=jnp.float32(1e-3), improper_reg=jnp.float32(1e-3))
    lr = jnp.float32(1e-4)
    rng = jax.random.key(1)

    for _ in range(n_warmup):
        params, opt_state, loss, _ = step(params, opt_state, batch, weights,
                                          lr, rng)
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(n_steps):
        params, opt_state, loss, _ = step(params, opt_state, batch, weights,
                                          lr, rng)
    jax.block_until_ready(loss)
    return (time.time() - t0) / n_steps


def torch_baseline_seconds(batch) -> float:
    cache = Path(__file__).parent / 'bench_torch_baseline.json'
    key = f'{N_MOLS}x{N_CONFS}_seed{SEED}'
    if cache.exists():
        data = json.loads(cache.read_text())
        if key in data:
            return data[key]
    from benchmarks.torch_baseline import run_torch_baseline
    seconds = run_torch_baseline(batch_to_arrays(batch))
    data = json.loads(cache.read_text()) if cache.exists() else {}
    data[key] = seconds
    cache.write_text(json.dumps(data, indent=1))
    return seconds


def main():
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    batch, _ = build_batch()
    jax_sec = measure_jax(batch)
    try:
        torch_sec = torch_baseline_seconds(batch)
    except Exception as exc:  # baseline failure must not kill the bench
        print(f"# torch baseline failed: {exc}")
        torch_sec = None

    steps_per_sec = 1.0 / jax_sec
    vs_baseline = (torch_sec / jax_sec) if torch_sec else 1.0
    print(json.dumps({
        'metric': 'train_steps_per_sec_128mol_32conf',
        'value': round(steps_per_sec, 3),
        'unit': 'steps/s',
        'vs_baseline': round(vs_baseline, 2),
    }))


if __name__ == '__main__':
    main()
