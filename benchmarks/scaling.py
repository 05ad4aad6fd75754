"""Throughput scaling study: train-step throughput vs batch size and compute
dtype on the real TPU chip, plus a bf16-vs-f32 prediction-accuracy check.

Run: python benchmarks/scaling.py
"""
import json
import time

import numpy as np


def build_batch(n_mols, n_confs, seed=123):
    from grappa_tpu.data import MolGraph, collate
    from grappa_tpu.data.loader import bucketed_pad_spec
    from grappa_tpu.data.synthetic import make_moldata
    rng = np.random.default_rng(seed)
    graphs = []
    for i in range(n_mols):
        n_atoms = int(rng.integers(8, 44))
        graphs.append(MolGraph.from_moldata(
            make_moldata(seed=seed + i, n_confs=n_confs, n_atoms=n_atoms)))
    pad = bucketed_pad_spec(graphs, n_confs)
    return collate(graphs, pad=pad, n_confs=n_confs)


def measure(batch, compute_dtype, n_steps=20, n_warmup=3):
    import jax
    import jax.numpy as jnp
    from grappa_tpu.models.grappa_model import (
        get_default_model_config, make_model)
    from grappa_tpu.train.loss import LossWeights
    from grappa_tpu.train.trainer import make_optimizer, make_train_step

    cfg = get_default_model_config()
    cfg['compute_dtype'] = compute_dtype
    model = make_model(cfg)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    tx = make_optimizer()
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    weights = LossWeights(
        energy=jnp.float32(1.0), gradient=jnp.float32(0.8),
        param=jnp.full(batch.num_mols, 1e-3, jnp.float32),
        proper_reg=jnp.float32(1e-3), improper_reg=jnp.float32(1e-3))
    lr, rng = jnp.float32(1e-4), jax.random.key(1)
    for _ in range(n_warmup):
        params, opt_state, loss, _ = step(params, opt_state, batch, weights,
                                          lr, rng)
    from grappa_tpu.utils import materialize
    materialize(loss)
    t0 = time.time()
    for _ in range(n_steps):
        params, opt_state, loss, _ = step(params, opt_state, batch, weights,
                                          lr, rng)
    materialize(loss)   # host fetch forces execution (axon backend caveat)
    return (time.time() - t0) / n_steps


def accuracy_delta(batch):
    """Max relative deviation of predicted parameters bf16 vs f32."""
    import jax
    from grappa_tpu.models.grappa_model import (
        get_default_model_config, make_model)
    cfg32 = get_default_model_config()
    model32 = make_model(cfg32)
    params = jax.jit(model32.init)(jax.random.key(0), batch)
    cfg16 = get_default_model_config()
    cfg16['compute_dtype'] = 'bfloat16'
    model16 = make_model(cfg16)
    out32 = jax.jit(lambda p, b: model32.apply(p, b))(params, batch)
    out16 = jax.jit(lambda p, b: model16.apply(p, b))(params, batch)
    deltas = {}
    for k in out32:
        a, b = np.asarray(out32[k]), np.asarray(out16[k])
        scale = np.abs(a).mean() + 1e-6
        deltas[k] = float(np.abs(a - b).max() / scale)
    return deltas


def main():
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    results = []
    for n_mols in (32, 128, 256):
        batch = build_batch(n_mols, 32)
        row = {'n_mols': n_mols, 'n_confs': 32,
               'padded_atoms': batch.num_nodes}
        for dtype in ('float32', 'bfloat16'):
            sec = measure(batch, dtype)
            row[f'{dtype}_steps_per_sec'] = round(1.0 / sec, 2)
            row[f'{dtype}_mol_confs_per_sec'] = round(n_mols * 32 / sec, 0)
        results.append(row)
        print(json.dumps(row))
    batch = build_batch(32, 32)
    print(json.dumps({'bf16_vs_f32_param_delta': accuracy_delta(batch)}))


if __name__ == '__main__':
    main()
