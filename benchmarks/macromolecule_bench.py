"""Macromolecule-scale benchmark on one chip: featurization, prediction
(forward) and a full training step on a 10k+-atom synthetic system
(SURVEY §2.12 SP / §5.7). Timings end with host fetches (see PERF.md
round-2 measurement correction). Prints one JSON line."""
import json
import time

import numpy as np


def main(n_atoms=12000, n_confs=4, remat=False):
    from grappa_tpu.utils import enable_compilation_cache, materialize
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from grappa_tpu.data import MolGraph, collate
    from grappa_tpu.data.synthetic import make_moldata
    from grappa_tpu.models import mm_energy
    from grappa_tpu.models.grappa_model import (get_default_model_config,
                                                make_model)
    from grappa_tpu.train.loss import LossWeights
    from grappa_tpu.train.trainer import make_optimizer, make_train_step

    md = make_moldata(seed=0, n_confs=n_confs, n_atoms=n_atoms)
    t0 = time.time()
    g = MolGraph.from_moldata(md)
    feat_s = time.time() - t0
    batch = collate([g])
    result = {
        'n_atoms': int(g.n_atoms), 'n_confs': n_confs,
        'n_propers': int(len(g.tuple_idxs['n4'])),
        'featurize_ms': round(feat_s * 1e3, 1),
    }

    cfg = get_default_model_config()
    cfg['remat'] = remat
    result['remat'] = remat
    model = make_model(cfg)
    params = jax.jit(model.init)(jax.random.key(0), batch)

    @jax.jit
    def forward(params, batch):
        pred = model.apply(params, batch)
        return mm_energy.energy_and_gradient(batch, pred)

    t0 = time.time()
    materialize(forward(params, batch)[0])
    result['predict_cold_s'] = round(time.time() - t0, 2)
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        e, grad = forward(params, batch)
    materialize(e)
    result['predict_warm_ms'] = round((time.time() - t0) / reps * 1e3, 1)

    tx = make_optimizer()
    opt_state = tx.init(params)
    step = make_train_step(model, tx)
    weights = LossWeights(
        energy=jnp.float32(1.0), gradient=jnp.float32(0.8),
        param=jnp.full(batch.num_mols, 1e-3, jnp.float32),
        proper_reg=jnp.float32(1e-3), improper_reg=jnp.float32(1e-3))
    lr, rng = jnp.float32(1e-4), jax.random.key(1)
    t0 = time.time()
    params, opt_state, loss, _ = step(params, opt_state, batch, weights, lr,
                                      rng)
    float(loss)
    result['train_step_cold_s'] = round(time.time() - t0, 2)
    t0 = time.time()
    for _ in range(reps):
        params, opt_state, loss, _ = step(params, opt_state, batch, weights,
                                          lr, rng)
    float(loss)
    result['train_step_warm_ms'] = round((time.time() - t0) / reps * 1e3, 1)
    assert np.isfinite(float(loss))
    print(json.dumps(result))


if __name__ == '__main__':
    import sys
    main(n_atoms=int(sys.argv[1]) if len(sys.argv) > 1 else 12000,
         remat='--remat' in sys.argv)
