"""MD serving benchmark: integrator throughput on the real chip.

Measures grappa_tpu.md Langevin steps/second at two scales:
  * small-molecule replica sampling: 64 molecules x 8 replicas,
  * protein scale: one ~1500-atom chain, 4 replicas,
with the whole segment as one lax.scan dispatch (honest host-fetch
timing via utils.materialize).

Run: python benchmarks/md_bench.py
"""
import json
import time

import numpy as np


def bench(batch, params, masses, n_steps=200, n_rounds=3):
    import jax.numpy as jnp

    from grappa_tpu import md
    from grappa_tpu.utils import materialize

    def run(seed):
        out = md.simulate(batch, params, masses, dt_fs=1.0,
                          n_steps=n_steps, temperature=300.0, seed=seed)
        return out['xyz']

    materialize(run(0))   # compile + warm
    t0 = time.time()
    for r in range(1, n_rounds + 1):
        materialize(run(r))
    sec = (time.time() - t0) / (n_rounds * n_steps)
    return sec


def params_from_refs(batch):
    import jax.numpy as jnp
    return {
        'n2_k': jnp.nan_to_num(batch.terms['n2'].k_ref),
        'n2_eq': jnp.nan_to_num(batch.terms['n2'].eq_ref),
        'n3_k': jnp.nan_to_num(batch.terms['n3'].k_ref),
        'n3_eq': jnp.nan_to_num(batch.terms['n3'].eq_ref),
        'n4_k': jnp.nan_to_num(batch.terms['n4'].k_ref),
        'n4_improper_k': jnp.nan_to_num(batch.terms['n4_improper'].k_ref),
    }


def main():
    from grappa_tpu import md
    from grappa_tpu.data import MolGraph, collate
    from grappa_tpu.data.loader import bucketed_pad_spec
    from grappa_tpu.data.synthetic import make_moldata
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    results = {}

    # small molecules, 8 replicas each
    mds = [make_moldata(seed=100 + i, n_confs=8, learnable=True,
                        conf_noise=0.05) for i in range(64)]
    graphs = [MolGraph.from_moldata(m) for m in mds]
    batch = collate(graphs, pad=bucketed_pad_spec(graphs, 8), n_confs=8)
    masses = md.masses_from_molecules([m.molecule for m in mds],
                                      batch.xyz.shape[0])
    sec = bench(batch, params_from_refs(batch), masses)
    n_atoms = int(np.asarray(batch.node_mask).sum())
    results['small_64mol_8rep'] = {
        'steps_per_sec': round(1.0 / sec, 1),
        'atom_steps_per_sec': round(n_atoms * 8 / sec, 0),
    }

    # protein scale
    prot = make_moldata(seed=7, n_confs=4, n_atoms=1500, learnable=True,
                        conf_noise=0.05)
    g = [MolGraph.from_moldata(prot)]
    pbatch = collate(g, pad=bucketed_pad_spec(g, 4), n_confs=4)
    pmasses = md.masses_from_molecules([prot.molecule],
                                       pbatch.xyz.shape[0])
    sec = bench(pbatch, params_from_refs(pbatch), pmasses, n_steps=100)
    results['protein_1500atom_4rep'] = {
        'steps_per_sec': round(1.0 / sec, 1),
        'atom_steps_per_sec': round(1500 * 4 / sec, 0),
    }

    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
