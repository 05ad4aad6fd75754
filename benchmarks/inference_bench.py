"""Inference throughput: molecules parametrized per second.

Two regimes from the north-star configs:
  * small-molecule batch parametrization (espaloma-like sizes)
  * macromolecule (ubiquitin-scale, ~1200 atoms) single-shot prediction +
    GROMACS topology export timing

Run: python benchmarks/inference_bench.py
"""
import json
import time

import numpy as np


def protein_like_molecule(n_atoms=1231, seed=0):
    """Chain-of-residues graph approximating a small protein's topology."""
    from grappa_tpu.data.molecule import Molecule
    rng = np.random.default_rng(seed)
    bonds = []
    atoms_per_res = 8
    n_res = n_atoms // atoms_per_res
    idx = 0
    prev_backbone = None
    for _ in range(n_res):
        base = idx
        # backbone N-CA-C(=O)
        bonds += [(base, base + 1), (base + 1, base + 2), (base + 2, base + 3)]
        if prev_backbone is not None:
            bonds.append((prev_backbone, base))
        # side chain
        bonds += [(base + 1, base + 4), (base + 4, base + 5),
                  (base + 4, base + 6), (base + 5, base + 7)]
        prev_backbone = base + 2
        idx += atoms_per_res
    n = idx
    zs = rng.choice([1, 6, 6, 7, 8], size=n)
    charges = rng.normal(0, 0.2, size=n).astype(np.float32)
    charges -= charges.mean()
    impropers = []
    # sp2 carbonyl impropers
    for r in range(n_res - 1):
        c = r * atoms_per_res + 2
        impropers.append((c - 1, c + 1, c, (r + 1) * atoms_per_res))
    return Molecule(atoms=np.arange(n), bonds=bonds, impropers=impropers,
                    atomic_numbers=zs, partial_charges=charges,
                    improper_in_correct_format=False)


def main():
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from grappa_tpu.api import Grappa
    from grappa_tpu.data.synthetic import random_molecule
    from grappa_tpu.models.grappa_model import (
        get_default_model_config, make_model)
    from grappa_tpu.data import MolGraph, collate
    from grappa_tpu.data.loader import bucketed_pad_spec

    cfg = get_default_model_config()
    model = make_model(cfg)
    mol0 = random_molecule(seed=0, n_atoms=24)
    g0 = MolGraph.from_molecule(mol0)
    batch0 = collate([g0])
    params = jax.jit(model.init)(jax.random.key(0), batch0)
    ff = Grappa(model, params, {'model_config': cfg})

    # -------- small molecules, batched through one padded program
    mols = [random_molecule(seed=s, n_atoms=int(np.random.default_rng(s)
                                                .integers(10, 40)))
            for s in range(64)]
    graphs = [MolGraph.from_molecule(m) for m in mols]
    pad = bucketed_pad_spec(graphs, 1)
    batch = collate(graphs, pad=pad, n_confs=1)
    apply = jax.jit(lambda p, b: model.apply(p, b))
    from grappa_tpu.utils import materialize
    materialize(apply(params, batch))
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        out = apply(params, batch)
    materialize(out)   # host fetch forces execution (axon backend caveat)
    small_mols_per_sec = len(mols) * reps / (time.time() - t0)

    # -------- macromolecule single shot (host featurization + forward)
    t0 = time.time()
    protein = protein_like_molecule()
    feat_s = time.time() - t0
    t0 = time.time()
    pred = ff.predict(protein, check_eq_values=False)
    first_predict_s = time.time() - t0     # includes compile
    t0 = time.time()
    pred = ff.predict(protein, check_eq_values=False)
    warm_predict_s = time.time() - t0

    print(json.dumps({
        'small_molecules_per_sec_batched': round(small_mols_per_sec, 1),
        'protein_atoms': len(protein.atoms),
        'protein_featurize_s': round(feat_s, 3),
        'protein_first_predict_s': round(first_predict_s, 2),
        'protein_warm_predict_s': round(warm_predict_s, 3),
        'protein_propers': len(pred.propers),
    }))


if __name__ == '__main__':
    main()
