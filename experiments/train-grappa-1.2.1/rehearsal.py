"""grappa-1.2.1 production-recipe rehearsal on one chip.

Runs the REAL translated 1.2.1 config (grappa_config.yaml, normalized by
the same production_driver path the full run uses) end to end with
synthetic stand-in datasets resolved by tag through the zoo cache. The
published dataset tags cannot be downloaded here (zero egress), so each
role in the recipe gets a synthetic stand-in with the same wiring:

  * weighted train datasets (incl. the upweighted rna-diverse/hyp-dop
    pattern via the stored weights of the stand-in tags),
  * a pure_train dataset (stands in for rna-nucleoside),
  * two pure_test datasets (stand in for rna-trinucleotide /
    tripeptides_amber99sbildn) -> exercises the test-only loader path,
  * the espaloma-style split json consumed via splitpath.

Everything else is the production path: the normalized reference yaml's
model (40.8M params), curriculum/warmup/plateau schedule, weighted
sampling, checkpointing, bootstrap test evaluation. Overrides (dataset
tags, epochs, val_conf_strategy) are recorded in the printed summary.

Usage: python experiments/train-grappa-1.2.1/rehearsal.py [--epochs 5]
"""
import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=5)
    ap.add_argument('--out', default='runs')
    args = ap.parse_args()

    from production_driver import run_production

    from grappa_tpu.data.dataset import Dataset
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.espaloma_split import (build_espaloma_split,
                                           save_espaloma_split)
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    cache = Path(tempfile.mkdtemp(prefix='rehearsal121_cache_'))
    os.environ['GRAPPA_TPU_CACHE'] = str(cache)

    # stand-ins: (n_mols, n_confs, seed, elements, atom_range)
    train_specs = {
        'syn-monomers': (60, 8, 411, [1, 1, 6, 6, 7, 8], (10, 21)),
        'syn-pubchem': (80, 6, 412, [1, 1, 6, 6, 6, 7, 8, 16], (16, 33)),
        'syn-dipeptide': (60, 6, 413, [1, 1, 1, 6, 6, 7, 8], (24, 41)),
        'syn-rna-diverse': (40, 8, 414, [1, 6, 6, 7, 7, 8, 8, 15], (20, 33)),
        'syn-hyp-dop': (30, 6, 415, [1, 1, 6, 6, 7, 8, 8], (20, 37)),
    }
    pure_train_specs = {
        'syn-rna-nucleoside': (20, 8, 416, [1, 6, 7, 8, 15], (16, 29)),
    }
    pure_test_specs = {
        'syn-rna-trinucleotide': (16, 8, 417, [1, 6, 7, 8, 15], (24, 37)),
        'syn-tripeptides': (16, 6, 418, [1, 1, 1, 6, 6, 7, 8], (30, 49)),
    }

    split_ids = []
    for specs, is_split in ((train_specs, True), (pure_train_specs, False),
                            (pure_test_specs, False)):
        for tag, (n_mols, n_confs, seed, elements, rng) in specs.items():
            ds = Dataset.from_moldata(
                make_dataset(n_mols=n_mols, n_confs=n_confs, seed=seed,
                             learnable=True, conf_noise=0.08,
                             elements=elements, atom_range=rng), tag)
            ds.save(cache / 'datasets' / tag)
            if is_split:
                split_ids += ds.mol_ids

    ids = sorted(split_ids)
    split = build_espaloma_split(ids, te_smiles=ids[::10],
                                 vl_smiles=ids[1::10])
    splitpath = cache / 'espaloma_split.json'
    save_espaloma_split(split, splitpath)

    # the real normalization path (reference-format yaml -> grappa_tpu
    # config), then swap the published tags for the stand-ins
    config = run_production(Path(__file__).parent, 'grappa-1.2.1',
                            argv=[], dry_run=True)
    overrides = {
        'datasets': sorted(train_specs),
        'pure_train_datasets': sorted(pure_train_specs),
        'pure_test_datasets': sorted(pure_test_specs),
        'weights': {'syn-rna-diverse': 3.0, 'syn-pubchem': 0.8,
                    'syn-hyp-dop': 2.0},
        'val_conf_strategy': 16,       # synthetic molecules have <= 8 confs
        'max_epochs': args.epochs,
    }
    config['data_config'].update({
        'datasets': overrides['datasets'],
        'pure_train_datasets': overrides['pure_train_datasets'],
        'pure_test_datasets': overrides['pure_test_datasets'],
        'pure_val_datasets': [],
        'weights': overrides['weights'],
        'splitpath': str(splitpath),
        'val_conf_strategy': overrides['val_conf_strategy'],
    })
    config['trainer_config']['max_epochs'] = args.epochs
    config['trainer_config']['name'] = 'grappa-1.2.1-rehearsal'

    from grappa_tpu.train.run import do_trainrun
    out = do_trainrun(config, project_dir=args.out,
                      run_name='grappa-1.2.1-rehearsal', cache_batches=True)
    history = out['results']['history']
    es = [h for h in history if h.get('early_stopping_loss') is not None]
    from grappa_tpu.train.export import load_model_dict
    md = load_model_dict(out['model_dict_path'])
    summary = {
        'config': 'experiments/train-grappa-1.2.1/grappa_config.yaml '
                  '(normalized by production_driver)',
        'overrides': overrides,
        'epochs_run': len(history),
        'best_es_loss': (round(min(h['early_stopping_loss'] for h in es), 3)
                         if es else None),
        'test': (md.get('results') or {}).get('test'),
    }
    out_path = Path(__file__).parent / 'rehearsal_results.json'
    out_path.write_text(json.dumps(summary, indent=1, default=str))
    print(json.dumps(summary, indent=1, default=str))


if __name__ == '__main__':
    main()
