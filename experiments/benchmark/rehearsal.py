"""Production-recipe rehearsal: run the REAL espaloma-benchmark config
(grappa_config.yaml — full dropout, curriculum, warmup, weighted sampling,
espaloma-style split) end to end on synthetic datasets resolved by tag
through the zoo cache, on one chip.

This is the closest possible rehearsal of the published benchmark run
without the espaloma data: everything is the production path (tag
resolution, weighted multi-dataset loader, conf-strategy padding, split
json, the 40.8M-param model with dropouts on, the yaml's lr/warmup/patience
schedule) except the molecules themselves and three overrides recorded in
the output (epochs, val_conf_strategy, dataset tags).

Usage: python experiments/benchmark/rehearsal.py [--epochs 120]
"""
import argparse
import json
import os
import tempfile
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=120)
    ap.add_argument('--out', default='runs')
    args = ap.parse_args()

    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from grappa_tpu.data.dataset import Dataset
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.espaloma_split import (build_espaloma_split,
                                           save_espaloma_split)
    from grappa_tpu.train.config import read_yaml
    from grappa_tpu.train.run import do_trainrun

    cache = Path(tempfile.mkdtemp(prefix='rehearsal_cache_'))
    os.environ['GRAPPA_TPU_CACHE'] = str(cache)

    # three synthetic "benchmark datasets" of different sizes/conf counts,
    # all drawn from the same global environment force field so the model
    # can generalize across datasets like on the real benchmark
    specs = {'syn-monomers': (240, 12, 11), 'syn-dipeptide': (160, 8, 23),
             'syn-pubchem': (320, 6, 37)}
    all_ids = []
    for tag, (n_mols, n_confs, seed) in specs.items():
        ds = Dataset.from_moldata(
            make_dataset(n_mols=n_mols, n_confs=n_confs, seed=seed,
                         learnable=True, conf_noise=0.08), tag)
        ds.save(cache / 'datasets' / tag)
        all_ids += ds.mol_ids

    # espaloma-style split json (the published-benchmark mechanism)
    rng_ids = sorted(all_ids)
    split = build_espaloma_split(all_ids, te_smiles=rng_ids[::10],
                                 vl_smiles=rng_ids[1::10])
    splitpath = cache / 'espaloma_split.json'
    save_espaloma_split(split, splitpath)

    config = read_yaml(Path(__file__).parent / 'grappa_config.yaml')
    overrides = {
        'datasets': sorted(specs),
        'weights': {'syn-monomers': 1.0, 'syn-dipeptide': 2.0,
                    'syn-pubchem': 0.8},
        'val_conf_strategy': 16,        # synthetic molecules have <= 12 confs
        'max_epochs': args.epochs,
    }
    config['data_config'].update({
        'datasets': overrides['datasets'],
        'pure_train_datasets': [], 'pure_val_datasets': [],
        'weights': overrides['weights'],
        'splitpath': str(splitpath),
        'val_conf_strategy': overrides['val_conf_strategy'],
    })
    config['trainer_config']['max_epochs'] = args.epochs
    config['trainer_config']['name'] = 'benchmark-rehearsal'

    out = do_trainrun(config, project_dir=args.out,
                      run_name='benchmark-rehearsal', cache_batches=True)
    history = out['results']['history']
    val = [h for h in history if h['epoch'] >= 2
           and h.get('early_stopping_loss') is not None]
    if not val:   # shorter than the curriculum: no QM epochs to summarize
        print(json.dumps({'epochs_run': len(history),
                          'note': 'no post-curriculum epochs'}))
        return
    best = min(val, key=lambda h: h['early_stopping_loss'])
    summary = {
        'config': 'experiments/benchmark/grappa_config.yaml',
        'overrides': overrides,
        'epochs_run': len(history),
        'first_qm_es_loss': round(val[0]['early_stopping_loss'], 2),
        'best_es_loss': round(best['early_stopping_loss'], 2),
        'best_epoch': best['epoch'],
        'best_val_metrics': {
            k: round(v, 3) for k, v in best['metrics'].get('avg', {}).items()},
    }
    print(json.dumps(summary, indent=1))


if __name__ == '__main__':
    main()
