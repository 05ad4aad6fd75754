"""Espaloma-benchmark training driver (reference:
experiments/benchmark/train.py:1-34).

Loads grappa_config.yaml, wires the espaloma split (either an existing
espaloma_split.json or one rebuilt from te_smiles.json / vl_smiles.json via
grappa_tpu.espaloma_split), applies batch-size overrides, and launches
do_trainrun. Datasets resolve by tag through the zoo cache
(GRAPPA_TPU_CACHE); with no benchmark data present this exits with
"dataset not found" — drop the converted espaloma datasets (see
grappa_tpu.data.espaloma_pipeline) into the cache to run the full recipe.

Usage:
    python experiments/benchmark/train.py [--project runs/benchmark]
        [-tb N] [-vb N] [--splitpath espaloma_split.json]
        [--te_smiles te.json --vl_smiles vl.json]
"""
import argparse
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--project', type=str, default='runs/benchmark',
                        help='run output directory')
    parser.add_argument('-tb', '--train_batch', type=int, default=-1)
    parser.add_argument('-vb', '--val_batch', type=int, default=-1)
    parser.add_argument('--splitpath', type=str, default=None,
                        help='espaloma split json; default: '
                             'espaloma_split.json next to this script if it '
                             'exists')
    parser.add_argument('--te_smiles', type=str, default=None,
                        help='test smiles json to rebuild the split from')
    parser.add_argument('--vl_smiles', type=str, default=None)
    # sampling-weight scans (reference: experiments/benchmark_experiments/
    # train.py -o/-s + submit_opt_scan.py): upweight the optimization-
    # trajectory datasets (gen2/pepconf-dlc) or the torsion-scan datasets
    # (gen2-torsion/protein-torsion) in the weighted loader
    parser.add_argument('-o', '--opt_weight', type=float, default=1.0,
                        help='sampling weight for the opt datasets')
    parser.add_argument('-s', '--scan_weight', type=float, default=1.0,
                        help='sampling weight for the torsion-scan datasets')
    args = parser.parse_args()

    from grappa_tpu.train.config import read_yaml
    from grappa_tpu.train.run import do_trainrun, load_datasets
    from grappa_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    here = Path(__file__).parent
    config = read_yaml(here / 'grappa_config.yaml')

    splitpath = args.splitpath
    if splitpath is None and (here / 'espaloma_split.json').exists():
        splitpath = str(here / 'espaloma_split.json')

    if splitpath is None and args.te_smiles and args.vl_smiles:
        # rebuild espaloma's partition from the shipped smiles lists
        from grappa_tpu.espaloma_split import (build_espaloma_split,
                                               save_espaloma_split)
        tags = (config['data_config']['datasets']
                + config['data_config'].get('pure_train_datasets', [])
                + config['data_config'].get('pure_val_datasets', []))
        ds = load_datasets(tags)
        split = build_espaloma_split(ds.mol_ids, args.te_smiles,
                                     args.vl_smiles)
        splitpath = str(here / 'espaloma_split.json')
        save_espaloma_split(split, splitpath)

    config['data_config']['splitpath'] = splitpath

    if args.train_batch > 0:
        config['data_config']['train_batch_size'] = args.train_batch
    if args.val_batch > 0:
        config['data_config']['val_batch_size'] = args.val_batch

    name = config['trainer_config'].get('name') or 'benchmark'
    if args.opt_weight != 1.0:
        name += f'_opt{args.opt_weight:g}'
        for d in ('gen2', 'pepconf-dlc'):
            config['data_config']['weights'][d] = args.opt_weight
    if args.scan_weight != 1.0:
        name += f'_scan{args.scan_weight:g}'
        for d in ('gen2-torsion', 'protein-torsion'):
            config['data_config']['weights'][d] = args.scan_weight
    config['trainer_config']['name'] = name

    do_trainrun(config, project_dir=args.project, cache_batches=True)


if __name__ == '__main__':
    main()
