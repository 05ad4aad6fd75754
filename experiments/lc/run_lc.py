"""Learning-curve benchmark (reference: experiments/benchmark_experiments/
submit_lc.py + experiments/evaluation/lc_benchmark/make_data_dict.py).

Trains the benchmark recipe at several train-set subsampling factors
(reference factors: 0.75/0.5/0.25/0.1/0.05/0.01 via --shrink_train) and
collects per-subdataset bootstrap test metrics + the number of training
molecules into lc_results.json — the input of plot.py, which renders the
test-RMSE-vs-train-molecules learning curve the paper reports.

By default reuses the espaloma-proxy datasets + committed split json
(experiments/espaloma_proxy/) so the curve is reproducible offline; any
cached dataset tags work via --datasets.

Usage:
  python experiments/lc/run_lc.py [--factors 1.0 0.5 0.25 0.1]
                                  [--epochs 60] [--out runs/lc]
"""
import argparse
import json
import os
from pathlib import Path

HERE = Path(__file__).parent
PROXY = HERE.parent / 'espaloma_proxy'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--factors', type=float, nargs='+',
                    default=[1.0, 0.5, 0.25, 0.1, 0.05])
    ap.add_argument('--epochs', type=int, default=60)
    ap.add_argument('--out', default=str(HERE / 'runs'))
    ap.add_argument('--datasets', nargs='+', default=None,
                    help='dataset tags (default: the espaloma-proxy four)')
    ap.add_argument('--splitpath', default=None)
    ap.add_argument('--results', default=str(HERE / 'lc_results.json'))
    args = ap.parse_args()

    run_lc(factors=args.factors, epochs=args.epochs, out_dir=args.out,
           datasets=args.datasets, splitpath=args.splitpath,
           results_path=args.results)


def run_lc(factors, epochs, out_dir, datasets=None, splitpath=None,
           results_path=None, config=None):
    from grappa_tpu.train.config import read_yaml
    from grappa_tpu.train.export import load_model_dict
    from grappa_tpu.train.run import do_trainrun, resume_trainrun
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    if datasets is None:
        os.environ.setdefault('GRAPPA_TPU_CACHE', str(PROXY / 'cache'))
        datasets = ['proxy-spice-monomers', 'proxy-spice-pubchem',
                    'proxy-peptide', 'proxy-rna-like']
        splitpath = splitpath or str(PROXY / 'espaloma_split.json')

    if config is None:
        config = read_yaml(HERE.parent / 'benchmark' / 'grappa_config.yaml')
        config['data_config'].update({
            'datasets': datasets,
            'pure_train_datasets': [], 'pure_val_datasets': [],
            'weights': {},
            'conf_strategy': 8, 'val_conf_strategy': 8,
        })
        if splitpath:
            config['data_config']['splitpath'] = splitpath
        # one dispatch per epoch — the tunneled chip is dispatch-bound —
        # and background-streamed checkpoints (sync saves at ~6 MB/s were
        # ~90% of the epoch wall clock, PERF.md round-4c)
        config['trainer_config']['scan_epochs'] = True
        config['trainer_config']['async_checkpoints'] = True
    config['trainer_config']['max_epochs'] = epochs

    results_path = Path(results_path or HERE / 'lc_results.json')
    results = (json.loads(results_path.read_text())
               if results_path.exists() else {})

    for factor in factors:
        key = f'lc_{factor:g}'
        if key in results:
            print(f'{key}: cached')
            continue
        cfg = json.loads(json.dumps(config))   # deep copy
        if factor < 1.0:
            cfg['data_config']['tr_subsampling_factor'] = factor
        cfg['trainer_config']['name'] = key
        run_dir = Path(out_dir) / key
        if (run_dir / 'last.ckpt').exists():
            # a supervisor-killed / tunnel-dropped factor picks up where it
            # stopped instead of rerunning up to 500 epochs from scratch
            print(f'{key}: resuming interrupted run from {run_dir}')
            out = resume_trainrun(str(run_dir), cache_batches=True)
        else:
            out = do_trainrun(cfg, project_dir=out_dir, run_name=key,
                              cache_batches=True)
        md = load_model_dict(out['model_dict_path'])
        # exact number of molecules actually trained on (after subsampling)
        n_train = len(out['trainer'].train_loader.dataset)
        entry = {'train_mols': int(n_train),
                 'subsampling_factor': factor,
                 'test': (md.get('results') or {}).get('test')}
        results[key] = entry
        results_path.write_text(json.dumps(results, indent=1))
        print(f'{key}: train_mols={entry["train_mols"]}')
    print(f'wrote {results_path}')
    return results


if __name__ == '__main__':
    main()
