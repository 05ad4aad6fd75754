"""On-chip ablation benchmark on the espaloma-proxy datasets.

Counterpart of the reference's ablation experiments (reference:
experiments/ablation/train.py — the driver — and the published ablation
table behind it): trains matched sibling runs that differ in exactly one
architectural flag and compares held-out bootstrap test metrics, turning
the central architecture claims (notably the improper-permutation
symmetry, reference interaction_parameters.py:408-418, 496-507) from
design assertions into measured effects.

Arms (extensible via --arms; flag surface = ablation/train.py):
  baseline          the benchmark recipe unchanged
  wrong_symmetry    espaloma-style (incorrect) improper permutations
  no_gnn_attention  attentional GNN layers replaced by convolutions

Each arm trains --epochs (default 500) on the four espaloma-proxy
datasets + committed split through the full production path (scan_epochs,
async checkpoints, curriculum, plateau schedule), then bootstrap test
eval. Per-arm results accumulate idempotently in ablation_results.json
(an interrupted arm resumes from last.ckpt; a completed arm is skipped),
and a comparison table is rendered to ablation_table.md.

Usage:
  python experiments/ablation/run_ablation.py [--epochs 500]
      [--arms baseline wrong_symmetry] [--time_limit HOURS]
"""
import argparse
import json
import os
import sys
from pathlib import Path

HERE = Path(__file__).parent
PROXY = HERE.parent / 'espaloma_proxy'

ARMS = {
    'baseline': [],
    'wrong_symmetry': ['--wrong_symmetry'],
    'no_gnn_attention': ['--no_gnn_attention'],
}


def run_ablation(arms=None, epochs=500, out_dir=None, results_path=None,
                 base_config=None, time_limit=None, datasets=None,
                 splitpath=None):
    """Train every requested arm (skipping cached ones) and collect
    per-subdataset bootstrap test metrics. `base_config` exists so the
    whole flow is CPU-smoke-testable at tiny scale before a chip run
    commits hours to it (tests/test_experiments.py)."""
    sys.path.insert(0, str(HERE.parent))
    from ablation.train import ablated_config, build_parser
    from grappa_tpu.train.config import (default_config, overwrite_config,
                                         read_yaml)
    from grappa_tpu.train.export import load_model_dict
    from grappa_tpu.train.run import do_trainrun, resume_trainrun
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    os.environ.setdefault('GRAPPA_TPU_CACHE', str(PROXY / 'cache'))

    arms = list(arms or ARMS)
    out_dir = Path(out_dir or HERE / 'runs')
    results_path = Path(results_path or HERE / 'ablation_results.json')
    results = (json.loads(results_path.read_text())
               if results_path.exists() else {})

    for arm in arms:
        if results.get(arm, {}).get('test'):
            print(f'{arm}: cached')
            continue
        if base_config is not None:
            config = json.loads(json.dumps(base_config))
        else:
            config = overwrite_config(
                read_yaml(HERE.parent / 'benchmark' / 'grappa_config.yaml'),
                default_config())
        config = ablated_config(config, build_parser().parse_args(ARMS[arm]))
        config['data_config'].update({
            'datasets': list(datasets) if datasets else [
                'proxy-spice-monomers', 'proxy-spice-pubchem',
                'proxy-peptide', 'proxy-rna-like'],
            'pure_train_datasets': [], 'pure_val_datasets': [],
            'weights': {'proxy-rna-like': 3.0, 'proxy-spice-pubchem': 0.8},
            'splitpath': str(splitpath or PROXY / 'espaloma_split.json'),
            'conf_strategy': 8, 'val_conf_strategy': 8,
        })
        run_name = f'abl-{arm}'
        config['trainer_config'].update({
            'max_epochs': epochs, 'name': run_name,
            'scan_epochs': True, 'async_checkpoints': True,
        })
        if time_limit is not None:
            # per-session bound (cumulative time_limit would make a
            # resumed bounded run exit immediately — see espaloma_proxy)
            config['lit_model_config']['session_time_limit'] = float(
                time_limit)
        run_dir = out_dir / run_name
        if (run_dir / 'last.ckpt').exists():
            print(f'{arm}: resuming interrupted run from {run_dir}')
            out = resume_trainrun(str(run_dir), cache_batches=True)
        else:
            out = do_trainrun(config, project_dir=str(out_dir),
                              run_name=run_name, cache_batches=True)
        md = load_model_dict(out['model_dict_path'])
        history = out['results'].get('history', [])
        results[arm] = {
            'flags': ARMS[arm],
            'epochs': out['results'].get('epochs'),
            'best_es_loss': min(
                (h['early_stopping_loss'] for h in history
                 if h.get('early_stopping_loss') is not None), default=None),
            'test': (md.get('results') or {}).get('test'),
        }
        results_path.write_text(json.dumps(results, indent=1))
        print(f'{arm}: done (epochs={results[arm]["epochs"]})')

    write_table(results, results_path.parent / 'ablation_table.md')
    return results


def write_table(results, path):
    """Markdown comparison: arms x datasets, E RMSE and F cRMSE with
    bootstrap CIs, deltas vs the baseline arm."""
    base = (results.get('baseline') or {}).get('test') or {}
    datasets = sorted(d for d in (base or next(
        (r['test'] for r in results.values() if r.get('test')), {})) if
        d != 'avg')
    lines = ['# Ablation results (espaloma-proxy, held-out test)',
             '',
             'E RMSE kcal/mol, F cRMSE kcal/mol/Å; [bootstrap 95% CI]; '
             'Δ vs baseline in parentheses.',
             '']
    header = '| arm | ' + ' | '.join(
        f'{d} E / cF' for d in datasets) + ' |'
    lines += [header, '|' + '---|' * (len(datasets) + 1)]

    def fmt(m, key, base_m):
        v = m.get(key)
        if v is None:
            return 'n/a'
        ci = m.get(key + '_ci')
        s = f'{v:.2f}'
        if ci:
            s += f' [{ci[0]:.2f},{ci[1]:.2f}]'
        if base_m and base_m.get(key) is not None and m is not base_m:
            s += f' ({v - base_m[key]:+.2f})'
        return s

    for arm, r in results.items():
        test = r.get('test') or {}
        cells = []
        for d in datasets:
            m, bm = test.get(d, {}), base.get(d, {})
            cells.append(fmt(m, 'rmse_energies', bm) + ' / '
                         + fmt(m, 'crmse_gradients', bm))
        lines.append(f'| {arm} | ' + ' | '.join(cells) + ' |')
    Path(path).write_text('\n'.join(lines) + '\n')
    print(f'wrote {path}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--arms', nargs='+', default=list(ARMS),
                    choices=list(ARMS))
    ap.add_argument('--epochs', type=int, default=500)
    ap.add_argument('--out', default=str(HERE / 'runs'))
    ap.add_argument('--results', default=str(HERE / 'ablation_results.json'))
    ap.add_argument('--time_limit', type=float, default=None,
                    help='per-arm wall-clock bound in hours (resumable)')
    args = ap.parse_args()
    run_ablation(arms=args.arms, epochs=args.epochs, out_dir=args.out,
                 results_path=args.results, time_limit=args.time_limit)


if __name__ == '__main__':
    main()
