"""Production-scale Bayesian HPO sweep on the espaloma-proxy benchmark.

Counterpart of the reference's wandb Bayes sweep (reference:
experiments/hyperparameter_optimization/hpo_run.py + sweep_config.yaml —
method: bayes over lr/batch/width; trainrun.py:30-41 config_from_sweep):
GP-EI trials of the benchmark recipe on the four committed proxy datasets,
through the production path (scan_epochs, async checkpoints, curriculum),
each trial budgeted --epochs (default 150 — the point where the round-3
run had clearly separated configs) with finish_criterion early kills.

The sweep is RESUMABLE (run_sweep skips trials recorded in trials.jsonl),
so the chip supervisor can restart it after tunnel drops. Results:
<out>/trials.jsonl + <out>/best.json; summarize with --report, which
writes hpo_summary.md ranking trials and comparing the best trial to the
production defaults.

Usage:
  python experiments/hpo/run_hpo.py [--trials 16] [--epochs 150]
  python experiments/hpo/run_hpo.py --report
"""
import argparse
import json
import os
import sys
from pathlib import Path

HERE = Path(__file__).parent
PROXY = HERE.parent / 'espaloma_proxy'

# dotted-path spec (grappa_tpu.train.sweep format). Ranges bracket the
# production defaults (lr 1.5e-5, batch 32, patience 50, lr_decay 0.8).
SPEC = {
    'lit_model_config.lr': ('log_uniform', 3e-6, 1e-4),
    'data_config.train_batch_size': ('choice', [16, 32, 64]),
    'lit_model_config.patience': ('choice', [10, 25, 50]),
    'lit_model_config.lr_decay': ('uniform', 0.5, 0.9),
}


def build_base_config(epochs):
    from grappa_tpu.train.config import read_yaml
    config = read_yaml(HERE.parent / 'benchmark' / 'grappa_config.yaml')
    config['data_config'].update({
        'datasets': ['proxy-spice-monomers', 'proxy-spice-pubchem',
                     'proxy-peptide', 'proxy-rna-like'],
        'pure_train_datasets': [], 'pure_val_datasets': [],
        'weights': {'proxy-rna-like': 3.0, 'proxy-spice-pubchem': 0.8},
        'splitpath': str(PROXY / 'espaloma_split.json'),
        'conf_strategy': 8, 'val_conf_strategy': 8,
    })
    config['trainer_config'].update({
        'max_epochs': epochs, 'scan_epochs': True,
        'async_checkpoints': True,
    })
    # early kills for clearly-bad configs (hours -> max allowed es_loss):
    # a healthy run is at es_loss ~<30 after ~8 min of training (round-3
    # curve: 397 -> 12 across 150 epochs); 10x off that is hopeless
    config['lit_model_config']['finish_criterion'] = {0.15: 100.0}
    # trials must not eval on the test split (selection happens on val)
    config['test_model'] = False
    return config


def run_hpo(trials=16, epochs=150, out_dir=None, base_config=None,
            spec=None, method='bayes'):
    from grappa_tpu.train.sweep import run_sweep
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    os.environ.setdefault('GRAPPA_TPU_CACHE', str(PROXY / 'cache'))
    out_dir = Path(out_dir or HERE / 'sweep')
    config = base_config or build_base_config(epochs)
    best = run_sweep(config, spec or SPEC, n_trials=trials,
                     sweep_dir=str(out_dir), method=method, n_init=6,
                     max_epochs=epochs, cache_batches=True)
    print(json.dumps(best, indent=1, default=str))
    return best


def report(out_dir=None, path=None):
    """Rank trials and compare the winner to the production defaults."""
    out_dir = Path(out_dir or HERE / 'sweep')
    trials = [json.loads(l) for l in
              (out_dir / 'trials.jsonl').read_text().splitlines()]
    scored = sorted((t for t in trials if 'early_stopping_loss' in t),
                    key=lambda t: t['early_stopping_loss'])
    lines = ['# HPO sweep summary (espaloma-proxy, GP-EI)', '',
             f'{len(trials)} trials ({len(trials) - len(scored)} failed); '
             'val early-stopping loss (3*E RMSE + F RMSE), lower is '
             'better. Production defaults: lr 1.5e-5, batch 32, '
             'patience 50, lr_decay 0.8.', '',
             '| rank | trial | es_loss | params |', '|---|---|---|---|']
    for rank, t in enumerate(scored, 1):
        ps = ', '.join(f'{k.split(".")[-1]}={v:.3g}'
                       if isinstance(v, float) else
                       f'{k.split(".")[-1]}={v}'
                       for k, v in sorted(t['params'].items()))
        lines.append(f'| {rank} | {t["trial"]:03d} | '
                     f'{t["early_stopping_loss"]:.3f} | {ps} |')
    out = Path(path or HERE / 'hpo_summary.md')
    out.write_text('\n'.join(lines) + '\n')
    print(f'wrote {out}')
    return scored


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--trials', type=int, default=16)
    ap.add_argument('--epochs', type=int, default=150)
    ap.add_argument('--out', default=str(HERE / 'sweep'))
    ap.add_argument('--method', default='bayes',
                    choices=['bayes', 'random'])
    ap.add_argument('--report', action='store_true',
                    help='only render hpo_summary.md from trials.jsonl')
    args = ap.parse_args()
    if args.report:
        report(out_dir=args.out)
        return
    run_hpo(trials=args.trials, epochs=args.epochs, out_dir=args.out,
            method=args.method)
    report(out_dir=args.out)


if __name__ == '__main__':
    main()
