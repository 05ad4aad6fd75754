"""Local hyperparameter sweeps (random search).

The reference runs wandb Bayes sweeps over lr/batch/width/layers (reference:
experiments/hyperparameter_optimization/sweep_config.yaml + hpo_run.py via
the config_from_sweep hook, trainrun.py:30-41). This is an offline-first
equivalent: a sweep spec maps dotted config paths to value distributions;
each trial runs do_trainrun with a short budget and the results stream into
<sweep_dir>/trials.jsonl. The `finish_criterion` mechanism of the trainer
kills unpromising trials early, like the reference's sweep runs.

Spec example:
    spec = {
        'lit_model_config.lr': ('log_uniform', 1e-5, 1e-3),
        'model_config.gnn_width': ('choice', [256, 512]),
        'data_config.train_batch_size': ('choice', [16, 32, 64]),
    }
"""
from __future__ import annotations

import copy
import json
import traceback
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


def sample_value(rng: np.random.Generator, dist: Tuple):
    kind = dist[0]
    if kind == 'choice':
        values = dist[1]
        return values[int(rng.integers(len(values)))]
    if kind == 'uniform':
        return float(rng.uniform(dist[1], dist[2]))
    if kind == 'log_uniform':
        return float(np.exp(rng.uniform(np.log(dist[1]), np.log(dist[2]))))
    if kind == 'int_uniform':
        return int(rng.integers(dist[1], dist[2] + 1))
    raise ValueError(f"unknown distribution {kind!r}")


def set_dotted(config: Dict, path: str, value):
    keys = path.split('.')
    node = config
    for k in keys[:-1]:
        node = node[k]
    if keys[-1] not in node:
        raise KeyError(f"config has no key {path!r}")
    node[keys[-1]] = value


def run_sweep(base_config: Dict, spec: Dict[str, Tuple], n_trials: int,
              sweep_dir: str = 'sweeps/sweep', seed: int = 0,
              dataset_override=None,
              max_epochs: Optional[int] = None) -> Dict:
    """Random-search sweep; returns the best trial summary."""
    from grappa_tpu.train.run import do_trainrun

    sweep_dir = Path(sweep_dir)
    sweep_dir.mkdir(parents=True, exist_ok=True)
    log_path = sweep_dir / 'trials.jsonl'
    rng = np.random.default_rng(seed)

    best = {'trial': None, 'early_stopping_loss': float('inf')}
    with open(log_path, 'a') as log:
        for trial in range(n_trials):
            config = copy.deepcopy(base_config)
            sampled = {path: sample_value(rng, dist)
                       for path, dist in spec.items()}
            for path, value in sampled.items():
                set_dotted(config, path, value)
            if max_epochs is not None:
                config['trainer_config']['max_epochs'] = max_epochs
            config['trainer_config']['name'] = f'trial_{trial:03d}'

            record = {'trial': trial, 'params': sampled}
            try:
                out = do_trainrun(config, project_dir=str(sweep_dir),
                                  run_name=f'trial_{trial:03d}',
                                  dataset_override=dataset_override)
                loss = out['results'].get('best_early_stopping_loss',
                                          float('inf'))
                record['early_stopping_loss'] = loss
                record['epochs'] = out['results'].get('epochs')
                if loss < best['early_stopping_loss']:
                    best = {'trial': trial, 'params': sampled,
                            'early_stopping_loss': loss,
                            'run_dir': out['run_dir']}
            except Exception as exc:
                record['error'] = f'{type(exc).__name__}: {exc}'
                traceback.print_exc()
            log.write(json.dumps(record) + '\n')
            log.flush()
    (sweep_dir / 'best.json').write_text(json.dumps(best, indent=1))
    return best
