"""Self-contained smoke experiment: train the small model on synthetic,
exactly-learnable targets and report the metric trajectory. Runs anywhere
(CPU or TPU), no downloads.

Usage: python experiments/smoke/synthetic_smoke.py [--epochs 10]
"""
import argparse
import json

from grappa_tpu.data.dataset import Dataset
from grappa_tpu.data.synthetic import make_dataset
from grappa_tpu.models.grappa_model import get_small_model_config
from grappa_tpu.train.config import default_config, overwrite_config
from grappa_tpu.train.run import do_trainrun


def main():
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=10)
    ap.add_argument('--n-mols', type=int, default=16)
    ap.add_argument('--out', default='runs')
    args = ap.parse_args()

    ds = Dataset.from_moldata(
        make_dataset(n_mols=args.n_mols, n_confs=8, seed=0), 'synthetic')
    config = default_config()
    overwrite_config({
        'model_config': get_small_model_config(),
        'data_config': {'datasets': [], 'conf_strategy': 8,
                        'val_conf_strategy': 8, 'train_batch_size': 4,
                        'partition': [0.75, 0.25, 0.0], 'weights': {},
                        'pure_train_datasets': [], 'pure_val_datasets': []},
        'lit_model_config': {'lr': 3e-4, 'start_qm_epochs': 1,
                             'warmup_steps': 5},
        'trainer_config': {'max_epochs': args.epochs, 'name': 'smoke'},
        'test_model': True,
    }, config)
    out = do_trainrun(config, project_dir=args.out, run_name='synthetic-smoke',
                      dataset_override=ds)
    history = out['results']['history']
    print(json.dumps([
        {'epoch': h['epoch'], 'early_stopping_loss': h['early_stopping_loss']}
        for h in history], indent=1))


if __name__ == '__main__':
    main()
