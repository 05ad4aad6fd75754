"""Convergence check of the FULL default-size model on synthetic learnable
targets (TPU): energy/force RMSE must drop toward the float32 noise floor,
demonstrating the complete training system (curriculum, schedule, loss,
double-backward) optimizes the real architecture end-to-end.

Usage: python experiments/smoke/tpu_convergence.py [--epochs 60]
"""
import argparse
import json

from grappa_tpu.data.dataset import Dataset
from grappa_tpu.data.synthetic import make_dataset
from grappa_tpu.models.grappa_model import get_default_model_config
from grappa_tpu.train.config import default_config, overwrite_config
from grappa_tpu.train.run import do_trainrun


def main():
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=60)
    ap.add_argument('--n-mols', type=int, default=96)
    ap.add_argument('--out', default='runs')
    ap.add_argument('--compute-dtype', default='float32',
                    choices=['float32', 'bfloat16'],
                    help='matmul compute dtype (bf16 accuracy validation)')
    ap.add_argument('--gnn-dtype', default=None,
                    choices=['float32', 'bfloat16'],
                    help='override GNN stage dtype (bf16-tax diagnosis)')
    ap.add_argument('--heads-dtype', default=None,
                    choices=['float32', 'bfloat16'],
                    help='override tuple-head stage dtype')
    ap.add_argument('--scan-epochs', action='store_true',
                    help='one dispatch per epoch (production dispatch mode; '
                         'much faster through the tunnel)')
    ap.add_argument('--name', default=None)
    args = ap.parse_args()

    ds = Dataset.from_moldata(
        make_dataset(n_mols=args.n_mols, n_confs=16, seed=7,
                     learnable=True, conf_noise=0.08), 'synthetic')

    model_cfg = get_default_model_config()
    # full architecture, but light dropout: this is a fitting-capacity check
    model_cfg.update({
        'gnn_dropout_attention': 0.0, 'gnn_dropout_final': 0.0,
        'parameter_dropout': 0.0, 'compute_dtype': args.compute_dtype,
        'gnn_compute_dtype': args.gnn_dtype,
        'heads_compute_dtype': args.heads_dtype,
    })
    config = default_config()
    overwrite_config({
        'model_config': model_cfg,
        'data_config': {'datasets': [], 'conf_strategy': 16,
                        'val_conf_strategy': 16, 'train_batch_size': 16,
                        'partition': [0.85, 0.15, 0.0], 'weights': {},
                        'pure_train_datasets': [], 'pure_val_datasets': []},
        'lit_model_config': {'lr': 5e-5, 'start_qm_epochs': 2,
                             'warmup_steps': 200, 'patience': 600,
                             'lr_decay': 0.7},
        'trainer_config': {'max_epochs': args.epochs,
                           'checkpoint_every': 200,
                           'scan_epochs': bool(args.scan_epochs),
                           'async_checkpoints': True,
                           'name': 'tpu-convergence'},
        'test_model': True,
    }, config)
    run_name = args.name or ('tpu-convergence' if args.compute_dtype ==
                             'float32' else 'tpu-convergence-bf16')
    out = do_trainrun(config, project_dir=args.out,
                      run_name=run_name, dataset_override=ds,
                      cache_batches=True)
    history = out['results']['history']
    series = [{'epoch': h['epoch'],
               'es_loss': round(h['early_stopping_loss'], 3),
               'e_rmse': round(h['metrics'].get('avg', {}).get(
                   'rmse_energies', float('nan')), 3),
               'f_rmse': round(h['metrics'].get('avg', {}).get(
                   'rmse_gradients', float('nan')), 3)}
              for h in history]
    print(json.dumps(series[-10:], indent=1))
    first = next(s for s in series if s['epoch'] >= 2)
    print(json.dumps({'first_qm_epoch': first, 'last': series[-1]}))


if __name__ == '__main__':
    main()
