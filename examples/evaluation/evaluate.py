"""Evaluating a model on dataset directories (reference:
examples/evaluation/evaluate_peptides.py + the grappa_eval CLI).

Computes per-dataset RMSE/MAE/cRMSE with bootstrap confidence intervals,
optional classical-FF comparison columns, parameter scatter/violin plots,
and writes the results back into the model file (the reference
`grappa_eval` contract). Run examples/training/train_small.py first to
produce a model, or point at any exported .pth/.npz.
"""
import json
import sys
from pathlib import Path

from grappa_tpu.cli import main

model = sys.argv[1] if len(sys.argv) > 1 else 'runs/example-train/model.npz'
dataset_dir = sys.argv[2] if len(sys.argv) > 2 else None

if dataset_dir is None:
    # build a held-out synthetic dataset to evaluate on
    import tempfile
    from grappa_tpu.data.dataset import Dataset
    from grappa_tpu.data.synthetic import make_dataset
    dataset_dir = tempfile.mkdtemp(prefix='grappa_evalds_')
    Dataset.from_moldata(
        make_dataset(n_mols=12, n_confs=8, seed=99, learnable=True,
                     conf_noise=0.08), 'heldout').save(dataset_dir)

out_json = Path('eval_results.json')
# --set all: evaluate every molecule in the given datasets. With released
# benchmark models, omit it to restrict to the model's stored TEST split
# (the published-number protocol).
rc = main(['eval', '-t', model, '-d', dataset_dir, '--set', 'all',
           '--n-bootstrap', '200', '-o', str(out_json),
           '--plots', 'eval_plots'])
assert rc == 0
results = json.loads(out_json.read_text())
for ds, metrics in results['grappa_tpu'].items():
    lo, hi = metrics['rmse_energies_ci']
    print(f"{ds}: energy RMSE {metrics['rmse_energies']:.3f} "
          f"[{lo:.3f}, {hi:.3f}]  force cRMSE "
          f"{metrics['crmse_gradients']:.3f} kcal/mol/A")
print("plots in eval_plots/; results also stored inside the model file")
