"""Reproducing a training run from a released model (reference:
examples/reproduction/grappa-1-1.py).

Published model files carry the full reproducibility contract: trained
state_dict, the complete training config (including dataset tags) and the
train/val/test molecule ids. Reproduction = extract config + split, point
the config at the stored split, and retrain.

With released checkpoints + benchmark data in the cache this reproduces
grappa-1.2; here it demonstrates the mechanism on the model exported by
examples/training/train_small.py (pass a path or tag as argv[1]).
"""
import json
import sys
import tempfile
from pathlib import Path

from grappa_tpu.train.export import load_model_dict
from grappa_tpu.train.run import do_trainrun
from grappa_tpu.zoo import model_path_from_tag

tag = sys.argv[1] if len(sys.argv) > 1 else 'runs/example-train/model.npz'
model_dict = load_model_dict(model_path_from_tag(tag))

config = model_dict['config']
split_ids = model_dict.get('split_names')
assert split_ids, "model file carries no split — cannot reproduce exactly"

splitpath = Path(tempfile.mkdtemp(prefix='grappa_repro_')) / 'split.json'
splitpath.write_text(json.dumps(split_ids))
config.setdefault('data_config', {})['splitpath'] = str(splitpath)

# demo-only: the example model was trained on an unsaved synthetic dataset,
# so rebuild it; with released models the dataset tags in the config
# resolve through the zoo cache and this override is not needed
dataset_override = None
if not config['data_config'].get('datasets'):
    from grappa_tpu.data.dataset import Dataset
    from grappa_tpu.data.synthetic import make_dataset
    dataset_override = Dataset.from_moldata(
        make_dataset(n_mols=48, n_confs=8, seed=1, learnable=True,
                     conf_noise=0.08), 'synthetic-demo')
    config.setdefault('trainer_config', {})['max_epochs'] = 10  # demo length

out = do_trainrun(config, project_dir='runs', run_name='reproduce-demo',
                  dataset_override=dataset_override, cache_batches=True)
print('reproduction run finished; best early-stopping loss:',
      round(out['results']['best_early_stopping_loss'], 3))
print('same split:', json.loads(splitpath.read_text()).keys())
