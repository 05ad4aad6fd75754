"""A complete small training run (reference: examples/training/
train_peptides.py). Uses synthetic data so it runs without downloaded
datasets; swap `dataset_override` for real tags in the config when data is
in the cache. Takes a few minutes on one chip (or CPU).

The config machinery is identical to the production recipe
(experiments/benchmark/grappa_config.yaml): four yaml sections, curriculum
(classical-parameter epochs first, then QM energy+force), warmup, plateau
decay, best/last checkpoints, model_dict export.
"""
from grappa_tpu.data.dataset import Dataset
from grappa_tpu.data.synthetic import make_dataset
from grappa_tpu.models.grappa_model import get_small_model_config
from grappa_tpu.train.config import default_config, overwrite_config
from grappa_tpu.train.run import do_trainrun
from grappa_tpu.utils import enable_compilation_cache

enable_compilation_cache()

dataset = Dataset.from_moldata(
    make_dataset(n_mols=48, n_confs=8, seed=1, learnable=True,
                 conf_noise=0.08),
    'synthetic-demo')

config = default_config()
overwrite_config({
    'model_config': get_small_model_config(),    # full size: omit this line
    'data_config': {'datasets': [], 'train_batch_size': 8,
                    'conf_strategy': 8, 'val_conf_strategy': 8,
                    'partition': [0.85, 0.15, 0.0]},
    'lit_model_config': {'lr': 5e-4, 'start_qm_epochs': 2,
                         'warmup_steps': 20, 'patience': 30},
    'trainer_config': {'max_epochs': 40, 'name': 'example-train'},
    'test_model': True,
}, config)

out = do_trainrun(config, project_dir='runs', run_name='example-train',
                  dataset_override=dataset, cache_batches=True)
print('best early-stopping loss:',
      round(out['results']['best_early_stopping_loss'], 3))
print('exported model:', out['model_dict_path'])
# resume later: from grappa_tpu.train.run import resume_trainrun
# resume_trainrun('runs/example-train')
