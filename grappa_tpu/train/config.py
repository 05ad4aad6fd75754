"""Training configuration: nested dict with the same four sections and key
names as the reference (reference: src/grappa/training/config.py:30-121), so
yaml configs interchange. Keys that are torch-loader specific (worker counts,
pin_memory) are accepted but ignored.
"""
from __future__ import annotations

from typing import Dict

import yaml

from grappa_tpu.models.grappa_model import get_default_model_config


def default_config() -> Dict:
    data_config = {
        "datasets": [
            "spice-des-monomers", "spice-dipeptide", "spice-pubchem",
            "gen2", "gen2-torsion", "pepconf-dlc", "protein-torsion",
            "rna-diverse",
        ],
        "conf_strategy": 32,
        "val_conf_strategy": 500,
        "train_batch_size": 32,
        "val_batch_size": 32,
        "test_batch_size": 1,
        "seed": 0,
        "splitpath": None,
        "partition": [0.8, 0.1, 0.1],
        "pure_train_datasets": ["rna-nucleoside"],
        "pure_val_datasets": ["rna-trinucleotide"],
        "pure_test_datasets": [],
        "tr_subsampling_factor": None,
        "weights": {
            "rna-diverse": 3.0,
            "rna-nucleoside": 5.0,
            "spice-pubchem": 0.8,
        },
        "balance_factor": 0.0,
    }

    lit_model_config = {
        "lr": 1.5e-5,
        "start_qm_epochs": 2,
        "add_restarts": [],
        "warmup_steps": 500,
        "energy_weight": 1.0,
        "gradient_weight": 0.8,
        "param_weight": 1e-3,
        "proper_regularisation": 1e-3,
        "improper_regularisation": 1e-3,
        "log_train_interval": 5,
        "weight_decay": 0.0,
        "early_stopping_energy_weight": 3.0,
        "patience": 50,
        "lr_decay": 0.8,
        "time_limit": 23.5,
        "finish_criterion": {},
        "param_loss_epochs": None,
        "param_weights_by_dataset": {},
    }

    trainer_config = {
        "max_epochs": 10000,
        "gradient_clip_val": 10.0,
        "early_stopping_criterion": "early_stopping_loss",
        "name": None,
        "notes": None,
        "checkpoint_every": 5,
        # TPU-specific: dropout/shuffle PRNG ('rbg' is ~8% faster per step;
        # 'threefry2x32' reproduces pre-rbg runs bit-for-bit)
        "prng_impl": "rbg",
    }

    return {
        "model_config": get_default_model_config(),
        "data_config": data_config,
        "lit_model_config": lit_model_config,
        "trainer_config": trainer_config,
        "test_model": False,
    }


# dict-valued config entries that are DATA (arbitrary keys), not schema —
# replaced wholesale instead of key-validated recursive merge
_LEAF_DICT_KEYS = {'weights', 'finish_criterion', 'param_weights_by_dataset',
                   'in_feat_dims'}


def overwrite_config(updates: Dict, config: Dict) -> Dict:
    """Recursively apply updates; unknown keys raise."""
    for k, v in updates.items():
        if k not in config:
            raise KeyError(f"Key {k} not in config.")
        if (isinstance(v, dict) and isinstance(config[k], dict)
                and k not in _LEAF_DICT_KEYS):
            overwrite_config(v, config[k])
        else:
            config[k] = v
    return config


def validate_config(config: Dict):
    default = default_config()
    unknown = set(config) - set(default)
    if unknown:
        raise KeyError(f"unknown top-level config keys: {sorted(unknown)}")


def write_yaml(config: Dict, path):
    with open(path, 'w') as f:
        yaml.safe_dump(config, f, sort_keys=False)


def read_yaml(path) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f)
