"""Model packaging: the `.pth` model_dict reproducibility contract.

Published models are a single file carrying everything needed to reproduce
them: {state_dict, config, split_names[, results, ds_size]} — the same dict
layout the reference exports and downloads (reference: src/grappa/training/
export_model.py:48-123 and utils/loading_utils.py:7-86). The state_dict uses
the reference's torch module naming (grappa_tpu.train.torch_compat), so the
file is loadable from either framework. torch (CPU) does the (de)serialization
when available; a pure-numpy `.npz` fallback covers torch-free environments.
"""
from __future__ import annotations

import importlib
import json
from pathlib import Path
from typing import Dict, Optional, Union

import numpy as np

from grappa_tpu.train.torch_compat import (
    export_state_dict, import_state_dict, stats_from_model)


def _have_torch() -> bool:
    return importlib.util.find_spec('torch') is not None


def build_model_dict(params: Dict, config: Dict,
                     split_names: Optional[Dict] = None,
                     results: Optional[Dict] = None,
                     ds_size: Optional[Dict] = None,
                     model=None) -> Dict:
    """Pass the GrappaModel as `model` to embed its scaler statistics as
    buffers (required for the checkpoint to be self-contained)."""
    stats = stats_from_model(model) if model is not None else None
    state_dict = export_state_dict(params, config.get('model_config', config),
                                   stats=stats)
    d = {'state_dict': state_dict, 'config': config,
         'split_names': split_names or {}}
    if results is not None:
        d['results'] = results
    if ds_size is not None:
        d['ds_size'] = ds_size
    return d


def save_model_dict(model_dict: Dict, path: Union[str, Path]):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.suffix == '.pth':
        if not _have_torch():
            raise RuntimeError(".pth export requires torch; use .npz instead")
        import torch
        torch.save(model_dict, path)
    elif path.suffix == '.npz':
        arrays = {f'state_dict/{k}': np.asarray(v)
                  for k, v in model_dict['state_dict'].items()}
        meta = {k: v for k, v in model_dict.items() if k != 'state_dict'}
        np.savez(path, __meta__=np.array(json.dumps(meta)), **arrays)
    else:
        raise ValueError(f"unknown model file suffix: {path.suffix}")


def load_model_dict(path: Union[str, Path]) -> Dict:
    path = Path(path)
    if path.suffix == '.pth':
        import torch
        return torch.load(path, map_location='cpu', weights_only=False)
    if path.suffix == '.npz':
        with np.load(path, allow_pickle=False) as data:
            meta = json.loads(str(data['__meta__']))
            prefix = 'state_dict/'
            state_dict = {k[len(prefix):]: data[k] for k in data.files
                          if k.startswith(prefix)}
        return {'state_dict': state_dict, **meta}
    raise ValueError(f"unknown model file suffix: {path.suffix}")


def model_from_dict(model_dict: Dict):
    """model_dict -> (model, params, config). The scaler statistics come from
    the checkpoint buffers when present, else from the stored config."""
    from grappa_tpu.models.grappa_model import make_model
    config = model_dict['config']
    model_config = config.get('model_config', config)
    sd = model_dict['state_dict']
    params, stats = import_state_dict(sd, model_config,
                                      require_buffers=False)
    if stats is not None:
        model = make_model(model_config, stats, eps_applied=True)
    else:
        # buffer-less checkpoint: scalers fall back to the stored config's
        # default statistics
        model = make_model(model_config)
    return model, params, config
