"""Does async checkpoint streaming actually overlap with training on the
axon tunnel?

Builds the real proxy trainer (same path as epoch_profile.py), turns on
async_checkpoints, and measures per-epoch wall clock WHILE a full
params+Adam last.ckpt (~490 MB, ~86 s synchronous) streams out in the
background. If the tunnel serializes RPCs, the epochs stall behind the
transfer and the async design must switch to cooperative chunking.

Writes benchmarks/async_ckpt_probe_r4.json.
"""
import json
import time
from pathlib import Path

HERE = Path(__file__).parent
REPO = HERE.parent
PROXY = REPO / 'experiments' / 'espaloma_proxy'


def main():
    import os
    os.environ['GRAPPA_TPU_CACHE'] = str(PROXY / 'cache')
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np
    from grappa_tpu.train.config import read_yaml
    from grappa_tpu.train.run import get_dataloaders
    from grappa_tpu.models.grappa_model import make_model
    from grappa_tpu.statistics import param_statistics_from_graphs
    from grappa_tpu.train.trainer import Trainer

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'proxy_run', PROXY / 'run.py')
    proxy_run = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(proxy_run)

    config = read_yaml(REPO / 'experiments' / 'benchmark' /
                       'grappa_config.yaml')
    config['data_config'].update({
        'datasets': sorted(proxy_run.SPECS),
        'pure_train_datasets': [], 'pure_val_datasets': [],
        'weights': {'proxy-rna-like': 3.0, 'proxy-spice-pubchem': 0.8},
        'splitpath': str(PROXY / 'espaloma_split.json'),
        'conf_strategy': 8, 'val_conf_strategy': 8,
    })
    config['trainer_config']['scan_epochs'] = True
    config['trainer_config']['async_checkpoints'] = True

    train_loader, val_loader, _, _ = get_dataloaders(config['data_config'])
    stats = param_statistics_from_graphs(train_loader.dataset.graphs())
    model = make_model(config['model_config'], stats)
    batch, _ = next(iter(train_loader))
    params = jax.jit(model.init)(jax.random.key(0), batch)
    trainer = Trainer(model, params, train_loader, val_loader,
                      config['lit_model_config'], config['trainer_config'],
                      out_dir='/tmp/async_ckpt_probe', full_config=config,
                      seed=0, cache_batches=True)

    out = {}
    # warm compiles
    trainer._train_epoch_scan()
    trainer.validate()

    # baseline: 3 epochs with NO checkpoint in flight
    base = []
    for _ in range(3):
        t0 = time.time()
        trainer._train_epoch_scan()
        trainer.validate()
        base.append(round(time.time() - t0, 3))
    out['epoch_s_no_ckpt'] = base

    # async full save, then epochs until the writer finishes
    t_save0 = time.time()
    assert trainer.save_checkpoint('/tmp/async_ckpt_probe/last.ckpt') is True
    out['async_save_call_s'] = round(time.time() - t_save0, 3)
    during, n = [], 0
    while trainer._ckpt_thread.is_alive() and n < 60:
        t0 = time.time()
        trainer._train_epoch_scan()
        trainer.validate()
        during.append(round(time.time() - t0, 3))
        n += 1
    t_done = time.time() - t_save0
    trainer._join_ckpt_thread()
    out['epoch_s_during_write'] = during
    out['epochs_during_write'] = n
    out['write_wall_s'] = round(t_done, 1)
    out['sync_write_reference_s'] = 85.7   # epoch_profile_r4.json
    out['median_epoch_no_ckpt'] = float(np.median(base))
    out['median_epoch_during'] = float(np.median(during)) if during else None
    out['verdict'] = (
        'OVERLAPS' if during and np.median(during) < 2.0 * np.median(base)
        else 'SERIALIZES')
    print(json.dumps(out, indent=1))
    (HERE / 'async_ckpt_probe_r4.json').write_text(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
