"""Where does the espaloma-proxy epoch wall-clock go?

The 500-epoch proxy run measured ~31.6 s/epoch while the scan-epoch train
dispatch itself accounts for ~1-3 s — this probe times every phase of the
real production epoch (same config path as experiments/espaloma_proxy/run.py
train) on the live chip with honest host-fetch endpoints:

  * scan-train epoch (warm)
  * validate() (eval_step + metric reduction per val batch)
  * save_checkpoint best (params only, 40.8M f32 ~ 163 MB)
  * save_checkpoint last (params + Adam state ~ 490 MB)
  * raw tunnel device->host throughput (single 128 MB fetch)

Writes benchmarks/epoch_profile_r4.json. Run with the chip free.
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
    from grappa_tpu.utils import enable_compilation_cache, materialize
    enable_compilation_cache()
    import copy
    import jax
    import jax.numpy as jnp
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

    out = {}
    t0 = time.time()
    train_loader, val_loader, _, _ = get_dataloaders(config['data_config'])
    out['build_loaders_s'] = time.time() - t0
    out['n_train_batches'] = sum(1 for _ in train_loader)
    out['n_val_batches'] = sum(1 for _ in val_loader)

    stats = param_statistics_from_graphs(train_loader.dataset.graphs())
    model = make_model(config['model_config'], stats)
    batch, _ = next(iter(train_loader))
    params = jax.jit(model.init)(jax.random.key(0), batch)
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
    out['n_params'] = int(n_params)

    trainer = Trainer(model, params, train_loader, val_loader,
                      config['lit_model_config'], config['trainer_config'],
                      out_dir='/tmp/epoch_profile_run', full_config=config,
                      seed=0, cache_batches=True)

    # raw tunnel throughput: one big fetch
    big = jnp.zeros((32 * 1024 * 1024,), jnp.float32) + 1.0  # 128 MB
    materialize(big)
    t0 = time.time()
    host = jax.device_get(big)
    dt = time.time() - t0
    out['device_get_128MB_s'] = dt
    out['device_get_MBps'] = 128.0 / dt
    del big, host

    # first (compile) + three warm scan epochs
    t0 = time.time()
    losses = trainer._train_epoch_scan()
    out['scan_epoch_compile_s'] = time.time() - t0
    warm = []
    for _ in range(3):
        t0 = time.time()
        trainer._train_epoch_scan()
        warm.append(time.time() - t0)
    out['scan_epoch_warm_s'] = warm

    # validate: first (compile) + two warm
    t0 = time.time()
    trainer.validate()
    out['validate_compile_s'] = time.time() - t0
    vwarm = []
    for _ in range(2):
        t0 = time.time()
        trainer.validate()
        vwarm.append(time.time() - t0)
    out['validate_warm_s'] = vwarm

    # checkpoint saves
    t0 = time.time()
    trainer.save_checkpoint('/tmp/epoch_profile_run/best.ckpt',
                            include_opt_state=False)
    out['save_best_params_only_s'] = time.time() - t0
    t0 = time.time()
    trainer.save_checkpoint('/tmp/epoch_profile_run/last.ckpt')
    out['save_last_with_opt_s'] = time.time() - t0

    # device_get of the whole param tree in one call (vs per-leaf to_bytes)
    t0 = time.time()
    jax.device_get(trainer.params)
    out['device_get_params_tree_s'] = time.time() - t0

    # modelled per-epoch budget at defaults (ckpt_every=5, best improves
    # every epoch during descent -> one best + one last per 5 epochs)
    warm_ep = float(np.median(warm))
    val_ep = float(np.median(vwarm))
    out['modelled_epoch_s'] = dict(
        train=warm_ep, val=val_ep,
        ckpt_amortized=(out['save_best_params_only_s'] +
                        out['save_last_with_opt_s']) / 5.0,
        total=warm_ep + val_ep + (out['save_best_params_only_s'] +
                                  out['save_last_with_opt_s']) / 5.0,
        observed_500ep_run=31.6)
    print(json.dumps(out, indent=1))
    (HERE / 'epoch_profile_r4.json').write_text(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
