"""Training orchestration entry point: config -> dataloaders -> statistics ->
model -> Trainer -> fitted checkpoint + exported model_dict.

Reproduces the reference orchestrator (reference: src/grappa/training/
trainrun.py:24-191 `do_trainrun`/`safe_trainrun` and get_dataloaders.py:9-189):
dataset tag/path resolution, feature pruning, split load-or-compute (+ json
persistence), pure train/val/test datasets that bypass the mol-id split,
subsampling, per-subdataset sampling weights, a one-batch non-NaN smoke test
(`test_model`), and one automatic restart from last.ckpt on failure.
"""
from __future__ import annotations

import json
import traceback
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from grappa_tpu.data.dataset import (
    Dataset, calc_split_ids, load_split, save_split)
from grappa_tpu.data.loader import GraphLoader
from grappa_tpu.models.grappa_model import make_model
from grappa_tpu.statistics import param_statistics_from_graphs
from grappa_tpu.train.config import validate_config, write_yaml
from grappa_tpu.train.export import build_model_dict, save_model_dict
from grappa_tpu.train.logging import MetricLogger
from grappa_tpu.train.trainer import Trainer
from grappa_tpu.zoo import dataset_path_from_tag


def load_datasets(tags: List[str]) -> Dataset:
    """Resolve tags/paths to dataset directories and concatenate."""
    parts = []
    for tag in tags:
        path = dataset_path_from_tag(tag)
        ds = Dataset.load(path)
        # tag becomes the subdataset name unless the manifest already set one
        if len(set(ds.ds_names)) == 1 and ds.ds_names and (
                ds.ds_names[0] in ('dataset', '')):
            ds.ds_names = [Path(str(tag)).name] * len(ds)
        parts.append(ds)
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    return total


def resolve_splitpath(splitpath) -> Path:
    """A splitpath may be a json file or a dataset-zoo tag (reference
    get_dataloaders.py:91-99: non-existent paths are resolved as tags whose
    cached directory holds a split.json, e.g. splitpath='espaloma_split').

    Candidate jsons must actually contain a train/val/test partition —
    otherwise an unrelated json in the tag directory (e.g. a dataset
    manifest) would be accepted and yield a silent fresh random split."""
    def _is_split(path: Path) -> bool:
        try:
            d = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            return False
        return isinstance(d, dict) and any(
            k in d for k in ('train', 'val', 'test'))

    path = Path(splitpath)
    if path.exists():
        return path
    tag_path = Path(dataset_path_from_tag(str(splitpath)))
    candidates = [tag_path / 'split.json', tag_path / 'espaloma_split.json']
    candidates += sorted(tag_path.glob('*.json'))
    for cand in candidates:
        if cand.exists() and _is_split(cand):
            return cand
    raise FileNotFoundError(
        f"splitpath {splitpath!r} is neither a file nor a tag directory "
        f"containing a split json with train/val/test keys ({tag_path})")


def get_dataloaders(data_config: Dict, run_dir: Optional[Path] = None
                    ) -> Tuple[GraphLoader, GraphLoader, GraphLoader, Dict]:
    """Build train/val/test loaders according to the data config."""
    cfg = data_config
    ds = load_datasets(cfg['datasets']) if cfg['datasets'] else Dataset([], [])
    if len(ds):
        ds.remove_uncommon_features()

    # split by molecule ids
    ids_by_ds = {}
    for e, name in zip(ds.entries, ds.ds_names):
        ids_by_ds.setdefault(name, []).append(e.mol_id)
    existing = None
    if cfg.get('splitpath'):
        # a stored split assigns its ids; molecules it does not cover are
        # split by the usual per-dataset partition (reference
        # get_dataloaders.py:100-103 extends via existing_split — without
        # this, datasets absent from e.g. the espaloma split json would be
        # silently dropped)
        existing = load_split(resolve_splitpath(cfg['splitpath']))
    split = calc_split_ids(ids_by_ds, tuple(cfg.get('partition',
                                                    (0.8, 0.1, 0.1))),
                           seed=cfg.get('seed', 0),
                           existing_split=existing)
    if run_dir is not None:
        save_split(split, Path(run_dir) / 'split.json')

    tr, vl, te = ds.split(split['train'], split['val'], split['test'])

    # pure datasets bypass the mol-id split entirely
    for key, target in (('pure_train_datasets', 'tr'),
                        ('pure_val_datasets', 'vl'),
                        ('pure_test_datasets', 'te')):
        for tag in cfg.get(key, []) or []:
            try:
                extra = load_datasets([tag])
            except (FileNotFoundError, RuntimeError, KeyError) as exc:
                # pure datasets are auxiliary; missing ones are skipped
                # LOUDLY (the new zoo path raises RuntimeError offline)
                print(f"skipping pure dataset {tag!r}: {exc}")
                continue
            extra.remove_uncommon_features()
            if target == 'tr':
                tr = tr + extra
            elif target == 'vl':
                vl = vl + extra
            else:
                te = te + extra

    if cfg.get('tr_subsampling_factor') is not None:
        tr = tr.subsampled(cfg['tr_subsampling_factor'],
                           seed=cfg.get('seed', 0))

    train_loader = GraphLoader(
        tr, batch_size=cfg.get('train_batch_size', 32),
        conf_strategy=cfg.get('conf_strategy', 32), shuffle=True,
        weights=cfg.get('weights', {}),
        balance_factor=cfg.get('balance_factor', 0.0),
        seed=cfg.get('seed', 0), drop_last=True)
    val_loader = GraphLoader(
        vl, batch_size=cfg.get('val_batch_size', 32),
        conf_strategy=cfg.get('val_conf_strategy', 500), shuffle=False) \
        if len(vl) else None
    # fixed_pad: ONE compiled eval program for the whole test pass instead
    # of one XLA compile per bucketed per-molecule shape — through the
    # remote-compile path each compile costs 10s-3min, dwarfing the eval
    # itself; padding is metric-neutral (masked reductions, equivalence
    # tested in test_training.py::test_test_eval_fixed_pad_matches_bucketed)
    test_loader = GraphLoader(
        te, batch_size=cfg.get('test_batch_size', 1),
        conf_strategy='max', shuffle=False,
        fixed_pad=True) if len(te) else None
    return train_loader, val_loader, test_loader, split


def _phase(msg: str) -> None:
    """Timestamped startup-phase print: on tunneled chips the silent parts
    of a run's startup (remote compiles, batch staging) can take tens of
    minutes — these prints make hangs diagnosable and keep supervisor
    staleness watchdogs fed."""
    import datetime
    print(f"[{datetime.datetime.utcnow():%H:%M:%S}] {msg}", flush=True)


def do_trainrun(config: Dict, project_dir: str = 'runs',
                run_name: Optional[str] = None,
                dataset_override: Optional[Dataset] = None,
                cache_batches: bool = False,
                mesh=None,
                pretrain_path: Optional[str] = None) -> Dict:
    """mesh: pass a jax.sharding.Mesh with a 'dp' axis for data-parallel
    training across chips (see grappa_tpu.parallel).

    pretrain_path: model file (.npz/.pth model_dict) whose weights AND
    scaler-statistic buffers initialize the model; start_qm_epochs is forced
    to 0 (reference trainrun.py:118-136)."""
    validate_config(config)
    run_name = run_name or config['trainer_config'].get('name') or 'run'
    run_dir = Path(project_dir) / run_name
    run_dir.mkdir(parents=True, exist_ok=True)
    write_yaml(config, run_dir / 'grappa_config.yaml')

    if dataset_override is not None:
        ds = dataset_override
        ids_by_ds = {}
        for e, name in zip(ds.entries, ds.ds_names):
            ids_by_ds.setdefault(name, []).append(e.mol_id)
        split = calc_split_ids(
            ids_by_ds, tuple(config['data_config'].get('partition',
                                                       (0.8, 0.1, 0.1))),
            seed=config['data_config'].get('seed', 0))
        save_split(split, run_dir / 'split.json')
        tr, vl, te = ds.split(split['train'], split['val'], split['test'])
        dcfg = config['data_config']
        train_loader = GraphLoader(tr, batch_size=dcfg.get('train_batch_size', 32),
                                   conf_strategy=dcfg.get('conf_strategy', 32),
                                   shuffle=True, weights=dcfg.get('weights', {}),
                                   balance_factor=dcfg.get('balance_factor', 0.0),
                                   seed=dcfg.get('seed', 0), drop_last=True)
        val_loader = GraphLoader(vl, batch_size=dcfg.get('val_batch_size', 32),
                                 conf_strategy=dcfg.get('val_conf_strategy', 500),
                                 shuffle=False) if len(vl) else None
        test_loader = None
    else:
        _phase(f"{run_name}: loading datasets")
        train_loader, val_loader, test_loader, split = get_dataloaders(
            config['data_config'], run_dir)

    # scaler statistics from the train set (full pass, like the reference)
    _phase(f"{run_name}: computing parameter statistics")
    stats = param_statistics_from_graphs(train_loader.dataset.graphs())
    stats_eps_applied = False
    (run_dir / 'param_statistics.json').write_text(json.dumps(
        {m: {k: np.asarray(v).tolist() for k, v in stats[m].items()}
         for m in ('mean', 'std')}))
    model = make_model(config['model_config'], stats)

    batch, ds_names = next(iter(train_loader))
    _phase(f"{run_name}: initializing model (local CPU)")
    # init is PRNG draws + shape plumbing — backend-invariant (jax PRNG is
    # deterministic across platforms). Compiling it on the LOCAL cpu
    # backend skips a multi-minute remote compile on tunneled chips; the
    # first train step transfers the params to the accelerator.
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        params = jax.jit(model.init)(jax.random.key(
            config['data_config'].get('seed', 0)), batch)
    _phase(f"{run_name}: model initialized")

    if pretrain_path is not None:
        from grappa_tpu.train.export import load_model_dict
        from grappa_tpu.train.torch_compat import import_state_dict
        d = load_model_dict(pretrain_path)
        sd = d['state_dict'] if 'state_dict' in d else d
        loaded_params, ckpt_stats = import_state_dict(
            sd, config['model_config'])
        if ckpt_stats is not None:
            # checkpoint buffers replace the train-set statistics, like
            # torch load_state_dict overwriting registered buffers
            model = make_model(config['model_config'], ckpt_stats,
                               eps_applied=True)
            stats, stats_eps_applied = ckpt_stats, True
        jax.tree.map(lambda a, b: None if a.shape == b.shape else
                     (_ for _ in ()).throw(ValueError(
                         f"pretrain shape mismatch {a.shape} vs {b.shape}")),
                     params, loaded_params)
        params = loaded_params
        config['lit_model_config']['start_qm_epochs'] = 0

    if config.get('test_model'):
        from grappa_tpu.models import mm_energy
        # numerical smoke test on the local cpu backend — zero remote
        # compiles on tunneled chips (an eager fused-path apply there costs
        # ~10 min of per-op compiles). The fused Pallas kernels cannot run
        # on CPU, so the smoke uses a de-fused sibling model: identical
        # checkpoint tree and (parity-tested) identical math.
        smoke_model = make_model(
            {**config['model_config'],
             'fused_heads': False, 'fused_gnn': False}, stats,
            eps_applied=stats_eps_applied)
        with jax.default_device(jax.local_devices(backend='cpu')[0]):
            pred = smoke_model.apply(params, batch)
            energy, gradient = mm_energy.energy_and_gradient(batch, pred)
        assert np.isfinite(np.asarray(energy)).all(), \
            "model smoke test: non-finite energies"
        assert np.isfinite(np.asarray(gradient)).all(), \
            "model smoke test: non-finite gradients"

    logger = MetricLogger(run_dir, name=run_name)
    trainer = Trainer(model, params, train_loader, val_loader,
                      config['lit_model_config'], config['trainer_config'],
                      out_dir=str(run_dir), full_config=config,
                      log_fn=logger.log,
                      seed=config['data_config'].get('seed', 0),
                      cache_batches=cache_batches, mesh=mesh,
                      prng_impl=config['trainer_config'].get(
                          'prng_impl', 'rbg'))
    try:
        _phase(f"{run_name}: entering fit (first step compiles)")
        results = trainer.fit()
    finally:
        logger.finish()

    return _finalize_run(trainer, model, config, split, test_loader,
                         run_dir, results)


def _finalize_run(trainer, model, config, split, test_loader, run_dir,
                  results) -> Dict:
    """Post-fit tail shared by do_trainrun and resume_trainrun: bootstrap
    test evaluation (if a test loader exists) + model_dict export.

    Evaluates/exports the BEST checkpoint (lowest early-stopping loss),
    like the reference, which exports files/checkpoints/best-model.ckpt
    (reference export_model.py:30) — the last weights of a bounded or
    oscillating run can be far off the monotone best."""
    eval_params = trainer.params
    best = Path(run_dir) / 'best.ckpt'
    if best.exists():
        try:
            from flax import serialization
            eval_params = serialization.from_bytes(
                trainer.params, (best / 'params.msgpack').read_bytes())
            _phase(f"{run_dir.name}: evaluating best.ckpt params")
        except Exception as exc:   # torn/obsolete best -> fall back to last
            print(f"best.ckpt unusable ({exc}); evaluating last params")
            eval_params = trainer.params
    final_metrics = (results.get('history', [])[-1]['metrics']
                     if results.get('history') else {})
    if test_loader is not None:
        from grappa_tpu.train.eval_model import BootstrapEvaluator
        _phase(f"{run_dir.name}: bootstrap test evaluation")
        evaluator = BootstrapEvaluator()
        for batch, names in test_loader:
            energy, gradient = trainer.eval_step(eval_params, batch)
            evaluator.step(batch, energy, gradient, names)
        final_metrics = {'val': final_metrics,
                         'test': evaluator.pool(n_bootstrap=200)}
        _phase(f"{run_dir.name}: test evaluation done")

    model_dict = build_model_dict(
        eval_params, config,
        split_names=split,
        results=final_metrics,
        model=model)
    export_path = run_dir / 'model.npz'
    save_model_dict(model_dict, export_path)
    return {'model_dict_path': str(export_path), 'results': results,
            'run_dir': str(run_dir), 'trainer': trainer}


def resume_trainrun(run_dir: str, extra_epochs: Optional[int] = None,
                    cache_batches: bool = False, mesh=None) -> Dict:
    """Continue a run from <run_dir>/last.ckpt with the stored config.

    Like do_trainrun, finishes with the bootstrap test evaluation and
    model.npz export, so a run that completes via resume produces the same
    artifacts as an uninterrupted one."""
    from grappa_tpu.train.config import read_yaml
    run_dir = Path(run_dir)
    config = read_yaml(run_dir / 'grappa_config.yaml')
    ckpt_meta = json.loads((run_dir / 'last.ckpt' / 'meta.json').read_text())
    if not config['data_config'].get('datasets'):
        raise ValueError(
            f"the stored config of {run_dir} lists no datasets — the run was "
            f"trained with a dataset_override, which is not persisted; "
            f"resume such runs by calling Trainer.load_checkpoint directly "
            f"with the original dataset")

    # pin the resume to the split the original run actually used: the run
    # dir's split.json is the fully-resolved assignment; recomputing from
    # the config could assign differently if the dataset cache changed in
    # the meantime (train/test leakage). Molecules not covered by the
    # stored split (newly added data) still get extended deterministically.
    if (run_dir / 'split.json').exists():
        config['data_config']['splitpath'] = str(run_dir / 'split.json')
    _phase(f"resume {run_dir.name}: loading datasets")
    train_loader, val_loader, test_loader, split = get_dataloaders(
        config['data_config'], run_dir)
    stats = param_statistics_from_graphs(train_loader.dataset.graphs())
    model = make_model(config['model_config'], stats)
    batch, _ = next(iter(train_loader))
    _phase(f"resume {run_dir.name}: initializing model (local CPU — the "
           f"values are overwritten by the checkpoint)")
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        params = jax.jit(model.init)(jax.random.key(0), batch)
    _phase(f"resume {run_dir.name}: model initialized")

    logger = MetricLogger(run_dir)
    trainer = Trainer(model, params, train_loader, val_loader,
                      config['lit_model_config'], config['trainer_config'],
                      out_dir=str(run_dir), full_config=config,
                      log_fn=logger.log, cache_batches=cache_batches,
                      mesh=mesh,
                      prng_impl=config['trainer_config'].get(
                          'prng_impl', 'rbg'))
    trainer.load_checkpoint(run_dir / 'last.ckpt')
    max_epochs = (trainer.epoch + extra_epochs if extra_epochs is not None
                  else config['trainer_config'].get('max_epochs'))
    try:
        _phase(f"resume {run_dir.name}: entering fit at epoch "
               f"{trainer.epoch}")
        results = trainer.fit(max_epochs=max_epochs)
    finally:
        logger.finish()
    return _finalize_run(trainer, model, config, split, test_loader,
                         run_dir, results)


def safe_trainrun(config: Dict, project_dir: str = 'runs',
                  run_name: Optional[str] = None, **kwargs) -> Dict:
    """do_trainrun with one automatic resume-from-last-checkpoint retry.

    The retry keeps the run's execution mode: cache_batches carries over,
    and runs started with a dataset_override cannot be resumed (the
    datasets are not persisted), so the original error is re-raised
    instead of silently retraining on the config's dataset tags."""
    try:
        return do_trainrun(config, project_dir, run_name, **kwargs)
    except Exception:
        traceback.print_exc()
        if kwargs.get('dataset_override') is not None:
            raise
        run_name = run_name or config['trainer_config'].get('name') or 'run'
        run_dir = Path(project_dir) / run_name
        if (run_dir / 'last.ckpt').exists():
            print(f"training failed; retrying once from {run_dir}/last.ckpt")
            return resume_trainrun(
                str(run_dir),
                cache_batches=kwargs.get('cache_batches', False),
                mesh=kwargs.get('mesh'))
        raise
