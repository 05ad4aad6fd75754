"""Shared driver for the production training recipes
(experiments/train-grappa-{1.0,1.1,1.2,1.2.1}).

Mirrors the reference per-version train.py scripts (reference:
experiments/train-grappa-1.0/train.py:1-44, train-grappa-1.2.1/train.py:1-76):
load the version's grappa_config.yaml (kept in the reference's published
format; normalize_reference_config translates it), wire the espaloma split,
apply the CLI overrides, and launch do_trainrun.

CLI surface (the 1.1+ scripts; 1.0 supports the first three):
  --project         output directory (reference: wandb project)
  -tb/-vb           train/val batch size override
  -p/--param_weight param-loss weight for the *amber99sbildn* datasets
                    (param_weights_by_dataset override + run-name suffix)
  -b/--bondbreak_radicals  add AA_bondbreak_rad_amber99sbildn w/ weight 2
  --shrink_train    tr_subsampling_factor
  --n_periodicity   proper-torsion periodicity override
  --no_torsion_cutoff  disable the hard |k| cutoff
  --pretrain_path   model file used for initialization (param_loss_epochs=0)
"""
import argparse
from pathlib import Path


def build_parser(v1_0: bool = False) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument('--project', type=str, default=None,
                        help='run output directory (default runs/<version>)')
    parser.add_argument('-tb', '--train_batch', type=int, default=-1)
    parser.add_argument('-vb', '--val_batch', type=int, default=-1)
    parser.add_argument('-p', '--param_weight', type=float, default=None)
    if not v1_0:
        parser.add_argument('-b', '--bondbreak_radicals',
                            action='store_true', default=False)
        parser.add_argument('--shrink_train', type=float, default=None)
        parser.add_argument('--n_periodicity', type=int, default=3)
        parser.add_argument('--no_torsion_cutoff', action='store_true')
        parser.add_argument('--pretrain_path', type=str, default=None)
    return parser


def run_production(config_dir, version: str, argv=None, v1_0: bool = False,
                   dry_run: bool = False):
    """Load <config_dir>/grappa_config.yaml, apply CLI overrides, train.

    dry_run: normalize + validate the config and return it without training
    (used by tests and `--dry_run` style smoke checks)."""
    import numpy as np

    from grappa_tpu.train.config import (normalize_reference_config,
                                         read_yaml)

    args = build_parser(v1_0).parse_args(argv)
    config_dir = Path(config_dir)
    config = normalize_reference_config(read_yaml(config_dir
                                                  / 'grappa_config.yaml'))

    # the espaloma benchmark split: a local json next to the config if
    # present, else the 'espaloma_split' zoo tag (reference
    # train-grappa-1.2.1/train.py:33; resolved by run.resolve_splitpath)
    local_split = config_dir / 'espaloma_split.json'
    config['data_config']['splitpath'] = (
        str(local_split) if local_split.exists() else 'espaloma_split')

    name = version
    if args.train_batch > 0:
        config['data_config']['train_batch_size'] = args.train_batch
    if args.val_batch > 0:
        config['data_config']['val_batch_size'] = args.val_batch

    if args.param_weight is not None:
        name += f"_p{int(np.log10(args.param_weight))}"
        config['lit_model_config']['param_weights_by_dataset'] = {
            ds: args.param_weight
            for ds in config['data_config']['datasets']
            if 'amber99sbildn' in ds}

    if not v1_0:
        if args.bondbreak_radicals:
            name += '_bondbreak'
            ds_list = config['data_config']['datasets']
            if 'AA_bondbreak_rad_amber99sbildn' not in ds_list:
                ds_list.append('AA_bondbreak_rad_amber99sbildn')
            config['data_config']['weights'][
                'AA_bondbreak_rad_amber99sbildn'] = 2.0
        if args.shrink_train is not None:
            config['data_config']['tr_subsampling_factor'] = args.shrink_train
            name += f"_shrink{int(args.shrink_train * 100)}"
        if args.n_periodicity != 3:
            config['model_config']['n_periodicity_proper'] = int(
                args.n_periodicity)
            name += f"_n_p{int(args.n_periodicity)}"
        if args.no_torsion_cutoff:
            config['model_config']['torsion_cutoff'] = 0.0
            name += '_no_cutoff'
        if args.pretrain_path is not None:
            config['lit_model_config']['param_loss_epochs'] = 0
            name += '_pretrain'

    config['trainer_config']['name'] = name
    # TPU execution mode (not part of the reference config surface):
    # background-streamed checkpoints — checkpoint I/O at ~6 MB/s through
    # the tunnel otherwise dominates the epoch wall clock (PERF.md
    # round-4c). scan_epochs is NOT forced here: it stacks the whole
    # epoch's batch cache in HBM, which the full production datasets may
    # not fit; enable it per-run via trainer_config when the set fits.
    config['trainer_config'].setdefault('async_checkpoints', True)
    if dry_run:
        return config

    from grappa_tpu.train.run import do_trainrun
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    pretrain = getattr(args, 'pretrain_path', None)
    return do_trainrun(
        config, project_dir=args.project or f'runs/{version}',
        cache_batches=True, pretrain_path=pretrain)
