"""Ablation experiment driver (reference: experiments/ablation/train.py).

Same ablation surface as the reference: each flag mutates the benchmark
config (model architecture toggles) and suffixes the run name, so a sweep
over flags produces comparable sibling runs:

  --with_hybridization   add sp_hybridization to the input features
  --wrong_symmetry       espaloma-style (incorrect) improper permutations
  --no_positional_encoding
  --no_param_attention   fold the tuple-transformer depth into the
                         symmetriser (pure-MLP parameter heads)
  --no_gnn_attention     replace attentional GNN layers with convolutions
  --no_gnn               no graph neural network at all (atom MLP only)
  --no_self_interaction
  --no_gated_torsion
  --harmonic_gate
  --pretrain_path        init from a model file (skips the param curriculum)

The reference raises NotImplementedError for --no_scaling / --exp_to_range;
kept for CLI parity with the same behavior.

Usage: python experiments/ablation/train.py --wrong_symmetry [--epochs N]
"""
import argparse
from pathlib import Path

TERMS = ('bond', 'angle', 'proper', 'improper')


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument('--project', type=str, default=None,
                   help='output directory (default runs/ablation)')
    p.add_argument('--pretrain_path', type=str, default=None)
    p.add_argument('--epochs', type=int, default=None,
                   help='override max_epochs (full recipe if omitted)')
    for flag in ('with_hybridization', 'wrong_symmetry',
                 'no_positional_encoding', 'no_param_attention',
                 'no_gnn_attention', 'no_gnn', 'no_scaling', 'exp_to_range',
                 'no_self_interaction', 'no_gated_torsion', 'harmonic_gate'):
        p.add_argument(f'--{flag}', action='store_true', default=False)
    return p


def ablated_config(config: dict, args) -> dict:
    """Apply the ablation mutations (reference train.py:36-91) to a
    grappa_tpu-format config; returns the config with the run name set."""
    name = 'ablation'
    mc = config['model_config']

    if args.with_hybridization:
        if 'sp_hybridization' not in mc['in_feat_name']:
            mc['in_feat_name'] = list(mc['in_feat_name']) + [
                'sp_hybridization']
        name += '_hybrid'
    if args.wrong_symmetry:
        mc['wrong_symmetry'] = True
        name += '_wrong_sym'
    if args.no_positional_encoding:
        mc['positional_encoding'] = False
        name += '_no_pos_enc'
    if args.no_param_attention:
        for term in TERMS:
            mc[f'{term}_symmetriser_depth'] += mc[f'{term}_transformer_depth']
            mc[f'{term}_transformer_depth'] = 0
        name += '_no_param_att'
    if args.no_gnn_attention:
        mc['gnn_convolutions'] += mc['gnn_attentional_layers']
        mc['gnn_attentional_layers'] = 0
        name += '_no_gnn_att'
    if args.no_gnn:
        mc['gnn_convolutions'] = 0
        mc['gnn_attentional_layers'] = 0
        name += '_no_gnn'
    if args.no_self_interaction:
        mc['self_interaction'] = False
        name += '_no_self_int'
    if args.no_gated_torsion:
        mc['gated_torsion'] = False
        name += '_no_gated_torsion'
    if args.harmonic_gate:
        mc['harmonic_gate'] = True
        name += '_harmonic_gate'
    if args.no_scaling:
        raise NotImplementedError(
            'no_scaling is not implemented (matches the reference)')
    if args.exp_to_range:
        raise NotImplementedError(
            'exp_to_range is not implemented (matches the reference)')
    if args.pretrain_path is not None:
        # do_trainrun(pretrain_path=...) forces start_qm_epochs=0 itself
        name += '_pretrain'
    if args.epochs is not None:
        config['trainer_config']['max_epochs'] = args.epochs

    config['trainer_config']['name'] = name
    return config


def main(argv=None, dry_run: bool = False):
    args = build_parser().parse_args(argv)

    from grappa_tpu.train.config import (default_config, overwrite_config,
                                         read_yaml)
    # the benchmark yaml is sparse; merge onto the full defaults so the
    # depth/width keys the mutations act on are present
    config = overwrite_config(
        read_yaml(Path(__file__).parent.parent / 'benchmark'
                  / 'grappa_config.yaml'), default_config())
    config = ablated_config(config, args)
    if dry_run:
        from grappa_tpu.train.config import validate_config
        validate_config(config)
        return config

    from grappa_tpu.train.run import do_trainrun
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    return do_trainrun(
        config, project_dir=args.project or 'runs/ablation',
        cache_batches=True, pretrain_path=args.pretrain_path)


if __name__ == '__main__':
    main()
