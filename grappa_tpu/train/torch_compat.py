"""Torch checkpoint interchange: flax params <-> reference-style state_dict.

The reference publishes models as torch `.pth` dicts
{state_dict, config, split_names[, results, ds_size]} (reference:
src/grappa/training/export_model.py:84-97, the reproducibility contract).
This module maps our flax parameter tree to/from a state_dict with the
reference's module naming (reference module tree: src/grappa/models/
grappa.py:51-109, graph_attention.py:48-139, interaction_parameters.py:
38-123, perm_equiv_transformer.py:40-237, network_utils.py:20-109), so

  * models trained here can be exported for torch-side use, and
  * published grappa checkpoints can be imported for TPU inference.

Conventions: torch Linear weight (out, in) == flax kernel (in, out).T;
torch LayerNorm weight/bias == flax scale/bias; torch MultiheadAttention
packs qkv rows as [q; k; v] which maps to our in_proj kernel columns
(parity-tested against torch in tests/test_model.py). DGL's DotGatConv uses
a single shared bias-free projection named 'fc' for homogeneous graphs,
matching our NeighborAttention.fc.

Output scalers live in torch buffers (to_k.mean_over_std/std, to_eq.*,
k_mean/k_std); importing extracts them into param_statistics so the
reconstructed flax model bakes in the exact same scaling (the stored values
already include the reference's EPSILON_STD, so the model must be built with
eps_applied=True).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from grappa_tpu.models.grappa_model import get_default_model_config

_WRITERS = (('bond', 'n2', 'bond_model'), ('angle', 'n3', 'angle_model'),
            ('proper', 'n4', 'torsion_model'),
            ('improper', 'n4_improper', 'torsion_model'))


def _t(x):
    """numpy array -> torch tensor (plain numpy when torch is absent, so
    the .npz export path works torch-free; save_model_dict's .pth branch
    needs torch anyway and np arrays round-trip identically via .npz)."""
    try:
        import torch
    except ModuleNotFoundError:
        return np.asarray(x)
    return torch.tensor(np.asarray(x))


def _linear_out(sd, name, kernel, bias=None):
    sd[f'{name}.weight'] = _t(np.asarray(kernel).T)
    if bias is not None:
        sd[f'{name}.bias'] = _t(bias)


def _ln_out(sd, name, p):
    sd[f'{name}.weight'] = _t(p['scale'])
    sd[f'{name}.bias'] = _t(p['bias'])


def _writer_permutations(writer: str, cfg: Dict):
    """The symmetry permutation set the reference bakes into each writer's
    Symmetriser buffer (interaction_parameters.py:238,331,499-508)."""
    perms = {
        'bond': [[0, 1], [1, 0]],
        'angle': [[0, 1, 2], [2, 1, 0]],
        'proper': [[0, 1, 2, 3], [3, 2, 1, 0]],
        'improper': [[0, 1, 2, 3], [3, 1, 2, 0]],
    }[writer]
    if writer == 'improper' and cfg.get('wrong_symmetry'):
        perms = [[0, 1, 2, 3], [3, 1, 2, 0], [1, 3, 2, 0],
                 [0, 3, 2, 1], [3, 0, 2, 1], [1, 0, 2, 3]]
    return perms


def expected_reference_keys(model_config: Dict = None) -> set:
    """Every state_dict key a real published grappa `.pth` contains for this
    model config — enumerated from the reference module definitions:

      * GrappaModel: `gnn` + `parameter_writer` (grappa.py:56-108)
      * GrappaGNN: pre_dense.0, conv_blocks.{i} (SAGEConv), att_blocks.{i}
        (LayerNorm + DotGatConv fc + head_reducer + interaction_norm +
        self_interaction.{0,2}), post_dense.0, PLUS `blocks = conv_blocks +
        att_blocks` which re-registers every block under a `gnn.blocks.{i}`
        alias (graph_attention.py:98-139)
      * writers bond/angle/proper/improper_writer: rep_projector.mlp.0,
        {bond,angle,torsion}_model.grappa_transformer.transformer.{i}
        (norm1 + packed-qkv MultiheadAttention + ff.{norm1,linear1,linear2})
        with the positional-encoding buffer for arity>=3
        (perm_equiv_transformer.py:121-188), symmetriser.mlp.{i} + the
        permutations/permutation_prefactors buffers (:318-319), scaler
        buffers to_k/to_eq (final_layer.py:39-88) or k_mean/k_std +
        n_periodicity for torsions (interaction_parameters.py:440-470)

    Used by the key-for-key audit test; import_state_dict reports any
    mismatch against the actual file loudly.
    """
    cfg = dict(get_default_model_config())
    cfg.update(model_config or {})
    keys = set()

    def linear(name):
        keys.add(f'{name}.weight')
        keys.add(f'{name}.bias')

    def ln(name):
        linear(name)

    linear('gnn.pre_dense.0')
    n_conv = cfg['gnn_convolutions']
    block_names = []
    for i in range(n_conv):
        block_names.append((f'gnn.conv_blocks.{i}', f'gnn.blocks.{i}', 'conv'))
    for i in range(cfg['gnn_attentional_layers']):
        block_names.append((f'gnn.att_blocks.{i}', f'gnn.blocks.{n_conv + i}',
                            'att'))
    for base, alias, kind in block_names:
        for b in (base, alias):
            ln(f'{b}.layer_norm')
            if kind == 'att':
                keys.add(f'{b}.graph_module.fc.weight')
                linear(f'{b}.head_reducer')
                ln(f'{b}.interaction_norm')
                linear(f'{b}.self_interaction.0')
                linear(f'{b}.self_interaction.2')
            else:
                # DGL SAGEConv (mean aggregator): fc_self (no bias) +
                # fc_neigh (bias); deployed configs have n_conv=0
                keys.add(f'{b}.graph_module.fc_self.weight')
                linear(f'{b}.graph_module.fc_neigh')
                ln(f'{b}.interaction_norm')
                linear(f'{b}.self_interaction.0')
    linear('gnn.post_dense.0')

    for writer, _, model_name in _WRITERS:
        base = f'parameter_writer.{writer}_writer'
        linear(f'{base}.rep_projector.mlp.0')
        for i in range(cfg[f'{writer}_transformer_depth']):
            t = f'{base}.{model_name}.grappa_transformer.transformer.{i}'
            ln(f'{t}.norm1')
            keys.add(f'{t}.attn.in_proj_weight')
            keys.add(f'{t}.attn.in_proj_bias')
            linear(f'{t}.attn.out_proj')
            ln(f'{t}.ff.norm1')
            linear(f'{t}.ff.linear1')
            linear(f'{t}.ff.linear2')
        if cfg['positional_encoding'] and writer != 'bond':
            keys.add(f'{base}.{model_name}.grappa_transformer'
                     f'.positional_encoding')
        for i in range(cfg[f'{writer}_symmetriser_depth']):
            s = f'{base}.{model_name}.symmetriser.mlp.{i}'
            ln(f'{s}.norm1')
            linear(f'{s}.linear1')
            linear(f'{s}.linear2')
        keys.add(f'{base}.{model_name}.symmetriser.permutations')
        keys.add(f'{base}.{model_name}.symmetriser.permutation_prefactors')
        if writer in ('bond', 'angle'):
            for stat in ('mean_over_std', 'std', 'min_'):
                keys.add(f'{base}.to_k.{stat}')
            if writer == 'bond':
                for stat in ('mean_over_std', 'std', 'min_'):
                    keys.add(f'{base}.to_eq.{stat}')
            else:
                keys.add(f'{base}.to_eq.std_over_max')
                keys.add(f'{base}.to_eq.max')
        else:
            keys.add(f'{base}.k_mean')
            keys.add(f'{base}.k_std')
            keys.add(f'{base}.n_periodicity')
    return keys


def export_state_dict(params: Dict, model_config: Dict,
                      stats: Dict = None) -> Dict:
    """flax params -> reference-named torch state_dict.

    `stats` ({'mean': {...}, 'std': {...}}, epsilon already applied — e.g.
    `stats_from_model(model)`) emits the scaler buffers (to_k/to_eq, k_mean/
    k_std) so the checkpoint is self-contained.
    """
    cfg = dict(get_default_model_config())
    cfg.update(model_config or {})
    p = params['params'] if 'params' in params else params
    sd: Dict = {}

    gnn = p['gnn']
    _linear_out(sd, 'gnn.pre_dense.0', gnn['pre_dense']['kernel'],
                gnn['pre_dense']['bias'])
    for i in range(cfg['gnn_convolutions']):
        blk = gnn[f'conv_block_{i}']
        _ln_out(sd, f'gnn.conv_blocks.{i}.layer_norm', blk['norm'])
        _linear_out(sd, f'gnn.conv_blocks.{i}.graph_module.fc_self',
                    blk['conv']['fc_self']['kernel'])
        _linear_out(sd, f'gnn.conv_blocks.{i}.graph_module.fc_neigh',
                    blk['conv']['fc_neigh']['kernel'],
                    blk['conv']['fc_neigh']['bias'])
        _ln_out(sd, f'gnn.conv_blocks.{i}.interaction_norm',
                blk['interaction_norm'])
        _linear_out(sd, f'gnn.conv_blocks.{i}.self_interaction.0',
                    blk['si_dense']['kernel'], blk['si_dense']['bias'])
    for i in range(cfg['gnn_attentional_layers']):
        blk = gnn[f'att_block_{i}']
        base = f'gnn.att_blocks.{i}'
        _ln_out(sd, f'{base}.layer_norm', blk['norm'])
        _linear_out(sd, f'{base}.graph_module.fc',
                    blk['attention']['fc']['kernel'])
        _linear_out(sd, f'{base}.head_reducer',
                    blk['head_reducer']['kernel'], blk['head_reducer']['bias'])
        _ln_out(sd, f'{base}.interaction_norm', blk['interaction_norm'])
        _linear_out(sd, f'{base}.self_interaction.0',
                    blk['si_dense1']['kernel'], blk['si_dense1']['bias'])
        _linear_out(sd, f'{base}.self_interaction.2',
                    blk['si_dense2']['kernel'], blk['si_dense2']['bias'])
    _linear_out(sd, 'gnn.post_dense.0', gnn['post_dense']['kernel'],
                gnn['post_dense']['bias'])

    # The reference GrappaGNN registers `self.blocks = conv_blocks +
    # att_blocks` (graph_attention.py:131), which duplicates every block's
    # tensors under a `gnn.blocks.{i}` alias in the state_dict. Emit the
    # aliases so the export loads strict into a reference-shaped torch model.
    n_conv = cfg['gnn_convolutions']
    if n_conv + cfg['gnn_attentional_layers'] > 0:
        alias = {}
        for key, val in sd.items():
            for prefix, offset in (('gnn.conv_blocks.', 0),
                                   ('gnn.att_blocks.', n_conv)):
                if key.startswith(prefix):
                    i, tail = key[len(prefix):].split('.', 1)
                    alias[f'gnn.blocks.{offset + int(i)}.{tail}'] = val
        sd.update(alias)

    for writer, _, model_name in _WRITERS:
        wp = p[f'{writer}_writer']['head']
        base = f'parameter_writer.{writer}_writer'
        _linear_out(sd, f'{base}.rep_projector.mlp.0',
                    wp['rep_projector']['kernel'],
                    wp['rep_projector']['bias'])
        depth = cfg[f'{writer}_transformer_depth']
        for i in range(depth):
            blk = wp[f'transformer_{i}']
            tbase = f'{base}.{model_name}.grappa_transformer.transformer.{i}'
            _ln_out(sd, f'{tbase}.norm1', blk['norm1'])
            sd[f'{tbase}.attn.in_proj_weight'] = _t(
                np.asarray(blk['attn']['in_proj']['kernel']).T)
            sd[f'{tbase}.attn.in_proj_bias'] = _t(blk['attn']['in_proj']['bias'])
            _linear_out(sd, f'{tbase}.attn.out_proj',
                        blk['attn']['out_proj']['kernel'],
                        blk['attn']['out_proj']['bias'])
            _ln_out(sd, f'{tbase}.ff.norm1', blk['ff']['norm'])
            _linear_out(sd, f'{tbase}.ff.linear1',
                        blk['ff']['linear1']['kernel'],
                        blk['ff']['linear1']['bias'])
            _linear_out(sd, f'{tbase}.ff.linear2',
                        blk['ff']['linear2']['kernel'],
                        blk['ff']['linear2']['bias'])
        # the reference GrappaTransformer stores its (constant) positional
        # encoding as a buffer (perm_equiv_transformer.py:188) — emit it
        if cfg['positional_encoding'] and writer != 'bond':
            if writer == 'improper' and cfg['wrong_symmetry']:
                enc = [[0.0], [0.0], [1.0], [0.0]]
            elif writer == 'angle':
                enc = [[0.0], [1.0], [0.0]]
            else:
                enc = [[0.0], [1.0], [1.0], [0.0]]
            sd[f'{base}.{model_name}.grappa_transformer.positional_encoding'] \
                = _t(np.asarray(enc, np.float32))
        sym_depth = cfg[f'{writer}_symmetriser_depth']
        for i in range(sym_depth):
            blk = wp['symmetriser'][f'mlp_{i}']
            sbase = f'{base}.{model_name}.symmetriser.mlp.{i}'
            _ln_out(sd, f'{sbase}.norm1', blk['norm'])
            _linear_out(sd, f'{sbase}.linear1', blk['linear1']['kernel'],
                        blk['linear1']['bias'])
            _linear_out(sd, f'{sbase}.linear2', blk['linear2']['kernel'],
                        blk['linear2']['bias'])
        # the reference Symmetriser registers its permutation set and the
        # (all-ones) prefactors as buffers (perm_equiv_transformer.py:
        # 318-319) — the published .pth contains them, so the export must too
        perms = _writer_permutations(writer, cfg)
        sd[f'{base}.{model_name}.symmetriser.permutations'] = _t(
            np.asarray(perms, np.int32))
        sd[f'{base}.{model_name}.symmetriser.permutation_prefactors'] = _t(
            np.ones(len(perms), np.float32))
        if stats is not None:
            term = {'bond': 'n2', 'angle': 'n3', 'proper': 'n4',
                    'improper': 'n4_improper'}[writer]
            if writer in ('bond', 'angle'):
                k_mean = float(np.asarray(stats['mean'][f'{term}_k'])[0])
                k_std = float(np.asarray(stats['std'][f'{term}_k'])[0])
                sd[f'{base}.to_k.mean_over_std'] = _t(k_mean / k_std)
                sd[f'{base}.to_k.std'] = _t(k_std)
                sd[f'{base}.to_k.min_'] = _t(0.0)
                if writer == 'bond':
                    eq_mean = float(np.asarray(stats['mean'][f'{term}_eq'])[0])
                    eq_std = float(np.asarray(stats['std'][f'{term}_eq'])[0])
                    sd[f'{base}.to_eq.mean_over_std'] = _t(eq_mean / eq_std)
                    sd[f'{base}.to_eq.std'] = _t(eq_std)
                    sd[f'{base}.to_eq.min_'] = _t(0.0)
                else:
                    eq_std = float(np.asarray(stats['std'][f'{term}_eq'])[0])
                    sd[f'{base}.to_eq.std_over_max'] = _t(eq_std / np.pi)
                    sd[f'{base}.to_eq.max'] = _t(float(np.pi))
            else:
                n_per = cfg[f'n_periodicity_{writer}']
                k_mean = np.asarray(stats['mean'][f'{term}_k'],
                                    np.float32).reshape(-1)
                k_std = np.asarray(stats['std'][f'{term}_k'],
                                   np.float32).reshape(-1)
                k_mean = np.pad(k_mean, (0, max(0, n_per - len(k_mean))),
                                constant_values=0.0)[:n_per]
                k_std = np.pad(k_std, (0, max(0, n_per - len(k_std))),
                               constant_values=1.0)[:n_per]
                sd[f'{base}.k_mean'] = _t(k_mean[None])
                sd[f'{base}.k_std'] = _t(k_std[None])
                sd[f'{base}.n_periodicity'] = _t(np.int64(n_per))
    return sd


def stats_from_model(model) -> Dict:
    """Extract the baked (epsilon-applied) statistics from a GrappaModel."""
    flat = dict(model.stats)
    stats = {'mean': {}, 'std': {}}
    for key in ('n2_k', 'n2_eq', 'n3_k', 'n3_eq', 'n4_k', 'n4_improper_k'):
        stats['mean'][key] = np.asarray(flat[f'{key}_mean'], np.float32)
        stats['std'][key] = np.asarray(flat[f'{key}_std'], np.float32)
    return stats


def import_state_dict(state_dict: Dict, model_config: Dict,
                      verbose: bool = True,
                      require_buffers: bool = True) -> Tuple[Dict, Dict]:
    """reference-named torch state_dict -> (flax params, param_statistics).

    The returned statistics carry the exact scaler values stored in the
    checkpoint buffers (EPSILON_STD already applied) — build the model with
    make_model(config, stats, eps_applied=True).

    Tolerant loading with a loud report: ALL missing keys are collected and
    raised together (not just the first); keys present in the file but not
    consumed are reported (the `gnn.blocks.{i}` aliases are instead verified
    to equal their att/conv_blocks source); the stored Symmetriser
    `permutations` buffers are checked against our permutation conventions
    so a silent symmetry-convention mismatch cannot slip through.
    """
    cfg = dict(get_default_model_config())
    cfg.update(model_config or {})
    consumed: set = set()
    missing: list = []
    buffers_absent: list = []

    def arr(name):
        if name not in state_dict:
            missing.append(name)
            return np.zeros((1,), np.float32)
        consumed.add(name)
        v = state_dict[name]
        if hasattr(v, 'numpy'):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    def buf(name):
        # scaler-statistic buffer: optional when require_buffers=False (a
        # buffer-less checkpoint builds its scalers from the config instead)
        if name not in state_dict and not require_buffers:
            buffers_absent.append(name)
            return np.zeros((1,), np.float32)
        return arr(name)

    def lin(name, bias=True):
        d = {'kernel': arr(f'{name}.weight').T}
        if bias:
            d['bias'] = arr(f'{name}.bias')
        return d

    def ln(name):
        return {'scale': arr(f'{name}.weight'), 'bias': arr(f'{name}.bias')}

    gnn: Dict = {
        'pre_dense': lin('gnn.pre_dense.0'),
        'post_dense': lin('gnn.post_dense.0'),
    }
    for i in range(cfg['gnn_convolutions']):
        base = f'gnn.conv_blocks.{i}'
        gnn[f'conv_block_{i}'] = {
            'norm': ln(f'{base}.layer_norm'),
            'conv': {
                'fc_self': lin(f'{base}.graph_module.fc_self', bias=False),
                'fc_neigh': lin(f'{base}.graph_module.fc_neigh'),
            },
            'interaction_norm': ln(f'{base}.interaction_norm'),
            'si_dense': lin(f'{base}.self_interaction.0'),
        }
    for i in range(cfg['gnn_attentional_layers']):
        base = f'gnn.att_blocks.{i}'
        fc_key = (f'{base}.graph_module.fc' if f'{base}.graph_module.fc.weight'
                  in state_dict else f'{base}.graph_module.fc_src')
        gnn[f'att_block_{i}'] = {
            'norm': ln(f'{base}.layer_norm'),
            'attention': {'fc': {'kernel': arr(f'{fc_key}.weight').T}},
            'head_reducer': lin(f'{base}.head_reducer'),
            'interaction_norm': ln(f'{base}.interaction_norm'),
            'si_dense1': lin(f'{base}.self_interaction.0'),
            'si_dense2': lin(f'{base}.self_interaction.2'),
        }

    params: Dict = {'gnn': gnn}
    stats = {'mean': {}, 'std': {}}

    for writer, term, model_name in _WRITERS:
        base = f'parameter_writer.{writer}_writer'
        head: Dict = {'rep_projector': lin(f'{base}.rep_projector.mlp.0')}
        for i in range(cfg[f'{writer}_transformer_depth']):
            tbase = f'{base}.{model_name}.grappa_transformer.transformer.{i}'
            head[f'transformer_{i}'] = {
                'norm1': ln(f'{tbase}.norm1'),
                'attn': {
                    'in_proj': {
                        'kernel': arr(f'{tbase}.attn.in_proj_weight').T,
                        'bias': arr(f'{tbase}.attn.in_proj_bias'),
                    },
                    'out_proj': lin(f'{tbase}.attn.out_proj'),
                },
                'ff': {
                    'norm': ln(f'{tbase}.ff.norm1'),
                    'linear1': lin(f'{tbase}.ff.linear1'),
                    'linear2': lin(f'{tbase}.ff.linear2'),
                },
            }
        sym: Dict = {}
        for i in range(cfg[f'{writer}_symmetriser_depth']):
            sbase = f'{base}.{model_name}.symmetriser.mlp.{i}'
            sym[f'mlp_{i}'] = {
                'norm': ln(f'{sbase}.norm1'),
                'linear1': lin(f'{sbase}.linear1'),
                'linear2': lin(f'{sbase}.linear2'),
            }
        head['symmetriser'] = sym
        params[f'{writer}_writer'] = {'head': head}

        # scaler buffers -> statistics (exact values incl. epsilon)
        if writer in ('bond', 'angle'):
            k_std = buf(f'{base}.to_k.std').reshape(-1)
            k_mos = buf(f'{base}.to_k.mean_over_std').reshape(-1)
            stats['mean'][f'{term}_k'] = k_mos * k_std
            stats['std'][f'{term}_k'] = k_std
            if f'{base}.to_k.min_' in state_dict:
                consumed.add(f'{base}.to_k.min_')
                if float(np.asarray(_np(state_dict[f'{base}.to_k.min_']))):
                    raise ValueError(f'{base}.to_k.min_ != 0 is unsupported')
            if writer == 'bond':
                eq_std = buf(f'{base}.to_eq.std').reshape(-1)
                eq_mos = buf(f'{base}.to_eq.mean_over_std').reshape(-1)
                stats['mean'][f'{term}_eq'] = eq_mos * eq_std
                stats['std'][f'{term}_eq'] = eq_std
                if f'{base}.to_eq.min_' in state_dict:
                    consumed.add(f'{base}.to_eq.min_')
                    if float(np.asarray(_np(
                            state_dict[f'{base}.to_eq.min_']))):
                        raise ValueError(
                            f'{base}.to_eq.min_ != 0 is unsupported')
            else:
                som = buf(f'{base}.to_eq.std_over_max').reshape(-1)
                mx = buf(f'{base}.to_eq.max').reshape(-1)
                stats['mean'][f'{term}_eq'] = np.array([np.pi / 2], np.float32)
                stats['std'][f'{term}_eq'] = som * mx
        else:
            stats['mean'][f'{term}_k'] = buf(f'{base}.k_mean').reshape(-1)
            stats['std'][f'{term}_k'] = buf(f'{base}.k_std').reshape(-1)
            if f'{base}.n_periodicity' in state_dict:
                consumed.add(f'{base}.n_periodicity')
                stored = int(np.asarray(_np(state_dict[f'{base}.n_periodicity'])))
                want = cfg[f'n_periodicity_{writer}']
                if stored != want:
                    raise ValueError(
                        f'{base}.n_periodicity in the checkpoint is {stored} '
                        f'but the config says {want}')

        # convention audit: the stored positional encoding is a constant —
        # verify it matches the reference convention and consume it
        ekey = f'{base}.{model_name}.grappa_transformer.positional_encoding'
        if ekey in state_dict:
            consumed.add(ekey)
            stored = np.asarray(_np(state_dict[ekey]), np.float32).tolist()
            if writer == 'improper' and cfg.get('wrong_symmetry'):
                want = [[0.0], [0.0], [1.0], [0.0]]
            elif writer == 'angle':
                want = [[0.0], [1.0], [0.0]]
            else:
                want = [[0.0], [1.0], [1.0], [0.0]]
            if stored != want:
                raise ValueError(
                    f'{ekey}: stored positional encoding {stored} does not '
                    f'match the expected {want}')

        # convention audit: the stored permutation set must be OUR set
        pkey = f'{base}.{model_name}.symmetriser.permutations'
        if pkey in state_dict:
            consumed.add(pkey)
            consumed.add(f'{base}.{model_name}'
                         f'.symmetriser.permutation_prefactors')
            stored = np.asarray(_np(state_dict[pkey])).tolist()
            want = _writer_permutations(writer, cfg)
            if sorted(stored) != sorted(want):
                raise ValueError(
                    f'{pkey}: stored permutation set {stored} does not match '
                    f'the expected {want} — symmetry conventions differ, a '
                    f'silent load would produce wrong parameters')

    if missing:
        raise KeyError(
            f'{len(missing)} expected keys are missing from the state_dict '
            f'(reference contract: expected_reference_keys()): {missing}')

    # `gnn.blocks.{i}` are registration aliases of conv/att_blocks
    # (graph_attention.py:131) — verify them instead of consuming
    n_conv = cfg['gnn_convolutions']
    for key in list(state_dict):
        if not key.startswith('gnn.blocks.'):
            continue
        i, tail = key[len('gnn.blocks.'):].split('.', 1)
        i = int(i)
        src = (f'gnn.conv_blocks.{i}.{tail}' if i < n_conv
               else f'gnn.att_blocks.{i - n_conv}.{tail}')
        if src in state_dict:
            a, b = _np(state_dict[key]), _np(state_dict[src])
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                raise ValueError(
                    f'alias {key} differs from {src} — corrupt checkpoint?')
            consumed.add(key)

    unused = sorted(set(state_dict) - consumed)
    if unused and verbose:
        import warnings
        warnings.warn(
            f'import_state_dict: {len(unused)} keys in the checkpoint were '
            f'not consumed (ignored): {unused[:40]}'
            + (' ...' if len(unused) > 40 else ''))

    # buffer-less checkpoint: the caller builds scalers from the config
    return {'params': params}, (None if buffers_absent else stats)


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, 'numpy') else np.asarray(v)
