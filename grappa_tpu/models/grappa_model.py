"""The full parameter-prediction model: GNN embedder + four symmetric heads.

Configuration keys and default hyperparameters are identical to the
reference's deployed model config (reference: src/grappa/models/deploy.py:
18-64 and grappa.py:51-132), so yaml configs interchange. The model maps a
GraphBatch to a dict of MM parameters:

  {n2_k (B,), n2_eq (B,), n3_k (A,), n3_eq (A,),
   n4_k (P, n_periodicity_proper), n4_improper_k (I, n_periodicity_improper)}

Torsion ks are signed (phase folded into sign). Feed the output to
grappa_tpu.models.mm_energy for energies/forces.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from grappa_tpu.data.graph_batch import GraphBatch
from grappa_tpu.models.gnn import GrappaGNN
from grappa_tpu.models.heads import HarmonicParameterHead, TorsionParameterHead
from grappa_tpu.statistics import get_default_statistics, sanitize_statistics

_EPS_STD_HARMONIC = 1e-6


def get_default_model_config() -> Dict:
    """Canonical hyperparameters of the deployed model family."""
    return {
        "graph_node_features": 256,
        "in_feat_name": ["atomic_number", "partial_charge", "ring_encoding",
                         "degree", "charge_model"],
        "gnn_width": 512,
        "gnn_attentional_layers": 7,
        "gnn_convolutions": 0,
        "gnn_attention_heads": 16,
        "gnn_dropout_attention": 0.3,
        "gnn_dropout_initial": 0.0,
        "gnn_dropout_conv": 0.1,
        "gnn_dropout_final": 0.1,
        "parameter_dropout": 0.5,
        "bond_transformer_depth": 3,
        "bond_n_heads": 8,
        "bond_transformer_width": 512,
        "bond_symmetriser_depth": 3,
        "bond_symmetriser_width": 256,
        "angle_transformer_depth": 3,
        "angle_n_heads": 8,
        "angle_transformer_width": 512,
        "angle_symmetriser_depth": 3,
        "angle_symmetriser_width": 256,
        "proper_transformer_depth": 3,
        "proper_n_heads": 8,
        "proper_transformer_width": 512,
        "proper_symmetriser_depth": 3,
        "proper_symmetriser_width": 256,
        "improper_transformer_depth": 3,
        "improper_n_heads": 8,
        "improper_transformer_width": 512,
        "improper_symmetriser_depth": 3,
        "improper_symmetriser_width": 256,
        "n_periodicity_proper": 6,
        "n_periodicity_improper": 3,
        "gated_torsion": True,
        "wrong_symmetry": False,
        "positional_encoding": True,
        "layer_norm": True,
        "self_interaction": True,
        "learnable_statistics": False,
        "torsion_cutoff": 1e-4,
        "harmonic_gate": False,
        # TPU-specific: matmul compute dtype ('float32' | 'bfloat16');
        # parameters, layer norms, softmax and all physics stay float32
        "compute_dtype": "float32",
        # per-stage overrides for the bf16 accuracy diagnosis (PERF.md):
        # None falls back to compute_dtype
        "gnn_compute_dtype": None,
        "heads_compute_dtype": None,
        # TPU-specific: fused Pallas transformer block for the tuple heads
        # ('auto' = on for TPU backends, off on CPU; identical math and an
        # identical checkpoint tree either way — ops/fused_block.py)
        "fused_heads": "auto",
        # TPU-specific: fused Pallas GNN attention block — everything after
        # the neighbor gather in one kernel (ops/fused_gnn.py); same
        # auto/checkpoint contract as fused_heads
        "fused_gnn": "auto",
        # TPU-specific: layer-wise rematerialization (jax.checkpoint) of the
        # GNN and head transformer blocks — trades recompute FLOPs for HBM,
        # enabling 40k+-atom systems in training on one chip
        "remat": False,
    }


def get_small_model_config() -> Dict:
    """A small config for tests and fast smoke training."""
    cfg = get_default_model_config()
    cfg.update({
        "graph_node_features": 64, "gnn_width": 64,
        "gnn_attentional_layers": 2, "gnn_attention_heads": 4,
        "gnn_dropout_attention": 0.0, "gnn_dropout_final": 0.0,
        "parameter_dropout": 0.0,
    })
    for term in ("bond", "angle", "proper", "improper"):
        cfg[f"{term}_transformer_depth"] = 1
        cfg[f"{term}_n_heads"] = 4
        cfg[f"{term}_transformer_width"] = 64
        cfg[f"{term}_symmetriser_depth"] = 2
        cfg[f"{term}_symmetriser_width"] = 64
    return cfg


class GrappaModel(nn.Module):
    """GNN + parameter writers. Build with `make_model(config, statistics)`."""
    config: Tuple[Tuple[str, object], ...]   # hashable view of the config dict
    stats: Tuple[Tuple[str, Tuple[float, ...]], ...]  # flattened statistics

    @property
    def cfg(self) -> Dict:
        return dict(self.config)

    def _stat(self, key: str) -> Tuple[float, ...]:
        return dict(self.stats)[key]

    @nn.compact
    def __call__(self, batch: GraphBatch,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg

        def _dt(stage_key):
            # per-stage precision override (bf16 accuracy diagnosis,
            # PERF.md bf16 table): falls back to the global compute_dtype
            v = cfg.get(stage_key) or cfg.get('compute_dtype')
            return jnp.bfloat16 if v == 'bfloat16' else None

        dtype = _dt('heads_compute_dtype')
        gnn_dtype = _dt('gnn_compute_dtype')
        fused = cfg.get('fused_heads', 'auto')
        if fused == 'auto':
            # the fused Pallas head block is TPU-only; CPU (tests, meshes)
            # takes the identical-math XLA path
            import jax
            fused = jax.default_backend() not in ('cpu',)
        fused = bool(fused) and bool(cfg['layer_norm'])
        fused_gnn = cfg.get('fused_gnn', 'auto')
        if fused_gnn == 'auto':
            import jax
            fused_gnn = jax.default_backend() not in ('cpu',)
        fused_gnn = bool(fused_gnn) and bool(cfg['layer_norm'])
        h = GrappaGNN(
            out_feats=cfg['graph_node_features'],
            node_feats=cfg['gnn_width'],
            n_conv=cfg['gnn_convolutions'],
            n_att=cfg['gnn_attentional_layers'],
            n_heads=cfg['gnn_attention_heads'],
            in_feat_names=tuple(cfg['in_feat_name']),
            conv_dropout=cfg['gnn_dropout_conv'],
            attention_dropout=cfg['gnn_dropout_attention'],
            initial_dropout=cfg['gnn_dropout_initial'],
            final_dropout=cfg['gnn_dropout_final'],
            layer_norm=cfg['layer_norm'],
            self_interaction=cfg['self_interaction'],
            dtype=gnn_dtype,
            remat=cfg.get('remat', False),
            fused=fused_gnn,
            name='gnn',
        )(batch.feats, batch.neighbors, batch.neighbor_mask, deterministic)

        bond_k, bond_eq = HarmonicParameterHead(
            term='n2',
            transformer_width=cfg['bond_transformer_width'],
            transformer_depth=cfg['bond_transformer_depth'],
            n_heads=cfg['bond_n_heads'],
            symmetriser_depth=cfg['bond_symmetriser_depth'],
            symmetriser_width=cfg['bond_symmetriser_width'],
            k_mean=self._stat('n2_k_mean')[0],
            k_std=self._stat('n2_k_std')[0],
            eq_mean=self._stat('n2_eq_mean')[0],
            eq_std=self._stat('n2_eq_std')[0],
            positional_encoding=False,
            gate=cfg['harmonic_gate'],
            dropout=cfg['parameter_dropout'],
            layer_norm=cfg['layer_norm'],
            dtype=dtype,
            learnable_statistics=cfg['learnable_statistics'],
            remat=cfg.get('remat', False),
            fused=fused,
            name='bond_writer',
        )(h, batch.terms['n2'].idxs, deterministic)

        angle_k, angle_eq = HarmonicParameterHead(
            term='n3',
            transformer_width=cfg['angle_transformer_width'],
            transformer_depth=cfg['angle_transformer_depth'],
            n_heads=cfg['angle_n_heads'],
            symmetriser_depth=cfg['angle_symmetriser_depth'],
            symmetriser_width=cfg['angle_symmetriser_width'],
            k_mean=self._stat('n3_k_mean')[0],
            k_std=self._stat('n3_k_std')[0],
            eq_mean=0.0,
            eq_std=self._stat('n3_eq_std')[0],
            positional_encoding=cfg['positional_encoding'],
            gate=cfg['harmonic_gate'],
            dropout=cfg['parameter_dropout'],
            layer_norm=cfg['layer_norm'],
            dtype=dtype,
            learnable_statistics=cfg['learnable_statistics'],
            remat=cfg.get('remat', False),
            fused=fused,
            name='angle_writer',
        )(h, batch.terms['n3'].idxs, deterministic)

        def torsion_stats(key: str, n_per: int):
            mean = list(self._stat(f'{key}_mean'))
            std = list(self._stat(f'{key}_std'))
            # pad with neutral statistics if the model asks for more terms
            while len(mean) < n_per:
                mean.append(0.0)
            while len(std) < n_per:
                std.append(1.0)
            return tuple(mean[:n_per]), tuple(std[:n_per])

        npp = cfg['n_periodicity_proper']
        k_mean, k_std = torsion_stats('n4_k', npp)
        proper_k = TorsionParameterHead(
            term='n4', n_periodicity=npp,
            transformer_width=cfg['proper_transformer_width'],
            transformer_depth=cfg['proper_transformer_depth'],
            n_heads=cfg['proper_n_heads'],
            symmetriser_depth=cfg['proper_symmetriser_depth'],
            symmetriser_width=cfg['proper_symmetriser_width'],
            k_mean=k_mean, k_std=k_std,
            gated=cfg['gated_torsion'],
            positional_encoding=cfg['positional_encoding'],
            cutoff=cfg['torsion_cutoff'],
            dropout=cfg['parameter_dropout'],
            layer_norm=cfg['layer_norm'],
            dtype=dtype,
            learnable_statistics=cfg['learnable_statistics'],
            remat=cfg.get('remat', False),
            fused=fused,
            name='proper_writer',
        )(h, batch.terms['n4'].idxs, deterministic)

        npi = cfg['n_periodicity_improper']
        k_mean, k_std = torsion_stats('n4_improper_k', npi)
        improper_k = TorsionParameterHead(
            term='n4_improper', n_periodicity=npi,
            transformer_width=cfg['improper_transformer_width'],
            transformer_depth=cfg['improper_transformer_depth'],
            n_heads=cfg['improper_n_heads'],
            symmetriser_depth=cfg['improper_symmetriser_depth'],
            symmetriser_width=cfg['improper_symmetriser_width'],
            k_mean=k_mean, k_std=k_std,
            gated=cfg['gated_torsion'],
            positional_encoding=cfg['positional_encoding'],
            wrong_symmetry=cfg['wrong_symmetry'],
            cutoff=cfg['torsion_cutoff'],
            dropout=cfg['parameter_dropout'],
            layer_norm=cfg['layer_norm'],
            dtype=dtype,
            learnable_statistics=cfg['learnable_statistics'],
            remat=cfg.get('remat', False),
            fused=fused,
            name='improper_writer',
        )(h, batch.terms['n4_improper'].idxs, deterministic)

        return {
            'n2_k': bond_k, 'n2_eq': bond_eq,
            'n3_k': angle_k, 'n3_eq': angle_eq,
            'n4_k': proper_k, 'n4_improper_k': improper_k,
        }


def _freeze(obj):
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


def make_model(model_config: Optional[Dict] = None,
               param_statistics: Optional[Dict] = None,
               eps_applied: bool = False) -> GrappaModel:
    """Factory: config dict (reference-compatible keys) + statistics -> model.

    eps_applied: set True when the statistics already include the reference's
    EPSILON_STD (e.g. extracted from torch checkpoint scaler buffers); by
    default a small epsilon is added to every std so scalers never divide by
    zero (1e-6 harmonic; 0.1 gated / 0.01 ungated torsion).
    """
    cfg = get_default_model_config()
    if model_config:
        unknown = set(model_config) - set(cfg) - {'in_feats', 'in_feat_dims'}
        if unknown:
            raise KeyError(f"unknown model config keys: {sorted(unknown)}")
        cfg.update({k: v for k, v in model_config.items()
                    if k in cfg})
    stats = sanitize_statistics(param_statistics or get_default_statistics())
    if not eps_applied:
        eps_torsion = 1e-1 if cfg['gated_torsion'] else 1e-2
        for key in ('n2_k', 'n2_eq', 'n3_k', 'n3_eq'):
            stats['std'][key] = stats['std'][key] + _EPS_STD_HARMONIC
        for key in ('n4_k', 'n4_improper_k'):
            stats['std'][key] = stats['std'][key] + eps_torsion
    flat_stats = []
    for key in ('n2_k', 'n2_eq', 'n3_k', 'n3_eq', 'n4_k', 'n4_improper_k'):
        flat_stats.append((f'{key}_mean', tuple(float(x) for x in stats['mean'][key])))
        flat_stats.append((f'{key}_std', tuple(float(x) for x in stats['std'][key])))
    return GrappaModel(config=_freeze(cfg), stats=tuple(flat_stats))


def field_of_view(model_config: Dict) -> int:
    """Graph distance the model can see: attention + conv layers + 3
    (tuples and ring features)."""
    return (model_config.get('gnn_attentional_layers', 7)
            + model_config.get('gnn_convolutions', 0) + 3)
