"""Streaming per-dataset metrics (energy/force RMSEs).

Same metric definitions as the reference evaluators (reference:
src/grappa/training/evaluation.py:16-159): per-dataset RMSE of centered
energies per conformation, gradient RMSE per 3-vector, component RMSE
(crmse = rmse/sqrt(3)), plus an equal-weight 'avg' across datasets. The
squared-error accumulation runs on-device per batch (one jitted reduction);
the tiny per-dataset dictionary lives on host.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from grappa_tpu.data.graph_batch import GraphBatch
from grappa_tpu.models import mm_energy


@jax.jit
def _per_mol_sqerr(batch: GraphBatch, energy: jnp.ndarray,
                   gradient: jnp.ndarray):
    """Per-molecule squared errors + counts for energies and gradients."""
    m = batch.num_mols
    e_pred = mm_energy.centered(energy, batch.conf_mask)
    e_ref = mm_energy.centered(batch.energy_ref, batch.conf_mask)
    e_se = jnp.square(e_pred - e_ref).sum(axis=1)
    n_conf = batch.conf_mask.sum(axis=1)

    conf_mask_per_node = batch.conf_mask[
        jnp.minimum(batch.node_mol, m - 1)] * batch.node_mask[:, None]
    g_se_node = (jnp.square(gradient - batch.gradient_ref)
                 * conf_mask_per_node[..., None]).sum(axis=(1, 2))
    g_se = jax.ops.segment_sum(g_se_node, batch.node_mol,
                               num_segments=m + 1)[:m]
    n_vec = batch.atoms_per_mol() * n_conf
    return e_se, n_conf, g_se, n_vec


@jax.jit
def _per_mol_full_stats(batch: GraphBatch, energy: jnp.ndarray,
                        gradient: jnp.ndarray):
    """Per-molecule accumulator contributions for the full Evaluator metric
    set (reference evaluation.py:360-384): squared + absolute errors, the
    invariant (per-3-vector) gradient errors, and reference-value moments
    for std_energies/std_gradients."""
    m = batch.num_mols
    e_pred = mm_energy.centered(energy, batch.conf_mask)
    e_ref = mm_energy.centered(batch.energy_ref, batch.conf_mask)
    e_diff = (e_pred - e_ref) * batch.conf_mask
    n_conf = batch.conf_mask.sum(axis=1)

    conf_mask_per_node = batch.conf_mask[
        jnp.minimum(batch.node_mol, m - 1)] * batch.node_mask[:, None]
    g_diff_sq = (jnp.square(gradient - batch.gradient_ref)
                 * conf_mask_per_node[..., None])
    # per-(atom, conf) 3-vector norms for the invariant MAE
    g_vec_norm = jnp.sqrt(g_diff_sq.sum(axis=2))

    def seg(x):
        return jax.ops.segment_sum(x, batch.node_mol,
                                   num_segments=m + 1)[:m]

    gref = batch.gradient_ref * conf_mask_per_node[..., None]
    return {
        'e_se': jnp.square(e_diff).sum(axis=1),
        'e_ae': jnp.abs(e_diff).sum(axis=1),
        'n_e': n_conf,
        'g_se': seg(g_diff_sq.sum(axis=(1, 2))),
        'g_ae_vec': seg(g_vec_norm.sum(axis=1)),
        'n_vec': batch.atoms_per_mol() * n_conf,
        'eref_sum': e_ref.sum(axis=1),
        'eref_sq': jnp.square(e_ref * batch.conf_mask).sum(axis=1),
        'gref_sum': seg(gref.sum(axis=(1, 2))),
        'gref_sq': seg(jnp.square(gref).sum(axis=(1, 2))),
    }


class StreamingEvaluator:
    """Accumulates squared errors per dataset name across batches."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._e_se = defaultdict(float)
        self._n_e = defaultdict(float)
        self._g_se = defaultdict(float)
        self._n_g = defaultdict(float)

    def step(self, batch: GraphBatch, energy: jnp.ndarray,
             gradient: jnp.ndarray, ds_names: Sequence[str]):
        e_se, n_conf, g_se, n_vec = jax.tree.map(
            np.asarray, _per_mol_sqerr(batch, energy, gradient))
        self.accumulate(e_se, n_conf, g_se, n_vec, ds_names)

    def accumulate(self, e_se, n_conf, g_se, n_vec,
                   ds_names: Sequence[str]):
        """Fold precomputed per-molecule accumulator arrays in (used by the
        scanned validation path, which fetches a whole epoch of them in one
        host transfer)."""
        for i, name in enumerate(ds_names):
            self._e_se[name] += float(e_se[i])
            self._n_e[name] += float(n_conf[i])
            self._g_se[name] += float(g_se[i])
            self._n_g[name] += float(n_vec[i])

    def pool(self, reset: bool = True) -> Dict[str, Dict[str, float]]:
        metrics: Dict[str, Dict[str, float]] = {}
        for name in self._e_se:
            n_e = max(self._n_e[name], 1.0)
            n_g = max(self._n_g[name], 1.0)
            rmse_g = float(np.sqrt(self._g_se[name] / n_g))
            metrics[name] = {
                'rmse_energies': float(np.sqrt(self._e_se[name] / n_e)),
                'rmse_gradients': rmse_g,
                'crmse_gradients': float(rmse_g / np.sqrt(3.0)),
            }
        if metrics:
            metrics['avg'] = {
                key: float(np.mean([m[key] for n, m in metrics.items()
                                    if n != 'avg']))
                for key in ('rmse_energies', 'rmse_gradients')
            }
        if reset:
            self.reset()
        return metrics


def early_stopping_loss(metrics: Dict[str, Dict[str, float]],
                        energy_weight: float = 3.0) -> float:
    """energy_weight * avg energy RMSE + avg gradient RMSE
    (reference: lightning_model.py:258-262)."""
    avg = metrics.get('avg')
    if not avg:
        return float('inf')
    return energy_weight * avg['rmse_energies'] + avg['rmse_gradients']
