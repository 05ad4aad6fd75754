"""Model evaluation with bootstrapped confidence intervals.

Counterpart of the reference's evaluation path (reference: src/grappa/
training/eval_model.py:78-301 and evaluation.py:164-408): per-dataset
energy/force RMSEs with molecule-level bootstrap CIs, plus comparisons of
classical force fields whose energies/gradients are stored in the dataset
entries (ff_energy/ff_gradient dicts).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from grappa_tpu.data.dataset import Dataset
from grappa_tpu.data.loader import GraphLoader
from grappa_tpu.train.evaluator import _per_mol_sqerr


class BootstrapEvaluator:
    """Accumulates per-molecule squared errors; pools with bootstrap CIs."""

    def __init__(self):
        self._data = defaultdict(lambda: {'e_se': [], 'n_e': [],
                                          'g_se': [], 'n_g': []})

    def step(self, batch, energy, gradient, ds_names: Sequence[str]):
        e_se, n_e, g_se, n_g = map(np.asarray,
                                   _per_mol_sqerr(batch, energy, gradient))
        for i, name in enumerate(ds_names):
            d = self._data[name]
            d['e_se'].append(float(e_se[i]))
            d['n_e'].append(float(n_e[i]))
            d['g_se'].append(float(g_se[i]))
            d['n_g'].append(float(n_g[i]))

    def add_molecule(self, ds_name: str, e_se: float, n_e: float,
                     g_se: float, n_g: float):
        d = self._data[ds_name]
        d['e_se'].append(e_se)
        d['n_e'].append(n_e)
        d['g_se'].append(g_se)
        d['n_g'].append(n_g)

    def pool(self, n_bootstrap: int = 1000, seed: int = 0
             ) -> Dict[str, Dict[str, float]]:
        rng = np.random.default_rng(seed)
        metrics: Dict[str, Dict[str, float]] = {}
        for name, d in self._data.items():
            e_se = np.array(d['e_se'])
            n_e = np.array(d['n_e'])
            g_se = np.array(d['g_se'])
            n_g = np.array(d['n_g'])

            def rmse(se, n, idx=None):
                if idx is not None:
                    se, n = se[idx], n[idx]
                return float(np.sqrt(se.sum() / max(n.sum(), 1.0)))

            entry = {
                'rmse_energies': rmse(e_se, n_e),
                'rmse_gradients': rmse(g_se, n_g),
                'crmse_gradients': rmse(g_se, n_g) / np.sqrt(3.0),
                'n_mols': int(len(e_se)),
                'n_confs': int(n_e.sum()),
            }
            if n_bootstrap and len(e_se) > 1:
                boot_e, boot_g = [], []
                for _ in range(n_bootstrap):
                    idx = rng.integers(0, len(e_se), len(e_se))
                    boot_e.append(rmse(e_se, n_e, idx))
                    boot_g.append(rmse(g_se, n_g, idx))
                entry['rmse_energies_ci'] = [
                    float(np.percentile(boot_e, 2.5)),
                    float(np.percentile(boot_e, 97.5))]
                entry['rmse_gradients_ci'] = [
                    float(np.percentile(boot_g, 2.5)),
                    float(np.percentile(boot_g, 97.5))]
            metrics[name] = entry
        return metrics


def classical_ff_metrics(dataset: Dataset, ff_names: Optional[List[str]] = None,
                         n_bootstrap: int = 1000) -> Dict[str, Dict]:
    """RMSEs of classical force fields stored in the dataset entries vs the
    QM reference targets (no model involved)."""
    evaluators: Dict[str, BootstrapEvaluator] = {}
    for entry, ds_name in zip(dataset.entries, dataset.ds_names):
        names = ff_names or [n for n in entry.ff_energy if n != 'qm']
        for ff in names:
            if ff not in entry.ff_energy:
                continue
            e = np.asarray(entry.ff_energy[ff], np.float64)
            e_ref = np.asarray(entry.energy_ref, np.float64)
            nb = entry.ff_nonbonded_energy.get(ff)
            if nb is not None:
                e = e - np.asarray(nb, np.float64)
            e_c = e - e.mean()
            ref_c = e_ref - e_ref.mean()
            e_se = float(((e_c - ref_c) ** 2).sum())
            n_e = float(len(e))
            g = entry.ff_gradient.get(ff)
            if g is not None:
                g = np.asarray(g, np.float64)
                nbg = entry.ff_nonbonded_gradient.get(ff)
                if nbg is not None:
                    g = g - np.asarray(nbg, np.float64)
                g_se = float(((g - entry.gradient_ref) ** 2).sum())
                n_g = float(g.shape[0] * g.shape[1])
            else:
                g_se, n_g = 0.0, 0.0
            evaluators.setdefault(ff, BootstrapEvaluator()).add_molecule(
                ds_name, e_se, n_e, g_se, n_g)
    return {ff: ev.pool(n_bootstrap) for ff, ev in evaluators.items()}


def adaptive_batch_size(dataset: Dataset, forces_per_batch: float = 5e5,
                        conf_cap: int = 512) -> int:
    """Batch size from a compute budget: roughly forces_per_batch =
    batch * max_confs * max_atoms (reference semantics: eval_model.py
    adaptive batching by forces_per_batch)."""
    max_atoms = max((len(e.molecule.atoms) for e in dataset.entries),
                    default=1)
    max_confs = min(conf_cap, max((e.n_confs for e in dataset.entries),
                                  default=1))
    return max(1, int(forces_per_batch / max(1, max_confs * max_atoms)))


def eval_model(model, params, dataset: Dataset, batch_size: int = None,
               conf_strategy='max', n_bootstrap: int = 1000,
               classical: bool = False,
               forces_per_batch: float = 5e5) -> Dict:
    """Evaluate a parameter model on a dataset; returns nested metrics.
    batch_size defaults to an adaptive value from forces_per_batch."""
    import jax
    from grappa_tpu.models import mm_energy

    if batch_size is None:
        batch_size = adaptive_batch_size(dataset, forces_per_batch)

    @jax.jit
    def step(params, batch):
        pred = model.apply(params, batch)
        return mm_energy.energy_and_gradient(batch, pred)

    loader = GraphLoader(dataset, batch_size=batch_size,
                         conf_strategy=conf_strategy, shuffle=False)
    evaluator = BootstrapEvaluator()
    for batch, ds_names in loader:
        energy, gradient = step(params, batch)
        evaluator.step(batch, energy, gradient, ds_names)
    results = {'grappa_tpu': evaluator.pool(n_bootstrap)}
    if classical:
        results.update(classical_ff_metrics(dataset, n_bootstrap=n_bootstrap))
    return results
