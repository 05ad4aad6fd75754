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
from grappa_tpu.train.evaluator import _per_mol_full_stats


_ACC_KEYS = ('e_se', 'e_ae', 'n_e', 'g_se', 'g_ae_vec', 'n_vec',
             'eref_sum', 'eref_sq', 'gref_sum', 'gref_sq')
# metric keys that get bootstrap CIs (reference eval_model.py METRIC_KEYS)
_METRIC_KEYS = ('rmse_energies', 'rmse_gradients', 'crmse_gradients',
                'mae_energies', 'mae_gradients')


def _metrics_from_acc(acc: Dict[str, np.ndarray], idx=None) -> Dict[str, float]:
    """Pooled metric set from per-molecule accumulators (reference
    Evaluator.get_metrics, evaluation.py:360-384): rmse/mae of centered
    energies, invariant (per-3-vector) gradient rmse/mae, component crmse,
    and the std of the reference values."""
    a = {k: (v[idx] if idx is not None else v) for k, v in acc.items()}
    n_e = max(a['n_e'].sum(), 1.0)
    n_vec = max(a['n_vec'].sum(), 1.0)
    n_comp = 3.0 * n_vec
    g_rmse = float(np.sqrt(a['g_se'].sum() / n_vec))
    eref_var = a['eref_sq'].sum() / n_e - (a['eref_sum'].sum() / n_e) ** 2
    gref_var = (a['gref_sq'].sum() / n_comp
                - (a['gref_sum'].sum() / n_comp) ** 2)
    return {
        'rmse_energies': float(np.sqrt(a['e_se'].sum() / n_e)),
        'mae_energies': float(a['e_ae'].sum() / n_e),
        'rmse_gradients': g_rmse,
        'crmse_gradients': g_rmse / float(np.sqrt(3.0)),
        'mae_gradients': float(a['g_ae_vec'].sum() / n_vec),
        'std_energies': float(np.sqrt(max(eref_var, 0.0))),
        'std_gradients': float(np.sqrt(max(gref_var, 0.0) * 3.0)),
    }


class BootstrapEvaluator:
    """Accumulates per-molecule error statistics; pools the full reference
    Evaluator metric set with molecule-level bootstrap CIs."""

    def __init__(self):
        self._data = defaultdict(lambda: {k: [] for k in _ACC_KEYS})

    def step(self, batch, energy, gradient, ds_names: Sequence[str]):
        stats = {k: np.asarray(v) for k, v in
                 _per_mol_full_stats(batch, energy, gradient).items()}
        for i, name in enumerate(ds_names):
            d = self._data[name]
            for k in _ACC_KEYS:
                d[k].append(float(stats[k][i]))

    def add_molecule(self, ds_name: str, **stats: float):
        d = self._data[ds_name]
        for k in _ACC_KEYS:
            d[k].append(float(stats.get(k, 0.0)))

    def pool(self, n_bootstrap: int = 1000, seed: int = 0
             ) -> Dict[str, Dict[str, float]]:
        rng = np.random.default_rng(seed)
        metrics: Dict[str, Dict[str, float]] = {}
        for name, d in self._data.items():
            acc = {k: np.asarray(v, np.float64) for k, v in d.items()}
            entry = _metrics_from_acc(acc)
            entry['n_mols'] = int(len(acc['e_se']))
            entry['n_confs'] = int(acc['n_e'].sum())
            n = entry['n_mols']
            if n_bootstrap and n > 1:
                boot = {k: [] for k in _METRIC_KEYS}
                for _ in range(n_bootstrap):
                    idx = rng.integers(0, n, n)
                    m = _metrics_from_acc(acc, idx)
                    for k in _METRIC_KEYS:
                        boot[k].append(m[k])
                for k in _METRIC_KEYS:
                    entry[f'{k}_ci'] = [float(np.percentile(boot[k], 2.5)),
                                        float(np.percentile(boot[k], 97.5))]
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
            stats = {
                'e_se': float(((e_c - ref_c) ** 2).sum()),
                'e_ae': float(np.abs(e_c - ref_c).sum()),
                'n_e': float(len(e)),
                'eref_sum': float(ref_c.sum()),
                'eref_sq': float((ref_c ** 2).sum()),
            }
            g = entry.ff_gradient.get(ff)
            if g is not None:
                g = np.asarray(g, np.float64)
                nbg = entry.ff_nonbonded_gradient.get(ff)
                if nbg is not None:
                    g = g - np.asarray(nbg, np.float64)
                diff = g - entry.gradient_ref
                stats.update({
                    'g_se': float((diff ** 2).sum()),
                    'g_ae_vec': float(np.sqrt((diff ** 2).sum(axis=-1)).sum()),
                    'n_vec': float(g.shape[0] * g.shape[1]),
                    'gref_sum': float(np.asarray(entry.gradient_ref,
                                                 np.float64).sum()),
                    'gref_sq': float((np.asarray(entry.gradient_ref,
                                                 np.float64) ** 2).sum()),
                })
            evaluators.setdefault(ff, BootstrapEvaluator()).add_molecule(
                ds_name, **stats)
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


def parameter_scatter_plots(model, params, dataset: Dataset, plot_dir,
                            config: Optional[Dict] = None):
    """Per-dataset predicted-vs-classical parameter scatter + violin plots
    (reference Evaluator.plot_parameters, evaluation.py:389-408)."""
    from pathlib import Path
    from grappa_tpu.api import Grappa
    from grappa_tpu.plotting import (compare_parameters,
                                     compare_parameters_detailed,
                                     plot_parameters,
                                     plot_parameters_detailed)

    plot_dir = Path(plot_dir)
    plot_dir.mkdir(parents=True, exist_ok=True)
    ff = Grappa(model, params, config)
    by_ds: Dict[str, Dict[str, list]] = defaultdict(
        lambda: {'pred': [], 'ref': []})
    for entry, ds_name in zip(dataset.entries, dataset.ds_names):
        pred = ff.predict(entry.molecule, check_eq_values=False)
        by_ds[ds_name]['pred'].append(pred)
        by_ds[ds_name]['ref'].append(entry.classical_parameters)
    written = []
    for ds_name, d in by_ds.items():
        f1 = plot_dir / f'{ds_name}_parameter_comparison.png'
        compare_parameters(d['ref'], d['pred'], filename=str(f1),
                           xlabel='classical (ref)', ylabel='prediction',
                           title=ds_name)
        f2 = plot_dir / f'{ds_name}_parameters.png'
        plot_parameters(d['pred'], filename=str(f2), title=ds_name)
        # reference-layout panels: signed per-periodicity torsion ks,
        # angles in degrees (Parameters.py:646-923)
        f3 = plot_dir / f'{ds_name}_parameter_comparison_detailed.png'
        compare_parameters_detailed(
            d['ref'], d['pred'], filename=str(f3),
            xlabel='classical (ref)', ylabel='prediction', title=ds_name)
        f4 = plot_dir / f'{ds_name}_parameters_detailed.png'
        plot_parameters_detailed(
            d['pred'], compare=d['ref'], filename=str(f4), title=ds_name,
            name='grappa_tpu', compare_name='classical')
        written += [str(f1), str(f2), str(f3), str(f4)]
    return written


def prediction_scatter_plots(model, params, dataset: Dataset, plot_dir,
                             max_points: int = 20000,
                             with_classical: bool = True):
    """Per-dataset predicted-vs-QM scatter plots for centered energies and
    gradient components, with classical force fields stored in the entries
    overlaid for comparison (reference:
    experiments/evaluation/grappa-1.1/scatter_plots.py).

    Molecules are evaluated one by one with 32-multiple shape bucketing so
    the jit cache stays small. Gradient clouds are subsampled to max_points
    per dataset."""
    from pathlib import Path

    import jax
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    from grappa_tpu.data import MolGraph, collate
    from grappa_tpu.data.graph_batch import PadSpec
    from grappa_tpu.models import mm_energy

    plot_dir = Path(plot_dir)
    plot_dir.mkdir(parents=True, exist_ok=True)

    @jax.jit
    def step(params, batch):
        pred = model.apply(params, batch)
        return mm_energy.energy_and_gradient(batch, pred)

    by_ds: Dict[str, Dict[str, list]] = defaultdict(
        lambda: defaultdict(list))
    for entry, ds_name in zip(dataset.entries, dataset.ds_names):
        g = MolGraph.from_moldata(entry)
        n_confs = entry.xyz.shape[0]
        n_atoms = entry.xyz.shape[1]
        pad = PadSpec.for_graphs([g], n_confs, node_mult=32, tuple_mult=32)
        batch = collate([g], pad=pad)
        energy, gradient = step(params, batch)
        e = np.asarray(energy)[0, :n_confs]
        grad = np.asarray(gradient)[:n_atoms, :n_confs].transpose(1, 0, 2)
        d = by_ds[ds_name]
        d['e_pred'].append(e - e.mean())
        d['e_qm'].append(entry.energy_ref - entry.energy_ref.mean())
        d['g_pred'].append(grad.ravel())
        d['g_qm'].append(entry.gradient_ref.ravel())
        if with_classical:
            for ff, fe in entry.ff_energy.items():
                if ff == 'qm':
                    continue
                # bonded-only comparison, like classical_ff_metrics: the
                # stored classical energies are totals; the targets are
                # bonded-only, so subtract the stored nonbonded part
                fe = np.asarray(fe, np.float64)
                nb = entry.ff_nonbonded_energy.get(ff)
                if nb is not None:
                    fe = fe - np.asarray(nb, np.float64)
                d[f'e_{ff}'].append(fe - fe.mean())
                fg = entry.ff_gradient.get(ff)
                if fg is not None:
                    fg = np.asarray(fg, np.float64)
                    nbg = entry.ff_nonbonded_gradient.get(ff)
                    if nbg is not None:
                        fg = fg - np.asarray(nbg, np.float64)
                    d[f'g_{ff}'].append(fg.ravel())

    written = []
    series_color, classical_color = '#3b6fb6', '#c33d3d'
    for ds_name, d in by_ds.items():
        e_qm = np.concatenate(d['e_qm'])
        e_pred = np.concatenate(d['e_pred'])
        g_qm = np.concatenate(d['g_qm'])
        g_pred = np.concatenate(d['g_pred'])
        rng = np.random.default_rng(0)
        idx = (rng.choice(len(g_qm), max_points, replace=False)
               if len(g_qm) > max_points else slice(None))
        classical_ffs = sorted({k[2:] for k in d if k.startswith('e_')
                                and k not in ('e_pred', 'e_qm')})

        fig, axes = plt.subplots(1, 2, figsize=(9.5, 4.6))
        for ax, qm, pred, label, unit in (
                (axes[0], e_qm, e_pred, 'energy', 'kcal/mol'),
                (axes[1], g_qm[idx], g_pred[idx], 'force components',
                 'kcal/mol/A')):
            lo = min(qm.min(), pred.min())
            hi = max(qm.max(), pred.max())
            ax.plot([lo, hi], [lo, hi], color='0.6', ls='--', lw=1,
                    zorder=0)
            rmse = float(np.sqrt(np.mean((pred - qm) ** 2)))
            ax.scatter(qm, pred, s=5, alpha=0.4, color=series_color,
                       label=f'grappa_tpu (RMSE {rmse:.2f})', lw=0)
            for ff in classical_ffs:
                key = f'{"e" if label == "energy" else "g"}_{ff}'
                if key in d:
                    vals = np.concatenate(d[key])
                    vidx = (idx if label != 'energy'
                            and np.shape(vals) == np.shape(g_qm)
                            else slice(None))
                    ref = e_qm if label == 'energy' else g_qm[vidx]
                    vals = vals[vidx] if label != 'energy' else vals
                    if len(vals) != len(ref):
                        continue
                    ff_rmse = float(np.sqrt(np.mean((vals - ref) ** 2)))
                    ax.scatter(ref, vals, s=5, alpha=0.35,
                               color=classical_color,
                               label=f'{ff} (RMSE {ff_rmse:.2f})', lw=0)
            ax.set_xlabel(f'QM {label} [{unit}]')
            ax.set_ylabel(f'predicted {label} [{unit}]')
            ax.grid(alpha=0.25, lw=0.5)
            ax.spines[['top', 'right']].set_visible(False)
            ax.legend(frameon=False, fontsize=8, loc='upper left')
        fig.suptitle(ds_name)
        fig.tight_layout()
        path = plot_dir / f'{ds_name}_prediction_scatter.png'
        fig.savefig(path, dpi=160)
        plt.close(fig)
        written.append(str(path))
    return written


def eval_model(model, params, dataset: Dataset, batch_size: int = None,
               conf_strategy='max', n_bootstrap: int = 1000,
               classical: bool = False,
               forces_per_batch: float = 5e5,
               plot_dir=None, config: Optional[Dict] = None) -> Dict:
    """Evaluate a parameter model on a dataset; returns nested metrics
    (rmse/mae of energies, invariant rmse/mae + component rmse of forces,
    reference stds, bootstrap CIs). batch_size defaults to an adaptive value
    from forces_per_batch. plot_dir writes per-dataset parameter plots."""
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
    if plot_dir is not None:
        results['plots'] = (
            parameter_scatter_plots(model, params, dataset, plot_dir,
                                    config)
            + prediction_scatter_plots(model, params, dataset, plot_dir))
    return results
