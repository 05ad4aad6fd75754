"""Plotting utilities: parameter distributions and cross-model comparison.

Counterpart of the reference's Parameters plotting (reference:
src/grappa/data/Parameters.py:646-923 violin/scatter comparisons) used for
visual inspection of predicted force-field parameters (e.g. the -p flag of
grappa_gmx). matplotlib only; no seaborn dependency.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from grappa_tpu.data.parameters import Parameters

_PARAM_PANELS = [
    ('bond_eq', 'bond eq [A]'),
    ('bond_k', 'bond k [kcal/mol/A^2]'),
    ('angle_eq', 'angle eq [rad]'),
    ('angle_k', 'angle k [kcal/mol/rad^2]'),
    ('proper_ks', 'proper k_n [kcal/mol]'),
    ('improper_ks', 'improper k_n [kcal/mol]'),
]


def _values(params: Parameters, key: str) -> np.ndarray:
    v = getattr(params, key)
    if v is None:
        return np.zeros(0)
    return np.asarray(v, dtype=np.float64).reshape(-1)


def plot_parameters(parameters: Union[Parameters, Sequence[Parameters]],
                    filename: Optional[str] = None,
                    title: Optional[str] = None):
    """Violin plots of each parameter type's distribution."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    if isinstance(parameters, Parameters):
        parameters = [parameters]
    fig, axes = plt.subplots(2, 3, figsize=(14, 8))
    for ax, (key, label) in zip(axes.flat, _PARAM_PANELS):
        vals = np.concatenate([_values(p, key) for p in parameters])
        vals = vals[np.isfinite(vals)]
        if len(vals):
            ax.violinplot(vals, showmedians=True)
        ax.set_title(label)
        ax.set_xticks([])
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if filename:
        fig.savefig(filename, dpi=120)
        plt.close(fig)
        return None
    return fig, axes


def compare_parameters(params_x: Union[Parameters, Sequence[Parameters]],
                       params_y: Union[Parameters, Sequence[Parameters]],
                       filename: Optional[str] = None,
                       xlabel: str = 'reference',
                       ylabel: str = 'predicted',
                       title: Optional[str] = None):
    """Scatter of y vs x per parameter type (tuples must align) — the
    reference's per-parameter calibration plot (Parameters.py:646-923,
    evaluation.py:389-408). Accepts single Parameters or aligned lists."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    if isinstance(params_x, Parameters):
        params_x = [params_x]
    if isinstance(params_y, Parameters):
        params_y = [params_y]

    fig, axes = plt.subplots(2, 3, figsize=(14, 8))
    for ax, (key, label) in zip(axes.flat, _PARAM_PANELS):
        x = np.concatenate([_values(p, key) for p in params_x])
        y = np.concatenate([_values(p, key) for p in params_y])
        n = min(len(x), len(y))
        x, y = x[:n], y[:n]
        good = np.isfinite(x) & np.isfinite(y)
        x, y = x[good], y[good]
        if len(x):
            ax.scatter(x, y, s=4, alpha=0.5)
            lo, hi = min(x.min(), y.min()), max(x.max(), y.max())
            ax.plot([lo, hi], [lo, hi], 'k--', lw=0.8)
        ax.set_title(label)
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if filename:
        fig.savefig(filename, dpi=120)
        plt.close(fig)
        return None
    return fig, axes
