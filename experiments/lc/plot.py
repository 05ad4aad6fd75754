"""Learning-curve plot (reference: experiments/evaluation/lc_benchmark/
plotting.py — test RMSE vs number of training molecules, per subdataset,
with classical-FF baselines as horizontal dashed lines).

Reads lc_results.json written by run_lc.py. Classical baselines are drawn
only if the dataset entries carry classical force-field energies
(ff_energy keys besides 'qm'); the synthetic proxy datasets do not, so
those lines are skipped there and appear automatically on real data.

Usage: python experiments/lc/plot.py [--results lc_results.json]
                                     [--out lc_plot.png] [--datasets ...]
"""
import argparse
import json
from pathlib import Path

HERE = Path(__file__).parent

GRAPPA_COLOR = '#3b6fb6'      # series color (CVD-safe vs the red baseline)
BASELINE_COLOR = '#c33d3d'    # classical FF: red + dashed (two encodings)


def load_curve(results: dict, dataset: str):
    pts = []
    for entry in results.values():
        test = entry.get('test') or {}
        if dataset in test:
            pts.append((entry['train_mols'],
                        test[dataset].get('rmse_energies'),
                        test[dataset].get('crmse_gradients')))
    pts.sort()
    return pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--results', default=str(HERE / 'lc_results.json'))
    ap.add_argument('--out', default=str(HERE / 'lc_plot.png'))
    ap.add_argument('--datasets', nargs='+', default=None,
                    help='subdatasets to plot (default: all in the results)')
    ap.add_argument('--baselines', default=None,
                    help='json with per-dataset classical metrics '
                         '(e.g. from classical_ff_metrics)')
    args = ap.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    results = json.loads(Path(args.results).read_text())
    all_ds = sorted({d for e in results.values()
                     for d in (e.get('test') or {})})
    datasets = args.datasets or all_ds
    baselines = (json.loads(Path(args.baselines).read_text())
                 if args.baselines else {})

    n = len(datasets)
    fig, axes = plt.subplots(2, n, figsize=(4.2 * n, 7), squeeze=False,
                             sharex='col')
    for j, ds in enumerate(datasets):
        pts = load_curve(results, ds)
        if not pts:
            continue
        mols = [p[0] for p in pts]
        e_rmse = [p[1] for p in pts]
        g_crmse = [p[2] for p in pts]
        for i, (vals, label) in enumerate((
                (e_rmse, 'energy RMSE [kcal/mol]'),
                (g_crmse, 'force cRMSE [kcal/mol/A]'))):
            ax = axes[i][j]
            ax.plot(mols, vals, color=GRAPPA_COLOR, lw=2, marker='o',
                    ms=7, label='grappa_tpu')
            base = (baselines.get(ds) or {}).get(
                'rmse_energies' if i == 0 else 'crmse_gradients')
            if base is not None:
                ax.axhline(base, color=BASELINE_COLOR, ls='--', lw=2,
                           label='classical FF')
            ax.set_xscale('log')
            ax.grid(alpha=0.25, lw=0.5)
            ax.spines[['top', 'right']].set_visible(False)
            if i == 1:
                ax.set_xlabel('training molecules')
            if j == 0:
                ax.set_ylabel(label)
            if i == 0:
                ax.set_title(ds, fontsize=11)
            ax.legend(frameon=False, fontsize=9)
    fig.tight_layout()
    fig.savefig(args.out, dpi=160)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
