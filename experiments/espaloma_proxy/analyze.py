"""Convergence diagnosis of the espaloma-proxy training run.

Reads the run's metrics.jsonl and answers the question the accuracy gate
leaves open when it fails: is the model still descending (train longer),
plateaued at an optimization floor (schedule/LR problem), or plateaued at a
generalization floor (val flat while train falls — data/model limited)?

Writes analysis.json + learning_curves.png next to proxy_results.json.

Usage: python experiments/espaloma_proxy/analyze.py [--run-dir DIR]
"""
import argparse
import json
import math
from pathlib import Path

HERE = Path(__file__).parent


def load_series(run_dir: Path):
    """metrics.jsonl -> per-epoch dict series (train + val rows merged)."""
    rows = {}
    with open(run_dir / 'metrics.jsonl') as f:
        for line in f:
            r = json.loads(line)
            rows.setdefault(r['epoch'], {}).update(r)
    return [rows[e] for e in sorted(rows)]


def tail_slope(epochs, values, frac=0.2, min_points=10):
    """Least-squares slope of log10(value) per 100 epochs over the last
    `frac` of the run — the 'still descending?' measurement."""
    pts = [(e, v) for e, v in zip(epochs, values)
           if v is not None and v > 0 and math.isfinite(v)]
    if len(pts) < min_points:
        return None
    tail = pts[-max(min_points, int(len(pts) * frac)):]
    xs = [e for e, _ in tail]
    ys = [math.log10(v) for _, v in tail]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    den = sum((x - mx) ** 2 for x in xs)
    if den == 0:
        return None
    return 100.0 * sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den


def analyze(run_dir: Path) -> dict:
    series = load_series(run_dir)
    epochs = [r['epoch'] for r in series]
    es = [r.get('early_stopping_loss') for r in series]
    lr = [r.get('lr') for r in series]
    train = [r.get('train_loss') for r in series]
    val_e = [r.get('val_metrics/avg/rmse_energies') for r in series]
    val_f = [r.get('val_metrics/avg/rmse_gradients') for r in series]

    # LR schedule events: every distinct decay step with its epoch
    lr_events = []
    for i in range(1, len(lr)):
        if lr[i] is not None and lr[i - 1] is not None and lr[i] != lr[i - 1]:
            lr_events.append({'epoch': epochs[i], 'from': lr[i - 1],
                              'to': lr[i]})

    valid_es = [(e, v) for e, v in zip(epochs, es) if v is not None]
    best_es = min(valid_es, key=lambda t: t[1]) if valid_es else None
    slopes = {
        # log10 per 100 epochs; ~0 => plateau, strongly negative => still
        # on the descent
        'es_loss_tail_slope': tail_slope(epochs, es),
        'train_loss_tail_slope': tail_slope(epochs, train),
        'val_e_rmse_tail_slope': tail_slope(epochs, val_e),
        'val_f_rmse_tail_slope': tail_slope(epochs, val_f),
    }

    def _verdict():
        s_val = slopes['es_loss_tail_slope']
        s_train = slopes['train_loss_tail_slope']
        if s_val is None:
            return 'insufficient data'
        if s_val < -0.02:
            return ('still descending: val es_loss falls '
                    f'{-s_val:.3f} decades/100ep in the tail — train longer')
        if s_train is not None and s_train < -0.02:
            return ('generalization floor: train still falls '
                    f'({s_train:.3f} dec/100ep) while val is flat '
                    f'({s_val:.3f}) — data- or capacity-limited, more '
                    'epochs will not close the gate gap')
        return ('optimization plateau: train and val both flat '
                f'(train {s_train if s_train is not None else float("nan"):.3f}, '
                f'val {s_val:.3f} dec/100ep) — schedule/LR bound')

    out = {
        'epochs_seen': len(epochs),
        'last_epoch': epochs[-1] if epochs else None,
        'best_es_loss': ({'epoch': best_es[0], 'value': best_es[1]}
                         if best_es else None),
        'final_lr': next((v for v in reversed(lr) if v is not None), None),
        'lr_decay_events': lr_events,
        'tail_slopes_log10_per_100ep': slopes,
        'final_val': {'avg_rmse_energies':
                      next((v for v in reversed(val_e) if v is not None),
                           None),
                      'avg_rmse_gradients':
                      next((v for v in reversed(val_f) if v is not None),
                           None)},
        'verdict': _verdict(),
    }
    return out


def plot(run_dir: Path, out_png: Path):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    series = load_series(run_dir)
    epochs = [r['epoch'] for r in series]

    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
    for ax, key, label in (
            (axes[0], 'early_stopping_loss', 'val early-stopping loss'),
            (axes[1], 'val_metrics/avg/rmse_energies',
             'val avg energy RMSE [kcal/mol]'),
            (axes[2], 'lr', 'learning rate')):
        xs = [e for e, r in zip(epochs, series) if r.get(key) is not None]
        ys = [r[key] for r in series if r.get(key) is not None]
        ax.plot(xs, ys, lw=1.2)
        ax.set_yscale('log')
        ax.set_xlabel('epoch')
        ax.set_title(label, fontsize=10)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run-dir',
                    default=str(HERE / 'runs' / 'espaloma-proxy'))
    ap.add_argument('--out', default=str(HERE / 'analysis.json'))
    args = ap.parse_args()
    run_dir = Path(args.run_dir)
    out = analyze(run_dir)
    Path(args.out).write_text(json.dumps(out, indent=1))
    try:
        plot(run_dir, Path(args.out).parent / 'learning_curves.png')
    except Exception as exc:
        print(f'plot failed: {exc}')
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
