"""Espaloma-proxy XL — the published benchmark's data regime (~10k mols).

The committed 2,000-molecule proxy (experiments/espaloma_proxy/) reached
the aspirational accuracy gate at 2400 epochs, and its learning-curve
analysis says the worst chemistry (pubchem-like) is DATA-limited: E RMSE
was still halving per data doubling at the full set. The real espaloma
collection is ~10x larger (reference: dataset_creation/benchmark_datasets/
README.md — spice-pubchem alone has ~13k molecules, table.tex:28 lists
1411 *test* mols for it). This driver scales the same seeded pipeline to
that regime so the framework's loader/compile/HBM behavior and accuracy
are demonstrated at real-benchmark scale:

    proxy-xl-spice-monomers  2500 mols   10-20 atoms  HCNO        8 confs
    proxy-xl-spice-pubchem   3500 mols   18-40 atoms  HCNOS+F/Cl  6 confs
    proxy-xl-peptide         2500 mols   30-60 atoms  HCNO-chain  6 confs
    proxy-xl-rna-like        1500 mols   20-36 atoms  HCNOP       8 confs
                            10000 total (5x the committed proxy)

Everything else — torch-oracle targets from ONE shared environment force
field, deterministic 80/10/10 espaloma-style split, production training
path (scan_epochs, async checkpoints, curriculum, plateau schedule),
bootstrap-CI test eval — is inherited from the espaloma_proxy driver by
rebinding its module constants (the same mechanism its CPU smoke test
uses, so the inheritance is itself under test).

Usage:
  python experiments/espaloma_proxy_xl/run_xl.py generate [--workers N]
  python experiments/espaloma_proxy_xl/run_xl.py train [--epochs 500]
      [--time_limit HOURS]
  python experiments/espaloma_proxy_xl/run_xl.py table
  python experiments/espaloma_proxy_xl/run_xl.py all
"""
import argparse
import os
import sys
from pathlib import Path

HERE = Path(__file__).parent

# 5x the committed SPECS, fresh seed block (131xxx..134xxx molecule seeds
# — disjoint from the 2k proxy's 31xxx..34xxx, so XL is an independent
# draw from the same distributions, not a superset)
SPECS_XL = {
    'proxy-xl-spice-monomers': (2500, 8, 131, [1, 1, 6, 6, 7, 8], (10, 21),
                                'am1BCC'),
    'proxy-xl-spice-pubchem': (3500, 6, 132,
                               [1, 1, 6, 6, 6, 7, 8, 16, 9, 17], (18, 41),
                               'am1BCC'),
    'proxy-xl-peptide': (2500, 6, 133, [1, 1, 1, 6, 6, 6, 7, 8], (30, 61),
                         'amber99'),
    'proxy-xl-rna-like': (1500, 8, 134, [1, 6, 6, 7, 7, 8, 8, 15], (20, 37),
                          'am1BCC'),
}


# Enforced regression ratchet for the XL benchmark: <=10% headroom on the
# 353-epoch on-chip run of 2026-08-21 (TARGET PASS on all four datasets:
# E RMSE 0.43/0.89/0.59/0.68, cF 0.85/1.35/0.73/1.03), capped at the
# 1.0/1.5 target. Tighten when a better run completes; never loosen.
GATE_RATCHET_XL = {
    'proxy-xl-spice-monomers': {'rmse_energies': 0.48,
                                'crmse_gradients': 0.93},
    'proxy-xl-spice-pubchem': {'rmse_energies': 0.98,
                               'crmse_gradients': 1.49},
    'proxy-xl-peptide': {'rmse_energies': 0.65, 'crmse_gradients': 0.81},
    'proxy-xl-rna-like': {'rmse_energies': 0.75, 'crmse_gradients': 1.13},
}


def proxy_module():
    """The espaloma_proxy driver rebound to the XL specs/paths."""
    sys.path.insert(0, str(HERE.parent))
    from espaloma_proxy import run as proxy
    proxy.HERE = HERE
    proxy.CACHE = HERE / 'cache'
    proxy.SPLIT_JSON = HERE / 'espaloma_split_xl.json'
    proxy.SPECS = SPECS_XL
    # disjoint keys (proxy-xl-*), so the 2k proxy's ratchet is untouched
    proxy.GATE_RATCHET = {**proxy.GATE_RATCHET, **GATE_RATCHET_XL}
    return proxy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('stage', choices=['generate', 'train', 'table', 'all'])
    ap.add_argument('--epochs', type=int, default=500)
    ap.add_argument('--workers', type=int, default=8)
    ap.add_argument('--time_limit', type=float, default=None,
                    help='wall-clock bound in hours; the run finalizes and '
                         'frees the chip at the bound (resumable)')
    args = ap.parse_args()
    if args.stage == 'generate':
        # XL data is a FRESH draw (no byte-compat constraint with the
        # committed 2k proxy), so use the jitted f64 JAX minimizer —
        # ~20-60x faster per molecule on one CPU core, equivalent minima
        # (validated vs the torch path in tests/test_energy.py). Set before
        # any jax import; generation must not touch the TPU chip.
        os.environ.setdefault('GRAPPA_TPU_MINIMIZER', 'jax')
        os.environ.setdefault('JAX_ENABLE_X64', 'True')
        os.environ.setdefault('JAX_PLATFORMS', 'cpu')
        os.environ.setdefault('PALLAS_AXON_POOL_IPS', '')
    proxy = proxy_module()
    if args.stage in ('generate', 'all'):
        proxy.generate(workers=args.workers)
    if args.stage in ('train', 'all'):
        proxy.train(epochs=args.epochs, time_limit=args.time_limit)
    if args.stage == 'table':
        proxy.table()


if __name__ == '__main__':
    main()
