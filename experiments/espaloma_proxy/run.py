"""Espaloma-scale OFFLINE accuracy proxy benchmark.

The real espaloma benchmark (reference: experiments/evaluation/
espaloma_benchmark/, BASELINE.md table) cannot run here — zero egress means
no espaloma archives and no published checkpoint. This experiment is the
stand-in that makes *accuracy regressions measurable round over round*:

  * 2,000 molecules in FOUR chemistries mirroring the published collection's
    axes (element palette, size distribution, charge model, conformer count):
      proxy-spice-monomers  500 mols  10-20 atoms  HCNO        am1BCC  8 confs
      proxy-spice-pubchem   700 mols  18-40 atoms  HCNOS+F/Cl  am1BCC  6 confs
      proxy-peptide         500 mols  30-60 atoms  HCNO-chain  amber99 6 confs
      proxy-rna-like        300 mols  20-36 atoms  HCNOP       am1BCC  8 confs
  * all targets computed by the independent torch oracle from ONE shared
    environment force field (data/synthetic.py:environment_parameters), so
    held-out-molecule RMSE measures real generalization;
  * a FIXED espaloma-style split json committed next to this script
    (10% test / 10% val, deterministic), consumed through the production
    `splitpath` mechanism exactly like the published benchmark;
  * training through the real production path: the benchmark yaml
    (experiments/benchmark/grappa_config.yaml), tag resolution via the zoo
    cache, weighted multi-dataset loader, curriculum/warmup/plateau schedule,
    bootstrap-CI test evaluation per subdataset.

Targets (regression gate, see RESULTS.md): test rmse_energies <= 1.0
kcal/mol and crmse_gradients <= 1.5 kcal/mol/A on every subdataset.

Usage:
  python experiments/espaloma_proxy/run.py generate   # build + cache data
  python experiments/espaloma_proxy/run.py train [--epochs 150]
  python experiments/espaloma_proxy/run.py table      # table.md/.tex + gate
  python experiments/espaloma_proxy/run.py all
"""
import argparse
import json
import os
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

HERE = Path(__file__).parent
CACHE = HERE / 'cache'
SPLIT_JSON = HERE / 'espaloma_split.json'

# (n_mols, n_confs, seed, elements, atom_range, charge_model); element
# repeats raise the draw probability (H-rich palettes for organic realism)
SPECS = {
    'proxy-spice-monomers': (500, 8, 31, [1, 1, 6, 6, 7, 8], (10, 21),
                             'am1BCC'),
    'proxy-spice-pubchem': (700, 6, 32, [1, 1, 6, 6, 6, 7, 8, 16, 9, 17],
                            (18, 41), 'am1BCC'),
    'proxy-peptide': (500, 6, 33, [1, 1, 1, 6, 6, 6, 7, 8], (30, 61),
                      'amber99'),
    'proxy-rna-like': (300, 8, 34, [1, 6, 6, 7, 7, 8, 8, 15], (20, 37),
                       'am1BCC'),
}


def _one_moldata(task):
    tag, seed, n_confs, elements, atom_range, charge_model = task
    os.environ.setdefault('OMP_NUM_THREADS', '1')
    import torch
    torch.set_num_threads(1)
    from grappa_tpu.data.synthetic import make_moldata
    return make_moldata(seed=seed, n_confs=n_confs, ds_name=tag,
                        learnable=True, conf_noise=0.08,
                        charge_model=charge_model, elements=elements,
                        atom_range=atom_range)


def generate(workers: int = 8):
    from grappa_tpu.data.dataset import Dataset
    all_ids = []
    for tag, (n_mols, n_confs, seed, elements, rng, cm) in SPECS.items():
        out = CACHE / 'datasets' / tag
        if out.exists():
            ds = Dataset.load(out)
            print(f'{tag}: cached ({len(ds)} mols)')
            all_ids += ds.mol_ids
            continue
        tasks = [(tag, seed * 1000 + i, n_confs, elements, rng, cm)
                 for i in range(n_mols)]
        with ProcessPoolExecutor(max_workers=workers) as ex:
            mds = list(ex.map(_one_moldata, tasks, chunksize=8))
        ds = Dataset.from_moldata(mds, tag)
        ds.save(out)
        all_ids += ds.mol_ids
        print(f'{tag}: generated {len(ds)} mols')

    # fixed deterministic espaloma-style split: sort ids, every 10th is
    # test, the next each time is val -> 80/10/10
    from grappa_tpu.espaloma_split import (build_espaloma_split,
                                           save_espaloma_split)
    ids = sorted(all_ids)
    split = build_espaloma_split(ids, te_smiles=ids[::10],
                                 vl_smiles=ids[1::10])
    if SPLIT_JSON.exists():
        stored = json.loads(SPLIT_JSON.read_text())
        if stored != split:
            raise RuntimeError(
                'regenerated split differs from the committed '
                f'{SPLIT_JSON} — generation is no longer deterministic')
        print('split matches the committed espaloma_split.json')
    else:
        save_espaloma_split(split, SPLIT_JSON)
        print(f'wrote {SPLIT_JSON}')
    return split


def train(epochs: int = 150, out_dir: str = None, base_config: dict = None,
          time_limit: float = None):
    """Train through the production path. `base_config` (default: the
    benchmark yaml) exists so the whole flow — config mutation, tag
    resolution through GRAPPA_TPU_CACHE, splitpath, resume, summary/table
    generation — can be smoke-tested at tiny scale on CPU before a real
    chip run commits hours to it (tests/test_experiments.py)."""
    import copy
    os.environ['GRAPPA_TPU_CACHE'] = str(CACHE)
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from grappa_tpu.train.config import read_yaml
    from grappa_tpu.train.run import do_trainrun, resume_trainrun

    config = (copy.deepcopy(base_config) if base_config is not None else
              read_yaml(HERE.parent / 'benchmark' / 'grappa_config.yaml'))
    config['data_config'].update({
        'datasets': sorted(SPECS),
        'pure_train_datasets': [], 'pure_val_datasets': [],
        # mirror the published weighting pattern: upweight the scarce
        # RNA-like set, downweight the big pubchem-like set (keyed off the
        # live SPECS so the XL variant's renamed datasets inherit it)
        'weights': {**{n: 3.0 for n in SPECS if n.endswith('rna-like')},
                    **{n: 0.8 for n in SPECS
                       if n.endswith('spice-pubchem')}},
        'splitpath': str(SPLIT_JSON),
        'conf_strategy': 8, 'val_conf_strategy': 8,
    })
    config['trainer_config']['max_epochs'] = epochs
    config['trainer_config']['name'] = 'espaloma-proxy'
    # one jit dispatch per epoch (exact-equivalence tested): the dominant
    # cost on the tunneled chip is per-step dispatch latency
    config['trainer_config']['scan_epochs'] = True
    # stream checkpoints on a background thread: synchronous saves were
    # ~90% of the measured 31.6 s proxy epoch (benchmarks/epoch_profile.py)
    config['trainer_config']['async_checkpoints'] = True
    if time_limit is not None:
        # wall-clock bound (hours): the run checkpoints, finalizes (test
        # eval + model export) and RELEASES THE CHIP at the bound even if
        # the epoch target is not reached — resumable to the target later.
        # session_time_limit (NOT time_limit) is where Trainer.fit reads a
        # per-session bound; time_limit is cumulative across resumes and
        # would make a resumed bounded run exit immediately.
        config['lit_model_config']['session_time_limit'] = float(time_limit)

    run_dir = Path(out_dir or str(HERE / 'runs')) / 'espaloma-proxy'
    if (run_dir / 'last.ckpt').exists():
        # a previous attempt was interrupted (this environment's chip tunnel
        # drops occasionally) — continue to the requested absolute epoch
        # target (update the stored config if --epochs changed it)
        from grappa_tpu.train.config import write_yaml
        stored = read_yaml(run_dir / 'grappa_config.yaml')
        tc = stored['trainer_config']
        # sync the dispatch knobs too: a run checkpointed before a driver
        # change must resume with the driver's current execution mode
        wanted = {'max_epochs': epochs, 'scan_epochs': True,
                  'async_checkpoints': True}
        changed = {k: v for k, v in wanted.items() if tc.get(k) != v}
        if changed:
            tc.update(changed)
        # ALWAYS reconcile the session bound: set it when the flag is given,
        # clear it when absent — a limit stored by an earlier bounded run
        # must not silently persist into a later unbounded resume
        lc = stored['lit_model_config']
        want_session = float(time_limit) if time_limit is not None else None
        if lc.get('session_time_limit') != want_session:
            lc['session_time_limit'] = want_session
            changed['session_time_limit'] = want_session
        if changed:
            write_yaml(stored, run_dir / 'grappa_config.yaml')
            print(f'updated stored config: {changed}')
        print(f'resuming interrupted run from {run_dir}/last.ckpt')
        out = resume_trainrun(str(run_dir), cache_batches=True)
    else:
        out = do_trainrun(config, project_dir=str(run_dir.parent),
                          run_name='espaloma-proxy', cache_batches=True)
    results = out['results']
    # the bootstrap test metrics are stored in the exported model_dict
    from grappa_tpu.train.export import load_model_dict
    md = load_model_dict(out['model_dict_path'])
    summary = {
        'epoch': results.get('epochs'),   # absolute epoch reached
        'epochs_run': len(results.get('history', [])),  # this session only
        'best_es_loss': min(
            (h['early_stopping_loss'] for h in results.get('history', [])
             if h.get('early_stopping_loss') is not None), default=None),
        'test': (md.get('results') or {}).get('test'),
    }
    (HERE / 'proxy_results.json').write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1))
    try:
        table()
    except Exception as exc:  # results are already on disk — don't lose them
        print(f'table generation failed (rerun the table stage): {exc}')
    return summary


# Two-tier gate (RESULTS.md), on the 10% held-out test split:
#
# * TARGET — the aspirational 1.0/1.5 limits. REACHED by the 2400-epoch
#   run (2026-08-20, all four datasets) and therefore now ENFORCED, per
#   the promotion contract below: every ratchet ceiling is capped at the
#   target, so a ratchet PASS implies a target PASS.
# * RATCHET — the enforced regression gate: per-dataset ceilings
#   calibrated to the best completed on-chip run with ~15% headroom, so
#   any future accuracy regression fails the test suite. TIGHTEN these
#   whenever a better run completes; never loosen.
GATE_TARGET = {'rmse_energies': 1.0, 'crmse_gradients': 1.5}
# calibrated 2026-08-20 from the 2400-epoch on-chip run (table.md,
# analysis.json: optimization plateau, LR decayed to 2.7e-7): <=10%
# headroom on the record, capped at GATE_TARGET (the promotion)
GATE_RATCHET = {
    'proxy-spice-monomers': {'rmse_energies': 0.42, 'crmse_gradients': 0.86},
    'proxy-spice-pubchem': {'rmse_energies': 0.90, 'crmse_gradients': 1.50},
    'proxy-peptide':       {'rmse_energies': 0.62, 'crmse_gradients': 0.74},
    'proxy-rna-like':      {'rmse_energies': 0.67, 'crmse_gradients': 1.00},
}
GATE = GATE_TARGET   # back-compat name: the aspirational limits


def ratchet_limits(ds_name: str) -> dict:
    """Enforced ceilings for a dataset (target limits for unknown names)."""
    return GATE_RATCHET.get(ds_name, GATE_TARGET)


def table(out_dir: Path = None):
    """Render proxy_results.json into the espaloma-style results table
    (counterpart of reference experiments/evaluation/espaloma_benchmark/
    make_table_dict.py -> make_tex_table.py -> table.tex) and evaluate the
    regression gate. Writes table.md, table.tex, gate.json."""
    out_dir = Path(out_dir) if out_dir else HERE
    summary = json.loads((out_dir / 'proxy_results.json').read_text())
    test = summary.get('test') or {}
    if not test:
        raise RuntimeError('proxy_results.json has no test metrics yet')
    from grappa_tpu.train.report import write_report
    write_report({'grappa_tpu': test}, str(out_dir / 'table'), with_ci=True)

    def check(m, limits):
        return {k: (m.get(k) is not None and float(m[k]) <= lim)
                for k, lim in limits.items()}

    per_ds = {ds: m for ds, m in test.items() if ds != 'avg'}
    ratchet = {ds: check(m, ratchet_limits(ds)) for ds, m in per_ds.items()}
    target = {ds: check(m, GATE_TARGET) for ds, m in per_ds.items()}
    ok = bool(ratchet) and all(all(v.values()) for v in ratchet.values())
    target_ok = bool(target) and all(all(v.values())
                                     for v in target.values())
    verdict = {'pass': ok, 'target_pass': target_ok,
               'limits': GATE_TARGET, 'ratchet_limits': GATE_RATCHET,
               'per_dataset': ratchet, 'per_dataset_target': target}
    (out_dir / 'gate.json').write_text(json.dumps(verdict, indent=1))
    print(f'wrote {out_dir}/table.md .tex; '
          f'regression gate: {"PASS" if ok else "FAIL"}; '
          f'aspirational target: {"PASS" if target_ok else "not reached"}')
    return verdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('stage', choices=['generate', 'train', 'table', 'all'])
    ap.add_argument('--epochs', type=int, default=150)
    ap.add_argument('--workers', type=int, default=8)
    ap.add_argument('--time_limit', type=float, default=None,
                    help='wall-clock bound in hours; the run finalizes and '
                         'frees the chip at the bound (resumable)')
    args = ap.parse_args()
    if args.stage in ('generate', 'all'):
        generate(workers=args.workers)
    if args.stage in ('train', 'all'):
        train(epochs=args.epochs, time_limit=args.time_limit)
    if args.stage == 'table':
        table()


if __name__ == '__main__':
    main()
