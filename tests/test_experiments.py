"""Experiment-harness tests: the ablation driver's config mutations
(reference experiments/ablation/train.py flag surface) actually produce
runnable architectures, and the learning-curve harness (reference
experiments/benchmark_experiments/submit_lc.py + evaluation/lc_benchmark)
collects per-factor test metrics."""
import argparse
import json
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / 'experiments'))

from grappa_tpu.data import MolGraph, collate
from grappa_tpu.data.dataset import Dataset
from grappa_tpu.data.synthetic import make_dataset, make_moldata
from grappa_tpu.models.grappa_model import (get_small_model_config,
                                            make_model)
from grappa_tpu.statistics import param_statistics_from_graphs


def _args(**flags):
    from ablation.train import build_parser
    defaults = build_parser().parse_args([])
    for k, v in flags.items():
        setattr(defaults, k, v)
    return defaults


def test_ablation_config_mutations():
    from ablation.train import main
    cfg = main(argv=['--wrong_symmetry', '--no_gnn_attention',
                     '--with_hybridization', '--no_gated_torsion'],
               dry_run=True)
    mc = cfg['model_config']
    assert mc['wrong_symmetry'] is True
    assert mc['gnn_attentional_layers'] == 0
    assert mc['gnn_convolutions'] > 0          # folded, not dropped
    assert 'sp_hybridization' in mc['in_feat_name']
    assert mc['gated_torsion'] is False
    assert cfg['trainer_config']['name'] == (
        'ablation_hybrid_wrong_sym_no_gnn_att_no_gated_torsion')


def test_ablation_param_attention_fold():
    from ablation.train import main
    base = main(argv=[], dry_run=True)['model_config']
    cfg = main(argv=['--no_param_attention'], dry_run=True)['model_config']
    for term in ('bond', 'angle', 'proper', 'improper'):
        assert cfg[f'{term}_transformer_depth'] == 0
        assert cfg[f'{term}_symmetriser_depth'] == (
            base[f'{term}_symmetriser_depth']
            + base[f'{term}_transformer_depth'])


def test_ablation_unimplemented_flags():
    from ablation.train import main
    with pytest.raises(NotImplementedError):
        main(argv=['--no_scaling'], dry_run=True)
    with pytest.raises(NotImplementedError):
        main(argv=['--exp_to_range'], dry_run=True)


@pytest.mark.parametrize('flags', [
    {'no_param_attention': True},
    {'no_gnn': True},
    {'no_positional_encoding': True, 'harmonic_gate': True},
])
def test_ablated_architectures_run(flags):
    """Every ablated architecture must init + apply (the reference only
    mutates configs; a flag combination that cannot build would fail at
    job time)."""
    from ablation.train import ablated_config
    config = {'model_config': get_small_model_config(),
              'trainer_config': {}}
    config = ablated_config(config, _args(**flags))

    md = make_moldata(seed=3, n_confs=2)
    g = MolGraph.from_moldata(md)
    batch = collate([g])
    stats = param_statistics_from_graphs([g])
    model = make_model(config['model_config'], stats)
    params = model.init(jax.random.key(0), batch)
    pred = model.apply(params, batch)
    assert np.isfinite(np.asarray(pred['n2_k'])).all()


def test_learning_curve_harness(tmp_path):
    """run_lc trains at several subsampling factors and records monotone
    train-mol counts + per-subdataset test metrics; results are cached so
    a rerun adds only missing factors (resumable sweeps)."""
    from lc.run_lc import run_lc

    from grappa_tpu.models.grappa_model import get_small_model_config
    from grappa_tpu.train.config import default_config, overwrite_config

    ds_dir = tmp_path / 'ds'
    Dataset.from_moldata(make_dataset(n_mols=12, n_confs=4, seed=5,
                                      learnable=True),
                         'syn-lc').save(ds_dir)
    config = default_config()
    overwrite_config({
        'model_config': get_small_model_config(),
        'data_config': {
            'datasets': [str(ds_dir)],
            'conf_strategy': 4, 'val_conf_strategy': 4,
            'train_batch_size': 2, 'val_batch_size': 4,
            'partition': [0.5, 0.25, 0.25],
            'pure_train_datasets': [], 'pure_val_datasets': [],
            'weights': {},
        },
        'lit_model_config': {'lr': 2e-4, 'start_qm_epochs': 0,
                             'warmup_steps': 2},
        # scan_epochs: the on-chip sweep's mode — covers the subsampled-
        # loader + whole-epoch-dispatch combination
        'trainer_config': {'max_epochs': 1, 'checkpoint_every': 1,
                           'scan_epochs': True},
        'test_model': False,
    }, config)

    results_path = tmp_path / 'lc_results.json'
    results = run_lc(factors=[1.0, 0.5], epochs=1,
                     out_dir=str(tmp_path / 'runs'),
                     datasets=[str(ds_dir)],
                     results_path=str(results_path), config=config)
    assert set(results) == {'lc_1', 'lc_0.5'}
    assert results['lc_0.5']['train_mols'] < results['lc_1']['train_mols']
    for entry in results.values():
        assert entry['test'], entry
        sub = next(iter(entry['test'].values()))
        assert 'rmse_energies' in sub

    # cached: rerun with one extra factor only trains the new one
    stored = json.loads(results_path.read_text())
    results2 = run_lc(factors=[1.0, 0.5], epochs=1,
                      out_dir=str(tmp_path / 'runs'),
                      datasets=[str(ds_dir)],
                      results_path=str(results_path), config=config)
    assert {k: v['train_mols'] for k, v in results2.items()} == \
        {k: v['train_mols'] for k, v in stored.items()}


@pytest.mark.slow
def test_espaloma_proxy_flow_tiny(tmp_path, monkeypatch):
    """Execute the espaloma-proxy driver end-to-end at tiny scale on CPU —
    generate (cache + committed-split contract), train through the
    production path (tag resolution via GRAPPA_TPU_CACHE, splitpath,
    scan_epochs, summary/table generation), and the resume branch — so a
    real chip run can't die on driver bugs hours in."""
    from espaloma_proxy import run as proxy
    from grappa_tpu.train.config import default_config, overwrite_config

    monkeypatch.setattr(proxy, 'HERE', tmp_path)
    monkeypatch.setattr(proxy, 'CACHE', tmp_path / 'cache')
    monkeypatch.setattr(proxy, 'SPLIT_JSON', tmp_path / 'split.json')
    monkeypatch.setattr(proxy, 'SPECS', {
        'proxy-spice-monomers': (4, 2, 31, [1, 1, 6, 8], (6, 9), 'am1BCC'),
        'proxy-peptide': (4, 2, 33, [1, 1, 6, 7, 8], (6, 9), 'amber99'),
    })
    monkeypatch.delenv('GRAPPA_TPU_CACHE', raising=False)

    split = proxy.generate(workers=2)
    assert (tmp_path / 'split.json').exists()
    assert len(split['test']) == 1 and len(split['val']) == 1
    # re-running must reproduce the committed split byte-for-byte
    proxy.generate(workers=2)

    config = default_config()
    overwrite_config({
        'model_config': get_small_model_config(),
        'data_config': {'train_batch_size': 2, 'val_batch_size': 4,
                        'test_batch_size': 4},
        'lit_model_config': {'lr': 2e-4, 'start_qm_epochs': 0,
                             'warmup_steps': 2},
        'trainer_config': {'checkpoint_every': 1},
        'test_model': False,
    }, config)
    summary = proxy.train(epochs=2, out_dir=str(tmp_path / 'runs'),
                          base_config=config)
    assert summary['test'], summary
    assert all('rmse_energies' in m for m in summary['test'].values())
    assert (tmp_path / 'proxy_results.json').exists()
    assert (tmp_path / 'table.md').exists()
    assert json.loads((tmp_path / 'gate.json').read_text())['per_dataset']

    # interrupted-run branch: last.ckpt exists -> resume to the new target
    summary2 = proxy.train(epochs=3, out_dir=str(tmp_path / 'runs'),
                           base_config=config)
    assert summary2['test'], summary2
    stored = json.loads((tmp_path / 'proxy_results.json').read_text())
    assert stored['test'] == summary2['test']

    # --time_limit plumbing: the bound must land where Trainer.fit reads it
    # (lit_model_config.session_time_limit), stop the run early, and still
    # finalize; it must NOT use the cumulative time_limit key (a resume
    # would exit immediately)
    from grappa_tpu.train.config import read_yaml
    run_yaml = tmp_path / 'runs' / 'espaloma-proxy' / 'grappa_config.yaml'
    summary3 = proxy.train(epochs=50, out_dir=str(tmp_path / 'runs'),
                           base_config=config, time_limit=1e-9)
    stored_cfg = read_yaml(run_yaml)
    assert stored_cfg['lit_model_config']['session_time_limit'] == 1e-9
    assert stored_cfg['lit_model_config']['time_limit'] != 1e-9
    assert summary3['epoch'] < 50  # bound fired, run finalized anyway
    assert summary3['test'], summary3

    # a later UNBOUNDED resume must clear the stored session bound and
    # train on to the epoch target instead of exiting at the stale bound
    summary4 = proxy.train(epochs=summary3['epoch'] + 1,
                           out_dir=str(tmp_path / 'runs'), base_config=config)
    stored_cfg = read_yaml(run_yaml)
    assert stored_cfg['lit_model_config']['session_time_limit'] is None
    assert summary4['epoch'] == summary3['epoch'] + 1


def test_espaloma_proxy_xl_flow_tiny(tmp_path, monkeypatch):
    """The XL driver rebinds the espaloma_proxy module to its own
    specs/paths and runs the same production flow — executed end-to-end at
    tiny scale on CPU (generate, split, train, table) before the real ~10k
    molecule chip run. Also checks the published weighting pattern follows
    the renamed XL datasets."""
    from espaloma_proxy import run as eprun
    from espaloma_proxy_xl import run_xl
    from grappa_tpu.train.config import default_config, overwrite_config

    # register the proxy module's original attrs for teardown restoration
    for attr in ('HERE', 'CACHE', 'SPLIT_JSON', 'SPECS'):
        monkeypatch.setattr(eprun, attr, getattr(eprun, attr))
    monkeypatch.setattr(run_xl, 'HERE', tmp_path)
    monkeypatch.setattr(run_xl, 'SPECS_XL', {
        'proxy-xl-spice-monomers': (4, 2, 131, [1, 1, 6, 8], (6, 9),
                                    'am1BCC'),
        'proxy-xl-rna-like': (4, 2, 134, [1, 6, 7, 8, 15], (6, 9),
                              'am1BCC'),
    })
    monkeypatch.delenv('GRAPPA_TPU_CACHE', raising=False)

    proxy = run_xl.proxy_module()
    assert proxy.CACHE == tmp_path / 'cache'
    split = proxy.generate(workers=2)
    assert (tmp_path / 'espaloma_split_xl.json').exists()
    assert len(split['test']) == 1

    config = default_config()
    overwrite_config({
        'model_config': get_small_model_config(),
        'data_config': {'train_batch_size': 2, 'val_batch_size': 4,
                        'test_batch_size': 4},
        'lit_model_config': {'lr': 2e-4, 'start_qm_epochs': 0,
                             'warmup_steps': 2},
        'trainer_config': {'checkpoint_every': 1},
        'test_model': False,
    }, config)
    summary = proxy.train(epochs=1, out_dir=str(tmp_path / 'runs'),
                          base_config=config)
    assert summary['test'] and all(
        ds.startswith('proxy-xl-') for ds in summary['test'])
    assert (tmp_path / 'proxy_results.json').exists()
    assert (tmp_path / 'gate.json').exists()
    # the weighting pattern followed the XL names
    from grappa_tpu.train.config import read_yaml
    stored = read_yaml(tmp_path / 'runs' / 'espaloma-proxy'
                       / 'grappa_config.yaml')
    assert stored['data_config']['weights'] == {'proxy-xl-rna-like': 3.0}


def test_ablation_benchmark_flow_tiny(tmp_path, monkeypatch):
    """Execute the on-chip ablation benchmark driver end-to-end at tiny
    scale on CPU — arm config mutation, training through the production
    path, per-arm result caching (idempotency), and the comparison table —
    so the real chip run can't die on driver bugs (same discipline as
    test_espaloma_proxy_flow_tiny)."""
    from ablation import run_ablation as abl
    from espaloma_proxy import run as proxy
    from grappa_tpu.train.config import default_config, overwrite_config

    monkeypatch.setattr(proxy, 'HERE', tmp_path)
    monkeypatch.setattr(proxy, 'CACHE', tmp_path / 'cache')
    monkeypatch.setattr(proxy, 'SPLIT_JSON', tmp_path / 'split.json')
    monkeypatch.setattr(proxy, 'SPECS', {
        'proxy-spice-monomers': (4, 2, 31, [1, 1, 6, 8], (6, 9), 'am1BCC'),
        'proxy-peptide': (4, 2, 33, [1, 1, 6, 7, 8], (6, 9), 'amber99'),
    })
    monkeypatch.setenv('GRAPPA_TPU_CACHE', str(tmp_path / 'cache'))
    monkeypatch.setattr(abl, 'PROXY', tmp_path)
    proxy.generate(workers=2)

    config = default_config()
    overwrite_config({
        'model_config': get_small_model_config(),
        'data_config': {'train_batch_size': 2, 'val_batch_size': 4,
                        'test_batch_size': 4},
        'lit_model_config': {'lr': 2e-4, 'start_qm_epochs': 0,
                             'warmup_steps': 2},
        'trainer_config': {'checkpoint_every': 1},
        'test_model': False,
    }, config)

    results = abl.run_ablation(
        arms=['baseline', 'wrong_symmetry'], epochs=2,
        out_dir=str(tmp_path / 'runs'),
        results_path=str(tmp_path / 'ablation_results.json'),
        base_config=config,
        datasets=['proxy-spice-monomers', 'proxy-peptide'],
        splitpath=str(tmp_path / 'split.json'))
    assert set(results) == {'baseline', 'wrong_symmetry'}
    for arm, r in results.items():
        assert r['test'] and all(
            'rmse_energies' in m for m in r['test'].values()), (arm, r)
    # the wrong_symmetry arm actually flipped the model flag
    import yaml
    stored = yaml.safe_load(
        (tmp_path / 'runs' / 'abl-wrong_symmetry'
         / 'grappa_config.yaml').read_text())
    assert stored['model_config']['wrong_symmetry'] is True
    table_md = (tmp_path / 'ablation_table.md').read_text()
    assert 'wrong_symmetry' in table_md and 'proxy-peptide' in table_md

    # idempotency: a second invocation skips both cached arms (no training)
    import grappa_tpu.train.run as run_mod
    monkeypatch.setattr(run_mod, 'do_trainrun',
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError('must not retrain cached arm')))
    again = abl.run_ablation(
        arms=['baseline', 'wrong_symmetry'], epochs=2,
        out_dir=str(tmp_path / 'runs'),
        results_path=str(tmp_path / 'ablation_results.json'),
        base_config=config,
        datasets=['proxy-spice-monomers', 'proxy-peptide'],
        splitpath=str(tmp_path / 'split.json'))
    assert again == results


def test_hpo_driver_flow_tiny(tmp_path, monkeypatch):
    """The HPO sweep driver end-to-end at tiny scale on CPU: spec applies
    to the real benchmark config, trials run through the production path,
    and the report ranks them — so the chip sweep can't die on driver
    bugs. The real SPEC's dotted paths must all resolve against the
    benchmark yaml (set_dotted raises on unknown keys)."""
    from espaloma_proxy import run as proxy
    from hpo import run_hpo as hpo
    from grappa_tpu.train.config import default_config, overwrite_config
    from grappa_tpu.train.sweep import set_dotted

    # every production spec path resolves against the real base config
    cfg = hpo.build_base_config(epochs=150)
    for path in hpo.SPEC:
        set_dotted(cfg, path, {'lit_model_config.lr': 1e-5,
                               'data_config.train_batch_size': 16,
                               'lit_model_config.patience': 10,
                               'lit_model_config.lr_decay': 0.7}[path])
    assert cfg['lit_model_config']['finish_criterion']
    assert cfg['test_model'] is False

    monkeypatch.setattr(proxy, 'HERE', tmp_path)
    monkeypatch.setattr(proxy, 'CACHE', tmp_path / 'cache')
    monkeypatch.setattr(proxy, 'SPLIT_JSON', tmp_path / 'split.json')
    monkeypatch.setattr(proxy, 'SPECS', {
        'proxy-spice-monomers': (4, 2, 31, [1, 1, 6, 8], (6, 9), 'am1BCC'),
    })
    monkeypatch.setenv('GRAPPA_TPU_CACHE', str(tmp_path / 'cache'))
    proxy.generate(workers=2)

    config = default_config()
    overwrite_config({
        'model_config': get_small_model_config(),
        'data_config': {'datasets': ['proxy-spice-monomers'],
                        'splitpath': str(tmp_path / 'split.json'),
                        'train_batch_size': 2, 'val_batch_size': 4,
                        'test_batch_size': 4},
        'lit_model_config': {'lr': 2e-4, 'start_qm_epochs': 0,
                             'warmup_steps': 2},
        'test_model': False,
    }, config)
    best = hpo.run_hpo(trials=2, epochs=1, out_dir=str(tmp_path / 'sweep'),
                       base_config=config,
                       spec={'lit_model_config.lr':
                             ('log_uniform', 1e-4, 3e-4)},
                       method='random')
    assert best['trial'] is not None
    scored = hpo.report(out_dir=str(tmp_path / 'sweep'),
                        path=str(tmp_path / 'hpo_summary.md'))
    assert len(scored) == 2
    md = (tmp_path / 'hpo_summary.md').read_text()
    assert 'es_loss' in md and '000' in md


def test_espaloma_proxy_table_stage(tmp_path):
    """The table stage renders proxy_results.json into the espaloma-style
    markdown/LaTeX tables (reference experiments/evaluation/
    espaloma_benchmark/make_tex_table.py) and evaluates the regression
    gate, independent of whether the on-chip run has happened."""
    from espaloma_proxy.run import GATE, table
    results = {'test': {
        'proxy-peptide': {'rmse_energies': 0.6, 'rmse_gradients': 1.9,
                          'crmse_gradients': 0.7,
                          'rmse_energies_ci': [0.5, 0.7]},
        'proxy-rna-like': {'rmse_energies': 3.4, 'rmse_gradients': 2.1,
                           'crmse_gradients': 0.9},
    }}
    (tmp_path / 'proxy_results.json').write_text(json.dumps(results))
    verdict = table(out_dir=tmp_path)
    # rna-like energy 3.4 exceeds its RATCHET ceiling -> enforced fail
    assert not verdict['pass']
    assert verdict['per_dataset']['proxy-peptide'] == {
        'rmse_energies': True, 'crmse_gradients': True}
    assert not verdict['per_dataset']['proxy-rna-like']['rmse_energies']
    # the aspirational target is evaluated separately
    assert not verdict['target_pass']
    assert verdict['per_dataset_target']['proxy-peptide']['rmse_energies']
    md = (tmp_path / 'table.md').read_text()
    assert 'proxy-peptide' in md and '[0.5,0.7]' in md
    tex = (tmp_path / 'table.tex').read_text()
    assert r'\begin{table}' in tex and 'proxy-rna-like' in tex
    assert json.loads((tmp_path / 'gate.json').read_text())['limits'] == GATE

    # PROMOTION (run.py GATE_RATCHET): since the 2400-epoch run reached the
    # aspirational target, every ratchet ceiling is capped at the target —
    # a ratchet PASS now implies a target PASS on the ratcheted datasets
    from espaloma_proxy.run import GATE_RATCHET, GATE_TARGET, ratchet_limits
    for ds, lims in GATE_RATCHET.items():
        for key, lim in lims.items():
            assert lim <= GATE_TARGET[key], (ds, key)
    # results just inside every ratchet ceiling pass both tiers
    rna_ceiling = ratchet_limits('proxy-rna-like')['rmse_energies']
    results['test']['proxy-rna-like']['rmse_energies'] = rna_ceiling - 0.01
    (tmp_path / 'proxy_results.json').write_text(json.dumps(results))
    v = table(out_dir=tmp_path)
    assert v['pass'] and v['target_pass']
    # ... and a result between the ratchet and the target fails enforcement
    # (the ratchet never loosens back to the bare target)
    results['test']['proxy-rna-like']['rmse_energies'] = (
        rna_ceiling + GATE_TARGET['rmse_energies']) / 2
    (tmp_path / 'proxy_results.json').write_text(json.dumps(results))
    v = table(out_dir=tmp_path)
    assert not v['pass'] and v['target_pass']


PROXY_RESULTS = (Path(__file__).parent.parent / 'experiments'
                 / 'espaloma_proxy' / 'proxy_results.json')


@pytest.mark.skipif(not PROXY_RESULTS.exists(),
                    reason='espaloma-proxy benchmark has not run yet '
                           '(needs the real chip)')
def test_espaloma_proxy_regression_gates():
    """The offline accuracy benchmark's ENFORCED gate (RESULTS.md): every
    subdataset must stay inside its ratchet ceiling (calibrated to the best
    completed on-chip run + headroom, experiments/espaloma_proxy/run.py
    GATE_RATCHET) so accuracy regressions fail the suite in later rounds.
    The aspirational 1.0/1.5 target was REACHED by the 2400-epoch run
    (2026-08-20) and is now enforced too — both explicitly here and
    implicitly via the target-capped ratchet ceilings."""
    from espaloma_proxy.run import GATE_TARGET, ratchet_limits
    results = json.loads(PROXY_RESULTS.read_text())
    test_metrics = results.get('test') or {}
    assert test_metrics, results
    for ds, m in test_metrics.items():
        if ds == 'avg':
            continue
        lims = ratchet_limits(ds)
        for key, lim in lims.items():
            assert m[key] <= min(lim, GATE_TARGET[key]), \
                (ds, key, m[key], lim)


def test_proxy_analyze_verdicts(tmp_path):
    """The convergence analyzer classifies the three regimes it exists to
    distinguish (still-descending / generalization floor / plateau) and
    records LR decay events."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'proxy_analyze', Path(__file__).parent.parent /
        'experiments' / 'espaloma_proxy' / 'analyze.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def write_run(dirname, train_fn, val_fn, lr_fn):
        d = tmp_path / dirname
        d.mkdir()
        with open(d / 'metrics.jsonl', 'w') as f:
            for e in range(100):
                f.write(json.dumps({'epoch': e, 'time': float(e),
                                    'train_loss': train_fn(e),
                                    'lr': lr_fn(e)}) + '\n')
                f.write(json.dumps({
                    'epoch': e, 'time': float(e) + 0.5,
                    'early_stopping_loss': val_fn(e),
                    'val_metrics/avg/rmse_energies': val_fn(e),
                    'val_metrics/avg/rmse_gradients': val_fn(e)}) + '\n')
        return d

    descending = mod.analyze(write_run(
        'a', lambda e: 10 ** (-e / 50), lambda e: 10 ** (1 - e / 50),
        lambda e: 1e-4))
    assert 'still descending' in descending['verdict']
    assert descending['best_es_loss']['epoch'] == 99

    gen_floor = mod.analyze(write_run(
        'b', lambda e: 10 ** (-e / 50),
        lambda e: 2.0 if e > 30 else 10 - e * 0.25,
        lambda e: 1e-4))
    assert 'generalization floor' in gen_floor['verdict']

    plateau = mod.analyze(write_run(
        'c', lambda e: 3.0, lambda e: 2.0,
        lambda e: 1e-4 if e < 50 else 5e-5))
    assert 'optimization plateau' in plateau['verdict']
    assert plateau['lr_decay_events'] == [
        {'epoch': 50, 'from': 1e-4, 'to': 5e-5}]


def test_espaloma_proxy_xl_regression_gates():
    """Enforced gate for the XL (10k-molecule) benchmark: the committed
    353-epoch record reached the aspirational 1.0/1.5 target on all four
    chemistries (2026-08-21); every subdataset must stay inside its
    ratchet ceiling (run_xl.GATE_RATCHET_XL, <=10% headroom capped at the
    target) so accuracy regressions fail the suite."""
    from espaloma_proxy.run import GATE_TARGET
    from espaloma_proxy_xl.run_xl import GATE_RATCHET_XL
    results_path = (Path(__file__).parent.parent / 'experiments'
                    / 'espaloma_proxy_xl' / 'proxy_results.json')
    results = json.loads(results_path.read_text())
    test_metrics = results.get('test') or {}
    assert set(GATE_RATCHET_XL) <= set(test_metrics), test_metrics.keys()
    for ds, lims in GATE_RATCHET_XL.items():
        m = test_metrics[ds]
        for key, lim in lims.items():
            assert m[key] <= min(lim, GATE_TARGET[key]), \
                (ds, key, m[key], lim)
    gate = json.loads((results_path.parent / 'gate.json').read_text())
    assert gate['pass'] and gate['target_pass'], gate
