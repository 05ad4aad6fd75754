"""Orchestrator + CLI tests: do_trainrun end-to-end on a saved dataset,
metric logging, model export + eval CLI, bootstrap evaluator."""
import json
from pathlib import Path

import numpy as np
import pytest

from grappa_tpu.data.dataset import Dataset
from grappa_tpu.data.synthetic import make_dataset
from grappa_tpu.models.grappa_model import get_small_model_config
from grappa_tpu.train.config import default_config, overwrite_config
from grappa_tpu.train.eval_model import (
    BootstrapEvaluator, classical_ff_metrics, eval_model)


def _small_config(dataset_dir=None, max_epochs=3):
    config = default_config()
    overwrite_config({
        'model_config': get_small_model_config(),
        'data_config': {
            'datasets': [str(dataset_dir)] if dataset_dir else [],
            'conf_strategy': 4, 'val_conf_strategy': 4,
            'train_batch_size': 4, 'val_batch_size': 4,
            'partition': [0.7, 0.3, 0.0],
            'pure_train_datasets': [], 'pure_val_datasets': [],
            'weights': {},
        },
        'lit_model_config': {
            'lr': 2e-4, 'start_qm_epochs': 1, 'warmup_steps': 3,
            'time_limit': 0.2,
        },
        'trainer_config': {'max_epochs': max_epochs, 'checkpoint_every': 2},
        'test_model': True,
    }, config)
    return config


@pytest.mark.slow
def test_do_trainrun_end_to_end(tmp_path):
    from grappa_tpu.train.run import do_trainrun

    ds_dir = tmp_path / 'ds'
    Dataset.from_moldata(make_dataset(n_mols=8, n_confs=4, seed=0),
                         'syn').save(ds_dir)
    config = _small_config(ds_dir)

    out = do_trainrun(config, project_dir=str(tmp_path / 'runs'),
                      run_name='smoke')
    run_dir = Path(out['run_dir'])
    assert (run_dir / 'grappa_config.yaml').exists()
    assert (run_dir / 'split.json').exists()
    assert (run_dir / 'param_statistics.json').exists()
    assert (run_dir / 'metrics.jsonl').exists()
    assert (run_dir / 'last.ckpt' / 'params.msgpack').exists()
    assert Path(out['model_dict_path']).exists()

    # metrics stream has train + val events
    lines = [json.loads(l) for l in
             (run_dir / 'metrics.jsonl').read_text().splitlines()]
    assert any('train_loss' in l for l in lines)
    assert any(any(k.startswith('val_metrics') for k in l) for l in lines)

    # exported model loads and predicts through the top-level API
    from grappa_tpu.api import Grappa
    from grappa_tpu.data.synthetic import random_molecule
    ff = Grappa.from_tag(out['model_dict_path'])
    params_out = ff.predict(random_molecule(seed=5), check_eq_values=False)
    assert np.isfinite(params_out.bond_k).all()

    # eval CLI runs on the exported model
    from grappa_tpu.cli import main
    out_json = tmp_path / 'eval.json'
    rc = main(['eval', '-t', out['model_dict_path'], '-d', str(ds_dir),
               '--set', 'val', '--n-bootstrap', '50',
               '-o', str(out_json)])
    assert rc == 0
    results = json.loads(out_json.read_text())
    assert 'grappa_tpu' in results
    entry = results['grappa_tpu']['syn']
    assert 'rmse_energies' in entry and 'rmse_energies_ci' in entry
    lo, hi = entry['rmse_energies_ci']
    assert lo <= entry['rmse_energies'] <= hi


def test_bootstrap_evaluator_cis():
    ev = BootstrapEvaluator()
    rng = np.random.default_rng(0)
    for _ in range(40):
        n_e, n_g = 10.0, 100.0
        ev.add_molecule('ds', float(rng.uniform(5, 15)), n_e,
                        float(rng.uniform(50, 150)), n_g)
    m = ev.pool(n_bootstrap=200)['ds']
    lo, hi = m['rmse_energies_ci']
    assert lo < m['rmse_energies'] < hi
    assert (hi - lo) < m['rmse_energies']  # reasonably tight for n=40


def test_classical_ff_metrics():
    mds = make_dataset(n_mols=3, n_confs=4, seed=3)
    for md in mds:
        # a fake classical FF: exact target + noise
        md.ff_energy['fake_ff'] = md.energy_ref + 1.0  # constant off -> centered out
        md.ff_gradient['fake_ff'] = md.gradient_ref + 0.5
    ds = Dataset.from_moldata(mds, 'syn')
    out = classical_ff_metrics(ds, n_bootstrap=0)
    assert 'fake_ff' in out
    assert out['fake_ff']['syn']['rmse_energies'] < 1e-5  # shift centered away
    # rmse_gradients is per 3-vector = sqrt(3) * component RMSE
    np.testing.assert_allclose(out['fake_ff']['syn']['crmse_gradients'], 0.5,
                               rtol=1e-5)
    # 'qm' is skipped by default, reference_ff present from synthetic data
    assert 'qm' not in out


@pytest.mark.slow
def test_sweep(tmp_path):
    """Random-search sweep runs trials and records the best."""
    from grappa_tpu.train.sweep import run_sweep

    ds = Dataset.from_moldata(make_dataset(n_mols=6, n_confs=3, seed=1),
                              'syn')
    config = _small_config(max_epochs=2)
    spec = {
        'lit_model_config.lr': ('log_uniform', 1e-4, 1e-3),
        'data_config.train_batch_size': ('choice', [2, 3]),
    }
    best = run_sweep(config, spec, n_trials=2,
                     sweep_dir=str(tmp_path / 'sw'), dataset_override=ds,
                     max_epochs=2)
    trials = [json.loads(l) for l in
              (tmp_path / 'sw' / 'trials.jsonl').read_text().splitlines()]
    assert len(trials) == 2
    assert all('params' in t for t in trials)
    assert (tmp_path / 'sw' / 'best.json').exists()


def test_sweep_sampling():
    from grappa_tpu.train.sweep import sample_value, set_dotted
    import numpy as np
    rng = np.random.default_rng(0)
    assert sample_value(rng, ('choice', [1, 2, 3])) in (1, 2, 3)
    v = sample_value(rng, ('log_uniform', 1e-5, 1e-3))
    assert 1e-5 <= v <= 1e-3
    assert isinstance(sample_value(rng, ('int_uniform', 2, 5)), int)
    cfg = {'a': {'b': 1}}
    set_dotted(cfg, 'a.b', 7)
    assert cfg['a']['b'] == 7
    import pytest as _pytest
    with _pytest.raises(KeyError):
        set_dotted(cfg, 'a.c', 1)


def test_report_tables(tmp_path):
    from grappa_tpu.train.report import markdown_table, tex_table, write_report
    results = {
        'grappa_tpu': {
            'spice': {'rmse_energies': 2.1, 'crmse_gradients': 5.9,
                      'rmse_energies_ci': [2.0, 2.2]},
            'rna': {'rmse_energies': 3.4, 'crmse_gradients': 3.6},
        },
        'gaff-2.11': {
            'spice': {'rmse_energies': 4.6, 'crmse_gradients': 14.6},
            'rna': {'rmse_energies': 6.5, 'crmse_gradients': 16.7},
        },
    }
    md = markdown_table(results)
    assert '| spice | Energy RMSE | **2.1** | 4.6 |' in md
    tex = tex_table(results)
    assert r'\textbf{2.1}' in tex and r'\toprule' in tex
    md_ci = markdown_table(results, with_ci=True)
    assert '[2.0,2.2]' in md_ci
    write_report(results, str(tmp_path / 'table'))
    assert (tmp_path / 'table.md').exists()
    assert (tmp_path / 'table.tex').exists()
