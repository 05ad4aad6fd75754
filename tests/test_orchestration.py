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

    # eval CLI runs on the exported model, writes plots + results back
    from grappa_tpu.cli import main
    out_json = tmp_path / 'eval.json'
    plot_dir = tmp_path / 'plots'
    rc = main(['eval', '-t', out['model_dict_path'], '-d', str(ds_dir),
               '--set', 'val', '--n-bootstrap', '50',
               '-o', str(out_json), '--plots', str(plot_dir)])
    assert rc == 0
    results = json.loads(out_json.read_text())
    assert 'grappa_tpu' in results
    entry = results['grappa_tpu']['syn']
    assert 'rmse_energies' in entry and 'rmse_energies_ci' in entry
    lo, hi = entry['rmse_energies_ci']
    assert lo <= entry['rmse_energies'] <= hi
    for key in ('mae_energies', 'mae_gradients', 'crmse_gradients',
                'std_energies', 'std_gradients', 'mae_energies_ci'):
        assert key in entry, key
    # parameter scatter + violin plots written per dataset
    assert (plot_dir / 'syn_parameter_comparison.png').exists()
    assert (plot_dir / 'syn_parameters.png').exists()
    # prediction-vs-QM scatter (reference grappa-1.1/scatter_plots.py)
    assert (plot_dir / 'syn_prediction_scatter.png').exists()
    # results stored back into the model file (reference grappa_eval)
    from grappa_tpu.train.export import load_model_dict
    stored = load_model_dict(out['model_dict_path'])
    assert 'val' in stored['results']
    assert (stored['results']['val']['grappa_tpu']['syn']['rmse_energies']
            == entry['rmse_energies'])


def test_do_trainrun_pretrain_path(tmp_path):
    """pretrain_path initializes params+stat buffers from a model file and
    forces start_qm_epochs to 0 (reference trainrun.py:118-136)."""
    import jax

    from grappa_tpu.train.export import load_model_dict, model_from_dict
    from grappa_tpu.train.run import do_trainrun

    ds_dir = tmp_path / 'ds'
    Dataset.from_moldata(make_dataset(n_mols=6, n_confs=3, seed=9),
                         'syn').save(ds_dir)
    config = _small_config(ds_dir, max_epochs=1)
    config['test_model'] = False
    out1 = do_trainrun(config, project_dir=str(tmp_path / 'runs'),
                       run_name='base')

    config2 = _small_config(ds_dir, max_epochs=0)
    config2['test_model'] = False
    out2 = do_trainrun(config2, project_dir=str(tmp_path / 'runs'),
                       run_name='warm', pretrain_path=out1['model_dict_path'])
    # 0 epochs -> exported params must equal the pretrain file's params
    _, p_src, _ = model_from_dict(load_model_dict(out1['model_dict_path']))
    _, p_out, _ = model_from_dict(load_model_dict(out2['model_dict_path']))
    for a, b in zip(jax.tree.leaves(p_src), jax.tree.leaves(p_out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert config2['lit_model_config']['start_qm_epochs'] == 0

    # a config whose architecture disagrees with the file must fail loudly
    config3 = _small_config(ds_dir, max_epochs=1)
    config3['test_model'] = False
    config3['model_config']['gnn_width'] = 32
    with pytest.raises(Exception):
        do_trainrun(config3, project_dir=str(tmp_path / 'runs'),
                    run_name='bad', pretrain_path=out1['model_dict_path'])


def test_bootstrap_evaluator_cis():
    ev = BootstrapEvaluator()
    rng = np.random.default_rng(0)
    for _ in range(40):
        n_e, n_g = 10.0, 100.0
        e_se = float(rng.uniform(5, 15))
        g_se = float(rng.uniform(50, 150))
        ev.add_molecule('ds', e_se=e_se, n_e=n_e,
                        e_ae=float(np.sqrt(e_se * n_e)) * 0.8,
                        g_se=g_se, n_vec=n_g,
                        g_ae_vec=float(np.sqrt(g_se * n_g)) * 0.8,
                        eref_sum=0.0, eref_sq=float(rng.uniform(5, 15)),
                        gref_sum=0.0, gref_sq=float(rng.uniform(50, 150)))
    m = ev.pool(n_bootstrap=200)['ds']
    lo, hi = m['rmse_energies_ci']
    assert lo < m['rmse_energies'] < hi
    assert (hi - lo) < m['rmse_energies']  # reasonably tight for n=40
    # full reference-Evaluator metric set incl. MAE and reference stds
    for key in ('mae_energies', 'mae_gradients', 'std_energies',
                'std_gradients', 'mae_energies_ci', 'mae_gradients_ci'):
        assert key in m
    assert m['mae_energies'] <= m['rmse_energies'] + 1e-9


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
    # constant +0.5 per component -> vector norm 0.5*sqrt(3) everywhere, so
    # the invariant MAE and RMSE coincide (reference invariant metrics)
    np.testing.assert_allclose(out['fake_ff']['syn']['mae_gradients'],
                               0.5 * np.sqrt(3), rtol=1e-5)
    np.testing.assert_allclose(out['fake_ff']['syn']['rmse_gradients'],
                               0.5 * np.sqrt(3), rtol=1e-5)
    np.testing.assert_allclose(out['fake_ff']['syn']['mae_energies'], 0.0,
                               atol=1e-5)
    # std_energies matches the brute-force std of per-mol-centered targets
    ref = np.concatenate([md.energy_ref - md.energy_ref.mean() for md in mds])
    np.testing.assert_allclose(out['fake_ff']['syn']['std_energies'],
                               ref.std(), rtol=1e-5)
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


def test_sweep_resume_skips_completed_trials(tmp_path, monkeypatch):
    """Re-invoking run_sweep continues from trials.jsonl instead of
    retraining completed trials — what lets the chip supervisor restart
    an interrupted sweep idempotently."""
    import grappa_tpu.train.run as run_mod
    from grappa_tpu.train.sweep import run_sweep

    calls = []

    def fake_trainrun(config, project_dir, run_name, dataset_override=None,
                      cache_batches=False):
        calls.append(run_name)
        loss = {'trial_000': 3.0, 'trial_001': 2.0, 'trial_002': 1.0}
        return {'results': {'best_early_stopping_loss': loss[run_name],
                            'epochs': 2},
                'run_dir': str(tmp_path / run_name)}

    monkeypatch.setattr(run_mod, 'do_trainrun', fake_trainrun)
    spec = {'lit_model_config.lr': ('log_uniform', 1e-5, 1e-3)}
    config = {'trainer_config': {}, 'lit_model_config': {'lr': 1e-4}}

    run_sweep(config, spec, n_trials=2, sweep_dir=str(tmp_path / 'sw'))
    assert calls == ['trial_000', 'trial_001']

    best = run_sweep(config, spec, n_trials=3,
                     sweep_dir=str(tmp_path / 'sw'))
    # only the new trial trained; cached records seeded history + best
    assert calls == ['trial_000', 'trial_001', 'trial_002']
    assert best['trial'] == 2 and best['early_stopping_loss'] == 1.0
    lines = (tmp_path / 'sw' / 'trials.jsonl').read_text().splitlines()
    assert len(lines) == 3


def test_resume_all_scan(tmp_path, capsys):
    """`resume-all --dry-run` classifies runs: unfinished ones are queued,
    finished/checkpoint-less/excluded ones are skipped (reference
    resume_all.py semantics, offline)."""
    from grappa_tpu.cli import main
    from grappa_tpu.train.config import default_config, write_yaml

    def fake_run(name, epoch, target, exported):
        d = tmp_path / 'proj' / name
        (d / 'last.ckpt').mkdir(parents=True)
        (d / 'last.ckpt' / 'meta.json').write_text(
            json.dumps({'epoch': epoch}))
        cfg = default_config()
        cfg['trainer_config']['max_epochs'] = target
        write_yaml(cfg, d / 'grappa_config.yaml')
        if exported:
            (d / 'model.npz').write_bytes(b'x')

    # meta['epoch'] IS the completed-epoch count (fit increments before
    # checkpointing): target reached only at epoch == target
    fake_run('unfinished', epoch=4, target=10, exported=False)
    fake_run('almost', epoch=9, target=10, exported=True)
    fake_run('finished', epoch=10, target=10, exported=True)
    fake_run('excluded', epoch=1, target=10, exported=False)
    (tmp_path / 'proj' / 'no_ckpt').mkdir()

    rc = main(['resume-all', str(tmp_path / 'proj'),
               '--except', 'excluded', '--dry-run'])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert [t['run'] for t in out['to_resume']] == ['almost', 'unfinished']
    done = {t['run']: t['epochs_done'] for t in out['to_resume']}
    assert done == {'almost': 9, 'unfinished': 4}
    reasons = {s['run']: s['reason'] for s in out['skipped']}
    assert reasons == {'finished': 'finished', 'excluded': 'excluded',
                       'no_ckpt': 'no checkpoint'}


def test_bayes_optimizer_beats_random_on_toy_objective():
    """The GP-EI suggester (reference sweep method: bayes) localizes the
    minimum of a smooth toy objective far better than random search at equal
    budget."""
    import numpy as np
    from grappa_tpu.train.sweep import (SpecEncoder, sample_value,
                                        suggest_bayes)

    spec = {
        'lr': ('log_uniform', 1e-5, 1e-2),
        'width': ('choice', [128, 256, 512]),
    }
    # minimum at lr = 1e-3.5, width = 256
    def objective(p):
        return ((np.log10(p['lr']) + 3.5) ** 2
                + {128: 0.5, 256: 0.0, 512: 0.8}[p['width']] + 0.05)

    rng = np.random.default_rng(0)
    history = []
    for trial in range(25):
        p = (suggest_bayes(spec, history, rng) if trial >= 5
             else {k: sample_value(rng, d) for k, d in spec.items()})
        history.append({'params': p, 'early_stopping_loss': objective(p)})
    bayes_best = min(h['early_stopping_loss'] for h in history)

    rng2 = np.random.default_rng(1)
    random_best = min(
        objective({k: sample_value(rng2, d) for k, d in spec.items()})
        for _ in range(25))
    assert bayes_best < random_best
    assert bayes_best < 0.1  # localized the optimum basin

    # late suggestions concentrate near the optimum
    late = history[-1]['params']
    assert late['width'] == 256
    assert abs(np.log10(late['lr']) + 3.5) < 0.5

    # encoder: one-hot for choice, unit-interval for continuous
    enc = SpecEncoder(spec)
    x = enc.encode({'lr': 1e-3, 'width': 512})
    assert enc.dim == 4 and x.shape == (4,)
    assert list(x[-3:]) == [0.0, 0.0, 1.0]  # width one-hot (sorted paths: lr first)
    assert 0.0 <= x[0] <= 1.0


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


def test_safe_trainrun_crash_recovery(tmp_path, monkeypatch):
    """Fault injection (SURVEY section 5.3): a training crash after
    checkpoints exist triggers safe_trainrun's automatic resume from
    last.ckpt, and the resumed run continues from the saved epoch with the
    stored config (datasets re-resolved by tag)."""
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.train.run import safe_trainrun
    from grappa_tpu.train import trainer as trainer_mod

    ds_dir = tmp_path / 'ds'
    Dataset.from_moldata(make_dataset(n_mols=8, n_confs=4, seed=4),
                         'syn-ft').save(ds_dir)
    config = _small_config(ds_dir, max_epochs=4)
    config['trainer_config']['checkpoint_every'] = 1
    config['trainer_config']['name'] = 'faulty'

    real_fit = trainer_mod.Trainer.fit
    calls = {'n': 0}

    def crashing_fit(self, max_epochs=None):
        calls['n'] += 1
        if calls['n'] == 1:      # first attempt: die mid-run w/ checkpoints
            for _ in range(2):
                self.train_epoch()
                self.epoch += 1
                self.save_checkpoint(self.out_dir / 'last.ckpt')
            raise RuntimeError('injected crash')
        return real_fit(self, max_epochs)

    monkeypatch.setattr(trainer_mod.Trainer, 'fit', crashing_fit)

    out = safe_trainrun(config, project_dir=str(tmp_path / 'runs'),
                        run_name='faulty')
    assert calls['n'] == 2                    # crashed once, resumed once
    trainer = out['trainer']
    assert trainer.epoch >= 2                 # continued past the crash
    assert np.isfinite(out['results']['best_early_stopping_loss'])
    # the resumed run reused the stored config + the crash run's checkpoint
    assert (tmp_path / 'runs' / 'faulty' / 'last.ckpt' / 'meta.json').exists()


def test_resume_epoch_semantics(tmp_path):
    """fit's max_epochs is ABSOLUTE: a finished run resumes as a no-op, and
    extra_epochs continues exactly that many epochs past the checkpoint."""
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.train.run import do_trainrun, resume_trainrun

    ds_dir = tmp_path / 'ds'
    Dataset.from_moldata(make_dataset(n_mols=6, n_confs=4, seed=9),
                         'syn-resume').save(ds_dir)
    config = _small_config(ds_dir, max_epochs=2)
    config['trainer_config']['checkpoint_every'] = 1
    out = do_trainrun(config, project_dir=str(tmp_path / 'runs'),
                      run_name='resumable')
    assert out['trainer'].epoch == 2

    # stored max_epochs already reached -> resume does nothing
    out2 = resume_trainrun(str(tmp_path / 'runs' / 'resumable'))
    assert out2['trainer'].epoch == 2

    # extra_epochs continues exactly past the checkpoint
    out3 = resume_trainrun(str(tmp_path / 'runs' / 'resumable'),
                           extra_epochs=2)
    assert out3['trainer'].epoch == 4


def test_resume_finalizes_like_do_trainrun(tmp_path):
    """A run completed via resume_trainrun produces the same artifacts as an
    uninterrupted one: model.npz export + bootstrap test metrics (the
    interrupted-run recovery path must not silently skip the evaluation the
    published workflow depends on; reference Lightning runs always end with
    trainer.test)."""
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.train.export import load_model_dict
    from grappa_tpu.train.run import do_trainrun, resume_trainrun

    ds_dir = tmp_path / 'ds'
    Dataset.from_moldata(make_dataset(n_mols=8, n_confs=4, seed=11),
                         'syn-resfin').save(ds_dir)
    config = _small_config(ds_dir, max_epochs=1)
    config['data_config']['partition'] = [0.5, 0.25, 0.25]
    config['trainer_config']['checkpoint_every'] = 1
    do_trainrun(config, project_dir=str(tmp_path / 'runs'),
                run_name='resfin')

    out = resume_trainrun(str(tmp_path / 'runs' / 'resfin'), extra_epochs=1,
                          cache_batches=True)
    assert out['trainer'].epoch == 2
    assert Path(out['model_dict_path']).exists()
    md = load_model_dict(out['model_dict_path'])
    test_metrics = (md.get('results') or {}).get('test')
    assert test_metrics, 'resume must run the bootstrap test evaluation'
    # per-subdataset metric dict with bootstrap stats
    sub = next(iter(test_metrics.values()))
    assert any('rmse' in k for k in sub), sub


def test_eval_cli_refuses_setwise_eval_without_split(tmp_path):
    """--set test with no stored/provided split must error instead of
    silently evaluating the full dataset and storing it as 'test'."""
    from grappa_tpu.cli import main
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.models.grappa_model import (get_small_model_config,
                                                make_model)
    from grappa_tpu.statistics import param_statistics_from_graphs
    from grappa_tpu.train.export import build_model_dict, save_model_dict
    import jax
    from grappa_tpu.data import collate

    ds_dir = tmp_path / 'ds'
    ds = Dataset.from_moldata(make_dataset(n_mols=4, n_confs=4, seed=2),
                              'syn')
    ds.save(ds_dir)
    graphs = ds.graphs()
    stats = param_statistics_from_graphs(graphs)
    cfg = {'model_config': get_small_model_config()}
    model = make_model(cfg['model_config'], stats)
    params = jax.jit(model.init)(jax.random.key(0), collate(graphs[:1]))
    md = build_model_dict(params, cfg, split_names={}, results={},
                          model=model)
    model_path = tmp_path / 'model.npz'
    save_model_dict(md, model_path)

    with pytest.raises(SystemExit, match='needs a split'):
        main(['eval', '-t', str(model_path), '-d', str(ds_dir),
              '--set', 'test', '--n-bootstrap', '2', '--no-write'])
    # --set all works without a split
    rc = main(['eval', '-t', str(model_path), '-d', str(ds_dir),
               '--set', 'all', '--n-bootstrap', '2', '--no-write'])
    assert rc == 0


def test_elapsed_time_accumulates_across_resume(tmp_path):
    """Checkpoints must store cumulative wall time so time_limit /
    finish_criterion budgets survive a resume (previously elapsed_time
    stayed 0.0 forever and every resume restarted the clock)."""
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.train.run import do_trainrun, resume_trainrun

    ds_dir = tmp_path / 'ds'
    Dataset.from_moldata(make_dataset(n_mols=6, n_confs=4, seed=3),
                         'syn-el').save(ds_dir)
    config = _small_config(ds_dir, max_epochs=1)
    config['trainer_config']['checkpoint_every'] = 1
    do_trainrun(config, project_dir=str(tmp_path / 'runs'), run_name='el')
    meta = json.loads((tmp_path / 'runs' / 'el' / 'last.ckpt'
                       / 'meta.json').read_text())
    t1 = meta['elapsed_time']
    assert t1 > 0.0

    resume_trainrun(str(tmp_path / 'runs' / 'el'), extra_epochs=1)
    meta2 = json.loads((tmp_path / 'runs' / 'el' / 'last.ckpt'
                        / 'meta.json').read_text())
    assert meta2['elapsed_time'] > t1


def test_do_trainrun_scan_epochs_config(tmp_path):
    """The espaloma-proxy path: scan_epochs set via trainer_config, batches
    cached — do_trainrun must train, validate, checkpoint, test-eval and
    export exactly like the loop path."""
    from grappa_tpu.train.export import load_model_dict
    from grappa_tpu.train.run import do_trainrun

    ds_dir = tmp_path / 'ds'
    Dataset.from_moldata(make_dataset(n_mols=8, n_confs=4, seed=21,
                                      learnable=True),
                         'syn-scan').save(ds_dir)
    config = _small_config(ds_dir, max_epochs=2)
    config['data_config']['partition'] = [0.5, 0.25, 0.25]
    config['trainer_config']['scan_epochs'] = True
    config['trainer_config']['checkpoint_every'] = 1
    out = do_trainrun(config, project_dir=str(tmp_path / 'runs'),
                      run_name='scan', cache_batches=True)
    assert out['trainer'].epoch == 2
    assert len(out['results']['history']) == 2
    md = load_model_dict(out['model_dict_path'])
    assert (md.get('results') or {}).get('test')
    # and resume continues with the stored scan config
    from grappa_tpu.train.run import resume_trainrun
    out2 = resume_trainrun(str(tmp_path / 'runs' / 'scan'), extra_epochs=1,
                           cache_batches=True)
    assert out2['trainer'].epoch == 3
    assert out2['trainer'].scan_epochs is True


@pytest.mark.slow
def test_finalize_exports_best_checkpoint(tmp_path):
    """_finalize_run must evaluate/export the BEST checkpoint, like the
    reference exports files/checkpoints/best-model.ckpt (reference
    export_model.py:30) — not the last weights of the session."""
    import jax
    from flax import serialization
    from grappa_tpu.train.export import load_model_dict
    from grappa_tpu.train.run import do_trainrun, resume_trainrun

    ds_dir = tmp_path / 'ds'
    Dataset.from_moldata(make_dataset(n_mols=10, n_confs=4, seed=0),
                         'syn').save(ds_dir)
    config = _small_config(ds_dir)
    config['data_config']['partition'] = [0.6, 0.2, 0.2]
    out = do_trainrun(config, project_dir=str(tmp_path / 'runs'),
                      run_name='best')
    run_dir = Path(out['run_dir'])
    best = run_dir / 'best.ckpt'
    assert (best / 'params.msgpack').exists()

    # sentinel: zero every best-checkpoint param, then re-finalize via a
    # no-op resume (max_epochs already reached). The export must carry the
    # zeroed best params, not the trainer's (nonzero) last params.
    tree = serialization.msgpack_restore(
        (best / 'params.msgpack').read_bytes())
    zeroed = jax.tree.map(lambda a: np.zeros_like(a), tree)
    (best / 'params.msgpack').write_bytes(
        serialization.msgpack_serialize(zeroed))

    out2 = resume_trainrun(str(run_dir))
    sd = load_model_dict(out2['model_dict_path'])['state_dict']
    # every exported WEIGHT must be the zero sentinel (scaler-statistic
    # buffers come from the model, not the checkpoint, and stay nonzero)
    weight = [k for k in sd if k.startswith('gnn.') and k.endswith('.weight')]
    assert weight
    assert all(np.all(np.asarray(sd[k]) == 0) for k in weight)
