"""Production training recipes (experiments/train-grappa-*): config
translation fidelity, driver arg surface, and an end-to-end micro-rehearsal
of the 1.2.1 recipe (reference: experiments/train-grappa-{1.0,1.1,1.2,1.2.1}/
{grappa_config.yaml,train.py,notes.txt})."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
EXP = REPO / 'experiments'
VERSIONS = ['1.0', '1.1', '1.2', '1.2.1']

sys.path.insert(0, str(EXP))
from production_driver import run_production  # noqa: E402

from grappa_tpu.train.config import (normalize_reference_config,  # noqa: E402
                                     read_yaml, validate_config)


@pytest.mark.parametrize('version', VERSIONS)
def test_config_normalizes_and_validates(version):
    raw = read_yaml(EXP / f'train-grappa-{version}' / 'grappa_config.yaml')
    # the yaml is kept in the reference's published format: it still carries
    # the torch-only keys the normalizer must strip
    assert 'pin_memory' in raw['data_config']
    assert 'tuplewise_weight' in raw['lit_model_config']
    cfg = normalize_reference_config(raw, verbose=False)
    validate_config(cfg)
    assert 'pin_memory' not in cfg['data_config']
    assert 'tuplewise_weight' not in cfg['lit_model_config']
    # shared production hyperparameters
    assert cfg['lit_model_config']['lr'] == 1.5e-5
    assert cfg['lit_model_config']['start_qm_epochs'] == 2
    assert cfg['data_config']['conf_strategy'] == 32


def test_version_specific_architecture_and_data():
    cfgs = {v: normalize_reference_config(
        read_yaml(EXP / f'train-grappa-{v}' / 'grappa_config.yaml'),
        verbose=False) for v in VERSIONS}
    # 1.0: 2 convs + 5 attention layers, periodicity 6
    assert cfgs['1.0']['model_config']['gnn_convolutions'] == 2
    assert cfgs['1.0']['model_config']['gnn_attentional_layers'] == 5
    assert cfgs['1.0']['model_config']['n_periodicity_proper'] == 6
    # 1.1+: 7 attention / 0 conv, periodicity 3, torsion cutoff
    for v in ('1.1', '1.2', '1.2.1'):
        mc = cfgs[v]['model_config']
        assert (mc['gnn_convolutions'], mc['gnn_attentional_layers']) == (0, 7)
        assert mc['n_periodicity_proper'] == 3
        assert mc['torsion_cutoff'] == 1e-4
    # dataset-list evolution
    assert 'tripeptides_amber99sbildn' in cfgs['1.0']['data_config']['datasets']
    for v in ('1.1', '1.2', '1.2.1'):
        assert ('tripeptides_amber99sbildn'
                in cfgs[v]['data_config']['pure_test_datasets'])
    assert ('AA_bondbreak_rad_amber99sbildn'
            in cfgs['1.2.1']['data_config']['datasets'])
    assert ('protein-torsion_amber99sbildn'
            not in cfgs['1.2.1']['data_config']['datasets'])


def test_tuplewise_weight_nonzero_raises():
    raw = read_yaml(EXP / 'train-grappa-1.2' / 'grappa_config.yaml')
    raw['lit_model_config']['tuplewise_weight'] = 0.5
    with pytest.raises(NotImplementedError):
        normalize_reference_config(raw, verbose=False)


def test_driver_arg_surface_dry_run():
    here = EXP / 'train-grappa-1.2.1'
    cfg = run_production(here, 'grappa-1.2.1', argv=[], dry_run=True)
    assert cfg['data_config']['splitpath'] == 'espaloma_split'
    assert cfg['trainer_config']['name'] == 'grappa-1.2.1'

    cfg = run_production(
        here, 'grappa-1.2.1',
        argv=['-tb', '16', '-p', '0.01', '-b', '--shrink_train', '0.5',
              '--n_periodicity', '6', '--no_torsion_cutoff'],
        dry_run=True)
    assert cfg['data_config']['train_batch_size'] == 16
    pw = cfg['lit_model_config']['param_weights_by_dataset']
    assert pw and all('amber99sbildn' in k for k in pw)
    assert all(v == 0.01 for v in pw.values())
    assert cfg['data_config']['weights'][
        'AA_bondbreak_rad_amber99sbildn'] == 2.0
    assert cfg['data_config']['tr_subsampling_factor'] == 0.5
    assert cfg['model_config']['n_periodicity_proper'] == 6
    assert cfg['model_config']['torsion_cutoff'] == 0.0
    assert cfg['trainer_config']['name'] == \
        'grappa-1.2.1_p-2_bondbreak_shrink50_n_p6_no_cutoff'

    # 1.0's reduced surface
    cfg = run_production(EXP / 'train-grappa-1.0', 'grappa-1.0',
                         argv=['-p', '0.001'], v1_0=True, dry_run=True)
    assert cfg['trainer_config']['name'] == 'grappa-1.0_p-3'
    with pytest.raises(SystemExit):
        run_production(EXP / 'train-grappa-1.0', 'grappa-1.0',
                       argv=['-b'], v1_0=True, dry_run=True)


@pytest.mark.slow
def test_production_micro_rehearsal_1_2_1(tmp_path, monkeypatch):
    """The 1.2.1 recipe end to end at micro scale: synthetic datasets under
    every production tag, splitpath resolved as the espaloma_split ZOO TAG
    covering only part of the molecules (the rest must be split by
    extension, not dropped — reference get_dataloaders.py:91-103)."""
    from grappa_tpu.data.dataset import Dataset
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.models.grappa_model import get_small_model_config
    from grappa_tpu.train.config import overwrite_config
    from grappa_tpu.train.run import do_trainrun

    cache = tmp_path / 'cache'
    monkeypatch.setenv('GRAPPA_TPU_CACHE', str(cache))

    raw = read_yaml(EXP / 'train-grappa-1.2.1' / 'grappa_config.yaml')
    config = normalize_reference_config(raw, verbose=False)
    tags = (config['data_config']['datasets']
            + config['data_config']['pure_train_datasets']
            + config['data_config']['pure_test_datasets'])
    all_ids = []
    for i, tag in enumerate(tags):
        # learnable=True stamps 6-wide classical proper ks, like the real
        # datasets — exercised against the recipe's periodicity-3 model below
        ds = Dataset.from_moldata(
            make_dataset(n_mols=3, n_confs=4, seed=100 + i, learnable=True),
            tag)
        ds.save(cache / 'datasets' / tag)
        all_ids += ds.mol_ids

    # espaloma split tag dir: covers only the first two datasets' molecules
    covered = all_ids[:6]
    split_dir = cache / 'datasets' / 'espaloma_split'
    split_dir.mkdir(parents=True)
    (split_dir / 'split.json').write_text(json.dumps(
        {'train': covered[:4], 'val': covered[4:5], 'test': covered[5:6]}))

    # shrink the model but KEEP the recipe's architecture-defining knobs
    # (periodicity 3 vs the datasets' 6-wide ks is the published situation)
    small = get_small_model_config()
    for key in ('n_periodicity_proper', 'n_periodicity_improper',
                'torsion_cutoff', 'gated_torsion', 'harmonic_gate'):
        if key in config['model_config']:
            small[key] = config['model_config'][key]
    overwrite_config({
        'model_config': small,
        'data_config': {'conf_strategy': 4, 'val_conf_strategy': 4,
                        'train_batch_size': 4, 'val_batch_size': 4,
                        'test_batch_size': 4,
                        'splitpath': 'espaloma_split'},
        'lit_model_config': {'start_qm_epochs': 1, 'warmup_steps': 2,
                             'time_limit': 0.2},
        'trainer_config': {'max_epochs': 2, 'checkpoint_every': 2,
                           'name': 'grappa-1.2.1-micro'},
    }, config)

    out = do_trainrun(config, project_dir=str(tmp_path / 'runs'))
    run_split = json.loads(
        (tmp_path / 'runs' / 'grappa-1.2.1-micro' / 'split.json').read_text())
    # stored assignments kept ...
    assert set(covered[:4]) <= set(run_split['train'])
    assert covered[4] in run_split['val'] and covered[5] in run_split['test']
    # ... and every molecule of the 13 training datasets assigned (extension)
    train_tag_ids = set(all_ids[:3 * len(config['data_config']['datasets'])])
    assigned = (set(run_split['train']) | set(run_split['val'])
                | set(run_split['test']))
    assert train_tag_ids <= assigned
    assert out['results']['history']
