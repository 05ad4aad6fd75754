"""The one-command release parity check (`cli.py ingest-release`), driven
end-to-end against local fixtures standing in for the released artifacts:
a builder-exported model_dict as the `.pth`, release-layout dataset archives
in the zoo cache, and an espaloma-style split tag directory.

This is the dress rehearsal for the round that finally gets the real
released files (reference: training/eval_model.py:20-301,
utils/loading_utils.py:7-86): drop them into the cache and run exactly the
command exercised here.
"""
import json
import zipfile

import jax
import pytest

from grappa_tpu import cli
from grappa_tpu.data import MolGraph, collate
from grappa_tpu.data.dataset import Dataset, save_split
from grappa_tpu.data.synthetic import make_moldata
from grappa_tpu.models.grappa_model import get_small_model_config, make_model
from grappa_tpu.train.export import build_model_dict, save_model_dict


@pytest.fixture()
def release_cache(tmp_path, monkeypatch):
    """A zoo cache populated like a hand-ingested release: model .pth,
    one extracted dataset dir, one still-zipped release archive, and the
    espaloma_split tag directory."""
    monkeypatch.setenv('GRAPPA_TPU_CACHE', str(tmp_path))

    # model: an exported model_dict under the release filename
    batch = collate([MolGraph.from_moldata(make_moldata(seed=0, n_confs=2))])
    cfg = get_small_model_config()
    model = make_model(cfg)
    params = model.init(jax.random.key(3), batch)
    md = build_model_dict(params, {'model_config': cfg}, model=model)
    model_dir = tmp_path / 'models'
    model_dir.mkdir(parents=True)
    save_model_dict(md, model_dir / 'grappa-1.2.pth')

    # two tiny datasets under published tags; mol ids split 80/10/10
    ids = {}
    ds_root = tmp_path / 'datasets'
    for tag, seed in (('spice-dipeptide', 100), ('rna-diverse', 200)):
        mds = [make_moldata(seed=seed + i, n_confs=3, ds_name=tag)
               for i in range(6)]
        ds = Dataset.from_moldata(mds, tag)
        ids[tag] = ds.mol_ids
        if tag == 'spice-dipeptide':
            ds.save(ds_root / tag)            # pre-extracted form
        else:
            # release-archive form: zipped with a nested top-level dir,
            # exercising extract_dataset_zip on the resolution path
            extracted = tmp_path / 'staging' / tag
            ds.save(extracted)
            zip_path = ds_root / f'{tag}.zip'
            zip_path.parent.mkdir(parents=True, exist_ok=True)
            with zipfile.ZipFile(zip_path, 'w') as zf:
                for f in extracted.rglob('*'):
                    zf.write(f, f'{tag}/{f.relative_to(extracted)}')

    # per-dataset: last two ids test (>=2 so bootstrap CIs exist), one val
    split = {'train': [], 'val': [], 'test': []}
    for tag in ids:
        ordered = sorted(ids[tag])
        split['test'] += ordered[-2:]
        split['val'] += ordered[-3:-2]
        split['train'] += ordered[:-3]
    split_dir = ds_root / 'espaloma_split'
    split_dir.mkdir(parents=True)
    save_split(split, split_dir / 'espaloma_split.json')
    return tmp_path, split


def test_ingest_release_end_to_end(release_cache, tmp_path):
    cache, split = release_cache
    out = tmp_path / 'ingest' / 'report'
    out.parent.mkdir()
    rc = cli.main(['ingest-release',
                   '-d', 'spice-dipeptide', 'rna-diverse',
                   '--n-bootstrap', '20',
                   '-o', str(out)])

    report = json.loads((out.parent / 'report.json').read_text())
    # 1. the checkpoint audit ran on the resolved release file
    audit = report['checkpoint_audit']
    assert audit['file'].endswith('grappa-1.2.pth')
    assert audit['keys_in_file'] > 0
    # 2. both datasets were resolved (one via zip extraction) and the test
    #    split evaluated per dataset with bootstrap CIs
    for tag in ('spice-dipeptide', 'rna-diverse'):
        metrics = report['results'][tag]
        assert metrics['rmse_energies'] >= 0
        assert 'rmse_energies_ci' in metrics
        assert metrics['n_mols'] > 0
    # 3. parity verdict compares against the published grappa-1.2 numbers;
    #    an untrained fixture model must FAIL parity (and exit nonzero) —
    #    the command must never report false parity
    parity = report['parity']
    assert parity['pass'] is False
    assert rc == 1
    per = parity['per_dataset']['spice-dipeptide']['rmse_energies']
    assert per['published'] == 2.3 and per['ours'] > per['published']

    # 4. side-by-side table with the published column
    table = (out.parent / 'report.md').read_text()
    assert 'published grappa-1.2' in table
    assert 'spice-dipeptide' in table and 'rna-diverse' in table
    assert (out.parent / 'report.tex').exists()
    # zip resolution left the extracted dir behind for future runs
    assert (cache / 'datasets' / 'rna-diverse').is_dir()


def test_ingest_release_wrong_split_fails_loudly(release_cache, tmp_path):
    """A split that selects no test molecule must abort, not silently
    evaluate nothing (the guard against evaluating the wrong release)."""
    cache, _ = release_cache
    save_split({'train': [], 'val': [], 'test': ['not-a-mol']},
               tmp_path / 'empty_split.json')
    with pytest.raises(SystemExit, match='no test molecules'):
        cli.main(['ingest-release', '-d', 'spice-dipeptide',
                  '--split', str(tmp_path / 'empty_split.json'),
                  '--n-bootstrap', '5', '-o', str(tmp_path / 'r')])
