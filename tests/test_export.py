"""Checkpoint contract tests: flax <-> torch state_dict round trip, .pth and
.npz model_dict files, and the Grappa inference API (predictions identical
after a full export/import cycle)."""
import jax
import numpy as np
import pytest

from grappa_tpu.api import Grappa
from grappa_tpu.data import MolGraph, collate
from grappa_tpu.data.synthetic import make_moldata, random_molecule
from grappa_tpu.models.grappa_model import get_small_model_config, make_model
from grappa_tpu.train.export import (
    build_model_dict, load_model_dict, model_from_dict, save_model_dict)
from grappa_tpu.train.torch_compat import (
    export_state_dict, import_state_dict, stats_from_model)


@pytest.fixture(scope='module')
def trained_like():
    md = make_moldata(seed=0, n_confs=2)
    batch = collate([MolGraph.from_moldata(md)])
    cfg = get_small_model_config()
    model = make_model(cfg)
    params = model.init(jax.random.key(3), batch)
    return model, params, cfg, batch


def test_state_dict_roundtrip(trained_like):
    model, params, cfg, batch = trained_like
    stats = stats_from_model(model)
    sd = export_state_dict(params, cfg, stats=stats)
    params2, stats2 = import_state_dict(sd, cfg)
    # weights identical
    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(params2)
    assert len(leaves1) == len(leaves2)
    # predictions identical through a rebuilt model
    model2 = make_model(cfg, stats2, eps_applied=True)
    out1 = model.apply(params, batch)
    out2 = model2.apply(params2, batch)
    for k in out1:
        np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.parametrize('suffix', ['.pth', '.npz'])
def test_model_dict_file_roundtrip(trained_like, tmp_path, suffix):
    model, params, cfg, batch = trained_like
    config = {'model_config': cfg}
    md = build_model_dict(params, config,
                          split_names={'train': ['a'], 'val': [], 'test': []},
                          results={'avg': {'rmse_energies': 1.0}},
                          model=model)
    path = tmp_path / f'model{suffix}'
    save_model_dict(md, path)
    md2 = load_model_dict(path)
    assert md2['split_names']['train'] == ['a']
    assert md2['results']['avg']['rmse_energies'] == 1.0
    model2, params2, config2 = model_from_dict(md2)
    out1 = model.apply(params, batch)
    out2 = model2.apply(params2, batch)
    for k in out1:
        np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_torch_loads_exported_state_dict(trained_like):
    """The exported tensors must be loadable as a torch state_dict with
    consistent shapes for torch Linear/LayerNorm/MultiheadAttention modules
    (naming fidelity check for the head transformer of one writer)."""
    import torch
    model, params, cfg, _ = trained_like
    sd = export_state_dict(params, cfg, stats=stats_from_model(model))
    width = cfg['bond_transformer_width']
    heads = cfg['bond_n_heads']

    class RefBlock(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.LayerNorm(width)
            self.attn = torch.nn.MultiheadAttention(width, heads)
            self.ff = torch.nn.ModuleDict()

    blk = RefBlock()
    prefix = 'parameter_writer.bond_writer.bond_model.grappa_transformer.transformer.0.'
    subset = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix) and '.ff.' not in k}
    missing, unexpected = blk.load_state_dict(subset, strict=False)
    assert not unexpected, unexpected
    assert all('ff' in m or 'attn' not in m for m in missing)


def test_grappa_api_predict(trained_like, tmp_path):
    model, params, cfg, _ = trained_like
    md = build_model_dict(params, {'model_config': cfg}, model=model)
    save_model_dict(md, tmp_path / 'm.npz')

    ff = Grappa.from_tag(str(tmp_path / 'm.npz'))
    mol = random_molecule(seed=11)
    out = ff.predict(mol)
    assert out.bond_k.shape == (len(mol.bonds),)
    assert out.angle_eq.shape == (len(mol.angles),)
    assert out.proper_ks.shape == (len(mol.propers), 6)
    assert out.improper_ks.shape == (len(mol.impropers), 3)
    assert np.all(out.bond_k > 0)
    assert np.all((out.proper_phases == 0) | np.isclose(out.proper_phases, np.pi))
    assert ff.field_of_view == 2 + 0 + 3

    # disconnected molecule -> clear error
    from grappa_tpu.data import Molecule
    bad = Molecule(atoms=[0, 1, 2, 3], bonds=[(0, 1), (2, 3)], impropers=[],
                   atomic_numbers=[1, 6, 1, 6], partial_charges=[0.0] * 4)
    with pytest.raises(ValueError, match='disconnected'):
        ff.predict(bad)


def test_grappa_api_predict_many(trained_like):
    """Batched parametrization: predict_many (one padded forward per
    chunk, TPU-first extension) must reproduce per-molecule predict
    exactly for mixed sizes, including across chunk boundaries."""
    model, params, cfg, _ = trained_like
    ff = Grappa(model, params, {'model_config': cfg})
    mols = [random_molecule(seed=s) for s in (11, 12, 13, 14, 15)]
    many = ff.predict_many(mols, batch_size=2)   # 3 chunks, sizes 2/2/1
    assert len(many) == len(mols)
    for mol, got in zip(mols, many):
        ref = ff.predict(mol)
        np.testing.assert_allclose(got.bond_k, ref.bond_k, rtol=1e-5)
        np.testing.assert_allclose(got.bond_eq, ref.bond_eq, rtol=1e-5)
        np.testing.assert_allclose(got.angle_k, ref.angle_k, rtol=1e-5)
        np.testing.assert_allclose(got.proper_ks, ref.proper_ks,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(got.improper_ks, ref.improper_ks,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_array_equal(got.proper_phases, ref.proper_phases)
        np.testing.assert_array_equal(np.asarray(got.bonds),
                                      np.asarray(ref.bonds))


def test_zoo_tag_resolution_from_cache(trained_like, tmp_path, monkeypatch):
    """Model-zoo machinery end to end without network: a model_dict dropped
    into the cache under the release filename resolves by TAG and loads
    (the documented offline path of grappa_tpu/zoo.py), and the exported
    predictions survive the cache round trip."""
    from grappa_tpu import zoo

    model, params, cfg, batch = trained_like
    monkeypatch.setenv('GRAPPA_TPU_CACHE', str(tmp_path))

    md = build_model_dict(params, {'model_config': cfg}, model=model)
    target = tmp_path / 'models' / 'grappa-1.2.pth'
    target.parent.mkdir(parents=True)
    save_model_dict(md, target)

    assert zoo.model_path_from_tag('grappa-1.2') == target
    ff = Grappa.from_tag('grappa-1.2')
    out = ff.predict(random_molecule(seed=11), check_eq_values=False)
    ref = Grappa.from_model_dict(md).predict(random_molecule(seed=11),
                                             check_eq_values=False)
    np.testing.assert_allclose(out.bond_k, ref.bond_k, rtol=1e-6)
    np.testing.assert_allclose(out.proper_ks, ref.proper_ks, atol=1e-7)

    # unknown tags fail loudly with the tag list
    with pytest.raises(KeyError, match='unknown model tag'):
        zoo.model_path_from_tag('no-such-model')

    # dataset tags resolve to cached directories (offline contract)
    ds_dir = tmp_path / 'datasets' / 'spice-dipeptide'
    ds_dir.mkdir(parents=True)
    assert zoo.dataset_path_from_tag('spice-dipeptide') == ds_dir
    # uncached tag: the download attempt fails offline with a clear message
    with pytest.raises(RuntimeError, match='place the file at'):
        zoo.dataset_path_from_tag('rna-diverse')
    with pytest.raises(KeyError, match='unknown dataset tag'):
        zoo.dataset_path_from_tag('no-such-dataset')

    # a downloaded release zip (here: a locally built one, tag-nested like
    # the real archives) extracts into the cache and resolves by tag
    import zipfile
    from pathlib import Path
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.data.dataset import Dataset
    src = tmp_path / 'build' / 'gen2'
    Dataset.from_moldata(make_dataset(n_mols=3, n_confs=2, seed=2),
                         'gen2').save(src)
    zip_path = tmp_path / 'datasets' / 'gen2.zip'
    zip_path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(zip_path, 'w') as zf:
        for f in sorted(src.rglob('*')):
            zf.write(f, Path('gen2') / f.relative_to(src))
    resolved = zoo.dataset_path_from_tag('gen2')
    assert resolved == tmp_path / 'datasets' / 'gen2'
    loaded = Dataset.load(resolved)
    assert len(loaded) == 3
