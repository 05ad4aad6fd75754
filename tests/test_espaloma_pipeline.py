"""Espaloma archive -> dataset pipeline, on synthetic fixtures in the
archive's npz layout (reference: dataset_creation/benchmark_datasets)."""
import numpy as np
import pytest

from grappa_tpu.data import MolGraph, collate
from grappa_tpu.data.dataset import Dataset, calc_split_ids
from grappa_tpu.data.espaloma_pipeline import (
    assemble_dataset_dir, convert_espaloma_dir, moldata_from_espaloma_record,
    molecule_from_mapped_smiles, unmerge_duplicates)
from grappa_tpu.data.smiles import SmilesError, parse_mapped_smiles

ETHANOL = '[C:1]([H:4])([H:5])([H:6])[C:2]([H:7])([H:8])[O:3][H:9]'
FORMAMIDE = '[C:1](=[O:2])([N:3]([H:5])[H:6])[H:4]'
BENZENE = ('[c:1]1([H:7])[c:2]([H:8])[c:3]([H:9])[c:4]([H:10])'
           '[c:5]([H:11])[c:6]1[H:12]')


def test_parse_mapped_smiles_ethanol():
    z, bonds, perm = parse_mapped_smiles(ETHANOL)
    assert list(z) == [6, 6, 8, 1, 1, 1, 1, 1, 1]
    got = set(map(tuple, np.sort(bonds, axis=1).tolist()))
    assert got == {(0, 1), (0, 3), (0, 4), (0, 5), (1, 6), (1, 7), (1, 2),
                   (2, 8)}
    assert perm is not None


def test_parse_smiles_features():
    # charges, dots, ring closures incl. %nn, stereo markers, two-letter
    z, b, _ = parse_mapped_smiles('[NH4+].[Cl-]')
    assert list(z) == [7, 17] and len(b) == 0
    z, b, _ = parse_mapped_smiles('C%12CC%12')
    assert len(b) == 3
    z, b, _ = parse_mapped_smiles('C/C=C\\C(=O)Br')
    assert list(z) == [6, 6, 6, 6, 8, 35] and len(b) == 5
    with pytest.raises(SmilesError):
        parse_mapped_smiles('C1CC')        # unclosed ring
    with pytest.raises(SmilesError):
        parse_mapped_smiles('[C:1][C:1]')  # bad map permutation


def test_molecule_from_mapped_smiles_impropers():
    mol = molecule_from_mapped_smiles(FORMAMIDE, np.zeros(6), 'am1BCC')
    # C (O,N,H) and N (C,H,H) are 3-neighbor centers -> 2 sets x 3 versions
    assert len(mol.impropers) == 6
    assert len(mol.bonds) == 5
    # central atom at index 2 in every stored version
    from grappa_tpu.constants import IMPROPER_CENTRAL_IDX
    centers = set(mol.impropers[:, IMPROPER_CENTRAL_IDX].tolist())
    assert centers == {0, 2}   # C is atom 0, N is atom 2


def _record(mapped_smiles, seed=0, n_confs=4):
    z, bonds, _ = parse_mapped_smiles(mapped_smiles)
    rng = np.random.default_rng(seed)
    n = len(z)
    xyz = rng.normal(size=(n_confs, n, 3)).astype(np.float32)
    rec = {
        'mapped_smiles': np.array([mapped_smiles]),
        'smiles': np.array([mapped_smiles.replace(':', 'x')]),
        'atomic_numbers': z,
        'am1bcc_elf_charges': rng.normal(scale=0.3, size=n).astype(np.float32),
        'xyz': xyz,
        'energy_qm': rng.normal(size=n_confs).astype(np.float32),
        'gradient_qm': rng.normal(size=(n_confs, n, 3)).astype(np.float32),
        'energy_ref': rng.normal(size=n_confs).astype(np.float32),
        'gradient_ref': rng.normal(size=(n_confs, n, 3)).astype(np.float32),
        'energy_gaff-2.11': rng.normal(size=n_confs).astype(np.float32),
        'gradient_gaff-2.11': rng.normal(size=(n_confs, n, 3)
                                         ).astype(np.float32),
    }
    return rec


def test_record_to_moldata():
    rec = _record(FORMAMIDE, seed=1)
    md = moldata_from_espaloma_record(rec)
    assert md.n_confs == 4
    assert abs(md.energy_ref.mean()) < 1e-5          # centered
    assert 'gaff-2.11' in md.ff_energy and 'qm' in md.ff_energy
    assert np.isnan(md.classical_parameters.bond_k).all()
    assert md.mol_id == str(rec['smiles'][0])
    # atomic-number mismatch must be caught
    bad = dict(rec)
    bad['atomic_numbers'] = np.roll(rec['atomic_numbers'], 1)
    with pytest.raises(ValueError):
        moldata_from_espaloma_record(bad)


def test_full_pipeline(tmp_path):
    # two "datasets" sharing ethanol as an espaloma-merged duplicate
    src_a = tmp_path / 'raw' / 'ds_a'
    src_b = tmp_path / 'raw' / 'ds_b'
    src_a.mkdir(parents=True)
    src_b.mkdir(parents=True)
    np.savez(src_a / 'mol0.npz', **_record(FORMAMIDE, seed=2))
    np.savez(src_a / 'mol1.npz', **_record(BENZENE, seed=3))
    np.savez(src_b / 'mol0.npz', **_record(ETHANOL, seed=4))
    # duplicates dir: ethanol also belongs to ds_a
    dup = tmp_path / 'dup' / '0' / 'ds_a'
    dup.mkdir(parents=True)
    np.savez(dup / 'mol_ethanol.npz', **_record(ETHANOL, seed=4))

    stats = unmerge_duplicates(tmp_path / 'dup', tmp_path / 'raw')
    assert stats == {'copied': 1, 'already_there': 0}
    # idempotent
    stats = unmerge_duplicates(tmp_path / 'dup', tmp_path / 'raw')
    assert stats == {'copied': 0, 'already_there': 1}

    datasets = []
    for name, src in (('ds_a', src_a), ('ds_b', src_b)):
        conv = convert_espaloma_dir(src, tmp_path / 'moldata' / name)
        assert conv['errors'] == 0 and conv['success'] == conv['total']
        ds = assemble_dataset_dir(tmp_path / 'moldata' / name,
                                  tmp_path / 'ds' / name, ds_name=name)
        datasets.append(Dataset.load(tmp_path / 'ds' / name))
    full = datasets[0] + datasets[1]
    assert len(full) == 4

    # the duplicate molecule shares a mol_id -> one consistent split side
    ids_by_ds = {'ds_a': [e.mol_id for e, n in full if n == 'ds_a'],
                 'ds_b': [e.mol_id for e, n in full if n == 'ds_b']}
    split = calc_split_ids(ids_by_ds, partition=(0.34, 0.33, 0.33), seed=0)
    dup_id = str(np.load(src_b / 'mol0.npz')['smiles'][0])
    sides = [k for k in ('train', 'val', 'test') if dup_id in split[k]]
    assert len(sides) == 1

    # graphs collate end-to-end
    batch = collate([MolGraph.from_moldata(e) for e, _ in full])
    assert batch.num_mols == 4
    assert np.isfinite(np.asarray(batch.xyz)).all()


@pytest.mark.slow
def test_benchmark_recipe_on_pipeline_datasets(tmp_path, monkeypatch):
    """The benchmark wiring end-to-end: pipeline-produced datasets resolved
    by tag through the zoo cache + espaloma splitpath -> do_trainrun
    (reference experiments/benchmark/train.py semantics)."""
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.espaloma_split import (build_espaloma_split,
                                           save_espaloma_split)
    from grappa_tpu.models.grappa_model import get_small_model_config
    from grappa_tpu.train.config import default_config, overwrite_config
    from grappa_tpu.train.run import do_trainrun

    cache = tmp_path / 'cache'
    monkeypatch.setenv('GRAPPA_TPU_CACHE', str(cache))
    ds_a = Dataset.from_moldata(make_dataset(n_mols=6, n_confs=4, seed=0),
                                'syn-a')
    ds_b = Dataset.from_moldata(make_dataset(n_mols=6, n_confs=4, seed=50),
                                'syn-b')
    ds_a.save(cache / 'datasets' / 'syn-a')
    ds_b.save(cache / 'datasets' / 'syn-b')

    all_ids = ds_a.mol_ids + ds_b.mol_ids
    split = build_espaloma_split(all_ids, te_smiles=all_ids[:3],
                                 vl_smiles=all_ids[3:6])
    splitpath = tmp_path / 'espaloma_split.json'
    save_espaloma_split(split, splitpath)

    config = default_config()
    overwrite_config({
        'model_config': get_small_model_config(),
        'data_config': {
            'datasets': ['syn-a', 'syn-b'],
            'conf_strategy': 4, 'val_conf_strategy': 4,
            'train_batch_size': 4, 'val_batch_size': 4,
            'splitpath': str(splitpath),
            'pure_train_datasets': [], 'pure_val_datasets': [],
            'weights': {'syn-a': 2.0},
        },
        'lit_model_config': {'lr': 2e-4, 'start_qm_epochs': 1,
                             'warmup_steps': 3, 'time_limit': 0.2},
        'trainer_config': {'max_epochs': 2, 'checkpoint_every': 2},
        'test_model': True,
    }, config)

    out = do_trainrun(config, project_dir=str(tmp_path / 'runs'),
                      run_name='bench-smoke')
    import json as _json
    run_split = _json.loads(
        (tmp_path / 'runs' / 'bench-smoke' / 'split.json').read_text())
    assert set(run_split['test']) == set(split['test'])
    assert set(run_split['val']) == set(split['val'])
