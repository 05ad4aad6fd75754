"""Golden-fixture fidelity test for the published espaloma-archive layout.

The reference's dataset_creation/benchmark_datasets pipeline defines the
byte layout of the published archives (reference to_npz.py:44-107
`extract_data`, to_grappa.py:24-56, convert_peptides path to_npz.py:140-176,
to_dgl.py:16-46). This test reproduces that layout *exactly* — dtypes,
string-array shapes, key universe, hartree/bohr unit conversion, the
np.savez_compressed container — and drives our pipeline over it, so that
when the real archives land (zero egress here) the converter is already
proven against their structure.

Reference record layout (small-molecule sets, to_npz.py extract_data):
  am1bcc_elf_charges   (n_atoms,)          float64  elementary charge
  atomic_numbers       (n_atoms,)          int64
  mapped_smiles        (1,)                <U       openff mapped smiles
  smiles               (1,)                <U
  xyz                  (n_confs,n_atoms,3) float64  Angstrom (from bohr)
  energy_<ff>          (n_confs,)          float64  kcal/mol (from hartree)
  gradient_<ff>        (n_confs,n_atoms,3) float64  kcal/mol/A
  for <ff> in qm, ref, openff-2.0.0, openff-1.2.0, gaff-2.11 [, amber14]
saved with np.savez_compressed.

Peptide sets (convert_peptides.sh -> to_npz.py --with_amber99) skip the
record stage: MolData npzs are written directly with charge_model='amber99',
energy_ref = energy_qm - energy_amber99_nonbonded, and extra ff entries
amber99 / amber99_nonbonded (to_npz.py:140-176).
"""
from pathlib import Path

import numpy as np
import pytest

from grappa_tpu.data.dataset import Dataset
from grappa_tpu.data.espaloma_pipeline import (assemble_dataset_dir,
                                               convert_espaloma_dir)
from grappa_tpu.data.moldata import MolData
from grappa_tpu.data.smiles import parse_mapped_smiles

# espaloma's units (reference to_npz.py:57-66): hartree/particle, bohr
HARTREE_KCAL = 627.509474063056    # kcal/mol per hartree
BOHR_ANGSTROM = 0.529177210903     # Angstrom per bohr

ETHANOL = '[C:1]([H:4])([H:5])([H:6])[C:2]([H:7])([H:8])[O:3][H:9]'
DIPEPTIDE = ('[C:1]([H:7])([H:8])([H:9])[C:2](=[O:3])[N:4]([H:10])'
             '[C:5]([H:11])([H:12])[H:6]')


def golden_record(mapped_smiles, seed=0, n_confs=5, with_amber14=False):
    """A record byte-identical in structure to reference extract_data's
    output: starts from espaloma-native units (hartree, bohr) and converts
    with the same factors, yielding float64 arrays."""
    z, _, _ = parse_mapped_smiles(mapped_smiles)
    n = len(z)
    rng = np.random.default_rng(seed)

    data = {}
    data['am1bcc_elf_charges'] = rng.normal(0, 0.3, n)            # float64
    data['atomic_numbers'] = np.asarray(z, np.int64)
    data['mapped_smiles'] = np.array([mapped_smiles])             # (1,) <U
    data['smiles'] = np.array([mapped_smiles.replace(':', '')])

    xyz_bohr = rng.normal(0, 2.0, (n_confs, n, 3))
    data['xyz'] = xyz_bohr * BOHR_ANGSTROM

    ff_names = ['qm', 'ref', 'openff-2.0.0', 'openff-1.2.0', 'gaff-2.11']
    if with_amber14:
        ff_names.append('amber14')
    for ff in ff_names:
        e_hartree = rng.normal(0, 1e-3, n_confs)
        g_hartree_bohr = rng.normal(0, 1e-3, (n_confs, n, 3))
        data[f'energy_{ff}'] = e_hartree * HARTREE_KCAL
        data[f'gradient_{ff}'] = g_hartree_bohr * (HARTREE_KCAL
                                                   / BOHR_ANGSTROM)
    return data


def check_layout(data, with_amber14):
    """Assert the fixture really has the published structure (so the test
    cannot silently drift away from the reference layout)."""
    ffs = ['qm', 'ref', 'openff-2.0.0', 'openff-1.2.0', 'gaff-2.11'] + (
        ['amber14'] if with_amber14 else [])
    expected = {'am1bcc_elf_charges', 'atomic_numbers', 'mapped_smiles',
                'smiles', 'xyz'}
    expected |= {f'energy_{f}' for f in ffs} | {f'gradient_{f}' for f in ffs}
    assert set(data.keys()) == expected
    n_confs, n, _ = data['xyz'].shape
    assert data['xyz'].dtype == np.float64
    assert data['am1bcc_elf_charges'].dtype == np.float64
    assert data['atomic_numbers'].dtype == np.int64
    assert data['mapped_smiles'].shape == (1,)
    assert data['mapped_smiles'].dtype.kind == 'U'
    for ff in ffs:
        assert data[f'energy_{ff}'].shape == (n_confs,)
        assert data[f'energy_{ff}'].dtype == np.float64
        assert data[f'gradient_{ff}'].shape == (n_confs, n, 3)


def test_small_molecule_archive_roundtrip(tmp_path):
    """Small-molecule path: savez_compressed records -> MolData npz dir ->
    Dataset dir (reference to_grappa.py then to_dgl.py)."""
    src = tmp_path / 'spice-like'
    src.mkdir()
    for i, (ms, amber) in enumerate([(ETHANOL, False), (DIPEPTIDE, True)]):
        rec = golden_record(ms, seed=i, with_amber14=amber)
        check_layout(rec, with_amber14=amber)
        np.savez_compressed(src / f'{i}.npz', **rec)

    stats = convert_espaloma_dir(src, tmp_path / 'moldata')
    assert stats == {'total': 2, 'success': 2, 'errors': 0,
                     'confs': stats['confs']}

    md0 = MolData.load(tmp_path / 'moldata' / '0.npz')
    rec0 = golden_record(ETHANOL, seed=0)
    # ff dict key universe: energy_ref is the training target, not an entry
    assert set(md0.ff_energy) == {'qm', 'openff-2.0.0', 'openff-1.2.0',
                                  'gaff-2.11'}
    assert set(MolData.load(tmp_path / 'moldata' / '1.npz').ff_energy) == {
        'qm', 'openff-2.0.0', 'openff-1.2.0', 'gaff-2.11', 'amber14'}
    # values survive (f32 cast only)
    np.testing.assert_allclose(md0.xyz, rec0['xyz'], rtol=1e-6)
    np.testing.assert_allclose(md0.energy, rec0['energy_qm'], rtol=1e-5)
    np.testing.assert_allclose(md0.gradient, rec0['gradient_qm'], rtol=1e-6)
    np.testing.assert_allclose(
        md0.energy_ref, rec0['energy_ref'] - rec0['energy_ref'].mean(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(md0.molecule.partial_charges,
                               rec0['am1bcc_elf_charges'], rtol=1e-6)
    assert md0.molecule.charge_model == 'am1BCC'
    assert md0.mol_id == str(rec0['smiles'][0])
    # classical parameters NaN (openff absent), as reference
    # allow_nan_params=True produces (to_grappa.py:34-38)
    assert np.isnan(md0.classical_parameters.bond_k).all()

    ds = assemble_dataset_dir(tmp_path / 'moldata', tmp_path / 'ds',
                              ds_name='spice-like')
    loaded = Dataset.load(tmp_path / 'ds')
    assert len(loaded) == 2
    assert all(n == 'spice-like' for _, n in loaded)


def test_moldata_npz_contract_matches_reference(tmp_path):
    """The converted MolData npz must use the reference MolData.to_dict key
    contract (MolData.py:200-253): scalar string arrays, energy/gradient +
    _ref, molecule keys, NaN param keys, prefixed ff dicts — so reference
    grappa can read our files and vice versa."""
    src = tmp_path / 'src'
    src.mkdir()
    np.savez_compressed(src / 'm.npz', **golden_record(ETHANOL, seed=3))
    convert_espaloma_dir(src, tmp_path / 'out')
    with np.load(tmp_path / 'out' / 'm.npz', allow_pickle=False) as f:
        keys = set(f.keys())
        # string entries are 0-d arrays, as np.array(str(...)) produces
        assert f['mol_id'].shape == ()
        assert f['mapped_smiles'].shape == ()
    for required in ('xyz', 'energy', 'gradient', 'energy_ref',
                     'gradient_ref', 'mol_id', 'mapped_smiles', 'smiles',
                     'energy_qm', 'gradient_qm', 'energy_gaff-2.11'):
        assert required in keys, required
    # reference layout stores tuples under the molecule keys
    for mol_key in ('atoms', 'bonds', 'angles', 'propers', 'impropers',
                    'atomic_numbers', 'partial_charges'):
        assert mol_key in keys, mol_key


def test_peptide_with_amber99_layout(tmp_path):
    """Peptide path (to_npz.py --with_amber99): MolData written directly
    with charge_model='amber99', energy_ref = qm - amber99_nonbonded, ff
    entries amber99 + amber99_nonbonded; our Dataset assembly must consume
    these files as-is (reference convert_peptides.sh -> dgl_ds.sh)."""
    rng = np.random.default_rng(7)
    rec = golden_record(DIPEPTIDE, seed=7)
    n_confs, n, _ = rec['xyz'].shape
    e_nb = rng.normal(0, 1.0, n_confs)
    g_nb = rng.normal(0, 1.0, (n_confs, n, 3))

    from grappa_tpu.data.espaloma_pipeline import molecule_from_mapped_smiles
    mol = molecule_from_mapped_smiles(
        str(rec['mapped_smiles'][0]), rec['am1bcc_elf_charges'],
        charge_model='amber99')
    md = MolData(
        molecule=mol, xyz=rec['xyz'], energy=rec['energy_qm'],
        gradient=rec['gradient_qm'],
        energy_ref=rec['energy_qm'] - e_nb,
        gradient_ref=rec['gradient_qm'] - g_nb,
        mol_id=str(rec['smiles'][0]), smiles=str(rec['smiles'][0]),
        mapped_smiles=str(rec['mapped_smiles'][0]),
        ff_energy={'qm': rec['energy_qm'],
                   'amber99': rng.normal(0, 1.0, n_confs),
                   'amber99_nonbonded': e_nb},
        ff_gradient={'qm': rec['gradient_qm'],
                     'amber99': rng.normal(0, 1.0, (n_confs, n, 3)),
                     'amber99_nonbonded': g_nb},
    )
    pep_dir = tmp_path / 'peptides'
    pep_dir.mkdir()
    md.save(pep_dir / 'pep0.npz')

    round_tripped = MolData.load(pep_dir / 'pep0.npz')
    assert round_tripped.molecule.charge_model == 'amber99'
    assert set(round_tripped.ff_energy) == {'qm', 'amber99',
                                            'amber99_nonbonded'}

    ds = assemble_dataset_dir(pep_dir, tmp_path / 'ds', ds_name='pep')
    assert len(Dataset.load(tmp_path / 'ds')) == 1
