"""Serialization round-trips and schema invariants for the data model
(the reference's analogs: tests/molecule.py, tests/mol_data.py,
tests/parameters.py, tests/dataset.py)."""
import numpy as np
import pytest

from grappa_tpu import constants
from grappa_tpu.data import Molecule, Parameters, MolData
from grappa_tpu.data.synthetic import (
    make_dataset, make_moldata, random_molecule, random_parameters)
from grappa_tpu.graph_features import degree_encoding, ring_encoding


def test_molecule_roundtrip(tmp_path):
    mol = random_molecule(seed=3)
    path = tmp_path / "mol.npz"
    mol.save(path)
    mol2 = Molecule.load(path)
    np.testing.assert_array_equal(mol.atoms, mol2.atoms)
    np.testing.assert_array_equal(mol.bonds, mol2.bonds)
    np.testing.assert_array_equal(mol.angles, mol2.angles)
    np.testing.assert_array_equal(mol.propers, mol2.propers)
    np.testing.assert_array_equal(mol.impropers, mol2.impropers)
    for k in mol.additional_features:
        np.testing.assert_allclose(
            mol.additional_features[k], mol2.additional_features[k])
    assert mol2.charge_model == mol.charge_model


def test_molecule_json_roundtrip(tmp_path):
    mol = Molecule.random()
    path = tmp_path / "mol.json"
    mol.to_json(path)
    mol2 = Molecule.from_json(path)
    np.testing.assert_array_equal(mol.bonds, mol2.bonds)
    np.testing.assert_array_equal(mol.impropers, mol2.impropers)


def test_molecule_features():
    mol = random_molecule(seed=1)
    feats = mol.input_features()
    n = len(mol.atoms)
    assert feats['atomic_number'].shape == (n, constants.MAX_ELEMENT)
    assert np.all(feats['atomic_number'].sum(axis=1) == 1)
    assert feats['partial_charge'].shape == (n,)
    assert feats['ring_encoding'].shape == (n, 7)
    assert feats['degree'].shape == (n, 6)
    assert feats['mass'].shape == (n, 2)
    assert feats['charge_model'].shape == (n, 2)
    # am1BCC one-hot for synthetic molecules
    assert np.all(feats['charge_model'][:, 0] == 1.0)


def test_ring_encoding_cyclohexane_with_tail():
    # 6-ring 0..5 plus tail atom 6
    bonds = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (0, 6)]
    enc = ring_encoding(bonds, 7)
    for i in range(6):
        assert enc[i, 0] == 1.0  # in ring
        assert enc[i, 4] == 1.0  # ring size 6 -> column 1 + (6-3)
    assert enc[6].sum() == 0.0
    deg = degree_encoding(bonds, 7)
    assert deg[0, 2] == 1.0  # degree 3
    assert deg[6, 0] == 1.0  # degree 1


def test_ring_encoding_fused_rings():
    # two fused 5-rings sharing an edge (0,1): cycles 5,5 and 8
    bonds = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0),
             (1, 5), (5, 6), (6, 7), (7, 0)]
    enc = ring_encoding(bonds, 8)
    assert all(enc[i, 0] == 1.0 for i in range(8))
    # shared-edge atoms are in two 5-rings and the 8-perimeter
    assert enc[0, 3] == 1.0 and enc[0, 6] == 1.0


def test_parameters_signed_k_roundtrip():
    mol = random_molecule(seed=5)
    p = random_parameters(mol, seed=5)
    signed = Parameters.to_signed_k(p.proper_ks, p.proper_phases)
    ks, phases = Parameters.from_signed_k(signed)
    np.testing.assert_allclose(ks, p.proper_ks, rtol=1e-6)
    # phases only match where k > 0 (phase of k=0 is arbitrary)
    nz = p.proper_ks > 0
    np.testing.assert_allclose(phases[nz], p.proper_phases[nz], atol=1e-6)


def test_parameters_eq_sanity_checks():
    mol = Molecule.random()
    pred = {
        'n2_k': np.ones(len(mol.bonds)),
        'n2_eq': np.full(len(mol.bonds), 0.1),  # too short
        'n3_k': np.ones(len(mol.angles)),
        'n3_eq': np.full(len(mol.angles), 2.0),
        'n4_k': np.zeros((len(mol.propers), 6)),
        'n4_improper_k': np.zeros((len(mol.impropers), 3)),
    }
    with pytest.raises(RuntimeError):
        Parameters.from_prediction(mol, pred)
    pred['n2_eq'] = np.full(len(mol.bonds), 1.2)
    pred['n3_eq'] = np.full(len(mol.angles), 0.1)  # too small
    with pytest.raises(RuntimeError):
        Parameters.from_prediction(mol, pred)


def test_moldata_roundtrip(tmp_path):
    md = make_moldata(seed=7, n_confs=5)
    path = tmp_path / "mol.npz"
    md.save(path)
    md2 = MolData.load(path)
    np.testing.assert_allclose(md.xyz, md2.xyz)
    np.testing.assert_allclose(md.energy, md2.energy)
    np.testing.assert_allclose(md.energy_ref, md2.energy_ref)
    np.testing.assert_allclose(md.gradient_ref, md2.gradient_ref)
    np.testing.assert_allclose(
        md.classical_parameters.bond_k, md2.classical_parameters.bond_k)
    np.testing.assert_allclose(
        md.classical_parameters.proper_ks, md2.classical_parameters.proper_ks)
    assert md2.mol_id == md.mol_id
    assert 'qm' in md2.ff_energy


def test_nan_params_shapes():
    mol = random_molecule(seed=2)
    p = Parameters.get_nan_params(mol)
    assert p.bond_k.shape == (len(mol.bonds),)
    assert p.proper_ks.shape == (len(mol.propers), constants.N_PERIODICITY_PROPER)
    assert np.all(np.isnan(p.bond_k))
    d = p.signed_k_dict(n_periodicity_proper=6, n_periodicity_improper=3)
    assert d['n4_k'].shape == (len(mol.propers), 6)
    assert d['n4_improper_k'].shape == (len(mol.impropers), 3)
    assert np.all(np.isnan(d['n2_k']))


def test_assign_torsion_parameters():
    """The torsion-assignment logic (the reference's from_lists semantics):
    sign folding, duplicate accumulation, permutation matching."""
    from grappa_tpu.data.parameters import assign_torsion_parameters

    # chain 0-1-2-3 (one proper) + star center 1 bonded to 0,2,4 (impropers)
    mol = Molecule(atoms=[0, 1, 2, 3, 4],
                   bonds=[(0, 1), (1, 2), (2, 3), (1, 4)],
                   impropers=[(0, 2, 1, 4)],
                   atomic_numbers=[6, 6, 6, 6, 8],
                   partial_charges=[0.0] * 5)
    assert len(mol.propers) == 2 and len(mol.impropers) == 3

    proper = tuple(int(x) for x in mol.propers[0])
    imp0 = tuple(int(x) for x in mol.impropers[0])
    # antisymmetric permutation of the first improper version (swap inner)
    imp_anti = (imp0[0], imp0[2], imp0[1], imp0[3])

    torsions = [
        proper[::-1],        # reversal matches the proper
        proper,              # duplicate entry, same phase -> ks add
        imp_anti,            # improper via antisymmetric permutation
    ]
    ks = [1.0, 0.5, -2.0]    # negative k folds to phase+pi
    phases = [0.0, 0.0, 0.0]
    periodicities = [2, 2, 2]
    pk, pp, ik, ip = assign_torsion_parameters(
        mol, torsions, ks, phases, periodicities)
    assert pk[0, 1] == pytest.approx(1.5)     # accumulated
    assert pp[0, 1] == pytest.approx(0.0)
    assert ik[0, 1] == pytest.approx(2.0)     # |k|
    assert ip[0, 1] == pytest.approx(np.pi)   # sign folded into phase

    # conflicting duplicate phases -> error
    with pytest.raises(ValueError, match='different phases'):
        assign_torsion_parameters(mol, [proper, proper], [1.0, 1.0],
                                  [0.0, np.pi / 2], [1, 1])
    # antisymmetric improper with non-0/pi phase -> error (or skip)
    with pytest.raises(ValueError, match='antisymmetric'):
        assign_torsion_parameters(mol, [imp_anti], [1.0], [1.0], [2])
    pk, pp, ik, ip = assign_torsion_parameters(
        mol, [imp_anti], [1.0], [1.0], [2], allow_skip_improper=True)
    assert ik.sum() == 0
    # unknown torsion -> error
    with pytest.raises(ValueError, match='no canonical'):
        assign_torsion_parameters(mol, [(0, 3, 4, 2)], [1.0], [0.0], [1])


def test_zero_proper_molecule_roundtrip():
    """A star-shaped molecule with NO proper torsions (synthetic seed 7514:
    6 atoms, 0 propers, 0 impropers) must flow through classical-parameter
    targets, batching and the energy path — signed_k_dict used to crash on
    reshape of the empty proper array (found by the 1000-molecule run)."""
    import jax
    from grappa_tpu.data.graph_batch import MolGraph, collate
    from grappa_tpu.data.synthetic import make_moldata
    from grappa_tpu.models import mm_energy
    from grappa_tpu.models.grappa_model import (
        get_small_model_config, make_model)

    md = make_moldata(seed=7514, n_confs=3, learnable=True, conf_noise=0.08)
    assert len(md.molecule.propers) == 0       # the regression precondition

    d = md.classical_parameters.signed_k_dict()
    assert d['n4_k'].shape[0] == 0 and d['n4_improper_k'].shape[0] == 0

    batch = collate([MolGraph.from_moldata(md)], n_confs=3)
    model = make_model(get_small_model_config())
    params = model.init(jax.random.key(0), batch)
    energy, gradient = mm_energy.energy_and_gradient(
        batch, model.apply(params, batch))
    assert np.isfinite(np.asarray(energy)).all()
    assert np.isfinite(np.asarray(gradient)).all()

    # the extreme of the class: a diatomic (no angles either)
    from grappa_tpu.data import Molecule
    diatomic = Molecule(atoms=[0, 1], bonds=[(0, 1)], impropers=[],
                        atomic_numbers=[1, 9], partial_charges=[0.2, -0.2])
    b2 = collate([MolGraph.from_molecule(diatomic)], n_confs=2)
    b2 = b2.replace(xyz=np.random.default_rng(0).normal(
        0, 1, np.asarray(b2.xyz).shape).astype(np.float32))
    p2 = model.init(jax.random.key(0), b2)
    e2, g2 = mm_energy.energy_and_gradient(b2, model.apply(p2, b2))
    assert np.isfinite(np.asarray(e2)).all()
    assert np.isfinite(np.asarray(g2)).all()


def test_k_fold_duplicate_consistency():
    """Overlapping subdatasets: every duplicate mol_id lands in exactly one
    fold, so no fold has it on both the train and test side (reference
    k-fold semantics, torch_utils.py:12-352)."""
    from grappa_tpu.data.dataset import k_fold_split_ids
    ids_by_ds = {
        'a': [f'mol{i}' for i in range(20)],
        'b': [f'mol{i}' for i in range(10, 30)],     # 10 duplicates with a
        'c': [f'mol{i}' for i in range(25, 40)],     # 5 duplicates with b
    }
    k = 5
    splits = k_fold_split_ids(ids_by_ds, k=k, seed=3)
    assert len(splits) == k
    all_ids = {i for ids in ids_by_ds.values() for i in ids}
    tests = [set(s['test']) for s in splits]
    # each unique id is test exactly once across the k folds
    for mid in all_ids:
        assert sum(mid in t for t in tests) == 1, mid
    for s in splits:
        tr, vl, te = set(s['train']), set(s['val']), set(s['test'])
        assert not (tr & te) and not (tr & vl) and not (vl & te)
        assert tr | vl | te == all_ids
    # stratification: the first-processed ds (no prior duplicate
    # assignments) is dealt evenly; later datasets are as even as their
    # already-assigned duplicates allow
    counts_a = [len(set(ids_by_ds['a']) & t) for t in tests]
    assert max(counts_a) - min(counts_a) <= 1, counts_a


def test_k_fold_flat_sequence_still_works():
    from grappa_tpu.data.dataset import k_fold_split_ids
    splits = k_fold_split_ids([f'm{i}' for i in range(17)] * 2, k=4, seed=0)
    assert len(splits) == 4
    seen = [i for s in splits for i in s['test']]
    assert sorted(seen) == sorted({f'm{i}' for i in range(17)})


def test_negative_pi_phase_accepted():
    """Phase -pi is physically identical to +pi (cos(n*phi + pi) ==
    cos(n*phi - pi)); engine-exported torsions commonly use -180 deg and
    must convert, not crash (round-3 review regression)."""
    from grappa_tpu.data.parameters import (Parameters,
                                            assign_torsion_parameters)

    mol = Molecule(atoms=[0, 1, 2, 3],
                   bonds=[(0, 1), (1, 2), (2, 3)],
                   impropers=[],
                   atomic_numbers=[6, 6, 6, 6],
                   partial_charges=[0.0] * 4)
    proper = tuple(int(x) for x in mol.propers[0])
    pk, pp, ik, ip = assign_torsion_parameters(
        mol, [proper], [1.5], [-np.pi], [2])
    assert pk[0, 1] == 1.5
    # canonicalized to +pi -> signed k is negative
    signed = Parameters.to_signed_k(pk[0:1, 1], pp[0:1, 1])
    assert signed[0] == -1.5
    # and a tiny negative phase is treated as 0
    signed0 = Parameters.to_signed_k(np.array([2.0]), np.array([-1e-3]))
    assert signed0[0] == 2.0


def test_from_arrays_partial_gradients():
    """gradient and nonbonded_gradient are independently optional."""
    md_src = make_moldata(seed=4, n_confs=3)
    mol, xyz = md_src.molecule, md_src.xyz
    e = md_src.energy
    nb = np.zeros_like(e) + 2.0

    # gradient without nonbonded_gradient: treated as zero nonbonded
    md = MolData.from_arrays(mol, xyz, e, nb, gradient=md_src.gradient)
    np.testing.assert_array_equal(md.gradient_ref, md_src.gradient)

    # nonbonded_gradient without gradient: not silently discarded
    nbg = np.full_like(xyz, 0.25)
    md2 = MolData.from_arrays(mol, xyz, e, nb, nonbonded_gradient=nbg)
    np.testing.assert_array_equal(md2.gradient_ref, -nbg)
    np.testing.assert_array_equal(
        md2.ff_nonbonded_gradient['reference_ff'], nbg)


def test_remove_uncommon_features_does_not_mutate_sibling_views():
    """Entries are shared across dataset views; stripping features in one
    view must not corrupt another view's molecules or graph cache."""
    from grappa_tpu.data.dataset import Dataset

    mds = make_dataset(n_mols=4, n_confs=2, seed=6)
    for md in mds[:2]:
        md.molecule.additional_features['extra_feat'] = np.ones(
            (len(md.molecule.atoms), 1), np.float32)
    ds = Dataset.from_moldata(mds, 'syn')
    # cache a graph in the parent view BEFORE stripping in the subset
    _ = ds.graph(0)
    assert 'extra_feat' in ds.entries[0].molecule.additional_features

    # the subset molecules all carry extra_feat -> common within subset,
    # BUT mixing with the rest of ds would differ; strip in a subset of
    # mixed entries to force deletion:
    mixed, _, _ = ds.split([m.mol_id for m in mds[1:3]], [], [],
                           check_disjoint=False)
    mixed.remove_uncommon_features()
    # parent view untouched
    assert 'extra_feat' in ds.entries[1].molecule.additional_features
    # subset's own entry was copied, not shared
    assert all('extra_feat' not in e.molecule.additional_features
               for e in mixed.entries)


def test_smiles_ring_digit_before_atom_errors():
    from grappa_tpu.data.smiles import SmilesError, parse_mapped_smiles
    with pytest.raises(SmilesError, match='before any atom'):
        parse_mapped_smiles('1CC1')
