"""Execute the kimmdy Parameterizer hook against the kimmdy test double.

Covers build_molecule_from_kimmdy (nr-indexed molecule + radical flags),
the full-topology parameterize_topology path (every bond/angle/dihedral
entry rewritten with GROMACS units, matching a direct Grappa.predict), and
the focus_nrs partial path (only the field-of-view neighborhood rewritten —
the kimmdy radical workflow).
"""
import jax
import numpy as np
import pytest

import kimmdy_double

from grappa_tpu.api import Grappa
from grappa_tpu.data.graph_batch import MolGraph, collate
from grappa_tpu.data.synthetic import random_molecule
from grappa_tpu.models.grappa_model import get_small_model_config, make_model


@pytest.fixture(scope='module', autouse=True)
def fake_kimmdy():
    kimmdy_double.install()
    yield
    kimmdy_double.uninstall()


@pytest.fixture(scope='module')
def small_grappa():
    cfg = get_small_model_config()
    model = make_model(cfg)
    mol = random_molecule(seed=1)
    batch = collate([MolGraph.from_molecule(mol)], n_confs=1)
    params = model.init(jax.random.key(0), batch)
    return Grappa(model, params, {'model_config': cfg})


def test_build_molecule_from_kimmdy(small_grappa):
    from grappa_tpu.wrappers.kimmdy_adapter import build_molecule_from_kimmdy
    mol = random_molecule(seed=4, n_atoms=12, charge_model='amber99')
    top = kimmdy_double.topology_from_molecule(mol, radicals=[3])

    rebuilt = build_molecule_from_kimmdy(top)
    assert list(rebuilt.atoms) == list(range(1, 13))   # 1-based nrs
    np.testing.assert_array_equal(rebuilt.atomic_numbers, mol.atomic_numbers)
    np.testing.assert_allclose(rebuilt.partial_charges, mol.partial_charges,
                               atol=1e-6)
    assert ({frozenset((int(a) - 1, int(b) - 1)) for a, b in rebuilt.bonds}
            == {frozenset((int(a), int(b))) for a, b in mol.bonds})
    # radical flag survives (atom id 3 -> nr '4')
    flags = np.asarray(rebuilt.additional_features['is_radical']).ravel()
    assert flags[3] == 1.0 and flags.sum() == 1.0

    # sub-selection: only the requested nrs
    sub = build_molecule_from_kimmdy(top, atom_nrs={'1', '2', '3'})
    assert list(sub.atoms) == [1, 2, 3]
    assert all(int(a) in {1, 2, 3} and int(b) in {1, 2, 3}
               for a, b in sub.bonds)


def test_parameterize_topology_full(small_grappa):
    from grappa_tpu.wrappers.gromacs_wrapper import (
        ANGLE_EQ_FACTOR, BOND_EQ_FACTOR, BOND_K_FACTOR)
    from grappa_tpu.wrappers.kimmdy_adapter import (
        build_molecule_from_kimmdy, make_kimmdy_parameterizer)

    mol = random_molecule(seed=4, n_atoms=12, charge_model='amber99')
    top = kimmdy_double.topology_from_molecule(mol)

    parameterizer = make_kimmdy_parameterizer(small_grappa)()
    out = parameterizer.parameterize_topology(top)
    assert out is top

    expected = small_grappa.predict(build_molecule_from_kimmdy(top))
    lookup = {tuple(sorted((str(int(a)), str(int(b))))): i
              for i, (a, b) in enumerate(expected.bonds)}
    assert len(lookup) == len(top.bonds)
    for key, bond in top.bonds.items():
        i = lookup[tuple(sorted(key))]
        assert bond.funct == '1'
        np.testing.assert_allclose(
            float(bond.c0), expected.bond_eq[i] * BOND_EQ_FACTOR, rtol=1e-4)
        np.testing.assert_allclose(
            float(bond.c1), expected.bond_k[i] * BOND_K_FACTOR, rtol=1e-4)
    for key, angle in top.angles.items():
        assert angle.funct == '1' and angle.c0 is not None
        assert 0.0 < float(angle.c0) <= 180.0 * 1.0001   # degrees
    # torsions: one MultipleDihedrals per predicted tuple, per-periodicity
    # entries, and NO stale unparametrized entries left behind even though
    # the topology stored propers reversed / impropers in sorted order
    assert len(top.proper_dihedrals) == len(expected.propers)
    assert len(top.improper_dihedrals) == len(expected.impropers)
    assert all(md.dihedrals for md in top.proper_dihedrals.values())
    assert all(md.dihedrals for md in top.improper_dihedrals.values())
    md = next(iter(top.proper_dihedrals.values()))
    assert md.funct == '9'
    assert set(md.dihedrals) == {str(n + 1) for n in
                                 range(expected.proper_ks.shape[1])}
    assert next(iter(top.improper_dihedrals.values())).funct == '4'


def test_parameterize_topology_partial_focus(small_grappa):
    """focus_nrs: only tuples fully inside the field-of-view neighborhood
    of the focus atoms are rewritten; everything else keeps its original
    (unparametrized) entries."""
    from grappa_tpu.wrappers.gromacs_wrapper import fov_neighborhood
    from grappa_tpu.wrappers.kimmdy_adapter import make_kimmdy_parameterizer

    mol = random_molecule(seed=7, n_atoms=24, charge_model='amber99')
    top = kimmdy_double.topology_from_molecule(mol)

    focus = {'1'}
    parameterizer = make_kimmdy_parameterizer(small_grappa)()
    parameterizer.parameterize_topology(top, focus_nrs=focus)

    bonds_nr = [(int(a) + 1, int(b) + 1) for a, b in mol.bonds]
    apply_nrs = fov_neighborhood(bonds_nr, {1}, small_grappa.field_of_view)

    changed = {k for k, b in top.bonds.items() if b.c0 is not None}
    inside = {k for k in top.bonds
              if all(int(x) in apply_nrs for x in k)}
    assert changed == inside
    assert 0 < len(changed) < len(top.bonds)   # genuinely partial
