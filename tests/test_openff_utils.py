"""Execute the openff-gated glue (grappa_tpu/wrappers/openff_utils.py)
against the first-party openff/rdkit double (tests/openff_double.py).

Covers get_openff_molecule (mapped-SMILES -> molecule), the hybridization/
aromaticity featurizers, and molecule_from_openff (atoms, bonds, charges,
smirnoff improper sets, additional features). The SMIRNOFF engine path
(get_openmm_system) stays gated on the real toolkit and is not doubled.
"""
import numpy as np
import pytest

import openff_double

# ethanol-like mapped smiles: C-C-O chain, explicit Hs, full map
ETHANOL = ('[C:1]([H:4])([H:5])([H:6])[C:2]([H:7])([H:8])[O:3][H:9]')
# a ring + an sp2 center (cyclopentadiene-ish connectivity, mapped)
RINGY = ('[C:1]1([H:6])([H:7])[C:2]([H:8])=[C:3]([H:9])[C:4]([H:10])='
         '[C:5]1[H:11]')


@pytest.fixture(scope='module', autouse=True)
def fake_openff():
    openff_double.install()
    yield
    openff_double.uninstall()


def test_get_openff_molecule_from_mapped_smiles():
    from grappa_tpu.wrappers.openff_utils import get_openff_molecule
    mol = get_openff_molecule(ETHANOL)
    zs = [a.atomic_number for a in mol.atoms]
    assert zs == [6, 6, 8, 1, 1, 1, 1, 1, 1]
    assert len(mol.bonds) == 8


def test_featurizers_match_double_assignments():
    from grappa_tpu.wrappers.openff_utils import (
        get_is_aromatic, get_sp_hybridization_encoding)
    mol = openff_double.OFFMolecule.from_mapped_smiles(RINGY)
    enc = get_sp_hybridization_encoding(mol)
    assert enc.shape == (11, 6)
    np.testing.assert_allclose(enc.sum(axis=1), 1.0)   # one-hot everywhere
    arom = get_is_aromatic(mol)
    assert arom.shape == (11, 1)
    # the five ring atoms are flagged, the hydrogens are not
    assert arom[:5].all() and not arom[5:].any()


def test_molecule_from_openff():
    from grappa_tpu.wrappers.openff_utils import molecule_from_openff
    charges = np.linspace(-0.4, 0.4, 9).astype(np.float32)
    off = openff_double.OFFMolecule.from_mapped_smiles(ETHANOL)
    off.partial_charges = openff_double.FFQuantity(charges)

    mol = molecule_from_openff(off)
    assert list(mol.atomic_numbers) == [6, 6, 8, 1, 1, 1, 1, 1, 1]
    np.testing.assert_allclose(mol.partial_charges, charges)
    assert len(mol.bonds) == 8
    # no trivalent heavy centers in ethanol -> impropers may exist only at
    # carbons with 3 non-H neighbors; here: none of the listed smirnoff sets
    # survive canonical improper detection unless a degree-3 center exists
    assert mol.additional_features['sp_hybridization'].shape == (9, 6)
    assert mol.additional_features['is_aromatic'].shape == (9, 1)

    # explicit charges override the molecule's
    mol2 = molecule_from_openff(off, partial_charges=np.zeros(9))
    np.testing.assert_allclose(mol2.partial_charges, 0.0)


def test_molecule_from_openff_impropers_roundtrip():
    """smirnoff improper sets at trivalent centers land in the Molecule's
    canonical improper list (central atom at IMPROPER_CENTRAL_IDX)."""
    from grappa_tpu.constants import IMPROPER_CENTRAL_IDX
    from grappa_tpu.wrappers.openff_utils import molecule_from_openff
    off = openff_double.OFFMolecule.from_mapped_smiles(RINGY)
    off.partial_charges = openff_double.FFQuantity(np.zeros(11))
    # ring carbons 1..4 have 3 neighbors each (2 ring + 1 H)
    assert len(off.smirnoff_impropers) > 0

    mol = molecule_from_openff(off)
    centers = {int(t[IMPROPER_CENTRAL_IDX]) for t in mol.impropers}
    nbrs = off._neighbors()
    expected = {i for i, nb in nbrs.items() if len(nb) == 3}
    assert centers == expected
