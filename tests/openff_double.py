"""A minimal stand-in for the openff-toolkit / rdkit API surface used by
grappa_tpu.wrappers.openff_utils (test double).

Backs `Molecule.from_mapped_smiles` with the first-party mapped-SMILES
parser (grappa_tpu.data.smiles), exposes atoms/bonds/partial_charges/
smirnoff_impropers with openff's attribute names, and provides a tiny rdkit
shim (HybridizationType + GetAtoms) whose hybridization/aromaticity
assignments are a deterministic function of connectivity — enough to
execute the import-gated glue; chemistry fidelity is not the point.

The SMIRNOFF-engine path (ForceField.create_openmm_system) is NOT doubled:
it is a full force-field typing engine, and molecule_from_smiles /
get_openmm_system stay gated on the real openff-toolkit.

Install with install(), remove with uninstall().
"""
from __future__ import annotations

import importlib.machinery
import sys
import types
from typing import List, Optional

import numpy as np

from grappa_tpu.data.smiles import parse_mapped_smiles
from grappa_tpu.graph_features import ring_membership_sizes


class FFQuantity:
    """pint-like quantity: division by the unit exposes .magnitude."""

    def __init__(self, magnitude):
        self.magnitude = np.asarray(magnitude)

    def __truediv__(self, unit):
        return self

    def __rmul__(self, other):
        return FFQuantity(other)


class _FFUnit:
    def __rmul__(self, other):        # np.asarray(x) * elementary_charge
        return FFQuantity(other)

    def __rtruediv__(self, other):
        return FFQuantity(other)


class HybridizationType:
    S, SP, SP2, SP3, SP3D, SP3D2, UNSPECIFIED = range(7)


class _RDAtom:
    def __init__(self, hybridization, aromatic: bool):
        self._h = hybridization
        self._a = bool(aromatic)

    def GetHybridization(self):
        return self._h

    def GetIsAromatic(self):
        return self._a


class _RDMol:
    def __init__(self, atoms: List[_RDAtom]):
        self._atoms = atoms

    def GetNumAtoms(self):
        return len(self._atoms)

    def GetAtoms(self):
        return list(self._atoms)


class _OFFAtom:
    def __init__(self, index: int, z: int):
        self.molecule_atom_index = index
        self.atomic_number = int(z)


class _OFFBond:
    def __init__(self, a: int, b: int):
        self.atom1_index = int(a)
        self.atom2_index = int(b)


class OFFMolecule:
    """openff.toolkit.topology.Molecule double (SMILES-parse backed)."""

    def __init__(self, atomic_numbers, bonds,
                 partial_charges: Optional[np.ndarray] = None):
        self.atoms = [_OFFAtom(i, z) for i, z in enumerate(atomic_numbers)]
        self.bonds = [_OFFBond(a, b) for a, b in bonds]
        self.partial_charges = (FFQuantity(partial_charges)
                                if partial_charges is not None else None)

    @classmethod
    def from_mapped_smiles(cls, smiles: str,
                           allow_undefined_stereo: bool = False):
        zs, bonds, _ = parse_mapped_smiles(smiles)
        return cls(zs, bonds)

    # -- derived connectivity ------------------------------------------
    def _neighbors(self):
        nbrs = {i: [] for i in range(len(self.atoms))}
        for b in self.bonds:
            nbrs[b.atom1_index].append(b.atom2_index)
            nbrs[b.atom2_index].append(b.atom1_index)
        return nbrs

    @property
    def smirnoff_impropers(self):
        """All orderings with the trivalent center at position 1 (openff's
        convention), three per center — the glue only uses the atom sets."""
        out = []
        for c, nb in self._neighbors().items():
            if len(nb) != 3:
                continue
            n0, n1, n2 = sorted(nb)
            for order in ((n0, c, n1, n2), (n1, c, n2, n0), (n2, c, n0, n1)):
                out.append(tuple(self.atoms[i] for i in order))
        return out

    amber_impropers = smirnoff_impropers

    def to_rdkit(self):
        nbrs = self._neighbors()
        bond_pairs = [(b.atom1_index, b.atom2_index) for b in self.bonds]
        ring_sizes = ring_membership_sizes(bond_pairs, len(self.atoms))
        atoms = []
        for i, atom in enumerate(self.atoms):
            degree = len(nbrs[i])
            if atom.atomic_number == 1:
                h = HybridizationType.S
            elif degree >= 4:
                h = HybridizationType.SP3
            elif degree == 3:
                h = HybridizationType.SP2
            elif degree == 2:
                h = HybridizationType.SP
            else:
                h = HybridizationType.SP3
            aromatic = any(s in (5, 6) for s in ring_sizes[i])
            atoms.append(_RDAtom(h, aromatic))
        return _RDMol(atoms)


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def install():
    offtk = _module('openff.toolkit')
    topology = _module('openff.toolkit.topology')
    topology.Molecule = OFFMolecule
    offtk.topology = topology

    openff = _module('openff')
    openff.toolkit = offtk
    units = _module('openff.units')
    unit_mod = _module('openff.units.unit')
    units.unit = unit_mod
    unit_mod.elementary_charge = _FFUnit()
    openff.units = units

    rdkit = _module('rdkit')
    chem = _module('rdkit.Chem')
    rdchem = _module('rdkit.Chem.rdchem')
    rdchem.HybridizationType = HybridizationType
    chem.rdchem = rdchem
    rdkit.Chem = chem

    for name, mod in (('openff', openff), ('openff.toolkit', offtk),
                      ('openff.toolkit.topology', topology),
                      ('openff.units', units),
                      ('openff.units.unit', unit_mod),
                      ('rdkit', rdkit), ('rdkit.Chem', chem),
                      ('rdkit.Chem.rdchem', rdchem)):
        sys.modules[name] = mod


def uninstall():
    for name in ('openff', 'openff.toolkit', 'openff.toolkit.topology',
                 'openff.units', 'openff.units.unit',
                 'rdkit', 'rdkit.Chem', 'rdkit.Chem.rdchem'):
        sys.modules.pop(name, None)
