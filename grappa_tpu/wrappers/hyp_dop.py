"""Hydroxyproline (HYP) / dihydroxyphenylalanine (DOP) residue support
(optional, openmm-gated).

Counterpart of the reference utility (reference: src/grappa/utils/
hyp_dop_utility.py:9-238 + amber99sbildn-star_.xml): PDB files with these
non-standard residues lack the template bonds, so an amber99sbildn-style
force field cannot type them. This module adds the missing intra-residue
bonds (and the standard backbone peptide bonds to neighboring residues) to
an openmm Topology so downstream parametrization works.

The bond templates below encode the heavy-atom + hydrogen connectivity of
the two residues by atom name.
"""
from __future__ import annotations

import importlib
from typing import Dict, List, Set, Tuple

# atom-name bond templates (intra-residue)
HYP_BONDS: List[Tuple[str, str]] = [
    ('N', 'CA'), ('N', 'CD'), ('CA', 'C'), ('CA', 'CB'), ('CA', 'HA'),
    ('C', 'O'), ('CB', 'CG'), ('CB', 'HB2'), ('CB', 'HB3'),
    ('CG', 'CD'), ('CG', 'OD1'), ('CG', 'HG'), ('OD1', 'HD1'),
    ('CD', 'HD22'), ('CD', 'HD23'),
]

DOP_BONDS: List[Tuple[str, str]] = [
    ('N', 'CA'), ('N', 'H'), ('CA', 'C'), ('CA', 'CB'), ('CA', 'HA'),
    ('C', 'O'), ('CB', 'CG'), ('CB', 'HB2'), ('CB', 'HB3'),
    ('CG', 'CD1'), ('CG', 'CD2'), ('CD1', 'CE1'), ('CD1', 'HD1'),
    ('CD2', 'CE2'), ('CD2', 'HD2'), ('CE1', 'CZ'), ('CE2', 'CZ'),
    ('CE1', 'OE1'), ('CE2', 'OE2'), ('OE1', 'HE1'), ('OE2', 'HE2'),
]

RESIDUE_BONDS: Dict[str, List[Tuple[str, str]]] = {
    'HYP': HYP_BONDS,
    'DOP': DOP_BONDS,
}


def _require_openmm():
    if importlib.util.find_spec('openmm') is None:
        raise ImportError("openmm is required for HYP/DOP topology repair")


def add_nonstandard_residue_bonds(openmm_topology,
                                  residue_names: Set[str] = frozenset(
                                      RESIDUE_BONDS)) -> int:
    """Add missing intra-residue bonds for HYP/DOP residues and the peptide
    bond to the preceding/following residue. Returns the number of bonds
    added. Operates in place on the topology."""
    _require_openmm()

    existing = {frozenset((a.index, b.index))
                for a, b in openmm_topology.bonds()}
    added = 0

    def add(a, b):
        nonlocal added
        key = frozenset((a.index, b.index))
        if key not in existing:
            openmm_topology.addBond(a, b)
            existing.add(key)
            added += 1

    for chain in openmm_topology.chains():
        residues = list(chain.residues())
        for i, res in enumerate(residues):
            name = res.name.upper().strip()
            if name not in residue_names or name not in RESIDUE_BONDS:
                continue
            atoms = {a.name: a for a in res.atoms()}
            for n1, n2 in RESIDUE_BONDS[name]:
                if n1 in atoms and n2 in atoms:
                    add(atoms[n1], atoms[n2])
            # backbone peptide bonds to neighbors
            if i > 0:
                prev_atoms = {a.name: a for a in residues[i - 1].atoms()}
                if 'C' in prev_atoms and 'N' in atoms:
                    add(prev_atoms['C'], atoms['N'])
            if i + 1 < len(residues):
                next_atoms = {a.name: a for a in residues[i + 1].atoms()}
                if 'C' in atoms and 'N' in next_atoms:
                    add(atoms['C'], next_atoms['N'])
    return added
