"""Tuple-enumeration semantics: canonical orders, improper canonicalization.

Mirrors the intent of the reference's tuple tests (reference:
tests/tuple_utils.py, tests/molecule.py): angles/propers enumerated from
bonds match an independent brute-force enumeration up to invariant
permutations.
"""
import itertools

import numpy as np
import pytest

from grappa_tpu import topology
from grappa_tpu.constants import IMPROPER_CENTRAL_IDX


def brute_force_angles_propers(bonds):
    bond_set = {tuple(sorted(b)) for b in bonds}
    atoms = sorted({a for b in bonds for a in b})

    def bonded(a, b):
        return tuple(sorted((a, b))) in bond_set

    angles = set()
    propers = set()
    for a, b, c in itertools.permutations(atoms, 3):
        if bonded(a, b) and bonded(b, c) and a < c:
            angles.add((a, b, c))
    for a, b, c, d in itertools.permutations(atoms, 4):
        if bonded(a, b) and bonded(b, c) and bonded(c, d) and a < d:
            propers.add((a, b, c, d))
    return angles, propers


@pytest.mark.parametrize("seed", range(5))
def test_angle_proper_enumeration_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 14))
    bonds = [(int(rng.integers(0, i)), i) for i in range(1, n)]
    # add a ring edge
    if n > 5:
        bonds.append((0, n - 1))
    angles, propers = topology.enumerate_angles_propers(bonds)
    ref_angles, ref_propers = brute_force_angles_propers(bonds)
    assert set(angles) == ref_angles
    assert set(propers) == ref_propers
    # no duplicates
    assert len(angles) == len(set(angles))
    assert len(propers) == len(set(propers))


def test_canonical_ordering():
    bonds = [(3, 1), (1, 0), (0, 2)]
    angles, propers = topology.enumerate_angles_propers(bonds)
    for a in angles:
        assert a[0] < a[2]
    for p in propers:
        assert p[0] < p[3]


def test_improper_detection_and_canonicalization():
    # star: center 1 bonded to 0, 2, 3 -> improper; chain 0-1-2-3 -> proper
    bonds = [(0, 1), (1, 2), (1, 3)]
    nbrs = topology.neighbor_map(bonds)
    pos = topology.improper_center((0, 2, 1, 3), nbrs)
    assert pos == 2
    propers, impropers = topology.classify_torsions([(0, 2, 1, 3)], nbrs)
    assert propers == []
    assert len(impropers) == 3
    # central atom pinned, three cyclic outer orders
    outers = []
    for imp in impropers:
        assert imp[IMPROPER_CENTRAL_IDX] == 1
        outers.append(tuple(x for i, x in enumerate(imp)
                            if i != IMPROPER_CENTRAL_IDX))
    a, b, c = outers[0]
    assert outers[1] == (b, c, a)
    assert outers[2] == (c, a, b)
    # all three versions share the same atom set
    assert all(sorted(i) == sorted(impropers[0]) for i in impropers)


def test_proper_wins_for_four_ring():
    bonds = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]  # 4-ring + diagonal
    nbrs = topology.neighbor_map(bonds)
    # (1,0,2,3): 0 is bonded to 1,2,3 -> improper-like, but also a path
    assert topology.is_proper_torsion((1, 0, 2, 3), nbrs)
    propers, impropers = topology.classify_torsions([(1, 0, 2, 3)], nbrs)
    assert len(propers) == 1 and len(impropers) == 0


def test_torsion_dedup_under_reversal():
    bonds = [(0, 1), (1, 2), (2, 3)]
    nbrs = topology.neighbor_map(bonds)
    propers, _ = topology.classify_torsions(
        [(0, 1, 2, 3), (3, 2, 1, 0)], nbrs)
    assert len(propers) == 1


def test_connectivity_check():
    assert topology.check_connected([(0, 1), (1, 2)], 3)
    assert not topology.check_connected([(0, 1)], 3)
