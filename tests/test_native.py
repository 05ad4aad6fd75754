"""Native C++ preprocessing: exact parity with the Python implementations
on random molecular graphs, plus a protein-scale sanity run."""
import time

import numpy as np
import pytest

from grappa_tpu import native, topology
from grappa_tpu.graph_features import degree_encoding
from grappa_tpu.graph_features import ring_membership_sizes

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def random_bonds(seed, n_atoms=None, ring_prob=0.5):
    rng = np.random.default_rng(seed)
    if n_atoms is None:
        n_atoms = int(rng.integers(4, 40))
    bonds = [(int(rng.integers(max(0, i - 4), i)), i)
             for i in range(1, n_atoms)]
    existing = {tuple(sorted(b)) for b in bonds}
    if n_atoms > 8 and rng.random() < ring_prob:
        for _ in range(2):
            a, b = sorted(rng.integers(0, n_atoms, 2))
            if a != b and (a, b) not in existing:
                bonds.append((int(a), int(b)))
                existing.add((a, b))
    return bonds, n_atoms


@pytest.mark.parametrize("seed", range(10))
def test_enumerate_tuples_parity(seed):
    bonds, _ = random_bonds(seed)
    angles_c, propers_c = native.enumerate_tuples(bonds)
    angles_py, propers_py = topology.enumerate_angles_propers(bonds)
    np.testing.assert_array_equal(angles_c,
                                  np.asarray(angles_py).reshape(-1, 3))
    np.testing.assert_array_equal(propers_c,
                                  np.asarray(propers_py).reshape(-1, 4))


@pytest.mark.parametrize("seed", range(10))
def test_neighbor_list_parity(seed):
    import os
    bonds, n = random_bonds(seed)
    deg = np.zeros(n, int)
    for a, b in bonds:
        deg[a] += 1
        deg[b] += 1
    maxdeg = max(8, int(deg.max()))
    nbr_c, mask_c = native.neighbor_list(bonds, n, maxdeg)
    os.environ['GRAPPA_TPU_NO_NATIVE'] = '1'
    try:
        from grappa_tpu.data.graph_batch import build_neighbor_list
        # bypass the native shortcut by calling the python body directly
        lists = [[] for _ in range(n)]
        for a, b in bonds:
            lists[a].append(b)
            lists[b].append(a)
        nbr_py = np.zeros((n, maxdeg), np.int32)
        mask_py = np.zeros((n, maxdeg), bool)
        for i, l in enumerate(lists):
            nbr_py[i, :len(l)] = sorted(l)
            mask_py[i, :len(l)] = True
    finally:
        del os.environ['GRAPPA_TPU_NO_NATIVE']
    np.testing.assert_array_equal(nbr_c, nbr_py)
    np.testing.assert_array_equal(mask_c, mask_py)


@pytest.mark.parametrize("seed", range(10))
def test_ring_encoding_parity(seed):
    bonds, n = random_bonds(seed, ring_prob=1.0)
    enc_c = native.ring_encoding(bonds, n)
    sizes = ring_membership_sizes(bonds, n)
    enc_py = np.zeros((n, 7), np.float32)
    for i, s in enumerate(sizes):
        if s:
            enc_py[i, 0] = 1.0
            for size in s:
                if 3 <= size <= 8:
                    enc_py[i, size - 2] = 1.0
    np.testing.assert_array_equal(enc_c, enc_py)


def test_degree_overflow_raises():
    bonds = [(0, i) for i in range(1, 12)]
    with pytest.raises(ValueError, match="degree"):
        native.neighbor_list(bonds, 12, 8)


def test_protein_scale():
    """2600-atom protein-like chain: native featurization must be fast and
    agree with itself across calls."""
    rng = np.random.default_rng(0)
    n = 2600
    bonds = [(int(rng.integers(max(0, i - 3), i)), i) for i in range(1, n)]
    # sprinkle aromatic-like rings
    for start in range(0, n - 6, 120):
        ring = [(start + i, start + i + 1) for i in range(5)]
        ring.append((start + 5, start))
        existing = {tuple(sorted(b)) for b in bonds}
        bonds.extend(b for b in ring if tuple(sorted(b)) not in existing)

    t0 = time.time()
    angles, propers = native.enumerate_tuples(bonds)
    enc = native.ring_encoding(bonds, n)
    nbr, mask = native.neighbor_list(bonds, n, 8)
    dt = time.time() - t0
    assert len(angles) > n and len(propers) > n
    assert enc.shape == (n, 7)
    assert dt < 2.0, f"native preprocessing too slow: {dt:.2f}s"
