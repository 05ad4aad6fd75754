"""TPU-native graph representation: flat, statically-shaped, padded arrays.

This replaces the reference's dynamic DGL heterographs (reference:
src/grappa/data/Molecule.py:429-537 builds node types g/n1/n2/n3/n4/
n4_improper; src/grappa/utils/dgl_utils.py:11-82 batches by offsetting
indices). Here a molecule is a set of flat numpy arrays (`MolGraph`) and a
batch is a single concatenation with

  * per-node / per-tuple boolean masks for padding,
  * int32 segment ids (`*_mol`) mapping nodes/tuples to their molecule,
  * a padded fixed-width neighbor list for message passing,
  * a conformer axis of fixed length with a per-molecule conf mask.

Everything jit-compiles once per padded shape bucket; per-molecule pooling is
`jax.ops.segment_sum` over the segment ids. Padded tuples point at node 0 and
are masked; padded conformers replicate the last valid conformer so that all
geometry stays non-degenerate (no NaN-producing zero vectors).
"""
from __future__ import annotations

from dataclasses import dataclass as py_dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

from grappa_tpu import constants
from grappa_tpu.data.moldata import MolData
from grappa_tpu.data.molecule import Molecule

TERMS = ('n2', 'n3', 'n4', 'n4_improper')
TERM_ARITY = {'n2': 2, 'n3': 3, 'n4': 4, 'n4_improper': 4}


# ----------------------------------------------------------------------
# host-side, per-molecule arrays (numpy, unpadded)
@py_dataclass
class MolGraph:
    """One molecule as flat numpy arrays, ready for collation."""

    feats: Dict[str, np.ndarray]            # name -> (N, d) or (N,)
    neighbors: np.ndarray                   # (N, MAX_NEIGHBORS) int32
    neighbor_mask: np.ndarray               # (N, MAX_NEIGHBORS) bool
    tuple_idxs: Dict[str, np.ndarray]       # term -> (T, arity) int32
    xyz: np.ndarray                         # (N, C, 3) float32
    energy_ref: np.ndarray                  # (C,) float32 (centered)
    gradient_ref: np.ndarray                # (N, C, 3) float32
    k_ref: Dict[str, np.ndarray]            # n2_k, n2_eq, n3_k, n3_eq, n4_k, n4_improper_k
    atom_ids: np.ndarray                    # (N,) original atom ids
    mol_id: str = ''
    ds_name: str = ''
    ff_energy: Dict[str, np.ndarray] = None     # name -> (C,)
    ff_gradient: Dict[str, np.ndarray] = None   # name -> (N, C, 3)

    @property
    def n_atoms(self) -> int:
        return self.xyz.shape[0]

    @property
    def n_confs(self) -> int:
        return self.xyz.shape[1]

    # ------------------------------------------------------------------
    @classmethod
    def from_moldata(cls, md: MolData, ds_name: str = '',
                     n_periodicity_proper: int = constants.N_PERIODICITY_PROPER,
                     n_periodicity_improper: int = constants.N_PERIODICITY_IMPROPER,
                     max_neighbors: int = constants.MAX_NEIGHBORS,
                     exclude_feats: Sequence[str] = ()) -> 'MolGraph':
        mol = md.molecule
        feats = mol.input_features(exclude=exclude_feats)
        neighbors, neighbor_mask = build_neighbor_list(
            mol.bonds_by_index(), len(mol.atoms), max_neighbors)
        tuple_idxs = mol.tuple_indices()
        k_ref = md.classical_parameters.signed_k_dict(
            n_periodicity_proper, n_periodicity_improper)

        energy_ref = np.asarray(md.energy_ref, dtype=np.float32)
        energy_ref = energy_ref - energy_ref.mean() if len(energy_ref) else energy_ref
        return cls(
            feats=feats,
            neighbors=neighbors, neighbor_mask=neighbor_mask,
            tuple_idxs=tuple_idxs,
            xyz=np.asarray(md.xyz, dtype=np.float32).transpose(1, 0, 2),
            energy_ref=energy_ref,
            gradient_ref=np.asarray(
                md.gradient_ref, dtype=np.float32).transpose(1, 0, 2),
            k_ref=k_ref,
            atom_ids=np.asarray(mol.atoms, dtype=np.int64),
            mol_id=md.mol_id, ds_name=ds_name,
            ff_energy={k: np.asarray(v, np.float32)
                       for k, v in md.ff_energy.items()},
            ff_gradient={k: np.asarray(v, np.float32).transpose(1, 0, 2)
                         for k, v in md.ff_gradient.items()},
        )

    @classmethod
    def from_molecule(cls, mol: Molecule, xyz: Optional[np.ndarray] = None,
                      max_neighbors: int = constants.MAX_NEIGHBORS,
                      exclude_feats: Sequence[str] = ()) -> 'MolGraph':
        """Inference-path construction: no targets, optional conformers
        (xyz in (n_confs, n_atoms, 3))."""
        n = len(mol.atoms)
        feats = mol.input_features(exclude=exclude_feats)
        neighbors, neighbor_mask = build_neighbor_list(
            mol.bonds_by_index(), n, max_neighbors)
        if xyz is None:
            xyz = np.zeros((1, n, 3), np.float32)
            xyz[0, :, 0] = np.arange(n, dtype=np.float32)
        c = xyz.shape[0]
        zeros6 = lambda t, p: np.zeros((len(mol.tuple_indices()[t]), p), np.float32)
        return cls(
            feats=feats, neighbors=neighbors, neighbor_mask=neighbor_mask,
            tuple_idxs=mol.tuple_indices(),
            xyz=np.asarray(xyz, np.float32).transpose(1, 0, 2),
            energy_ref=np.zeros(c, np.float32),
            gradient_ref=np.zeros((n, c, 3), np.float32),
            k_ref={
                'n2_k': np.full(len(mol.bonds), np.nan, np.float32),
                'n2_eq': np.full(len(mol.bonds), np.nan, np.float32),
                'n3_k': np.full(len(mol.angles), np.nan, np.float32),
                'n3_eq': np.full(len(mol.angles), np.nan, np.float32),
                'n4_k': np.full_like(zeros6('n4', constants.N_PERIODICITY_PROPER), np.nan),
                'n4_improper_k': np.full_like(
                    zeros6('n4_improper', constants.N_PERIODICITY_IMPROPER), np.nan),
            },
            atom_ids=np.asarray(mol.atoms, dtype=np.int64),
            ff_energy={}, ff_gradient={},
        )


def build_neighbor_list(bonds_idx: np.ndarray, n_atoms: int,
                        max_neighbors: int = constants.MAX_NEIGHBORS
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Fixed-width padded neighbor list from 0-based bond indices."""
    if len(np.asarray(bonds_idx).reshape(-1)):
        from grappa_tpu import native
        result = native.neighbor_list(bonds_idx, n_atoms, max_neighbors)
        if result is not None:
            return result
    lists: List[List[int]] = [[] for _ in range(n_atoms)]
    for a, b in np.asarray(bonds_idx).reshape(-1, 2):
        lists[int(a)].append(int(b))
        lists[int(b)].append(int(a))
    deg = max((len(l) for l in lists), default=0)
    if deg > max_neighbors:
        raise ValueError(
            f"atom degree {deg} exceeds MAX_NEIGHBORS={max_neighbors}")
    neighbors = np.zeros((n_atoms, max_neighbors), np.int32)
    mask = np.zeros((n_atoms, max_neighbors), bool)
    for i, l in enumerate(lists):
        neighbors[i, :len(l)] = sorted(l)
        mask[i, :len(l)] = True
    return neighbors, mask


# ----------------------------------------------------------------------
# device-side batch
@struct.dataclass
class TermBatch:
    idxs: jnp.ndarray    # (T, arity) int32, batch-level node indices
    mask: jnp.ndarray    # (T,) bool
    mol: jnp.ndarray     # (T,) int32 segment ids (padded -> num_mols)
    k_ref: jnp.ndarray   # (T,) or (T, n_per) float32 (NaN if unknown)
    eq_ref: Optional[jnp.ndarray] = None  # (T,) for n2/n3


@struct.dataclass
class GraphBatch:
    feats: Dict[str, jnp.ndarray]
    node_mask: jnp.ndarray        # (N,) bool
    node_mol: jnp.ndarray         # (N,) int32
    neighbors: jnp.ndarray        # (N, D) int32
    neighbor_mask: jnp.ndarray    # (N, D) bool
    xyz: jnp.ndarray              # (N, C, 3) float32
    conf_mask: jnp.ndarray        # (M, C) bool
    energy_ref: jnp.ndarray       # (M, C) float32
    gradient_ref: jnp.ndarray     # (N, C, 3) float32
    terms: Dict[str, TermBatch]
    num_mols: int = struct.field(pytree_node=False)

    @property
    def num_nodes(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_confs(self) -> int:
        return self.xyz.shape[1]

    def atoms_per_mol(self) -> jnp.ndarray:
        import jax
        return jax.ops.segment_sum(
            self.node_mask.astype(jnp.float32), self.node_mol,
            num_segments=self.num_mols + 1)[:self.num_mols]


# ----------------------------------------------------------------------
def _round_up(x: int, mult: int, minimum: int) -> int:
    return max(minimum, ((x + mult - 1) // mult) * mult)


@py_dataclass
class PadSpec:
    """Target padded sizes for one batch (static per compiled program)."""
    n_nodes: int
    n_tuples: Dict[str, int]
    n_confs: int

    @classmethod
    def for_graphs(cls, graphs: Sequence[MolGraph], n_confs: int,
                   node_mult: int = 64, tuple_mult: int = 128) -> 'PadSpec':
        n_nodes = _round_up(sum(g.n_atoms for g in graphs), node_mult, node_mult)
        n_tuples = {
            t: _round_up(sum(len(g.tuple_idxs[t]) for g in graphs),
                         tuple_mult, tuple_mult)
            for t in TERMS
        }
        return cls(n_nodes=n_nodes, n_tuples=n_tuples, n_confs=n_confs)


def _subsample_confs(g: MolGraph, n_confs: int,
                     rng: Optional[np.random.Generator]):
    """Pick conformer columns: subsample without replacement if too many,
    keep all (padding happens later) if fewer."""
    c = g.n_confs
    if c <= n_confs:
        return g.xyz, g.energy_ref, g.gradient_ref, c
    if rng is None:
        sel = np.arange(n_confs)
    else:
        sel = np.sort(rng.choice(c, size=n_confs, replace=False))
    return (g.xyz[:, sel], g.energy_ref[sel], g.gradient_ref[:, sel], n_confs)


def collate(graphs: Sequence[MolGraph], pad: Optional[PadSpec] = None,
            n_confs: Optional[int] = None,
            rng: Optional[np.random.Generator] = None,
            feature_names: Optional[Sequence[str]] = None) -> GraphBatch:
    """Concatenate molecules into one padded GraphBatch (numpy -> jnp).

    Index offsets are applied to tuple indices and neighbor lists exactly like
    the reference's idx-offset batching (reference: src/grappa/utils/
    dgl_utils.py:11-60), but into preallocated padded buffers.
    """
    assert len(graphs) > 0
    if n_confs is None:
        n_confs = max(g.n_confs for g in graphs)
    if pad is None:
        pad = PadSpec.for_graphs(graphs, n_confs)

    m = len(graphs)
    n_pad, c_pad = pad.n_nodes, pad.n_confs
    d = graphs[0].neighbors.shape[1]

    if feature_names is None:
        feature_names = list(graphs[0].feats.keys())

    feats = {}
    for name in feature_names:
        f0 = graphs[0].feats[name]
        shape = (n_pad,) if f0.ndim == 1 else (n_pad, f0.shape[1])
        feats[name] = np.zeros(shape, np.float32)

    node_mask = np.zeros(n_pad, bool)
    node_mol = np.full(n_pad, m, np.int32)
    neighbors = np.zeros((n_pad, d), np.int32)
    neighbor_mask = np.zeros((n_pad, d), bool)
    xyz = np.zeros((n_pad, c_pad, 3), np.float32)
    # padded nodes: distinct positions to keep all geometry non-degenerate
    xyz[:, :, 0] = np.arange(n_pad, dtype=np.float32)[:, None]
    conf_mask = np.zeros((m, c_pad), bool)
    energy_ref = np.zeros((m, c_pad), np.float32)
    gradient_ref = np.zeros((n_pad, c_pad, 3), np.float32)

    term_bufs = {}
    for t in TERMS:
        tp = pad.n_tuples[t]
        arity = TERM_ARITY[t]
        kr = graphs[0].k_ref[_k_key(t)]
        k_shape = (tp,) if kr.ndim == 1 else (tp, kr.shape[1])
        term_bufs[t] = {
            'idxs': np.zeros((tp, arity), np.int32),
            'mask': np.zeros(tp, bool),
            'mol': np.full(tp, m, np.int32),
            'k_ref': np.full(k_shape, np.nan, np.float32),
            'eq_ref': np.full(tp, np.nan, np.float32) if t in ('n2', 'n3') else None,
            'fill': 0,
        }

    node_offset = 0
    for i, g in enumerate(graphs):
        n = g.n_atoms
        if node_offset + n > n_pad:
            raise ValueError(f"PadSpec too small: {node_offset + n} > {n_pad} nodes")
        sl = slice(node_offset, node_offset + n)

        for name in feature_names:
            feats[name][sl] = g.feats[name]
        node_mask[sl] = True
        node_mol[sl] = i
        neighbors[sl] = g.neighbors + node_offset
        neighbor_mask[sl] = g.neighbor_mask

        g_xyz, g_en, g_grad, c = _subsample_confs(g, c_pad, rng)
        xyz[sl, :c] = g_xyz
        # pad conformers by replicating the last valid one (masked out below)
        if c < c_pad:
            xyz[sl, c:] = g_xyz[:, -1:]
        conf_mask[i, :c] = True
        energy_ref[i, :c] = g_en
        gradient_ref[sl, :c] = g_grad

        for t in TERMS:
            buf = term_bufs[t]
            idxs = g.tuple_idxs[t]
            nt = len(idxs)
            if nt == 0:
                continue
            f = buf['fill']
            if f + nt > pad.n_tuples[t]:
                raise ValueError(
                    f"PadSpec too small for term {t}: {f + nt} > {pad.n_tuples[t]}")
            buf['idxs'][f:f + nt] = idxs + node_offset
            buf['mask'][f:f + nt] = True
            buf['mol'][f:f + nt] = i
            kr = g.k_ref[_k_key(t)]
            buf['k_ref'][f:f + nt] = kr
            if buf['eq_ref'] is not None:
                buf['eq_ref'][f:f + nt] = g.k_ref[f'{t}_eq']
            buf['fill'] = f + nt
        node_offset += n

    terms = {
        t: TermBatch(
            idxs=jnp.asarray(b['idxs']), mask=jnp.asarray(b['mask']),
            mol=jnp.asarray(b['mol']), k_ref=jnp.asarray(b['k_ref']),
            eq_ref=None if b['eq_ref'] is None else jnp.asarray(b['eq_ref']))
        for t, b in term_bufs.items()
    }
    return GraphBatch(
        feats={k: jnp.asarray(v) for k, v in feats.items()},
        node_mask=jnp.asarray(node_mask), node_mol=jnp.asarray(node_mol),
        neighbors=jnp.asarray(neighbors),
        neighbor_mask=jnp.asarray(neighbor_mask),
        xyz=jnp.asarray(xyz), conf_mask=jnp.asarray(conf_mask),
        energy_ref=jnp.asarray(energy_ref),
        gradient_ref=jnp.asarray(gradient_ref),
        terms=terms, num_mols=m,
    )


def _k_key(term: str) -> str:
    return f'{term}_k'


def stack_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack same-shape batches along a new leading device axis (for
    shard_map-based data parallelism)."""
    import jax
    assert len({b.num_mols for b in batches}) == 1
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *batches)
