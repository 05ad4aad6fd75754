"""Differentiable classical MM bonded energy over a GraphBatch.

Replaces the reference's Energy module + autograd force path (reference:
src/grappa/models/energy.py:8-171): harmonic bond/angle terms
0.5*k*(x - eq)^2, periodic torsions sum_n k_n cos(n*phi) with signed k
(phase folded into the sign), per-molecule pooling, and the gradient of the
total energy w.r.t. coordinates. Pooling is `jax.ops.segment_sum` over the
batch's molecule segment ids (instead of dgl.readout_nodes), and forces come
from `jax.grad` of the jitted energy function (instead of torch autograd) —
the training loss differentiates *through* this gradient (double backward),
which JAX expresses naturally as grad-of-grad.

Parameter convention: a dict keyed like the model output —
  n2_k (B,), n2_eq (B,), n3_k (A,), n3_eq (A,),
  n4_k (P, n_per) signed, n4_improper_k (I, n_per) signed.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from grappa_tpu.data.graph_batch import GraphBatch
from grappa_tpu.models import geometry

ParamDict = Dict[str, jnp.ndarray]


def harmonic_term_energy(k: jnp.ndarray, eq: jnp.ndarray,
                         x: jnp.ndarray) -> jnp.ndarray:
    """0.5 * k * (x - eq)^2 for each tuple/conformer; k, eq: (T,), x: (T, C)."""
    return 0.5 * k[:, None] * jnp.square(x - eq[:, None])


def torsion_term_energy(signed_k: jnp.ndarray, phi: jnp.ndarray,
                        offset: bool = False) -> jnp.ndarray:
    """sum_n k_n cos(n*phi) (+ |k_n| if offset) per tuple/conformer.

    signed_k: (T, P) with periodicity n = column index + 1; phi: (T, C).
    cos(n*phi) comes from the Chebyshev recurrence on cos(phi) — one cos
    instead of P of them (the VPU transcendental is the expensive part).
    """
    n_per = signed_k.shape[1]
    cos_phi = jnp.cos(phi)                                  # (T, C)
    c_prev = jnp.ones_like(cos_phi)
    c_cur = cos_phi
    energy = signed_k[:, 0][:, None] * c_cur
    for n in range(2, n_per + 1):
        c_prev, c_cur = c_cur, 2.0 * cos_phi * c_cur - c_prev
        energy = energy + signed_k[:, n - 1][:, None] * c_cur
    if offset:
        energy = energy + jnp.abs(signed_k).sum(axis=1)[:, None]
    return energy


def internal_coordinates(batch: GraphBatch,
                         xyz: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Compute x (T, C) per interaction term from coordinates (N, C, 3)."""
    coords = {}
    b = batch.terms['n2'].idxs
    coords['n2'] = geometry.distance(xyz[b[:, 0]], xyz[b[:, 1]])
    a = batch.terms['n3'].idxs
    coords['n3'] = geometry.bond_angle(xyz[a[:, 0]], xyz[a[:, 1]], xyz[a[:, 2]])
    for t in ('n4', 'n4_improper'):
        p = batch.terms[t].idxs
        coords[t] = geometry.dihedral_angle(
            xyz[p[:, 0]], xyz[p[:, 1]], xyz[p[:, 2]], xyz[p[:, 3]])
    return coords


def tuple_energies(batch: GraphBatch, params: ParamDict, xyz: jnp.ndarray,
                   offset_torsion: bool = False,
                   use_fused_torsion: bool = False) -> Dict[str, jnp.ndarray]:
    """Masked per-tuple energies (T, C) for every term.

    use_fused_torsion routes the torsion terms through the pallas kernel
    (grappa_tpu.ops.torsion_kernel) — one VMEM pass instead of materialized
    dihedral intermediates; requires offset_torsion=False and a TPU backend.
    """
    b = batch.terms['n2'].idxs
    energies = {}
    energies['n2'] = harmonic_term_energy(
        params['n2_k'], params['n2_eq'],
        geometry.distance(xyz[b[:, 0]], xyz[b[:, 1]]))
    a = batch.terms['n3'].idxs
    energies['n3'] = harmonic_term_energy(
        params['n3_k'], params['n3_eq'],
        geometry.bond_angle(xyz[a[:, 0]], xyz[a[:, 1]], xyz[a[:, 2]]))
    if use_fused_torsion and not offset_torsion:
        from grappa_tpu.ops.torsion_kernel import (
            gather_torsion_positions, torsion_energy_fused)
        for t in ('n4', 'n4_improper'):
            tb = batch.terms[t]
            k = jnp.where(tb.mask[:, None], params[f'{t}_k'], 0.0)
            pos = gather_torsion_positions(xyz, tb.idxs)
            energies[t] = torsion_energy_fused(pos, k)
    else:
        for t in ('n4', 'n4_improper'):
            p4 = batch.terms[t].idxs
            phi = geometry.dihedral_angle(
                xyz[p4[:, 0]], xyz[p4[:, 1]], xyz[p4[:, 2]], xyz[p4[:, 3]])
            energies[t] = torsion_term_energy(
                params[f'{t}_k'], phi, offset_torsion)
    return {
        t: jnp.where(batch.terms[t].mask[:, None], e, 0.0)
        for t, e in energies.items()
    }


def pooled_energy(batch: GraphBatch, params: ParamDict, xyz: jnp.ndarray,
                  offset_torsion: bool = False,
                  use_fused_torsion: bool = False) -> Dict[str, jnp.ndarray]:
    """Per-molecule energies (M, C) per term plus 'total'."""
    energies = tuple_energies(batch, params, xyz, offset_torsion,
                              use_fused_torsion)
    out = {}
    total = jnp.zeros((batch.num_mols, batch.num_confs), xyz.dtype)
    for t, e in energies.items():
        pooled = jax.ops.segment_sum(
            e, batch.terms[t].mol,
            num_segments=batch.num_mols + 1)[:batch.num_mols]
        out[f'energy_{t}'] = pooled
        total = total + pooled
    out['energy'] = total
    return out


def energy_and_gradient(batch: GraphBatch, params: ParamDict,
                        offset_torsion: bool = False,
                        use_fused_torsion: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Total bonded energy (M, C) and its gradient w.r.t. xyz (N, C, 3).

    The gradient (dE/dx, NOT the force -dE/dx — matching the reference's
    'gradient' convention, energy.py:139) is differentiable w.r.t. `params`,
    so losses on it train the parameter model via grad-of-grad.
    """
    def total_energy(xyz):
        e = pooled_energy(batch, params, xyz, offset_torsion,
                          use_fused_torsion)['energy']
        return jnp.sum(e), e

    # one forward: the per-molecule energies ride along as aux instead of
    # re-running pooled_energy (XLA usually CSEs the duplicate, but remat/
    # custom-call paths are not reliably merged)
    gradient, energy = jax.grad(total_energy, has_aux=True)(batch.xyz)
    return energy, gradient


def centered(energy: jnp.ndarray, conf_mask: jnp.ndarray) -> jnp.ndarray:
    """Subtract each molecule's mean over valid conformers; zero where masked."""
    conf_mask = conf_mask.astype(energy.dtype)
    count = jnp.maximum(conf_mask.sum(axis=1, keepdims=True), 1.0)
    mean = (energy * conf_mask).sum(axis=1, keepdims=True) / count
    return (energy - mean) * conf_mask
