"""TPU-native molecular dynamics on grappa-predicted bonded parameters.

No reference counterpart: the reference hands parametrized systems to
OpenMM/GROMACS for dynamics (reference src/grappa/utils/openmm_utils.py:58-88
runs OpenMM contexts per conformer). Here the integrator itself is jitted —
a whole trajectory segment runs as ONE `lax.scan` dispatch on device, and
the batch's conformer axis carries C *independent replicas* for free (every
energy/force op is conformer-parallel). Besides serving (relaxation,
annealing, replica sampling straight after parametrization), this is a
validation instrument: NVE energy conservation end-to-end checks the
force/energy consistency of the whole predicted force field
(tests/test_md.py).

Units follow the grappa convention (kcal/mol, Angstrom, amu); time is
handled in femtoseconds and converted to the internal unit
sqrt(amu*A^2/(kcal/mol)) ~= 48.89 fs.

Macromolecules past the single-chip HBM limit: pass a batch sharded with
parallel.sp.shard_batch_by_atoms — GSPMD partitions the force computation
inside the integrator scan with no MD-specific sharding code (equality
with the single-device trajectory is tested on the 8-device CPU mesh,
tests/test_parallel.py::test_atom_sharded_md_matches_single_device).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from grappa_tpu.constants import ATOMIC_MASSES
from grappa_tpu.data.graph_batch import GraphBatch
from grappa_tpu.models import mm_energy

# 1 internal time unit = sqrt(amu * A^2 / (kcal/mol)) in femtoseconds
TIME_UNIT_FS = 48.88821
# Boltzmann constant [kcal/mol/K]
KB = 0.001987204259


def masses_from_molecules(molecules: Sequence, n_pad: int) -> jnp.ndarray:
    """Per-node masses (amu) for a batch collated from `molecules` in
    order (collate packs atoms contiguously); padded nodes get mass 1."""
    m = np.ones(n_pad, np.float32)
    off = 0
    for mol in molecules:
        zs = np.asarray(mol.atomic_numbers)
        m[off:off + len(zs)] = [ATOMIC_MASSES[int(z)] for z in zs]
        off += len(zs)
    return jnp.asarray(m)


def make_force_fn(batch: GraphBatch, params):
    """(N, C, 3) xyz -> (forces (N, C, 3), potential (M, C))."""
    def potential(xyz):
        e = mm_energy.pooled_energy(batch, params, xyz)['energy']
        return jnp.sum(e), e

    def force(xyz):
        g, e = jax.grad(potential, has_aux=True)(xyz)
        return -g, e

    return force


def kinetic_energy(batch: GraphBatch, masses: jnp.ndarray,
                   v: jnp.ndarray) -> jnp.ndarray:
    """Per-molecule kinetic energy (M, C) from velocities (N, C, 3)."""
    ke_atom = 0.5 * masses[:, None] * jnp.sum(v * v, axis=-1)   # (N, C)
    ke_atom = ke_atom * batch.node_mask[:, None]
    return jax.ops.segment_sum(
        ke_atom, batch.node_mol,
        num_segments=batch.num_mols + 1)[:batch.num_mols]


def maxwell_boltzmann_velocities(batch: GraphBatch, masses: jnp.ndarray,
                                 temperature: float,
                                 key) -> jnp.ndarray:
    """Sample initial velocities at `temperature` K; padded nodes frozen."""
    sigma = jnp.sqrt(KB * temperature / masses)[:, None, None]
    v = sigma * jax.random.normal(key, batch.xyz.shape, jnp.float32)
    return v * batch.node_mask[:, None, None]


def simulate(batch: GraphBatch, params, masses: jnp.ndarray,
             dt_fs: float = 0.5, n_steps: int = 1000,
             xyz0: Optional[jnp.ndarray] = None,
             v0: Optional[jnp.ndarray] = None,
             temperature: Optional[float] = None,
             friction_per_ps: float = 1.0,
             seed: int = 0,
             record_every: int = 0) -> Dict[str, jnp.ndarray]:
    """Run MD on the predicted bonded force field, fully on device.

    temperature=None: velocity-Verlet NVE. Otherwise: BAOAB Langevin at
    `temperature` K with `friction_per_ps` (1/ps) coupling. Every
    conformer column of xyz0 is an independent replica.

    record_every > 0 additionally returns 'trajectory'
    (n_steps // record_every, N, C, 3) — positions every that many steps.

    Returns {'xyz', 'velocities', 'potential' (n_steps, M, C),
    'kinetic' (n_steps, M, C)[, 'trajectory']}.
    """
    dt = jnp.float32(dt_fs / TIME_UNIT_FS)
    x0 = batch.xyz if xyz0 is None else xyz0
    mask = batch.node_mask[:, None, None].astype(jnp.float32)
    m3 = masses[:, None, None]
    key = jax.random.key(seed, impl='rbg')
    if v0 is None:
        if temperature is not None:
            key, sub = jax.random.split(key)
            v0 = maxwell_boltzmann_velocities(batch, masses, temperature,
                                              sub)
        else:
            v0 = jnp.zeros_like(x0)
    force = make_force_fn(batch, params)

    if temperature is not None:
        # BAOAB: the O-step's exact Ornstein-Uhlenbeck coefficients
        gamma = friction_per_ps * (TIME_UNIT_FS / 1000.0)   # 1/time-unit
        c1 = jnp.exp(-gamma * dt)
        sigma = jnp.sqrt(KB * temperature * (1.0 - c1 ** 2) / masses
                         )[:, None, None]

    def step(x, v, f, noise_key):
        if temperature is None:
            v_half = v + (0.5 * dt / m3) * f
            x = x + dt * v_half
            f_new, e = force(x)
            v = v_half + (0.5 * dt / m3) * f_new
        else:
            v = v + (0.5 * dt / m3) * f
            x = x + 0.5 * dt * v
            noise = jax.random.normal(noise_key, v.shape, v.dtype) * mask
            v = c1 * v + sigma * noise
            x = x + 0.5 * dt * v
            f_new, e = force(x)
            v = v + (0.5 * dt / m3) * f_new
        return x, v * mask, f_new, e

    f0, _ = force(x0)
    keys = jax.random.split(key, n_steps)

    if record_every and record_every > 0:
        if n_steps % record_every:
            raise ValueError('n_steps must be a multiple of record_every')
        n_frames = n_steps // record_every

        def outer(carry, ks):
            def inner(c, k):
                x, v, f = c
                x, v, f, e = step(x, v, f, k)
                ke = kinetic_energy(batch, masses, v)
                return (x, v, f), (e, ke)

            c2, (es, kes) = jax.lax.scan(inner, carry, ks)
            return c2, (es, kes, c2[0])

        (x, v, _), (pot, kin, frames) = jax.lax.scan(
            outer, (x0, v0, f0), keys.reshape(n_frames, record_every))
        pot = pot.reshape(n_steps, *pot.shape[2:])
        kin = kin.reshape(n_steps, *kin.shape[2:])
        return {'xyz': x, 'velocities': v, 'potential': pot,
                'kinetic': kin, 'trajectory': frames}

    def body(carry, k):
        x, v, f = carry
        x, v, f, e = step(x, v, f, k)
        ke = kinetic_energy(batch, masses, v)
        return (x, v, f), (e, ke)

    (x, v, _), (pot, kin) = jax.lax.scan(body, (x0, v0, f0), keys)
    return {'xyz': x, 'velocities': v, 'potential': pot, 'kinetic': kin}


def minimize(batch: GraphBatch, params, n_steps: int = 200,
             lr: float = 1e-3,
             xyz0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gradient-descent energy minimization (relaxation) on device; a
    light-weight stand-in for an external minimizer before dynamics."""
    x0 = batch.xyz if xyz0 is None else xyz0
    force = make_force_fn(batch, params)

    def body(x, _):
        f, _e = force(x)
        return x + lr * f, None

    x, _ = jax.lax.scan(body, x0, None, length=n_steps)
    return x
