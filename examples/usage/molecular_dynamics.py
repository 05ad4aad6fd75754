"""Parametrize a molecule and run MD on it — entirely on device.

TPU-first extension with no reference counterpart (the reference hands
parametrized systems to OpenMM/GROMACS): grappa_tpu.md integrates the
predicted bonded force field with a jitted lax.scan, so a whole trajectory
segment is ONE dispatch and the conformer axis carries independent
replicas. NVE energy conservation below doubles as a live check that the
predicted forces are the exact gradient of the predicted energy.
"""
import jax
import jax.numpy as jnp
import numpy as np

from grappa_tpu import md
from grappa_tpu.data import MolGraph, collate
from grappa_tpu.data.synthetic import make_moldata

# ground-truth bonded parameters of a synthetic molecule stand in for a
# Grappa.predict(...) result so the example runs without a checkpoint;
# with one: params = Grappa.from_tag('grappa-1.2').predict(molecule)
mdata = make_moldata(seed=11, n_confs=4, learnable=True, conf_noise=0.05)
batch = collate([MolGraph.from_moldata(mdata)], n_confs=4)
params = {
    'n2_k': jnp.nan_to_num(batch.terms['n2'].k_ref),
    'n2_eq': jnp.nan_to_num(batch.terms['n2'].eq_ref),
    'n3_k': jnp.nan_to_num(batch.terms['n3'].k_ref),
    'n3_eq': jnp.nan_to_num(batch.terms['n3'].eq_ref),
    'n4_k': jnp.nan_to_num(batch.terms['n4'].k_ref),
    'n4_improper_k': jnp.nan_to_num(batch.terms['n4_improper'].k_ref),
}
masses = md.masses_from_molecules([mdata.molecule], batch.xyz.shape[0])

# relax, then 4 independent replicas of 300 K Langevin sampling
x_min = md.minimize(batch, params, n_steps=200, lr=5e-4)
nvt = md.simulate(batch, params, masses, dt_fs=0.5, n_steps=1000,
                  xyz0=x_min, temperature=300.0, friction_per_ps=5.0,
                  seed=0, record_every=100)
print(f"NVT: 4 replicas x 1000 steps; "
      f"{nvt['trajectory'].shape[0]} recorded frames")
ke = np.asarray(nvt['kinetic'][:, 0]).mean(axis=0)
print(f"mean kinetic energy per replica [kcal/mol]: {np.round(ke, 2)}")

# NVE from the thermalized state: total energy must be flat
v0 = nvt['velocities']
nve = md.simulate(batch, params, masses, dt_fs=0.2, n_steps=500,
                  xyz0=nvt['xyz'], v0=v0)
total = np.asarray(nve['potential'][:, 0, 0] + nve['kinetic'][:, 0, 0])
print(f"NVE drift over 500 steps: {np.abs(total - total[0]).max():.4f} "
      f"kcal/mol (scale {total.std():.4f})")
