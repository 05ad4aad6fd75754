"""TPU-native MD integrator tests.

The NVE conservation test doubles as an end-to-end force/energy
consistency check of the whole MM-energy stack: any mismatch between the
potential and its gradient shows up as secular total-energy drift."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grappa_tpu import md
from grappa_tpu.data import MolGraph, PadSpec, collate
from grappa_tpu.data.graph_batch import TERMS
from grappa_tpu.data.synthetic import make_moldata


def _setup(seed=3, n_confs=1, pad=None):
    mdata = make_moldata(seed=seed, n_confs=n_confs, learnable=True,
                         conf_noise=0.05)
    graph = MolGraph.from_moldata(mdata)
    batch = collate([graph], pad=pad, n_confs=n_confs)
    params = {
        'n2_k': jnp.nan_to_num(batch.terms['n2'].k_ref),
        'n2_eq': jnp.nan_to_num(batch.terms['n2'].eq_ref),
        'n3_k': jnp.nan_to_num(batch.terms['n3'].k_ref),
        'n3_eq': jnp.nan_to_num(batch.terms['n3'].eq_ref),
        'n4_k': jnp.nan_to_num(batch.terms['n4'].k_ref),
        'n4_improper_k': jnp.nan_to_num(batch.terms['n4_improper'].k_ref),
    }
    masses = md.masses_from_molecules([mdata.molecule],
                                      batch.xyz.shape[0])
    return mdata, batch, params, masses


def test_nve_energy_conservation():
    """Velocity Verlet at 0.2 fs conserves E_tot = KE + PE to a small
    fraction of the energy scale over 800 steps."""
    _, batch, params, masses = _setup()
    v0 = md.maxwell_boltzmann_velocities(batch, masses, 300.0,
                                         jax.random.key(1))
    out = md.simulate(batch, params, masses, dt_fs=0.2, n_steps=800, v0=v0)
    total = np.asarray(out['potential'][:, 0, 0] + out['kinetic'][:, 0, 0])
    drift = np.abs(total - total[0]).max()
    scale = max(np.abs(np.asarray(out['kinetic'][:, 0, 0])).mean(), 1.0)
    assert np.isfinite(total).all()
    assert drift < 0.05 * scale, (drift, scale)


def test_md_replicas_independent_and_pad_invariant():
    """Conformer columns are independent replicas, and a larger PadSpec
    does not change the dynamics."""
    mdata, batch, params, masses = _setup(n_confs=4)
    v0 = md.maxwell_boltzmann_velocities(batch, masses, 300.0,
                                         jax.random.key(2))
    out = md.simulate(batch, params, masses, dt_fs=0.5, n_steps=50, v0=v0)

    # replica 0 alone reproduces column 0 of the 4-replica run
    b1 = collate([MolGraph.from_moldata(mdata)], n_confs=1)
    out1 = md.simulate(b1, params, masses, dt_fs=0.5, n_steps=50,
                       xyz0=batch.xyz[:, :1], v0=v0[:, :1])
    np.testing.assert_allclose(np.asarray(out1['potential'][:, 0, 0]),
                               np.asarray(out['potential'][:, 0, 0]),
                               rtol=1e-4, atol=1e-4)

    # bigger padding -> identical trajectory energies
    g = MolGraph.from_moldata(mdata)
    big = PadSpec(n_nodes=batch.xyz.shape[0] + 32,
                  n_tuples={t: int(batch.terms[t].mask.shape[0]) + 64
                            for t in TERMS},
                  n_confs=4)
    bbig = collate([g], pad=big, n_confs=4)
    params_big = {
        'n2_k': jnp.nan_to_num(bbig.terms['n2'].k_ref),
        'n2_eq': jnp.nan_to_num(bbig.terms['n2'].eq_ref),
        'n3_k': jnp.nan_to_num(bbig.terms['n3'].k_ref),
        'n3_eq': jnp.nan_to_num(bbig.terms['n3'].eq_ref),
        'n4_k': jnp.nan_to_num(bbig.terms['n4'].k_ref),
        'n4_improper_k': jnp.nan_to_num(bbig.terms['n4_improper'].k_ref),
    }
    m_big = md.masses_from_molecules([mdata.molecule], bbig.xyz.shape[0])
    n = batch.xyz.shape[0]
    v_big = jnp.zeros_like(bbig.xyz).at[:n].set(v0)
    x_big = jnp.zeros_like(bbig.xyz).at[:n].set(batch.xyz)
    out_big = md.simulate(bbig, params_big, m_big, dt_fs=0.5, n_steps=50,
                          xyz0=x_big, v0=v_big)
    np.testing.assert_allclose(np.asarray(out_big['potential'][:, 0]),
                               np.asarray(out['potential'][:, 0]),
                               rtol=1e-4, atol=1e-4)
    # padded atoms never move
    assert np.allclose(np.asarray(out_big['xyz'][n:]), 0.0)


def test_langevin_thermalizes():
    """BAOAB at 300 K: mean kinetic energy approaches (3N/2) kT."""
    mdata, batch, params, masses = _setup(seed=5)
    n_atoms = len(mdata.molecule.atoms)
    out = md.simulate(batch, params, masses, dt_fs=0.5, n_steps=1500,
                      temperature=300.0, friction_per_ps=20.0, seed=7)
    ke = np.asarray(out['kinetic'][:, 0, 0])
    target = 1.5 * n_atoms * md.KB * 300.0
    mean_ke = ke[500:].mean()   # after equilibration
    assert np.isfinite(ke).all()
    assert 0.6 * target < mean_ke < 1.4 * target, (mean_ke, target)


def test_trajectory_recording_and_minimize():
    _, batch, params, masses = _setup(seed=9)
    out = md.simulate(batch, params, masses, dt_fs=0.5, n_steps=40,
                      temperature=300.0, seed=3, record_every=10)
    assert out['trajectory'].shape == (4,) + batch.xyz.shape
    assert out['potential'].shape[0] == 40
    with pytest.raises(ValueError, match='multiple'):
        md.simulate(batch, params, masses, n_steps=41, record_every=10)

    # jitter the geometry, minimize -> potential decreases
    x0 = batch.xyz + 0.05 * jax.random.normal(jax.random.key(0),
                                              batch.xyz.shape)
    force = md.make_force_fn(batch, params)
    _, e_before = force(x0)
    x_min = md.minimize(batch, params, n_steps=300, lr=5e-4, xyz0=x0)
    _, e_after = force(x_min)
    assert float(e_after[0, 0]) < float(e_before[0, 0])
