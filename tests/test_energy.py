"""The MM-energy oracle tests: JAX energies/forces vs. an independent torch
implementation, padding invariance, and differentiability (the TPU analogs
of the reference's tests/energy.py and tests/unbatch.py batching oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grappa_tpu.data import collate, MolGraph, PadSpec
from grappa_tpu.data.graph_batch import TERMS
from grappa_tpu.data.synthetic import (
    make_moldata, torch_bonded_energy)
from grappa_tpu.models import mm_energy


def params_from_batch_refs(batch):
    """Use the stored classical (signed-k) reference parameters as the
    parameter dict — the 'identity model' trick of the reference
    (reference: tests/openmm_wrapper_identity.py)."""
    return {
        'n2_k': jnp.nan_to_num(batch.terms['n2'].k_ref),
        'n2_eq': jnp.nan_to_num(batch.terms['n2'].eq_ref),
        'n3_k': jnp.nan_to_num(batch.terms['n3'].k_ref),
        'n3_eq': jnp.nan_to_num(batch.terms['n3'].eq_ref),
        'n4_k': jnp.nan_to_num(batch.terms['n4'].k_ref),
        'n4_improper_k': jnp.nan_to_num(batch.terms['n4_improper'].k_ref),
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_energy_matches_torch_oracle(seed):
    md = make_moldata(seed=seed, n_confs=6)
    graph = MolGraph.from_moldata(md)
    batch = collate([graph])
    params = params_from_batch_refs(batch)

    energy, gradient = mm_energy.energy_and_gradient(batch, params)
    energy = np.asarray(energy)[0]
    gradient = np.asarray(gradient)[:md.xyz.shape[1]]

    ref_energy, ref_gradient = torch_bonded_energy(
        md.molecule, md.classical_parameters, md.xyz)

    # centered energies must agree (the constant torsion offset differs
    # between the signed-k and the 1+cos conventions)
    ours = energy - energy.mean()
    ref = ref_energy - ref_energy.mean()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-3)

    # gradients agree exactly (offsets don't affect them)
    np.testing.assert_allclose(
        gradient.transpose(1, 0, 2), ref_gradient, rtol=2e-3, atol=2e-3)


def test_padding_invariance():
    """Energies/forces must be identical whatever the padded sizes are."""
    md = make_moldata(seed=4, n_confs=4)
    graph = MolGraph.from_moldata(md)

    small = collate([graph])
    big_pad = PadSpec(
        n_nodes=small.num_nodes * 2,
        n_tuples={t: small.terms[t].idxs.shape[0] * 2 for t in TERMS},
        n_confs=small.num_confs + 3)
    big = collate([graph], pad=big_pad)

    p_small = params_from_batch_refs(small)
    p_big = params_from_batch_refs(big)

    e_small, g_small = mm_energy.energy_and_gradient(small, p_small)
    e_big, g_big = mm_energy.energy_and_gradient(big, p_big)

    c = small.num_confs
    n = graph.n_atoms
    np.testing.assert_allclose(
        np.asarray(e_small)[0, :c], np.asarray(e_big)[0, :c],
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_small)[:n, :c], np.asarray(g_big)[:n, :c],
        rtol=1e-5, atol=1e-5)
    # padded tuples contribute nothing and produce no NaN
    assert np.isfinite(np.asarray(e_big)).all()
    assert np.isfinite(np.asarray(g_big)).all()


def test_batching_invariance():
    """A molecule's energy is the same alone and inside a batch (the
    reference's batch-vs-single evaluator oracle, tests/unbatch.py)."""
    mds = [make_moldata(seed=s, n_confs=5) for s in (10, 11, 12)]
    graphs = [MolGraph.from_moldata(md) for md in mds]
    batch = collate(graphs)
    p_batch = params_from_batch_refs(batch)
    e_batch, g_batch = mm_energy.energy_and_gradient(batch, p_batch)

    node_offset = 0
    for i, g in enumerate(graphs):
        single = collate([g])
        p = params_from_batch_refs(single)
        e_single, g_single = mm_energy.energy_and_gradient(single, p)
        np.testing.assert_allclose(
            np.asarray(e_batch)[i, :g.n_confs],
            np.asarray(e_single)[0, :g.n_confs], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(g_batch)[node_offset:node_offset + g.n_atoms, :g.n_confs],
            np.asarray(g_single)[:g.n_atoms, :g.n_confs],
            rtol=1e-4, atol=1e-4)
        node_offset += g.n_atoms


def test_gradient_of_gradient_loss():
    """The force loss must be differentiable w.r.t. the MM parameters
    (double backward through jax.grad, as training requires)."""
    md = make_moldata(seed=20, n_confs=3)
    batch = collate([MolGraph.from_moldata(md)])
    params = params_from_batch_refs(batch)

    def loss(params):
        energy, gradient = mm_energy.energy_and_gradient(batch, params)
        return jnp.mean(jnp.square(gradient - batch.gradient_ref))

    grads = jax.grad(loss)(params)
    for k, v in grads.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # bond k gradient must be nonzero for perturbed parameters
    params2 = dict(params)
    params2['n2_k'] = params['n2_k'] * 1.3
    g2 = jax.grad(loss)(params2)
    assert np.abs(np.asarray(g2['n2_k'])).sum() > 0


def test_centered():
    e = jnp.array([[1.0, 2.0, 3.0, 99.0]])
    mask = jnp.array([[True, True, True, False]])
    c = mm_energy.centered(e, mask)
    np.testing.assert_allclose(np.asarray(c), [[-1.0, 0.0, 1.0, 0.0]])


def test_jax_minimizer_matches_torch():
    """The bucketed jitted minimizer (dataset generation at scale, e.g.
    espaloma-proxy XL) must reach the same minimum as the historical torch
    path: identical energy form + Adam update semantics, so in f64 the
    trajectories agree to float tolerance."""
    from grappa_tpu.data import synthetic as S
    if not jax.config.read('jax_enable_x64'):
        pytest.skip('requires x64 for trajectory-level agreement')
    mol = S.random_molecule(977, elements=[1, 1, 6, 6, 7, 8],
                            atom_range=(12, 20))
    params = S.environment_parameters(mol)
    xyz = S.embed_conformers(mol, 1, 977, noise=0.08, params=params)
    xt = S.minimize_geometry(mol, params, xyz[0], method='torch')
    xj = S.minimize_geometry(mol, params, xyz[0], method='jax')
    np.testing.assert_allclose(xj, xt, rtol=0, atol=5e-4)
    et, _ = S.torch_bonded_energy(mol, params, xt[None])
    ej, _ = S.torch_bonded_energy(mol, params, xj[None])
    np.testing.assert_allclose(ej, et, rtol=1e-6)


def test_jax_minimizer_f32_quality():
    """Without x64 the jitted minimizer still has to land at an equivalent
    minimum (energy within a small absolute margin of the torch one)."""
    from grappa_tpu.data import synthetic as S
    mol = S.random_molecule(978, elements=[1, 1, 6, 6, 7, 8],
                            atom_range=(12, 20))
    params = S.environment_parameters(mol)
    xyz = S.embed_conformers(mol, 1, 978, noise=0.08, params=params)
    xt = S.minimize_geometry(mol, params, xyz[0], method='torch')
    xj = S.minimize_geometry(mol, params, xyz[0], method='jax')
    et, _ = S.torch_bonded_energy(mol, params, xt[None])
    ej, _ = S.torch_bonded_energy(mol, params, xj[None])
    assert abs(float(ej[0]) - float(et[0])) < max(0.02 * abs(float(et[0])),
                                                  0.5)
