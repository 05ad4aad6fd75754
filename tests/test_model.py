"""Model tests: shapes, permutation invariance (the defining property of the
heads), padding invariance, and torch-attention parity for the transformer
block (the converter-fidelity oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grappa_tpu.data import MolGraph, PadSpec, collate
from grappa_tpu.data.graph_batch import TERMS
from grappa_tpu.data.synthetic import make_moldata
from grappa_tpu.models.grappa_model import (
    get_small_model_config, make_model)


@pytest.fixture(scope='module')
def small_setup():
    mds = [make_moldata(seed=s, n_confs=3) for s in (0, 1)]
    graphs = [MolGraph.from_moldata(md) for md in mds]
    batch = collate(graphs)
    model = make_model(get_small_model_config())
    params = model.init(jax.random.key(0), batch)
    return model, params, batch, graphs


def test_forward_shapes(small_setup):
    model, params, batch, _ = small_setup
    out = model.apply(params, batch)
    assert out['n2_k'].shape == (batch.terms['n2'].idxs.shape[0],)
    assert out['n2_eq'].shape == out['n2_k'].shape
    assert out['n3_k'].shape == (batch.terms['n3'].idxs.shape[0],)
    assert out['n4_k'].shape == (batch.terms['n4'].idxs.shape[0], 6)
    assert out['n4_improper_k'].shape == (
        batch.terms['n4_improper'].idxs.shape[0], 3)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # physical ranges
    assert np.all(np.asarray(out['n2_k']) > 0)
    assert np.all(np.asarray(out['n2_eq']) > 0)
    assert np.all(np.asarray(out['n3_k']) > 0)
    eq = np.asarray(out['n3_eq'])
    assert np.all((eq > 0) & (eq < np.pi))


def _swap_term(batch, term, perm):
    idxs = np.asarray(batch.terms[term].idxs)
    swapped = idxs[:, list(perm)]
    new_term = batch.terms[term].replace(idxs=jnp.asarray(swapped))
    terms = dict(batch.terms)
    terms[term] = new_term
    return batch.replace(terms=terms)


def test_permutation_invariance(small_setup):
    """Outputs must be exactly invariant under the symmetry permutations of
    each tuple type (reference invariance sets: interaction_parameters.py)."""
    model, params, batch, _ = small_setup
    base = model.apply(params, batch)

    cases = {
        'n2': (1, 0),
        'n3': (2, 1, 0),
        'n4': (3, 2, 1, 0),
        'n4_improper': (3, 1, 2, 0),  # outer-atom swap, central fixed
    }
    for term, perm in cases.items():
        swapped = model.apply(params, _swap_term(batch, term, perm))
        for key in ([f'{term}_k'] + ([f'{term}_eq'] if term in ('n2', 'n3') else [])):
            np.testing.assert_allclose(
                np.asarray(base[key]), np.asarray(swapped[key]),
                rtol=2e-5, atol=2e-5, err_msg=f'{term} perm {perm}')


def test_non_invariant_permutation_changes_output(small_setup):
    """Sanity: a NON-symmetry permutation must change the prediction."""
    model, params, batch, _ = small_setup
    base = model.apply(params, batch)
    # (0,2,1,3) is not in the proper symmetry set
    swapped = model.apply(params, _swap_term(batch, 'n4', (0, 2, 1, 3)))
    diff = np.abs(np.asarray(base['n4_k']) - np.asarray(swapped['n4_k']))
    mask = np.asarray(batch.terms['n4'].mask)
    assert diff[mask].max() > 1e-6


def test_model_padding_invariance(small_setup):
    model, params, batch, graphs = small_setup
    pad = PadSpec(
        n_nodes=batch.num_nodes + 64,
        n_tuples={t: batch.terms[t].idxs.shape[0] + 128 for t in TERMS},
        n_confs=batch.num_confs)
    big = collate(graphs, pad=pad)
    out_small = model.apply(params, batch)
    out_big = model.apply(params, big)
    for term in TERMS:
        n_valid = int(np.asarray(batch.terms[term].mask).sum())
        key = f'{term}_k'
        np.testing.assert_allclose(
            np.asarray(out_small[key])[:n_valid],
            np.asarray(out_big[key])[:n_valid], rtol=2e-5, atol=2e-5)


def test_dropout_train_mode(small_setup):
    model, _, batch, _ = small_setup
    from grappa_tpu.models.grappa_model import get_small_model_config, make_model
    cfg = get_small_model_config()
    cfg['parameter_dropout'] = 0.5
    cfg['gnn_dropout_attention'] = 0.3
    model = make_model(cfg)
    params = model.init(jax.random.key(0), batch)
    # perturb away from the zero-init residual branches, which make every
    # dropout site a no-op at exact initialization
    params = jax.tree.map(
        lambda x: x + 0.03 * jax.random.normal(jax.random.key(9), x.shape,
                                               x.dtype), params)
    out1 = model.apply(params, batch, deterministic=False,
                       rngs={'dropout': jax.random.key(1)})
    out2 = model.apply(params, batch, deterministic=False,
                       rngs={'dropout': jax.random.key(2)})
    # different dropout masks -> different outputs
    assert np.abs(np.asarray(out1['n2_k']) - np.asarray(out2['n2_k'])).max() > 0
    # eval mode is deterministic
    out3 = model.apply(params, batch)
    out4 = model.apply(params, batch)
    np.testing.assert_array_equal(np.asarray(out3['n2_k']),
                                  np.asarray(out4['n2_k']))


def test_self_attention_matches_torch():
    """SelfAttention == torch.nn.MultiheadAttention given converted weights
    (weight-converter fidelity oracle for the head transformers)."""
    import torch

    f, heads, s, b = 32, 4, 3, 5
    torch_mha = torch.nn.MultiheadAttention(f, heads, dropout=0.0)
    x = np.random.default_rng(0).normal(size=(s, b, f)).astype(np.float32)
    with torch.no_grad():
        t_out, _ = torch_mha(torch.tensor(x), torch.tensor(x), torch.tensor(x),
                             need_weights=False)
    t_out = t_out.numpy()

    from grappa_tpu.models.layers import SelfAttention
    mod = SelfAttention(num_heads=heads)
    variables = mod.init(jax.random.key(0), jnp.asarray(x.transpose(1, 0, 2)))
    sd = torch_mha.state_dict()
    converted = {
        'params': {
            'in_proj': {
                'kernel': jnp.asarray(sd['in_proj_weight'].numpy().T),
                'bias': jnp.asarray(sd['in_proj_bias'].numpy()),
            },
            'out_proj': {
                'kernel': jnp.asarray(sd['out_proj.weight'].numpy().T),
                'bias': jnp.asarray(sd['out_proj.bias'].numpy()),
            },
        }
    }
    jax.tree.map(lambda a, b: None if a.shape == b.shape else 1 / 0,
                 variables['params'], converted['params'])
    # jax path is batch-first
    j_out = mod.apply(converted, jnp.asarray(x.transpose(1, 0, 2)))
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(1, 0, 2), t_out, rtol=2e-5, atol=2e-5)


def test_node_relabeling_equivariance():
    """Renumbering the atoms of a molecule must permute predictions
    accordingly (global GNN equivariance — catches any hidden dependence on
    node order or padding position)."""
    from grappa_tpu.data import Molecule
    from grappa_tpu.data.synthetic import random_molecule

    mol = random_molecule(seed=21)
    n = len(mol.atoms)
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)          # new_id = perm[old_index]

    relabeled = Molecule(
        atoms=perm,
        bonds=[(perm[a], perm[b]) for a, b in mol.bonds_by_index()],
        impropers=[tuple(perm[i] for i in t)
                   for t in mol.tuple_indices()['n4_improper']],
        atomic_numbers=mol.atomic_numbers,
        partial_charges=mol.partial_charges,
        improper_in_correct_format=True,
        charge_model=mol.charge_model,
    )

    model = make_model(get_small_model_config())
    b1 = collate([MolGraph.from_molecule(mol)])
    params = model.init(jax.random.key(0), b1)
    from grappa_tpu.api import Grappa
    ff = Grappa(model, params, {'model_config': get_small_model_config()})
    p1 = ff.predict(mol, check_eq_values=False)
    p2 = ff.predict(relabeled, check_eq_values=False)

    # compare bond parameters by id-set lookup
    lookup2 = {frozenset(map(int, b)): (p2.bond_k[i], p2.bond_eq[i])
               for i, b in enumerate(p2.bonds)}
    for i, b in enumerate(p1.bonds):
        key = frozenset(int(perm[j]) for j in
                        [list(mol.atoms).index(x) for x in b])
        k2, eq2 = lookup2[key]
        np.testing.assert_allclose(p1.bond_k[i], k2, rtol=2e-4)
        np.testing.assert_allclose(p1.bond_eq[i], eq2, rtol=2e-4)


def test_remat_identical_outputs_and_grads():
    """model_config.remat (layer-wise jax.checkpoint) must not change the
    parameter tree, predictions, or gradients — only memory/compute."""
    import jax.numpy as jnp
    from grappa_tpu.data.synthetic import make_moldata
    from grappa_tpu.train.loss import LossWeights, molwise_loss

    batch = collate([MolGraph.from_moldata(make_moldata(seed=1, n_confs=2))])
    cfg = get_small_model_config()
    m1 = make_model(cfg)
    p1 = m1.init(jax.random.key(0), batch)
    cfg2 = dict(cfg)
    cfg2['remat'] = True
    m2 = make_model(cfg2)
    p2 = m2.init(jax.random.key(0), batch)
    assert (jax.tree_util.tree_structure(p1)
            == jax.tree_util.tree_structure(p2))
    o1, o2 = m1.apply(p1, batch), m2.apply(p1, batch)
    for k in o1:
        np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o2[k]),
                                   rtol=1e-6, atol=1e-7)
    w = LossWeights(jnp.float32(1.0), jnp.float32(0.8),
                    jnp.full(batch.num_mols, 1e-3, jnp.float32),
                    jnp.float32(1e-3), jnp.float32(1e-3))
    g1 = jax.grad(lambda p: molwise_loss(batch, m1.apply(p, batch), w)[0])(p1)
    g2 = jax.grad(lambda p: molwise_loss(batch, m2.apply(p, batch), w)[0])(p1)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_per_stage_compute_dtype(small_setup):
    """gnn_compute_dtype / heads_compute_dtype override the global
    compute_dtype per stage (the bf16 accuracy-tax diagnosis knobs):
    same param tree, close-to-f32 outputs, and each override actually
    changes the numerics of only its own stage."""
    model, params0, batch, _ = small_setup
    # jitter away from init: residual branches are zero-initialized, so at
    # init the GNN attention contributes exactly 0 and a dtype change there
    # would be invisible
    leaves, treedef = jax.tree.flatten(params0)
    keys = jax.random.split(jax.random.key(42), len(leaves))
    params = jax.tree.unflatten(treedef, [
        leaf + 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
        for leaf, k in zip(leaves, keys)])
    out_f32 = model.apply(params, batch)

    def apply_with(**over):
        cfg = get_small_model_config()
        cfg.update(over)
        m = make_model(cfg)
        # identical param tree: f32 params reusable under any stage dtype
        return m.apply(params, batch)

    out_gnn_bf16 = apply_with(gnn_compute_dtype='bfloat16')
    out_heads_bf16 = apply_with(heads_compute_dtype='bfloat16')
    out_all_bf16 = apply_with(compute_dtype='bfloat16')
    for k in out_f32:
        a = np.asarray(out_f32[k], np.float64)
        scale = np.abs(a).mean() + 1e-3
        for out in (out_gnn_bf16, out_heads_bf16, out_all_bf16):
            assert out[k].dtype == out_f32[k].dtype  # f32 outputs always
            rel = np.abs(np.asarray(out[k], np.float64) - a).mean() / scale
            assert rel < 0.15, (k, rel)
    # the overrides are not no-ops
    assert any(
        np.abs(np.asarray(out_gnn_bf16[k], np.float64)
               - np.asarray(out_f32[k], np.float64)).max() > 0
        for k in out_f32)
    assert any(
        np.abs(np.asarray(out_heads_bf16[k], np.float64)
               - np.asarray(out_f32[k], np.float64)).max() > 0
        for k in out_f32)
    # and compose: gnn override + heads override == full bf16
    out_both = apply_with(gnn_compute_dtype='bfloat16',
                          heads_compute_dtype='bfloat16')
    for k in out_f32:
        np.testing.assert_array_equal(np.asarray(out_both[k]),
                                      np.asarray(out_all_bf16[k]), err_msg=k)
