"""Fused Pallas op parity (interpreter mode on the CPU mesh).

The fused TransformerBlock (ops/fused_block.py) and fused Symmetriser
(ops/fused_symmetriser.py) must match their flax modules exactly in
deterministic mode — forward, input gradients, and every parameter
gradient. Dropout mode uses the in-kernel TPU PRNG which has no CPU
interpreter lowering; its replay/gradient consistency is validated on-chip
(PERF.md "fused head kernels") and exercised by every TPU training run.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grappa_tpu.ops import fused_block as fb
from grappa_tpu.ops import fused_gnn as fg
from grappa_tpu.ops import fused_symmetriser as fs
from grappa_tpu.models.heads import PERMUTATIONS, Symmetriser
from grappa_tpu.models.layers import TransformerBlock


@pytest.fixture(autouse=True)
def _interpret():
    fb.INTERPRET = True
    fs.INTERPRET = True
    fg.INTERPRET = True
    yield
    fb.INTERPRET = False
    fs.INTERPRET = False
    fg.INTERPRET = False


def _rand_tree(tree, rng, scale=0.08):
    return jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, scale, a.shape), jnp.float32),
        tree)


@pytest.mark.parametrize('s', [2, 3, 4])
def test_fused_block_matches_flax(s):
    T, F, H = 70, 128, 8        # T=70 exercises the ragged tile (block_t 64)
    rng = np.random.default_rng(s)
    x = jnp.asarray(rng.normal(0, 1, (T, s, F)), jnp.float32)
    blk = TransformerBlock(num_heads=H, hidden_feats=F, dropout=0.0)
    params = _rand_tree(blk.init(jax.random.key(0), x, True)['params'], rng)

    y_flax = blk.apply({'params': params}, x, True)
    y_fused = fb.fused_transformer_block(
        x.transpose(1, 0, 2), params, jnp.uint32(0), H, 0.0, True, None,
        64).transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_flax),
                               rtol=2e-5, atol=2e-5)

    def loss_flax(x, p):
        return jnp.sum(jnp.cos(blk.apply({'params': p}, x, True)))

    def loss_fused(x, p):
        y = fb.fused_transformer_block(
            x.transpose(1, 0, 2), p, jnp.uint32(0), H, 0.0, True, None, 64)
        return jnp.sum(jnp.cos(y.transpose(1, 0, 2)))

    gx1, gp1 = jax.grad(loss_flax, argnums=(0, 1))(x, params)
    gx2, gp2 = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               rtol=1e-4, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5), gp1, gp2)


@pytest.mark.parametrize('term,out_feats', [('n2', 2), ('n4_improper', 12)])
def test_fused_symmetriser_matches_flax(term, out_feats):
    perms = PERMUTATIONS[term]
    s = len(perms[0])
    T, F = 70, 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (T, s, F)), jnp.float32)
    mod = Symmetriser(permutations=perms, hidden_feats=64,
                      out_feats=out_feats, n_layers=3)
    params = _rand_tree(mod.init(jax.random.key(0), x, True)['params'], rng)

    y1 = mod.apply({'params': params}, x, True)
    y2 = fs.fused_symmetriser(x.transpose(1, 0, 2), params, perms, 3,
                              None, 32)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=2e-5, atol=2e-5)

    def l1(x, p):
        return jnp.sum(jnp.sin(mod.apply({'params': p}, x, True)))

    def l2(x, p):
        return jnp.sum(jnp.sin(fs.fused_symmetriser(
            x.transpose(1, 0, 2), p, perms, 3, None, 32)))

    g1 = jax.grad(l1, argnums=(0, 1))(x, params)
    g2 = jax.grad(l2, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(g2[0]), np.asarray(g1[0]),
                               rtol=1e-4, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5),
        g1[1], g2[1])


def test_fused_symmetriser_permutation_invariance():
    """The fused head output must be invariant under its symmetry perms."""
    perms = PERMUTATIONS['n4']
    T, F = 16, 64
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (T, 4, F)), jnp.float32)
    mod = Symmetriser(permutations=perms, hidden_feats=32, out_feats=6,
                      n_layers=2)
    params = _rand_tree(mod.init(jax.random.key(0), x, True)['params'], rng)
    y = fs.fused_symmetriser(x.transpose(1, 0, 2), params, perms, 2, None, 16)
    x_rev = x[:, ::-1, :]
    y_rev = fs.fused_symmetriser(x_rev.transpose(1, 0, 2), params, perms, 2,
                                 None, 16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_rev),
                               rtol=1e-5, atol=1e-5)


def test_fused_model_matches_unfused_small():
    """Whole GrappaModel: fused_heads=True == False (deterministic, CPU)."""
    from grappa_tpu.data import MolGraph, collate
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.models.grappa_model import (get_small_model_config,
                                                make_model)
    mds = make_dataset(n_mols=3, n_confs=2, seed=5)
    batch = collate([MolGraph.from_moldata(m) for m in mds])
    cfg = get_small_model_config()
    cfg['fused_heads'] = False
    m0 = make_model(cfg)
    params = m0.init(jax.random.key(0), batch)
    out0 = m0.apply(params, batch, True)
    cfg1 = dict(cfg)
    cfg1['fused_heads'] = True
    m1 = make_model(cfg1)
    out1 = m1.apply(params, batch, True)
    for k in out0:
        np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out0[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)


def test_fused_gnn_block_matches_flax():
    """fused_gnn_block == ResidualAttentionBlock minus the leading LN+fc:
    forward, input gradients, and every parameter gradient — including an
    all-masked node (padding atom: masked_softmax must yield ZERO attention,
    models/layers.py:27-35) and a ragged final tile."""
    from grappa_tpu.models.gnn import ResidualAttentionBlock
    from grappa_tpu.ops.fused_block import _ln_fwd

    if True:
        N, F, H, D = 50, 64, 4, 6       # block_n=32: ragged second tile
        rng = np.random.default_rng(7)
        h = jnp.asarray(rng.normal(0, 1, (N, F)), jnp.float32)
        neighbors = jnp.asarray(rng.integers(0, N, (N, D)), jnp.int32)
        mask = (rng.random((N, D)) > 0.3).astype(np.float32)
        mask[-1] = 0.0                  # isolated / padding atom
        mask = jnp.asarray(mask)

        blk = ResidualAttentionBlock(out_feats=F, num_heads=H, dropout=0.0)
        params = _rand_tree(
            blk.init(jax.random.key(0), h, neighbors, mask, True)['params'],
            rng)

        def flax_apply(h, p):
            return blk.apply({'params': p}, h, neighbors, mask, True)

        def fused_apply(h, p):
            hn, _, _ = _ln_fwd(h, p['norm']['scale'], p['norm']['bias'])
            feat = hn @ p['attention']['fc']['kernel']
            nbr = feat[neighbors].transpose(1, 0, 2)     # (D, N, F)
            sub = {k: p[k] for k in ('head_reducer', 'interaction_norm',
                                     'si_dense1', 'si_dense2')}
            return fg.fused_gnn_block(feat, nbr, hn, mask.T, sub,
                                      jnp.uint32(0), H, 0.0, True, None, 32)

        y0 = flax_apply(h, params)
        y1 = fused_apply(h, params)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-5, atol=2e-5)

        g0 = jax.grad(lambda h, p: jnp.sum(jnp.cos(flax_apply(h, p))),
                      argnums=(0, 1))(h, params)
        g1 = jax.grad(lambda h, p: jnp.sum(jnp.cos(fused_apply(h, p))),
                      argnums=(0, 1))(h, params)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]),
                                   rtol=1e-4, atol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5),
            g0[1], g1[1])


def test_fused_gnn_reference_matches_flax():
    """The plain-jnp reference of the kernel math also matches flax (guards
    the test oracle itself)."""
    from grappa_tpu.models.gnn import ResidualAttentionBlock
    from grappa_tpu.ops.fused_block import _ln_fwd

    N, F, H, D = 33, 32, 4, 4
    rng = np.random.default_rng(11)
    h = jnp.asarray(rng.normal(0, 1, (N, F)), jnp.float32)
    neighbors = jnp.asarray(rng.integers(0, N, (N, D)), jnp.int32)
    mask = jnp.asarray((rng.random((N, D)) > 0.5).astype(np.float32))
    blk = ResidualAttentionBlock(out_feats=F, num_heads=H, dropout=0.0)
    params = _rand_tree(
        blk.init(jax.random.key(0), h, neighbors, mask, True)['params'], rng)
    y0 = blk.apply({'params': params}, h, neighbors, mask, True)
    hn, _, _ = _ln_fwd(h, params['norm']['scale'], params['norm']['bias'])
    feat = hn @ params['attention']['fc']['kernel']
    sub = {k: params[k] for k in ('head_reducer', 'interaction_norm',
                                  'si_dense1', 'si_dense2')}
    y1 = fg.reference_gnn_block(feat, feat[neighbors].transpose(1, 0, 2),
                                hn, mask.T, sub, n_heads=H)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)


def test_fused_gnn_model_matches_unfused_small():
    """Whole GrappaModel: fused_gnn=True == False with the SAME param tree
    (deterministic, interpreter on CPU)."""
    from grappa_tpu.data import MolGraph, collate
    from grappa_tpu.data.synthetic import make_dataset
    from grappa_tpu.models.grappa_model import (get_small_model_config,
                                                make_model)
    mds = make_dataset(n_mols=3, n_confs=2, seed=6)
    batch = collate([MolGraph.from_moldata(m) for m in mds])
    cfg = get_small_model_config()
    cfg['fused_heads'] = False
    cfg['fused_gnn'] = False
    m0 = make_model(cfg)
    params = m0.init(jax.random.key(0), batch)
    out0 = m0.apply(params, batch, True)
    cfg1 = dict(cfg)
    cfg1['fused_gnn'] = True
    m1 = make_model(cfg1)
    # identical checkpoint tree: init of the fused model matches too
    params1 = m1.init(jax.random.key(0), batch)
    assert (jax.tree.structure(params1) == jax.tree.structure(params))
    out1 = m1.apply(params, batch, True)
    for k in out0:
        np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out0[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
