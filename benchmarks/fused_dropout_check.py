"""On-chip validation of the fused blocks' in-kernel dropout (real TPU).

The fused TransformerBlock (ops/fused_block.py) and the fused GNN
attention block (ops/fused_gnn.py) draw their dropout masks from the TPU
PRNG *inside* the kernel — per grid tile they seed (seed, program_id) and
draw two masks in a fixed order. The backward kernels replay the identical
sequence. None of this lowers in the CPU interpreter, so the
interpreter-mode parity tests (tests/test_fused_ops.py) only cover
deterministic mode; THIS script is the dropout-mode evidence, for each
kernel:

  1. mask replay: `dropout_masks` (the same draw sequence, dumped) is
     bit-identical across calls with the same seed, different across seeds,
     and keeps ~= (1 - rate) of elements;
  2. forward: fused(dropout) == pure-XLA reference with the dumped masks
     injected at the two dropout sites;
  3. backward: fused input+param grads == jax.grad of that reference.

Run on the real chip: `python benchmarks/fused_dropout_check.py`.
Exits nonzero on any mismatch; prints a PASS summary (recorded in PERF.md).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from grappa_tpu.ops import fused_block as fb


def ref_with_masks(x_stf, params, m1, m2, n_heads):
    """reference_block with the two dropout masks injected (masks already
    carry the 1/keep scale, exactly as the kernel applies them)."""
    flat = fb.flatten_params(params)
    (g1, b1, wq, bq, wo, bo, g2, b2, w1, c1, w2, c2) = flat
    s, t, f = x_stf.shape
    x0 = x_stf.reshape(s * t, f)
    xn, _, _ = fb._ln_fwd(x0, g1, b1)
    qkv = xn @ wq + bq
    q, k, v = qkv[:, :f], qkv[:, f:2 * f], qkv[:, 2 * f:]
    dh = f // n_heads
    qs = q.reshape(s, t, n_heads, dh)
    ks = k.reshape(s, t, n_heads, dh)
    vs = v.reshape(s, t, n_heads, dh)
    logits = jnp.einsum('sthd,uthd->suth', qs, ks) / np.sqrt(dh)
    w = jax.nn.softmax(logits, axis=1)
    attn0 = jnp.einsum('suth,uthd->sthd', w, vs).reshape(s * t, f)
    attn1 = (attn0 @ wo + bo) * m1.reshape(s * t, f)
    x1 = attn1 + xn
    x1n, _, _ = fb._ln_fwd(x1, g2, b2)
    a = x1n @ w1 + c1
    e = jnp.where(a > 0, a, jnp.exp(jnp.minimum(a, 0.0)) - 1.0)
    h = (e @ w2 + c2) * m2.reshape(s * t, f)
    return (h + x1n).reshape(s, t, f)


def ref_gnn_with_masks(feat, nbr, hn, mask, params, m1, m2, n_heads):
    """reference_gnn_block with the two dropout masks injected (masks carry
    the 1/keep scale, exactly as the kernel applies them)."""
    from grappa_tpu.ops import fused_gnn as fg
    (wr, br, g2, b2, w1, c1, w2, c2) = fg.flatten_params(params)
    d, n, f = nbr.shape
    dh = f // n_heads
    feath = feat.reshape(n, n_heads, dh)
    nbrh = nbr.reshape(d, n, n_heads, dh)
    scores = jnp.einsum('nhd,knhd->knh', feath, nbrh) / np.sqrt(dh)
    scores = jnp.where(mask[:, :, None] > 0, scores, np.float32(-1e30))
    exps = jnp.exp(scores - scores.max(axis=0)) * mask[:, :, None]
    alpha = exps / jnp.maximum(exps.sum(axis=0), 1e-9)
    attn0 = jnp.einsum('knh,knhd->nhd', alpha, nbrh).reshape(n, f)
    a1 = (attn0 @ wr + br) * m1
    x1 = a1 + hn
    x1n, _, _ = fb._ln_fwd(x1, g2, b2)
    t1 = x1n @ w1 + c1
    e1 = jnp.where(t1 > 0, t1, jnp.exp(jnp.minimum(t1, 0.0)) - 1.0)
    t2 = e1 @ w2 + c2
    e2 = jnp.where(t2 > 0, t2, jnp.exp(jnp.minimum(t2, 0.0)) - 1.0)
    return e2 * m2 + x1n


def check_gnn():
    from grappa_tpu.models.gnn import ResidualAttentionBlock
    from grappa_tpu.ops import fused_gnn as fg

    N, F, H, D = 1000, 512, 16, 6        # block_n=128: ragged final tile
    RATE, BN = 0.3, 128
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.normal(0, 1, (N, F)), jnp.float32)
    neighbors = jnp.asarray(rng.integers(0, N, (N, D)), jnp.int32)
    nmask = (rng.random((N, D)) > 0.3).astype(np.float32)
    nmask[-1] = 0.0                      # padding atom
    nmask = jnp.asarray(nmask)
    blk = ResidualAttentionBlock(out_feats=F, num_heads=H, dropout=RATE)
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.08, a.shape), jnp.float32),
        blk.init(jax.random.key(0), h, neighbors, nmask, True)['params'])
    hn, _, _ = fb._ln_fwd(h, params['norm']['scale'], params['norm']['bias'])
    feat = hn @ params['attention']['fc']['kernel']
    nbr = feat[neighbors].transpose(1, 0, 2)
    sub = {k: params[k] for k in ('head_reducer', 'interaction_norm',
                                  'si_dense1', 'si_dense2')}
    seed = jnp.uint32(7)
    ok = True

    # 1. replay determinism + keep fraction
    dump = jax.jit(lambda s: fg.dropout_masks(s, N, F, RATE, BN))
    m1a, m2a = dump(seed)
    m1b, m2b = dump(seed)
    m1c, _ = dump(jnp.uint32(8))
    same = (np.array_equal(np.asarray(m1a), np.asarray(m1b))
            and np.array_equal(np.asarray(m2a), np.asarray(m2b)))
    diff = not np.array_equal(np.asarray(m1a), np.asarray(m1c))
    keep1 = float((np.asarray(m1a) > 0).mean())
    keep2 = float((np.asarray(m2a) > 0).mean())
    print(f"[gnn] replay identical: {same}; seeds differ: {diff}; "
          f"keep fractions: {keep1:.4f} / {keep2:.4f} (target {1-RATE})")
    ok &= same and diff and abs(keep1 - (1 - RATE)) < 0.01 \
        and abs(keep2 - (1 - RATE)) < 0.01

    # 2. forward: fused(dropout) vs reference with the dumped masks
    fused = jax.jit(lambda f_, n_, p: fg.fused_gnn_block(
        f_, n_, hn, nmask.T, p, seed, H, RATE, False, None, BN))
    y_fused = np.asarray(fused(feat, nbr, sub))
    y_ref = np.asarray(jax.jit(ref_gnn_with_masks, static_argnums=7)(
        feat, nbr, hn, nmask.T, sub, m1a, m2a, H))
    fwd_err = np.max(np.abs(y_fused - y_ref)) / max(np.max(np.abs(y_ref)), 1)
    print(f"[gnn] forward rel err vs masked reference: {fwd_err:.2e}")
    ok &= fwd_err < 5e-3

    # 3. backward: input + param grads
    def loss_fused(f_, n_, p):
        return jnp.sum(jnp.cos(fg.fused_gnn_block(
            f_, n_, hn, nmask.T, p, seed, H, RATE, False, None, BN)))

    def loss_ref(f_, n_, p):
        return jnp.sum(jnp.cos(ref_gnn_with_masks(
            f_, n_, hn, nmask.T, p, m1a, m2a, H)))

    g1 = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(feat, nbr, sub)
    g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(feat, nbr, sub)
    errs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b)))
                  / max(float(np.max(np.abs(np.asarray(b)))), 1e-8))
            for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2))]
    print(f"[gnn] grad rel errs: max {max(errs):.2e} over {len(errs)} leaves")
    # Tolerance 1e-2: the grad-wrt-feat leaf has small magnitude (|g|max
    # ~0.2 vs ~1e4 for param grads) and measures 6.2e-3 rel err on this
    # chip even with dropout OFF (pure matmul-reassociation noise; probe:
    # per-leaf deterministic vs rate=0.3 comparison, 2026-08-17) — dropout
    # replay itself is bit-identical (step 1) and adds <1e-3 on top.
    ok &= max(errs) < 1e-2
    return ok


def main():
    from grappa_tpu.models.layers import TransformerBlock

    S, T, F, H = 4, 1000, 512, 8           # T=1000: ragged final tile
    RATE, BT = 0.3, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (S, T, F)), jnp.float32)
    blk = TransformerBlock(num_heads=H, hidden_feats=F, dropout=RATE)
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.08, a.shape), jnp.float32),
        blk.init(jax.random.key(0), x.transpose(1, 0, 2), True)['params'])
    seed = jnp.uint32(42)
    ok = True

    # 1. replay determinism + keep fraction
    dump = jax.jit(lambda s: fb.dropout_masks(s, S, T, F, RATE, BT))
    m1a, m2a = dump(seed)
    m1b, m2b = dump(seed)
    m1c, _ = dump(jnp.uint32(43))
    same = (np.array_equal(np.asarray(m1a), np.asarray(m1b))
            and np.array_equal(np.asarray(m2a), np.asarray(m2b)))
    diff = not np.array_equal(np.asarray(m1a), np.asarray(m1c))
    keep1 = float((np.asarray(m1a) > 0).mean())
    keep2 = float((np.asarray(m2a) > 0).mean())
    print(f"replay identical: {same}; seeds differ: {diff}; "
          f"keep fractions: {keep1:.4f} / {keep2:.4f} (target {1-RATE})")
    ok &= same and diff and abs(keep1 - (1 - RATE)) < 0.01 \
        and abs(keep2 - (1 - RATE)) < 0.01

    # 2. forward: fused(dropout) vs reference with the dumped masks
    fused = jax.jit(lambda x, p: fb.fused_transformer_block(
        x, p, seed, H, RATE, False, None, BT))
    y_fused = np.asarray(fused(x, params))
    y_ref = np.asarray(jax.jit(ref_with_masks, static_argnums=4)(
        x, params, m1a, m2a, H))
    fwd_err = np.max(np.abs(y_fused - y_ref)) / max(np.max(np.abs(y_ref)), 1)
    print(f"forward rel err vs masked reference: {fwd_err:.2e}")
    ok &= fwd_err < 5e-3   # f32 matmul reassociation noise on TPU

    # 3. backward: input + param grads
    def loss_fused(x, p):
        return jnp.sum(jnp.cos(fb.fused_transformer_block(
            x, p, seed, H, RATE, False, None, BT)))

    def loss_ref(x, p):
        return jnp.sum(jnp.cos(ref_with_masks(x, p, m1a, m2a, H)))

    gx1, gp1 = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(x, params)
    gx2, gp2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(x, params)
    errs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b)))
                  / max(float(np.max(np.abs(np.asarray(b)))), 1e-8))
            for a, b in zip(jax.tree.leaves((gx1, gp1)),
                            jax.tree.leaves((gx2, gp2)))]
    print(f"grad rel errs: max {max(errs):.2e} over {len(errs)} leaves")
    ok &= max(errs) < 5e-3

    ok &= check_gnn()

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
