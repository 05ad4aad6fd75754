"""On-chip validation of the fused block's in-kernel dropout (real TPU).

The fused TransformerBlock (ops/fused_block.py) draws its dropout masks
from the TPU PRNG *inside* the kernel — per grid tile it seeds
(seed, program_id) and draws the attention mask then the FF mask. The
backward kernel replays the identical sequence. None of this lowers in the
CPU interpreter, so the interpreter-mode parity tests (tests/test_fused_ops.py)
only cover deterministic mode; THIS script is the dropout-mode evidence:

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

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
