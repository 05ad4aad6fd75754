"""A/B the tuple-head attention score layout on TPU.

The heads attend over the tuple axis (S in {2,3,4}); the natural einsum
produces score tensors shaped (T, H, S, S) whose minor dims are 4x4 — XLA
pads them to the (8,128) tile, a 32x memory expansion (seen in the 512-mol
OOM dump, PERF.md). Variant B reorders the score einsums so the huge T axis
is minor ((H, S, S, T)), which tiles at ~2x instead.

Measures fwd and fwd+bwd of a 3-block transformer stack on (T, 4, 512),
both variants, identical math (allclose-checked first on small shapes).

Usage: python benchmarks/attention_probe.py [--t 40000] [--steps 30]
"""
import argparse
import time

import numpy as np


def attention_a(q, k, v):
    """Current layout: scores (T, H, S, S)."""
    import jax.numpy as jnp
    dh = q.shape[-1]
    logits = jnp.einsum('ashd,athd->ahst', q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(dh)
    w = _softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum('ahst,athd->ashd', w, v)


def attention_b(q, k, v):
    """T-minor scores: (H, S, S, T)."""
    import jax.numpy as jnp
    dh = q.shape[-1]
    logits = jnp.einsum('ashd,athd->hsta', q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(dh)
    w = _softmax(logits, axis=2).astype(v.dtype)
    return jnp.einsum('hsta,athd->ashd', w, v)


def _softmax(x, axis):
    import jax.numpy as jnp
    x = x - jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x)
    return e / jnp.sum(e, axis=axis, keepdims=True)


def block(attn_fn, x, wq, wo, w1, w2):
    """One pre-LN attention+FF block with fixed weights (no flax overhead)."""
    import jax.numpy as jnp
    t, s, f = x.shape
    h = 8
    xn = _ln(x)
    qkv = xn @ wq                              # (T, S, 3F)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(t, s, h, f // h)
    k = k.reshape(t, s, h, f // h)
    v = v.reshape(t, s, h, f // h)
    a = attn_fn(q, k, v).reshape(t, s, f) @ wo
    x = x + a
    xn = _ln(x)
    return x + jnp.maximum(xn @ w1, 0.0) @ w2


def _ln(x):
    import jax.numpy as jnp
    m = x.mean(axis=-1, keepdims=True)
    var = ((x - m) ** 2).mean(axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(var + 1e-5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--t', type=int, default=40000)
    ap.add_argument('--s', type=int, default=4)
    ap.add_argument('--f', type=int, default=512)
    ap.add_argument('--depth', type=int, default=3)
    ap.add_argument('--steps', type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from grappa_tpu.utils import enable_compilation_cache, materialize
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    f = args.f
    weights = [
        tuple(jnp.asarray(rng.normal(0, 0.02, shape).astype(np.float32))
              for shape in ((f, 3 * f), (f, f), (f, 4 * f), (4 * f, f)))
        for _ in range(args.depth)
    ]

    def stack(attn_fn, x):
        for wq, wo, w1, w2 in weights:
            x = block(attn_fn, x, wq, wo, w1, w2)
        return x

    # correctness: identical math on a small shape
    x_small = jnp.asarray(rng.normal(0, 1, (64, args.s, f)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(stack(attention_a, x_small)),
        np.asarray(stack(attention_b, x_small)), rtol=2e-4, atol=2e-4)
    print('# variants agree')

    x = jnp.asarray(rng.normal(0, 1, (args.t, args.s, f)), jnp.float32)
    results = {}
    for name, fn in (('a_scores_THSS', attention_a),
                     ('b_scores_HSST', attention_b)):
        fwd = jax.jit(lambda x, fn=fn: stack(fn, x).sum())
        grad = jax.jit(jax.grad(lambda x, fn=fn: stack(fn, x).sum()))
        for tag, g in (('fwd', fwd), ('fwd+bwd', grad)):
            for _ in range(3):
                out = g(x)
            materialize(out)
            t0 = time.time()
            for _ in range(args.steps):
                out = g(x)
            materialize(out)
            results[f'{name}_{tag}_ms'] = round(
                (time.time() - t0) / args.steps * 1e3, 2)
    import json
    print(json.dumps({'shape': list(x.shape), **results}))


if __name__ == '__main__':
    main()
