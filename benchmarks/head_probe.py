"""Localize the tuple-head transformer cost on TPU before fusing anything.

The step breakdown (PERF.md) shows the whole training step running at ~20
TFLOP/s with no single bad kernel. Hypothesis: the head stack is HBM-bound —
each pre-LN / softmax / residual boundary materializes a (T, S, 512)-ish
tensor in HBM around every matmul. This probe times a 3-block head stack
(the real TransformerBlock math from models/layers.py, flax-free) in
variants that only change dtype/layout, plus a matmul-only lower bound:

  xla_f32      exact current default (f32 everywhere)
  xla_bf16mm   matmuls bf16, LN/softmax/residuals f32 (compute_dtype path)
  xla_bf16all  activations bf16 end-to-end (LN stats in f32)
  mm_f32 / mm_bf16   chained matmuls of the same shapes, no LN/attn/residual
                     (the pure-MXU floor for this stack)

If xla_bf16all ~ 2x xla_f32 while mm_* is far below both, the stack is
bandwidth-bound and fusing (Pallas block or wider XLA fusion) is the lever.

Usage: python benchmarks/head_probe.py [--t 16384] [--depth 3] [--steps 20]
"""
import argparse
import json
import time

import numpy as np


def _ln(x, eps=1e-5):
    import jax.numpy as jnp
    xf = x.astype(jnp.float32)
    m = xf.mean(axis=-1, keepdims=True)
    var = ((xf - m) ** 2).mean(axis=-1, keepdims=True)
    return ((xf - m) / jnp.sqrt(var + eps)).astype(x.dtype)


def block(x, wq, wo, w1, w2, mm_dtype, act_dtype, n_heads=8):
    """TransformerBlock math (layers.py): pre-LN MHA + FF-with-skip."""
    import jax
    import jax.numpy as jnp
    t, s, f = x.shape
    dh = f // n_heads
    x = _ln(x)
    qkv = (x.astype(mm_dtype) @ wq.astype(mm_dtype))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(t, s, n_heads, dh)
    k = k.reshape(t, s, n_heads, dh)
    v = v.reshape(t, s, n_heads, dh)
    if s >= 4:
        logits = jnp.einsum('ashd,athd->hsta', q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(dh)
        w = jax.nn.softmax(logits, axis=2).astype(act_dtype)
        attn = jnp.einsum('hsta,athd->ashd', w, v.astype(act_dtype))
    else:
        logits = jnp.einsum('ashd,athd->ahst', q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(dh)
        w = jax.nn.softmax(logits, axis=-1).astype(act_dtype)
        attn = jnp.einsum('ahst,athd->ashd', w, v.astype(act_dtype))
    attn = attn.reshape(t, s, f)
    attn = (attn.astype(mm_dtype) @ wo.astype(mm_dtype)).astype(act_dtype)
    x = (attn + x).astype(act_dtype)
    xn = _ln(x)
    h = (xn.astype(mm_dtype) @ w1.astype(mm_dtype)).astype(act_dtype)
    h = jax.nn.elu(h)
    h = (h.astype(mm_dtype) @ w2.astype(mm_dtype)).astype(act_dtype)
    return x + h


def mm_stack(x, weights, mm_dtype):
    """Same matmul shapes, nothing else: the MXU floor."""
    x = x.astype(mm_dtype)
    t, s, f = x.shape
    for wq, wo, w1, w2 in weights:
        y = x @ wq.astype(mm_dtype)            # (T,S,3F)
        x = y[..., :f] @ wo.astype(mm_dtype)
        x = (x @ w1.astype(mm_dtype)) @ w2.astype(mm_dtype)
    return x


def stack_flops(t, s, f, hidden, depth):
    per_row = 2 * f * (3 * f) + 2 * f * f + 2 * f * hidden + 2 * hidden * f
    return t * s * per_row * depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--t', type=int, default=16384)
    ap.add_argument('--s', type=int, default=4)
    ap.add_argument('--f', type=int, default=512)
    ap.add_argument('--depth', type=int, default=3)
    ap.add_argument('--steps', type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from grappa_tpu.utils import enable_compilation_cache, materialize
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    f = args.f
    hidden = f
    weights = [
        tuple(jnp.asarray(rng.normal(0, 0.02, shape).astype(np.float32))
              for shape in ((f, 3 * f), (f, f), (f, hidden), (hidden, f)))
        for _ in range(args.depth)
    ]
    flat_w = [w for tup in weights for w in tup]

    def rebuild(ws):
        return [tuple(ws[i * 4:(i + 1) * 4]) for i in range(args.depth)]

    variants = {
        'xla_f32': (jnp.float32, jnp.float32),
        'xla_bf16mm': (jnp.bfloat16, jnp.float32),
        'xla_bf16all': (jnp.bfloat16, jnp.bfloat16),
    }

    x32 = jnp.asarray(rng.normal(0, 1, (args.t, args.s, f)), jnp.float32)
    fwd_flops = stack_flops(args.t, args.s, f, hidden, args.depth)
    results = {'shape': list(x32.shape), 'depth': args.depth,
               'fwd_gflop': round(fwd_flops / 1e9, 1)}

    def time_fn(g, *inp):
        for _ in range(3):
            out = g(*inp)
        materialize(out)
        t0 = time.time()
        for _ in range(args.steps):
            out = g(*inp)
        materialize(out)
        return (time.time() - t0) / args.steps * 1e3

    for name, (mm_dtype, act_dtype) in variants.items():
        def run(x, ws, mm_dtype=mm_dtype, act_dtype=act_dtype):
            x = x.astype(act_dtype)
            for wq, wo, w1, w2 in rebuild(ws):
                x = block(x, wq, wo, w1, w2, mm_dtype, act_dtype)
            return x.astype(jnp.float32).sum()

        # reduce grads to one scalar INSIDE the jit: materialize() fetches
        # its whole argument, and the tunnel moves data at a few MB/s — a
        # 134MB gradient fetch would swamp the timing
        fwd = jax.jit(run)
        grad = jax.jit(lambda x, ws: sum(
            g.astype(jnp.float32).sum()
            for g in jax.tree.leaves(jax.grad(run, argnums=(0, 1))(x, ws))))
        ms_f = time_fn(fwd, x32, flat_w)
        ms_g = time_fn(grad, x32, flat_w)
        results[name] = {
            'fwd_ms': round(ms_f, 2), 'fwd_tflops': round(fwd_flops / ms_f / 1e9, 1),
            'fwdbwd_ms': round(ms_g, 2),
            'fwdbwd_tflops': round(3 * fwd_flops / ms_g / 1e9, 1),
        }

    # fused Pallas block stack (ops/fused_block.py), f32 and bf16-matmul
    from grappa_tpu.ops.fused_block import fused_transformer_block
    weight_trees = [
        {'norm1': {'scale': jnp.ones(f), 'bias': jnp.zeros(f)},
         'attn': {'in_proj': {'kernel': wq, 'bias': jnp.zeros(3 * f)},
                  'out_proj': {'kernel': wo, 'bias': jnp.zeros(f)}},
         'ff': {'norm': {'scale': jnp.ones(f), 'bias': jnp.zeros(f)},
                'linear1': {'kernel': w1, 'bias': jnp.zeros(hidden)},
                'linear2': {'kernel': w2, 'bias': jnp.zeros(f)}}}
        for wq, wo, w1, w2 in weights]
    for name, mm_dtype, drop in (('pallas_f32', None, 0.0),
                                 ('pallas_bf16mm', jnp.bfloat16, 0.0),
                                 ('pallas_f32_dropout', None, 0.5)):
        det = drop == 0.0

        def run(x, wts, mm_dtype=mm_dtype, det=det, drop=drop):
            x = x.transpose(1, 0, 2)
            for i, pt in enumerate(wts):
                x = fused_transformer_block(x, pt, jnp.uint32(i), 8, drop,
                                            det, mm_dtype, 128)
            return x.astype(jnp.float32).sum()

        fwd = jax.jit(run)
        grad = jax.jit(lambda x, ws: sum(
            g.astype(jnp.float32).sum()
            for g in jax.tree.leaves(jax.grad(run, argnums=(0, 1))(x, ws))))
        ms_f = time_fn(fwd, x32, weight_trees)
        ms_g = time_fn(grad, x32, weight_trees)
        results[name] = {
            'fwd_ms': round(ms_f, 2), 'fwd_tflops': round(fwd_flops / ms_f / 1e9, 1),
            'fwdbwd_ms': round(ms_g, 2),
            'fwdbwd_tflops': round(3 * fwd_flops / ms_g / 1e9, 1),
        }

    for name, mm_dtype in (('mm_f32', jnp.float32), ('mm_bf16', jnp.bfloat16)):
        fwd = jax.jit(lambda x, ws, d=mm_dtype: mm_stack(
            x, rebuild(ws), d).astype(jnp.float32).sum())
        mm_loss = lambda x, ws, d=mm_dtype: mm_stack(
            x, rebuild(ws), d).astype(jnp.float32).sum()
        grad = jax.jit(lambda x, ws, f=mm_loss: sum(
            g.astype(jnp.float32).sum()
            for g in jax.tree.leaves(jax.grad(f, argnums=(0, 1))(x, ws))))
        mm_flops = args.t * args.s * args.depth * 2 * f * (3 * f + f + hidden + hidden)
        ms_f = time_fn(fwd, x32, flat_w)
        ms_g = time_fn(grad, x32, flat_w)
        results[name] = {
            'fwd_ms': round(ms_f, 2), 'fwd_tflops': round(mm_flops / ms_f / 1e9, 1),
            'fwdbwd_ms': round(ms_g, 2),
            'fwdbwd_tflops': round(3 * mm_flops / ms_g / 1e9, 1),
        }

    print(json.dumps(results))


if __name__ == '__main__':
    main()
