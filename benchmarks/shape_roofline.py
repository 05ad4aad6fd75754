"""Matmul roofline at the MODEL'S OWN shapes (one chip, honest timings).

The chip's 187 TFLOP/s bf16 / 153 f32 measured peak (PERF.md) comes from
16384^3 matmuls — irrelevant as an MFU denominator for a model whose
matmuls are (T, 512) @ (512, 512..2048) with T ~ 1e4..1e5. This probe
measures the sustained TFLOP/s of CHAINS of exactly those matmuls (chained
so XLA cannot overlap dispatch, with a data-dependent host fetch), giving
the shape-feasible peak that the training step should be judged against.

If the full training step's TFLOP/s (step_breakdown_r4_*.json) is a large
fraction of the same-shape roofline, the remaining MFU gap is a hardware
shape limit, not fixable overhead.

Usage: python benchmarks/shape_roofline.py [--bf16]
"""
import argparse
import json
import time


def measure_chain(m, k, n, dtype, n_links=32, n_rounds=8):
    """TFLOP/s of x @ W repeated n_links times (x re-used, W distinct)."""
    import jax
    import jax.numpy as jnp

    kx = jax.random.key(0)
    x = jax.random.normal(kx, (m, k), dtype)
    # alternate (k,n) and (n,k) weights: every link is a pure matmul of the
    # probed shape and the chain stays shape-stable without pads/slices
    assert n_links % 2 == 0
    ws = []
    for i in range(n_links):
        shape = (k, n) if i % 2 == 0 else (n, k)
        # 1/sqrt(fan_in) keeps activations O(1) across the whole chain
        ws.append(jax.random.normal(jax.random.key(i + 1), shape, dtype)
                  * (shape[0] ** -0.5))

    @jax.jit
    def chain(x, ws):
        y = x
        for w in ws:
            y = y @ w
        return y

    y = chain(x, ws)
    float(y[0, 0].astype(jnp.float32))   # force execution (tunnel lies)
    t0 = time.time()
    for _ in range(n_rounds):
        y = chain(y, ws)
    float(y[0, 0].astype(jnp.float32))
    sec = (time.time() - t0) / n_rounds
    flops = 2.0 * m * k * n * n_links
    return flops / sec / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bf16', action='store_true')
    args = ap.parse_args()

    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    # the training step's actual matmul populations (128 mol x 32 conf
    # batch): GNN attention/FF on N~4.4k atoms, tuple-head transformer/FF
    # on T~8k..24k tuples, symmetriser on permutation-pooled rows
    shapes = {
        'gnn_ff_4k':        (4352, 512, 2048),
        'gnn_proj_4k':      (4352, 512, 512),
        'head_qkv_24k':     (24576, 512, 1536),
        'head_ff_24k':      (24576, 512, 2048),
        'head_proj_24k':    (24576, 512, 512),
        'symmetriser_24k':  (24576, 256, 256),
        'big_square_8k':    (8192, 8192, 8192),   # the chip-peak anchor
    }
    out = {}
    for name, (m, k, n) in shapes.items():
        out[name] = round(measure_chain(m, k, n, dtype), 1)
        print(f'# {name} ({m}x{k}x{n}): {out[name]} TFLOP/s', flush=True)
    print(json.dumps({'dtype': str(dtype.__name__), 'tflops': out}))


if __name__ == '__main__':
    main()
