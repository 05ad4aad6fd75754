"""Decompose the training-step wall clock on one chip.

The full step runs at ~5% MFU while the chip does 47% on large matmuls —
this script measures where the time goes: GNN+heads forward, MM energy +
forces, full loss value_and_grad (grad-of-grad), optimizer update, and the
assembled train step, each as its own jit program with an honest host-fetch
timing (see PERF.md: block_until_ready lies on the tunneled backend).

Per component it prints ms, XLA cost-analysis FLOPs and the implied
TFLOP/s. Components overlap (the full step contains the others), so the
numbers are a profile, not a partition.

Usage: python benchmarks/step_breakdown.py [--bf16] [--mols 128] [--confs 32]
"""
import argparse
import json
import time


def _flops(fn, args):
    try:
        cost = fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get('flops', 0.0))
    except Exception:
        return 0.0


def time_it(fn, args, n_steps, fetch):
    """Median-free simple timing: warmup, then n_steps with one final
    data-dependent host fetch."""
    out = None
    for _ in range(3):
        out = fn(*args)
    fetch(out)
    t0 = time.time()
    for _ in range(n_steps):
        out = fn(*args)
    fetch(out)
    return (time.time() - t0) / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--mols', type=int, default=128)
    ap.add_argument('--confs', type=int, default=32)
    ap.add_argument('--steps', type=int, default=30)
    args = ap.parse_args()

    from grappa_tpu.utils import enable_compilation_cache, materialize
    enable_compilation_cache()

    import bench
    bench.N_MOLS, bench.N_CONFS = args.mols, args.confs
    batch, _ = bench.build_batch()

    import jax
    import jax.numpy as jnp
    # the disk-cached batch holds host numpy leaves; the loss closures below
    # capture the batch, and numpy_leaf[tracer] indexing fails in trace —
    # put it on device once (also how the Trainer holds batches)
    batch = jax.tree.map(jnp.asarray, batch)
    from grappa_tpu.models import mm_energy
    from grappa_tpu.models.grappa_model import (
        get_default_model_config, make_model)
    from grappa_tpu.train.loss import LossWeights, molwise_loss
    from grappa_tpu.train.trainer import make_optimizer, make_train_step

    cfg = get_default_model_config()
    if args.bf16:
        cfg['compute_dtype'] = 'bfloat16'
    model = make_model(cfg)
    # FLOPs must come from the math-identical DENSE model: the fused Pallas
    # heads/GNN are custom calls whose flops XLA's cost analysis cannot see
    # (same correction as bench.py measure_jax; PERF.md round-3 CORRECTION)
    flops_cfg = dict(cfg)
    flops_cfg['fused_heads'] = False
    flops_cfg['fused_gnn'] = False
    dense_model = make_model(flops_cfg)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    weights = LossWeights(
        energy=jnp.float32(1.0), gradient=jnp.float32(0.8),
        param=jnp.full(batch.num_mols, 1e-3, jnp.float32),
        proper_reg=jnp.float32(1e-3), improper_reg=jnp.float32(1e-3))
    rng = jax.random.key(1, impl='rbg')   # the Trainer's default PRNG

    results = {}

    def record(name, fn, fargs, fetch, dense_fn=None):
        """dense_fn: math-identical unfused twin used ONLY for the FLOP
        count when fn contains Pallas custom calls."""
        sec = time_it(fn, fargs, args.steps, fetch)
        fl = _flops(dense_fn or fn, fargs)
        results[name] = {
            'ms': round(sec * 1e3, 2),
            'gflops': round(fl / 1e9, 1),
            'tflops_per_s': round(fl / sec / 1e12, 2) if fl else None,
        }

    # 1. forward (GNN + heads) -> parameter dict
    fwd = jax.jit(lambda p, b: model.apply(p, b))
    record('forward', fwd, (params, batch),
           lambda out: materialize(out['n2_k']),
           dense_fn=jax.jit(lambda p, b: dense_model.apply(p, b)))

    pred = fwd(params, batch)
    pred = jax.tree.map(lambda x: x, pred)

    # 2. MM energy + forces from fixed parameters
    efn = jax.jit(lambda b, p: mm_energy.energy_and_gradient(b, p))
    record('energy_forces', efn, (batch, pred),
           lambda out: materialize(out[0]))

    # 3. loss forward only (model + energy + loss)
    def loss_fn(p, m=None):
        out = (m or model).apply(p, batch, deterministic=False,
                                 rngs={'dropout': rng})
        return molwise_loss(batch, out, weights)
    lfwd = jax.jit(lambda p: loss_fn(p)[0])
    record('loss_forward', lfwd, (params,), materialize,
           dense_fn=jax.jit(lambda p: loss_fn(p, dense_model)[0]))

    # 4. value_and_grad of the loss (the grad-of-grad backward)
    lgrad = jax.jit(lambda p: jax.value_and_grad(
        lambda q: loss_fn(q)[0])(p))
    record('loss_value_and_grad', lgrad, (params,),
           lambda out: materialize(out[0]),
           dense_fn=jax.jit(lambda p: jax.value_and_grad(
               lambda q: loss_fn(q, dense_model)[0])(p)))

    # 4b. stage partition of the backward: differentiate w.r.t. the head
    # params ONLY — h is then constant, XLA prunes the whole GNN backward,
    # and (loss_value_and_grad - this) isolates the GNN's backward share.
    # Same trick the other way for the GNN-weights-only gradient (this one
    # still chains through the heads' input-cotangents, so it is an upper
    # bound on the GNN share).
    def split_loss(p_gnn, p_rest, m=None):
        p = {'params': dict(p_rest, gnn=p_gnn)}
        out = (m or model).apply(p, batch, deterministic=False,
                                 rngs={'dropout': rng})
        return molwise_loss(batch, out, weights)[0]

    p_gnn = params['params']['gnn']
    p_rest = {k: v for k, v in params['params'].items() if k != 'gnn'}
    g_heads = jax.jit(lambda pg, pr: jax.value_and_grad(
        split_loss, argnums=1)(pg, pr))
    record('loss_grad_heads_params_only', g_heads, (p_gnn, p_rest),
           lambda out: materialize(out[0]),
           dense_fn=jax.jit(lambda pg, pr: jax.value_and_grad(
               lambda a, b: split_loss(a, b, dense_model),
               argnums=1)(pg, pr)))
    g_gnn = jax.jit(lambda pg, pr: jax.value_and_grad(
        split_loss, argnums=0)(pg, pr))
    record('loss_grad_gnn_params_only', g_gnn, (p_gnn, p_rest),
           lambda out: materialize(out[0]),
           dense_fn=jax.jit(lambda pg, pr: jax.value_and_grad(
               lambda a, b: split_loss(a, b, dense_model),
               argnums=0)(pg, pr)))

    # 4c. model-only value_and_grad: same model fwd+bwd but a pure
    # parameter-space loss (no MM energy, no forces, no grad-of-grad).
    # (loss_value_and_grad - this) is the measured cost of the entire
    # MM-energy/forces machinery inside the double backward.
    def model_only_loss(p, m=None):
        out = (m or model).apply(p, batch, deterministic=False,
                                 rngs={'dropout': rng})
        return sum(jnp.mean(jnp.square(v)) for v in out.values())
    m_vag = jax.jit(lambda p: jax.value_and_grad(model_only_loss)(p))
    record('model_only_value_and_grad', m_vag, (params,),
           lambda out: materialize(out[0]),
           dense_fn=jax.jit(lambda p: jax.value_and_grad(
               lambda q: model_only_loss(q, dense_model))(p)))

    # 5. optimizer update alone
    tx = make_optimizer()
    opt_state = tx.init(params)
    _, grads = lgrad(params)
    upd = jax.jit(lambda g, s, p: tx.update(g, s, p))
    record('optimizer_update', upd, (grads, opt_state, params),
           lambda out: materialize(jax.tree.leaves(out[0])[0]))

    # 6. the full assembled train step (donate off: params reused here)
    step = make_train_step(model, tx, donate=False)
    record('full_step', step,
           (params, opt_state, batch, weights, jnp.float32(1e-4), rng),
           lambda out: materialize(out[2]),
           dense_fn=make_train_step(dense_model, tx, donate=False))

    print(json.dumps({'workload': f'{args.mols}x{args.confs}',
                      'compute_dtype': cfg['compute_dtype'],
                      'breakdown': results}, indent=1))


if __name__ == '__main__':
    main()
