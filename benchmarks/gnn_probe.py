"""Measure the fused GNN attention block (ops/fused_gnn.py) on the chip.

After the tuple heads were fused (3.3x on their stack), the GNN's 7
ResidualAttentionBlocks are the next candidate: each bounces (N, 512)
tensors through HBM at every LN / score / softmax / reduce / FF boundary,
and the neighbor attention works on tiny D<=8 slot axes that XLA tiles
poorly. This probe times, on the real chip:

  * gnn_fwd_bwd     — GrappaGNN alone, value_and_grad, fused vs XLA
  * train_step      — the full headline training step (bench.py workload),
                      fused_gnn off / on (fused_heads stays on in both)

Honest timing: every measurement ends in a host fetch of a data-dependent
value (grappa_tpu.utils.materialize).

Usage: python benchmarks/gnn_probe.py [--steps 20]
"""
import argparse
import json
import time


def time_it(fn, args, n_steps, fetch):
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
    ap.add_argument('--steps', type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from grappa_tpu.models.gnn import GrappaGNN
    from grappa_tpu.models.grappa_model import (get_default_model_config,
                                                make_model)
    from grappa_tpu.train.loss import LossWeights, molwise_loss
    from grappa_tpu.train.trainer import make_optimizer, make_train_step
    from grappa_tpu.utils import enable_compilation_cache, materialize

    enable_compilation_cache()
    batch, _ = bench.build_batch()
    batch = jax.device_put(batch)
    res = {'n_nodes': int(batch.num_nodes), 'backend': jax.default_backend()}

    # --- GNN alone, value_and_grad --------------------------------------
    cfg = get_default_model_config()
    for fused in (False, True):
        gnn = GrappaGNN(
            out_feats=cfg['graph_node_features'], node_feats=cfg['gnn_width'],
            n_conv=cfg['gnn_convolutions'],
            n_att=cfg['gnn_attentional_layers'],
            n_heads=cfg['gnn_attention_heads'],
            in_feat_names=tuple(cfg['in_feat_name']),
            layer_norm=True, self_interaction=True, fused=fused)
        params = jax.jit(gnn.init)(jax.random.key(0), batch.feats,
                                   batch.neighbors, batch.neighbor_mask)

        def loss(p):
            h = gnn.apply(p, batch.feats, batch.neighbors,
                          batch.neighbor_mask, True)
            return jnp.sum(jnp.cos(h))

        vg = jax.jit(jax.value_and_grad(loss))
        key = 'gnn_fwd_bwd_fused_ms' if fused else 'gnn_fwd_bwd_xla_ms'
        res[key] = round(time_it(vg, (params,), args.steps,
                                 lambda o: materialize(o[0])) * 1e3, 2)
    res['gnn_speedup'] = round(
        res['gnn_fwd_bwd_xla_ms'] / res['gnn_fwd_bwd_fused_ms'], 2)

    # --- full training step ---------------------------------------------
    weights = LossWeights(
        energy=jnp.float32(1.0), gradient=jnp.float32(0.8),
        param=jnp.full(batch.num_mols, 1e-3, jnp.float32),
        proper_reg=jnp.float32(1e-3), improper_reg=jnp.float32(1e-3))
    rng = jax.random.key(1, impl='rbg')
    for fused in (False, True):
        scfg = get_default_model_config()
        scfg['fused_gnn'] = fused
        model = make_model(scfg)
        params = jax.jit(model.init)(jax.random.key(0), batch)
        tx = make_optimizer()
        opt_state = tx.init(params)
        step = make_train_step(model, tx, donate=False)
        key = 'step_fused_ms' if fused else 'step_xla_ms'
        res[key] = round(time_it(
            step, (params, opt_state, batch, weights, jnp.float32(1e-4), rng),
            max(5, args.steps // 2), lambda o: materialize(o[2])) * 1e3, 1)
    res['step_speedup'] = round(res['step_xla_ms'] / res['step_fused_ms'], 3)
    print(json.dumps(res, indent=1))


if __name__ == '__main__':
    main()
