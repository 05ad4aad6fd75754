"""Kill-or-keep measurement for whole-graph (geometry+energy+force) fusion.

Question (PERF.md round-2 backlog): would a hand-fused Pallas path for the
MM energy/force computation move the macromolecule-scale training step, or
does XLA's own fusion already win?  This script produces the deciding
numbers on one chip at protein scale (default 12k and 40k atoms):

  * `forward`            — GNN + tuple heads (parameter prediction)
  * `energy_forces_xla`  — energy + dE/dx from fixed parameters, plain XLA
  * `energy_forces_pallas` — same with the validated fused Pallas torsion
    kernel (ops/torsion_kernel.py) covering the dominant tuple term
  * `full_step`          — assembled training step (grad-of-grad)

and reports each stage's share of the step.  The decision rule: if the
energy/force stage is a small share of the step AND the Pallas variant is
not materially faster than XLA, whole-graph fusion cannot pay — record
KILL; otherwise the kernel is worth building — record KEEP.

All timings end in a host fetch of a data-dependent value (PERF.md
round-2 measurement correction).

Usage: python benchmarks/fusion_decision.py [--atoms 12000 40000] [--confs 4]
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


def run_scale(n_atoms, n_confs, n_steps):
    import jax
    import jax.numpy as jnp
    from grappa_tpu.data import MolGraph, collate
    from grappa_tpu.data.synthetic import make_moldata
    from grappa_tpu.models import mm_energy
    from grappa_tpu.models.grappa_model import (get_default_model_config,
                                                make_model)
    from grappa_tpu.train.loss import LossWeights, molwise_loss
    from grappa_tpu.train.trainer import make_optimizer, make_train_step
    from grappa_tpu.utils import materialize

    md = make_moldata(seed=0, n_confs=n_confs, n_atoms=n_atoms)
    batch = collate([MolGraph.from_moldata(md)])

    cfg = get_default_model_config()
    cfg['remat'] = n_atoms > 20000
    model = make_model(cfg)
    params = jax.jit(model.init)(jax.random.key(0), batch)

    res = {'n_atoms': n_atoms, 'n_confs': n_confs,
           'n_propers': int((batch.terms['n4'].mask).sum()),
           'remat': cfg['remat']}

    fwd = jax.jit(lambda p, b: model.apply(p, b))
    res['forward_ms'] = round(time_it(
        fwd, (params, batch), n_steps,
        lambda o: materialize(o['n2_k'])) * 1e3, 1)
    pred = fwd(params, batch)

    e_xla = jax.jit(lambda b, p: mm_energy.energy_and_gradient(b, p))
    res['energy_forces_xla_ms'] = round(time_it(
        e_xla, (batch, pred), n_steps, lambda o: materialize(o[0])) * 1e3, 1)

    e_pal = jax.jit(lambda b, p: mm_energy.energy_and_gradient(
        b, p, use_fused_torsion=True))
    try:
        res['energy_forces_pallas_ms'] = round(time_it(
            e_pal, (batch, pred), n_steps,
            lambda o: materialize(o[0])) * 1e3, 1)
    except Exception as exc:   # CPU backend: no Mosaic
        res['energy_forces_pallas_ms'] = None
        res['pallas_error'] = f'{type(exc).__name__}'

    weights = LossWeights(
        energy=jnp.float32(1.0), gradient=jnp.float32(0.8),
        param=jnp.full(batch.num_mols, 1e-3, jnp.float32),
        proper_reg=jnp.float32(1e-3), improper_reg=jnp.float32(1e-3))
    rng = jax.random.key(1, impl='rbg')

    # grad-of-grad through the energy path alone (the part fusion targets):
    # loss on energy+gradient from FIXED predicted params
    def energy_loss(p):
        out = model.apply(p, batch)
        return molwise_loss(batch, out, weights)
    lgrad = jax.jit(lambda p: jax.value_and_grad(
        lambda q: energy_loss(q)[0])(p))
    res['loss_value_and_grad_ms'] = round(time_it(
        lgrad, (params,), max(3, n_steps // 3),
        lambda o: materialize(o[0])) * 1e3, 1)

    tx = make_optimizer()
    opt_state = tx.init(params)
    step = make_train_step(model, tx, donate=False)
    res['full_step_ms'] = round(time_it(
        step, (params, opt_state, batch, weights, jnp.float32(1e-4), rng),
        max(3, n_steps // 3), lambda o: materialize(o[2])) * 1e3, 1)

    res['energy_share_of_step'] = round(
        res['energy_forces_xla_ms'] / res['full_step_ms'], 3)
    if res['energy_forces_pallas_ms']:
        res['pallas_speedup'] = round(
            res['energy_forces_xla_ms'] / res['energy_forces_pallas_ms'], 2)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--atoms', type=int, nargs='+', default=[12000, 40000])
    ap.add_argument('--confs', type=int, default=4)
    ap.add_argument('--steps', type=int, default=10)
    args = ap.parse_args()

    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    scales = [run_scale(n, args.confs, args.steps) for n in args.atoms]
    # decision rule (see module docstring)
    max_share = max(s['energy_share_of_step'] for s in scales)
    speedups = [s.get('pallas_speedup') for s in scales
                if s.get('pallas_speedup')]
    keep = max_share > 0.25 and speedups and max(speedups) > 1.3
    print(json.dumps({
        'scales': scales,
        'max_energy_share_of_step': max_share,
        'pallas_torsion_speedups': speedups,
        'decision': 'KEEP — build the full fused energy/force kernel'
                    if keep else
                    'KILL — energy/force stage cannot pay for fusion',
    }, indent=1))


if __name__ == '__main__':
    main()
