"""Probe the two measured residual costs of the post-fusion train step.

PERF.md round-4 breakdown attributes the non-matmul remainder of the 45 ms
step to (a) the optimizer update (~4-6 ms for a 40.8M-param Adam whose HBM
bound is ~1.5 ms — the param tree has ~300 small leaves, each its own fused
loop) and (b) the MM-energy/forces machinery (~5.6 ms forward + ~4 ms inside
the double backward, at zero FLOPs — every gathered position tensor is
(T, C, 3) whose minor dim 3 tile-pads to 128, a 42x memory/bandwidth tax on
the whole geometry chain).

This probe measures, on the real chip with honest host-fetch timings:
  1. the current optimizer update vs optax.flatten(chain) (one contiguous
     40.8M-element buffer -> three fused loops, one global-norm reduction)
  2. the current energy_and_gradient vs a component-wise layout prototype
     (positions carried as three (T, C) arrays; cross/dot/norm written per
     component so no (..., 3) tensor ever materializes)
  3. the full train step with both fixes vs baseline
plus value checks (the rewrites are layout changes, not math changes).

Usage: python benchmarks/residual_probe.py [--mols 128] [--confs 32]
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
    ap.add_argument('--mols', type=int, default=128)
    ap.add_argument('--confs', type=int, default=32)
    ap.add_argument('--steps', type=int, default=30)
    args = ap.parse_args()

    from grappa_tpu.utils import enable_compilation_cache, materialize
    enable_compilation_cache()

    import bench
    bench.wait_for_backend()
    bench.N_MOLS, bench.N_CONFS = args.mols, args.confs
    batch, _ = bench.build_batch()

    import jax
    import jax.numpy as jnp
    import optax
    batch = jax.tree.map(jnp.asarray, batch)

    from grappa_tpu.models import mm_energy
    from grappa_tpu.models.grappa_model import (
        get_default_model_config, make_model)
    from grappa_tpu.train.loss import LossWeights, molwise_loss
    from grappa_tpu.train.trainer import make_optimizer, make_train_step

    cfg = get_default_model_config()
    model = make_model(cfg)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    weights = LossWeights(
        energy=jnp.float32(1.0), gradient=jnp.float32(0.8),
        param=jnp.full(batch.num_mols, 1e-3, jnp.float32),
        proper_reg=jnp.float32(1e-3), improper_reg=jnp.float32(1e-3))
    rng = jax.random.key(1, impl='rbg')

    results = {}

    def record(name, fn, fargs, fetch):
        sec = time_it(fn, fargs, args.steps, fetch)
        results[name] = round(sec * 1e3, 2)
        print(f'{name}: {results[name]} ms', flush=True)

    # 0. dispatch calibration
    triv = jax.jit(lambda x: x + 1.0)
    record('dispatch_calibration', triv, (jnp.float32(0.0),), materialize)

    # ---------------- component-wise MM energy prototype ----------------
    EPS = 1e-12

    def v_sub(a, b):
        return (a[0] - b[0], a[1] - b[1], a[2] - b[2])

    def v_dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def v_cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def v_norm(a):
        return jnp.sqrt(v_dot(a, a) + EPS)

    def safe_atan2(y, x):
        degenerate = (x * x + y * y) < EPS
        return jnp.arctan2(jnp.where(degenerate, 0.0, y),
                           jnp.where(degenerate, 1.0, x))

    def gather_pt(xc, idx):
        g = xc[:, idx, :]           # (3, T, C)
        return (g[0], g[1], g[2])

    def cw_tuple_energies(batch, params, xyz):
        xc = jnp.moveaxis(xyz, -1, 0)   # (3, N, C)
        energies = {}
        b = batch.terms['n2'].idxs
        p0, p1 = gather_pt(xc, b[:, 0]), gather_pt(xc, b[:, 1])
        r = v_sub(p0, p1)
        energies['n2'] = mm_energy.harmonic_term_energy(
            params['n2_k'], params['n2_eq'], v_norm(r))
        a = batch.terms['n3'].idxs
        p0, p1, p2 = (gather_pt(xc, a[:, 0]), gather_pt(xc, a[:, 1]),
                      gather_pt(xc, a[:, 2]))
        r0, r1 = v_sub(p1, p0), v_sub(p1, p2)
        cr = v_cross(r0, r1)
        energies['n3'] = mm_energy.harmonic_term_energy(
            params['n3_k'], params['n3_eq'],
            safe_atan2(v_norm(cr), v_dot(r0, r1)))
        for t in ('n4', 'n4_improper'):
            q = batch.terms[t].idxs
            p0, p1, p2, p3 = (gather_pt(xc, q[:, 0]), gather_pt(xc, q[:, 1]),
                              gather_pt(xc, q[:, 2]), gather_pt(xc, q[:, 3]))
            r01, r21, r23 = v_sub(p1, p0), v_sub(p1, p2), v_sub(p3, p2)
            n1, n2 = v_cross(r01, r21), v_cross(r21, r23)
            nrm = v_norm(r21)
            rkj = (r21[0] / nrm, r21[1] / nrm, r21[2] / nrm)
            y = v_dot(v_cross(n1, n2), rkj)
            x = v_dot(n1, n2)
            phi = safe_atan2(y, x)
            energies[t] = mm_energy.torsion_term_energy(
                params[f'{t}_k'], phi, False)
        return {
            t: jnp.where(batch.terms[t].mask[:, None], e, 0.0)
            for t, e in energies.items()
        }

    def cw_energy_and_gradient(batch, params):
        def total_energy(xyz):
            energies = cw_tuple_energies(batch, params, xyz)
            total = jnp.zeros((batch.num_mols, batch.num_confs), xyz.dtype)
            for t, e in energies.items():
                total = total + jax.ops.segment_sum(
                    e, batch.terms[t].mol,
                    num_segments=batch.num_mols + 1)[:batch.num_mols]
            return jnp.sum(total), total

        gradient, energy = jax.grad(total_energy, has_aux=True)(batch.xyz)
        return energy, gradient

    fwd = jax.jit(lambda p, b: model.apply(p, b))
    pred = jax.tree.map(lambda x: x, fwd(params, batch))

    efn = jax.jit(lambda b, p: mm_energy.energy_and_gradient(b, p))
    record('energy_forces_current', efn, (batch, pred),
           lambda out: materialize(out[0]))
    cw_efn = jax.jit(cw_energy_and_gradient)
    record('energy_forces_componentwise', cw_efn, (batch, pred),
           lambda out: materialize(out[0]))

    e0, g0 = efn(batch, pred)
    e1, g1 = cw_efn(batch, pred)
    results['energy_max_abs_diff'] = float(jnp.max(jnp.abs(e0 - e1)))
    results['gradient_max_abs_diff'] = float(jnp.max(jnp.abs(g0 - g1)))
    print('value check:', results['energy_max_abs_diff'],
          results['gradient_max_abs_diff'], flush=True)

    # ---------------- optimizer: tree vs flat ----------------
    tx = make_optimizer()
    flat_tx = optax.flatten(optax.chain(
        optax.clip_by_global_norm(10.0), optax.scale_by_adam(),
        optax.scale(-1.0)))
    lgrad = jax.jit(lambda p: jax.value_and_grad(
        lambda q: molwise_loss(
            batch, model.apply(q, batch, deterministic=False,
                               rngs={'dropout': rng}), weights)[0])(p))
    _, grads = lgrad(params)
    opt_state = tx.init(params)
    flat_state = flat_tx.init(params)

    upd = jax.jit(lambda g, s, p: tx.update(g, s, p))
    record('optimizer_update_tree', upd, (grads, opt_state, params),
           lambda out: materialize(jax.tree.leaves(out[0])[0]))
    fupd = jax.jit(lambda g, s, p: flat_tx.update(g, s, p))
    record('optimizer_update_flat', fupd, (grads, flat_state, params),
           lambda out: materialize(jax.tree.leaves(out[0])[0]))

    u0, _ = upd(grads, opt_state, params)
    u1, _ = fupd(grads, flat_state, params)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), u0, u1)
    results['optimizer_max_abs_diff'] = max(jax.tree.leaves(diffs))
    print('optimizer value check:', results['optimizer_max_abs_diff'],
          flush=True)

    # ---------------- full step: baseline vs both fixes ----------------
    step = make_train_step(model, tx, donate=False)
    record('full_step_baseline', step,
           (params, opt_state, batch, weights, jnp.float32(1e-4), rng),
           lambda out: materialize(out[2]))

    orig = mm_energy.energy_and_gradient
    mm_energy.energy_and_gradient = (
        lambda b, p, offset_torsion=False, use_fused_torsion=False:
        cw_energy_and_gradient(b, p))
    try:
        step2 = make_train_step(model, flat_tx, donate=False)
        record('full_step_fixed', step2,
               (params, flat_state, batch, weights, jnp.float32(1e-4), rng),
               lambda out: materialize(out[2]))
    finally:
        mm_energy.energy_and_gradient = orig

    print(json.dumps({'workload': f'{args.mols}x{args.confs}',
                      'results': results}, indent=1))


if __name__ == '__main__':
    main()
