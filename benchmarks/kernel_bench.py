"""Pallas fused-torsion-kernel benchmark + TPU-mode correctness check.

Compares the fused kernel vs the XLA reference path for the torsion-energy
evaluation (forward and with forces) at MD-like sizes, on the real chip.

Run: python benchmarks/kernel_bench.py
"""
import json
import time

import numpy as np


def main():
    from grappa_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from grappa_tpu.models import geometry, mm_energy
    from grappa_tpu.ops.torsion_kernel import (
        gather_torsion_positions, torsion_energy_fused)

    rng = np.random.default_rng(0)
    for t, c in ((4096, 32), (16384, 128)):
        n_atoms = max(64, t // 8)
        xyz = jnp.asarray(rng.normal(0, 2, (n_atoms, c, 3)).astype(np.float32))
        idxs = jnp.asarray(np.stack([
            rng.choice(n_atoms, 4, replace=False) for _ in range(t)
        ]).astype(np.int32))
        k = jnp.asarray(rng.normal(0, 0.5, (t, 6)).astype(np.float32))

        @jax.jit
        def fused(xyz, k):
            pos = gather_torsion_positions(xyz, idxs)
            return torsion_energy_fused(pos, k)

        @jax.jit
        def reference(xyz, k):
            phi = geometry.dihedral_angle(xyz[idxs[:, 0]], xyz[idxs[:, 1]],
                                          xyz[idxs[:, 2]], xyz[idxs[:, 3]])
            return mm_energy.torsion_term_energy(k, phi)

        e_fused = jax.block_until_ready(fused(xyz, k))
        e_ref = jax.block_until_ready(reference(xyz, k))
        err = float(jnp.abs(e_fused - e_ref).max())

        def bench(fn, *args, n=50):
            from grappa_tpu.utils import materialize
            materialize(fn(*args))
            t0 = time.time()
            for _ in range(n):
                out = fn(*args)
            # host fetch forces execution; TPU stream is in-order so all n
            # dispatches have run when the last result arrives
            materialize(out)
            return (time.time() - t0) / n * 1e6  # us

        us_fused = bench(fused, xyz, k)
        us_ref = bench(reference, xyz, k)

        # force path
        @jax.jit
        def force_fused(xyz, k):
            return jax.grad(lambda x: fused(x, k).sum())(xyz)

        @jax.jit
        def force_ref(xyz, k):
            return jax.grad(lambda x: reference(x, k).sum())(xyz)

        gf = jax.block_until_ready(force_fused(xyz, k))
        gr = jax.block_until_ready(force_ref(xyz, k))
        gerr = float(jnp.abs(gf - gr).max())
        us_ffused = bench(force_fused, xyz, k)
        us_fref = bench(force_ref, xyz, k)

        print(json.dumps({
            'tuples': t, 'confs': c,
            'fwd_max_err': err, 'force_max_err': gerr,
            'fwd_us': {'fused': round(us_fused, 1), 'xla': round(us_ref, 1)},
            'force_us': {'fused': round(us_ffused, 1),
                         'xla': round(us_fref, 1)},
        }))


if __name__ == '__main__':
    main()
