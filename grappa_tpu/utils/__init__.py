"""Runtime utilities."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = None):
    """Enable JAX's persistent compilation cache so repeated runs skip XLA
    compiles (first compiles through the tunnel take ~10s-3min each)."""
    import jax
    path = path or os.environ.get('GRAPPA_TPU_COMPILE_CACHE',
                                  os.path.expanduser('~/.cache/grappa_tpu/xla'))
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def materialize(tree):
    """Fetch a pytree to host, FORCING execution of all pending work.

    Timing caveat on the tunneled axon TPU backend: jax.block_until_ready
    can return before the work has actually executed (observed: chained
    8192^3 matmuls "finishing" in 16us). Any wall-clock measurement must end
    with a host fetch of a value that data-depends on the measured work —
    this helper. (device_get of one output whose inputs chain through all
    steps is enough.)"""
    import jax
    return jax.device_get(tree)
