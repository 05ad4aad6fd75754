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
