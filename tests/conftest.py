"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must run before any test imports create a JAX backend. The axon TPU plugin
registers itself in sitecustomize, so we switch platforms via jax.config
(env vars are captured too early to help).
"""
import os

os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
