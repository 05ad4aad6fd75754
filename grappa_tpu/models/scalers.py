"""Output scaling layers mapping N(0,1)-ish network outputs onto the
empirical distribution of MM parameters.

Same functional forms as the reference (reference: src/grappa/models/
final_layer.py:11-97 and network_utils.py:136-145):
  to_positive(x)  = std * (elu(mean/std + x - 1) + 1) + min      -> (min, inf)
  to_range(x)     = max * sigmoid(std/max * x)                   -> (0, max)
  hard_cutoff(x)  = x if |x| > cutoff else 0
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def to_positive(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray,
                min_: float = 0.0) -> jnp.ndarray:
    return std * (nn.elu(mean / std + x - 1.0) + 1.0) + min_


def to_range(x: jnp.ndarray, max_: float, std: jnp.ndarray) -> jnp.ndarray:
    return max_ * nn.sigmoid(std / max_ * x)


def hard_cutoff(x: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    return jnp.where(jnp.abs(x) > cutoff, x, jnp.zeros_like(x))


def sigmoid_gate(x: jnp.ndarray) -> jnp.ndarray:
    """Gate in (0, 2) with value ~1 + x for small x (used by harmonic_gate)."""
    return 2.0 * nn.sigmoid(2.0 * x)
