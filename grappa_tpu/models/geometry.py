"""Internal-coordinate geometry in JAX: bond lengths, bond angles, dihedrals.

Same mathematical definitions as the reference (reference: src/grappa/models/
internal_coordinates.py:150-210 — distances as L2 norms, angles as
atan2(|r0 x r1|, r0.r1), dihedrals in the atan2 form with the central bond
normalized). Instead of the reference's random coordinate jitter for
degenerate geometries (internal_coordinates.py:194-196), all operations here
are made epsilon-safe deterministically, so gradients are finite for padded /
degenerate inputs and jit stays reproducible.

All functions take stacked coordinates of shape (..., 3) and are fully
batched over leading dims (tuples x conformers).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def safe_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2 norm with finite gradient at zero."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + _EPS)


def distance(x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance between two point sets, shape (...,)."""
    return safe_norm(x0 - x1)


def _safe_atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """atan2 that returns 0 with zero gradient when both args vanish."""
    degenerate = (x * x + y * y) < _EPS
    x_safe = jnp.where(degenerate, 1.0, x)
    y_safe = jnp.where(degenerate, 0.0, y)
    return jnp.arctan2(y_safe, x_safe)


def _vector_angle(r0: jnp.ndarray, r1: jnp.ndarray) -> jnp.ndarray:
    cross = jnp.cross(r0, r1)
    return _safe_atan2(safe_norm(cross), jnp.sum(r0 * r1, axis=-1))


def bond_angle(x0: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Angle at x1 spanned by x0 and x2, in radians (0..pi)."""
    return _vector_angle(x1 - x0, x1 - x2)


def dihedral_angle(x0: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
                   x3: jnp.ndarray) -> jnp.ndarray:
    """Signed dihedral of the 4 points around the x1-x2 axis, in (-pi, pi]."""
    r01 = x1 - x0
    r21 = x1 - x2
    r23 = x3 - x2

    n1 = jnp.cross(r01, r21)
    n2 = jnp.cross(r21, r23)

    rkj_normed = r21 / safe_norm(r21)[..., None]

    y = jnp.sum(jnp.cross(n1, n2) * rkj_normed, axis=-1)
    x = jnp.sum(n1 * n2, axis=-1)
    return _safe_atan2(y, x)
