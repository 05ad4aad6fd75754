"""Pallas TPU kernel: fused dihedral + periodic-torsion energy.

The torsion terms dominate the tuple count of the MM energy (propers +
3x-redundant impropers), and the XLA path materializes the dihedral-angle
intermediates (cross products, norms, atan2 inputs) between the geometry and
the Fourier series. This kernel fuses the whole chain

    gathered positions (T, 4, 3, C) -> dihedral phi -> sum_n k_n cos(n*phi)

into one VMEM pass per (tuple-tile, conformer-block): a single HBM read of
the positions and a single write of per-tuple energies, everything else in
registers/VMEM on the VPU.

The backward pass runs the jnp reference math through jax.vjp (one fused
XLA program) via custom_vjp, and is itself differentiable, so the training
loss can differentiate *through* the force (grad-of-grad) exactly like the
reference XLA path. Forward/backward parity with models.mm_energy is tested
to float32 tolerance, including second derivatives.

Layout: T padded to a multiple of 8 (sublanes), C padded to a multiple of
128 (lanes). Masked/padded tuples must carry zeroed k rows.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from grappa_tpu.models import geometry

_EPS = 1e-12


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    from grappa_tpu.ops.fused_block import _pad_to as _shared
    return _shared(x, axis, mult)


def _torsion_tile_kernel(pos_ref, k_ref, energy_ref, *, n_per: int):
    """One (TILE_T, C) tile: pos (TILE_T, 4, 3, C), k (TILE_T, n_per).

    Trig-free: sum_n k_n cos(n*phi) needs only cos(phi) = x / sqrt(x^2+y^2)
    (x = n1.n2, y the signed cross term), and cos(n*phi) follows from the
    Chebyshev recurrence cos((n+1)p) = 2 cos(p) cos(np) - cos((n-1)p) —
    pure VPU arithmetic, no atan2/cos (which Mosaic doesn't lower anyway).
    """
    def comp(atom, d):
        return pos_ref[atom * 3 + d]

    # displacement vectors r01 = x1-x0, r21 = x1-x2, r23 = x3-x2
    r01 = [comp(1, d) - comp(0, d) for d in range(3)]
    r21 = [comp(1, d) - comp(2, d) for d in range(3)]
    r23 = [comp(3, d) - comp(2, d) for d in range(3)]

    def cross(a, b):
        return [a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0]]

    n1 = cross(r01, r21)
    n2 = cross(r21, r23)

    norm21 = jnp.sqrt(r21[0] ** 2 + r21[1] ** 2 + r21[2] ** 2 + _EPS)
    m = cross(n1, n2)
    y = (m[0] * r21[0] + m[1] * r21[1] + m[2] * r21[2]) / norm21
    x = n1[0] * n2[0] + n1[1] * n2[1] + n1[2] * n2[2]
    r2 = x * x + y * y
    degenerate = r2 < _EPS
    cos_phi = jnp.where(degenerate, 1.0,
                        x * jax.lax.rsqrt(jnp.where(degenerate, 1.0, r2)))

    # Chebyshev recurrence over periodicities
    c_prev = jnp.ones_like(cos_phi)              # cos(0*phi)
    c_cur = cos_phi                              # cos(1*phi)
    energy = k_ref[:, 0][:, None] * c_cur
    for n in range(2, n_per + 1):
        c_next = 2.0 * cos_phi * c_cur - c_prev
        c_prev, c_cur = c_cur, c_next
        energy = energy + k_ref[:, n - 1][:, None] * c_cur
    energy_ref[:] = energy


def _forward_pallas(pos: jnp.ndarray, k: jnp.ndarray,
                    tile_t: int = 256) -> jnp.ndarray:
    """pos (T, 4, 3, C) f32, k (T, P) -> energy (T, C) via pallas.

    Internally the positions are laid out (12, T, C) so Mosaic tiles only the
    trailing (T, C) dims (a (T, 4, 3, C) block would pad the inner dims to
    full sublane/lane tiles and blow the VMEM budget).

    The conformer axis is NOT blocked — each grid step loads the full padded
    C into VMEM (12*tile_t*C*4 bytes, ~16 MB at C~1300 under the raised
    100 MB limit below). Fine for training/benchmark conf counts (<=512);
    block C before using this kernel on thousands of conformers.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_orig, _, _, c_orig = pos.shape
    n_per = k.shape[1]
    # (T, 4, 3, C) -> (12, T, C)
    pos = jnp.transpose(pos, (1, 2, 0, 3)).reshape(12, t_orig, c_orig)
    pos = _pad_to(_pad_to(pos, 1, tile_t), 2, 128)
    k = _pad_to(k, 0, tile_t)
    _, t_pad, c_pad = pos.shape

    grid = (t_pad // tile_t,)
    energy = pl.pallas_call(
        functools.partial(_torsion_tile_kernel, n_per=n_per),
        out_shape=jax.ShapeDtypeStruct((t_pad, c_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((12, tile_t, c_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, n_per), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, c_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(pos.astype(jnp.float32), k.astype(jnp.float32))
    return energy[:t_orig, :c_orig]


def _energy_jnp(pos: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Reference jnp implementation of the fused computation (same math as
    the pallas kernel, used for the backward pass and interpret mode)."""
    phi = geometry.dihedral_angle(
        jnp.moveaxis(pos[:, 0], 1, -1), jnp.moveaxis(pos[:, 1], 1, -1),
        jnp.moveaxis(pos[:, 2], 1, -1), jnp.moveaxis(pos[:, 3], 1, -1))
    n_per = k.shape[1]
    ns = jnp.arange(1, n_per + 1, dtype=phi.dtype)
    return (k[:, :, None] * jnp.cos(ns[None, :, None] * phi[:, None, :])
            ).sum(axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def torsion_energy_fused(pos: jnp.ndarray, k: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused torsion energy: pos (T, 4, 3, C), signed k (T, P) -> (T, C).

    Equivalent to geometry.dihedral_angle + mm_energy.torsion_term_energy
    (offset=False). `interpret=True` skips pallas (plain jnp, for CPU)."""
    if interpret:
        return _energy_jnp(pos, k)
    return _forward_pallas(pos, k)


def _fwd(pos, k, interpret):
    energy = torsion_energy_fused(pos, k, interpret)
    return energy, (pos, k)


def _bwd(interpret, residuals, g):
    """Backward through the jnp reference math (one fused XLA program);
    itself differentiable, so force-loss grad-of-grad flows through."""
    pos, k = residuals
    _, vjp = jax.vjp(_energy_jnp, pos, k)
    return vjp(g)


torsion_energy_fused.defvjp(_fwd, _bwd)


def gather_torsion_positions(xyz: jnp.ndarray, idxs: jnp.ndarray
                             ) -> jnp.ndarray:
    """xyz (N, C, 3), idxs (T, 4) -> pos (T, 4, 3, C) in kernel layout."""
    gathered = xyz[idxs]                     # (T, 4, C, 3)
    return jnp.transpose(gathered, (0, 1, 3, 2))
