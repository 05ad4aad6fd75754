"""Fused torsion kernel: forward/gradient/double-gradient parity with the
XLA reference path (interpret mode on CPU; the real pallas path runs on TPU
via benchmarks/kernel_bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grappa_tpu.models import geometry, mm_energy
from grappa_tpu.ops.torsion_kernel import (
    gather_torsion_positions, torsion_energy_fused)


def make_inputs(seed=0, t=37, c=5, n_atoms=30, n_per=6):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(0, 2.0, size=(n_atoms, c, 3)).astype(np.float32)
    idxs = np.stack([rng.choice(n_atoms, size=4, replace=False)
                     for _ in range(t)]).astype(np.int32)
    k = rng.normal(0, 0.5, size=(t, n_per)).astype(np.float32)
    return jnp.asarray(xyz), jnp.asarray(idxs), jnp.asarray(k)


def reference_energy(xyz, idxs, k):
    phi = geometry.dihedral_angle(
        xyz[idxs[:, 0]], xyz[idxs[:, 1]], xyz[idxs[:, 2]], xyz[idxs[:, 3]])
    return mm_energy.torsion_term_energy(k, phi, offset=False)


def test_forward_parity():
    xyz, idxs, k = make_inputs()
    pos = gather_torsion_positions(xyz, idxs)
    ours = torsion_energy_fused(pos, k, True)
    ref = reference_energy(xyz, idxs, k)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradient_parity():
    """d(total energy)/d(xyz) and /d(k) match the autodiff reference."""
    xyz, idxs, k = make_inputs(seed=1)

    def ours(xyz, k):
        pos = gather_torsion_positions(xyz, idxs)
        return torsion_energy_fused(pos, k, True).sum()

    def ref(xyz, k):
        return reference_energy(xyz, idxs, k).sum()

    g_ours = jax.grad(ours, argnums=(0, 1))(xyz, k)
    g_ref = jax.grad(ref, argnums=(0, 1))(xyz, k)
    np.testing.assert_allclose(np.asarray(g_ours[0]), np.asarray(g_ref[0]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_ours[1]), np.asarray(g_ref[1]),
                               rtol=1e-4, atol=1e-5)


def test_double_gradient_parity():
    """Training differentiates the force loss w.r.t. k: grad-of-grad must
    flow through the custom VJP and match the reference."""
    xyz, idxs, k = make_inputs(seed=2, t=11, c=3)
    target = jnp.ones_like(xyz)

    def force_loss_ours(k):
        def total(xyz):
            pos = gather_torsion_positions(xyz, idxs)
            return torsion_energy_fused(pos, k, True).sum()
        force = jax.grad(total)(xyz)
        return jnp.mean((force - target) ** 2)

    def force_loss_ref(k):
        def total(xyz):
            return reference_energy(xyz, idxs, k).sum()
        force = jax.grad(total)(xyz)
        return jnp.mean((force - target) ** 2)

    g_ours = jax.grad(force_loss_ours)(k)
    g_ref = jax.grad(force_loss_ref)(k)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-5)


def test_degenerate_positions_finite():
    xyz = jnp.zeros((8, 4, 3))
    idxs = jnp.array([[0, 1, 2, 3]], dtype=jnp.int32)
    k = jnp.ones((1, 6))
    pos = gather_torsion_positions(xyz, idxs)
    e = torsion_energy_fused(pos, k, True)
    g = jax.grad(lambda p: torsion_energy_fused(p, k, True).sum())(pos)
    assert np.isfinite(np.asarray(e)).all()
    assert np.isfinite(np.asarray(g)).all()
