"""Fused Symmetriser (Pallas TPU, forward + custom_vjp backward).

The Symmetriser (models/heads.py, reference perm_equiv_transformer.py:
194-319) applies a shared FeedForward stack to every symmetry-permuted copy
of the flattened tuple features and sums the results. In XLA this
materializes the permuted stack (T, n_perm, S*F) — up to ~270 MB for the
proper-torsion head at bench scale — plus an LN/matmul boundary tensor per
MLP layer. This op does the whole thing in one kernel per (S, T, F) tile:
the permuted flattenings are formed in VMEM from the same x planes the
fused transformer block already produces, the MLP stack (pre-LN, elu, skip
on middle layers — exactly models/layers.py FeedForward) runs in VMEM, and
only the (T, out) result is written. Backward recomputes per tile and
accumulates weight gradients across the sequential grid (residual = x only).

No dropout anywhere (the Symmetriser is dropout-free by construction:
dropout would break permutation invariance — reference docstring), so the
kernel is fully deterministic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grappa_tpu.ops.fused_block import (
    _dot, _dot_nt, _dot_tn, _elu, _elu_grad, _ln_bwd, _ln_fwd,
    _pad_t, flatten_params as _flatten, unflatten_grads as _unflatten)

# tests flip this to run the kernels in the Pallas interpreter (CPU)
INTERPRET = False


def _layer_paths(n_layers):
    out = []
    for i in range(n_layers):
        for mod, leaves in (('norm', ('scale', 'bias')),
                            ('linear1', ('kernel', 'bias')),
                            ('linear2', ('kernel', 'bias'))):
            for leaf in leaves:
                out.append((f'mlp_{i}', mod, leaf))
    return out


def flatten_params(tree, n_layers):
    return _flatten(tree, _layer_paths(n_layers))


def unflatten_grads(flat, n_layers):
    return _unflatten(flat, _layer_paths(n_layers))


def _skip_flags(n_layers):
    # models/heads.py Symmetriser: mlp_0 no skip; middle layers skip; last no
    return [i not in (0, n_layers - 1) and n_layers > 1
            for i in range(n_layers)]


def _ff_chain_fwd(h, layer_params, skips, mm_dtype):
    """FeedForward stack forward; returns output + per-layer residual pack."""
    packs = []
    for (g, b, w1, c1, w2, c2), skip in zip(layer_params, skips):
        hn, xhat, inv = _ln_fwd(h, g, b)
        a = _dot(hn, w1, mm_dtype) + c1
        e = _elu(a)
        o = _dot(e, w2, mm_dtype) + c2
        # NB: the skip adds the *normalized* input (layers.py FeedForward
        # reassigns x to the LN output before the skip)
        out = o + hn if skip else o
        packs.append((xhat, inv, a, e, hn))
        h = out
    return h, packs


def _ff_chain_bwd(dy, packs, layer_params, skips, mm_dtype):
    """Backward through the stack; returns dx and per-layer grad tuples."""
    grads = [None] * len(layer_params)
    for i in range(len(layer_params) - 1, -1, -1):
        g, b, w1, c1, w2, c2 = layer_params[i]
        xhat, inv, a, e, hn = packs[i]
        do = dy
        dw2 = _dot_tn(e, do, mm_dtype)
        dc2 = jnp.sum(do, axis=0, keepdims=True)
        de = _dot_nt(do, w2, mm_dtype)
        da = de * _elu_grad(a)
        dw1 = _dot_tn(hn, da, mm_dtype)
        dc1 = jnp.sum(da, axis=0, keepdims=True)
        dhn = _dot_nt(da, w1, mm_dtype)
        if skips[i]:
            dhn = dhn + dy
        dx, dg, db = _ln_bwd(dhn, xhat, inv, g)
        grads[i] = (dg, db, dw1, dc1, dw2, dc2)
        dy = dx
    return dy, grads


def _fwd_kernel(x_ref, *refs, perms, n_layers, mm_dtype):
    *param_refs, out_ref = refs
    s, tt, f = x_ref.shape
    planes = [x_ref[i] for i in range(s)]
    params = [tuple(p[:] for p in param_refs[i * 6:(i + 1) * 6])
              for i in range(n_layers)]
    skips = _skip_flags(n_layers)
    acc = None
    for perm in perms:
        flat = jnp.concatenate([planes[j] for j in perm], axis=1)
        y, _ = _ff_chain_fwd(flat, params, skips, mm_dtype)
        acc = y if acc is None else acc + y
    out_ref[:] = acc


def _bwd_kernel(x_ref, dy_ref, *refs, perms, n_layers, mm_dtype):
    param_refs = refs[:n_layers * 6]
    dx_ref = refs[n_layers * 6]
    grad_refs = refs[n_layers * 6 + 1:]
    s, tt, f = x_ref.shape
    planes = [x_ref[i] for i in range(s)]
    dy = dy_ref[:]
    params = [tuple(p[:] for p in param_refs[i * 6:(i + 1) * 6])
              for i in range(n_layers)]
    skips = _skip_flags(n_layers)
    dplanes = [jnp.zeros_like(planes[0]) for _ in range(s)]
    grad_acc = None
    for perm in perms:
        flat = jnp.concatenate([planes[j] for j in perm], axis=1)
        _, packs = _ff_chain_fwd(flat, params, skips, mm_dtype)
        dflat, grads = _ff_chain_bwd(dy, packs, params, skips, mm_dtype)
        for pos, j in enumerate(perm):
            dplanes[j] = dplanes[j] + dflat[:, pos * f:(pos + 1) * f]
        flat_grads = [g for layer in grads for g in layer]
        grad_acc = (flat_grads if grad_acc is None
                    else [a + g for a, g in zip(grad_acc, flat_grads)])
    dx_ref[:] = jnp.stack(dplanes, axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref, g in zip(grad_refs, grad_acc):
            ref[:] = g

    @pl.when(pl.program_id(0) != 0)
    def _():
        for ref, g in zip(grad_refs, grad_acc):
            ref[:] = ref[:] + g


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_symmetriser(x, params, permutations, n_layers, mm_dtype=None,
                      block_t=256):
    """Symmetriser on x (S, T, F) -> (T, out_feats).

    params: the flax Symmetriser param tree ({'mlp_0': {...}, ...});
    permutations: tuple of index tuples (static).
    """
    y, _ = _fwd(x, params, permutations, n_layers, mm_dtype, block_t)
    return y


def _out_feats(params, n_layers):
    # shape access only — params may be tracers under jit
    return int(params[f'mlp_{n_layers - 1}']['linear2']['bias'].shape[-1])


def _fwd(x, params, permutations, n_layers, mm_dtype, block_t):
    s, _, f = x.shape
    x_p, t = _pad_t(x, block_t)
    t_pad = x_p.shape[1]
    flat = flatten_params(params, n_layers)
    out_f = _out_feats(params, n_layers)
    kernel = functools.partial(_fwd_kernel, perms=permutations,
                               n_layers=n_layers, mm_dtype=mm_dtype)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    y = pl.pallas_call(
        kernel,
        grid=(t_pad // block_t,),
        in_specs=([pl.BlockSpec((s, block_t, f), lambda i: (0, i, 0))]
                  + [whole(w.shape) for w in flat]),
        out_specs=pl.BlockSpec((block_t, out_f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, out_f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(x_p, *flat)
    return y[:t], (x, params)


def _bwd(permutations, n_layers, mm_dtype, block_t, res, dy):
    x, params = res
    s, _, f = x.shape
    x_p, t = _pad_t(x, block_t)
    t_pad = x_p.shape[1]
    out_f = _out_feats(params, n_layers)
    dy_p = jnp.pad(dy.astype(jnp.float32), ((0, t_pad - t), (0, 0)))
    flat = flatten_params(params, n_layers)
    kernel = functools.partial(_bwd_kernel, perms=permutations,
                               n_layers=n_layers, mm_dtype=mm_dtype)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(t_pad // block_t,),
        in_specs=([pl.BlockSpec((s, block_t, f), lambda i: (0, i, 0)),
                   pl.BlockSpec((block_t, out_f), lambda i: (i, 0))]
                  + [whole(w.shape) for w in flat]),
        out_specs=([pl.BlockSpec((s, block_t, f), lambda i: (0, i, 0))]
                   + [whole(w.shape) for w in flat]),
        out_shape=([jax.ShapeDtypeStruct((s, t_pad, f), jnp.float32)]
                   + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                      for w in flat]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(x_p, dy_p, *flat)
    dx = outs[0][:, :t]
    dparams = unflatten_grads(tuple(outs[1:]), n_layers)
    return dx, dparams


fused_symmetriser.defvjp(_fwd, _bwd)
