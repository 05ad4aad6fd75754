"""Fused GNN residual-attention block (Pallas TPU, forward + custom_vjp).

After the tuple heads were fused (ops/fused_block.py), the GNN stack is the
training step's remaining time sink: each ResidualAttentionBlock
(models/gnn.py:65-101, DGL DotGatConv semantics — reference
src/grappa/models/graph_attention.py:188-415) bounces (N, F)-class tensors
through HBM at every LN / score / softmax / reduce / FF boundary, and the
neighbor-attention middle works on tiny axes (D<=8 neighbor slots, H=16
heads) that XLA tiles poorly.

This op fuses everything AFTER the neighbor gather into one kernel:

    scores -> masked softmax over neighbor slots -> weighted message sum
    -> head_reducer -> dropout -> residual(+LN input) -> interaction LN
    -> FF(4F, elu) -> elu -> dropout -> residual

The pre-LN and the fc projection stay in XLA (they fuse into one matmul
there), because the gather `feat[neighbors]` must materialize `feat`
anyway; the gather's transpose (scatter-add of dnbr) also stays in XLA.

Design notes (mirrors ops/fused_block.py; see
/opt/skills/guides/pallas_guide.md):
  * neighbor features ride a (D, N, F) layout so every VMEM tile is a clean
    (block_n, F) 2D plane; attention over the D axis is unrolled into D
    score planes (block_n, H) computed as (feat * nbr_d) @ R with R the
    per-head lane-reduction matrix — no (N, D, H) tensor is ever
    materialized.
  * the backward kernel recomputes the forward per tile (only the kernel
    INPUTS are saved), returns dfeat / dnbr / dhn and accumulates weight
    gradients across the grid.
  * dropout uses the in-kernel TPU PRNG seeded per (step, grid tile); the
    backward replays the identical mask sequence (same scheme as the fused
    head block, validated on-chip by benchmarks/fused_dropout_check.py).

Math matches models/gnn.py ResidualAttentionBlock minus the leading
LN+fc (allclose-tested against the flax module in tests/test_fused_ops.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grappa_tpu.ops.fused_block import (_dot, _dot_nt, _dot_tn,
                                        _dropout_mask, _elu, _elu_grad,
                                        _ln_bwd, _ln_fwd, _pad_to,
                                        _reduce_matrix,
                                        flatten_params as _flatten,
                                        unflatten_grads as _unflatten)

# tests flip this to run the kernels in the Pallas interpreter (CPU)
INTERPRET = False

_NEG = np.float32(-1e30)

# flax ResidualAttentionBlock leaves consumed by the kernel, in order
PARAM_ORDER = (
    ('head_reducer', 'kernel'), ('head_reducer', 'bias'),
    ('interaction_norm', 'scale'), ('interaction_norm', 'bias'),
    ('si_dense1', 'kernel'), ('si_dense1', 'bias'),
    ('si_dense2', 'kernel'), ('si_dense2', 'bias'),
)


def flatten_params(tree):
    return _flatten(tree, PARAM_ORDER)


def unflatten_grads(flat):
    return _unflatten(flat, PARAM_ORDER)




def _attention(feat, nbrs, masks, reduce_r, dh):
    """Masked softmax attention over the unrolled neighbor-slot planes.

    feat: (bn, F); nbrs/masks: lists of D (bn, F) / (bn, 1) planes.
    The R-matrix score reductions stay f32 like the head kernel (mm_dtype
    applies only to the dense matmuls outside this function).
    Returns (attn0 (bn, F), alpha planes) for reuse in the backward.
    """
    scale = np.float32(1.0 / np.sqrt(dh))
    d = len(nbrs)
    scores = [jnp.where(masks[i] > 0,
                        _dot(feat * nbrs[i], reduce_r, None) * scale,
                        _NEG)
              for i in range(d)]                          # (bn, H) each
    m = scores[0]
    for i in range(1, d):
        m = jnp.maximum(m, scores[i])
    # masked_softmax semantics (models/layers.py:27-35): masked slots are
    # excluded from the denominator and all-masked rows (padding atoms,
    # isolated ions) produce ZERO attention output, not a uniform average
    exps = [jnp.exp(scores[i] - m) * masks[i] for i in range(d)]
    denom = exps[0]
    for i in range(1, d):
        denom = denom + exps[i]
    denom = jnp.maximum(denom, np.float32(1e-9))
    alphas = [e / denom for e in exps]
    attn0 = _dot_nt(alphas[0], reduce_r, None) * nbrs[0]
    for i in range(1, d):
        attn0 = attn0 + _dot_nt(alphas[i], reduce_r, None) * nbrs[i]
    return attn0, alphas


def _forward_body(feat, nbr, hn, mask, params, reduce_r, *, n_heads, rate,
                  deterministic, mm_dtype):
    (wr, br, g2, b2, w1, c1, w2, c2) = params
    f = feat.shape[-1]
    d = nbr.shape[0]
    nbrs = [nbr[i] for i in range(d)]
    masks = [mask[i][:, None] for i in range(d)]
    attn0, alphas = _attention(feat, nbrs, masks, reduce_r, f // n_heads)
    a1 = _dot(attn0, wr, mm_dtype) + br
    if not deterministic:
        mask1 = _dropout_mask(a1.shape, rate)
        a1 = a1 * mask1
    else:
        mask1 = None
    x1 = a1 + hn
    x1n, xhat2, inv2 = _ln_fwd(x1, g2, b2)
    t1 = _dot(x1n, w1, mm_dtype) + c1
    e1 = _elu(t1)
    t2 = _dot(e1, w2, mm_dtype) + c2
    e2 = _elu(t2)
    if not deterministic:
        mask2 = _dropout_mask(e2.shape, rate)
        e2 = e2 * mask2
    else:
        mask2 = None
    y = e2 + x1n
    pack = dict(nbrs=nbrs, alphas=alphas, attn0=attn0, mask1=mask1,
                x1n=x1n, xhat2=xhat2, inv2=inv2, t1=t1, e1=e1, t2=t2,
                mask2=mask2)
    return y, pack


def _fwd_kernel(seed_ref, feat_ref, nbr_ref, hn_ref, mask_ref, *refs,
                n_heads, rate, deterministic, mm_dtype):
    *param_refs, r_ref, y_ref = refs
    if not deterministic:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    params = [p[:] for p in param_refs]
    y, _ = _forward_body(feat_ref[:], nbr_ref[:], hn_ref[:], mask_ref[:],
                         params, r_ref[:], n_heads=n_heads, rate=rate,
                         deterministic=deterministic, mm_dtype=mm_dtype)
    y_ref[:] = y


def _bwd_kernel(seed_ref, feat_ref, nbr_ref, hn_ref, mask_ref, dy_ref,
                *refs, n_heads, rate, deterministic, mm_dtype):
    (*param_refs, r_ref,
     dfeat_ref, dnbr_ref, dhn_ref,
     dwr_ref, dbr_ref, dg2_ref, db2_ref,
     dw1_ref, dc1_ref, dw2_ref, dc2_ref) = refs
    grad_refs = (dwr_ref, dbr_ref, dg2_ref, db2_ref, dw1_ref, dc1_ref,
                 dw2_ref, dc2_ref)
    if not deterministic:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    feat = feat_ref[:]
    nbr = nbr_ref[:]
    d, bn, f = nbr.shape
    dh = f // n_heads
    scale = np.float32(1.0 / np.sqrt(dh))
    params = [p[:] for p in param_refs]
    (wr, br, g2, b2, w1, c1, w2, c2) = params
    reduce_r = r_ref[:]
    dy = dy_ref[:]

    _, pk = _forward_body(feat, nbr, hn_ref[:], mask_ref[:], params,
                          reduce_r, n_heads=n_heads, rate=rate,
                          deterministic=deterministic, mm_dtype=mm_dtype)

    # y = e2*mask2 + x1n
    de2 = dy if deterministic else dy * pk['mask2']
    dt2 = de2 * _elu_grad(pk['t2'])
    dw2 = _dot_tn(pk['e1'], dt2, mm_dtype)
    dc2 = jnp.sum(dt2, axis=0, keepdims=True)
    de1 = _dot_nt(dt2, w2, mm_dtype)
    dt1 = de1 * _elu_grad(pk['t1'])
    dw1 = _dot_tn(pk['x1n'], dt1, mm_dtype)
    dc1 = jnp.sum(dt1, axis=0, keepdims=True)
    dx1n = dy + _dot_nt(dt1, w1, mm_dtype)
    dx1, dg2, db2 = _ln_bwd(dx1n, pk['xhat2'], pk['inv2'], g2)
    da1 = dx1 if deterministic else dx1 * pk['mask1']
    dwr = _dot_tn(pk['attn0'], da1, mm_dtype)
    dbr = jnp.sum(da1, axis=0, keepdims=True)
    dattn0 = _dot_nt(da1, wr, mm_dtype)
    dhn_ref[:] = dx1

    # attention backward over the unrolled neighbor planes
    nbrs, alphas = pk['nbrs'], pk['alphas']
    dalphas = [_dot(dattn0 * nbrs[i], reduce_r, None) for i in range(d)]
    wdot = alphas[0] * dalphas[0]
    for i in range(1, d):
        wdot = wdot + alphas[i] * dalphas[i]
    dfeat = jnp.zeros_like(feat)
    for i in range(d):
        dnbr_i = _dot_nt(alphas[i], reduce_r, None) * dattn0
        dscore = alphas[i] * (dalphas[i] - wdot)          # (bn, H)
        dscore_b = _dot_nt(dscore, reduce_r, None) * scale
        dfeat = dfeat + dscore_b * nbrs[i]
        dnbr_ref[i] = dnbr_i + dscore_b * feat
    dfeat_ref[:] = dfeat

    grads = (dwr, dbr, dg2, db2, dw1, dc1, dw2, dc2)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref, g in zip(grad_refs, grads):
            ref[:] = g

    @pl.when(pl.program_id(0) != 0)
    def _():
        for ref, g in zip(grad_refs, grads):
            ref[:] = ref[:] + g


def _pad_n(x, block_n, axis):
    return _pad_to(x, axis, block_n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_gnn_block(feat, nbr, hn, mask, params, seed=0, n_heads=16,
                    dropout_rate=0.0, deterministic=True, mm_dtype=None,
                    block_n=256):
    """Post-gather half of a GNN ResidualAttentionBlock.

    feat: (N, F) projected features (LN(h) @ fc, no bias);
    nbr:  (D, N, F) gathered neighbor features (feat[neighbors.T]);
    hn:   (N, F) the pre-LN output (residual base);
    mask: (D, N) float neighbor-slot mask;
    params: flax param subtree of the block (head_reducer,
    interaction_norm, si_dense1, si_dense2). Returns the block output (N, F).
    """
    y, _ = _fused_fwd(feat, nbr, hn, mask, params, seed, n_heads,
                      dropout_rate, deterministic, mm_dtype, block_n)
    return y


def _fused_fwd(feat, nbr, hn, mask, params, seed, n_heads, dropout_rate,
               deterministic, mm_dtype, block_n):
    n, f = feat.shape
    if f % n_heads:
        raise ValueError(
            f"node feature width {f} must be divisible by "
            f"n_heads={n_heads} (the head-reduction matrix would silently "
            f"drop the remainder lanes)")
    d = nbr.shape[0]
    feat_p = _pad_n(feat, block_n, 0)
    nbr_p = _pad_n(nbr, block_n, 1)
    hn_p = _pad_n(hn, block_n, 0)
    mask_p = _pad_n(mask.astype(jnp.float32), block_n, 1)
    n_pad = feat_p.shape[0]
    flat = flatten_params(params)
    reduce_r = _reduce_matrix(f, n_heads)
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape((1,))
    grid = (n_pad // block_n,)

    kernel = functools.partial(
        _fwd_kernel, n_heads=n_heads, rate=dropout_rate,
        deterministic=deterministic, mm_dtype=mm_dtype)
    row = lambda i, *_: (i, 0)
    slot = lambda i, *_: (0, i, 0)
    whole = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape))
    y = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=([pl.BlockSpec((block_n, f), row),
                       pl.BlockSpec((d, block_n, f), slot),
                       pl.BlockSpec((block_n, f), row),
                       pl.BlockSpec((d, block_n), lambda i, *_: (0, i))]
                      + [whole(w.shape) for w in flat]
                      + [whole(reduce_r.shape)]),
            out_specs=pl.BlockSpec((block_n, f), row),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(seed_arr, feat_p, nbr_p, hn_p, mask_p, *flat, reduce_r)
    return y[:n], (feat, nbr, hn, mask, params, seed)


def _fused_bwd(n_heads, dropout_rate, deterministic, mm_dtype, block_n,
               res, dy):
    feat, nbr, hn, mask, params, seed = res
    n, f = feat.shape
    d = nbr.shape[0]
    feat_p = _pad_n(feat, block_n, 0)
    nbr_p = _pad_n(nbr, block_n, 1)
    hn_p = _pad_n(hn, block_n, 0)
    mask_p = _pad_n(mask.astype(jnp.float32), block_n, 1)
    dy_p = _pad_n(dy.astype(jnp.float32), block_n, 0)
    n_pad = feat_p.shape[0]
    flat = flatten_params(params)
    reduce_r = _reduce_matrix(f, n_heads)
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape((1,))
    grid = (n_pad // block_n,)

    kernel = functools.partial(
        _bwd_kernel, n_heads=n_heads, rate=dropout_rate,
        deterministic=deterministic, mm_dtype=mm_dtype)
    row = lambda i, *_: (i, 0)
    slot = lambda i, *_: (0, i, 0)
    whole = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape))
    out_shapes = ([jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
                   jax.ShapeDtypeStruct((d, n_pad, f), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, f), jnp.float32)]
                  + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                     for w in flat])
    out_specs = ([pl.BlockSpec((block_n, f), row),
                  pl.BlockSpec((d, block_n, f), slot),
                  pl.BlockSpec((block_n, f), row)]
                 + [whole(w.shape) for w in flat])
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=([pl.BlockSpec((block_n, f), row),
                       pl.BlockSpec((d, block_n, f), slot),
                       pl.BlockSpec((block_n, f), row),
                       pl.BlockSpec((d, block_n), lambda i, *_: (0, i)),
                       pl.BlockSpec((block_n, f), row)]
                      + [whole(w.shape) for w in flat]
                      + [whole(reduce_r.shape)]),
            out_specs=out_specs,
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(seed_arr, feat_p, nbr_p, hn_p, mask_p, dy_p, *flat, reduce_r)
    dfeat = outs[0][:n]
    dnbr = outs[1][:, :n]
    dhn = outs[2][:n]
    dparams = unflatten_grads(tuple(outs[3:]))
    dmask = jnp.zeros_like(mask)
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return dfeat, dnbr, dhn, dmask, dparams, dseed


fused_gnn_block.defvjp(_fused_fwd, _fused_bwd)


def dropout_masks(seed, n, f, rate, block_n=256):
    """Replay the exact dropout masks the fused GNN kernels draw for a
    given (seed, shape, block_n): per grid tile, seed (seed, program_id)
    then draw the post-head-reducer mask and the FF-output mask in order.
    Returns two (N, F) arrays (values already scaled by 1/keep).
    Validation helper for on-chip checks (benchmarks/fused_dropout_check.py)."""
    n_pad = -(-n // block_n) * block_n

    def kernel(seed_ref, m1_ref, m2_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        m1_ref[:] = _dropout_mask(m1_ref.shape, rate)
        m2_ref[:] = _dropout_mask(m2_ref.shape, rate)

    seed_arr = jnp.asarray(seed, jnp.uint32).reshape((1,))
    row = lambda i, *_: (i, 0)
    m1, m2 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // block_n,),
            in_specs=[],
            out_specs=[pl.BlockSpec((block_n, f), row)] * 2,
        ),
        out_shape=[jax.ShapeDtypeStruct((n_pad, f), jnp.float32)] * 2,
        interpret=INTERPRET,
    )(seed_arr)
    return m1[:n], m2[:n]


# ---------------------------------------------------------------------------
# Pure-XLA reference of the same math (for tests; deterministic only)
def reference_gnn_block(feat, nbr, hn, mask, params, n_heads=16):
    """Identical math to fused_gnn_block(deterministic=True) in plain jnp."""
    (wr, br, g2, b2, w1, c1, w2, c2) = flatten_params(params)
    d, n, f = nbr.shape
    dh = f // n_heads
    feath = feat.reshape(n, n_heads, dh)
    nbrh = nbr.reshape(d, n, n_heads, dh)
    scores = jnp.einsum('nhd,knhd->knh', feath, nbrh) / np.sqrt(dh)
    scores = jnp.where(mask[:, :, None] > 0, scores, _NEG)
    exps = jnp.exp(scores - scores.max(axis=0)) * mask[:, :, None]
    alpha = exps / jnp.maximum(exps.sum(axis=0), 1e-9)
    attn0 = jnp.einsum('knh,knhd->nhd', alpha, nbrh).reshape(n, f)
    a1 = attn0 @ wr + br
    x1 = a1 + hn
    x1n, _, _ = _ln_fwd(x1, g2, b2)
    e1 = _elu(x1n @ w1 + c1)
    e2 = _elu(e1 @ w2 + c2)
    return e2 + x1n
