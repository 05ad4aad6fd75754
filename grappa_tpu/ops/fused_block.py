"""Fused tuple-head transformer block (Pallas TPU, forward + custom_vjp).

Why: the tuple heads dominate the training step's FLOPs, yet run at ~25
TFLOP/s f32 against a 150+ TFLOP/s matmul floor on the same shapes
(benchmarks/head_probe.py) — every pre-LN / attention / residual boundary
materializes a (T, S, 512)-class tensor in HBM around each matmul. This op
computes one whole TransformerBlock (models/layers.py: pre-LN packed-qkv
MHA + dropout + residual, then pre-LN FF with skip + dropout) in a single
Pallas kernel, keeping all intermediates in VMEM. The backward pass is a
second kernel that recomputes the forward per tile (flash-style; only the
block *input* is saved as residual) and accumulates weight gradients across
the grid — so training memory per block is lower than even the remat path.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * layout (S, T, F): the tuple arity S (2..4) rides the major axis, so
    every VMEM tile is a clean (block_t, F) (8,128)-tiled 2D plane; the
    natural (T, S, F) layout would pad the (S, F)=(4, 512) minors.
  * attention over S is unrolled: S*S score planes, each computed as
    (q_s1 * k_s2) @ R where R (F, H) sums each head's dh lanes — both the
    dh-reduction and the head-broadcast (w @ R^T) are tiny matmuls, which
    keeps everything 2D (no (T,H,S,S) tensors anywhere).
  * dropout uses the in-kernel TPU PRNG, seeded per (step, grid tile);
    the backward kernel replays the identical mask sequence.
  * T is padded to the tile size with zero rows; zero cotangents make the
    padded rows contribute exactly zero to every weight gradient.

Math matches models/layers.py TransformerBlock exactly (deterministic mode
is allclose-tested against the flax module; reference for the architecture:
src/grappa/models/network_utils.py:57-133 DottedAttWithMLP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5

# tests flip this to run the kernels in the Pallas interpreter (CPU)
INTERPRET = False

# flax param-tree leaves of a TransformerBlock, in kernel argument order
PARAM_ORDER = (
    ('norm1', 'scale'), ('norm1', 'bias'),
    ('attn', 'in_proj', 'kernel'), ('attn', 'in_proj', 'bias'),
    ('attn', 'out_proj', 'kernel'), ('attn', 'out_proj', 'bias'),
    ('ff', 'norm', 'scale'), ('ff', 'norm', 'bias'),
    ('ff', 'linear1', 'kernel'), ('ff', 'linear1', 'bias'),
    ('ff', 'linear2', 'kernel'), ('ff', 'linear2', 'bias'),
)


def _elu(a):
    return jnp.where(a > 0, a, jnp.exp(jnp.minimum(a, 0.0)) - 1.0)


def _elu_grad(a):
    return jnp.where(a > 0, 1.0, jnp.exp(jnp.minimum(a, 0.0)))


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def flatten_params(tree, paths=None):
    """flax param tree -> flat tuple (vectors as (1, n)) following `paths`
    (a tuple of key paths; defaults to this module's PARAM_ORDER). Shared
    by all fused ops — each passes its own path table."""
    out = []
    for path in (PARAM_ORDER if paths is None else paths):
        leaf = jnp.asarray(_get(tree, path), jnp.float32)
        out.append(leaf if leaf.ndim == 2 else leaf[None, :])
    return tuple(out)


def unflatten_grads(flat, paths=None):
    """Flat gradient tuple -> flax param-tree structure along `paths`
    (LN 'scale'/'bias' leaves are restored to 1-D)."""
    tree = {}
    for path, g in zip(PARAM_ORDER if paths is None else paths, flat):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = g[0] if path[-1] in ('scale', 'bias') else g
    return tree


def _ln_fwd(x, scale, bias):
    m = jnp.mean(x, axis=-1, keepdims=True)
    c = x - m
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = c * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(dy, xhat, inv, scale):
    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db = jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * scale
    dx = (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
          - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)) * inv
    return dx, dg, db


def _dot(a, b, mm_dtype):
    if mm_dtype is not None:
        a = a.astype(mm_dtype)
        b = b.astype(mm_dtype)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_tn(a, b, mm_dtype):
    """a^T @ b without materializing the transpose."""
    if mm_dtype is not None:
        a = a.astype(mm_dtype)
        b = b.astype(mm_dtype)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b, mm_dtype):
    """a @ b^T without materializing the transpose."""
    if mm_dtype is not None:
        a = a.astype(mm_dtype)
        b = b.astype(mm_dtype)
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dropout_mask(shape, rate):
    """Replayable keep-mask scaled by 1/keep from the in-kernel PRNG."""
    bits = pltpu.prng_random_bits(shape)
    threshold = np.uint32(round(rate * float(2**32)))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    return keep.astype(jnp.float32) / np.float32(1.0 - rate)


def _attention(q, k, v, reduce_r, s, dh):
    """Unrolled S-way attention on (S*Tt, F) planes.

    Returns (attn rows (S*Tt, F), softmax weight planes, q/k/v planes) so
    the backward can reuse the recomputed pieces.
    """
    tt = q.shape[0] // s
    scale = np.float32(1.0 / np.sqrt(dh))
    qs = [q[i * tt:(i + 1) * tt] for i in range(s)]
    ks = [k[i * tt:(i + 1) * tt] for i in range(s)]
    vs = [v[i * tt:(i + 1) * tt] for i in range(s)]
    # scores[s1][s2]: (Tt, H)
    scores = [[jnp.dot(qs[s1] * ks[s2], reduce_r,
                       preferred_element_type=jnp.float32) * scale
               for s2 in range(s)] for s1 in range(s)]
    weights = []
    for s1 in range(s):
        row = scores[s1]
        m = row[0]
        for s2 in range(1, s):
            m = jnp.maximum(m, row[s2])
        exps = [jnp.exp(row[s2] - m) for s2 in range(s)]
        denom = exps[0]
        for s2 in range(1, s):
            denom = denom + exps[s2]
        weights.append([e / denom for e in exps])
    outs = []
    for s1 in range(s):
        acc = jnp.dot(weights[s1][0], reduce_r.T,
                      preferred_element_type=jnp.float32) * vs[0]
        for s2 in range(1, s):
            acc = acc + jnp.dot(weights[s1][s2], reduce_r.T,
                                preferred_element_type=jnp.float32) * vs[s2]
        outs.append(acc)
    return jnp.concatenate(outs, axis=0), weights, qs, ks, vs


def _forward_body(x0, params, reduce_r, *, s, n_heads, rate, deterministic,
                  mm_dtype):
    """Shared forward math on (S*Tt, F) rows; returns y and residual pack."""
    (g1, b1, wq, bq, wo, bo, g2, b2, w1, c1, w2, c2) = params
    f = x0.shape[-1]
    dh = f // n_heads
    xn, xhat1, inv1 = _ln_fwd(x0, g1, b1)
    qkv = _dot(xn, wq, mm_dtype) + bq
    q, k, v = qkv[:, :f], qkv[:, f:2 * f], qkv[:, 2 * f:]
    attn0, weights, qs, ks, vs = _attention(q, k, v, reduce_r, s, dh)
    attn1 = _dot(attn0, wo, mm_dtype) + bo
    if not deterministic:
        mask1 = _dropout_mask(attn1.shape, rate)
        attn1 = attn1 * mask1
    else:
        mask1 = None
    x1 = attn1 + xn
    x1n, xhat2, inv2 = _ln_fwd(x1, g2, b2)
    a = _dot(x1n, w1, mm_dtype) + c1
    e = _elu(a)
    h = _dot(e, w2, mm_dtype) + c2
    if not deterministic:
        mask2 = _dropout_mask(h.shape, rate)
        h = h * mask2
    else:
        mask2 = None
    # NB: FeedForward's skip adds the *normalized* input (layers.py:64
    # reassigns x to the LN output before the skip), so the residual base
    # here is x1n, not x1
    y = h + x1n
    pack = dict(xn=xn, xhat1=xhat1, inv1=inv1, weights=weights,
                qs=qs, ks=ks, vs=vs, attn0=attn0, mask1=mask1,
                x1=x1, x1n=x1n, xhat2=xhat2, inv2=inv2, a=a, e=e, mask2=mask2)
    return y, pack


def _fwd_kernel(seed_ref, x_ref, *refs, s, n_heads, rate, deterministic,
                mm_dtype):
    *param_refs, r_ref, y_ref = refs
    if not deterministic:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    st, tt, f = x_ref.shape
    x0 = x_ref[:].reshape(st * tt, f)
    params = [p[:] for p in param_refs]
    y, _ = _forward_body(x0, params, r_ref[:], s=s, n_heads=n_heads,
                         rate=rate, deterministic=deterministic,
                         mm_dtype=mm_dtype)
    y_ref[:] = y.reshape(st, tt, f)


def _bwd_kernel(seed_ref, x_ref, dy_ref, *refs, s, n_heads, rate,
                deterministic, mm_dtype):
    (*param_refs, r_ref,
     dx_ref, dg1_ref, db1_ref, dwq_ref, dbq_ref, dwo_ref, dbo_ref,
     dg2_ref, db2_ref, dw1_ref, dc1_ref, dw2_ref, dc2_ref) = refs
    grad_refs = (dg1_ref, db1_ref, dwq_ref, dbq_ref, dwo_ref, dbo_ref,
                 dg2_ref, db2_ref, dw1_ref, dc1_ref, dw2_ref, dc2_ref)
    if not deterministic:
        # identical seeding -> the two _dropout_mask draws replay exactly
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    st, tt, f = x_ref.shape
    dh = f // n_heads
    scale = np.float32(1.0 / np.sqrt(dh))
    x0 = x_ref[:].reshape(st * tt, f)
    dy = dy_ref[:].reshape(st * tt, f)
    params = [p[:] for p in param_refs]
    (g1, b1, wq, bq, wo, bo, g2, b2, w1, c1, w2, c2) = params
    reduce_r = r_ref[:]

    _, pk = _forward_body(x0, params, reduce_r, s=s, n_heads=n_heads,
                          rate=rate, deterministic=deterministic,
                          mm_dtype=mm_dtype)

    # y = h*mask2 + x1n  (the FF skip adds the *normalized* input)
    dh_ = dy if deterministic else dy * pk['mask2']
    # h = e @ w2 + c2
    dw2 = _dot_tn(pk['e'], dh_, mm_dtype)
    dc2 = jnp.sum(dh_, axis=0, keepdims=True)
    de = _dot_nt(dh_, w2, mm_dtype)
    a = pk['a']
    da = de * _elu_grad(a)
    dw1 = _dot_tn(pk['x1n'], da, mm_dtype)
    dc1 = jnp.sum(da, axis=0, keepdims=True)
    dx1n = dy + _dot_nt(da, w1, mm_dtype)
    dx1, dg2, db2 = _ln_bwd(dx1n, pk['xhat2'], pk['inv2'], g2)
    # x1 = attn1*mask1 + xn
    dattn1 = dx1 if deterministic else dx1 * pk['mask1']
    dxn = dx1
    # attn1 = attn0 @ wo + bo
    dwo = _dot_tn(pk['attn0'], dattn1, mm_dtype)
    dbo = jnp.sum(dattn1, axis=0, keepdims=True)
    dattn0 = _dot_nt(dattn1, wo, mm_dtype)

    # attention backward (unrolled, per s1 row of the softmax)
    weights, qs, ks, vs = pk['weights'], pk['qs'], pk['ks'], pk['vs']
    dattn_planes = [dattn0[i * tt:(i + 1) * tt] for i in range(s)]
    dqs = [jnp.zeros_like(qs[0]) for _ in range(s)]
    dks = [jnp.zeros_like(ks[0]) for _ in range(s)]
    dvs = [jnp.zeros_like(vs[0]) for _ in range(s)]
    for s1 in range(s):
        dw_rows = [jnp.dot(dattn_planes[s1] * vs[s2], reduce_r,
                           preferred_element_type=jnp.float32)
                   for s2 in range(s)]
        for s2 in range(s):
            dvs[s2] = dvs[s2] + jnp.dot(
                weights[s1][s2], reduce_r.T,
                preferred_element_type=jnp.float32) * dattn_planes[s1]
        wdot = weights[s1][0] * dw_rows[0]
        for s2 in range(1, s):
            wdot = wdot + weights[s1][s2] * dw_rows[s2]
        for s2 in range(s):
            dscore = weights[s1][s2] * (dw_rows[s2] - wdot)   # (Tt, H)
            dscore_b = jnp.dot(dscore, reduce_r.T,
                               preferred_element_type=jnp.float32) * scale
            dqs[s1] = dqs[s1] + dscore_b * ks[s2]
            dks[s2] = dks[s2] + dscore_b * qs[s1]
    dqkv = jnp.concatenate(
        [jnp.concatenate(dqs, axis=0), jnp.concatenate(dks, axis=0),
         jnp.concatenate(dvs, axis=0)], axis=1)
    dwq = _dot_tn(pk['xn'], dqkv, mm_dtype)
    dbq = jnp.sum(dqkv, axis=0, keepdims=True)
    dxn = dxn + _dot_nt(dqkv, wq, mm_dtype)
    dx0, dg1, db1 = _ln_bwd(dxn, pk['xhat1'], pk['inv1'], g1)

    dx_ref[:] = dx0.reshape(st, tt, f)
    grads = (dg1, db1, dwq, dbq, dwo, dbo, dg2, db2, dw1, dc1, dw2, dc2)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref, g in zip(grad_refs, grads):
            ref[:] = g

    @pl.when(pl.program_id(0) != 0)
    def _():
        for ref, g in zip(grad_refs, grads):
            ref[:] = ref[:] + g


def _reduce_matrix(f, n_heads):
    """R (F, H): R[h*dh+d, h] = 1 — dh-lane reduction / head broadcast."""
    dh = f // n_heads
    r = np.zeros((f, n_heads), np.float32)
    for h in range(n_heads):
        r[h * dh:(h + 1) * dh, h] = 1.0
    return jnp.asarray(r)


def _pad_to(x, axis, mult):
    """Zero-pad `axis` up to the next multiple of `mult` (shared by all
    fused kernels; torsion_kernel/fused_gnn re-use this one helper)."""
    size = x.shape[axis]
    target = -(-size // mult) * mult
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


def _pad_t(x, block_t):
    return _pad_to(x, 1, block_t), x.shape[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_transformer_block(x, params, seed, n_heads=8, dropout_rate=0.0,
                            deterministic=True, mm_dtype=None, block_t=128):
    """One TransformerBlock on x (S, T, F); params = flax block param tree.

    seed: uint32 scalar array (ignored when deterministic).
    mm_dtype: None (f32 matmuls) or jnp.bfloat16.
    """
    y, _ = _fused_fwd(x, params, seed, n_heads, dropout_rate, deterministic,
                      mm_dtype, block_t)
    return y


def _fused_fwd(x, params, seed, n_heads, dropout_rate, deterministic,
               mm_dtype, block_t):
    s, t_in, f = x.shape
    if f % n_heads:
        raise ValueError(
            f"feature width {f} must be divisible by n_heads={n_heads} "
            f"(the head-reduction matrix would silently drop the "
            f"remainder lanes)")
    x_p, t = _pad_t(x, block_t)
    t_pad = x_p.shape[1]
    flat = flatten_params(params)
    reduce_r = _reduce_matrix(f, n_heads)
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape((1,))
    grid = (t_pad // block_t,)

    kernel = functools.partial(
        _fwd_kernel, s=s, n_heads=n_heads, rate=dropout_rate,
        deterministic=deterministic, mm_dtype=mm_dtype)
    # index maps receive the scalar-prefetch ref after the grid indices
    block = lambda i, *_: (0, i, 0)
    whole = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0, 0))
    y = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=([pl.BlockSpec((s, block_t, f), block)]
                      + [whole(w.shape) for w in flat]
                      + [whole(reduce_r.shape)]),
            out_specs=pl.BlockSpec((s, block_t, f), block),
        ),
        out_shape=jax.ShapeDtypeStruct((s, t_pad, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(seed_arr, x_p, *flat, reduce_r)
    y = y[:, :t]
    return y, (x, params, seed)


def _fused_bwd(n_heads, dropout_rate, deterministic, mm_dtype, block_t,
               res, dy):
    x, params, seed = res
    s, t_in, f = x.shape
    x_p, t = _pad_t(x, block_t)
    dy_p, _ = _pad_t(dy.astype(jnp.float32), block_t)
    t_pad = x_p.shape[1]
    flat = flatten_params(params)
    reduce_r = _reduce_matrix(f, n_heads)
    seed_arr = jnp.asarray(seed, jnp.uint32).reshape((1,))
    grid = (t_pad // block_t,)

    kernel = functools.partial(
        _bwd_kernel, s=s, n_heads=n_heads, rate=dropout_rate,
        deterministic=deterministic, mm_dtype=mm_dtype)
    # index maps receive the scalar-prefetch ref after the grid indices
    block = lambda i, *_: (0, i, 0)
    whole = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0, 0))
    out_shapes = ([jax.ShapeDtypeStruct((s, t_pad, f), jnp.float32)]
                  + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                     for w in flat])
    out_specs = ([pl.BlockSpec((s, block_t, f), block)]
                 + [whole(w.shape) for w in flat])
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=([pl.BlockSpec((s, block_t, f), block)] * 2
                      + [whole(w.shape) for w in flat]
                      + [whole(reduce_r.shape)]),
            out_specs=out_specs,
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(seed_arr, x_p, dy_p, *flat, reduce_r)
    dx = outs[0][:, :t]
    dparams = unflatten_grads(tuple(outs[1:]))
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return dx, dparams, dseed


fused_transformer_block.defvjp(_fused_fwd, _fused_bwd)



def dropout_masks(seed, s, t, f, rate, block_t=128):
    """Replay the exact dropout masks the fused kernels draw for a given
    (seed, shape, block_t): per grid tile, seed (seed, program_id) then
    draw the attention mask and the FF mask in order. Returns two
    (S, T, F) arrays (mask values already scaled by 1/keep). Validation
    helper: lets an XLA reference reproduce the fused computation
    bit-for-mask (tests / on-chip checks)."""
    t_pad = -(-t // block_t) * block_t

    def kernel(seed_ref, m1_ref, m2_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        st, tt, ff = m1_ref.shape
        m1 = _dropout_mask((st * tt, ff), rate)
        m2 = _dropout_mask((st * tt, ff), rate)
        m1_ref[:] = m1.reshape(st, tt, ff)
        m2_ref[:] = m2.reshape(st, tt, ff)

    seed_arr = jnp.asarray(seed, jnp.uint32).reshape((1,))
    block = lambda i, *_: (0, i, 0)
    m1, m2 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t_pad // block_t,),
            in_specs=[],
            out_specs=[pl.BlockSpec((s, block_t, f), block)] * 2,
        ),
        out_shape=[jax.ShapeDtypeStruct((s, t_pad, f), jnp.float32)] * 2,
        interpret=INTERPRET,
    )(seed_arr)
    return m1[:, :t], m2[:, :t]

# ---------------------------------------------------------------------------
# Pure-XLA reference of the same math (for tests; deterministic only)
def reference_block(x_stf, params, n_heads=8):
    """Identical math to fused_transformer_block(deterministic=True), in
    plain jnp on the (S, T, F) layout. Used by tests to pin the kernel."""
    flat = flatten_params(params)
    (g1, b1, wq, bq, wo, bo, g2, b2, w1, c1, w2, c2) = flat
    s, t, f = x_stf.shape
    x0 = x_stf.reshape(s * t, f)
    xn, _, _ = _ln_fwd(x0, g1, b1)
    qkv = xn @ wq + bq
    q, k, v = qkv[:, :f], qkv[:, f:2 * f], qkv[:, 2 * f:]
    dh = f // n_heads
    qs = q.reshape(s, t, n_heads, dh)
    ks = k.reshape(s, t, n_heads, dh)
    vs = v.reshape(s, t, n_heads, dh)
    logits = jnp.einsum('sthd,uthd->suth', qs, ks) / np.sqrt(dh)
    w = jax.nn.softmax(logits, axis=1)
    attn0 = jnp.einsum('suth,uthd->sthd', w, vs).reshape(s * t, f)
    attn1 = attn0 @ wo + bo
    x1 = attn1 + xn
    x1n, _, _ = _ln_fwd(x1, g2, b2)
    a = x1n @ w1 + c1
    e = _elu(a)
    h = e @ w2 + c2
    return (h + x1n).reshape(s, t, f)
