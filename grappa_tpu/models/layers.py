"""Shared neural-network building blocks (flax.linen).

Math matches the reference's torch primitives so that torch checkpoints can
be converted weight-for-weight:
  * FeedForward == reference FeedForwardLayer (pre-LN, one hidden layer,
    optional repeat-interleave skip; reference: src/grappa/models/
    network_utils.py:5-54)
  * SelfAttention == torch.nn.MultiheadAttention with packed qkv projection
  * TransformerBlock == reference DottedAttWithMLP (pre-LN MHA + FF;
    network_utils.py:57-133)
  * ChargeEncoding == the sinusoidal partial-charge encoding
    (reference: src/grappa/models/graph_attention.py:418-444)

LayerNorm uses eps=1e-5 (torch default) for conversion parity.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LN_EPS = 1e-5


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray,
                   axis: int = -1) -> jnp.ndarray:
    """Softmax over `axis` restricted to mask==True; all-masked rows -> 0."""
    neg = jnp.finfo(logits.dtype).min / 2
    masked = jnp.where(mask, logits, neg)
    shifted = masked - jnp.max(masked, axis=axis, keepdims=True)
    weights = jnp.exp(shifted) * mask.astype(logits.dtype)
    denom = jnp.sum(weights, axis=axis, keepdims=True)
    return weights / jnp.maximum(denom, 1e-9)


def repeat_interleave_skip(x_skip: jnp.ndarray, out_feats: int) -> jnp.ndarray:
    """Repeat-interleave the feature axis so a skip connection fits out_feats."""
    in_feats = x_skip.shape[-1]
    if out_feats == in_feats:
        return x_skip
    factor = out_feats // in_feats
    return jnp.repeat(x_skip, factor, axis=-1)


class FeedForward(nn.Module):
    """Pre-LN MLP with one hidden layer, optional skip (repeat-interleave).

    `dtype` is the matmul compute dtype (bfloat16 feeds the MXU at full rate);
    parameters and layer norms stay float32.
    """
    hidden_feats: int
    out_feats: int
    skip: bool = False
    layer_norm: bool = True
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    zero_init_out: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, name='norm')(x)
        h = nn.Dense(self.hidden_feats, dtype=self.dtype, name='linear1')(x)
        h = nn.elu(h)
        out_init = (nn.initializers.zeros if self.zero_init_out
                    else nn.initializers.lecun_normal())
        h = nn.Dense(self.out_feats, dtype=self.dtype,
                     kernel_init=out_init, name='linear2')(h)
        h = h.astype(x.dtype)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if self.skip:
            h = h + repeat_interleave_skip(x, self.out_feats)
        return h


class SelfAttention(nn.Module):
    """Multi-head self-attention with packed qkv, matching
    torch.nn.MultiheadAttention(embed_dim, num_heads). Softmax always runs
    in float32 regardless of the matmul compute dtype."""
    num_heads: int
    dtype: Optional[jnp.dtype] = None
    zero_init_out: bool = False

    @nn.compact
    def __call__(self, x):
        # x: (..., S, F)
        f = x.shape[-1]
        assert f % self.num_heads == 0
        dh = f // self.num_heads
        in_dtype = x.dtype
        qkv = nn.Dense(3 * f, dtype=self.dtype, name='in_proj')(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(*t.shape[:-1], self.num_heads, dh)

        q, k, v = heads(q), heads(k), heads(v)            # (..., S, H, dh)
        # For S >= 4 the scores are laid out (H, S, S, A) with the huge
        # batch/tuple axis A minor: (A, H, 4, 4) scores tile-pad 32x on TPU
        # ((8,128) tiles vs 4x4 minors), which makes the attention backward
        # up to ~1.9x slower at large A (PERF.md step breakdown;
        # benchmarks/attention_probe.py).
        lead = q.shape[:-3]
        s = q.shape[-3]
        q = q.reshape(-1, *q.shape[-3:])                  # (A, S, H, dh)
        k = k.reshape(-1, *k.shape[-3:])
        v = v.reshape(-1, *v.shape[-3:])
        if s >= 4:
            logits = jnp.einsum('ashd,athd->hsta', q, k,
                                preferred_element_type=jnp.float32) / np.sqrt(dh)
            weights = nn.softmax(logits, axis=2).astype(v.dtype)
            out = jnp.einsum('hsta,athd->ashd', weights, v)
        else:
            # S in {2,3}: the transposes cost more than the padding saves
            logits = jnp.einsum('ashd,athd->ahst', q, k,
                                preferred_element_type=jnp.float32) / np.sqrt(dh)
            weights = nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum('ahst,athd->ashd', weights, v)
        out = out.reshape(*lead, s, f)
        out_init = (nn.initializers.zeros if self.zero_init_out
                    else nn.initializers.lecun_normal())
        out = nn.Dense(f, dtype=self.dtype, kernel_init=out_init,
                       name='out_proj')(out)
        return out.astype(in_dtype)


class TransformerBlock(nn.Module):
    """Pre-LN self-attention + feed-forward block (DottedAttWithMLP).

    zero_init_residual starts every branch-output layer at zero so the deep
    stack is the identity at initialization (ReZero/Fixup-style) — without
    it the 7-layer 512-wide config explodes at init and the output scalers
    saturate into dead gradients (loss freezes at the mean predictor).
    """
    num_heads: int
    hidden_feats: int
    layer_norm: bool = True
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    zero_init_residual: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, name='norm1')(x)
        attn = SelfAttention(self.num_heads, dtype=self.dtype,
                             zero_init_out=self.zero_init_residual,
                             name='attn')(x)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = attn + x
        return FeedForward(self.hidden_feats, x.shape[-1], skip=True,
                           layer_norm=self.layer_norm, dropout=self.dropout,
                           dtype=self.dtype,
                           zero_init_out=self.zero_init_residual,
                           name='ff')(x, deterministic=deterministic)


class ChargeEncoding(nn.Module):
    """Sinusoidal encoding of partial charges clamped to [-2, 2]."""
    dimension: int = 16
    min_value: float = -2.0
    max_value: float = 2.0

    @nn.compact
    def __call__(self, values: jnp.ndarray) -> jnp.ndarray:
        values = jnp.clip(values, self.min_value, self.max_value)
        scaled = (values + self.max_value) / (self.max_value - self.min_value)
        half = self.dimension // 2
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                        * (-np.log(10000.0) / half))
        args = scaled[:, None] * freqs[None, :]
        enc = jnp.zeros((values.shape[0], self.dimension), jnp.float32)
        enc = enc.at[:, 0::2].set(jnp.sin(args))
        enc = enc.at[:, 1::2].set(jnp.cos(args))
        return enc
