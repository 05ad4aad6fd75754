"""Graph neural network over the molecular bond graph (flax.linen).

TPU-native message passing: the molecular graph is extremely sparse (degree
<= ~6), so instead of sparse CUDA kernels (the reference uses DGL's
DotGatConv / SAGEConv, reference: src/grappa/models/graph_attention.py:
226-415) each node gathers its neighbors from a fixed-width padded neighbor
list and attends over that static axis — dense, masked, fully vectorized,
MXU-friendly.

Semantics per block match the reference:
  * NeighborAttention == DGL DotGatConv: one shared bias-free projection, dot
    scores scaled by 1/sqrt(d_head), softmax over incoming neighbors (no self
    loop), message = projected neighbor feature.
  * SAGEConv (mean aggregator) for the optional conv blocks.
  * Residual block layout (pre-LN, head reducer, skip, self-interaction)
    follows graph_attention.py:188-415.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from grappa_tpu.models.layers import (
    LN_EPS, ChargeEncoding, masked_softmax, repeat_interleave_skip)


class NeighborAttention(nn.Module):
    """Dot-product graph attention over a padded neighbor list."""
    out_feats: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, h, neighbors, neighbor_mask, project_only=False):
        # h: (N, F); neighbors: (N, D) int32; neighbor_mask: (N, D)
        dh = self.out_feats // self.num_heads
        feat = nn.Dense(self.out_feats, use_bias=False, dtype=self.dtype,
                        name='fc')(h)
        if project_only:
            # fused-kernel path (ops/fused_gnn.py): only the projection runs
            # here; attention happens inside the Pallas kernel
            return feat.astype(jnp.float32)
        feat = feat.reshape(-1, self.num_heads, dh)          # (N, H, dh)
        nbr_feat = feat[neighbors]                            # (N, D, H, dh)
        scores = jnp.einsum('nhd,nkhd->nkh', feat, nbr_feat,
                            preferred_element_type=jnp.float32) / np.sqrt(dh)
        alpha = masked_softmax(scores, neighbor_mask[:, :, None], axis=1)
        out = jnp.einsum('nkh,nkhd->nhd', alpha.astype(nbr_feat.dtype),
                         nbr_feat)                            # (N, H, dh)
        return out.reshape(-1, self.out_feats).astype(h.dtype)


class SAGEConv(nn.Module):
    """GraphSAGE with mean aggregation over the padded neighbor list."""
    out_feats: int

    @nn.compact
    def __call__(self, h, neighbors, neighbor_mask):
        nbr = h[neighbors] * neighbor_mask[:, :, None]
        count = jnp.maximum(neighbor_mask.sum(axis=1, keepdims=True), 1.0)
        mean = nbr.sum(axis=1) / count
        return (nn.Dense(self.out_feats, use_bias=False, name='fc_self')(h)
                + nn.Dense(self.out_feats, name='fc_neigh')(mean))


class ResidualAttentionBlock(nn.Module):
    out_feats: int
    num_heads: int
    dropout: float = 0.0
    layer_norm: bool = True
    self_interaction: bool = True
    dtype: Optional[jnp.dtype] = None
    zero_init_residual: bool = True
    fused: bool = False   # Pallas fused post-gather kernel (ops/fused_gnn.py)

    @nn.compact
    def __call__(self, h, neighbors, neighbor_mask, deterministic=True):
        out_init = (nn.initializers.zeros if self.zero_init_residual
                    else nn.initializers.lecun_normal())
        if (self.fused and self.layer_norm and self.self_interaction
                and h.shape[-1] == self.out_feats):
            return self._fused(h, neighbors, neighbor_mask, deterministic,
                               out_init)
        if self.layer_norm:
            h = nn.LayerNorm(epsilon=LN_EPS, name='norm')(h)
        h_skip = h
        a = NeighborAttention(self.out_feats, self.num_heads, dtype=self.dtype,
                              name='attention')(h, neighbors, neighbor_mask)
        a = nn.Dense(self.out_feats, dtype=self.dtype, kernel_init=out_init,
                     name='head_reducer')(a)
        a = a.astype(h.dtype)
        a = nn.Dropout(self.dropout)(a, deterministic=deterministic)
        h = a + repeat_interleave_skip(h_skip, self.out_feats)

        if self.self_interaction:
            if self.layer_norm:
                h = nn.LayerNorm(epsilon=LN_EPS, name='interaction_norm')(h)
            h_skip = h
            x = nn.Dense(4 * self.out_feats, dtype=self.dtype,
                         name='si_dense1')(h)
            x = nn.elu(x)
            x = nn.Dense(self.out_feats, dtype=self.dtype,
                         kernel_init=out_init, name='si_dense2')(x)
            x = nn.elu(x).astype(h.dtype)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            h = x + h_skip
        return h

    def _fused(self, h, neighbors, neighbor_mask, deterministic, out_init):
        """Everything after the neighbor gather runs in one Pallas kernel
        (ops/fused_gnn.py): scores, masked softmax, message sum, head
        reducer, dropout, residual, interaction LN, FF, dropout, residual.
        Identical math and an identical checkpoint tree — each flax
        submodule is instantiated (one-row touch) so its params exist, then
        the kernel consumes them (same scheme as heads._fused_transformer)."""
        import jax

        from grappa_tpu.ops.fused_gnn import fused_gnn_block

        hn = nn.LayerNorm(epsilon=LN_EPS, name='norm')(h)
        feat = NeighborAttention(self.out_feats, self.num_heads,
                                 dtype=self.dtype, name='attention')(
            hn, neighbors, neighbor_mask, project_only=True)

        reducer = nn.Dense(self.out_feats, dtype=self.dtype,
                           kernel_init=out_init, name='head_reducer')
        _ = reducer(feat[:1])
        inorm = nn.LayerNorm(epsilon=LN_EPS, name='interaction_norm')
        _ = inorm(feat[:1])
        d1 = nn.Dense(4 * self.out_feats, dtype=self.dtype, name='si_dense1')
        _ = d1(feat[:1])
        d2 = nn.Dense(self.out_feats, dtype=self.dtype, kernel_init=out_init,
                      name='si_dense2')
        _ = d2(jnp.zeros((1, 4 * self.out_feats), feat.dtype))
        params = {'head_reducer': reducer.variables['params'],
                  'interaction_norm': inorm.variables['params'],
                  'si_dense1': d1.variables['params'],
                  'si_dense2': d2.variables['params']}

        if deterministic or self.dropout == 0.0:
            seed = jnp.uint32(0)
        else:
            key = self.make_rng('dropout')
            seed = jax.random.key_data(key).reshape(-1)[-1].astype(jnp.uint32)

        nbr = feat[neighbors].transpose(1, 0, 2)            # (D, N, F)
        mask = neighbor_mask.astype(jnp.float32).T          # (D, N)
        return fused_gnn_block(
            feat, nbr, hn, mask, params, seed, self.num_heads, self.dropout,
            bool(deterministic or self.dropout == 0.0), self.dtype)


class ResidualConvBlock(nn.Module):
    out_feats: int
    dropout: float = 0.0
    layer_norm: bool = True
    self_interaction: bool = True

    @nn.compact
    def __call__(self, h, neighbors, neighbor_mask, deterministic=True):
        if self.layer_norm:
            h = nn.LayerNorm(epsilon=LN_EPS, name='norm')(h)
        h_skip = h
        x = SAGEConv(self.out_feats, name='conv')(h, neighbors, neighbor_mask)
        x = nn.elu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        h = x + repeat_interleave_skip(h_skip, self.out_feats)

        if self.self_interaction:
            if self.layer_norm:
                h = nn.LayerNorm(epsilon=LN_EPS, name='interaction_norm')(h)
            h_skip = h
            x = nn.Dense(self.out_feats, name='si_dense')(h)
            x = nn.elu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            h = x + h_skip
        return h


class GrappaGNN(nn.Module):
    """Atom embedder: feature concat (+ charge encoding) -> pre-dense ->
    conv blocks -> attention blocks -> post-dense."""
    out_feats: int = 256
    node_feats: int = 512
    n_conv: int = 0
    n_att: int = 7
    n_heads: int = 16
    in_feat_names: Sequence[str] = ('atomic_number', 'partial_charge',
                                    'ring_encoding', 'degree', 'charge_model')
    charge_encoding: bool = True
    conv_dropout: float = 0.0
    attention_dropout: float = 0.0
    initial_dropout: float = 0.0
    final_dropout: float = 0.0
    layer_norm: bool = True
    self_interaction: bool = True
    dtype: Optional[jnp.dtype] = None
    remat: bool = False   # layer-wise rematerialization: trade FLOPs for HBM
    fused: bool = False   # Pallas fused attention blocks (TPU only)

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], neighbors, neighbor_mask,
                 deterministic: bool = True) -> jnp.ndarray:
        cols: List[jnp.ndarray] = []
        for name in self.in_feat_names:
            f = feats[name]
            cols.append(f if f.ndim >= 2 else f[:, None])
        if self.charge_encoding:
            cols.append(ChargeEncoding(name='charge_encoder')(
                feats['partial_charge']))
        x = jnp.concatenate(cols, axis=-1)

        h = nn.Dense(self.node_feats, name='pre_dense')(x)
        h = nn.elu(h)
        h = nn.Dropout(self.initial_dropout)(h, deterministic=deterministic)

        # static_argnums counts __call__ args with self at 0: deterministic
        # must stay a python bool inside the remat-wrapped call
        ConvBlock = (nn.remat(ResidualConvBlock, static_argnums=(4,))
                     if self.remat else ResidualConvBlock)
        AttBlock = (nn.remat(ResidualAttentionBlock, static_argnums=(4,))
                    if self.remat else ResidualAttentionBlock)
        for i in range(self.n_conv):
            h = ConvBlock(
                self.node_feats, dropout=self.conv_dropout,
                layer_norm=self.layer_norm,
                self_interaction=self.self_interaction,
                name=f'conv_block_{i}')(h, neighbors, neighbor_mask,
                                        deterministic)
        for i in range(self.n_att):
            h = AttBlock(
                self.node_feats, self.n_heads,
                dropout=self.attention_dropout, layer_norm=self.layer_norm,
                self_interaction=self.self_interaction, dtype=self.dtype,
                fused=self.fused,
                name=f'att_block_{i}')(h, neighbors, neighbor_mask,
                                       deterministic)

        h = nn.Dense(self.out_feats, name='post_dense')(h)
        return nn.Dropout(self.final_dropout)(h, deterministic=deterministic)
