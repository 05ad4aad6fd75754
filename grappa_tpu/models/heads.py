"""Permutation-symmetric parameter heads (flax.linen).

One head per interaction type maps the GNN atom embeddings of a tuple to MM
parameters, invariant under the tuple's symmetry permutations. Architecture
and symmetry sets follow the reference exactly (reference: src/grappa/models/
perm_equiv_transformer.py:13-319 and interaction_parameters.py:140-562):

  * RepProjector: Dense+ELU on atom embeddings, then gather rows by tuple
    indices -> (n_tuples, arity, feats)
  * a tiny fixed-length transformer over the tuple axis with a permutation-
    invariant positional encoding ([0],[1],[0] for angles; [0],[1],[1],[0]
    for torsions; none for bonds)
  * Symmetriser: apply a shared MLP to every allowed permutation of the
    flattened tuple features and sum -> exact invariance
  * permutation sets: bonds {01,10}; angles {012,210}; propers {0123,3210};
    impropers {0123,3120} (energy invariance over the remaining central-
    atom-fixing permutations comes from storing 3 improper versions)

On TPU these are dense (n_tuples, 2..4, feats) einsum attention ops — no
sparse kernels, the MXU eats them directly.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from grappa_tpu.models.layers import FeedForward, TransformerBlock
from grappa_tpu.models import scalers

# symmetry permutation sets per interaction type
PERMUTATIONS = {
    'n2': ((0, 1), (1, 0)),
    'n3': ((0, 1, 2), (2, 1, 0)),
    'n4': ((0, 1, 2, 3), (3, 2, 1, 0)),
    'n4_improper': ((0, 1, 2, 3), (3, 1, 2, 0)),
}
# espaloma-style ablation: all central-atom-fixing permutations
WRONG_SYMMETRY_IMPROPER = ((0, 1, 2, 3), (3, 1, 2, 0), (1, 3, 2, 0),
                           (0, 3, 2, 1), (3, 0, 2, 1), (1, 0, 2, 3))

POSITIONAL_ENCODINGS = {
    'n2': None,
    'n3': ((0.0,), (1.0,), (0.0,)),
    'n4': ((0.0,), (1.0,), (1.0,), (0.0,)),
    'n4_improper': ((0.0,), (1.0,), (1.0,), (0.0,)),
}
WRONG_SYMMETRY_POS_ENC = ((0.0,), (0.0,), (1.0,), (0.0,))


class Symmetriser(nn.Module):
    """Sum of a shared MLP over all symmetry-permuted copies of the tuple."""
    permutations: Tuple[Tuple[int, ...], ...]
    hidden_feats: int
    out_feats: int
    n_layers: int = 1
    layer_norm: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (T, S, F)
        perms = np.asarray(self.permutations)
        xp = x[:, perms, :]                          # (T, n_perm, S, F)
        t, n_perm, s, f = xp.shape
        xp = xp.reshape(t, n_perm, s * f)

        last = self.n_layers - 1
        out = FeedForward(
            self.hidden_feats,
            self.hidden_feats if self.n_layers > 1 else self.out_feats,
            skip=False, layer_norm=self.layer_norm, dtype=self.dtype,
            name='mlp_0',
        )(xp, deterministic=deterministic)
        for i in range(1, self.n_layers):
            out = FeedForward(
                self.hidden_feats,
                self.hidden_feats if i != last else self.out_feats,
                skip=(i != last), layer_norm=self.layer_norm, dtype=self.dtype,
                name=f'mlp_{i}',
            )(out, deterministic=deterministic)
        return out.sum(axis=1)                       # (T, out_feats)


class TupleHead(nn.Module):
    """RepProjector -> fixed-length transformer -> Symmetriser -> raw coeffs."""
    arity: int
    proj_feats: int
    transformer_layers: int
    n_heads: int
    hidden_feats: int
    symmetriser_layers: int
    symmetriser_feats: int
    out_feats: int
    permutations: Tuple[Tuple[int, ...], ...]
    positional_encoding: Optional[Tuple[Tuple[float, ...], ...]] = None
    dropout: float = 0.0
    layer_norm: bool = True
    dtype: Optional[jnp.dtype] = None
    remat: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, h, idxs, deterministic: bool = True):
        # h: (N, F_rep); idxs: (T, arity)
        x = nn.Dense(self.proj_feats, dtype=self.dtype, name='rep_projector')(h)
        x = nn.elu(x).astype(jnp.float32)
        x = x[idxs]                                  # (T, arity, proj_feats)

        if self.positional_encoding is not None:
            pos = jnp.asarray(self.positional_encoding, jnp.float32)
            pos = jnp.broadcast_to(pos[None], (x.shape[0], *pos.shape))
            x = jnp.concatenate([x, pos], axis=-1)

        symmetriser = Symmetriser(
            permutations=self.permutations,
            hidden_feats=self.symmetriser_feats, out_feats=self.out_feats,
            n_layers=self.symmetriser_layers, layer_norm=self.layer_norm,
            dtype=self.dtype, name='symmetriser')

        if self.fused and self.layer_norm:
            from grappa_tpu.ops.fused_symmetriser import fused_symmetriser
            xs = self._fused_transformer(x, deterministic)   # (S, T, F)
            _ = symmetriser(x[:1], True)     # materialize params only
            return fused_symmetriser(
                xs, symmetriser.variables['params'],
                tuple(tuple(p) for p in self.permutations),
                self.symmetriser_layers, self.dtype)

        Block = (nn.remat(TransformerBlock, static_argnums=(2,))
                 if self.remat else TransformerBlock)
        for i in range(self.transformer_layers):
            x = Block(
                self.n_heads, self.hidden_feats,
                layer_norm=self.layer_norm, dropout=self.dropout,
                dtype=self.dtype, name=f'transformer_{i}',
            )(x, deterministic)
        return symmetriser(x, deterministic=deterministic)

    def _fused_transformer(self, x, deterministic: bool):
        """Run the transformer stack through the fused Pallas block
        (ops/fused_block.py): identical math and an identical param tree —
        each TransformerBlock is instantiated and touched with a one-row
        dummy so its flax params exist, then the kernel consumes them.
        3.3x faster fwd+bwd than the XLA stack on TPU (head_probe.py);
        only the block input is saved for backward, so remat is moot."""
        import jax

        from grappa_tpu.ops.fused_block import fused_transformer_block
        xs = x.transpose(1, 0, 2)                    # (S, T, F)
        for i in range(self.transformer_layers):
            blk = TransformerBlock(
                self.n_heads, self.hidden_feats, layer_norm=self.layer_norm,
                dropout=self.dropout, dtype=self.dtype,
                name=f'transformer_{i}')
            _ = blk(x[:1], True)                     # materialize params only
            if deterministic or self.dropout == 0.0:
                seed = jnp.uint32(0)
            else:
                key = self.make_rng('dropout')
                seed = jax.random.key_data(key).reshape(-1)[-1].astype(
                    jnp.uint32)
            xs = fused_transformer_block(
                xs, blk.variables['params'], seed, self.n_heads,
                self.dropout,
                bool(deterministic or self.dropout == 0.0), self.dtype)
        return xs                                # stays (S, T, F)


class _ScalerStatistics:
    """Mixin for parameter heads: a scaler statistic is a trainable param
    when learnable_statistics (reference final_layer.py learnable
    mean/std), else a baked constant."""

    def _stat(self, name: str, value):
        if self.learnable_statistics:
            return self.param(name,
                              lambda key: jnp.asarray(value, jnp.float32))
        return jnp.asarray(value, jnp.float32)


class HarmonicParameterHead(_ScalerStatistics, nn.Module):
    """Bond (arity 2) or angle (arity 3) head -> (eq, k) with scalers.

    eq uses to_positive for bonds and to_range(max=pi) for angles; k uses
    to_positive. Optional sigmoid gate on k (harmonic_gate).
    """
    term: str                     # 'n2' | 'n3'
    transformer_width: int
    transformer_depth: int
    n_heads: int
    symmetriser_depth: int
    symmetriser_width: int
    k_mean: float
    k_std: float
    eq_mean: float                # unused for angles
    eq_std: float
    positional_encoding: bool = True
    gate: bool = False
    dropout: float = 0.0
    layer_norm: bool = True
    dtype: Optional[jnp.dtype] = None
    learnable_statistics: bool = False
    remat: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, h, idxs, deterministic: bool = True):
        arity = 2 if self.term == 'n2' else 3
        pos_enc = POSITIONAL_ENCODINGS[self.term] if self.positional_encoding else None
        proj = self.transformer_width - (0 if pos_enc is None else len(pos_enc[0]))
        coeffs = TupleHead(
            arity=arity, proj_feats=proj,
            transformer_layers=self.transformer_depth, n_heads=self.n_heads,
            hidden_feats=self.transformer_width,
            symmetriser_layers=self.symmetriser_depth,
            symmetriser_feats=self.symmetriser_width,
            out_feats=2 + int(self.gate),
            permutations=PERMUTATIONS[self.term],
            positional_encoding=pos_enc,
            dropout=self.dropout, layer_norm=self.layer_norm,
            dtype=self.dtype, remat=self.remat, fused=self.fused,
            name='head',
        )(h, idxs, deterministic=deterministic)
        coeffs = coeffs.astype(jnp.float32)

        k_mean = self._stat('k_mean', self.k_mean)
        k_std = self._stat('k_std', self.k_std)
        eq_std = self._stat('eq_std', self.eq_std)
        if self.term == 'n2':
            eq = scalers.to_positive(coeffs[:, 0],
                                     self._stat('eq_mean', self.eq_mean),
                                     eq_std)
        else:
            eq = scalers.to_range(coeffs[:, 0], np.pi, eq_std)
        k = scalers.to_positive(coeffs[:, 1], k_mean, k_std)
        if self.gate:
            k = k * scalers.sigmoid_gate(coeffs[:, 2])
        return k, eq


class TorsionParameterHead(_ScalerStatistics, nn.Module):
    """Proper/improper head -> signed torsion amplitudes (T, n_periodicity)."""
    term: str                     # 'n4' | 'n4_improper'
    n_periodicity: int
    transformer_width: int
    transformer_depth: int
    n_heads: int
    symmetriser_depth: int
    symmetriser_width: int
    k_mean: Tuple[float, ...]
    k_std: Tuple[float, ...]
    gated: bool = True
    positional_encoding: bool = True
    wrong_symmetry: bool = False
    cutoff: float = 1e-4
    dropout: float = 0.0
    layer_norm: bool = True
    dtype: Optional[jnp.dtype] = None
    learnable_statistics: bool = False
    remat: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, h, idxs, deterministic: bool = True):
        if self.wrong_symmetry and self.term == 'n4_improper':
            perms = WRONG_SYMMETRY_IMPROPER
            pos_enc = WRONG_SYMMETRY_POS_ENC if self.positional_encoding else None
        else:
            perms = PERMUTATIONS[self.term]
            pos_enc = (POSITIONAL_ENCODINGS[self.term]
                       if self.positional_encoding else None)
        proj = self.transformer_width - (0 if pos_enc is None else len(pos_enc[0]))
        n_out = 2 * self.n_periodicity if self.gated else self.n_periodicity
        coeffs = TupleHead(
            arity=4, proj_feats=proj,
            transformer_layers=self.transformer_depth, n_heads=self.n_heads,
            hidden_feats=self.transformer_width,
            symmetriser_layers=self.symmetriser_depth,
            symmetriser_feats=self.symmetriser_width,
            out_feats=n_out, permutations=perms,
            positional_encoding=pos_enc,
            dropout=self.dropout, layer_norm=self.layer_norm,
            dtype=self.dtype, remat=self.remat, fused=self.fused,
            name='head',
        )(h, idxs, deterministic=deterministic)
        coeffs = coeffs.astype(jnp.float32)

        k_std = self._stat('k_std', self.k_std)[None, :self.n_periodicity]
        k_mean = self._stat('k_mean', self.k_mean)[None, :self.n_periodicity]
        if self.gated:
            gate = nn.sigmoid(coeffs[:, self.n_periodicity:])
            # gated: no mean shift, so the gate can express exact zeros
            k = coeffs[:, :self.n_periodicity] * gate * k_std
        else:
            k = coeffs * k_std + k_mean
        if self.cutoff > 0:
            k = scalers.hard_cutoff(k, self.cutoff)
        return k
