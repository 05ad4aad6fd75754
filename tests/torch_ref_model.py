"""Independent torch implementation of the reference Grappa forward pass.

This is a from-the-paper/state_dict-contract re-implementation of the
reference model architecture (reference: src/grappa/models/grappa.py:51-132,
graph_attention.py:48-448, interaction_parameters.py:10-562,
perm_equiv_transformer.py:13-319, network_utils.py:5-145, final_layer.py)
using only plain torch ops — DGL's DotGatConv / SAGEConv message passing is
re-derived from edge lists with index_add/edge-softmax, NOT via DGL.

Purpose: the full-stack checkpoint-import parity oracle. Module/buffer names
match the reference exactly, so

  * `export_state_dict(...)` output must `load_state_dict(strict=True)` here
    (naming-contract check), and
  * predictions must match the flax model numerically (math-contract check),

which together are the strongest available substitute for loading a real
grappa-1.2 `.pth` (no network egress in this environment).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import torch
import torch.nn as nn


# ---------------------------------------------------------------- primitives

class FeedForwardLayer(nn.Module):
    """Pre-LN one-hidden-layer MLP, optional repeat-interleave skip
    (reference network_utils.py:5-54)."""

    def __init__(self, in_feats, hidden_feats, out_feats, skip,
                 layer_norm=True):
        super().__init__()
        self.norm1 = nn.LayerNorm(in_feats) if layer_norm else nn.Identity()
        self.linear1 = nn.Linear(in_feats, hidden_feats)
        self.linear2 = nn.Linear(hidden_feats, out_feats)
        self.skip = skip
        self.in_feats, self.out_feats = in_feats, out_feats

    def forward(self, x):
        h = self.norm1(x)
        out = self.linear2(torch.nn.functional.elu(self.linear1(h)))
        if self.skip:
            if self.out_feats != self.in_feats:
                h = h.repeat_interleave(self.out_feats // self.in_feats,
                                        dim=-1)
            out = out + h
        return out


class DottedAttWithMLP(nn.Module):
    """Pre-LN MHA + FF block (reference network_utils.py:57-133)."""

    def __init__(self, n_feats, num_heads, hidden_feats, layer_norm=True):
        super().__init__()
        self.norm1 = nn.LayerNorm(n_feats) if layer_norm else nn.Identity()
        self.attn = nn.MultiheadAttention(n_feats, num_heads)
        self.ff = FeedForwardLayer(n_feats, hidden_feats, n_feats, skip=True,
                                   layer_norm=layer_norm)

    def forward(self, x):        # (S, T, F) seq-first
        x = self.norm1(x)
        a, _ = self.attn(x, x, x, need_weights=False)
        return self.ff(a + x)


class PositionalEncoding(nn.Module):
    """Sinusoidal encoding of partial charges
    (reference graph_attention.py:418-444)."""

    def __init__(self, dimension=16, min_value=-2.0, max_value=2.0):
        super().__init__()
        self.dimension = dimension
        self.min_value, self.max_value = min_value, max_value

    def forward(self, values):
        values = torch.clamp(values, self.min_value, self.max_value)
        scaled = (values + self.max_value) / (self.max_value - self.min_value)
        half = self.dimension // 2
        freqs = torch.exp(torch.arange(half, dtype=torch.float32)
                          * (-math.log(10000.0) / half))
        enc = torch.zeros(len(values), self.dimension)
        enc[:, 0::2] = torch.sin(scaled[:, None] * freqs)
        enc[:, 1::2] = torch.cos(scaled[:, None] * freqs)
        return enc


class ToPositive(nn.Module):
    """std*(elu(mean/std + x - 1)+1) + min (reference final_layer.py:11-52)."""

    def __init__(self, mean=1.0, std=1.0, min_=0.0):
        super().__init__()
        self.register_buffer('mean_over_std', torch.tensor(float(mean / std)))
        self.register_buffer('std', torch.tensor(float(std)))
        self.register_buffer('min_', torch.tensor(float(min_)))

    def forward(self, x):
        return self.std * (torch.nn.functional.elu(
            self.mean_over_std + x - 1) + 1) + self.min_


class ToRange(nn.Module):
    """max*sigmoid(std/max * x) (reference final_layer.py:54-97)."""

    def __init__(self, max_=math.pi, std=1.0):
        super().__init__()
        self.register_buffer('std_over_max', torch.tensor(float(std / max_)))
        self.register_buffer('max', torch.tensor(float(max_)))

    def forward(self, x):
        return self.max * torch.sigmoid(self.std_over_max * x)


# --------------------------------------------------------- message passing

class DotGatConv(nn.Module):
    """DGL DotGatConv re-derived on edge lists: shared bias-free projection,
    dot scores / sqrt(d_head), edge-softmax over incoming edges, message =
    projected source feature (reference graph_attention.py:226-310 uses the
    DGL kernel; semantics from the DGL docs)."""

    def __init__(self, in_feats, out_feats_per_head, num_heads):
        super().__init__()
        self.fc = nn.Linear(in_feats, out_feats_per_head * num_heads,
                            bias=False)
        self.num_heads = num_heads
        self.dh = out_feats_per_head

    def forward(self, h, edges):
        # edges: (2, E) int64, row 0 = src (message sender), row 1 = dst
        n = h.shape[0]
        feat = self.fc(h).view(n, self.num_heads, self.dh)
        src, dst = edges[0], edges[1]
        scores = (feat[src] * feat[dst]).sum(-1) / math.sqrt(self.dh)  # (E,H)
        # edge softmax over incoming edges of each dst node
        smax = torch.full((n, self.num_heads), -torch.inf)
        smax = smax.scatter_reduce(0, dst[:, None].expand_as(scores), scores,
                                   'amax', include_self=True)
        ex = torch.exp(scores - smax[dst])
        denom = torch.zeros(n, self.num_heads).index_add(0, dst, ex)
        alpha = ex / denom.clamp(min=1e-38)[dst]                       # (E,H)
        out = torch.zeros(n, self.num_heads, self.dh).index_add(
            0, dst, alpha[:, :, None] * feat[src])
        return out                                    # (N, H, dh)


class SAGEConv(nn.Module):
    """DGL SAGEConv, mean aggregator: fc_self(h) + fc_neigh(mean_in(h))."""

    def __init__(self, in_feats, out_feats):
        super().__init__()
        self.fc_self = nn.Linear(in_feats, out_feats, bias=False)
        self.fc_neigh = nn.Linear(in_feats, out_feats)

    def forward(self, h, edges):
        n = h.shape[0]
        src, dst = edges[0], edges[1]
        agg = torch.zeros(n, h.shape[1]).index_add(0, dst, h[src])
        deg = torch.zeros(n).index_add(0, dst, torch.ones(len(dst)))
        mean = agg / deg.clamp(min=1.0)[:, None]
        return self.fc_self(h) + self.fc_neigh(mean)


class ResidualAttentionBlock(nn.Module):
    """reference graph_attention.py:188-310."""

    def __init__(self, feats, num_heads):
        super().__init__()
        self.layer_norm = nn.LayerNorm(feats)
        self.graph_module = DotGatConv(feats, feats // num_heads, num_heads)
        self.head_reducer = nn.Linear(feats, feats)
        self.interaction_norm = nn.LayerNorm(feats)
        self.self_interaction = nn.Sequential(
            nn.Linear(feats, 4 * feats), nn.ELU(),
            nn.Linear(4 * feats, feats), nn.ELU())

    def forward(self, h, edges):
        h = self.layer_norm(h)
        h_skip = h
        h = self.graph_module(h, edges).flatten(-2, -1)
        h = self.head_reducer(h) + h_skip
        h = self.interaction_norm(h)
        return self.self_interaction(h) + h


class ResidualConvBlock(nn.Module):
    """reference graph_attention.py:314-415."""

    def __init__(self, feats):
        super().__init__()
        self.layer_norm = nn.LayerNorm(feats)
        self.graph_module = SAGEConv(feats, feats)
        self.interaction_norm = nn.LayerNorm(feats)
        self.self_interaction = nn.Sequential(nn.Linear(feats, feats),
                                              nn.ELU())

    def forward(self, h, edges):
        h = self.layer_norm(h)
        h_skip = h
        h = torch.nn.functional.elu(self.graph_module(h, edges)) + h_skip
        h = self.interaction_norm(h)
        return self.self_interaction(h) + h


class GrappaGNN(nn.Module):
    """reference graph_attention.py:48-183 (incl. the `blocks` ModuleList
    alias the reference registers, so state_dict keys line up exactly)."""

    def __init__(self, in_feats, node_feats, out_feats, n_conv, n_att,
                 n_heads):
        super().__init__()
        self.charge_encoder = PositionalEncoding(16, -2, 2)
        self.pre_dense = nn.Sequential(nn.Linear(in_feats + 16, node_feats),
                                       nn.ELU())
        self.conv_blocks = nn.ModuleList(
            [ResidualConvBlock(node_feats) for _ in range(n_conv)])
        self.att_blocks = nn.ModuleList(
            [ResidualAttentionBlock(node_feats, n_heads)
             for _ in range(n_att)])
        self.post_dense = nn.Sequential(nn.Linear(node_feats, out_feats))
        if n_conv + n_att > 0:
            self.blocks = self.conv_blocks + self.att_blocks

    def forward(self, in_feature, partial_charge, edges):
        x = torch.cat([in_feature, self.charge_encoder(partial_charge)],
                      dim=-1)
        h = self.pre_dense(x)
        for blk in self.conv_blocks:
            h = blk(h, edges)
        for blk in self.att_blocks:
            h = blk(h, edges)
        return self.post_dense(h)


# ----------------------------------------------------------------- writers

class RepProjector(nn.Module):
    """reference interaction_parameters.py:140-180."""

    def __init__(self, in_feats, out_feats):
        super().__init__()
        self.mlp = nn.Sequential(nn.Linear(in_feats, out_feats), nn.ELU())

    def forward(self, h, idxs):           # idxs: (T, arity)
        tuples = self.mlp(h)[idxs]        # (T, arity, F)
        return tuples.transpose(0, 1).contiguous()   # (arity, T, F)


class GrappaTransformer(nn.Module):
    """reference perm_equiv_transformer.py:75-190."""

    def __init__(self, n_feats, n_heads, hidden_feats, n_layers,
                 positional_encoding: Optional[Sequence[Sequence[float]]]):
        super().__init__()
        if positional_encoding is not None:
            self.register_buffer(
                'positional_encoding',
                torch.tensor(positional_encoding, dtype=torch.float32))
            n_feats = n_feats + self.positional_encoding.shape[1]
        else:
            self.positional_encoding = None
        self.transformer = nn.Sequential(*[
            DottedAttWithMLP(n_feats, n_heads, hidden_feats)
            for _ in range(n_layers)])

    def forward(self, x):                 # (S, T, F)
        if self.positional_encoding is not None:
            pos = self.positional_encoding.unsqueeze(1).repeat(
                1, x.shape[1], 1)
            x = torch.cat([x, pos], dim=-1)
        return self.transformer(x)


class Symmetriser(nn.Module):
    """reference perm_equiv_transformer.py:194-319."""

    def __init__(self, in_feats, out_feats, permutations, hidden_feats,
                 n_layers):
        super().__init__()
        self.permutations_list = [list(p) for p in permutations]
        # the reference registers the permutation set and its prefactors as
        # buffers (perm_equiv_transformer.py:318-319), so the published .pth
        # contains them — mirror that for key-for-key state_dict parity
        self.register_buffer('permutations',
                             torch.tensor(self.permutations_list,
                                          dtype=torch.int32))
        self.register_buffer('permutation_prefactors',
                             torch.ones(len(self.permutations_list),
                                        dtype=torch.float32))
        n_seq = len(self.permutations_list[0])
        layers = [FeedForwardLayer(
            in_feats * n_seq, hidden_feats,
            hidden_feats if n_layers > 1 else out_feats, skip=False)]
        for i in range(1, n_layers):
            layers.append(FeedForwardLayer(
                hidden_feats, hidden_feats,
                hidden_feats if i != n_layers - 1 else out_feats,
                skip=(i != n_layers - 1)))
        self.mlp = nn.Sequential(*layers)

    def forward(self, x):                 # (S, T, F)
        outs = 0
        for p in self.permutations_list:
            flat = x[p].transpose(0, 1).reshape(x.shape[1], -1)
            outs = outs + self.mlp(flat)
        return outs                        # (T, out)


class SymmetrisedTransformer(nn.Module):
    def __init__(self, n_feats, n_heads, hidden_feats, n_layers, out_feats,
                 permutations, symmetriser_layers, symmetriser_hidden_feats,
                 positional_encoding):
        super().__init__()
        self.grappa_transformer = GrappaTransformer(
            n_feats, n_heads, hidden_feats, n_layers, positional_encoding)
        pos_dim = (0 if positional_encoding is None
                   else len(positional_encoding[0]))
        self.symmetriser = Symmetriser(
            n_feats + pos_dim, out_feats, permutations,
            symmetriser_hidden_feats, symmetriser_layers)

    def forward(self, x):
        return self.symmetriser(self.grappa_transformer(x))


_PERMS = {
    'bond': [[0, 1], [1, 0]],
    'angle': [[0, 1, 2], [2, 1, 0]],
    'proper': [[0, 1, 2, 3], [3, 2, 1, 0]],
    'improper': [[0, 1, 2, 3], [3, 1, 2, 0]],
}
_POS_ENC = {
    'bond': None,
    'angle': [[0.0], [1.0], [0.0]],
    'proper': [[0.0], [1.0], [1.0], [0.0]],
    'improper': [[0.0], [1.0], [1.0], [0.0]],
}


class WriteBondParameters(nn.Module):
    """reference interaction_parameters.py:183-266."""

    def __init__(self, rep_feats, width, depth, heads, sym_depth, sym_width,
                 k_mean, k_std, eq_mean, eq_std):
        super().__init__()
        self.rep_projector = RepProjector(rep_feats, width)
        self.bond_model = SymmetrisedTransformer(
            width, heads, width, depth, 2, _PERMS['bond'], sym_depth,
            sym_width, None)
        self.to_k = ToPositive(k_mean, k_std)
        self.to_eq = ToPositive(eq_mean, eq_std)

    def forward(self, h, idxs):
        coeffs = self.bond_model(self.rep_projector(h, idxs))
        return self.to_k(coeffs[:, 1]), self.to_eq(coeffs[:, 0])


class WriteAngleParameters(nn.Module):
    """reference interaction_parameters.py:270-362."""

    def __init__(self, rep_feats, width, depth, heads, sym_depth, sym_width,
                 k_mean, k_std, eq_std):
        super().__init__()
        self.rep_projector = RepProjector(rep_feats, width - 1)
        self.angle_model = SymmetrisedTransformer(
            width - 1, heads, width, depth, 2, _PERMS['angle'], sym_depth,
            sym_width, _POS_ENC['angle'])
        self.to_k = ToPositive(k_mean, k_std)
        self.to_eq = ToRange(math.pi, eq_std)

    def forward(self, h, idxs):
        coeffs = self.angle_model(self.rep_projector(h, idxs))
        return self.to_k(coeffs[:, 1]), self.to_eq(coeffs[:, 0])


class WriteTorsionParameters(nn.Module):
    """reference interaction_parameters.py:368-562 (gated form)."""

    def __init__(self, rep_feats, width, depth, heads, sym_depth, sym_width,
                 n_periodicity, improper, k_mean, k_std, gated=True,
                 cutoff=1e-4):
        super().__init__()
        kind = 'improper' if improper else 'proper'
        self.rep_projector = RepProjector(rep_feats, width - 1)
        n_out = 2 * n_periodicity if gated else n_periodicity
        self.torsion_model = SymmetrisedTransformer(
            width - 1, heads, width, depth, n_out, _PERMS[kind], sym_depth,
            sym_width, _POS_ENC[kind])
        self.register_buffer('n_periodicity',
                             torch.tensor(n_periodicity).long())
        self.register_buffer('k_mean', torch.tensor([k_mean],
                                                    dtype=torch.float32))
        self.register_buffer('k_std', torch.tensor([k_std],
                                                   dtype=torch.float32))
        self.gated = gated
        self.cutoff = cutoff

    def forward(self, h, idxs):
        n_per = int(self.n_periodicity)
        if idxs.shape[0] == 0:     # reference interaction_parameters.py:532
            return torch.zeros((0, n_per))
        coeffs = self.torsion_model(self.rep_projector(h, idxs))
        if self.gated:
            gate = torch.sigmoid(coeffs[:, n_per:])
            coeffs = coeffs[:, :n_per] * gate * self.k_std
        else:
            coeffs = coeffs * self.k_std + self.k_mean
        if self.cutoff > 0:
            coeffs = torch.where(torch.abs(coeffs) > self.cutoff, coeffs,
                                 torch.zeros_like(coeffs))
        return coeffs


class WriteParameters(nn.Module):
    def __init__(self, cfg, stats):
        super().__init__()
        rep = cfg['graph_node_features']

        def w(name):
            return (cfg[f'{name}_transformer_width'],
                    cfg[f'{name}_transformer_depth'], cfg[f'{name}_n_heads'],
                    cfg[f'{name}_symmetriser_depth'],
                    cfg[f'{name}_symmetriser_width'])

        m, s = stats['mean'], stats['std']
        self.bond_writer = WriteBondParameters(
            rep, *w('bond'), k_mean=m['n2_k'][0], k_std=s['n2_k'][0],
            eq_mean=m['n2_eq'][0], eq_std=s['n2_eq'][0])
        self.angle_writer = WriteAngleParameters(
            rep, *w('angle'), k_mean=m['n3_k'][0], k_std=s['n3_k'][0],
            eq_std=s['n3_eq'][0])
        npp = cfg['n_periodicity_proper']
        npi = cfg['n_periodicity_improper']
        self.proper_writer = WriteTorsionParameters(
            rep, *w('proper'), n_periodicity=npp, improper=False,
            k_mean=_pad(m['n4_k'], npp, 0.0), k_std=_pad(s['n4_k'], npp, 1.0),
            gated=cfg['gated_torsion'], cutoff=cfg['torsion_cutoff'])
        self.improper_writer = WriteTorsionParameters(
            rep, *w('improper'), n_periodicity=npi, improper=True,
            k_mean=_pad(m['n4_improper_k'], npi, 0.0),
            k_std=_pad(s['n4_improper_k'], npi, 1.0),
            gated=cfg['gated_torsion'], cutoff=cfg['torsion_cutoff'])

    def forward(self, h, term_idxs):
        n2_k, n2_eq = self.bond_writer(h, term_idxs['n2'])
        n3_k, n3_eq = self.angle_writer(h, term_idxs['n3'])
        return {
            'n2_k': n2_k, 'n2_eq': n2_eq, 'n3_k': n3_k, 'n3_eq': n3_eq,
            'n4_k': self.proper_writer(h, term_idxs['n4']),
            'n4_improper_k': self.improper_writer(h,
                                                  term_idxs['n4_improper']),
        }


def _pad(vals, n, fill):
    vals = list(float(v) for v in vals)
    while len(vals) < n:
        vals.append(fill)
    return vals[:n]


class TorchReferenceModel(nn.Module):
    """The reference GrappaModel forward, torch-only, reference naming."""

    def __init__(self, cfg: Dict, stats: Dict, in_feats: int):
        super().__init__()
        self.gnn = GrappaGNN(
            in_feats, cfg['gnn_width'], cfg['graph_node_features'],
            cfg['gnn_convolutions'], cfg['gnn_attentional_layers'],
            cfg['gnn_attention_heads'])
        self.parameter_writer = WriteParameters(cfg, stats)

    def forward(self, in_feature, partial_charge, edges, term_idxs):
        h = self.gnn(in_feature, partial_charge, edges)
        return self.parameter_writer(h, term_idxs)
