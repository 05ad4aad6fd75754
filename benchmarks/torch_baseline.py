"""Torch-CPU baseline: the same model architecture + training step implemented
with torch, serving as the reference-class baseline for bench.py.

The reference framework is a torch/DGL training loop (reference:
src/grappa/training/lightning_model.py:205-230); this proxy mirrors OUR
architecture (identical layer counts, widths, head structure and the
energy/force double-backward) in plain torch on the same batch arrays, so the
bench ratio measures JAX/XLA-on-TPU vs torch-on-host for the same compute —
a conservative baseline, since the reference's sparse DGL kernels and
per-molecule Python loss loop are slower than this dense proxy.
"""
from __future__ import annotations

import math
from typing import Dict

import numpy as np
import torch
import torch.nn as nn


class FF(nn.Module):
    def __init__(self, in_f, hidden, out_f, skip=False):
        super().__init__()
        self.norm = nn.LayerNorm(in_f)
        self.l1 = nn.Linear(in_f, hidden)
        self.l2 = nn.Linear(hidden, out_f)
        self.skip = skip

    def forward(self, x):
        h = self.norm(x)
        out = self.l2(torch.nn.functional.elu(self.l1(h)))
        return out + h if self.skip else out


class AttBlock(nn.Module):
    """Neighbor-list graph attention block (same math as the JAX model)."""

    def __init__(self, width, heads):
        super().__init__()
        self.norm = nn.LayerNorm(width)
        self.fc = nn.Linear(width, width, bias=False)
        self.heads = heads
        self.dh = width // heads
        self.head_reducer = nn.Linear(width, width)
        self.inorm = nn.LayerNorm(width)
        self.si1 = nn.Linear(width, 4 * width)
        self.si2 = nn.Linear(4 * width, width)

    def forward(self, h, neighbors, nbr_mask):
        h = self.norm(h)
        skip = h
        n = h.shape[0]
        feat = self.fc(h).view(n, self.heads, self.dh)
        nbr = feat[neighbors]                       # (N, D, H, dh)
        scores = torch.einsum('nhd,nkhd->nkh', feat, nbr) / math.sqrt(self.dh)
        scores = scores.masked_fill(~nbr_mask[:, :, None], -1e9)
        alpha = torch.softmax(scores, dim=1) * nbr_mask[:, :, None]
        out = torch.einsum('nkh,nkhd->nhd', alpha, nbr).reshape(n, -1)
        h = self.head_reducer(out) + skip
        h = self.inorm(h)
        skip = h
        x = torch.nn.functional.elu(self.si1(h))
        x = torch.nn.functional.elu(self.si2(x))
        return x + skip


class TupleHead(nn.Module):
    def __init__(self, rep, width, depth, heads, sym_depth, sym_width,
                 arity, out_f, pos_dim):
        super().__init__()
        self.proj = nn.Linear(rep, width - pos_dim)
        self.pos_dim = pos_dim
        self.blocks = nn.ModuleList()
        for _ in range(depth):
            self.blocks.append(nn.ModuleDict({
                'norm': nn.LayerNorm(width),
                'attn': nn.MultiheadAttention(width, heads, batch_first=True),
                'ff': FF(width, width, width, skip=True),
            }))
        self.sym = nn.ModuleList(
            [FF(arity * width * 2, sym_width, sym_width)]
            + [FF(sym_width, sym_width, sym_width, skip=True)
               for _ in range(max(0, sym_depth - 2))]
            + ([FF(sym_width, sym_width, out_f)] if sym_depth > 1 else []))
        self.arity = arity
        self.out_f = out_f

    def forward(self, h, idxs):
        x = torch.nn.functional.elu(self.proj(h))[idxs]   # (T, S, F')
        if self.pos_dim:
            pos = torch.zeros(x.shape[0], self.arity, self.pos_dim,
                              device=x.device)
            pos[:, 1:-1] = 1.0
            x = torch.cat([x, pos], dim=-1)
        for blk in self.blocks:
            y = blk['norm'](x)
            a, _ = blk['attn'](y, y, y, need_weights=False)
            x = blk['ff'](a + y)
        # two permutations (identity + reversal), shared MLP, sum
        t = x.shape[0]
        flat = torch.cat([x.reshape(t, -1), x.flip(1).reshape(t, -1)], dim=-1)
        out = flat
        for layer in self.sym:
            out = layer(out)
        return out


class TorchProxy(nn.Module):
    """Default-config-sized model: in -> 512 GNN(7 att, 16 heads) -> 256 ->
    four heads (depth 3, width 512, symmetriser 3x256)."""

    def __init__(self, in_feats, width=512, out=256, n_att=7, heads=16):
        super().__init__()
        self.pre = nn.Linear(in_feats + 16, width)
        self.blocks = nn.ModuleList([AttBlock(width, heads)
                                     for _ in range(n_att)])
        self.post = nn.Linear(width, out)
        self.bond = TupleHead(out, 512, 3, 8, 3, 256, 2, 2, 0)
        self.angle = TupleHead(out, 512, 3, 8, 3, 256, 3, 2, 1)
        self.proper = TupleHead(out, 512, 3, 8, 3, 256, 4, 12, 1)
        self.improper = TupleHead(out, 512, 3, 8, 3, 256, 4, 6, 1)

    def forward(self, feats, charges, neighbors, nbr_mask, term_idxs):
        half = 8
        freqs = torch.exp(torch.arange(half, dtype=torch.float32)
                          * (-math.log(10000.0) / half))
        scaled = (charges.clamp(-2, 2) + 2) / 4
        enc = torch.zeros(len(charges), 16)
        enc[:, 0::2] = torch.sin(scaled[:, None] * freqs)
        enc[:, 1::2] = torch.cos(scaled[:, None] * freqs)
        h = torch.nn.functional.elu(self.pre(torch.cat([feats, enc], dim=-1)))
        for blk in self.blocks:
            h = blk(h, neighbors, nbr_mask)
        h = self.post(h)
        bond = self.bond(h, term_idxs['n2'])
        angle = self.angle(h, term_idxs['n3'])
        proper = self.proper(h, term_idxs['n4'])
        improper = self.improper(h, term_idxs['n4_improper'])
        return {
            'n2_k': torch.nn.functional.elu(bond[:, 0]) + 1.5,
            'n2_eq': torch.nn.functional.elu(bond[:, 1]) + 1.5,
            'n3_k': torch.nn.functional.elu(angle[:, 0]) + 1.5,
            'n3_eq': math.pi * torch.sigmoid(angle[:, 1]),
            'n4_k': proper[:, :6] * torch.sigmoid(proper[:, 6:]),
            'n4_improper_k': improper[:, :3] * torch.sigmoid(improper[:, 3:]),
        }


def mm_energy_torch(params: Dict[str, torch.Tensor], xyz: torch.Tensor,
                    term_idxs, term_mol, num_mols: int):
    """Bonded energy (M, C) with autograd-capable xyz."""
    energy = torch.zeros(num_mols + 1, xyz.shape[1])

    b = term_idxs['n2']
    r = torch.linalg.norm(xyz[b[:, 0]] - xyz[b[:, 1]], dim=-1)
    e2 = 0.5 * params['n2_k'][:, None] * (r - params['n2_eq'][:, None]) ** 2
    energy = energy.index_add(0, term_mol['n2'], e2)

    a = term_idxs['n3']
    u = xyz[a[:, 0]] - xyz[a[:, 1]]
    v = xyz[a[:, 2]] - xyz[a[:, 1]]
    cross = torch.linalg.norm(torch.cross(u, v, dim=-1), dim=-1)
    theta = torch.atan2(cross + 1e-10, (u * v).sum(-1))
    e3 = 0.5 * params['n3_k'][:, None] * (theta - params['n3_eq'][:, None]) ** 2
    energy = energy.index_add(0, term_mol['n3'], e3)

    for term, key in (('n4', 'n4_k'), ('n4_improper', 'n4_improper_k')):
        p = term_idxs[term]
        r01 = xyz[p[:, 1]] - xyz[p[:, 0]]
        r21 = xyz[p[:, 1]] - xyz[p[:, 2]]
        r23 = xyz[p[:, 3]] - xyz[p[:, 2]]
        n1 = torch.cross(r01, r21, dim=-1)
        n2 = torch.cross(r21, r23, dim=-1)
        rn = r21 / (torch.linalg.norm(r21, dim=-1, keepdim=True) + 1e-10)
        y = (torch.cross(n1, n2, dim=-1) * rn).sum(-1)
        x = (n1 * n2).sum(-1)
        phi = torch.atan2(y + 1e-10, x + 1e-10)
        ks = params[key]
        n_per = ks.shape[1]
        ns = torch.arange(1, n_per + 1, dtype=torch.float32)
        e4 = (ks[:, :, None] * torch.cos(ns[None, :, None] * phi[:, None, :])
              ).sum(1)
        energy = energy.index_add(0, term_mol[term], e4)
    return energy[:num_mols]


def run_torch_baseline(batch_arrays: Dict, n_steps: int = 3,
                       n_warmup: int = 1) -> float:
    """Returns seconds per full training step (fwd + force + backward + Adam)."""
    import time

    feats = torch.tensor(batch_arrays['feats'])
    charges = torch.tensor(batch_arrays['charges'])
    neighbors = torch.tensor(batch_arrays['neighbors'], dtype=torch.long)
    nbr_mask = torch.tensor(batch_arrays['neighbor_mask'])
    xyz0 = torch.tensor(batch_arrays['xyz'])
    energy_ref = torch.tensor(batch_arrays['energy_ref'])
    gradient_ref = torch.tensor(batch_arrays['gradient_ref'])
    term_idxs = {k: torch.tensor(v, dtype=torch.long)
                 for k, v in batch_arrays['term_idxs'].items()}
    term_mol = {k: torch.tensor(v, dtype=torch.long)
                for k, v in batch_arrays['term_mol'].items()}
    num_mols = int(batch_arrays['num_mols'])

    model = TorchProxy(in_feats=feats.shape[1])
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    def step():
        opt.zero_grad()
        xyz = xyz0.clone().requires_grad_(True)
        pred = model(feats, charges, neighbors, nbr_mask, term_idxs)
        energy = mm_energy_torch(pred, xyz, term_idxs, term_mol, num_mols)
        grad = torch.autograd.grad(energy.sum(), xyz, create_graph=True)[0]
        e_c = energy - energy.mean(dim=1, keepdim=True)
        ref_c = energy_ref - energy_ref.mean(dim=1, keepdim=True)
        loss = ((e_c - ref_c) ** 2).mean() + 0.8 * ((grad - gradient_ref) ** 2).mean()
        loss.backward()
        opt.step()

    for _ in range(n_warmup):
        step()
    t0 = time.time()
    for _ in range(n_steps):
        step()
    return (time.time() - t0) / n_steps
