"""Test-only torch oracle for RoFormer numerics.

A compact, independent torch implementation of the BS/Mel-Band RoFormer
forward pass whose ``state_dict()`` uses the *same key layout as real UVR
checkpoints* (band_split.to_features.N.{0.gamma,1.weight}, layers.D.I.layers.
L.{0,1}.*, mask_estimators.S.to_freqs.N.0.*, final_norm.gamma). Used by tests
to validate both ``models/convert.py`` and ``models/roformer.py`` end-to-end
with random weights — no real checkpoints are required.

This file is test scaffolding, not part of the shipped framework.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn


class RMSNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return F.normalize(x, dim=-1) * math.sqrt(x.shape[-1]) * self.gamma


def rope_tables(n, dim_head, device):
    # rotary_embedding_torch convention: theta=10000, interleaved pairs.
    inv = 1.0 / (10000.0 ** (torch.arange(0, dim_head, 2, dtype=torch.float64) / dim_head))
    ang = torch.arange(n, dtype=torch.float64)[:, None] * inv[None, :]
    cos = ang.cos().repeat_interleave(2, dim=-1).float().to(device)
    sin = ang.sin().repeat_interleave(2, dim=-1).float().to(device)
    return cos, sin


def rope_rotate(x, cos, sin):
    x2 = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    rot = torch.stack([-x2[..., 1], x2[..., 0]], dim=-1).reshape(x.shape)
    return x * cos + rot * sin


class Attention(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        self.heads, self.dim_head = heads, dim_head
        inner = heads * dim_head
        self.norm = RMSNorm(dim)
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_gates = nn.Linear(dim, heads)
        self.to_out = nn.Sequential(nn.Linear(inner, dim, bias=False), nn.Dropout(0.0))

    def forward(self, x, rope=None):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        xn = self.norm(x)
        qkv = self.to_qkv(xn).reshape(b, n, 3, h, dh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if rope is not None:
            cos, sin = rope
            q, k = rope_rotate(q, cos, sin), rope_rotate(k, cos, sin)
        attn = torch.softmax(q @ k.transpose(-1, -2) * dh ** -0.5, dim=-1)
        out = attn @ v
        out = out * torch.sigmoid(self.to_gates(xn)).permute(0, 2, 1)[..., None]
        return self.to_out(out.permute(0, 2, 1, 3).reshape(b, n, h * dh))


class LinearAttention(nn.Module):
    """XCiT-style cross-covariance attention; state_dict keys match the
    reference LinearAttention (norm.gamma, to_qkv.0.weight, temperature,
    to_out.1.weight)."""

    def __init__(self, dim, heads, dim_head, scale=8):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head, self.scale = heads, dim_head, scale
        self.norm = RMSNorm(dim)
        self.to_qkv = nn.Sequential(nn.Linear(dim, inner * 3, bias=False))
        self.temperature = nn.Parameter(torch.ones(heads, 1, 1))
        self.to_out = nn.Sequential(nn.Identity(), nn.Linear(inner, dim, bias=False))

    def forward(self, x, rope=None):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        xn = self.norm(x)
        qkv = self.to_qkv(xn).reshape(b, n, 3, h, dh).permute(2, 0, 3, 4, 1)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (b, h, dh, n)
        q, k = F.normalize(q, dim=-1), F.normalize(k, dim=-1)
        q = q * self.temperature.exp()
        attn = torch.softmax(q @ k.transpose(-1, -2) * self.scale, dim=-1)
        out = attn @ v  # (b, h, dh, n)
        out = out.permute(0, 3, 1, 2).reshape(b, n, h * dh)
        return self.to_out(out)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.Sequential(
            RMSNorm(dim), nn.Linear(dim, inner), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(inner, dim), nn.Dropout(0.0),
        )

    def forward(self, x):
        return self.net(x)


class Transformer(nn.Module):
    def __init__(self, dim, depth, heads, dim_head, norm_output, linear=False):
        super().__init__()
        attn_cls = LinearAttention if linear else Attention
        self.layers = nn.ModuleList(
            [nn.ModuleList([attn_cls(dim, heads, dim_head), FeedForward(dim)])
             for _ in range(depth)]
        )
        self.norm = RMSNorm(dim) if norm_output else nn.Identity()

    def forward(self, x, rope=None):
        for attn, ff in self.layers:
            x = attn(x, rope) + x
            x = ff(x) + x
        return self.norm(x)


def mlp(dim_in, dim_out, hidden, depth, n_hidden=None):
    # `depth` follows bs_roformer.py:190 (`depth` linears); the mel file
    # builds one more hidden layer for the same depth value
    # (mel_band_roformer.py:149) — callers pass n_hidden to override.
    if n_hidden is None:
        n_hidden = depth - 1
    layers, dims = [], (dim_in, *([hidden] * n_hidden), dim_out)
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        layers.append(nn.Linear(a, b))
        if i < len(dims) - 2:
            layers.append(nn.Tanh())
    return nn.Sequential(*layers)


class RoformerOracle(nn.Module):
    """Covers both variants: band_bins is a list of per-band bin index lists.

    kind="bs": bands disjoint & contiguous → plain concat recombination.
    kind="mel": overlapping bands → scatter-add averaged by band counts.
    """

    def __init__(self, kind, band_bins, dim, depth, heads, dim_head, stereo,
                 num_stems, t_depth, f_depth, n_fft, hop, mask_depth, mult=4,
                 lin_depth=0):
        super().__init__()
        self.lin_depth = lin_depth
        self.kind, self.band_bins = kind, band_bins
        self.n_fft, self.hop = n_fft, hop
        self.stereo, self.num_stems = stereo, num_stems
        self.heads, self.dim_head = heads, dim_head
        s = 2 if stereo else 1
        self.s = s
        dims_in = [len(b) * s * 2 for b in band_bins]
        self.dims_in = dims_in

        self.band_split = nn.Module()
        self.band_split.to_features = nn.ModuleList(
            [nn.Sequential(RMSNorm(d), nn.Linear(d, dim)) for d in dims_in]
        )
        norm_output = kind == "mel"
        self.layers = nn.ModuleList(
            [nn.ModuleList(
                ([Transformer(dim, lin_depth, heads, dim_head, norm_output,
                              linear=True)] if lin_depth else [])
                + [
                    Transformer(dim, t_depth, heads, dim_head, norm_output),
                    Transformer(dim, f_depth, heads, dim_head, norm_output),
                ]) for _ in range(depth)]
        )
        if kind == "bs":
            self.final_norm = RMSNorm(dim)
        self.mask_estimators = nn.ModuleList()
        for _ in range(num_stems):
            est = nn.Module()
            n_hidden = mask_depth if kind == "mel" else mask_depth - 1
            est.to_freqs = nn.ModuleList(
                [nn.Sequential(mlp(dim, d * 2, dim * mult, mask_depth,
                                   n_hidden=n_hidden), nn.GLU(dim=-1))
                 for d in dims_in]
            )
            self.mask_estimators.append(est)

    def forward(self, audio):  # (B, S, T)
        b, s, t = audio.shape
        win = torch.hann_window(self.n_fft)
        spec = torch.stft(audio.reshape(b * s, t), n_fft=self.n_fft,
                          hop_length=self.hop, window=win, center=True,
                          return_complex=True)
        n_bins, tf = spec.shape[-2:]
        rows = spec.reshape(b, s, n_bins, tf).permute(0, 2, 1, 3).reshape(b, n_bins * s, tf)
        feats = torch.view_as_real(rows)  # (b, rows, tf, 2)
        x = feats.permute(0, 2, 1, 3).reshape(b, tf, n_bins * s * 2)

        bands = []
        for bins, net in zip(self.band_bins, self.band_split.to_features):
            idx = torch.tensor(
                [(f * s + c) * 2 + ri for f in bins for c in range(s) for ri in range(2)]
            )
            bands.append(net(x[..., idx]))
        x = torch.stack(bands, dim=-2)  # (b, tf, nb, dim)
        nb = x.shape[-2]

        t_rope = rope_tables(tf, self.dim_head, x.device)
        f_rope = rope_tables(nb, self.dim_head, x.device)
        dim = x.shape[-1]
        for trans in self.layers:
            if self.lin_depth:
                lin_tr, time_tr, freq_tr = trans
                flat = x.reshape(b, tf * nb, dim)
                x = lin_tr(flat).reshape(b, tf, nb, dim)
            else:
                time_tr, freq_tr = trans
            xt = x.permute(0, 2, 1, 3).reshape(b * nb, tf, dim)
            xt = time_tr(xt, t_rope)
            x = xt.reshape(b, nb, tf, dim).permute(0, 2, 1, 3)
            xf = x.reshape(b * tf, nb, dim)
            xf = freq_tr(xf, f_rope)
            x = xf.reshape(b, tf, nb, dim)

        if self.kind == "bs":
            x = self.final_norm(x)

        n_feat = n_bins * s * 2
        acc = torch.zeros(b, tf, self.num_stems, n_feat)
        counts = torch.zeros(n_feat)
        first = True
        for si, est in enumerate(self.mask_estimators):
            for bi, (bins, net) in enumerate(zip(self.band_bins, est.to_freqs)):
                idx = torch.tensor(
                    [(f * s + c) * 2 + ri for f in bins for c in range(s) for ri in range(2)]
                )
                out = net(x[:, :, bi])  # (b, tf, d_i)
                acc[:, :, si].index_add_(-1, idx, out)
                if first:
                    counts.index_add_(0, idx, torch.ones(len(idx)))
            first = False
        if self.kind == "mel":
            acc = acc / counts.clamp(min=1e-8)

        mask = acc.permute(0, 2, 3, 1).reshape(b, self.num_stems, n_bins * s, 2, tf)
        mask = torch.complex(mask[..., 0, :], mask[..., 1, :])
        spec_out = rows[:, None] * mask
        spec_out = spec_out.reshape(b, self.num_stems, n_bins, s, tf).permute(0, 1, 3, 2, 4)
        audio_out = torch.istft(spec_out.reshape(-1, n_bins, tf), n_fft=self.n_fft,
                                hop_length=self.hop, window=win, center=True)
        return audio_out.reshape(b, self.num_stems, s, -1)
