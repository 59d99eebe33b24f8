"""Test-only torch oracle for TFC-TDF v3 (MDX23C) with checkpoint-identical
state_dict keys. Test scaffolding, not shipped code."""

import torch
import torch.nn.functional as F
from torch import nn


def _norm(norm_type, c):
    if norm_type == "BatchNorm":
        return nn.BatchNorm2d(c)
    if norm_type == "InstanceNorm":
        return nn.InstanceNorm2d(c, affine=True)
    if norm_type and norm_type.startswith("GroupNorm"):
        return nn.GroupNorm(int(norm_type.replace("GroupNorm", "")), c)
    return nn.Identity()


def _act(act_type):
    return nn.GELU() if act_type == "gelu" else nn.ReLU()


class TFCTDF(nn.Module):
    def __init__(self, in_c, c, l, f, bn, norm_type, act_type):
        super().__init__()
        self.blocks = nn.ModuleList()
        for _ in range(l):
            block = nn.Module()
            block.tfc1 = nn.Sequential(_norm(norm_type, in_c), _act(act_type),
                                       nn.Conv2d(in_c, c, 3, 1, 1, bias=False))
            block.tdf = nn.Sequential(_norm(norm_type, c), _act(act_type),
                                      nn.Linear(f, f // bn, bias=False),
                                      _norm(norm_type, c), _act(act_type),
                                      nn.Linear(f // bn, f, bias=False))
            block.tfc2 = nn.Sequential(_norm(norm_type, c), _act(act_type),
                                       nn.Conv2d(c, c, 3, 1, 1, bias=False))
            block.shortcut = nn.Conv2d(in_c, c, 1, 1, 0, bias=False)
            self.blocks.append(block)
            in_c = c

    def forward(self, x):
        for block in self.blocks:
            s = block.shortcut(x)
            x = block.tfc1(x)
            x = x + block.tdf(x)
            x = block.tfc2(x)
            x = x + s
        return x


class Scale(nn.Module):
    def __init__(self, in_c, out_c, scale, norm_type, act_type, up):
        super().__init__()
        conv = (nn.ConvTranspose2d(in_c, out_c, scale, scale, bias=False) if up
                else nn.Conv2d(in_c, out_c, scale, scale, bias=False))
        self.conv = nn.Sequential(_norm(norm_type, in_c), _act(act_type), conv)

    def forward(self, x):
        return self.conv(x)


class TFCTDFNetOracle(nn.Module):
    """Spectrogram-domain body of TFC_TDF_net (STFT handled by the caller so
    the oracle tests the network math; the packed STFT is covered by
    tests/test_stft.py)."""

    def __init__(self, num_subbands=2, num_scales=2, scale=(2, 2), l=1, c=8,
                 g=8, bn=2, dim_f=64, num_stems=2, norm_type="InstanceNorm",
                 act_type="gelu", audio_channels=2):
        super().__init__()
        self.num_subbands = num_subbands
        self.num_stems = num_stems
        dim_c = num_subbands * audio_channels * 2
        f = dim_f // num_subbands
        self.first_conv = nn.Conv2d(dim_c, c, 1, 1, 0, bias=False)
        self.encoder_blocks = nn.ModuleList()
        for _ in range(num_scales):
            block = nn.Module()
            block.tfc_tdf = TFCTDF(c, c, l, f, bn, norm_type, act_type)
            block.downscale = Scale(c, c + g, scale, norm_type, act_type, up=False)
            f //= scale[1]
            c += g
            self.encoder_blocks.append(block)
        self.bottleneck_block = TFCTDF(c, c, l, f, bn, norm_type, act_type)
        self.decoder_blocks = nn.ModuleList()
        for _ in range(num_scales):
            block = nn.Module()
            block.upscale = Scale(c, c - g, scale, norm_type, act_type, up=True)
            f *= scale[1]
            c -= g
            block.tfc_tdf = TFCTDF(2 * c, c, l, f, bn, norm_type, act_type)
            self.decoder_blocks.append(block)
        self.final_conv = nn.Sequential(
            nn.Conv2d(c + dim_c, c, 1, 1, 0, bias=False), _act(act_type),
            nn.Conv2d(c, num_stems * dim_c, 1, 1, 0, bias=False))

    def forward(self, spec):  # (B, C*2, dim_f, T) packed
        k = self.num_subbands
        b, c, f, t = spec.shape
        x = spec.reshape(b, c, k, f // k, t).reshape(b, c * k, f // k, t)
        mix = x
        first = x = self.first_conv(x)
        x = x.transpose(-1, -2)
        outs = []
        for block in self.encoder_blocks:
            x = block.tfc_tdf(x)
            outs.append(x)
            x = block.downscale(x)
        x = self.bottleneck_block(x)
        for block in self.decoder_blocks:
            x = block.upscale(x)
            x = torch.cat([x, outs.pop()], 1)
            x = block.tfc_tdf(x)
        x = x.transpose(-1, -2)
        x = x * first
        x = self.final_conv(torch.cat([mix, x], 1))
        b2, c2, f2, t2 = x.shape
        x = x.reshape(b2, c2 // k, k, f2, t2).reshape(b2, c2 // k, f2 * k, t2)
        if self.num_stems > 1:
            x = x.reshape(b2, self.num_stems, -1, f2 * k, t2)
        return x
