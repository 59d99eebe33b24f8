"""Test-only torch oracle for the VR networks (CascadedASPPNet v5 and
CascadedNet v5.1) with state_dict layouts identical to real UVR checkpoints.
Used to validate models/vr_nets.py numerics + conversion. Test scaffolding,
not shipped code."""

import torch
import torch.nn.functional as F
from torch import nn


class CBA(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, dilation=1, activ=nn.ReLU):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(nin, nout, ksize, stride, pad, dilation, bias=False),
            nn.BatchNorm2d(nout), activ())

    def forward(self, x):
        return self.conv(x)


class SepCBA(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, dilation=1, activ=nn.ReLU):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(nin, nin, ksize, stride, pad, dilation, groups=nin, bias=False),
            nn.Conv2d(nin, nout, 1, bias=False),
            nn.BatchNorm2d(nout), activ())

    def forward(self, x):
        return self.conv(x)


# ---------------------------------------------------------------- v5 blocks


class EncoderV5(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, activ=nn.LeakyReLU):
        super().__init__()
        self.conv1 = CBA(nin, nout, ksize, 1, pad, activ=activ)
        self.conv2 = CBA(nout, nout, ksize, stride, pad, activ=activ)

    def forward(self, x):
        skip = self.conv1(x)
        return self.conv2(skip), skip


def _crop_center(skip, target):
    t1, t2 = skip.shape[3], target.shape[3]
    if t1 == t2:
        return skip
    start = (t1 - t2) // 2
    return skip[:, :, :, start : start + t2]


class DecoderV5(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, activ=nn.ReLU):
        super().__init__()
        self.conv = CBA(nin, nout, ksize, 1, pad, activ=activ)

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        if skip is not None:
            x = torch.cat([x, _crop_center(skip, x)], dim=1)
        return self.conv(x)


class ASPPV5(nn.Module):
    def __init__(self, arch, nin, nout, dilations=(4, 8, 16), activ=nn.ReLU):
        super().__init__()
        self.arch = arch
        self.conv1 = nn.Sequential(nn.AdaptiveAvgPool2d((1, None)),
                                   CBA(nin, nin, 1, 1, 0, activ=activ))
        extra = SepCBA(nin, nin, 3, 1, dilations[2], dilations[2], activ=activ)
        self.conv2 = CBA(nin, nin, 1, 1, 0, activ=activ)
        self.conv3 = SepCBA(nin, nin, 3, 1, dilations[0], dilations[0], activ=activ)
        self.conv4 = SepCBA(nin, nin, 3, 1, dilations[1], dilations[1], activ=activ)
        self.conv5 = SepCBA(nin, nin, 3, 1, dilations[2], dilations[2], activ=activ)
        if arch in (129605,):
            self.conv6 = extra
            n = 6
        elif arch in (537238, 537227, 33966):
            self.conv6 = extra
            self.conv7 = extra
            n = 7
        else:
            n = 5
        self.bottleneck = nn.Sequential(CBA(nin * n, nout, 1, 1, 0, activ=activ),
                                        nn.Dropout2d(0.1))

    def forward(self, x):
        _, _, h, w = x.shape
        feats = [F.interpolate(self.conv1(x), size=(h, w), mode="bilinear",
                               align_corners=True),
                 self.conv2(x), self.conv3(x), self.conv4(x), self.conv5(x)]
        if self.arch in (129605,):
            feats.append(self.conv6(x))
        elif self.arch in (537238, 537227, 33966):
            feats.extend([self.conv6(x), self.conv7(x)])
        return self.bottleneck(torch.cat(feats, dim=1))


class BaseASPPNet(nn.Module):
    def __init__(self, arch, nin, ch, dilations=(4, 8, 16)):
        super().__init__()
        self.arch = arch
        self.enc1 = EncoderV5(nin, ch, 3, 2, 1)
        self.enc2 = EncoderV5(ch, ch * 2, 3, 2, 1)
        self.enc3 = EncoderV5(ch * 2, ch * 4, 3, 2, 1)
        self.enc4 = EncoderV5(ch * 4, ch * 8, 3, 2, 1)
        if arch == 129605:
            self.enc5 = EncoderV5(ch * 8, ch * 16, 3, 2, 1)
            self.aspp = ASPPV5(arch, ch * 16, ch * 32, dilations)
            self.dec5 = DecoderV5(ch * (16 + 32), ch * 16, 3, 1, 1)
        else:
            self.aspp = ASPPV5(arch, ch * 8, ch * 16, dilations)
        self.dec4 = DecoderV5(ch * (8 + 16), ch * 8, 3, 1, 1)
        self.dec3 = DecoderV5(ch * (4 + 8), ch * 4, 3, 1, 1)
        self.dec2 = DecoderV5(ch * (2 + 4), ch * 2, 3, 1, 1)
        self.dec1 = DecoderV5(ch * (1 + 2), ch, 3, 1, 1)

    def forward(self, x):
        h, e1 = self.enc1(x)
        h, e2 = self.enc2(h)
        h, e3 = self.enc3(h)
        h, e4 = self.enc4(h)
        if self.arch == 129605:
            h, e5 = self.enc5(h)
            h = self.aspp(h)
            h = self.dec5(h, e5)
        else:
            h = self.aspp(h)
        h = self.dec4(h, e4)
        h = self.dec3(h, e3)
        h = self.dec2(h, e2)
        return self.dec1(h, e1)


class CascadedASPPNetOracle(nn.Module):
    def __init__(self, n_fft, caps, arch):
        super().__init__()
        self.stg1_low_band_net = BaseASPPNet(arch, *caps[0])
        self.stg1_high_band_net = BaseASPPNet(arch, *caps[1])
        self.stg2_bridge = CBA(*caps[2])
        self.stg2_full_band_net = BaseASPPNet(arch, *caps[3])
        self.stg3_bridge = CBA(*caps[4])
        self.stg3_full_band_net = BaseASPPNet(arch, *caps[5])
        self.out = nn.Conv2d(*caps[6], bias=False)
        self.aux1_out = nn.Conv2d(*caps[7], bias=False)
        self.aux2_out = nn.Conv2d(*caps[8], bias=False)
        self.max_bin = n_fft // 2
        self.output_bin = n_fft // 2 + 1
        self.offset = 128

    def forward(self, x):
        x = x[:, :, : self.max_bin]
        bw = x.shape[2] // 2
        aux1 = torch.cat([self.stg1_low_band_net(x[:, :, :bw]),
                          self.stg1_high_band_net(x[:, :, bw:])], dim=2)
        h = torch.cat([x, aux1], dim=1)
        aux2 = self.stg2_full_band_net(self.stg2_bridge(h))
        h = torch.cat([x, aux1, aux2], dim=1)
        h = self.stg3_full_band_net(self.stg3_bridge(h))
        mask = torch.sigmoid(self.out(h))
        return F.pad(mask, (0, 0, 0, self.output_bin - mask.shape[2]), mode="replicate")

    def predict_mask(self, x):
        mask = self.forward(x)
        return mask[:, :, :, self.offset : -self.offset] if self.offset > 0 else mask


# -------------------------------------------------------------- v5.1 blocks


class EncoderV51(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, activ=nn.LeakyReLU):
        super().__init__()
        self.conv1 = CBA(nin, nout, ksize, stride, pad, activ=activ)
        self.conv2 = CBA(nout, nout, ksize, 1, pad, activ=activ)

    def forward(self, x):
        return self.conv2(self.conv1(x))


class DecoderV51(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, activ=nn.ReLU, dropout=False):
        super().__init__()
        self.conv1 = CBA(nin, nout, ksize, 1, pad, activ=activ)
        self.dropout = nn.Dropout2d(0.1) if dropout else None

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        if skip is not None:
            x = torch.cat([x, _crop_center(skip, x)], dim=1)
        return self.conv1(x)


class ASPPV51(nn.Module):
    def __init__(self, nin, nout, dilations=((4, 2), (8, 4), (12, 6)), dropout=True):
        super().__init__()
        self.conv1 = nn.Sequential(nn.AdaptiveAvgPool2d((1, None)),
                                   CBA(nin, nout, 1, 1, 0))
        self.conv2 = CBA(nin, nout, 1, 1, 0)
        self.conv3 = CBA(nin, nout, 3, 1, dilations[0], dilations[0])
        self.conv4 = CBA(nin, nout, 3, 1, dilations[1], dilations[1])
        self.conv5 = CBA(nin, nout, 3, 1, dilations[2], dilations[2])
        self.bottleneck = CBA(nout * 5, nout, 1, 1, 0)
        self.dropout = nn.Dropout2d(0.1) if dropout else None

    def forward(self, x):
        _, _, h, w = x.shape
        feats = [F.interpolate(self.conv1(x), size=(h, w), mode="bilinear",
                               align_corners=True),
                 self.conv2(x), self.conv3(x), self.conv4(x), self.conv5(x)]
        return self.bottleneck(torch.cat(feats, dim=1))


class LSTMModule(nn.Module):
    def __init__(self, nin_conv, nin_lstm, nout_lstm):
        super().__init__()
        self.conv = CBA(nin_conv, 1, 1, 1, 0)
        self.lstm = nn.LSTM(input_size=nin_lstm, hidden_size=nout_lstm // 2,
                            bidirectional=True)
        self.dense = nn.Sequential(nn.Linear(nout_lstm, nin_lstm),
                                   nn.BatchNorm1d(nin_lstm), nn.ReLU())

    def forward(self, x):
        n, _, nbins, nframes = x.shape
        h = self.conv(x)[:, 0]
        h = h.permute(2, 0, 1)
        h, _ = self.lstm(h)
        h = self.dense(h.reshape(-1, h.shape[-1]))
        h = h.reshape(nframes, n, 1, nbins)
        return h.permute(1, 2, 3, 0)


class BaseNetV51(nn.Module):
    def __init__(self, nin, nout, nin_lstm, nout_lstm,
                 dilations=((4, 2), (8, 4), (12, 6))):
        super().__init__()
        self.enc1 = CBA(nin, nout, 3, 1, 1)
        self.enc2 = EncoderV51(nout, nout * 2, 3, 2, 1)
        self.enc3 = EncoderV51(nout * 2, nout * 4, 3, 2, 1)
        self.enc4 = EncoderV51(nout * 4, nout * 6, 3, 2, 1)
        self.enc5 = EncoderV51(nout * 6, nout * 8, 3, 2, 1)
        self.aspp = ASPPV51(nout * 8, nout * 8, dilations, dropout=True)
        self.dec4 = DecoderV51(nout * (6 + 8), nout * 6, 3, 1, 1)
        self.dec3 = DecoderV51(nout * (4 + 6), nout * 4, 3, 1, 1)
        self.dec2 = DecoderV51(nout * (2 + 4), nout * 2, 3, 1, 1)
        self.lstm_dec2 = LSTMModule(nout * 2, nin_lstm, nout_lstm)
        self.dec1 = DecoderV51(nout * (1 + 2) + 1, nout, 3, 1, 1)

    def forward(self, x):
        e1 = self.enc1(x)
        e2 = self.enc2(e1)
        e3 = self.enc3(e2)
        e4 = self.enc4(e3)
        e5 = self.enc5(e4)
        h = self.aspp(e5)
        h = self.dec4(h, e4)
        h = self.dec3(h, e3)
        h = self.dec2(h, e2)
        h = torch.cat([h, self.lstm_dec2(h)], dim=1)
        return self.dec1(h, e1)


class CascadedNetOracle(nn.Module):
    def __init__(self, n_fft, nout=32, nout_lstm=128):
        super().__init__()
        self.max_bin = n_fft // 2
        self.output_bin = n_fft // 2 + 1
        self.nin_lstm = self.max_bin // 2
        self.offset = 64
        self.stg1_low_band_net = nn.Sequential(
            BaseNetV51(2, nout // 2, self.nin_lstm // 2, nout_lstm),
            CBA(nout // 2, nout // 4, 1, 1, 0))
        self.stg1_high_band_net = BaseNetV51(2, nout // 4, self.nin_lstm // 2, nout_lstm // 2)
        self.stg2_low_band_net = nn.Sequential(
            BaseNetV51(nout // 4 + 2, nout, self.nin_lstm // 2, nout_lstm),
            CBA(nout, nout // 2, 1, 1, 0))
        self.stg2_high_band_net = BaseNetV51(nout // 4 + 2, nout // 2,
                                             self.nin_lstm // 2, nout_lstm // 2)
        self.stg3_full_band_net = BaseNetV51(3 * nout // 4 + 2, nout,
                                             self.nin_lstm, nout_lstm)
        self.out = nn.Conv2d(nout, 2, 1, bias=False)
        self.aux_out = nn.Conv2d(3 * nout // 4, 2, 1, bias=False)

    def forward(self, x):
        x = x[:, :, : self.max_bin]
        bw = x.shape[2] // 2
        l1_in, h1_in = x[:, :, :bw], x[:, :, bw:]
        l1 = self.stg1_low_band_net(l1_in)
        h1 = self.stg1_high_band_net(h1_in)
        aux1 = torch.cat([l1, h1], dim=2)
        l2 = self.stg2_low_band_net(torch.cat([l1_in, l1], dim=1))
        h2 = self.stg2_high_band_net(torch.cat([h1_in, h1], dim=1))
        aux2 = torch.cat([l2, h2], dim=2)
        f3 = self.stg3_full_band_net(torch.cat([x, aux1, aux2], dim=1))
        mask = torch.sigmoid(self.out(f3))
        return F.pad(mask, (0, 0, 0, self.output_bin - mask.shape[2]), mode="replicate")

    def predict_mask(self, x):
        mask = self.forward(x)
        return mask[:, :, :, self.offset : -self.offset] if self.offset > 0 else mask
