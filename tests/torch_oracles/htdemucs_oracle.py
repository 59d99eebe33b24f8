"""Test-only torch oracle for HTDemucs with checkpoint-identical state_dict
keys. Covers the Demucs v4 configuration family (cac, dense attention,
norm_first transformer). Test scaffolding, not shipped code."""

import math

import torch
import torch.nn.functional as F
from torch import nn


def pad1d(x, paddings, mode="constant", value=0.0):
    length = x.shape[-1]
    pl, pr = paddings
    if mode == "reflect":
        max_pad = max(pl, pr)
        if length <= max_pad:
            extra = max_pad - length + 1
            epr = min(pr, extra)
            epl = extra - epr
            x = F.pad(x, (epl, epr))
            pl, pr = pl - epl, pr - epr
    return F.pad(x, (pl, pr), mode, value)


def spectro(x, n_fft, hop):
    *other, length = x.shape
    x = x.reshape(-1, length)
    z = torch.stft(x, n_fft, hop, window=torch.hann_window(n_fft), win_length=n_fft,
                   normalized=True, center=True, return_complex=True, pad_mode="reflect")
    return z.view(*other, z.shape[-2], z.shape[-1])


def ispectro(z, hop, length=None):
    *other, freqs, frames = z.shape
    n_fft = 2 * freqs - 2
    z = z.view(-1, freqs, frames)
    x = torch.istft(z, n_fft, hop, window=torch.hann_window(n_fft), win_length=n_fft,
                    normalized=True, length=length, center=True)
    return x.view(*other, x.shape[-1])


class LayerScale(nn.Module):
    def __init__(self, channels, init=0, channel_last=False):
        super().__init__()
        self.channel_last = channel_last
        self.scale = nn.Parameter(torch.full((channels,), float(init)))

    def forward(self, x):
        return self.scale * x if self.channel_last else self.scale[:, None] * x


class DConv(nn.Module):
    def __init__(self, channels, compress=8, depth=2, init=1e-3):
        super().__init__()
        hidden = int(channels / compress)
        self.layers = nn.ModuleList()
        for d in range(depth):
            dilation = 2 ** d
            padding = dilation
            self.layers.append(nn.Sequential(
                nn.Conv1d(channels, hidden, 3, dilation=dilation, padding=padding),
                nn.GroupNorm(1, hidden), nn.GELU(),
                nn.Conv1d(hidden, 2 * channels, 1), nn.GroupNorm(1, 2 * channels),
                nn.GLU(1), LayerScale(channels, init),
            ))

    def forward(self, x):
        for layer in self.layers:
            x = x + layer(x)
        return x


class HEncLayer(nn.Module):
    def __init__(self, chin, chout, kernel_size=8, stride=4, empty=False, freq=True,
                 dconv=True, context=0, pad=True, rewrite=True, dconv_kw=None):
        super().__init__()
        pad = kernel_size // 4 if pad else 0
        klass = nn.Conv1d
        self.freq, self.kernel_size, self.stride, self.empty, self.pad = (
            freq, kernel_size, stride, empty, pad)
        if freq:
            kernel_size, stride, pad = [kernel_size, 1], [stride, 1], [pad, 0]
            klass = nn.Conv2d
        self.conv = klass(chin, chout, kernel_size, stride, pad)
        if empty:
            return
        self.norm1 = nn.Identity()
        self.rewrite = None
        if rewrite:
            self.rewrite = klass(chout, 2 * chout, 1 + 2 * context, 1, context)
            self.norm2 = nn.Identity()
        self.dconv = DConv(chout, **(dconv_kw or {})) if dconv else None

    def forward(self, x, inject=None):
        if not self.freq and x.dim() == 4:
            B, C, Fr, T = x.shape
            x = x.view(B, -1, T)
        if not self.freq:
            le = x.shape[-1]
            if le % self.stride != 0:
                x = F.pad(x, (0, self.stride - (le % self.stride)))
        y = self.conv(x)
        if self.empty:
            return y
        if inject is not None:
            if inject.dim() == 3 and y.dim() == 4:
                inject = inject[:, :, None]
            y = y + inject
        y = F.gelu(self.norm1(y))
        if self.dconv:
            if self.freq:
                B, C, Fr, T = y.shape
                y = y.permute(0, 2, 1, 3).reshape(-1, C, T)
            y = self.dconv(y)
            if self.freq:
                y = y.view(B, Fr, C, T).permute(0, 2, 1, 3)
        if self.rewrite:
            z = self.norm2(self.rewrite(y))
            return F.glu(z, dim=1)
        return y


class HDecLayer(nn.Module):
    def __init__(self, chin, chout, last=False, kernel_size=8, stride=4, empty=False,
                 freq=True, dconv=True, context=1, pad=True, rewrite=True, dconv_kw=None):
        super().__init__()
        pad = kernel_size // 4 if pad else 0
        self.pad, self.last, self.freq, self.chin, self.empty, self.stride, self.kernel_size = (
            pad, last, freq, chin, empty, stride, kernel_size)
        klass, klass_tr = nn.Conv1d, nn.ConvTranspose1d
        if freq:
            kernel_size, stride = [kernel_size, 1], [stride, 1]
            klass, klass_tr = nn.Conv2d, nn.ConvTranspose2d
        self.conv_tr = klass_tr(chin, chout, kernel_size, stride)
        self.norm2 = nn.Identity()
        if empty:
            return
        self.rewrite = None
        if rewrite:
            self.rewrite = klass(chin, 2 * chin, 1 + 2 * context, 1, context)
            self.norm1 = nn.Identity()
        self.dconv = DConv(chin, **(dconv_kw or {})) if dconv else None

    def forward(self, x, skip, length):
        if self.freq and x.dim() == 3:
            B, C, T = x.shape
            x = x.view(B, self.chin, -1, T)
        if not self.empty:
            x = x + skip
            y = F.glu(self.norm1(self.rewrite(x)), dim=1) if self.rewrite else x
            if self.dconv:
                if self.freq:
                    B, C, Fr, T = y.shape
                    y = y.permute(0, 2, 1, 3).reshape(-1, C, T)
                y = self.dconv(y)
                if self.freq:
                    y = y.view(B, Fr, C, T).permute(0, 2, 1, 3)
        else:
            y = x
            assert skip is None
        z = self.norm2(self.conv_tr(y))
        if self.freq:
            if self.pad:
                z = z[..., self.pad : -self.pad, :]
        else:
            z = z[..., self.pad : self.pad + length]
        if not self.last:
            z = F.gelu(z)
        return z, y


def create_sin_embedding(length, dim, max_period=10000):
    pos = torch.arange(length).view(-1, 1, 1)
    half = dim // 2
    adim = torch.arange(half).view(1, 1, -1)
    phase = pos / (max_period ** (adim / (half - 1)))
    return torch.cat([torch.cos(phase), torch.sin(phase)], dim=-1)


def create_2d_sin_embedding(d_model, height, width, max_period=10000):
    pe = torch.zeros(d_model, height, width)
    d_model = int(d_model / 2)
    div_term = torch.exp(torch.arange(0.0, d_model, 2) * -(math.log(max_period) / d_model))
    pos_w = torch.arange(0.0, width).unsqueeze(1)
    pos_h = torch.arange(0.0, height).unsqueeze(1)
    pe[0:d_model:2] = torch.sin(pos_w * div_term).transpose(0, 1).unsqueeze(1).repeat(1, height, 1)
    pe[1:d_model:2] = torch.cos(pos_w * div_term).transpose(0, 1).unsqueeze(1).repeat(1, height, 1)
    pe[d_model::2] = torch.sin(pos_h * div_term).transpose(0, 1).unsqueeze(2).repeat(1, 1, width)
    pe[d_model + 1 :: 2] = torch.cos(pos_h * div_term).transpose(0, 1).unsqueeze(2).repeat(1, 1, width)
    return pe[None]


class MyGroupNorm(nn.GroupNorm):
    def forward(self, x):
        return super().forward(x.transpose(1, 2)).transpose(1, 2)


class SelfLayer(nn.Module):
    def __init__(self, d_model, nhead, hidden):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d_model, nhead, batch_first=True)
        self.linear1 = nn.Linear(d_model, hidden)
        self.linear2 = nn.Linear(hidden, d_model)
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)
        self.norm_out = MyGroupNorm(num_groups=1, num_channels=d_model)
        self.gamma_1 = LayerScale(d_model, 1e-4, True)
        self.gamma_2 = LayerScale(d_model, 1e-4, True)

    def forward(self, x):
        h = self.norm1(x)
        h = self.self_attn(h, h, h, need_weights=False)[0]
        x = x + self.gamma_1(h)
        x = x + self.gamma_2(self.linear2(F.gelu(self.linear1(self.norm2(x)))))
        return self.norm_out(x)


class CrossLayer(nn.Module):
    def __init__(self, d_model, nhead, hidden):
        super().__init__()
        self.cross_attn = nn.MultiheadAttention(d_model, nhead, batch_first=True)
        self.linear1 = nn.Linear(d_model, hidden)
        self.linear2 = nn.Linear(hidden, d_model)
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)
        self.norm3 = nn.LayerNorm(d_model)
        self.norm_out = MyGroupNorm(num_groups=1, num_channels=d_model)
        self.gamma_1 = LayerScale(d_model, 1e-4, True)
        self.gamma_2 = LayerScale(d_model, 1e-4, True)

    def forward(self, q, k):
        h = self.cross_attn(self.norm1(q), self.norm2(k), self.norm2(k),
                            need_weights=False)[0]
        x = q + self.gamma_1(h)
        x = x + self.gamma_2(self.linear2(F.gelu(self.linear1(self.norm3(x)))))
        return self.norm_out(x)


class CrossTransformer(nn.Module):
    def __init__(self, dim, heads, num_layers, hidden_scale=4.0):
        super().__init__()
        self.num_layers = num_layers
        hidden = int(dim * hidden_scale)
        self.norm_in = nn.LayerNorm(dim)
        self.norm_in_t = nn.LayerNorm(dim)
        self.layers = nn.ModuleList()
        self.layers_t = nn.ModuleList()
        for idx in range(num_layers):
            if idx % 2 == 0:
                self.layers.append(SelfLayer(dim, heads, hidden))
                self.layers_t.append(SelfLayer(dim, heads, hidden))
            else:
                self.layers.append(CrossLayer(dim, heads, hidden))
                self.layers_t.append(CrossLayer(dim, heads, hidden))

    def forward(self, x, xt):
        B, C, Fr, T1 = x.shape
        pos2d = create_2d_sin_embedding(C, Fr, T1)
        pos2d = pos2d.permute(0, 3, 2, 1).reshape(1, T1 * Fr, C)
        x = x.permute(0, 3, 2, 1).reshape(B, T1 * Fr, C)
        x = self.norm_in(x) + pos2d

        B, C, T2 = xt.shape
        xt = xt.permute(0, 2, 1)
        pos1d = create_sin_embedding(T2, C).permute(1, 0, 2)
        xt = self.norm_in_t(xt) + pos1d

        for idx in range(self.num_layers):
            if idx % 2 == 0:
                x = self.layers[idx](x)
                xt = self.layers_t[idx](xt)
            else:
                old_x = x
                x = self.layers[idx](x, xt)
                xt = self.layers_t[idx](xt, old_x)
        x = x.reshape(B, T1, Fr, C).permute(0, 3, 2, 1)
        return x, xt.permute(0, 2, 1)


class ScaledEmbedding(nn.Module):
    def __init__(self, num_embeddings, embedding_dim, scale=10.0, smooth=True):
        super().__init__()
        self.embedding = nn.Embedding(num_embeddings, embedding_dim)
        self.embedding.weight.data /= scale
        self.scale = scale

    def forward(self, x):
        return self.embedding(x) * self.scale


class HTDemucsOracle(nn.Module):
    def __init__(self, sources, channels=8, nfft=1024, depth=3, t_layers=3,
                 t_heads=4, samplerate=44100, segment=1.0):
        super().__init__()
        self.sources, self.channels, self.nfft, self.depth = sources, channels, nfft, depth
        self.hop_length = nfft // 4
        self.samplerate, self.segment = samplerate, segment
        self.audio_channels = 2
        self.cac = True  # v4 is always complex-as-channels
        kernel_size, stride, growth = 8, 4, 2
        dconv_kw = {"compress": 8, "depth": 2, "init": 1e-3}

        self.encoder = nn.ModuleList()
        self.decoder = nn.ModuleList()
        self.tencoder = nn.ModuleList()
        self.tdecoder = nn.ModuleList()
        chin, chin_z = 2, 4  # cac
        chout = chout_z = channels
        freqs = nfft // 2
        for index in range(depth):
            freq = freqs > 1
            ker, stri, pad = kernel_size, stride, True
            last_freq = False
            if freq and freqs <= kernel_size:
                ker, pad, last_freq = freqs, False, True
            enc = HEncLayer(chin_z, chout_z, ker, stri, freq=freq, pad=pad,
                            dconv_kw=dconv_kw)
            if freq:
                tenc = HEncLayer(chin, chout, kernel_size, stride, freq=False,
                                 pad=True, empty=last_freq, dconv_kw=dconv_kw)
                self.tencoder.append(tenc)
            self.encoder.append(enc)
            if index == 0:
                chin = 2 * len(sources)
                chin_z = chin * 2
            dec = HDecLayer(chout_z, chin_z, last=index == 0, kernel_size=ker,
                            stride=stri, freq=freq, pad=pad, dconv_kw=dconv_kw)
            if freq:
                tdec = HDecLayer(chout, chin, last=index == 0, kernel_size=kernel_size,
                                 stride=stride, freq=False, pad=True, empty=last_freq,
                                 dconv_kw=dconv_kw)
                self.tdecoder.insert(0, tdec)
            self.decoder.insert(0, dec)
            chin, chin_z = chout, chout_z
            chout, chout_z = int(growth * chout), int(growth * chout_z)
            if freq:
                freqs = 1 if freqs <= kernel_size else freqs // stride
            if index == 0:
                self.freq_emb = ScaledEmbedding(freqs, chin_z, smooth=True, scale=10)
                self.freq_emb_scale = 0.2

        transformer_channels = channels * growth ** (depth - 1)
        self.crosstransformer = CrossTransformer(transformer_channels, t_heads, t_layers)

    def _spec(self, x):
        hl = self.hop_length
        le = int(math.ceil(x.shape[-1] / hl))
        pad = hl // 2 * 3
        x = pad1d(x, (pad, pad + le * hl - x.shape[-1]), mode="reflect")
        z = spectro(x, self.nfft, hl)[..., :-1, :]
        return z[..., 2 : 2 + le]

    def _ispec(self, z, length):
        hl = self.hop_length
        z = F.pad(z, (0, 0, 0, 1))
        z = F.pad(z, (2, 2))
        pad = hl // 2 * 3
        le = hl * int(math.ceil(length / hl)) + 2 * pad
        x = ispectro(z, hl, length=le)
        return x[..., pad : pad + length]

    def forward(self, mix):
        length = mix.shape[-1]
        z = self._spec(mix)
        B, C, Fq, T = z.shape
        if self.cac:
            mag = torch.view_as_real(z).permute(0, 1, 4, 2, 3).reshape(B, C * 2, Fq, T)
        else:
            mag = z.abs()
        x = mag
        mean = x.mean(dim=(1, 2, 3), keepdim=True)
        std = x.std(dim=(1, 2, 3), keepdim=True)
        x = (x - mean) / (1e-5 + std)
        xt = mix
        meant = xt.mean(dim=(1, 2), keepdim=True)
        stdt = xt.std(dim=(1, 2), keepdim=True)
        xt = (xt - meant) / (1e-5 + stdt)

        saved, saved_t, lengths, lengths_t = [], [], [], []
        for idx, encode in enumerate(self.encoder):
            lengths.append(x.shape[-1])
            inject = None
            if idx < len(self.tencoder):
                lengths_t.append(xt.shape[-1])
                tenc = self.tencoder[idx]
                xt_out = tenc(xt)
                if not tenc.empty:
                    xt = xt_out
                    saved_t.append(xt)
                else:
                    inject = xt_out
            x = encode(x, inject)
            if idx == 0:
                frs = torch.arange(x.shape[-2])
                emb = self.freq_emb(frs).t()[None, :, :, None].expand_as(x)
                x = x + self.freq_emb_scale * emb
            saved.append(x)

        x, xt = self.crosstransformer(x, xt)

        for idx, decode in enumerate(self.decoder):
            skip = saved.pop(-1)
            x, pre = decode(x, skip, lengths.pop(-1))
            offset = self.depth - len(self.tdecoder)
            if idx >= offset:
                tdec = self.tdecoder[idx - offset]
                length_t = lengths_t.pop(-1)
                if tdec.empty:
                    pre = pre[:, :, 0]
                    xt, _ = tdec(pre, None, length_t)
                else:
                    skip_t = saved_t.pop(-1)
                    xt, _ = tdec(xt, skip_t, length_t)

        S = len(self.sources)
        x = x.view(B, S, -1, Fq, T)
        x = x * std[:, None] + mean[:, None]
        if self.cac:
            out = x.view(B, S, -1, 2, Fq, T).permute(0, 1, 2, 4, 5, 3)
            zout = torch.view_as_complex(out.contiguous())
        else:
            # magnitude head, wiener_iters == 0: openunmix wiener with zero
            # EM iterations is raw-head * mixture phase (per 300-frame
            # window, which is window-independent at 0 iterations).
            phase = z / (1e-8 + z.abs())
            zout = x * phase[:, None]
        xf = self._ispec(zout, length)
        xt = xt.view(B, S, -1, length)
        xt = xt * stdt[:, None] + meant[:, None]
        return xt + xf


# ---------------------------------------------------------------- HDemucs v3


class BLSTM(nn.Module):
    def __init__(self, dim, layers=2, max_steps=200, skip=True):
        super().__init__()
        self.max_steps = max_steps
        self.lstm = nn.LSTM(bidirectional=True, num_layers=layers,
                            hidden_size=dim, input_size=dim)
        self.linear = nn.Linear(2 * dim, dim)
        self.skip = skip

    def forward(self, x):
        B, C, T = x.shape
        y = x
        framed = False
        if self.max_steps is not None and T > self.max_steps:
            width = self.max_steps
            stride = width // 2
            n_frames = math.ceil(T / stride)
            tgt = (n_frames - 1) * stride + width
            xp = F.pad(x, (0, tgt - T))
            frames = xp.as_strided([B, C, n_frames, width],
                                   [xp.stride()[0], xp.stride()[1], stride, 1])
            nframes = frames.shape[2]
            framed = True
            x = frames.permute(0, 2, 1, 3).reshape(-1, C, width)
        x = x.permute(2, 0, 1)
        x = self.lstm(x)[0]
        x = self.linear(x)
        x = x.permute(1, 2, 0)
        if framed:
            out = []
            frames = x.reshape(B, -1, C, width)
            limit = stride // 2
            for k in range(nframes):
                if k == 0:
                    out.append(frames[:, k, :, :-limit])
                elif k == nframes - 1:
                    out.append(frames[:, k, :, limit:])
                else:
                    out.append(frames[:, k, :, limit:-limit])
            x = torch.cat(out, -1)[..., :T]
        if self.skip:
            x = x + y
        return x


class LocalState(nn.Module):
    def __init__(self, channels, heads=4, ndecay=4):
        super().__init__()
        self.heads, self.ndecay = heads, ndecay
        self.content = nn.Conv1d(channels, channels, 1)
        self.query = nn.Conv1d(channels, channels, 1)
        self.key = nn.Conv1d(channels, channels, 1)
        self.query_decay = nn.Conv1d(channels, heads * ndecay, 1)
        self.proj = nn.Conv1d(channels, channels, 1)

    def forward(self, x):
        B, C, T = x.shape
        heads = self.heads
        indexes = torch.arange(T, dtype=x.dtype)
        delta = indexes[:, None] - indexes[None, :]
        queries = self.query(x).view(B, heads, -1, T)
        keys = self.key(x).view(B, heads, -1, T)
        dots = torch.einsum("bhct,bhcs->bhts", keys, queries)
        dots /= keys.shape[2] ** 0.5
        decays = torch.arange(1, self.ndecay + 1, dtype=x.dtype)
        decay_q = torch.sigmoid(self.query_decay(x).view(B, heads, -1, T)) / 2
        decay_kernel = -decays.view(-1, 1, 1) * delta.abs() / self.ndecay ** 0.5
        dots += torch.einsum("fts,bhfs->bhts", decay_kernel, decay_q)
        dots.masked_fill_(torch.eye(T, dtype=torch.bool), -100)
        weights = torch.softmax(dots, dim=2)
        content = self.content(x).view(B, heads, -1, T)
        result = torch.einsum("bhts,bhct->bhcs", weights, content).reshape(B, -1, T)
        return x + self.proj(result)


class DConvV3(nn.Module):
    def __init__(self, channels, compress=4, depth=2, init=1e-4, lstm=False, attn=False):
        super().__init__()
        hidden = int(channels / compress)
        self.layers = nn.ModuleList()
        for d in range(depth):
            dilation = 2 ** d
            mods = [
                nn.Conv1d(channels, hidden, 3, dilation=dilation, padding=dilation),
                nn.GroupNorm(1, hidden), nn.GELU(),
                nn.Conv1d(hidden, 2 * channels, 1), nn.GroupNorm(1, 2 * channels),
                nn.GLU(1), LayerScale(channels, init),
            ]
            if attn:
                mods.insert(3, LocalState(hidden, heads=4, ndecay=4))
            if lstm:
                mods.insert(3, BLSTM(hidden, layers=2, max_steps=200, skip=True))
            self.layers.append(nn.Sequential(*mods))

    def forward(self, x):
        for layer in self.layers:
            x = x + layer(x)
        return x


class HEncLayerV3(HEncLayer):
    """HEncLayer with GroupNorm support and v3 DConv."""

    def __init__(self, chin, chout, kernel_size=8, stride=4, empty=False, freq=True,
                 norm=False, norm_groups=4, dconv_kw=None, pad=True, context=0):
        super().__init__(chin, chout, kernel_size, stride, empty=empty, freq=freq,
                         dconv=False, context=context, pad=pad)
        if empty:
            return
        if norm:
            self.norm1 = nn.GroupNorm(norm_groups, chout)
            self.norm2 = nn.GroupNorm(norm_groups, 2 * chout)
        self.dconv = DConvV3(chout, **(dconv_kw or {}))


class HDecLayerV3(HDecLayer):
    def __init__(self, chin, chout, last=False, kernel_size=8, stride=4, empty=False,
                 freq=True, norm=False, norm_groups=4, context=1, pad=True):
        super().__init__(chin, chout, last=last, kernel_size=kernel_size,
                         stride=stride, empty=empty, freq=freq, dconv=False,
                         context=context, pad=pad)
        if norm:
            self.norm2 = nn.GroupNorm(norm_groups, chout)
        if empty:
            return
        if norm:
            self.norm1 = nn.GroupNorm(norm_groups, 2 * chin)


class HDemucsOracle(nn.Module):
    """v3 hybrid (cac=True variant): zero-initialised decoder, GroupNorm past
    norm_starts, LSTM/attention DConv past dconv_lstm/attn, no transformer."""

    def __init__(self, sources, channels=8, nfft=512, depth=4, norm_starts=2,
                 dconv_lstm=2, dconv_attn=2, samplerate=44100, segment=0.5,
                 cac=True):
        super().__init__()
        self.sources, self.channels, self.nfft, self.depth = sources, channels, nfft, depth
        self.hop_length = nfft // 4
        self.samplerate, self.segment = samplerate, segment
        self.audio_channels = 2
        self.cac = cac
        kernel_size, stride, growth = 8, 4, 2

        self.encoder = nn.ModuleList()
        self.decoder = nn.ModuleList()
        self.tencoder = nn.ModuleList()
        self.tdecoder = nn.ModuleList()
        chin, chin_z = 2, (4 if cac else 2)
        chout = chout_z = channels
        freqs = nfft // 2
        for index in range(depth):
            norm = index >= norm_starts
            lstm = index >= dconv_lstm
            attn = index >= dconv_attn
            dconv_kw = {"compress": 4, "depth": 2, "init": 1e-4,
                        "lstm": lstm, "attn": attn}
            freq = freqs > 1
            ker, stri, pad = kernel_size, stride, True
            last_freq = False
            if freq and freqs <= kernel_size:
                ker, pad, last_freq = freqs, False, True
            if last_freq:
                chout_z = max(chout, chout_z)
                chout = chout_z
            enc = HEncLayerV3(chin_z, chout_z, ker, stri, freq=freq, pad=pad,
                              norm=norm, dconv_kw=dconv_kw)
            if freq:
                tenc = HEncLayerV3(chin, chout, kernel_size, stride, freq=False,
                                   pad=True, empty=last_freq, norm=norm,
                                   dconv_kw=dconv_kw)
                self.tencoder.append(tenc)
            self.encoder.append(enc)
            if index == 0:
                chin = 2 * len(sources)
                chin_z = chin * 2 if cac else chin
            dec = HDecLayerV3(chout_z, chin_z, last=index == 0, kernel_size=ker,
                              stride=stri, freq=freq, pad=pad, norm=norm)
            if freq:
                tdec = HDecLayerV3(chout, chin, last=index == 0,
                                   kernel_size=kernel_size, stride=stride,
                                   freq=False, pad=True, empty=last_freq,
                                   norm=norm)
                self.tdecoder.insert(0, tdec)
            self.decoder.insert(0, dec)
            chin, chin_z = chout, chout_z
            chout, chout_z = int(growth * chout), int(growth * chout_z)
            if freq:
                freqs = 1 if freqs <= kernel_size else freqs // stride
            if index == 0:
                self.freq_emb = ScaledEmbedding(freqs, chin_z, smooth=True, scale=10)
                self.freq_emb_scale = 0.2

    def _spec(self, x):
        hl = self.hop_length
        le = int(math.ceil(x.shape[-1] / hl))
        pad = hl // 2 * 3
        x = pad1d(x, (pad, pad + le * hl - x.shape[-1]), mode="reflect")
        z = spectro(x, self.nfft, hl)[..., :-1, :]
        return z[..., 2 : 2 + le]

    def _ispec(self, z, length):
        hl = self.hop_length
        z = F.pad(z, (0, 0, 0, 1))
        z = F.pad(z, (2, 2))
        pad = hl // 2 * 3
        le = hl * int(math.ceil(length / hl)) + 2 * pad
        x = ispectro(z, hl, length=le)
        return x[..., pad : pad + length]

    def forward(self, mix):
        length = mix.shape[-1]
        z = self._spec(mix)
        B, C, Fq, T = z.shape
        if self.cac:
            mag = torch.view_as_real(z).permute(0, 1, 4, 2, 3).reshape(B, C * 2, Fq, T)
        else:
            mag = z.abs()
        x = mag
        mean = x.mean(dim=(1, 2, 3), keepdim=True)
        std = x.std(dim=(1, 2, 3), keepdim=True)
        x = (x - mean) / (1e-5 + std)
        xt = mix
        meant = xt.mean(dim=(1, 2), keepdim=True)
        stdt = xt.std(dim=(1, 2), keepdim=True)
        xt = (xt - meant) / (1e-5 + stdt)

        saved, saved_t, lengths, lengths_t = [], [], [], []
        for idx, encode in enumerate(self.encoder):
            lengths.append(x.shape[-1])
            inject = None
            if idx < len(self.tencoder):
                lengths_t.append(xt.shape[-1])
                tenc = self.tencoder[idx]
                xt_out = tenc(xt)
                if not tenc.empty:
                    xt = xt_out
                    saved_t.append(xt)
                else:
                    inject = xt_out
            x = encode(x, inject)
            if idx == 0:
                frs = torch.arange(x.shape[-2])
                emb = self.freq_emb(frs).t()[None, :, :, None].expand_as(x)
                x = x + self.freq_emb_scale * emb
            saved.append(x)

        x = torch.zeros_like(x)
        for idx, decode in enumerate(self.decoder):
            skip = saved.pop(-1)
            x, pre = decode(x, skip, lengths.pop(-1))
            offset = self.depth - len(self.tdecoder)
            if idx >= offset:
                tdec = self.tdecoder[idx - offset]
                length_t = lengths_t.pop(-1)
                if tdec.empty:
                    pre = pre[:, :, 0]
                    xt, _ = tdec(pre, None, length_t)
                else:
                    skip_t = saved_t.pop(-1)
                    xt, _ = tdec(xt, skip_t, length_t)

        S = len(self.sources)
        x = x.view(B, S, -1, Fq, T)
        x = x * std[:, None] + mean[:, None]
        if self.cac:
            out = x.view(B, S, -1, 2, Fq, T).permute(0, 1, 2, 4, 5, 3)
            zout = torch.view_as_complex(out.contiguous())
        else:
            # magnitude head, wiener_iters == 0: openunmix wiener with zero
            # EM iterations is raw-head * mixture phase (per 300-frame
            # window, which is window-independent at 0 iterations).
            phase = z / (1e-8 + z.abs())
            zout = x * phase[:, None]
        xf = self._ispec(zout, length)
        xt = xt.view(B, S, -1, length)
        xt = xt * stdt[:, None] + meant[:, None]
        return xt + xf
