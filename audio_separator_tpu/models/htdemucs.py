"""HTDemucs (Demucs v4 hybrid transformer) — functional JAX implementation.

Re-design of the reference torch model for XLA
(ref: uvr_lib_v5/demucs/htdemucs.py:27-620, hdemucs.py:67-331 HEnc/HDecLayer,
demucs.py:99-168 DConv, transformer.py:196-583 CrossTransformerEncoder).
Parameters are nested dicts keyed by torch module paths (state_dict keys split
on '.'), so checkpoint conversion is mechanical.

Scope: the Demucs v4 configuration family (cac=True, no MultiWrap multi_freqs,
dense attention) — covers htdemucs / htdemucs_ft / htdemucs_6s, the models the
reference exposes (separator.py:619-620 lists only "Demucs v4").
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import hann_window, istft, stft


@dataclass(frozen=True)
class HTDemucsConfig:
    sources: Tuple[str, ...]
    arch: str = "htdemucs"  # "htdemucs" (v4) | "hdemucs" (v3)
    audio_channels: int = 2
    channels: int = 48
    growth: int = 2
    nfft: int = 4096
    cac: bool = True
    depth: int = 4
    kernel_size: int = 8
    stride: int = 4
    time_stride: int = 2
    context: int = 1
    context_enc: int = 0
    norm_starts: int = 4
    norm_groups: int = 4
    dconv_depth: int = 2
    freq_emb: float = 0.2
    emb_scale: float = 10.0
    bottom_channels: int = 0
    t_layers: int = 5
    t_heads: int = 8
    t_hidden_scale: float = 4.0
    t_cross_first: bool = False
    samplerate: int = 44100
    segment: float = 10.0
    use_train_segment: bool = True
    # HDemucs (v3) specifics
    wiener_iters: int = 0
    wiener_residual: bool = False

    @property
    def hop_length(self) -> int:
        return self.nfft // 4

    @property
    def training_length(self) -> int:
        return int(self.segment * self.samplerate)


def config_from_kwargs(kwargs: Dict[str, Any], args: tuple = ()) -> HTDemucsConfig:
    """Build config from a demucs checkpoint's (args, kwargs) record."""
    sources = tuple(kwargs.get("sources") or (args[0] if args else ()))
    known = {f.name for f in HTDemucsConfig.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    picked = {k: v for k, v in kwargs.items() if k in known and k != "sources"}
    if "segment" in picked:
        picked["segment"] = float(picked["segment"])
    return HTDemucsConfig(sources=sources, **picked)


# --------------------------------------------------------------------------
# Primitives


def _conv1d(p, x, stride=1, padding=0, dilation=1, groups=1):
    w = jnp.asarray(p["weight"], x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NCW", "OIW", "NCW"),
        feature_group_count=groups, preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "bias" in p:
        out = out + jnp.asarray(p["bias"], x.dtype)[None, :, None]
    return out


def _conv2d(p, x, stride=(1, 1), padding=(0, 0)):
    w = jnp.asarray(p["weight"], x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "bias" in p:
        out = out + jnp.asarray(p["bias"], x.dtype)[None, :, None, None]
    return out


def _conv_tr(p, x, stride, freq: bool):
    """ConvTranspose (1d or 2d-over-freq) matching torch semantics, pad=0."""
    w = jnp.asarray(p["weight"], x.dtype)  # (Cin, Cout, *k)
    if freq:
        w_oi = jnp.flip(w, axis=(2, 3)).swapaxes(0, 1)
        k = w.shape[2]
        out = jax.lax.conv_general_dilated(
            x, w_oi, window_strides=(1, 1),
            padding=[(k - 1, k - 1), (0, 0)],
            lhs_dilation=(stride, 1),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if "bias" in p:
            out = out + jnp.asarray(p["bias"], x.dtype)[None, :, None, None]
    else:
        w_oi = jnp.flip(w, axis=(2,)).swapaxes(0, 1)
        k = w.shape[2]
        out = jax.lax.conv_general_dilated(
            x, w_oi, window_strides=(1,), padding=[(k - 1, k - 1)],
            lhs_dilation=(stride,),
            dimension_numbers=("NCW", "OIW", "NCW"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if "bias" in p:
            out = out + jnp.asarray(p["bias"], x.dtype)[None, :, None]
    return out


def _group_norm(p, x, num_groups, eps=1e-5):
    """GroupNorm over (B, C, *spatial)."""
    shape = x.shape
    b, c = shape[0], shape[1]
    xg = x.reshape(b, num_groups, -1).astype(jnp.float32)
    mean = xg.mean(axis=-1, keepdims=True)
    var = xg.var(axis=-1, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(shape).astype(x.dtype)
    wshape = (1, c) + (1,) * (len(shape) - 2)
    return out * jnp.asarray(p["weight"], x.dtype).reshape(wshape) \
        + jnp.asarray(p["bias"], x.dtype).reshape(wshape)


def _layer_norm(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    out = ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return out * jnp.asarray(p["weight"], x.dtype) + jnp.asarray(p["bias"], x.dtype)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _glu(x, axis):
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def _linear(p, x):
    return x @ jnp.asarray(p["weight"].T, x.dtype) + jnp.asarray(p["bias"], x.dtype)


def pad1d_reflect(x, pad_left, pad_right):
    """ref: hdemucs.pad1d:21-38 — reflect pad with zero-extension fallback for
    short inputs."""
    length = x.shape[-1]
    max_pad = max(pad_left, pad_right)
    if length <= max_pad:
        extra = max_pad - length + 1
        extra_right = min(pad_right, extra)
        extra_left = extra - extra_right
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(extra_left, extra_right)])
        pad_left -= extra_left
        pad_right -= extra_right
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)], mode="reflect")


# --------------------------------------------------------------------------
# Demucs-normalised STFT (ref: demucs/spec.py:11-38, htdemucs.py:388-409)


def _spectro(x, nfft, hop):
    win = hann_window(nfft)
    norm = 1.0 / np.sqrt(nfft)  # torch stft normalized=True: frame_length^-0.5
    *other, length = x.shape
    z = stft(x.reshape(-1, length), nfft, hop, win, pad_mode="reflect") * norm
    return z.reshape(*other, z.shape[-2], z.shape[-1])


def _ispectro(z, hop, length):
    *other, freqs, frames = z.shape
    nfft = 2 * freqs - 2
    win = hann_window(nfft)
    norm = np.sqrt(nfft)
    x = istft(z.reshape(-1, freqs, frames) * norm, nfft, hop, win, length=length)
    return x.reshape(*other, x.shape[-1])


def _model_spec(x, cfg: HTDemucsConfig):
    """ref: htdemucs._spec:383-400."""
    hl = cfg.hop_length
    le = int(math.ceil(x.shape[-1] / hl))
    pad = hl // 2 * 3
    x = pad1d_reflect(x, pad, pad + le * hl - x.shape[-1])
    z = _spectro(x, cfg.nfft, hl)[..., :-1, :]
    return z[..., 2 : 2 + le]


def _model_ispec(z, length, cfg: HTDemucsConfig):
    """ref: htdemucs._ispec:402-409."""
    hl = cfg.hop_length
    z = jnp.pad(z, [(0, 0)] * (z.ndim - 2) + [(0, 1), (2, 2)])
    pad = hl // 2 * 3
    le = hl * int(math.ceil(length / hl)) + 2 * pad
    x = _ispectro(z, hl, length=le)
    return x[..., pad : pad + length]


# --------------------------------------------------------------------------
# Layers


def _unfold_frames(x, width, stride):
    """demucs/utils.unfold: (..., T) → (..., F, width), F = ceil(T / stride)."""
    length = x.shape[-1]
    n_frames = -(-length // stride)
    target = (n_frames - 1) * stride + width
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, target - length)])
    idx = np.arange(width)[None, :] + stride * np.arange(n_frames)[:, None]
    return x[..., idx]


def _blstm(p, x):
    """BLSTM with max_steps framing (ref: demucs.py:19-67). x: (B, C, T)."""
    from .vr_nets import _lstm_cell_scan

    b, c, t = x.shape
    max_steps = 200
    framed = t > max_steps
    residual = x
    if framed:
        width, stride = max_steps, max_steps // 2
        frames = _unfold_frames(x, width, stride)  # (B, C, F, width)
        nframes = frames.shape[2]
        x = frames.transpose(0, 2, 1, 3).reshape(-1, c, width)
    seq = x.transpose(2, 0, 1)  # (T', B', C)
    lp = p["lstm"]
    for layer in range(2):
        fwd = _lstm_cell_scan(seq, lp[f"weight_ih_l{layer}"], lp[f"weight_hh_l{layer}"],
                              lp[f"bias_ih_l{layer}"], lp[f"bias_hh_l{layer}"])
        bwd = _lstm_cell_scan(seq, lp[f"weight_ih_l{layer}_reverse"],
                              lp[f"weight_hh_l{layer}_reverse"],
                              lp[f"bias_ih_l{layer}_reverse"],
                              lp[f"bias_hh_l{layer}_reverse"], reverse=True)
        seq = jnp.concatenate([fwd, bwd], axis=-1)
    seq = _linear(p["linear"], seq)
    x = seq.transpose(1, 2, 0)  # (B', C, T')
    if framed:
        frames = x.reshape(b, nframes, c, width)
        limit = stride // 2
        pieces = []
        for k in range(nframes):
            if k == 0:
                pieces.append(frames[:, k, :, :-limit])
            elif k == nframes - 1:
                pieces.append(frames[:, k, :, limit:])
            else:
                pieces.append(frames[:, k, :, limit:-limit])
        x = jnp.concatenate(pieces, axis=-1)[..., :t]
    return x + residual  # skip=True in HDemucs DConv


def _local_state(p, x, heads=4, ndecay=4):
    """LocalState decay-windowed attention (ref: demucs.py:171-232).
    x: (B, C, T)."""
    b, c, t = x.shape
    idx = np.arange(t)
    delta = jnp.asarray(idx[:, None] - idx[None, :], x.dtype)
    queries = _conv1d(p["query"], x).reshape(b, heads, -1, t)
    keys = _conv1d(p["key"], x).reshape(b, heads, -1, t)
    dots = jnp.einsum("bhct,bhcs->bhts", keys, queries,
                      preferred_element_type=jnp.float32)
    dots = dots / (keys.shape[2] ** 0.5)
    if ndecay:
        decays = np.arange(1, ndecay + 1, dtype=np.float32)
        decay_q = _conv1d(p["query_decay"], x).reshape(b, heads, ndecay, t)
        decay_q = jax.nn.sigmoid(decay_q) / 2
        decay_kernel = jnp.asarray(-decays[:, None, None], jnp.float32) \
            * jnp.abs(delta)[None].astype(jnp.float32) / (ndecay ** 0.5)
        dots = dots + jnp.einsum("fts,bhfs->bhts", decay_kernel, decay_q,
                                 preferred_element_type=jnp.float32)
    eye = jnp.eye(t, dtype=bool)
    dots = jnp.where(eye[None, None], -100.0, dots)
    weights = jax.nn.softmax(dots, axis=2).astype(x.dtype)
    content = _conv1d(p["content"], x).reshape(b, heads, -1, t)
    result = jnp.einsum("bhts,bhct->bhcs", weights, content,
                        preferred_element_type=jnp.float32).astype(x.dtype)
    result = result.reshape(b, -1, t)
    return x + _conv1d(p["proj"], result)


def _dconv(p, x, cfg: HTDemucsConfig):
    """DConv residual branch over (B, C, T), with optional BLSTM/LocalState
    inner modules for HDemucs deep layers (ref: demucs.py:99-168)."""
    for d in range(cfg.dconv_depth):
        x = x + _dconv_layer(p["layers"][str(d)], x, 2 ** d)
    return x


def _dconv_layer(lp, x, dilation):
    """One DConv layer: conv→GN→GELU→[BLSTM]→[LocalState]→conv→GN→GLU→scale."""
    indices = sorted(int(i) for i in lp)
    y = x
    stage = 0  # 0: before first GN, 1: after first GN (needs GELU), 2: tail
    for i in indices:
        child = lp[str(i)]
        if "lstm" in child:
            y = _blstm(child, y)
        elif "content" in child:
            y = _local_state(child, y)
        elif "scale" in child:
            y = y * jnp.asarray(child["scale"], y.dtype)[None, :, None]
        elif child.get("weight") is not None and child["weight"].ndim == 3:
            if stage == 0:
                kernel = child["weight"].shape[-1]
                y = _conv1d(child, y, padding=dilation * (kernel // 2),
                            dilation=dilation)
            else:
                y = _conv1d(child, y)
        else:  # GroupNorm(1)
            y = _group_norm(child, y, 1)
            if stage == 0:
                y = _gelu(y)
                stage = 1
            else:
                y = _glu(y, axis=1)
                stage = 2
    return y


def _henc_layer(p, x, cfg: HTDemucsConfig, freq: bool, kernel: int, stride: int,
                pad: int, empty: bool = False, inject=None):
    """ref: hdemucs.HEncLayer.forward:119-154 (norm=Identity for v4 defaults)."""
    if not freq and x.ndim == 4:
        b, c, fr, t = x.shape
        x = x.reshape(b, -1, t)
    if not freq:
        le = x.shape[-1]
        if le % stride != 0:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, stride - (le % stride))])
    if freq:
        y = _conv2d(p["conv"], x, stride=(stride, 1), padding=(pad, 0))
    else:
        y = _conv1d(p["conv"], x, stride=stride, padding=pad)
    if empty:
        return y
    if inject is not None:
        if inject.ndim == 3 and y.ndim == 4:
            inject = inject[:, :, None]
        y = y + inject
    if "norm1" in p:  # GroupNorm for layers past norm_starts (Identity has no params)
        y = _group_norm(p["norm1"], y, cfg.norm_groups)
    y = _gelu(y)
    if "dconv" in p:
        if freq:
            b, c, fr, t = y.shape
            y = y.transpose(0, 2, 1, 3).reshape(-1, c, t)
        y = _dconv(p["dconv"], y, cfg)
        if freq:
            y = y.reshape(b, fr, c, t).transpose(0, 2, 1, 3)
    if "rewrite" in p:
        ctx = cfg.context_enc
        if freq:
            z = _conv2d(p["rewrite"], y, padding=(ctx, 0))
        else:
            z = _conv1d(p["rewrite"], y, padding=ctx)
        if "norm2" in p:
            z = _group_norm(p["norm2"], z, cfg.norm_groups)
        z = _glu(z, axis=1)
    else:
        z = y
    return z


def _hdec_layer(p, x, skip, length, cfg: HTDemucsConfig, freq: bool, kernel: int,
                stride: int, pad: int, last: bool, empty: bool = False,
                chin: Optional[int] = None):
    """ref: hdemucs.HDecLayer.forward:299-331."""
    if freq and x.ndim == 3:
        b, c, t = x.shape
        x = x.reshape(b, chin, -1, t)
    if not empty:
        x = x + skip
        if "rewrite" in p:
            ctx = cfg.context
            if freq:
                # decoder rewrite is a square (1+2c)² conv (ref: hdec __init__)
                y = _conv2d(p["rewrite"], x, padding=(ctx, ctx))
            else:
                y = _conv1d(p["rewrite"], x, padding=ctx)
            if "norm1" in p:
                y = _group_norm(p["norm1"], y, cfg.norm_groups)
            y = _glu(y, axis=1)
        else:
            y = x
        if "dconv" in p:
            if freq:
                b, c, fr, t = y.shape
                y = y.transpose(0, 2, 1, 3).reshape(-1, c, t)
            y = _dconv(p["dconv"], y, cfg)
            if freq:
                y = y.reshape(b, fr, c, t).transpose(0, 2, 1, 3)
    else:
        y = x
        assert skip is None
    z = _conv_tr(p["conv_tr"], y, stride, freq)
    if "norm2" in p:
        z = _group_norm(p["norm2"], z, cfg.norm_groups)
    if freq:
        if pad:
            z = z[..., pad:-pad, :]
    else:
        z = z[..., pad : pad + length]
    if not last:
        z = _gelu(z)
    return z, y


# --------------------------------------------------------------------------
# Cross transformer


def _sin_embedding_1d(length, dim, max_period=10000.0):
    pos = np.arange(length, dtype=np.float64)[:, None]
    half = dim // 2
    adim = np.arange(half, dtype=np.float64)[None, :]
    phase = pos / (max_period ** (adim / (half - 1)))
    return jnp.asarray(np.concatenate([np.cos(phase), np.sin(phase)], axis=-1),
                       dtype=jnp.float32)  # (T, dim)


def _sin_embedding_2d(d_model, height, width, max_period=10000.0):
    """ref: transformer.create_2d_sin_embedding:29-49 → (1, C, H, W)."""
    pe = np.zeros((d_model, height, width))
    half = d_model // 2
    div_term = np.exp(np.arange(0.0, half, 2) * -(math.log(max_period) / half))
    pos_w = np.arange(width)[:, None]
    pos_h = np.arange(height)[:, None]
    pe[0:half:2] = np.tile(np.sin(pos_w * div_term).T[:, None, :], (1, height, 1))
    pe[1:half:2] = np.tile(np.cos(pos_w * div_term).T[:, None, :], (1, height, 1))
    pe[half::2] = np.tile(np.sin(pos_h * div_term).T[:, :, None], (1, 1, width))
    pe[half + 1 :: 2] = np.tile(np.cos(pos_h * div_term).T[:, :, None], (1, 1, width))
    return jnp.asarray(pe[None], dtype=jnp.float32)


def _mha(p, q, k, v, heads):
    """nn.MultiheadAttention (batch_first) inference."""
    b, tq, e = q.shape
    w = jnp.asarray(p["in_proj_weight"], q.dtype)  # (3E, E)
    bias = jnp.asarray(p["in_proj_bias"], q.dtype)
    wq, wk, wv = w[:e], w[e : 2 * e], w[2 * e :]
    bq, bk, bv = bias[:e], bias[e : 2 * e], bias[2 * e :]
    dh = e // heads
    qh = (q @ wq.T + bq).reshape(b, tq, heads, dh).transpose(0, 2, 1, 3)
    kh = (k @ wk.T + bk).reshape(b, k.shape[1], heads, dh).transpose(0, 2, 1, 3)
    vh = (v @ wv.T + bv).reshape(b, v.shape[1], heads, dh).transpose(0, 2, 1, 3)
    if qh.shape == kh.shape:
        # Self-attention (and square cross-attention): shared dispatch —
        # whole-sequence Pallas kernel on TPU, fused einsum chain elsewhere.
        from ..ops.attention import dot_product_attention

        out = dot_product_attention(qh, kh, vh).astype(q.dtype)
    else:
        from ..ops.attention import _einsum_attention

        out = _einsum_attention(qh, kh, vh, dh ** -0.5).astype(q.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, tq, e)
    return _linear(p["out_proj"], out)


def _group_norm_btc(p, x, eps=1e-5):
    """MyGroupNorm(1): input (B, T, C) normalised over (T, C) jointly."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(1, 2), keepdims=True)
    var = x32.var(axis=(1, 2), keepdims=True)
    out = ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return out * jnp.asarray(p["weight"], x.dtype) + jnp.asarray(p["bias"], x.dtype)


def _self_attn_layer(p, x, heads):
    """MyTransformerEncoderLayer, norm_first=True + norm_out + layer_scale
    (ref: transformer.py:257-283)."""
    h = _layer_norm(p["norm1"], x)
    h = _mha(p["self_attn"], h, h, h, heads)
    x = x + jnp.asarray(p["gamma_1"]["scale"], x.dtype) * h
    h = _layer_norm(p["norm2"], x)
    h = _linear(p["linear2"], _gelu(_linear(p["linear1"], h)))
    x = x + jnp.asarray(p["gamma_2"]["scale"], x.dtype) * h
    if "norm_out" in p:
        x = _group_norm_btc(p["norm_out"], x)
    return x


def _cross_attn_layer(p, q, k, heads):
    """CrossTransformerEncoderLayer (ref: transformer.py:364-392)."""
    h = _mha(p["cross_attn"], _layer_norm(p["norm1"], q), _layer_norm(p["norm2"], k),
             _layer_norm(p["norm2"], k), heads)
    x = q + jnp.asarray(p["gamma_1"]["scale"], q.dtype) * h
    h = _layer_norm(p["norm3"], x)
    h = _linear(p["linear2"], _gelu(_linear(p["linear1"], h)))
    x = x + jnp.asarray(p["gamma_2"]["scale"], x.dtype) * h
    if "norm_out" in p:
        x = _group_norm_btc(p["norm_out"], x)
    return x


def _cross_transformer(p, x, xt, cfg: HTDemucsConfig):
    """ref: transformer.CrossTransformerEncoder.forward:529-556."""
    b, c, fr, t1 = x.shape
    pos_2d = _sin_embedding_2d(c, fr, t1)  # (1, C, Fr, T1)
    pos_2d = pos_2d.transpose(0, 3, 2, 1).reshape(1, t1 * fr, c)
    x = x.transpose(0, 3, 2, 1).reshape(b, t1 * fr, c)  # b (t1 fr) c
    x = _layer_norm(p["norm_in"], x) + pos_2d.astype(x.dtype)

    b2, c2, t2 = xt.shape
    xt = xt.transpose(0, 2, 1)  # (B, T2, C)
    pos_1d = _sin_embedding_1d(t2, c2)[None]
    xt = _layer_norm(p["norm_in_t"], xt) + pos_1d.astype(xt.dtype)

    classic_parity = 1 if cfg.t_cross_first else 0
    for idx in range(cfg.t_layers):
        li = str(idx)
        if idx % 2 == classic_parity:
            x = _self_attn_layer(p["layers"][li], x, cfg.t_heads)
            xt = _self_attn_layer(p["layers_t"][li], xt, cfg.t_heads)
        else:
            old_x = x
            x = _cross_attn_layer(p["layers"][li], x, xt, cfg.t_heads)
            xt = _cross_attn_layer(p["layers_t"][li], xt, old_x, cfg.t_heads)

    x = x.reshape(b, t1, fr, c).transpose(0, 3, 2, 1)
    xt = xt.transpose(0, 2, 1)
    return x, xt


# --------------------------------------------------------------------------
# Full forward


def _layer_geometry(cfg: HTDemucsConfig) -> List[Dict[str, Any]]:
    """Per-depth (freq-branch) kernel/stride/pad/last_freq, mirroring the
    constructor loop (ref: htdemucs.py:258-330)."""
    geo = []
    freqs = cfg.nfft // 2
    for index in range(cfg.depth):
        freq = freqs > 1
        stri, ker = cfg.stride, cfg.kernel_size
        if not freq:
            ker, stri = cfg.time_stride * 2, cfg.time_stride
        pad = True
        last_freq = False
        if freq and freqs <= cfg.kernel_size:
            ker = freqs
            pad = False
            last_freq = True
        geo.append({
            "freq": freq, "kernel": ker, "stride": stri,
            "pad": ker // 4 if pad else 0, "last_freq": last_freq,
        })
        if freq:
            freqs = 1 if freqs <= cfg.kernel_size else freqs // cfg.stride
    return geo


def apply_htdemucs(params: Dict[str, Any], cfg: HTDemucsConfig, mix: jnp.ndarray,
                   compute_dtype=jnp.float32) -> jnp.ndarray:
    """Forward pass: mix (B, C, T) → (B, S, C, T) (ref: htdemucs.forward:483-619).

    T must equal cfg.training_length when use_train_segment (callers pad)."""
    length = mix.shape[-1]
    if cfg.use_train_segment and length < cfg.training_length:
        mix = jnp.pad(mix, [(0, 0), (0, 0), (0, cfg.training_length - length)])
        length_pre_pad = length
        length = cfg.training_length
    else:
        length_pre_pad = None

    z = _model_spec(mix, cfg)  # (B, C, Fr, T) complex
    # CaC magnitude: complex → channels (ref: _magnitude:411-419)
    b, c, fr, t = z.shape
    mag = jnp.stack([z.real, z.imag], axis=2).reshape(b, c * 2, fr, t)
    x = mag.astype(compute_dtype)

    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    std = jnp.std(x.astype(jnp.float32), axis=(1, 2, 3), keepdims=True,
                  ddof=1).astype(compute_dtype)
    x = (x - mean) / (1e-5 + std)

    xt = mix.astype(compute_dtype)
    meant = xt.mean(axis=(1, 2), keepdims=True)
    stdt = jnp.std(xt.astype(jnp.float32), axis=(1, 2), keepdims=True,
                   ddof=1).astype(compute_dtype)
    xt = (xt - meant) / (1e-5 + stdt)

    geo = _layer_geometry(cfg)
    n_tenc = sum(1 for g in geo if g["freq"])

    saved, saved_t, lengths, lengths_t = [], [], [], []
    inject = None
    for idx, g in enumerate(geo):
        lengths.append(x.shape[-1])
        inject = None
        if idx < n_tenc:
            lengths_t.append(xt.shape[-1])
            tp_ = params["tencoder"][str(idx)]
            xt_out = _henc_layer(tp_, xt, cfg, freq=False, kernel=cfg.kernel_size,
                                 stride=cfg.stride, pad=cfg.kernel_size // 4,
                                 empty=g["last_freq"])
            if not g["last_freq"]:
                xt = xt_out
                saved_t.append(xt)
            else:
                inject = xt_out
        x = _henc_layer(params["encoder"][str(idx)], x, cfg, freq=g["freq"],
                        kernel=g["kernel"], stride=g["stride"], pad=g["pad"],
                        inject=inject)
        if idx == 0 and "freq_emb" in params:
            # ScaledEmbedding: stored weight is pre-divided by emb_scale and
            # multiplied back at lookup (ref: hdemucs.py:41-64).
            emb = (jnp.asarray(params["freq_emb"]["embedding"]["weight"], x.dtype)
                   * cfg.emb_scale)
            emb = emb[: x.shape[-2]].T[None, :, :, None]
            x = x + cfg.freq_emb * emb
        saved.append(x)

    if "crosstransformer" in params:
        if cfg.bottom_channels:
            bb, cc, ff, tt = x.shape
            x = _conv1d(params["channel_upsampler"], x.reshape(bb, cc, ff * tt))
            x = x.reshape(bb, -1, ff, tt)
            xt = _conv1d(params["channel_upsampler_t"], xt)
        x, xt = _cross_transformer(params["crosstransformer"], x, xt, cfg)
        if cfg.bottom_channels:
            bb, cc, ff, tt = x.shape
            x = _conv1d(params["channel_downsampler"], x.reshape(bb, cc, ff * tt))
            x = x.reshape(bb, -1, ff, tt)
            xt = _conv1d(params["channel_downsampler_t"], xt)

    s_sources = len(cfg.sources)
    for idx in range(cfg.depth):
        g = geo[cfg.depth - 1 - idx]
        dp = params["decoder"][str(idx)]
        skip = saved.pop(-1)
        chin_z = x.shape[1]
        x, pre = _hdec_layer(dp, x, skip, lengths.pop(-1), cfg, freq=g["freq"],
                             kernel=g["kernel"], stride=g["stride"], pad=g["pad"],
                             last=(cfg.depth - 1 - idx) == 0, chin=chin_z)
        offset = cfg.depth - n_tenc
        if idx >= offset:
            tdp = params["tdecoder"][str(idx - offset)]
            length_t = lengths_t.pop(-1)
            if g["last_freq"]:
                pre2 = pre[:, :, 0]
                xt, _ = _hdec_layer(tdp, pre2, None, length_t, cfg, freq=False,
                                    kernel=cfg.kernel_size, stride=cfg.stride,
                                    pad=cfg.kernel_size // 4,
                                    last=(cfg.depth - 1 - idx) == 0, empty=True)
            else:
                skip_t = saved_t.pop(-1)
                xt, _ = _hdec_layer(tdp, xt, skip_t, length_t, cfg, freq=False,
                                    kernel=cfg.kernel_size, stride=cfg.stride,
                                    pad=cfg.kernel_size // 4,
                                    last=(cfg.depth - 1 - idx) == 0)

    x = x.reshape(b, s_sources, -1, fr, t)
    x = x * std[:, None] + mean[:, None]

    # CaC → complex spectrogram (ref: _mask:421-433)
    bb, ss, cc2, frr, tt = x.shape
    out = x.reshape(bb, ss, cc2 // 2, 2, frr, tt)
    zout = jax.lax.complex(out[:, :, :, 0].astype(jnp.float32),
                           out[:, :, :, 1].astype(jnp.float32))
    xf = _model_ispec(zout, length, cfg)

    xt = xt.reshape(b, s_sources, -1, length)
    xt = xt * stdt[:, None] + meant[:, None]
    result = xt.astype(jnp.float32) + xf
    if length_pre_pad is not None:
        result = result[..., :length_pre_pad]
    return result


def apply_hdemucs(params: Dict[str, Any], cfg: HTDemucsConfig, mix: jnp.ndarray,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """HDemucs (Demucs v3) forward: mix (B, C, T) → (B, S, C, T)
    (ref: hdemucs.py HDemucs.forward:674-783).

    Differences from HTDemucs: deeper (6) encoder with GroupNorm past
    norm_starts and BLSTM/LocalState DConv branches, zero-initialised decoder
    input (signal flows through U-net skips only), no cross-transformer, and
    magnitude head + Wiener recombination when cac=False.
    """
    from .filtering import wiener as wiener_fn

    length = mix.shape[-1]
    z = _model_spec(mix, cfg)
    b, c, fr, t = z.shape
    if cfg.cac:
        mag = jnp.stack([z.real, z.imag], axis=2).reshape(b, c * 2, fr, t)
    else:
        mag = jnp.abs(z)
    x = mag.astype(compute_dtype)

    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    std = jnp.std(x.astype(jnp.float32), axis=(1, 2, 3), keepdims=True,
                  ddof=1).astype(compute_dtype)
    x = (x - mean) / (1e-5 + std)

    xt = mix.astype(compute_dtype)
    meant = xt.mean(axis=(1, 2), keepdims=True)
    stdt = jnp.std(xt.astype(jnp.float32), axis=(1, 2), keepdims=True,
                   ddof=1).astype(compute_dtype)
    xt = (xt - meant) / (1e-5 + stdt)

    geo = _layer_geometry(cfg)
    n_tenc = sum(1 for g in geo if g["freq"])

    saved, saved_t, lengths, lengths_t = [], [], [], []
    for idx, g in enumerate(geo):
        lengths.append(x.shape[-1])
        inject = None
        if idx < n_tenc:
            lengths_t.append(xt.shape[-1])
            tp_ = params["tencoder"][str(idx)]
            xt_out = _henc_layer(tp_, xt, cfg, freq=False, kernel=cfg.kernel_size,
                                 stride=cfg.stride, pad=cfg.kernel_size // 4,
                                 empty=g["last_freq"])
            if not g["last_freq"]:
                xt = xt_out
                saved_t.append(xt)
            else:
                inject = xt_out
        x = _henc_layer(params["encoder"][str(idx)], x, cfg, freq=g["freq"],
                        kernel=g["kernel"], stride=g["stride"], pad=g["pad"],
                        inject=inject)
        if idx == 0 and "freq_emb" in params:
            emb = (jnp.asarray(params["freq_emb"]["embedding"]["weight"], x.dtype)
                   * cfg.emb_scale)
            emb = emb[: x.shape[-2]].T[None, :, :, None]
            x = x + cfg.freq_emb * emb
        saved.append(x)

    # v3: decoder starts from zeros; only skip connections carry signal.
    x = jnp.zeros_like(x)
    xt = None

    s_sources = len(cfg.sources)
    for idx in range(cfg.depth):
        g = geo[cfg.depth - 1 - idx]
        dp = params["decoder"][str(idx)]
        skip = saved.pop(-1)
        x, pre = _hdec_layer(dp, x, skip, lengths.pop(-1), cfg, freq=g["freq"],
                             kernel=g["kernel"], stride=g["stride"], pad=g["pad"],
                             last=(cfg.depth - 1 - idx) == 0, chin=x.shape[1])
        offset = cfg.depth - n_tenc
        if idx >= offset:
            tdp = params["tdecoder"][str(idx - offset)]
            length_t = lengths_t.pop(-1)
            if g["last_freq"]:
                pre2 = pre[:, :, 0]
                xt, _ = _hdec_layer(tdp, pre2, None, length_t, cfg, freq=False,
                                    kernel=cfg.kernel_size, stride=cfg.stride,
                                    pad=cfg.kernel_size // 4,
                                    last=(cfg.depth - 1 - idx) == 0, empty=True)
            else:
                skip_t = saved_t.pop(-1)
                xt, _ = _hdec_layer(tdp, xt, skip_t, length_t, cfg, freq=False,
                                    kernel=cfg.kernel_size, stride=cfg.stride,
                                    pad=cfg.kernel_size // 4,
                                    last=(cfg.depth - 1 - idx) == 0)

    x = x.reshape(b, s_sources, -1, fr, t)
    x = x * std[:, None] + mean[:, None]

    if cfg.cac:
        bb, ss, cc2, frr, tt = x.shape
        out = x.reshape(bb, ss, cc2 // 2, 2, frr, tt)
        zout = jax.lax.complex(out[:, :, :, 0].astype(jnp.float32),
                               out[:, :, :, 1].astype(jnp.float32))
    elif cfg.wiener_iters < 0:
        # plain ratio mask (ref: hdemucs._mask niters < 0 branch). The
        # decoder head output is used RAW — a negative value flips the
        # mixture phase at that bin; taking |m| here would diverge from the
        # reference for every v3 magnitude-head model.
        m = x.astype(jnp.float32)
        zout = (z[:, None] / (1e-8 + jnp.abs(z[:, None]))) * m
    else:
        # magnitude head → multichannel Wiener combination with the mixture
        # phase (ref: hdemucs._mask:631-647 + _wiener:648-672). Like the
        # reference, the head output enters the EM raw (no abs), and the EM
        # runs in 300-frame windows so its statistics and max_abs scaling
        # match torch exactly.
        mag_out = x.astype(jnp.float32)
        wiener_win_len = 300

        def one(mags, mix_z):
            tsfc = mags.transpose(3, 2, 1, 0)  # (T, F, C, S)
            mix_tfc = mix_z.transpose(2, 1, 0)  # (T, F, C)
            t_total = tsfc.shape[0]
            outs = []
            for pos in range(0, t_total, wiener_win_len):
                yw = wiener_fn(tsfc[pos : pos + wiener_win_len],
                               mix_tfc[pos : pos + wiener_win_len],
                               iterations=max(cfg.wiener_iters, 0),
                               residual=cfg.wiener_residual)
                outs.append(yw)
            y = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
            if cfg.wiener_residual:
                y = y[..., :-1]
            return y.transpose(3, 2, 1, 0)  # (S, C, F, T)

        zout = jax.vmap(one)(mag_out, z)

    xf = _model_ispec(zout, length, cfg)
    xt = xt.reshape(b, s_sources, -1, length)
    xt = xt * stdt[:, None] + meant[:, None]
    return xt.astype(jnp.float32) + xf
