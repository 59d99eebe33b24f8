"""TFC-TDF v3 (MDX23C) — functional JAX implementation.

Re-design of the reference torch model (ref: uvr_lib_v5/tfc_tdf_v3.py:5-269):
complex-as-channels spectrogram U-Net with time-frequency convolutions (TFC)
and time-distributed fullband linear layers (TDF), sub-band folding
(cac2cws/cws2cac), and the first-conv multiplicative artifact reduction.
Parameters are nested dicts keyed by torch state_dict paths.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import hann_window, istft_real_packed, stft_real_packed


@dataclass(frozen=True)
class TFCTDFConfig:
    num_subbands: int
    num_scales: int
    scale: Tuple[int, int]
    num_blocks_per_scale: int
    num_channels: int
    growth: int
    bottleneck_factor: int
    norm: str
    act: str
    dim_f: int
    n_fft: int
    hop_length: int
    audio_channels: int = 2
    num_stems: int = 1


def build_tfc_tdf_config(model_data: Dict[str, Any]) -> TFCTDFConfig:
    model = model_data.get("model") or {}
    audio = model_data.get("audio") or {}
    training = model_data.get("training") or {}
    num_stems = 1 if training.get("target_instrument") else len(
        training.get("instruments") or [None])
    return TFCTDFConfig(
        num_subbands=int(model.get("num_subbands", 4)),
        num_scales=int(model.get("num_scales", 5)),
        scale=tuple(model.get("scale", (2, 2))),
        num_blocks_per_scale=int(model.get("num_blocks_per_scale", 2)),
        num_channels=int(model.get("num_channels", 128)),
        growth=int(model.get("growth", 128)),
        bottleneck_factor=int(model.get("bottleneck_factor", 4)),
        norm=str(model.get("norm", "InstanceNorm")),
        act=str(model.get("act", "gelu")),
        dim_f=int(audio.get("dim_f", 4096)),
        n_fft=int(audio.get("n_fft", 8192)),
        hop_length=int(audio.get("hop_length", 1024)),
        audio_channels=int(audio.get("num_channels", 2)),
        num_stems=num_stems,
    )


# --------------------------------------------------------------------------
# primitives


def _norm(p, x, norm_type: str):
    if norm_type in (None, "None", ""):
        return x
    if norm_type == "BatchNorm":
        shape = (1, -1, 1, 1)
        inv = jax.lax.rsqrt(jnp.asarray(p["running_var"], x.dtype) + 1e-5)
        return ((x - jnp.asarray(p["running_mean"], x.dtype).reshape(shape))
                * (inv * jnp.asarray(p["weight"], x.dtype)).reshape(shape)
                + jnp.asarray(p["bias"], x.dtype).reshape(shape))
    if norm_type == "InstanceNorm":
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=(2, 3), keepdims=True)
        var = x32.var(axis=(2, 3), keepdims=True)
        out = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
        return out * jnp.asarray(p["weight"], x.dtype)[None, :, None, None] \
            + jnp.asarray(p["bias"], x.dtype)[None, :, None, None]
    if norm_type.startswith("GroupNorm"):
        groups = int(norm_type.replace("GroupNorm", ""))
        b, c = x.shape[:2]
        xg = x.reshape(b, groups, -1).astype(jnp.float32)
        mean = xg.mean(axis=-1, keepdims=True)
        var = xg.var(axis=-1, keepdims=True)
        out = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape).astype(x.dtype)
        return out * jnp.asarray(p["weight"], x.dtype)[None, :, None, None] \
            + jnp.asarray(p["bias"], x.dtype)[None, :, None, None]
    return x


def _act(x, act_type: str):
    if act_type == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if act_type == "relu":
        return jnp.maximum(x, 0)
    if act_type.startswith("elu"):
        alpha = float(act_type.replace("elu", "") or 1.0)
        return jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1.0))
    raise ValueError(f"unknown activation {act_type}")


def _conv(p, x, stride=(1, 1), padding=(0, 0)):
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["weight"], x.dtype), window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "bias" in p:
        out = out + jnp.asarray(p["bias"], x.dtype)[None, :, None, None]
    return out


def _conv_tr(p, x, scale):
    w = jnp.asarray(p["weight"], x.dtype)  # (Cin, Cout, kh, kw), k == stride
    w_oi = jnp.flip(w, axis=(2, 3)).swapaxes(0, 1)
    kh, kw = w.shape[2], w.shape[3]
    return jax.lax.conv_general_dilated(
        x, w_oi, window_strides=(1, 1),
        padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=scale,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _linear_nobias(p, x):
    return x @ jnp.asarray(p["weight"].T, x.dtype)


def _tfc_tdf(p, x, cfg: TFCTDFConfig):
    """TFC_TDF block stack (ref: tfc_tdf_v3.py:110-149). x: (B, C, T, F)."""
    for i in range(cfg.num_blocks_per_scale):
        bp = p["blocks"][str(i)]
        s = _conv(bp["shortcut"], x)
        h = _conv(bp["tfc1"]["2"], _act(_norm(bp["tfc1"]["0"], x, cfg.norm), cfg.act),
                  padding=(1, 1))
        # TDF: norm, act, Linear(f→f/bn), norm, act, Linear(f/bn→f) on last dim
        t = _act(_norm(bp["tdf"]["0"], h, cfg.norm), cfg.act)
        t = _linear_nobias(bp["tdf"]["2"], t)
        t = _act(_norm(bp["tdf"]["3"], t, cfg.norm), cfg.act)
        t = _linear_nobias(bp["tdf"]["5"], t)
        h = h + t
        h = _conv(bp["tfc2"]["2"], _act(_norm(bp["tfc2"]["0"], h, cfg.norm), cfg.act),
                  padding=(1, 1))
        x = h + s
    return x


def apply_tfc_tdf(params: Dict[str, Any], cfg: TFCTDFConfig, chunks: jnp.ndarray,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """chunks (B, C, T) → stems (B, num_stems, C, T)
    (ref: TFC_TDF_net.forward:231-268)."""
    b, c_audio, t_samples = chunks.shape
    win = hann_window(cfg.n_fft)
    spec = stft_real_packed(chunks, cfg.n_fft, cfg.hop_length, win, cfg.dim_f)
    x = apply_tfc_tdf_spec(params, cfg, spec.astype(compute_dtype))
    out = istft_real_packed(x.astype(jnp.float32), cfg.n_fft, cfg.hop_length, win)
    out = out[..., :t_samples]
    if out.shape[-1] < t_samples:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1)
                      + [(0, t_samples - out.shape[-1])])
    return out  # (B, S, 2, T)


def apply_tfc_tdf_spec(params: Dict[str, Any], cfg: TFCTDFConfig,
                       spec: jnp.ndarray) -> jnp.ndarray:
    """Spectrogram-domain body: packed spec (B, C*2, dim_f, T) → per-stem
    packed spec (B, S, C*2, dim_f, T)."""
    k = cfg.num_subbands
    bb, cc, ff, tt = spec.shape
    x = spec.reshape(bb, cc, k, ff // k, tt).reshape(bb, cc * k, ff // k, tt)
    mix = x

    first_conv_out = x = _conv(params["first_conv"], x)
    x = x.swapaxes(-1, -2)  # (B, C, T, F)

    encoder_outputs = []
    for i in range(cfg.num_scales):
        ep = params["encoder_blocks"][str(i)]
        x = _tfc_tdf(ep["tfc_tdf"], x, cfg)
        encoder_outputs.append(x)
        dp = ep["downscale"]["conv"]
        x = _conv(dp["2"], _act(_norm(dp["0"], x, cfg.norm), cfg.act),
                  stride=tuple(cfg.scale))

    x = _tfc_tdf(params["bottleneck_block"], x, cfg)

    for i in range(cfg.num_scales):
        dp = params["decoder_blocks"][str(i)]
        up = dp["upscale"]["conv"]
        x = _conv_tr(up["2"], _act(_norm(up["0"], x, cfg.norm), cfg.act),
                     tuple(cfg.scale))
        x = jnp.concatenate([x, encoder_outputs.pop()], axis=1)
        x = _tfc_tdf(dp["tfc_tdf"], x, cfg)

    x = x.swapaxes(-1, -2)  # back to (B, C, F, T)
    x = x * first_conv_out  # artifact reduction (ref: :254)

    fp = params["final_conv"]
    x = _conv(fp["0"], jnp.concatenate([mix, x], axis=1))
    x = _act(x, cfg.act)
    x = _conv(fp["2"], x)

    # cws2cac
    bb2, cc2, ff2, tt2 = x.shape
    x = x.reshape(bb2, cc2 // k, k, ff2, tt2).reshape(bb2, cc2 // k, ff2 * k, tt2)

    if cfg.num_stems > 1:
        x = x.reshape(bb2, cfg.num_stems, -1, ff2 * k, tt2)
    else:
        x = x[:, None]
    return x
