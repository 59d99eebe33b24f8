"""VR architecture networks — CascadedASPPNet (v5) and CascadedNet (v5.1).

Functional JAX re-implementations of the reference's torch modules
(ref: uvr_lib_v5/vr_network/nets.py:5-175, nets_new.py:7-160, layers.py,
layers_new.py). Parameters are nested dicts keyed by the torch module path
(state_dict keys split on '.'), so conversion is a mechanical tree-build with
no renaming; structure (padding, strides, dilations) comes from the
architecture constants exactly as in the reference constructors.

All convs run in NCHW via ``lax.conv_general_dilated``; bilinear upsampling
reproduces torch's ``align_corners=True`` semantics exactly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Primitive blocks


def conv2d(x, w, stride=(1, 1), padding=(0, 0), dilation=(1, 1), groups=1):
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(w, x.dtype),
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def batchnorm(p: Dict[str, Any], x, eps=1e-5):
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = jax.lax.rsqrt(jnp.asarray(p["running_var"], x.dtype) + eps)
    return ((x - jnp.asarray(p["running_mean"], x.dtype).reshape(shape))
            * (inv * jnp.asarray(p["weight"], x.dtype)).reshape(shape)
            + jnp.asarray(p["bias"], x.dtype).reshape(shape))


def _act(x, activ: str):
    if activ == "relu":
        return jnp.maximum(x, 0)
    if activ == "leaky":
        return jnp.where(x >= 0, x, 0.01 * x)
    raise ValueError(activ)


def bilinear_align_corners(x, out_h: int, out_w: int):
    """torch F.interpolate(..., mode='bilinear', align_corners=True)."""
    n, c, h, w = x.shape

    def axis_weights(in_dim, out_dim):
        if out_dim == 1 or in_dim == 1:
            idx = np.zeros(out_dim, np.int32)
            return idx, idx, np.zeros(out_dim, np.float32)
        pos = np.linspace(0.0, in_dim - 1.0, out_dim)
        lo = np.floor(pos).astype(np.int32)
        hi = np.minimum(lo + 1, in_dim - 1)
        frac = (pos - lo).astype(np.float32)
        return lo, hi, frac

    h_lo, h_hi, h_fr = axis_weights(h, out_h)
    w_lo, w_hi, w_fr = axis_weights(w, out_w)
    # Keep the interpolation weights in the activation dtype: f32 numpy
    # weights would promote a bf16 autocast run to f32 for the whole
    # downstream cascade.
    h_fr = jnp.asarray(h_fr, x.dtype)
    w_fr = jnp.asarray(w_fr, x.dtype)
    top = x[:, :, h_lo, :] * (1 - h_fr)[None, None, :, None] \
        + x[:, :, h_hi, :] * h_fr[None, None, :, None]
    out = top[:, :, :, w_lo] * (1 - w_fr)[None, None, None, :] \
        + top[:, :, :, w_hi] * w_fr[None, None, None, :]
    return out


def crop_center(skip, target):
    """ref: spec_utils.crop_center:50 — crop skip's time axis to target's."""
    t1, t2 = skip.shape[3], target.shape[3]
    if t1 == t2:
        return skip
    if t1 < t2:
        raise ValueError("skip time axis smaller than target")
    start = (t1 - t2) // 2
    return skip[:, :, :, start : start + t2]


def _cba(p, x, stride=1, dilation=(1, 1), activ="relu"):
    """Conv2DBNActiv: padding = dilation for k=3, 0 for k=1 (matches every
    reference constructor call)."""
    w = p["conv"]["0"]["weight"]
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    k = w.shape[-1]
    pad = dilation if k == 3 else (0, 0)
    x = conv2d(x, w, stride=stride, padding=pad, dilation=dilation)
    return _act(batchnorm(p["conv"]["1"], x), activ)


def _sep_cba(p, x, dilation, activ="relu"):
    """SeperableConv2DBNActiv: depthwise k3 (pad=dilation) + pointwise k1 + BN."""
    wd = p["conv"]["0"]["weight"]
    groups = wd.shape[0]
    x = conv2d(x, wd, padding=(dilation, dilation), dilation=dilation, groups=groups)
    x = conv2d(x, p["conv"]["1"]["weight"])
    return _act(batchnorm(p["conv"]["2"], x), activ)


# --------------------------------------------------------------------------
# VR v5: CascadedASPPNet (nets.py / layers.py)


def _encoder_v5(p, x, stride):
    skip = _cba(p["conv1"], x, stride=1, activ="leaky")
    hidden = _cba(p["conv2"], skip, stride=stride, activ="leaky")
    return hidden, skip


def _decoder_v5(p, x, skip=None):
    x = bilinear_align_corners(x, x.shape[2] * 2, x.shape[3] * 2)
    if skip is not None:
        skip = crop_center(skip, x)
        x = jnp.concatenate([x, skip], axis=1)
    return _cba(p["conv"], x)


def _aspp_v5(p, x, arch: int, dilations=(4, 8, 16)):
    h, w = x.shape[2], x.shape[3]
    pooled = jnp.mean(x, axis=2, keepdims=True)  # AdaptiveAvgPool2d((1, None))
    feat1 = _cba(p["conv1"]["1"], pooled)
    feat1 = bilinear_align_corners(feat1, h, w)
    feats = [feat1, _cba(p["conv2"], x)]
    feats.append(_sep_cba(p["conv3"], x, dilations[0]))
    feats.append(_sep_cba(p["conv4"], x, dilations[1]))
    feats.append(_sep_cba(p["conv5"], x, dilations[2]))
    if arch in (129605,):
        feats.append(_sep_cba(p["conv6"], x, dilations[2]))
    elif arch in (537238, 537227, 33966):
        feats.append(_sep_cba(p["conv6"], x, dilations[2]))
        feats.append(_sep_cba(p["conv7"], x, dilations[2]))
    out = jnp.concatenate(feats, axis=1)
    return _cba(p["bottleneck"]["0"], out)


def _base_aspp_net(p, x, arch: int):
    h, e1 = _encoder_v5(p["enc1"], x, 2)
    h, e2 = _encoder_v5(p["enc2"], h, 2)
    h, e3 = _encoder_v5(p["enc3"], h, 2)
    h, e4 = _encoder_v5(p["enc4"], h, 2)
    if arch == 129605:
        h, e5 = _encoder_v5(p["enc5"], h, 2)
        h = _aspp_v5(p["aspp"], h, arch)
        h = _decoder_v5(p["dec5"], h, e5)
    else:
        h = _aspp_v5(p["aspp"], h, arch)
    h = _decoder_v5(p["dec4"], h, e4)
    h = _decoder_v5(p["dec3"], h, e3)
    h = _decoder_v5(p["dec2"], h, e2)
    h = _decoder_v5(p["dec1"], h, e1)
    return h


def _replicate_pad_freq(mask, output_bin):
    pad = output_bin - mask.shape[2]
    if pad > 0:
        edge = jnp.repeat(mask[:, :, -1:, :], pad, axis=2)
        mask = jnp.concatenate([mask, edge], axis=2)
    return mask


def apply_cascaded_aspp_net(params, x, n_fft_bins: int, arch: int):
    """CascadedASPPNet.forward (inference) — x: (B, 2, bins, frames) mag."""
    max_bin = n_fft_bins // 2
    output_bin = n_fft_bins // 2 + 1
    xin = x[:, :, :max_bin]
    bandwidth = xin.shape[2] // 2
    low = _base_aspp_net(params["stg1_low_band_net"], xin[:, :, :bandwidth], arch)
    high = _base_aspp_net(params["stg1_high_band_net"], xin[:, :, bandwidth:], arch)
    aux1 = jnp.concatenate([low, high], axis=2)

    h = jnp.concatenate([xin, aux1], axis=1)
    aux2 = _base_aspp_net(params["stg2_full_band_net"], _cba(params["stg2_bridge"], h), arch)

    h = jnp.concatenate([xin, aux1, aux2], axis=1)
    h = _base_aspp_net(params["stg3_full_band_net"], _cba(params["stg3_bridge"], h), arch)

    mask = jax.nn.sigmoid(conv2d(h, params["out"]["weight"]))
    return _replicate_pad_freq(mask, output_bin)


def predict_mask_v5(params, x, n_fft_bins: int, arch: int, offset: int = 128):
    mask = apply_cascaded_aspp_net(params, x, n_fft_bins, arch)
    if offset > 0:
        mask = mask[:, :, :, offset:-offset]
    return mask


# --------------------------------------------------------------------------
# VR 5.1: CascadedNet (nets_new.py / layers_new.py)


def _encoder_v51(p, x, stride):
    h = _cba(p["conv1"], x, stride=stride, activ="leaky")
    return _cba(p["conv2"], h, stride=1, activ="leaky")


def _decoder_v51(p, x, skip=None):
    x = bilinear_align_corners(x, x.shape[2] * 2, x.shape[3] * 2)
    if skip is not None:
        skip = crop_center(skip, x)
        x = jnp.concatenate([x, skip], axis=1)
    return _cba(p["conv1"], x)


def _aspp_v51(p, x, dilations=((4, 2), (8, 4), (12, 6))):
    h, w = x.shape[2], x.shape[3]
    pooled = jnp.mean(x, axis=2, keepdims=True)
    feat1 = bilinear_align_corners(_cba(p["conv1"]["1"], pooled), h, w)
    feats = [feat1, _cba(p["conv2"], x),
             _cba(p["conv3"], x, dilation=dilations[0]),
             _cba(p["conv4"], x, dilation=dilations[1]),
             _cba(p["conv5"], x, dilation=dilations[2])]
    return _cba(p["bottleneck"], jnp.concatenate(feats, axis=1))


def _lstm_cell_scan(x_seq, w_ih, w_hh, b_ih, b_hh, reverse=False):
    """x_seq: (T, B, in) → hidden states (T, B, H); torch LSTM gate order i,f,g,o."""
    hidden = w_hh.shape[1]
    w_ih_t = jnp.asarray(w_ih.T, x_seq.dtype)
    w_hh_t = jnp.asarray(w_hh.T, x_seq.dtype)
    bias = jnp.asarray(b_ih + b_hh, x_seq.dtype)

    def step(carry, xt):
        h, c = carry
        gates = xt @ w_ih_t + h @ w_hh_t + bias
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    b = x_seq.shape[1]
    init = (jnp.zeros((b, hidden), x_seq.dtype), jnp.zeros((b, hidden), x_seq.dtype))
    _, hs = jax.lax.scan(step, init, x_seq, reverse=reverse)
    return hs


def _lstm_module(p, x):
    """LSTMModule (layers_new.py:124-160): conv1x1 → BiLSTM over frames →
    dense+BN1d+ReLU → (N, 1, bins, frames)."""
    n, _, nbins, nframes = x.shape
    h = _cba(p["conv"], x)[:, 0]  # (N, bins, frames)
    h = h.transpose(2, 0, 1)  # (frames, N, bins)
    lp = p["lstm"]
    fwd = _lstm_cell_scan(h, lp["weight_ih_l0"], lp["weight_hh_l0"],
                          lp["bias_ih_l0"], lp["bias_hh_l0"])
    bwd = _lstm_cell_scan(h, lp["weight_ih_l0_reverse"], lp["weight_hh_l0_reverse"],
                          lp["bias_ih_l0_reverse"], lp["bias_hh_l0_reverse"], reverse=True)
    h = jnp.concatenate([fwd, bwd], axis=-1)  # (frames, N, nout_lstm)
    flat = h.reshape(-1, h.shape[-1])
    dense = p["dense"]
    flat = flat @ jnp.asarray(dense["0"]["weight"].T, flat.dtype) + jnp.asarray(dense["0"]["bias"], flat.dtype)
    # BatchNorm1d over features
    bn = dense["1"]
    inv = jax.lax.rsqrt(jnp.asarray(bn["running_var"], flat.dtype) + 1e-5)
    flat = (flat - jnp.asarray(bn["running_mean"], flat.dtype)) * inv \
        * jnp.asarray(bn["weight"], flat.dtype) + jnp.asarray(bn["bias"], flat.dtype)
    flat = jnp.maximum(flat, 0)
    out = flat.reshape(nframes, n, 1, nbins)
    return out.transpose(1, 2, 3, 0)


def _base_net_v51(p, x):
    e1 = _cba(p["enc1"], x)
    e2 = _encoder_v51(p["enc2"], e1, 2)
    e3 = _encoder_v51(p["enc3"], e2, 2)
    e4 = _encoder_v51(p["enc4"], e3, 2)
    e5 = _encoder_v51(p["enc5"], e4, 2)
    h = _aspp_v51(p["aspp"], e5)
    h = _decoder_v51(p["dec4"], h, e4)
    h = _decoder_v51(p["dec3"], h, e3)
    h = _decoder_v51(p["dec2"], h, e2)
    h = jnp.concatenate([h, _lstm_module(p["lstm_dec2"], h)], axis=1)
    return _decoder_v51(p["dec1"], h, e1)


def apply_cascaded_net(params, x, n_fft_bins: int):
    """CascadedNet.forward (inference) — x: (B, 2, bins, frames) mag."""
    max_bin = n_fft_bins // 2
    output_bin = n_fft_bins // 2 + 1
    xin = x[:, :, :max_bin]
    bandw = xin.shape[2] // 2
    l1_in, h1_in = xin[:, :, :bandw], xin[:, :, bandw:]

    l1 = _cba(params["stg1_low_band_net"]["1"],
              _base_net_v51(params["stg1_low_band_net"]["0"], l1_in))
    h1 = _base_net_v51(params["stg1_high_band_net"], h1_in)
    aux1 = jnp.concatenate([l1, h1], axis=2)

    l2_in = jnp.concatenate([l1_in, l1], axis=1)
    h2_in = jnp.concatenate([h1_in, h1], axis=1)
    l2 = _cba(params["stg2_low_band_net"]["1"],
              _base_net_v51(params["stg2_low_band_net"]["0"], l2_in))
    h2 = _base_net_v51(params["stg2_high_band_net"], h2_in)
    aux2 = jnp.concatenate([l2, h2], axis=2)

    f3_in = jnp.concatenate([xin, aux1, aux2], axis=1)
    f3 = _base_net_v51(params["stg3_full_band_net"], f3_in)
    mask = jax.nn.sigmoid(conv2d(f3, params["out"]["weight"]))
    return _replicate_pad_freq(mask, output_bin)


def predict_mask_v51(params, x, n_fft_bins: int, offset: int = 64):
    mask = apply_cascaded_net(params, x, n_fft_bins)
    if offset > 0:
        mask = mask[:, :, :, offset:-offset]
    return mask


# --------------------------------------------------------------------------
# Conversion helper


def state_dict_to_tree(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """'a.b.c' → tree['a']['b']['c'] (drops num_batches_tracked)."""
    tree: Dict[str, Any] = {}
    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(value)
    return tree
