"""BS-RoFormer and Mel-Band RoFormer — TPU-native functional JAX implementation.

Re-design of the reference's flagship architecture
(ref: uvr_lib_v5/roformer/bs_roformer.py, mel_band_roformer.py) around XLA:

* Pure functions over a parameter pytree (converted once from torch
  checkpoints by ``models/convert.py``); no module framework overhead.
* The ragged per-band BandSplit / MaskEstimator module lists become *padded
  batched einsums*: every band is padded to the widest band and processed in
  one ``(bands, max_in, dim)`` contraction on the MXU, with masked RMSNorm
  handling the padding exactly. The pad waste is negligible next to the
  transformer stack, and it removes ~124 tiny matmuls per step.
* The outer transformer depth runs under ``lax.scan`` over stacked per-layer
  parameters — one compiled block instead of `depth` unrolled copies.
* Band→frequency recombination is a static-index scatter-add shared by both
  variants (for BS bands are disjoint so it degenerates to a concat; for Mel
  overlapping bands sum and are averaged by band counts, ref:
  mel_band_roformer.py:417-431).
* Attention is plain scaled-dot-product in fp32/bf16 — per-window sequence
  lengths (≤ ~1200 frames / ~64 bands) fit comfortably, XLA fuses the
  softmax chain.

The STFT/iSTFT ride the shared ops in ``ops/stft.py`` inside the same jitted
program, so chunk → mask → audio is one fused device program.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention
from ..ops.exec_options import DEFAULT_EXEC, ExecutionOptions
from ..ops.stft import hann_window, istft, stft
from .melbands import mel_band_membership


@dataclass(frozen=True)
class RoformerConfig:
    kind: str  # "bs" | "mel"
    dim: int
    depth: int
    stereo: bool = False
    num_stems: int = 1
    time_transformer_depth: int = 2
    freq_transformer_depth: int = 2
    linear_transformer_depth: int = 0
    freqs_per_bands: Optional[Tuple[int, ...]] = None  # BS
    num_bands: Optional[int] = None  # Mel
    sample_rate: int = 44100
    dim_head: int = 64
    heads: int = 8
    stft_n_fft: int = 2048
    stft_hop_length: int = 512
    stft_win_length: int = 2048
    mask_estimator_depth: int = 2
    mlp_expansion_factor: int = 4
    match_input_audio_length: bool = False
    flash_attn: bool = True  # accepted for config parity; XLA decides fusion

    @property
    def audio_channels(self) -> int:
        return 2 if self.stereo else 1

    @property
    def n_bins(self) -> int:
        return self.stft_n_fft // 2 + 1


@dataclass(frozen=True)
class BandLayout:
    """Static tables mapping packed spectrogram features (row-major ``(f s)``
    rows × (re, im)) to per-band padded lanes.

    Both BS and Mel bands cover *contiguous* bin ranges (BS by construction;
    Mel because triangular filters have interval support), so gather/scatter
    are static slices — no TPU scatter ops anywhere on the hot path."""

    n_bands: int
    max_in: int
    n_feat: int  # n_bins * channels * 2
    starts: np.ndarray  # (n_bands,) feature-range start per band
    in_dims: np.ndarray  # (n_bands,) int32 valid widths (feature count)
    in_mask: np.ndarray  # (n_bands, max_in) float32 pad mask
    denom: np.ndarray  # (n_feat,) float32 per-feature overlap counts
    # Contiguous runs of equal-width bands: (band_start, band_end, width,
    # dense) — ``dense`` marks runs whose feature ranges tile contiguously
    # (true for all BS bands; mel bands overlap). Band-split and
    # mask-estimator weights are stored *per run without padding*: padding
    # every band to max_in costs ~15x the params on the flagship 62-band
    # layout (two (2, 62, 2048, 516) leaves = 520 MB bf16 where the real
    # checkpoint holds 34 MB) — pure HBM/upload/FLOP waste.
    runs: tuple


@functools.lru_cache(maxsize=16)
def band_layout(cfg: RoformerConfig) -> BandLayout:
    s = cfg.audio_channels
    if cfg.kind == "bs":
        if cfg.freqs_per_bands is None:
            raise ValueError("BS-RoFormer requires freqs_per_bands")
        if sum(cfg.freqs_per_bands) != cfg.n_bins:
            raise ValueError(
                f"freqs_per_bands must sum to {cfg.n_bins}, got {sum(cfg.freqs_per_bands)}"
            )
        band_bins = []
        start = 0
        for nf in cfg.freqs_per_bands:
            band_bins.append(np.arange(start, start + nf))
            start += nf
    elif cfg.kind == "mel":
        if cfg.num_bands is None:
            raise ValueError("Mel-Band RoFormer requires num_bands")
        member, _, _, _ = mel_band_membership(cfg.sample_rate, cfg.stft_n_fft, cfg.num_bands)
        band_bins = [np.nonzero(member[i])[0] for i in range(cfg.num_bands)]
    else:
        raise ValueError(f"unknown roformer kind {cfg.kind}")

    n_bands = len(band_bins)
    n_feat = cfg.n_bins * s * 2
    dims = np.array([len(b) * s * 2 for b in band_bins], dtype=np.int32)
    max_in = int(dims.max())
    starts = np.zeros(n_bands, dtype=np.int32)
    in_mask = np.zeros((n_bands, max_in), dtype=np.float32)
    counts = np.zeros(n_feat, dtype=np.float32)
    for i, bins in enumerate(band_bins):
        bins = np.asarray(bins)
        if len(bins) > 1 and not (np.diff(bins) == 1).all():
            raise ValueError(f"band {i} bins are not contiguous")
        # feature range = [b0*s*2, b1*s*2) — row-major (f s) rows × (re, im).
        starts[i] = int(bins[0]) * s * 2
        in_mask[i, : dims[i]] = 1.0
        counts[starts[i] : starts[i] + dims[i]] += 1.0
    runs = []
    i = 0
    while i < n_bands:
        j = i
        while j + 1 < n_bands and dims[j + 1] == dims[i]:
            j += 1
        w = int(dims[i])
        dense = all(int(starts[k + 1]) == int(starts[k]) + w for k in range(i, j))
        runs.append((i, j + 1, w, dense))
        i = j + 1
    return BandLayout(n_bands, max_in, n_feat, starts, dims, in_mask,
                      np.maximum(counts, 1e-8), tuple(runs))


# ---------------------------------------------------------------------------
# Functional blocks


def _rmsnorm(x: jnp.ndarray, gamma: jnp.ndarray,
             norm_mode: str = "fp32") -> jnp.ndarray:
    """torch: F.normalize(x, dim=-1) * sqrt(d) * gamma (fp32 internally).

    ``norm_mode="bf16"`` (ExecutionOptions.norm) keeps the normalised
    activations in the compute dtype end-to-end (the sum-of-squares still
    accumulates in fp32, which is what carries the precision); A/B switch for
    fusion behaviour on TPU.
    """
    scale = np.sqrt(x.shape[-1])
    if norm_mode == "bf16":
        ssq = jnp.sum(x.astype(jnp.float32) * x.astype(jnp.float32), axis=-1,
                      keepdims=True)
        inv = (scale * jax.lax.rsqrt(jnp.maximum(ssq, 1e-24))).astype(x.dtype)
        return x * inv * gamma
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    out = x32 / jnp.maximum(norm, 1e-12) * scale
    return (out * gamma).astype(x.dtype)


def _rope_tables(n: int, dim_head: int, dtype=jnp.float32):
    """rotary_embedding_torch convention: interleaved pairs, theta=10000."""
    inv = 1.0 / (10000.0 ** (np.arange(0, dim_head, 2, dtype=np.float64) / dim_head))
    ang = np.arange(n, dtype=np.float64)[:, None] * inv[None, :]  # (n, dh/2)
    cos = np.repeat(np.cos(ang), 2, axis=-1)
    sin = np.repeat(np.sin(ang), 2, axis=-1)
    return jnp.asarray(cos, dtype=dtype), jnp.asarray(sin, dtype=dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x = jnp.stack([-x[..., 1], x[..., 0]], axis=-1)
    return x.reshape(*x.shape[:-2], -1)


def _attention(p: Dict[str, jnp.ndarray], x: jnp.ndarray, heads: int,
               rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
               opts: "ExecutionOptions" = None) -> jnp.ndarray:
    """Gated multi-head attention (ref: bs_roformer.py Attention).

    ``opts.qkv="einsum"`` expresses the head split/merge as einsum
    contractions producing ``(b, h, n, dh)`` directly instead of
    reshape+transpose chains — on TPU the transposes materialise as HBM
    layout copies that the device trace showed costing as much as the
    attention matmuls themselves.
    """
    opts = opts or DEFAULT_EXEC
    b, n, d = x.shape
    xn = _rmsnorm(x, p["attn_norm"], opts.norm)
    qkv_mode = opts.qkv
    if qkv_mode is None:
        # Default: einsum head projections whenever the Pallas attention
        # kernel is available (TPU) — einsum projections hand (b,h,n,dh) to
        # the kernel without the big relayout. Measured on the flagship
        # forward: 486 ms vs 530 ms (matmul qkv + Pallas attention) vs
        # 630-638 ms (einsum-softmax attention). Only reached when the fused
        # block kernel is disabled (AUDSEP_BLOCK=off). On non-TPU backends
        # the fused qkv matmul + transpose is the right shape.
        from ..ops.attention import _flash_available

        qkv_mode = "einsum" if _flash_available() else "matmul"
    if qkv_mode == "einsum":
        w3 = p["wqkv"].reshape(d, 3, heads, -1)
        proj = functools.partial(jnp.einsum, "bnd,dhk->bhnk",
                                 preferred_element_type=jnp.float32)
        q = proj(xn, w3[:, 0]).astype(x.dtype)
        k = proj(xn, w3[:, 1]).astype(x.dtype)
        v = proj(xn, w3[:, 2]).astype(x.dtype)
        merge_einsum = True
    else:
        qkv = xn @ p["wqkv"]  # (b, n, 3*h*dh)
        dh = qkv.shape[-1] // (3 * heads)
        qkv = qkv.reshape(b, n, 3, heads, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (b, h, n, dh)
        merge_einsum = False
    if rope is not None:
        cos, sin = rope
        q = q * cos + _rotate_half(q) * sin
        k = k * cos + _rotate_half(k) * sin
    out = dot_product_attention(q, k, v, force=opts.attn).astype(x.dtype)
    gates = jax.nn.sigmoid(xn @ p["gate_w"] + p["gate_b"])  # (b, n, h)
    out = out * gates.transpose(0, 2, 1)[..., None]
    if merge_einsum:
        wo = p["wo"].reshape(heads, -1, d)
        return jnp.einsum("bhnk,hkd->bnd", out, wo,
                          preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, heads * out.shape[-1])
    return out @ p["wo"]


def _linear_attention(p: Dict[str, jnp.ndarray], x: jnp.ndarray,
                      heads: int) -> jnp.ndarray:
    """XCiT-style cross-covariance attention (ref: bs_roformer.py:104-133):
    the (dim_head × dim_head) attention matrix contracts over *tokens*, with
    q/k l2-normalised along tokens, a learned per-head temperature on q, and
    a fixed softmax scale of 8. Cost is linear in sequence length."""
    b, n, d = x.shape
    xn = _rmsnorm(x, p["attn_norm"])
    qkv = xn @ p["wqkv"]  # (b, n, 3*h*dh)
    dh = qkv.shape[-1] // (3 * heads)
    qkv = qkv.reshape(b, n, 3, heads, dh).transpose(2, 0, 3, 4, 1)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (b, h, dh, n)

    def l2(t):
        t32 = t.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(t32 * t32, axis=-1, keepdims=True))
        return (t32 / jnp.maximum(norm, 1e-12)).astype(t.dtype)

    temp = jnp.exp(p["temperature"].astype(jnp.float32)).reshape(1, heads, 1, 1)
    q = (l2(q).astype(jnp.float32) * temp).astype(x.dtype)
    k = l2(k)
    sim = jnp.einsum("bhdn,bhen->bhde", q, k,
                     preferred_element_type=jnp.float32) * 8.0
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhde,bhen->bhdn", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 3, 1, 2).reshape(b, n, heads * dh)
    return out @ p["wo"]


def _feedforward(p: Dict[str, jnp.ndarray], x: jnp.ndarray,
                 norm_mode: str = "fp32") -> jnp.ndarray:
    xn = _rmsnorm(x, p["ff_norm"], norm_mode)
    h = jax.nn.gelu(xn @ p["ff_w1"] + p["ff_b1"], approximate=False)
    return h @ p["ff_w2"] + p["ff_b2"]


def _transformer(stack: Dict[str, jnp.ndarray], x: jnp.ndarray, heads: int,
                 inner_depth: int,
                 rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
                 linear: bool = False,
                 opts: ExecutionOptions = None) -> jnp.ndarray:
    """Inner transformer: `inner_depth` × (attn + ff), optional output norm.

    `stack` leaves carry a leading (inner_depth, ...) axis.

    On TPU the default runs each attention half-block as one fused Pallas
    kernel (norm+qkv+RoPE+attention+gate+proj+residual VMEM-resident; see
    ops/attention_block.py) — the sequence axis is padded to the 128-lane
    granularity once around the whole inner stack, key columns masked by
    ``n_valid``, and the feedforward halves stay in XLA. ``opts.block``
    overrides: ``off`` (unfused), ``pallas`` (force), ``pallas_full``
    (also fuse the feedforward half, ops/attention_block.fused_ff_block).
    """
    opts = opts or DEFAULT_EXEC
    block_mode = opts.block
    if block_mode is None:
        # Default: both halves of every layer as fused Pallas kernels wherever
        # they are available (TPU). Measured on the flagship forward (2×8 s
        # chunk, bf16): 307 ms (attn+FF fused) vs 370 ms (attn fused only) vs
        # 486 ms for the best unfused path (einsum-qkv + Pallas whole-seq
        # attention) vs 638 ms for XLA einsum-softmax — the win is eliminating
        # the HBM layout traffic between norm/qkv/RoPE/attention/gate/
        # projection and around the FF matmuls. ``AUDSEP_BLOCK=off`` forces
        # the unfused path, ``pallas`` fuses only the attention half.
        block_mode = "pallas_full"
    if block_mode in ("pallas", "pallas_full") and not linear:
        from ..ops.attention import _flash_available
        from ..ops.attention_block import fused_attention_block, fused_ff_block

        if _flash_available():
            b, n, d = x.shape
            # Pad the token axis for the kernels to a 64-multiple. Tokens are
            # the *sublane* dim of every in-kernel matmul (granularity 8/16,
            # not the 128-lane rule), so 64 suffices — measured on the
            # flagship forward it cut 306 ms → 216 ms per 2×8 s chunk vs
            # 128-padding (freq axis 62→64 instead of 62→128 halves that
            # half's matmul work; time axis 801→832 instead of 896 saves 7%).
            # opts.seq_pad overrides the granularity for A/B (rounded up
            # to a 64-multiple: the fused kernels assert n_pad % 64 == 0).
            # 0 keeps the old AUDSEP_SEQ_PAD=0 "use the default" contract.
            gran = max(64, -(-opts.seq_pad // 64) * 64)
            pad = (-n) % gran
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            rope_p = rope
            if rope is not None and pad:
                rope_p = (jnp.pad(rope[0], ((0, pad), (0, 0))),
                          jnp.pad(rope[1], ((0, pad), (0, 0))))
            for j in range(inner_depth):
                layer = {k: v[j] for k, v in stack.items() if k != "out_norm"}
                x = fused_attention_block(
                    x, layer["wqkv"], layer["gate_w"], layer["gate_b"],
                    layer["wo"], layer["attn_norm"], rope_p, heads, n_valid=n)
                if block_mode == "pallas_full":
                    x = fused_ff_block(x, layer["ff_norm"], layer["ff_w1"],
                                       layer["ff_b1"], layer["ff_w2"],
                                       layer["ff_b2"])
                else:
                    x = x + _feedforward(layer, x, opts.norm)
            if pad:
                x = x[:, :n]
            if "out_norm" in stack:
                x = _rmsnorm(x, stack["out_norm"], opts.norm)
            return x

    for j in range(inner_depth):
        layer = {k: v[j] for k, v in stack.items() if k != "out_norm"}
        if linear:
            x = x + _linear_attention(layer, x, heads)
        else:
            x = x + _attention(layer, x, heads, rope, opts)
        x = x + _feedforward(layer, x, opts.norm)
    if "out_norm" in stack:
        x = _rmsnorm(x, stack["out_norm"], opts.norm)
    return x


# ---------------------------------------------------------------------------
# Full model


def _gather_run(feats: jnp.ndarray, layout: BandLayout, run) -> jnp.ndarray:
    """feats (B, T, n_feat) → (B, T, g, w) for one equal-width band run —
    a single reshape when the run's feature ranges tile contiguously."""
    s0, e0, w, dense = run
    if dense:
        fs = int(layout.starts[s0])
        g = e0 - s0
        return feats[..., fs : fs + g * w].reshape(*feats.shape[:-1], g, w)
    return jnp.stack(
        [feats[..., int(layout.starts[i]) : int(layout.starts[i]) + w]
         for i in range(s0, e0)], axis=-2)


def _band_split(p: Dict[str, Any], feats: jnp.ndarray,
                layout: BandLayout, compute_dtype) -> jnp.ndarray:
    """feats (B, T, n_feat) → (B, T, n_bands, dim): per-run unpadded batched
    einsums (ref: BandSplit, bs_roformer.py — RMSNorm over the band's real
    features then Linear(dim_in → dim))."""
    outs = []
    for run, gp in zip(layout.runs, p["groups"]):
        _, _, w, _ = run
        xb32 = _gather_run(feats, layout, run).astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xb32 * xb32, axis=-1, keepdims=True))
        xn = xb32 / jnp.maximum(norm, 1e-12) * np.sqrt(w)
        xn = (xn * gp["gamma"]).astype(compute_dtype)
        outs.append(jnp.einsum(
            "btni,nid->btnd", xn, gp["w"].astype(compute_dtype),
            preferred_element_type=jnp.float32).astype(compute_dtype))
    x = jnp.concatenate(outs, axis=-2)
    return x + p["b"].astype(compute_dtype)


def _mask_estimate(p: Dict[str, Any], x: jnp.ndarray, layout: BandLayout,
                   cfg: RoformerConfig) -> list:
    """x (B, T, nb, dim) → per-run band features [(B, T, ns, g, w), ...].

    MLP hidden tanh layers batched over all bands, then the final GLU
    projection per equal-width run *without padding* (ref: MaskEstimator,
    bs_roformer.py:205-229; mel_band_roformer.py:164-188)."""
    h = x[:, :, None]  # (B, T, 1, nb, dim)
    for layer in p["hidden"]:
        h = jnp.einsum("btsnd,sndh->btsnh", h, layer["w"],
                       preferred_element_type=jnp.float32).astype(x.dtype) + layer["b"]
        h = jnp.tanh(h)
    outs = []
    for run, gp in zip(layout.runs, p["groups"]):
        s0, e0, _, _ = run
        hg = h[..., s0:e0, :]
        val = jnp.einsum("btsnd,sndo->btsno", hg, gp["val_w"],
                         preferred_element_type=jnp.float32) + gp["val_b"]
        gate = jnp.einsum("btsnd,sndo->btsno", hg, gp["gate_w"],
                          preferred_element_type=jnp.float32) + gp["gate_b"]
        outs.append(val * jax.nn.sigmoid(gate))
    return outs


def apply_roformer(
    params: Dict[str, Any],
    cfg: RoformerConfig,
    audio: jnp.ndarray,
    compute_dtype=jnp.float32,
    opts: ExecutionOptions = None,
) -> jnp.ndarray:
    """Forward pass: ``audio (B, channels, T)`` → stems ``(B, num_stems, channels, T_out)``.

    Mirrors BSRoformer.forward / MelBandRoformer.forward semantics
    (ref: bs_roformer.py:418-514, mel_band_roformer.py:332-442).
    ``opts`` (ops/exec_options.py) selects kernel/layout variants explicitly —
    nothing under the trace reads the environment.
    """
    opts = opts or DEFAULT_EXEC
    layout = band_layout(cfg)
    # One-time cast of the weight pytree to the compute dtype (fused by XLA);
    # norms still accumulate in fp32 internally.
    params = jax.tree.map(lambda a: jnp.asarray(a, compute_dtype), params)
    b, s, t = audio.shape
    assert s == cfg.audio_channels, f"expected {cfg.audio_channels} channels, got {s}"
    n_fft, hop = cfg.stft_n_fft, cfg.stft_hop_length
    win = hann_window(cfg.stft_win_length)
    if cfg.stft_win_length < n_fft:
        lp = (n_fft - cfg.stft_win_length) // 2
        win = jnp.pad(win, (lp, n_fft - cfg.stft_win_length - lp))

    spec = stft(audio.reshape(b * s, t), n_fft, hop, win,
                impl=opts.stft)  # (b*s, F, Tf) c64
    n_bins, tf = spec.shape[-2], spec.shape[-1]
    spec = spec.reshape(b, s, n_bins, tf)
    rows = spec.transpose(0, 2, 1, 3).reshape(b, n_bins * s, tf)  # (f s) rows

    feats = jnp.stack([rows.real, rows.imag], axis=-1)  # (b, rows, Tf, 2)
    feats = feats.transpose(0, 2, 1, 3).reshape(b, tf, layout.n_feat)

    x = _band_split(params["band_split"], feats.astype(compute_dtype), layout,
                    compute_dtype)  # (b, Tf, nb, dim)

    time_rope = _rope_tables(tf, cfg.dim_head, compute_dtype)
    freq_rope = _rope_tables(layout.n_bands, cfg.dim_head, compute_dtype)
    heads = cfg.heads

    def outer_block(carry, lp):
        x = carry
        if "linear" in lp:
            flat = x.reshape(b, tf * layout.n_bands, cfg.dim)
            flat = _transformer(lp["linear"], flat, heads,
                                cfg.linear_transformer_depth, None, linear=True,
                                opts=opts)
            x = flat.reshape(b, tf, layout.n_bands, cfg.dim)
        # time attention: tokens = frames, bands folded into batch
        xt = x.transpose(0, 2, 1, 3).reshape(b * layout.n_bands, tf, cfg.dim)
        xt = _transformer(lp["time"], xt, heads, cfg.time_transformer_depth,
                          time_rope, opts=opts)
        x = xt.reshape(b, layout.n_bands, tf, cfg.dim).transpose(0, 2, 1, 3)
        # freq attention: tokens = bands, frames folded into batch
        xf = x.reshape(b * tf, layout.n_bands, cfg.dim)
        xf = _transformer(lp["freq"], xf, heads, cfg.freq_transformer_depth,
                          freq_rope, opts=opts)
        x = xf.reshape(b, tf, layout.n_bands, cfg.dim)
        return x, None

    x, _ = jax.lax.scan(outer_block, x, params["blocks"])

    if "final_norm" in params:
        x = _rmsnorm(x, params["final_norm"]["gamma"], opts.norm)

    banded_runs = _mask_estimate(params["mask_est"], x, layout, cfg)

    # Band → frequency-feature recombination: static-slice adds (no scatter;
    # BS bands are disjoint so dense runs degenerate to reshaped concats, Mel
    # bands overlap and sum, averaged by band counts below).
    ns = cfg.num_stems
    acc = jnp.zeros((b, tf, ns, layout.n_feat), dtype=jnp.float32)
    for run, o in zip(layout.runs, banded_runs):
        s0, e0, w, dense = run
        o = o.astype(jnp.float32)  # (b, tf, ns, g, w)
        if dense:
            fs = int(layout.starts[s0])
            g = e0 - s0
            acc = acc.at[..., fs : fs + g * w].add(o.reshape(b, tf, ns, g * w))
        else:
            for j in range(e0 - s0):
                st = int(layout.starts[s0 + j])
                acc = acc.at[..., st : st + w].add(o[..., j, :])
    if cfg.kind == "mel":
        acc = acc / jnp.asarray(layout.denom)

    mask_feats = acc.transpose(0, 2, 3, 1)  # (b, ns, n_feat, Tf)
    mask_feats = mask_feats.reshape(b, ns, n_bins * s, 2, tf)
    mask = jax.lax.complex(mask_feats[..., 0, :], mask_feats[..., 1, :])  # (b, ns, rows, Tf)

    spec_out = rows[:, None] * mask  # (b, ns, rows, Tf)
    spec_out = spec_out.reshape(b, ns, n_bins, s, tf).transpose(0, 1, 3, 2, 4)
    out_len = t if cfg.match_input_audio_length else None
    audio_out = istft(spec_out.reshape(b * ns * s, n_bins, tf), n_fft, hop, win,
                      length=out_len, impl=opts.stft)
    return audio_out.reshape(b, ns, s, -1)
