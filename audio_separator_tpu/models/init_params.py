"""Random parameter initialisation for RoFormer configs.

Used by benchmarks / compile checks / sharding dry-runs when no trained
checkpoint is on disk (the driver environment has no network egress); the
pytree layout is identical to ``convert.convert_roformer`` output.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .roformer import RoformerConfig, band_layout


def init_roformer_params(cfg: RoformerConfig, seed: int = 0, scale: float = 0.02) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    layout = band_layout(cfg)
    nb, max_in, dim = layout.n_bands, layout.max_in, cfg.dim
    h, dh = cfg.heads, cfg.dim_head
    hidden = dim * 4

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def band_masked(*shape):
        arr = w(*shape)
        mask = layout.in_mask
        if shape[-1] == max_in:
            arr *= mask.reshape((1,) * (len(shape) - 2) + (nb, max_in)) if len(shape) > 2 else mask
        return arr

    def trans_stack(inner_depth: int, with_norm: bool):
        d = cfg.depth
        stack = {
            "attn_norm": np.ones((d, inner_depth, dim), np.float32),
            "wqkv": w(d, inner_depth, dim, 3 * h * dh),
            "gate_w": w(d, inner_depth, dim, h),
            "gate_b": np.zeros((d, inner_depth, h), np.float32),
            "wo": w(d, inner_depth, h * dh, dim),
            "ff_norm": np.ones((d, inner_depth, dim), np.float32),
            "ff_w1": w(d, inner_depth, dim, hidden),
            "ff_b1": np.zeros((d, inner_depth, hidden), np.float32),
            "ff_w2": w(d, inner_depth, hidden, dim),
            "ff_b2": np.zeros((d, inner_depth, dim), np.float32),
        }
        if with_norm:
            stack["out_norm"] = np.ones((d, dim), np.float32)
        return stack

    params: Dict[str, Any] = {
        "band_split": {
            "gamma": layout.in_mask.copy(),
            "w": w(nb, max_in, dim) * layout.in_mask[:, :, None],
            "b": np.zeros((nb, dim), np.float32),
        },
        "blocks": {
            "time": trans_stack(cfg.time_transformer_depth, cfg.kind == "mel"),
            "freq": trans_stack(cfg.freq_transformer_depth, cfg.kind == "mel"),
        },
    }
    if cfg.linear_transformer_depth > 0:
        lin = trans_stack(cfg.linear_transformer_depth, cfg.kind == "mel")
        for gate_key in ("gate_w", "gate_b"):
            lin.pop(gate_key)
        lin["temperature"] = np.ones(
            (cfg.depth, cfg.linear_transformer_depth, h), np.float32)
        params["blocks"]["linear"] = lin
    if cfg.kind == "bs":
        params["final_norm"] = {"gamma": np.ones(dim, np.float32)}

    mask_hidden = dim * cfg.mlp_expansion_factor
    hidden_layers = []
    for i in range(cfg.mask_estimator_depth - 1):
        in_dim = dim if i == 0 else mask_hidden
        hidden_layers.append({
            "w": w(cfg.num_stems, nb, in_dim, mask_hidden),
            "b": np.zeros((cfg.num_stems, nb, mask_hidden), np.float32),
        })
    final_in = dim if cfg.mask_estimator_depth == 1 else mask_hidden
    params["mask_est"] = {
        "hidden": hidden_layers,
        "val_w": w(cfg.num_stems, nb, final_in, max_in),
        "val_b": np.zeros((cfg.num_stems, nb, max_in), np.float32),
        "gate_w": w(cfg.num_stems, nb, final_in, max_in),
        "gate_b": np.zeros((cfg.num_stems, nb, max_in), np.float32),
    }
    return params


# The 62-band layout used by the flagship BS-RoFormer checkpoints
# (ref: bs_roformer.py DEFAULT_FREQS_PER_BANDS — 24×2, 12×4, 8×12, 8×24,
# 8×48, 128, 129 summing to 1025).
FLAGSHIP_FREQS_PER_BANDS = tuple(
    [2] * 24 + [4] * 12 + [12] * 8 + [24] * 8 + [48] * 8 + [128, 129]
)


def flagship_config(segment_frames: int = 801) -> RoformerConfig:
    """BS-RoFormer ep_317-class flagship configuration (viperx 1297 family):
    dim 512 / depth 12 / stereo / 2 stems / n_fft 2048 / hop 441."""
    return RoformerConfig(
        kind="bs", dim=512, depth=12, stereo=True, num_stems=2,
        time_transformer_depth=1, freq_transformer_depth=1,
        freqs_per_bands=FLAGSHIP_FREQS_PER_BANDS,
        dim_head=64, heads=8,
        stft_n_fft=2048, stft_hop_length=441, stft_win_length=2048,
        mask_estimator_depth=2,
    )
