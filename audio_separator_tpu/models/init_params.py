"""Random parameter initialisation for RoFormer configs.

Used by benchmarks / compile checks / sharding dry-runs when no trained
checkpoint is on disk (the driver environment has no network egress); the
pytree layout is identical to ``convert.convert_roformer`` output.

Two fill backends share one structure builder:

* ``init_roformer_params`` — numpy, for tests/small configs. Large leaves
  tile a 1M-gaussian pool: this host has ONE shared vCPU where
  ``standard_normal`` runs at ~1M/s under load, and first-touch page faults
  cap fresh-allocation writes at ~20 MB/s — direct generation of the ~240M
  flagship params took minutes and blew the bench watchdog.
* ``init_roformer_params_device`` — ``jax.random`` under one jit, so the
  whole tree materialises in device HBM: zero host RNG, zero host pages,
  zero H2D transfer. The path benchmarks/dryruns should use.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import numpy as np

from .roformer import RoformerConfig, band_layout


def _build_params(cfg: RoformerConfig, w: Callable, zeros: Callable,
                  ones: Callable) -> Dict[str, Any]:
    layout = band_layout(cfg)
    nb, dim = layout.n_bands, cfg.dim
    h, dh = cfg.heads, cfg.dim_head
    hidden = dim * 4

    def trans_stack(inner_depth: int, with_norm: bool):
        d = cfg.depth
        stack = {
            "attn_norm": ones(d, inner_depth, dim),
            "wqkv": w(d, inner_depth, dim, 3 * h * dh),
            "gate_w": w(d, inner_depth, dim, h),
            "gate_b": zeros(d, inner_depth, h),
            "wo": w(d, inner_depth, h * dh, dim),
            "ff_norm": ones(d, inner_depth, dim),
            "ff_w1": w(d, inner_depth, dim, hidden),
            "ff_b1": zeros(d, inner_depth, hidden),
            "ff_w2": w(d, inner_depth, hidden, dim),
            "ff_b2": zeros(d, inner_depth, dim),
        }
        if with_norm:
            stack["out_norm"] = ones(d, dim)
        return stack

    params: Dict[str, Any] = {
        "band_split": {
            "groups": [{"gamma": ones(e0 - s0, width),
                        "w": w(e0 - s0, width, dim)}
                       for (s0, e0, width, _dense) in layout.runs],
            "b": zeros(nb, dim),
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
        lin["temperature"] = ones(cfg.depth, cfg.linear_transformer_depth, h)
        params["blocks"]["linear"] = lin
    if cfg.kind == "bs":
        params["final_norm"] = {"gamma": ones(dim)}

    mask_hidden = dim * cfg.mlp_expansion_factor
    # mel MLPs have one more hidden layer than bs for the same depth
    # (ref: mel_band_roformer.py:149 vs bs_roformer.py:190 — see convert.py).
    n_hidden = (cfg.mask_estimator_depth if cfg.kind == "mel"
                else cfg.mask_estimator_depth - 1)
    hidden_layers = []
    for i in range(n_hidden):
        in_dim = dim if i == 0 else mask_hidden
        hidden_layers.append({
            "w": w(cfg.num_stems, nb, in_dim, mask_hidden),
            "b": zeros(cfg.num_stems, nb, mask_hidden),
        })
    final_in = dim if n_hidden == 0 else mask_hidden
    params["mask_est"] = {
        "hidden": hidden_layers,
        "groups": [
            {"val_w": w(cfg.num_stems, e0 - s0, final_in, width),
             "val_b": zeros(cfg.num_stems, e0 - s0, width),
             "gate_w": w(cfg.num_stems, e0 - s0, final_in, width),
             "gate_b": zeros(cfg.num_stems, e0 - s0, width)}
            for (s0, e0, width, _dense) in layout.runs
        ],
    }
    return params


def init_roformer_params(cfg: RoformerConfig, seed: int = 0,
                         scale: float = 0.02) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    pool = (rng.standard_normal(1 << 20) * scale).astype(np.float32)

    def w(*shape):
        n = int(np.prod(shape))
        if n <= pool.size:
            return pool[:n].reshape(shape).copy()
        reps = -(-n // pool.size)
        return np.tile(pool, reps)[:n].reshape(shape)

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    def ones(*shape):
        return np.ones(shape, np.float32)

    return _build_params(cfg, w, zeros, ones)


def init_roformer_params_device(cfg: RoformerConfig, seed: int = 0,
                                scale: float = 0.02,
                                dtype=None) -> Dict[str, Any]:
    """Materialise the random tree directly in device memory (one jit)."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16

    def build():
        key = jax.random.PRNGKey(seed)
        counter = [0]

        def w(*shape):
            counter[0] += 1
            k = jax.random.fold_in(key, counter[0])
            return jax.random.normal(k, shape, dtype) * jnp.asarray(scale, dtype)

        def zeros(*shape):
            return jnp.zeros(shape, dtype)

        def ones(*shape):
            return jnp.ones(shape, dtype)

        return _build_params(cfg, w, zeros, ones)

    return jax.jit(build)()


# The 62-band layout used by the flagship BS-RoFormer checkpoints
# (ref: bs_roformer.py DEFAULT_FREQS_PER_BANDS — 24×2, 12×4, 8×12, 8×24,
# 8×48, 128, 129 summing to 1025).
FLAGSHIP_FREQS_PER_BANDS = tuple(
    [2] * 24 + [4] * 12 + [12] * 8 + [24] * 8 + [48] * 8 + [128, 129]
)


def mel_kim_config() -> RoformerConfig:
    """Mel-Band RoFormer at Kim-vocal geometry
    (ref: vocals_mel_band_roformer.ckpt YAML: dim 384 / depth 6 / 60 mel
    bands / n_fft 2048 / hop 441)."""
    return RoformerConfig(
        kind="mel", dim=384, depth=6, stereo=True, num_stems=2,
        time_transformer_depth=1, freq_transformer_depth=1,
        num_bands=60, sample_rate=44100, dim_head=64, heads=8,
        stft_n_fft=2048, stft_hop_length=441, stft_win_length=2048,
        mask_estimator_depth=2,
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
