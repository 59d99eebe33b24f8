"""Training losses (reference parity: the multi-resolution STFT loss the
RoFormer models ship for fine-tuning, uvr_lib_v5/roformer/bs_roformer.py:519-562
and mel_band_roformer.py's identical block).

Inference never calls these; they exist so the framework covers the full
surface of the reference model classes and so converted checkpoints can be
fine-tuned with `jax.grad` over `apply_roformer` + these losses.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from .stft import hann_window, stft

DEFAULT_RESOLUTIONS: Tuple[int, ...] = (4096, 2048, 1024, 512, 256)


def _l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """torch F.l1_loss semantics, incl. complex inputs (mean |a - b|)."""
    return jnp.mean(jnp.abs(a - b))


def multi_res_stft_loss(
    recon: jnp.ndarray,  # (..., T)
    target: jnp.ndarray,  # same shape
    stft_n_fft: int = 2048,
    window_sizes: Sequence[int] = DEFAULT_RESOLUTIONS,
    hop_length: int = 147,
) -> jnp.ndarray:
    """Sum over resolutions of L1 between complex STFTs (ref:
    bs_roformer.py:536-544 — n_fft = max(window, model stft_n_fft), Hann
    window of the resolution's size centre-padded to n_fft, hop 147)."""
    flat_r = recon.reshape(-1, recon.shape[-1])
    flat_t = target.reshape(-1, target.shape[-1])
    total = jnp.float32(0.0)
    for w in window_sizes:
        n_fft = max(int(w), int(stft_n_fft))
        win = hann_window(int(w))
        if w < n_fft:
            lp = (n_fft - w) // 2
            win = jnp.pad(win, (lp, n_fft - w - lp))
        total = total + _l1(stft(flat_r, n_fft, hop_length, win),
                            stft(flat_t, n_fft, hop_length, win))
    return total


def roformer_training_loss(
    recon: jnp.ndarray,  # (B, S?, C, T) model output
    target: jnp.ndarray,  # same shape (stems dim optional when num_stems==1)
    stft_n_fft: int = 2048,
    window_sizes: Sequence[int] = DEFAULT_RESOLUTIONS,
    hop_length: int = 147,
    multi_stft_weight: float = 1.0,
):
    """total = L1(recon, target) + weight · multi-res STFT loss
    (ref: bs_roformer.py:530-562). Returns (total, (l1, multi_res))."""
    target = target[..., : recon.shape[-1]]
    base = _l1(recon, target)
    multi = multi_res_stft_loss(recon, target, stft_n_fft=stft_n_fft,
                                window_sizes=window_sizes,
                                hop_length=hop_length)
    total = base + multi_stft_weight * multi
    return total, (base, multi)
