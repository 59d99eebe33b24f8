"""Polyphase resampling — host (scipy) and device (JAX/XLA) paths.

The reference leans on librosa/resampy and libsamplerate for sample-rate
conversion (VR multiband chains, spec_utils.change_pitch_semitones — ref:
uvr_lib_v5/spec_utils.py:282-313,783). Here resampling is a first-class op:

* ``resample_poly_np`` — scipy polyphase for host-side prep (exactly
  ``scipy.signal.resample_poly`` semantics, kaiser-windowed sinc).
* ``resample_jax`` — the same polyphase filter expressed as a strided
  convolution so it runs fused on TPU inside jitted programs. Upsample by L
  (zero-stuff) → FIR → downsample by M becomes a single
  ``conv_general_dilated`` with lhs_dilation=L and window_strides=M, which XLA
  maps onto the MXU/VPU without materialising the zero-stuffed signal.
"""

from __future__ import annotations

import functools
import math
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal


def _gcd_ratio(orig_sr: int, new_sr: int) -> tuple[int, int]:
    exact = Fraction(new_sr, orig_sr)
    frac = exact.limit_denominator(1 << 16)
    if frac != exact:
        # Bounded filter length requires a bounded denominator; the rate is
        # then approximated — say so instead of silently drifting (can move
        # output length by ~1 sample on long signals at exotic rates).
        import logging

        logging.getLogger(__name__).warning(
            f"resample ratio {new_sr}/{orig_sr} approximated as "
            f"{frac.numerator}/{frac.denominator}")
    return frac.numerator, frac.denominator


def resample_poly_np(x: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Host-side polyphase resample of ``(..., samples)`` float32."""
    if orig_sr == new_sr:
        return x
    up, down = _gcd_ratio(orig_sr, new_sr)
    return scipy.signal.resample_poly(x, up, down, axis=-1).astype(x.dtype)


@functools.lru_cache(maxsize=64)
def _design_filter(up: int, down: int, window_beta: float = 5.0) -> np.ndarray:
    """Kaiser-windowed sinc low-pass, identical to scipy.resample_poly's
    default design (window=('kaiser', 5.0), 10 taps per zero crossing)."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = scipy.signal.firwin(2 * half_len + 1, f_c, window=("kaiser", window_beta))
    return (h * up).astype(np.float64)


@functools.partial(jax.jit, static_argnames=("up", "down"))
def _resample_conv(x: jnp.ndarray, h: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """x: (B, L) → (B, ceil(L*up/down)) via dilated strided convolution."""
    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)
    n_taps = h.shape[0]
    half = (n_taps - 1) // 2
    n_up = (n_in - 1) * up + 1  # length after lhs dilation
    pad_hi = max(0, (n_out - 1) * down + n_taps - half - n_up)
    lhs = x[:, None, :]  # NCW
    rhs = h[::-1][None, None, :].astype(x.dtype)  # OIW, flipped for conv
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(down,),
        padding=[(half, pad_hi)],
        lhs_dilation=(up,),
        dimension_numbers=("NCW", "OIW", "NCW"),
        # DSP filter: the backend's DEFAULT conv precision is bf16-class
        # (measured: the filter's 0.50025874 centre tap rounds to exactly
        # 0.5 → ~54 dB resample SNR); force full f32 accumulation. The
        # resampler is a sliver of the FLOPs next to the model forward.
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[:, 0, :n_out]


def resample_jax(x: jnp.ndarray, orig_sr: int, new_sr: int) -> jnp.ndarray:
    """Device-side polyphase resample of ``(..., samples)``.

    Numerically equivalent to ``scipy.signal.resample_poly`` (same filter),
    jit-safe, static output length ``ceil(n * new_sr / orig_sr)``.
    """
    if orig_sr == new_sr:
        return x
    up, down = _gcd_ratio(orig_sr, new_sr)
    h = jnp.asarray(_design_filter(up, down), dtype=x.dtype)
    batch_shape = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    out = _resample_conv(flat, h, up, down)
    return out.reshape(*batch_shape, out.shape[-1])


def change_pitch_semitones_np(
    pcm: np.ndarray, sample_rate: int, semitone_shift: float
) -> tuple[np.ndarray, int]:
    """Resample-trick pitch shift (ref: spec_utils.change_pitch_semitones:783).

    Returns (shifted_pcm, playback_sample_rate) where the playback rate is
    ``sample_rate / 2**(shift/12)`` rounded to int.
    """
    factor = 2.0 ** (semitone_shift / 12.0)
    new_rate = int(round(sample_rate / factor))
    out = resample_poly_np(pcm, orig_sr=sample_rate, new_sr=new_rate)
    return out, new_rate
