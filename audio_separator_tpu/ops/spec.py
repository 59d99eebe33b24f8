"""Waveform/spectrogram utility math shared across architectures.

Host-side (numpy) counterparts of the reference's DSP grab-bag
(ref: uvr_lib_v5/spec_utils.py). Hot-path equivalents live inside the jitted
architecture programs; these functions serve the orchestration layer
(ensembling, inversion, shape matching) where waveforms already sit on host.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from .stft import (fetch_complex, fetch_real, hann_window, istft,
                   put_complex, stft)

MAX_SPEC = "max_spec"
MIN_SPEC = "min_spec"
AVERAGE = "average"


def normalize(wave: np.ndarray, max_peak: float = 1.0, min_peak: float | None = None) -> np.ndarray:
    """Peak normalise/amplify (ref: spec_utils.normalize:99)."""
    maxv = np.abs(wave).max()
    if maxv > max_peak:
        return wave * (max_peak / maxv)
    if min_peak is not None and 0 < maxv < min_peak:
        return wave * (min_peak / maxv)
    return wave


def preprocess(spec: np.ndarray):
    """Split complex spectrogram into magnitude and phase (ref: spec_utils.preprocess:74)."""
    return np.abs(spec), np.angle(spec)


def make_padding(width: int, cropsize: int, offset: int):
    """Padding so `width` tiles into `cropsize` windows with `offset` borders
    (ref: spec_utils.make_padding:85)."""
    left = offset
    roi_size = cropsize - offset * 2
    if roi_size == 0:
        roi_size = cropsize
    right = roi_size - (width % roi_size) + left
    return left, right, roi_size


_INV_N_FFT = 2048
_INV_HOP = 1024


def _stft2048(wave: np.ndarray) -> np.ndarray:
    win = hann_window(_INV_N_FFT)
    spec = stft(jnp.asarray(wave.astype(np.float32)), _INV_N_FFT, _INV_HOP, win,
                pad_mode="constant")
    return fetch_complex(spec)


def _istft2048(spec: np.ndarray) -> np.ndarray:
    win = hann_window(_INV_N_FFT)
    wave = istft(put_complex(spec), _INV_N_FFT, _INV_HOP, win)
    out = fetch_real(wave)
    if out.ndim == 1:
        out = np.stack([out, out])
    return out


def invert_audio(specs: List[np.ndarray], invert_p: bool = True) -> np.ndarray:
    """Spectral inversion of a stem against the mixture
    (ref: spec_utils.invert_audio:557-573)."""
    ln = min(specs[0].shape[2], specs[1].shape[2])
    a, b = specs[0][:, :, :ln], specs[1][:, :, :ln]
    if invert_p:
        max_mag = np.maximum(np.abs(a), np.abs(b))
        return b - max_mag * np.exp(1.0j * np.angle(a))
    # ref else-branch (spec_utils.py:568-570): soften the stem first, then
    # subtract it from the mixture.
    b = reduce_vocal_aggressively(a, b, 0.2)
    return a - b


def invert_stem(mixture: np.ndarray, stem: np.ndarray) -> np.ndarray:
    """Derive the secondary stem by spectral subtraction
    (ref: spec_utils.invert_stem:575-580). Input/output are (samples, channels)
    transposed arrays as in the reference call sites."""
    mix_spec = _stft2048(mixture.T if mixture.shape[0] != 2 else mixture)
    stem_spec = _stft2048(stem.T if stem.shape[0] != 2 else stem)
    out = _istft2048(invert_audio([mix_spec, stem_spec]))
    return -out.T


def ensembling(algorithm: str, inputs: List[np.ndarray], is_wavs: bool = False) -> np.ndarray:
    """MAX_SPEC / MIN_SPEC magnitude-selection ensemble
    (ref: spec_utils.ensembling:583-608)."""
    acc = inputs[0]
    for nxt in inputs[1:]:
        if is_wavs:
            ln = min(acc.shape[1], nxt.shape[1])
            acc, nxt = acc[:, :ln], nxt[:, :ln]
        else:
            ln = min(acc.shape[2], nxt.shape[2])
            acc, nxt = acc[:, :, :ln], nxt[:, :, :ln]
        if algorithm == MIN_SPEC:
            acc = np.where(np.abs(nxt) <= np.abs(acc), nxt, acc)
        elif algorithm == MAX_SPEC:
            acc = np.where(np.abs(nxt) >= np.abs(acc), nxt, acc)
        else:
            raise ValueError(f"unknown spec ensemble algorithm {algorithm}")
    return acc


def ensemble_spec_waves(algorithm: str, waves: Sequence[np.ndarray]) -> np.ndarray:
    """Run MAX/MIN_SPEC over waveforms: STFT → select → iSTFT."""
    specs = [_stft2048(w) for w in waves]
    out = ensembling(algorithm, list(specs))
    wave = _istft2048(out)
    ln = min(w.shape[-1] for w in waves)
    return wave[..., :ln]


def ensemble_wav(waveforms: Sequence[np.ndarray], split_size: int = 240) -> np.ndarray:
    """Least-noisy-chunk waveform ensemble (ref: spec_utils.ensemble_wav:1245-1267).

    Splits along the *time* (last) axis so both 1-D and (channels, length)
    inputs pick the quietest model per time segment — splitting axis 0 on a
    stereo array would splice whole channels and produce NaN means for the
    empty splits."""
    pieces = [np.array_split(w, split_size, axis=-1) for w in waveforms]
    out = []
    for idx in range(split_size):
        means = [np.abs(p[idx]).mean() if p[idx].size else np.inf for p in pieces]
        out.append(pieces[int(np.argmin(means))][idx])
    return np.concatenate(out, axis=-1)


def to_shape(x: np.ndarray, target_shape) -> np.ndarray:
    """Zero-pad trailing edges so ``x`` matches ``target_shape``
    (ref: spec_utils.to_shape)."""
    pads = [(0, t - s) for s, t in zip(x.shape, target_shape)]
    return np.pad(x, pads, mode="constant")


def match_array_shapes(a: np.ndarray, b: np.ndarray, is_swap: bool = False) -> np.ndarray:
    """Crop/zero-pad ``a``'s time axis to ``b``'s (ref: spec_utils.match_array_shapes:752)."""
    if is_swap:
        a, b = a.T, b.T
    if a.shape[1] > b.shape[1]:
        a = a[:, : b.shape[1]]
    elif a.shape[1] < b.shape[1]:
        a = np.pad(a, ((0, 0), (0, b.shape[1] - a.shape[1])), mode="constant")
    if is_swap:
        a = a.T
    return a


def match_mono_array_shapes(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) > len(b):
        return a[: len(b)]
    if len(a) < len(b):
        return np.pad(a, (0, len(b) - len(a)), mode="constant")
    return a


def average_dual_sources(a: np.ndarray, b: np.ndarray, value: float) -> np.ndarray:
    """Weighted average of two stems (ref: spec_utils.average_dual_sources:847)."""
    if a.shape > b.shape:
        b = to_shape(b, a.shape)
    if a.shape < b.shape:
        a = to_shape(a, b.shape)
    return a * value + b * (1 - value)


def reduce_vocal_aggressively(x_spec: np.ndarray, y_spec: np.ndarray, softmask: float) -> np.ndarray:
    """(ref: spec_utils.reduce_vocal_aggressively)."""
    v_spec = x_spec - y_spec
    y_mag_tmp = np.abs(y_spec)
    v_mag_tmp = np.abs(v_spec)
    v_mask = v_mag_tmp > y_mag_tmp
    y_mag = np.clip(y_mag_tmp - v_mag_tmp * v_mask * softmask, 0, np.inf)
    return y_mag * np.exp(1.0j * np.angle(y_spec))
