"""Multi-model output ensembling — 11 algorithms (ref: ensembler.py:6-156).

Waveform-domain algorithms run in numpy; spectral algorithms use the shared
JAX STFT (librosa-compatible: periodic Hann, constant padding, hop 1024).
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from ..ops import spec as spec_ops
from ..ops.stft import (fetch_complex, fetch_real, hann_window, istft,
                        put_complex, stft)

ALGORITHMS = (
    "avg_wave", "median_wave", "min_wave", "max_wave",
    "avg_fft", "median_fft", "min_fft", "max_fft",
    "uvr_max_spec", "uvr_min_spec", "ensemble_wav",
)

_N_FFT, _HOP = 2048, 1024


def _select_by(arr: np.ndarray, axis: int, key, use_max: bool) -> np.ndarray:
    idxs = (np.argmax if use_max else np.argmin)(key(arr), axis)
    idxs = np.expand_dims(idxs, axis)
    return np.squeeze(np.take_along_axis(arr, idxs, axis), axis=axis)


class Ensembler:
    def __init__(self, logger: Optional[logging.Logger] = None,
                 algorithm: str = "avg_wave", weights: Optional[Sequence[float]] = None):
        self.logger = logger or logging.getLogger(__name__)
        self.algorithm = algorithm
        self.weights = weights

    def ensemble(self, waveforms: List[np.ndarray]) -> Optional[np.ndarray]:
        """Ensemble (channels, length) waveforms → one waveform."""
        if not waveforms:
            return None
        if len(waveforms) == 1:
            return waveforms[0]

        channels = waveforms[0].shape[0]
        if any(w.shape[0] != channels for w in waveforms):
            raise ValueError("All waveforms must have the same number of channels")
        max_len = max(w.shape[1] for w in waveforms)
        waveforms = [
            np.pad(w, ((0, 0), (0, max_len - w.shape[1]))) if w.shape[1] < max_len else w
            for w in waveforms
        ]

        weights = self._validated_weights(len(waveforms))
        algo = self.algorithm

        if algo == "avg_wave":
            acc = np.zeros_like(waveforms[0])
            for w, wt in zip(waveforms, weights):
                acc += w * wt
            return acc / np.sum(weights)
        if algo == "median_wave":
            self._warn_weights_ignored(weights)
            return np.median(np.array(waveforms), axis=0)
        if algo == "min_wave":
            self._warn_weights_ignored(weights)
            return _select_by(np.array(waveforms), 0, np.abs, use_max=False)
        if algo == "max_wave":
            self._warn_weights_ignored(weights)
            return _select_by(np.array(waveforms), 0, np.abs, use_max=True)
        if algo in ("avg_fft", "median_fft", "min_fft", "max_fft"):
            return self._ensemble_fft(waveforms, weights)
        if algo == "uvr_max_spec":
            return spec_ops.ensemble_spec_waves(spec_ops.MAX_SPEC, waveforms)
        if algo == "uvr_min_spec":
            return spec_ops.ensemble_spec_waves(spec_ops.MIN_SPEC, waveforms)
        if algo == "ensemble_wav":
            return spec_ops.ensemble_wav(waveforms)
        raise ValueError(f"Unknown ensemble algorithm: {algo}")

    # ------------------------------------------------------------------ utils

    def _validated_weights(self, n: int) -> np.ndarray:
        if self.weights is None:
            return np.ones(n)
        weights = np.array(self.weights, dtype=np.float64)
        if len(weights) != n:
            self.logger.warning(
                f"Number of weights ({len(weights)}) does not match number of "
                f"waveforms ({n}); using equal weights")
            return np.ones(n)
        total = weights.sum()
        if not np.all(np.isfinite(weights)) or not np.isfinite(total) or total == 0:
            self.logger.warning("Weights invalid (non-finite or zero-sum); using equal weights")
            return np.ones(n)
        return weights

    def _warn_weights_ignored(self, weights: np.ndarray):
        if self.weights is not None and not np.all(weights == weights[0]):
            self.logger.warning(f"Weights are ignored for algorithm {self.algorithm}")

    def _spec(self, wave: np.ndarray) -> np.ndarray:
        if wave.ndim == 1:
            wave = np.stack([wave, wave])
        elif wave.shape[0] == 1:
            wave = np.vstack([wave, wave])
        win = hann_window(_N_FFT)
        return fetch_complex(stft(jnp.asarray(wave.astype(np.float32)), _N_FFT,
                                  _HOP, win, pad_mode="constant"))

    def _ensemble_fft(self, waveforms, weights) -> np.ndarray:
        channels = waveforms[0].shape[0]
        final_len = waveforms[0].shape[-1]
        specs = np.array([self._spec(w) for w in waveforms])
        if self.algorithm == "avg_fft":
            out = np.zeros_like(specs[0])
            for s, wt in zip(specs, weights):
                out += s * wt
            out /= np.sum(weights)
        else:
            self._warn_weights_ignored(weights)
            if self.algorithm == "median_fft":
                out = np.median(specs.real, axis=0) + 1j * np.median(specs.imag, axis=0)
            elif self.algorithm == "min_fft":
                out = _select_by(specs, 0, np.abs, use_max=False)
            else:
                out = _select_by(specs, 0, np.abs, use_max=True)
        win = hann_window(_N_FFT)
        wave = fetch_real(istft(put_complex(out), _N_FFT, _HOP,
                                win, length=final_len))
        if channels == 1:
            wave = wave[:1, :]
        return wave
