"""Mel filterbank band layout for Mel-Band RoFormer.

Reproduces the band sparsity pattern the reference derives from
``librosa.filters.mel`` (ref: uvr_lib_v5/roformer/mel_band_roformer.py:279-307):
Slaney-scale triangular filters over the rFFT bins, with the DC corner of the
first filter and the Nyquist corner of the last forced on. Only the >0 pattern
matters — band membership — so normalisation is irrelevant, but we keep the
Slaney formulas exact to preserve boundary bins.
"""

from __future__ import annotations

import numpy as np


def _hz_to_mel(frequencies: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False)."""
    frequencies = np.asanyarray(frequencies, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = frequencies >= min_log_hz
    mels = np.where(
        above,
        min_log_mel + np.log(np.maximum(frequencies, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asanyarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = mels >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


def mel_filter_bank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                    fmax: float | None = None) -> np.ndarray:
    """librosa.filters.mel-compatible weights ``(n_mels, 1 + n_fft // 2)``."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fftfreqs = np.fft.rfftfreq(n=n_fft, d=1.0 / sr)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights


def mel_band_membership(sr: int, n_fft: int, num_bands: int):
    """Band membership booleans ``(num_bands, n_bins)`` with the reference's
    corner fixes, plus derived index tables.

    Returns (freqs_per_band_bool, freq_indices, num_freqs_per_band,
    num_bands_per_freq) mirroring the reference buffers
    (mel_band_roformer.py:288-305), with freq_indices over *frequency* rows
    (stereo interleave is applied by the caller).
    """
    weights = mel_filter_bank(sr, n_fft, num_bands)
    weights[0, 0] = 1.0
    weights[-1, -1] = 1.0
    member = weights > 0
    if not member.any(axis=0).all():
        raise ValueError("all frequencies must be covered by at least one band")
    n_bins = member.shape[1]
    repeated = np.tile(np.arange(n_bins), (num_bands, 1))
    freq_indices = repeated[member]  # flattened per-band member bins
    num_freqs_per_band = member.sum(axis=1)
    num_bands_per_freq = member.sum(axis=0)
    return member, freq_indices, num_freqs_per_band, num_bands_per_freq
