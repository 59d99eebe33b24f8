"""VR multiband spectral pipeline.

Re-implementation of the reference's VR-specific spec_utils functions
(ref: uvr_lib_v5/spec_utils.py:232-470 — wave_to_spectrogram /
combine_spectrograms / cmb_spectrogram_to_wave, LP/HP filters, mirroring,
adjust_aggr, merge_artifacts). STFT/iSTFT use the shared JAX transforms with
librosa semantics (periodic Hann, constant padding); resample chains use the
polyphase kernel (the reference itself uses polyphase on ARM,
spec_utils.py:33).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .resample import resample_poly_np
from .stft import fetch_complex, fetch_real, hann_window, istft, put_complex, stft


def _stft_np(wave: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    win = hann_window(n_fft)
    return fetch_complex(stft(jnp.asarray(wave.astype(np.float32)), n_fft, hop,
                              win, pad_mode="constant"))


def _istft_np(spec: np.ndarray, hop: int) -> np.ndarray:
    n_fft = (spec.shape[-2] - 1) * 2
    win = hann_window(n_fft)
    return fetch_real(istft(put_complex(spec), n_fft, hop, win))


def convert_channels(spec: np.ndarray, mp: Dict, band: int) -> np.ndarray:
    """v5.1 per-band channel transform (ref: spec_utils.convert_channels:236)."""
    cc = mp["band"][band].get("convert_channels")
    if cc == "mid_side_c":
        left = spec[0] + spec[1] * 0.25
        right = spec[1] - spec[0] * 0.25
    elif cc == "mid_side":
        left = (spec[0] + spec[1]) / 2
        right = spec[0] - spec[1]
    elif cc == "stereo_n":
        left = (spec[0] + spec[1] * 0.25) / 0.9375
        right = (spec[1] + spec[0] * 0.25) / 0.9375
    else:
        return spec
    return np.stack([left, right])


def wave_to_spectrogram(wave: np.ndarray, hop: int, n_fft: int, mp: Dict,
                        band: int, is_v51_model: bool = False) -> np.ndarray:
    """(ref: spec_utils.wave_to_spectrogram:282-313)."""
    if wave.ndim == 1:
        wave = np.stack([wave, wave])
    if not is_v51_model:
        if mp["reverse"]:
            wave = np.stack([np.flip(wave[0]), np.flip(wave[1])])
        elif mp["mid_side"]:
            wave = np.stack([(wave[0] + wave[1]) / 2, wave[0] - wave[1]])
        elif mp["mid_side_b2"]:
            wave = np.stack([wave[1] + wave[0] * 0.5, wave[0] - wave[1] * 0.5])
    spec = _stft_np(wave, n_fft, hop)
    if is_v51_model:
        spec = convert_channels(spec, mp, band)
    return spec


def spectrogram_to_wave(spec: np.ndarray, hop: int, mp: Dict, band: int,
                        is_v51_model: bool = True) -> np.ndarray:
    """(ref: spec_utils.spectrogram_to_wave:315-339)."""
    wave = _istft_np(spec, hop)
    left, right = wave[0], wave[1]
    if is_v51_model:
        cc = mp["band"][band].get("convert_channels")
        if cc == "mid_side_c":
            return np.stack([left / 1.0625 - right / 4.25, right / 1.0625 + left / 4.25])
        if cc == "mid_side":
            return np.stack([left + right / 2, left - right / 2])
        if cc == "stereo_n":
            return np.stack([left - right * 0.25, right - left * 0.25])
    else:
        if mp["reverse"]:
            return np.stack([np.flip(left), np.flip(right)])
        if mp["mid_side"]:
            return np.stack([left + right / 2, left - right / 2])
        if mp["mid_side_b2"]:
            return np.stack([right / 1.25 + 0.4 * left, left / 1.25 - 0.4 * right])
    return np.stack([left, right])


def combine_spectrograms(specs: Dict[int, np.ndarray], mp: Dict,
                         is_v51_model: bool = False) -> np.ndarray:
    """(ref: spec_utils.combine_spectrograms:250-280)."""
    length = min(specs[i].shape[2] for i in specs)
    spec_c = np.zeros((2, mp["bins"] + 1, length), dtype=np.complex64)
    offset = 0
    bands_n = len(mp["band"])
    for d in range(1, bands_n + 1):
        bp = mp["band"][d]
        h = bp["crop_stop"] - bp["crop_start"]
        spec_c[:, offset : offset + h] = specs[d][:, bp["crop_start"] : bp["crop_stop"], :length]
        offset += h
    if offset > mp["bins"]:
        raise ValueError("Too much bins")

    if mp["pre_filter_start"] > 0:
        if is_v51_model:
            spec_c *= get_lp_filter_mask(spec_c.shape[1], mp["pre_filter_start"],
                                         mp["pre_filter_stop"])
        elif bands_n == 1:
            spec_c = fft_lp_filter(spec_c, mp["pre_filter_start"], mp["pre_filter_stop"])
        else:
            gp = 1.0
            for b in range(mp["pre_filter_start"] + 1, mp["pre_filter_stop"]):
                g = math.pow(10, -(b - mp["pre_filter_start"]) * (3.5 - gp) / 20.0)
                gp = g
                spec_c[:, b, :] *= g
    return spec_c


def cmb_spectrogram_to_wave(spec_m: np.ndarray, mp: Dict,
                            extra_bins_h: Optional[int] = None,
                            extra_bins: Optional[np.ndarray] = None,
                            is_v51_model: bool = False) -> np.ndarray:
    """Band-recombine + cascade-resample to output rate
    (ref: spec_utils.cmb_spectrogram_to_wave:341-395)."""
    bands_n = len(mp["band"])
    offset = 0
    wave = None
    for d in range(1, bands_n + 1):
        bp = mp["band"][d]
        spec_s = np.zeros((2, bp["n_fft"] // 2 + 1, spec_m.shape[2]), dtype=np.complex64)
        h = bp["crop_stop"] - bp["crop_start"]
        spec_s[:, bp["crop_start"] : bp["crop_stop"]] = spec_m[:, offset : offset + h]
        offset += h

        if d == bands_n:  # highest band
            if extra_bins_h:
                max_bin = bp["n_fft"] // 2
                spec_s[:, max_bin - extra_bins_h : max_bin] = extra_bins[:, :extra_bins_h]
            if bp.get("hpf_start", 0) > 0:
                if is_v51_model:
                    spec_s *= get_hp_filter_mask(spec_s.shape[1], bp["hpf_start"],
                                                 bp["hpf_stop"] - 1)
                else:
                    spec_s = fft_hp_filter(spec_s, bp["hpf_start"], bp["hpf_stop"] - 1)
            band_wave = spectrogram_to_wave(spec_s, bp["hl"], mp, d, is_v51_model)
            wave = band_wave if bands_n == 1 else _add_match(wave, band_wave)
        else:
            sr_next = mp["band"][d + 1]["sr"]
            if d == 1:  # lowest band
                if is_v51_model:
                    spec_s *= get_lp_filter_mask(spec_s.shape[1], bp["lpf_start"], bp["lpf_stop"])
                else:
                    spec_s = fft_lp_filter(spec_s, bp["lpf_start"], bp["lpf_stop"])
                wave = resample_poly_np(
                    spectrogram_to_wave(spec_s, bp["hl"], mp, d, is_v51_model),
                    bp["sr"], sr_next)
            else:  # mid bands
                if is_v51_model:
                    spec_s *= get_hp_filter_mask(spec_s.shape[1], bp["hpf_start"], bp["hpf_stop"] - 1)
                    spec_s *= get_lp_filter_mask(spec_s.shape[1], bp["lpf_start"], bp["lpf_stop"])
                else:
                    spec_s = fft_hp_filter(spec_s, bp["hpf_start"], bp["hpf_stop"] - 1)
                    spec_s = fft_lp_filter(spec_s, bp["lpf_start"], bp["lpf_stop"])
                wave2 = _add_match(wave, spectrogram_to_wave(spec_s, bp["hl"], mp, d, is_v51_model))
                wave = resample_poly_np(wave2, bp["sr"], sr_next)
    return wave


def _add_match(a: Optional[np.ndarray], b: np.ndarray) -> np.ndarray:
    if a is None:
        return b
    n = min(a.shape[-1], b.shape[-1])
    return a[..., :n] + b[..., :n]


# -------------------------------------------------------------------- filters


def get_lp_filter_mask(n_bins: int, bin_start: int, bin_stop: int) -> np.ndarray:
    return np.concatenate([
        np.ones((bin_start - 1, 1)),
        np.linspace(1, 0, bin_stop - bin_start + 1)[:, None],
        np.zeros((n_bins - bin_stop, 1)),
    ], axis=0)


def get_hp_filter_mask(n_bins: int, bin_start: int, bin_stop: int) -> np.ndarray:
    return np.concatenate([
        np.zeros((bin_stop + 1, 1)),
        np.linspace(0, 1, 1 + bin_start - bin_stop)[:, None],
        np.ones((n_bins - bin_start - 2, 1)),
    ], axis=0)


def fft_lp_filter(spec: np.ndarray, bin_start: int, bin_stop: int) -> np.ndarray:
    g = 1.0
    for b in range(bin_start, bin_stop):
        g -= 1 / (bin_stop - bin_start)
        spec[:, b, :] *= g
    spec[:, bin_stop:, :] *= 0
    return spec


def fft_hp_filter(spec: np.ndarray, bin_start: int, bin_stop: int) -> np.ndarray:
    g = 1.0
    for b in range(bin_start, bin_stop, -1):
        g -= 1 / (bin_start - bin_stop)
        spec[:, b, :] *= g
    spec[:, 0 : bin_stop + 1, :] *= 0
    return spec


def mirroring(mode: str, spec_m: np.ndarray, input_high_end: np.ndarray, mp: Dict) -> np.ndarray:
    """High-end reconstruction (ref: spec_utils.mirroring:458-470)."""
    start = mp["pre_filter_start"] - 10 - input_high_end.shape[1]
    stop = mp["pre_filter_start"] - 10
    mirror = np.flip(np.abs(spec_m[:, start:stop, :]), 1)
    if mode == "mirroring":
        mirror = mirror * np.exp(1.0j * np.angle(input_high_end))
        return np.where(np.abs(input_high_end) <= np.abs(mirror), input_high_end, mirror)
    if mode == "mirroring2":
        mi = mirror * input_high_end * 1.7
        return np.where(np.abs(input_high_end) <= np.abs(mi), input_high_end, mi)
    raise ValueError(mode)


def adjust_aggr(mask: np.ndarray, is_non_accom_stem: bool, aggressiveness: Dict) -> np.ndarray:
    """Aggression exponent shaping (ref: spec_utils.adjust_aggr:472-492)."""
    aggr = aggressiveness["value"] * 2
    if aggr != 0:
        if is_non_accom_stem:
            aggr = 1 - aggr
        aggr_lr = [aggr, aggr]
        if aggressiveness.get("aggr_correction") is not None:
            aggr_lr[0] += aggressiveness["aggr_correction"]["left"]
            aggr_lr[1] += aggressiveness["aggr_correction"]["right"]
        split = aggressiveness["split_bin"]
        for ch in range(2):
            mask[ch, :split] = np.power(mask[ch, :split], 1 + aggr_lr[ch] / 3)
            mask[ch, split:] = np.power(mask[ch, split:], 1 + aggr_lr[ch])
    return mask


def merge_artifacts(y_mask: np.ndarray, thres: float = 0.01, min_range: int = 64,
                    fade_size: int = 32) -> np.ndarray:
    """Artifact-region mask merge (ref: spec_utils.merge_artifacts:180-225)."""
    if min_range < fade_size * 2:
        raise ValueError("min_range must be >= fade_size * 2")
    try:
        idx = np.where(y_mask.min(axis=(0, 1)) > thres)[0]
        if len(idx) == 0:
            return y_mask
        start_idx = np.insert(idx[np.where(np.diff(idx) != 1)[0] + 1], 0, idx[0])
        end_idx = np.append(idx[np.where(np.diff(idx) != 1)[0]], idx[-1])
        artifact_idx = np.where(end_idx - start_idx > min_range)[0]
        weight = np.zeros_like(y_mask)
        if len(artifact_idx) > 0:
            start_idx, end_idx = start_idx[artifact_idx], end_idx[artifact_idx]
            old_e = None
            for s, e in zip(start_idx, end_idx):
                if old_e is not None and s - old_e < fade_size:
                    s = old_e - fade_size * 2
                if s != 0:
                    weight[:, :, s : s + fade_size] = np.linspace(0, 1, fade_size)
                else:
                    s -= fade_size
                if e != y_mask.shape[2]:
                    weight[:, :, e - fade_size : e] = np.linspace(1, 0, fade_size)
                else:
                    e += fade_size
                weight[:, :, s + fade_size : e - fade_size] = 1
                old_e = e
        return y_mask + weight * (1 - y_mask)
    except Exception as exc:  # parity: reference swallows postprocess errors
        print("Post Process Failed: ", exc)
        return y_mask
