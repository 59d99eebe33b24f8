"""Generate the mel band-membership golden fixture — INDEPENDENTLY of
audio_separator_tpu.models.melbands.

librosa is not installable here, but the positivity pattern of its Slaney
triangular filters has a closed form that needs no filterbank code at all:
``filters.mel(sr, n_fft, n_mels)[i, b] > 0  ⟺  mel_f[i] < f_b < mel_f[i+2]``
where ``mel_f`` are the n_mels+2 Slaney band-edge frequencies and
``f_b = b·sr/n_fft`` the rFFT bin centres (the triangular weight
``max(0, min((f−mel_f[i])/Δi, (mel_f[i+2]−f)/Δi+1))`` is positive exactly
strictly inside the triangle's support; the Slaney area normalisation is a
positive scale and cannot flip membership). The Slaney scale itself is
published: linear 200/3 Hz per mel below 1 kHz, log-spaced with step
ln(6.4)/27 above (librosa.core.convert.mel_frequencies docs).

This derivation shares no code with models/melbands.py (which builds the
full weight matrix), so the committed fixture pins the production band
layout of the Mel-Band RoFormer (ref: uvr_lib_v5/roformer/
mel_band_roformer.py:279-307, defaults num_bands=60, stft_n_fft=2048,
sample_rate=44100) against librosa ground-truth semantics rather than
against the repo's own shim.

Run:  python tests/goldens/gen_mel_membership.py
"""

import math
import os

import numpy as np

GEOMETRIES = [
    (44100, 2048, 60),   # Mel-Band RoFormer production default (Kim vocal &c)
    (44100, 2048, 80),   # big-beta / de-reverb class checkpoints
    (44100, 512, 24),    # the toy geometry used by the fast parity tests
]


def slaney_hz_to_mel(f: float) -> float:
    if f < 1000.0:
        return f / (200.0 / 3.0)
    return 15.0 + 27.0 * math.log(f / 1000.0) / math.log(6.4)


def slaney_mel_to_hz(m: float) -> float:
    if m < 15.0:
        return m * (200.0 / 3.0)
    return 1000.0 * math.exp(math.log(6.4) / 27.0 * (m - 15.0))


def membership(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    n_bins = 1 + n_fft // 2
    # np.linspace like librosa.mel_frequencies (fmin=0, fmax=sr/2)
    mel_edges = np.linspace(slaney_hz_to_mel(0.0), slaney_hz_to_mel(sr / 2.0),
                            n_mels + 2)
    hz_edges = np.array([slaney_mel_to_hz(m) for m in mel_edges])
    f_bins = np.arange(n_bins) * (sr / n_fft)
    member = (hz_edges[:-2, None] < f_bins[None, :]) & (
        f_bins[None, :] < hz_edges[2:, None])
    # reference corner fixes (mel_band_roformer.py:283-286)
    member[0, 0] = True
    member[-1, -1] = True
    return member


def main():
    out = {}
    for sr, n_fft, n_mels in GEOMETRIES:
        m = membership(sr, n_fft, n_mels)
        assert m.any(axis=0).all(), (sr, n_fft, n_mels)
        out[f"member_{sr}_{n_fft}_{n_mels}"] = m
    path = os.path.join(os.path.dirname(__file__), "mel_membership.npz")
    np.savez_compressed(path, **out)
    sizes = {k: int(v.sum()) for k, v in out.items()}
    print(f"wrote {path}: {sizes}")


if __name__ == "__main__":
    main()
