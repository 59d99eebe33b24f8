"""Generate the librosa stft/istft golden fixture — INDEPENDENTLY of
tests/ref_pipeline.py's shim.

librosa is not installable here, so the oracle pipeline shims its stft/istft
(the one non-reference link in the VR/MDX parity chain). This generator
derives the expected outputs straight from librosa 0.10's DOCUMENTED
equations with deliberately different machinery — explicit O(N^2) DFT sums
and per-sample overlap-add loops, no np.fft, no shared helper code — so a
transcription mistake in the shim cannot also live here:

* stft (librosa.core.spectrum.stft docs): center pad n_fft//2 each side with
  zeros (0.10 default pad_mode='constant'), periodic Hann of win_length
  centred in an n_fft window, frame t reads y_pad[t*hop : t*hop+n_fft],
  X[f,t] = sum_n frame[n] * exp(-2*pi*i*f*n/n_fft) for f = 0..n_fft//2.
* istft (librosa.core.spectrum.istft docs, Griffin-Lim least-squares): per
  frame inverse rDFT via the Hermitian-fold sum, multiply by the window,
  overlap-add, divide by the summed SQUARED window envelope where positive,
  crop n_fft//2 per side.

The istft golden inverts a masked spectrum (not the analysis of the same
signal) so envelope normalisation actually matters — perfect-reconstruction
round trips would hide normalisation bugs.

Run:  python tests/goldens/gen_librosa_transform.py
"""

import math
import os

import numpy as np

GEOMETRIES = [(256, 64), (128, 48)]  # (n_fft, hop) — hop 48 breaks n_fft/4


def hann_periodic(n: int) -> np.ndarray:
    return np.array([0.5 - 0.5 * math.cos(2.0 * math.pi * k / n)
                     for k in range(n)], dtype=np.float64)


def stft_bruteforce(y: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    pad = n_fft // 2
    y_pad = np.concatenate([np.zeros(pad), y, np.zeros(pad)])
    w = hann_periodic(n_fft)
    n_frames = 1 + (len(y_pad) - n_fft) // hop
    n_bins = n_fft // 2 + 1
    out = np.zeros((n_bins, n_frames), dtype=np.complex128)
    for t in range(n_frames):
        frame = y_pad[t * hop : t * hop + n_fft] * w
        for f in range(n_bins):
            acc = 0.0 + 0.0j
            for n in range(n_fft):
                ang = -2.0 * math.pi * f * n / n_fft
                acc += frame[n] * complex(math.cos(ang), math.sin(ang))
            out[f, t] = acc
    return out


def istft_bruteforce(spec: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    n_bins, n_frames = spec.shape
    w = hann_periodic(n_fft)
    total = n_fft + hop * (n_frames - 1)
    out = np.zeros(total)
    env = np.zeros(total)
    for t in range(n_frames):
        frame = np.zeros(n_fft)
        for n in range(n_fft):
            acc = spec[0, t].real
            for f in range(1, n_bins - 1):
                ang = 2.0 * math.pi * f * n / n_fft
                acc += 2.0 * (spec[f, t].real * math.cos(ang)
                              - spec[f, t].imag * math.sin(ang))
            # Nyquist bin (n_fft even): e^{i*pi*n} alternates sign
            acc += spec[n_bins - 1, t].real * math.cos(math.pi * n)
            frame[n] = acc / n_fft
        for n in range(n_fft):
            out[t * hop + n] += frame[n] * w[n]
            env[t * hop + n] += w[n] * w[n]
    pos = env > np.finfo(np.float64).tiny
    out[pos] = out[pos] / env[pos]
    return out[n_fft // 2 : total - n_fft // 2]


def main():
    rng = np.random.default_rng(2026)
    y = (rng.standard_normal(777) * 0.5).astype(np.float64)
    payload = {"y": y}
    for n_fft, hop in GEOMETRIES:
        spec = stft_bruteforce(y, n_fft, hop)
        mask = rng.uniform(0.2, 1.0, spec.shape)
        wave = istft_bruteforce(spec * mask, n_fft, hop)
        key = f"{n_fft}_{hop}"
        payload[f"stft_{key}"] = spec
        payload[f"mask_{key}"] = mask
        payload[f"istft_{key}"] = wave
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "librosa_transform.npz")
    np.savez_compressed(out, **payload)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
