"""Waveform/spectrogram image rendering + SSIM (integration-test mechanism).

Counterpart of the reference's tests/utils.py (ref: tests/README.md:36-60):
render separated stems as spectrogram/waveform images and compare against
goldens with SSIM. matplotlib/skimage aren't available here, so images are
plain numpy arrays written as grayscale PNGs with the stdlib (zlib/struct),
and SSIM is implemented directly.
"""

import struct
import zlib

import numpy as np

import jax.numpy as jnp

from audio_separator_tpu.io import audio as audio_io
from audio_separator_tpu.ops.stft import hann_window, stft


def render_spectrogram(path: str, n_fft: int = 2048, hop: int = 1024,
                       height: int = 256, width: int = 512) -> np.ndarray:
    """Log-magnitude spectrogram image (uint8, height × width)."""
    pcm, sr = audio_io.load_audio(path, sample_rate=44100)
    mono = pcm.mean(axis=0)
    spec = np.asarray(stft(jnp.asarray(mono[None]), n_fft, hop, hann_window(n_fft),
                           pad_mode="constant"))[0]
    mag = np.log10(np.abs(spec) ** 2 + 1e-8)
    mag -= mag.min()
    if mag.max() > 0:
        mag *= 255.0 / mag.max()
    img = mag[::-1]  # low freqs at the bottom
    return _resize_nearest(img.astype(np.uint8), height, width)


def render_waveform(path: str, height: int = 128, width: int = 1024) -> np.ndarray:
    """Min/max envelope waveform image (uint8)."""
    pcm, _ = audio_io.load_audio(path, sample_rate=44100)
    mono = pcm.mean(axis=0)
    img = np.zeros((height, width), np.uint8)
    chunk = max(1, len(mono) // width)
    mid = height // 2
    for x in range(width):
        seg = mono[x * chunk : (x + 1) * chunk]
        if len(seg) == 0:
            continue
        lo = int(np.clip(mid - seg.max() * mid, 0, height - 1))
        hi = int(np.clip(mid - seg.min() * mid, 0, height - 1))
        img[min(lo, hi) : max(lo, hi) + 1, x] = 255
    return img


def _resize_nearest(img: np.ndarray, height: int, width: int) -> np.ndarray:
    ys = (np.arange(height) * img.shape[0] / height).astype(int)
    xs = (np.arange(width) * img.shape[1] / width).astype(int)
    return img[ys][:, xs]


def ssim(a: np.ndarray, b: np.ndarray, window: int = 7) -> float:
    """Mean structural similarity over uint8 images (Wang et al. 2004)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2

    def box(x):
        k = window
        cs = np.cumsum(np.cumsum(np.pad(x, ((1, 0), (1, 0))), axis=0), axis=1)
        out = (cs[k:, k:] - cs[:-k, k:] - cs[k:, :-k] + cs[:-k, :-k]) / (k * k)
        return out

    mu_a, mu_b = box(a), box(b)
    var_a = box(a * a) - mu_a ** 2
    var_b = box(b * b) - mu_b ** 2
    cov = box(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return float(s.mean())


def write_png(path: str, img: np.ndarray) -> None:
    """Grayscale 8-bit PNG via stdlib only."""
    height, width = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(height))

    def chunk(tag, data):
        payload = tag + data
        return (struct.pack(">I", len(data)) + payload
                + struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF))

    header = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", header)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)
