"""TPU-native STFT / iSTFT with torch.stft-compatible semantics.

The reference framework relies on ``torch.stft`` / ``torch.istft`` everywhere
(ref: audio_separator/separator/uvr_lib_v5/stft.py:41-120, roformer forward
passes, demucs/spec.py).  Sub-0.1dB SDR parity requires reproducing those
semantics exactly:

* ``center=True``: reflect-pad the signal by ``n_fft // 2`` on both sides.
* periodic Hann window (``torch.hann_window(n, periodic=True)``).
* number of frames = ``1 + L // hop`` for even ``n_fft``.
* iSTFT is the least-squares inverse: windowed overlap-add divided by the
  summed squared-window envelope, then cropped by ``n_fft // 2`` per side.

Design notes (TPU-first):

* Framing is expressed as a gather with static indices; XLA lowers this to an
  efficient dynamic-slice loop and fuses the window multiply.
* Overlap-add avoids scatter ops entirely (slow on TPU): frames are split
  into ``k = ceil(n_fft / hop)`` hop-sized lanes and accumulated with ``k``
  dense shifted adds — fully vectorised, VPU-friendly, and differentiable.
* FFTs use ``jnp.fft.rfft`` / ``irfft`` which XLA lowers natively on TPU.

Everything here is shape-static and jit/vmap/scan friendly.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "hamming_window",
    "frame_signal",
    "overlap_add",
    "stft",
    "istft",
    "stft_real_packed",
    "istft_real_packed",
    "fetch_complex",
    "put_complex",
    "fetch_real",
    "put_real",
    "link_quant_mode",
]


# ---------------------------------------------------------------------------
# Link-safe complex transfer.
#
# The axon TPU runtime rejects complex64 arrays in BOTH transfer directions
# with `UNIMPLEMENTED: TPU backend error` (round-3 finding, reproduced by
# tools/tpu_op_probe.py) — and the first failed transfer poisons every later
# op in the process. On-device complex compute is fine; only the host<->device
# boundary is broken. These helpers cross the link as a stacked float32
# real/imag pair and form/split the complex array on the device side, so no
# complex dtype ever touches the transfer path. On CPU they are equivalent
# (one extra copy) — all host-boundary STFT/iSTFT call sites use them
# unconditionally.


@jax.jit
def _split_ri(spec: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([jnp.real(spec), jnp.imag(spec)]).astype(jnp.float32)


@jax.jit
def _combine_ri(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.complex(re, im)


def link_quant_mode() -> str:
    """Deployment-wide link quantisation — the single parser for the
    ``AUDSEP_LINK_QUANT`` knob (= int16 | int8 | off), shared with the demix
    engine. Read per call so a mid-process change takes effect on the next
    separation; unrecognised values warn once per process and mean off.

    Unset, the default is **int16 on TPU backends, off elsewhere**: int16
    halves host↔device audio bytes at a measured output cost far inside the
    quality bar (LINK_QUANT_SDR.json: the fetch quantisation sits at ~82 dB
    fidelity → ≤0.003 dB museval-SDR movement, and the upload side is
    indistinguishable from the model's intrinsic bf16 compute-noise floor).
    On CPU the "link" is a host memcpy, so quantisation would be pure loss —
    the default stays float there, which also keeps the CPU numerics test
    tier exact."""
    mode = os.environ.get("AUDSEP_LINK_QUANT", "").strip().lower()
    if mode in ("int16", "int8"):
        return mode
    if mode:
        if mode != "off" and mode not in _warned_link_quant:
            import logging

            _warned_link_quant.add(mode)
            logging.getLogger(__name__).warning(
                f"ignoring unrecognised AUDSEP_LINK_QUANT={mode!r} "
                f"(expected int16/int8/off); transfers stay float")
        return ""
    return _platform_default_link_quant()


def _platform_default_link_quant() -> str:
    global _platform_default
    if _platform_default is None:
        try:
            import jax

            _platform_default = (
                "int16" if jax.default_backend() in ("tpu", "axon") else "")
        except Exception:  # backend init failure must not break host paths
            _platform_default = ""
    return _platform_default


_platform_default: str | None = None
_warned_link_quant: set = set()


# Quantiser constants match ops/demix._quantize_upload: ~90 dB SNR vs peak
# for int16, ~48 dB for int8.
_QSCALE = {"int16": 32000.0, "int8": 120.0}


@functools.partial(jax.jit, static_argnames=("mode",))
def _quant_dev(x: jnp.ndarray, mode: str):
    x = x.astype(jnp.float32)
    peak = jnp.maximum(jnp.max(jnp.abs(x)), 1e-30)
    scale = _QSCALE[mode] / peak
    q = jnp.round(x * scale)
    return q.astype(jnp.int16 if mode == "int16" else jnp.int8), 1.0 / scale


@jax.jit
def _dequant_dev(q: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * inv


def fetch_real(x_dev, quant: str | None = None) -> np.ndarray:
    """Device float array → host float32; optional quantised transfer."""
    mode = link_quant_mode() if quant is None else (quant or "")
    if mode:
        # One blocking device_get for (payload, scale): fetching the scalar
        # separately was a second synchronous D2H round trip per fetch
        # (~3.5 ms RTT on the measured link).
        q, inv = jax.device_get(_quant_dev(x_dev, mode))
        return q.astype(np.float32) * float(inv)
    return np.asarray(x_dev)


def put_real(x_np: np.ndarray, quant: str | None = None) -> jnp.ndarray:
    """Host float array → device float32; optional quantised transfer
    (dequantised on device — the consumer sees float32 either way)."""
    mode = link_quant_mode() if quant is None else (quant or "")
    x_np = np.ascontiguousarray(x_np, dtype=np.float32)
    if mode:
        peak = max(float(np.max(np.abs(x_np))), 1e-30)
        scale = _QSCALE[mode] / peak
        q = np.round(x_np * scale).astype(
            np.int16 if mode == "int16" else np.int8)
        return _dequant_dev(jnp.asarray(q), jnp.float32(1.0 / scale))
    return jnp.asarray(x_np)


def fetch_complex(spec_dev, quant: str | None = None) -> np.ndarray:
    """Device complex array → host ``np.complex64`` without a complex
    transfer (the axon runtime rejects complex64 both ways). With link
    quantisation on, the stacked real/imag pair additionally crosses as
    int16/int8 + one scalar scale."""
    mode = link_quant_mode() if quant is None else (quant or "")
    if mode:
        q, inv = jax.device_get(_quant_dev(_split_ri(spec_dev), mode))
        ri = q.astype(np.float32) * float(inv)
    else:
        ri = np.asarray(_split_ri(spec_dev))
    return (ri[0] + 1j * ri[1]).astype(np.complex64, copy=False)


def put_complex(spec_np: np.ndarray, quant: str | None = None) -> jnp.ndarray:
    """Host complex array → device ``complex64`` without a complex transfer."""
    mode = link_quant_mode() if quant is None else (quant or "")
    if mode:
        ri = np.stack([np.ascontiguousarray(spec_np.real, dtype=np.float32),
                       np.ascontiguousarray(spec_np.imag, dtype=np.float32)])
        pair = put_real(ri, quant=mode)
        return _combine_ri(pair[0], pair[1])
    re = jnp.asarray(np.ascontiguousarray(spec_np.real, dtype=np.float32))
    im = jnp.asarray(np.ascontiguousarray(spec_np.imag, dtype=np.float32))
    return _combine_ri(re, im)


def hann_window(n: int, periodic: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(n, periodic=True)``."""
    m = n if periodic else n - 1
    i = np.arange(n, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / max(m, 1))
    return jnp.asarray(w, dtype=dtype)


def hamming_window(n: int, periodic: bool = False, dtype=jnp.float32) -> jnp.ndarray:
    """Hamming window matching ``scipy.signal.windows.hamming`` (symmetric default)."""
    m = n if periodic else n - 1
    i = np.arange(n, dtype=np.float64)
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * i / max(m, 1))
    return jnp.asarray(w, dtype=dtype)


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """Slice ``x (..., L)`` into overlapping frames ``(..., T, frame_len)``.

    ``T = 1 + (L - frame_len) // hop``; requires ``L >= frame_len``.
    """
    length = x.shape[-1]
    num_frames = 1 + (length - frame_len) // hop
    # Static gather indices: (T, frame_len).
    idx = np.arange(frame_len)[None, :] + hop * np.arange(num_frames)[:, None]
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add ``frames (..., T, N)`` with hop ``hop`` → ``(..., N + hop*(T-1))``.

    Scatter-free: pads N up to ``k*hop`` (k = ceil(N/hop)), views each frame as
    ``k`` hop-sized lanes, and accumulates k dense shifted adds.
    """
    *batch, num_frames, frame_len = frames.shape
    k = -(-frame_len // hop)
    pad = k * hop - frame_len
    if pad:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad)])
    lanes = frames.reshape(*batch, num_frames, k, hop)
    out = jnp.zeros((*batch, num_frames + k - 1, hop), dtype=frames.dtype)
    for j in range(k):
        # Static-slice accumulate: lowers to a dense fused add, no scatter.
        out = out.at[..., j : j + num_frames, :].add(lanes[..., j, :])
    out = out.reshape(*batch, (num_frames + k - 1) * hop)
    return out[..., : frame_len + hop * (num_frames - 1)]


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int):
    """Real/imag rfft matrices: X = frames @ (C - iS).

    On TPU the MXU evaluates a 2048-point DFT-as-matmul faster than the XLA
    FFT lowering at these batch sizes; selected via AUDSEP_STFT_IMPL=matmul.
    """
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


@functools.lru_cache(maxsize=8)
def _idft_matrices(n_fft: int):
    """Real/imag irfft matrices: x = Re @ Cw + Im @ Sw (Hermitian fold-in)."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full((n_bins, 1), 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    return (jnp.asarray(c * np.cos(ang) / n_fft, jnp.float32),
            jnp.asarray(-c * np.sin(ang) / n_fft, jnp.float32))


def _stft_impl(impl: str | None = None) -> str:
    """Resolve the rfft backend: per-call override wins, else the import-time
    default (callers under jit must thread ``ExecutionOptions.stft`` through —
    reading env here would bake the first value into every trace)."""
    if impl:
        return impl
    from .exec_options import DEFAULT_EXEC

    return DEFAULT_EXEC.stft


def _rfft_frames(frames: jnp.ndarray, impl: str | None = None) -> jnp.ndarray:
    """rfft over the last axis, impl-switchable ((..., T, n_fft) → complex).

    The matmul path pins Precision.HIGHEST: a DFT-as-matmul at the TPU's
    DEFAULT (bf16-class) matmul precision is a ~8-bit-mantissa transform —
    the same trap measured in ops/resample.py. HIGHEST (f32-accurate
    multi-pass on the MXU) keeps the transform bit-comparable to the fft
    lowering while still winning on dispatch shape."""
    if _stft_impl(impl) == "matmul":
        cos_m, sin_m = _dft_matrices(frames.shape[-1])
        f32 = frames.astype(jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        return jax.lax.complex(jnp.matmul(f32, cos_m, precision=hi),
                               -jnp.matmul(f32, sin_m, precision=hi))
    return jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)


def _irfft_frames(spec: jnp.ndarray, n_fft: int,
                  impl: str | None = None) -> jnp.ndarray:
    """irfft over the last axis ((..., T, n_bins) → (..., T, n_fft))."""
    if _stft_impl(impl) == "matmul":
        cos_m, sin_m = _idft_matrices(n_fft)
        hi = jax.lax.Precision.HIGHEST
        return (jnp.matmul(spec.real.astype(jnp.float32), cos_m, precision=hi)
                + jnp.matmul(spec.imag.astype(jnp.float32), sin_m, precision=hi))
    return jnp.fft.irfft(spec, n=n_fft, axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "hop", "pad_mode", "center", "impl"))
def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: jnp.ndarray,
    center: bool = True,
    pad_mode: str = "reflect",
    impl: str | None = None,
) -> jnp.ndarray:
    """torch.stft-compatible STFT.

    Args:
      x: ``(..., L)`` real signal.
      window: ``(n_fft,)`` analysis window.
    Returns:
      ``(..., n_fft//2 + 1, T)`` complex64 spectrogram (freq-major like torch).
    """
    if center:
        p = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(p, p)], mode=pad_mode)
    frames = frame_signal(x, n_fft, hop) * window
    spec = _rfft_frames(frames, impl)
    return jnp.swapaxes(spec, -1, -2)


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "hop", "center", "length", "impl"))
def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: jnp.ndarray,
    center: bool = True,
    length: Optional[int] = None,
    impl: str | None = None,
    frame_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch.istft-compatible least-squares inverse STFT.

    Args:
      spec: ``(..., F, T)`` complex spectrogram with ``F = n_fft//2 + 1``.
      frame_valid: optional ``(T,)`` 0/1 vector. When given, the
        least-squares window-power envelope sums ONLY the valid frames —
        inverting the first ``k`` frames of a longer static buffer then
        reproduces the exact-shape inverse's boundary behaviour, provided
        the invalid frames of ``spec`` are zero (the device-resident VR
        chain pads tracks into shape buckets this way, ops/vr_chain.py).
    Returns:
      ``(..., L)`` real signal with ``L = hop * (T - 1)`` for ``center=True``
      (or ``length`` if given).
    """
    frames = _irfft_frames(jnp.swapaxes(spec, -1, -2), n_fft, impl)
    num_frames = frames.shape[-2]
    y = overlap_add(frames * window, hop)
    # Least-squares normalisation by the summed squared-window envelope.
    wsq = jnp.broadcast_to(window * window, (num_frames, n_fft))
    if frame_valid is not None:
        wsq = wsq * frame_valid[:, None]
    envelope = overlap_add(wsq, hop)
    y = y / jnp.maximum(envelope, 1e-11)
    if center:
        p = n_fft // 2
        y = y[..., p:]
        out_len = hop * (num_frames - 1) if length is None else length
        y = y[..., :out_len]
    elif length is not None:
        y = y[..., :length]
    return y


def stft_real_packed(
    x: jnp.ndarray, n_fft: int, hop: int, window: jnp.ndarray, dim_f: int
) -> jnp.ndarray:
    """MDX-style packed STFT (ref: uvr_lib_v5/stft.py:20-57).

    Input ``(..., C, L)`` → output ``(..., C*2, dim_f, T)`` where the channel
    axis interleaves per input channel as [c0_real, c0_imag, c1_real, c1_imag],
    cropped to the lowest ``dim_f`` frequency bins.
    """
    spec = stft(x, n_fft, hop, window)  # (..., C, F, T) complex
    packed = jnp.stack([spec.real, spec.imag], axis=-3)  # (..., C, 2, F, T)
    shape = packed.shape
    packed = packed.reshape(*shape[:-4], shape[-4] * 2, shape[-2], shape[-1])
    return packed[..., :dim_f, :]


def istft_real_packed(
    packed: jnp.ndarray, n_fft: int, hop: int, window: jnp.ndarray
) -> jnp.ndarray:
    """Inverse of :func:`stft_real_packed` (ref: uvr_lib_v5/stft.py:59-126).

    Input ``(..., C*2, dim_f, T)`` is zero-padded on the frequency axis up to
    ``n_fft//2 + 1`` bins and inverted back to ``(..., C, L)``.
    """
    n_bins = n_fft // 2 + 1
    *batch, c2, dim_f, t = packed.shape
    if dim_f < n_bins:
        packed = jnp.pad(
            packed, [(0, 0)] * (packed.ndim - 2) + [(0, n_bins - dim_f), (0, 0)]
        )
    packed = packed.reshape(*batch, c2 // 2, 2, n_bins, t)
    spec = jax.lax.complex(packed[..., 0, :, :], packed[..., 1, :, :])
    return istft(spec, n_fft, hop, window)
