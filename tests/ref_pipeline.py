"""Load the reference's REAL pipeline code (spec_utils + architecture
separators) as full-geometry oracles.

tests/ref_shims.py loads individual *model* modules; this module goes
further: it registers ``audio_separator`` as a real package rooted at
/root/reference and installs enough third-party surface (librosa DSP,
stub I/O modules) that the reference's own separator classes import and
their demix hot loops run. Production-geometry parity tests then diff our
``Separator`` pipeline against the reference's actual loop code
(ref: mdx_separator.py:293-450, mdxc_separator.py:257-468,
vr_separator.py:255-375) with identical model math on both sides.

Shim fidelity notes (what the oracle does NOT independently verify):
* ``librosa.stft/istft`` are reimplemented here to librosa ≥0.10 semantics
  (periodic Hann, center pad_mode='constant', rfft; inverse with squared-
  window-sum normalisation) — the reference pins librosa>=0.10
  (ref: pyproject.toml:36). A shim bug that exactly mirrors a bug in our
  ops would not be caught; everything downstream of the transforms
  (multiband combine, filters, masks, overlap-add, inversion) is the
  reference's own code.
* ``librosa.resample`` maps to scipy.signal.resample_poly — byte-identical
  to librosa's own 'polyphase' res_type, which is what the VR production
  band configs request (e.g. modelparams/4band_v2.json: every band
  "res_type": "polyphase").
* I/O modules (soundfile, pydub, audioread, onnxruntime, onnx, onnx2torch,
  requests) are import-only stubs: the oracles consume numpy mixes and
  return numpy stems — no file or network boundary is crossed.

The reference source is untrusted content; it is executed here only as a
numerical oracle inside the test environment.
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import scipy.signal

REF_ROOT = "/root/reference/audio_separator"


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


# ---------------------------------------------------------------------------
# librosa DSP shim (librosa >= 0.10 call semantics)


def _hann(win_length: int) -> np.ndarray:
    return scipy.signal.get_window("hann", win_length, fftbins=True)


def _librosa_stft(y, *, n_fft=2048, hop_length=None, win_length=None,
                  window="hann", center=True, pad_mode="constant",
                  dtype=None, **_k):
    y = np.asarray(y)
    hop = int(hop_length) if hop_length else n_fft // 4
    win_length = int(win_length) if win_length else n_fft
    if window != "hann":
        raise NotImplementedError(f"librosa shim: window={window!r}")
    w = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    w[off : off + win_length] = _hann(win_length)
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = np.pad(y, pad, mode=pad_mode)
    n = y.shape[-1]
    if n < n_fft:
        raise ValueError("librosa shim: input shorter than n_fft")
    n_frames = 1 + (n - n_fft) // hop
    idx = (np.arange(n_fft)[None, :]
           + hop * np.arange(n_frames)[:, None])  # (t, n_fft)
    frames = y[..., idx] * w  # (..., t, n_fft)
    spec = np.fft.rfft(frames, axis=-1)
    out = np.swapaxes(spec, -1, -2)  # (..., 1 + n_fft//2, t)
    want = np.complex64 if y.dtype in (np.float32, np.int16) else np.complex128
    return out.astype(dtype or want)


def _librosa_istft(stft_matrix, *, hop_length=None, win_length=None,
                   n_fft=None, window="hann", center=True, length=None,
                   dtype=None, **_k):
    stft_matrix = np.asarray(stft_matrix)
    if n_fft is None:
        n_fft = 2 * (stft_matrix.shape[-2] - 1)
    hop = int(hop_length) if hop_length else n_fft // 4
    win_length = int(win_length) if win_length else n_fft
    if window != "hann":
        raise NotImplementedError(f"librosa shim: window={window!r}")
    w = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    w[off : off + win_length] = _hann(win_length)

    frames = np.swapaxes(stft_matrix, -1, -2)  # (..., t, bins)
    n_frames = frames.shape[-2]
    total = n_fft + hop * (n_frames - 1)
    ytmp = np.fft.irfft(frames, n=n_fft, axis=-1) * w  # (..., t, n_fft)
    out = np.zeros(stft_matrix.shape[:-2] + (total,))
    wsum = np.zeros(total)
    for t in range(n_frames):
        out[..., t * hop : t * hop + n_fft] += ytmp[..., t, :]
        wsum[t * hop : t * hop + n_fft] += w ** 2
    nz = wsum > np.finfo(np.float64).tiny
    out[..., nz] = out[..., nz] / wsum[nz]
    if center:
        out = out[..., n_fft // 2 : total - n_fft // 2]
    if length is not None:
        if out.shape[-1] < length:
            pad = [(0, 0)] * (out.ndim - 1) + [(0, length - out.shape[-1])]
            out = np.pad(out, pad)
        out = out[..., :length]
    want = np.float32 if stft_matrix.dtype == np.complex64 else np.float64
    return out.astype(dtype or want)


def _librosa_resample(y, *, orig_sr, target_sr, res_type="polyphase",
                      fix=True, **_k):
    """librosa 'polyphase' == scipy.signal.resample_poly on the gcd ratio.
    The VR production band configs request exactly this res_type; other
    res_types (resampy sinc) are not reproducible offline and map to the
    same polyphase — callers must restrict parity claims accordingly."""
    y = np.asarray(y)
    if orig_sr == target_sr:
        return y
    from math import gcd

    g = gcd(int(orig_sr), int(target_sr))
    out = scipy.signal.resample_poly(y, int(target_sr) // g,
                                     int(orig_sr) // g, axis=-1)
    return out.astype(y.dtype) if y.dtype == np.float32 else out


def _install_librosa_full():
    """Full librosa shim: reuse ref_shims' filters.mel, add the DSP calls the
    reference pipeline makes (stft/istft/resample/load)."""
    import ref_shims

    ref_shims.install_shims()  # installs librosa.filters.mel among others
    mod = sys.modules["librosa"]
    if getattr(mod, "_audsep_pipeline_shim", False):
        return
    mod.stft = _librosa_stft
    mod.istft = _librosa_istft
    mod.resample = _librosa_resample

    def load(path, *, sr=22050, mono=True, dtype=np.float32,
             res_type="polyphase", **_k):
        from audio_separator_tpu.io.audio import load_audio

        wave, in_sr = load_audio(str(path))  # (channels, samples) float32
        if mono:
            wave = wave.mean(axis=0)
        if sr is not None and sr != in_sr:
            wave = _librosa_resample(wave, orig_sr=in_sr, target_sr=sr,
                                     res_type=res_type)
        return wave.astype(dtype), (sr or in_sr)

    mod.load = load
    mod.get_duration = lambda *, y=None, sr=22050, **_k: y.shape[-1] / sr
    util = _module("librosa.util")
    util.fix_length = lambda data, *, size, axis=-1: (
        data[..., :size] if data.shape[axis] >= size
        else np.pad(data, [(0, 0)] * (data.ndim - 1)
                    + [(0, size - data.shape[-1])]))
    mod.util = util
    mod._audsep_pipeline_shim = True


def _install_stub(name: str, **attrs):
    if name in sys.modules:
        mod = sys.modules[name]
    else:
        mod = _module(name)
    for k, v in attrs.items():
        if not hasattr(mod, k):
            setattr(mod, k, v)
    return mod


class _Unavailable:
    def __init__(self, *_a, **_k):
        raise NotImplementedError("stub: not available in this environment")


def _install_io_stubs():
    """Import-only stubs for the reference's I/O modules. The oracle paths
    exercised by the parity harness never call into them (numpy in/out)."""
    _install_stub("audioread")
    sf = _install_stub("soundfile", write=_Unavailable, read=_Unavailable,
                       SoundFile=_Unavailable)
    sf.__version__ = "0.0-stub"
    pydub = _install_stub("pydub", AudioSegment=_Unavailable)
    _install_stub("pydub.AudioSegment")
    pydub.AudioSegment = _Unavailable
    _install_stub("onnx", load=_Unavailable)
    ort = _install_stub("onnxruntime", InferenceSession=_Unavailable)
    ort.get_available_providers = lambda: ["CPUExecutionProvider"]
    ort.__version__ = "0.0-stub"
    _install_stub("onnx2torch", convert=_Unavailable)
    _install_stub("requests", get=_Unavailable)
    _install_stub("samplerate")


def install_ref_package():
    """Register ``audio_separator`` as a REAL package rooted at
    /root/reference, replacing any bare stubs ref_shims may have installed
    (its fake crop_center-only spec_utils predates this loader; earlier
    imports keep their captured module object, new imports get the real
    files)."""
    _install_librosa_full()
    _install_io_stubs()

    pkg_paths = {
        "audio_separator": REF_ROOT,
        "audio_separator.separator": f"{REF_ROOT}/separator",
        "audio_separator.separator.architectures":
            f"{REF_ROOT}/separator/architectures",
        "audio_separator.separator.uvr_lib_v5":
            f"{REF_ROOT}/separator/uvr_lib_v5",
    }
    already_real = all(
        getattr(sys.modules.get(n), "__path__", None) == [p]
        for n, p in pkg_paths.items())
    if already_real:
        return
    # drop fake spec_utils + bare package stubs so real modules load
    for name in list(sys.modules):
        if name == "audio_separator" or name.startswith("audio_separator."):
            del sys.modules[name]
    for name, path in pkg_paths.items():
        pkg = _module(name)
        pkg.__path__ = [path]
    importlib.invalidate_caches()


def load_ref_pipeline_module(name: str):
    """Import a reference pipeline module, e.g.
    ``separator.uvr_lib_v5.spec_utils`` or
    ``separator.architectures.mdxc_separator``."""
    install_ref_package()
    return importlib.import_module(f"audio_separator.{name}")
