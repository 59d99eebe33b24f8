"""Host-side audio I/O.

Decode/encode runs on the host CPU through the first-party native codec
library (``io/codec.cpp``, linked against libavformat/libavcodec), taking
the place of the reference's ffmpeg-subprocess + pydub + soundfile + librosa
stack (ref: audio_separator/separator/common_separator.py:217-451,
separator.py:344-357). A pure-Python WAV path is kept as a fallback so the
package degrades gracefully where the shared library is unavailable.

All PCM exchanged with the DSP core is float32, shaped ``(channels, samples)``
(channel-major, matching the reference's internal convention).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import wave
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libaudsep_codec.so"
_HERE = os.path.dirname(os.path.abspath(__file__))

_lib = None
_lib_load_error: Optional[str] = None


def _build_native() -> Optional[str]:
    """Attempt to build the codec library from source (first import on a new
    machine). Returns the library path or None.

    The single source of truth ships INSIDE the package (io/codec.cpp), so a
    pip install, a source-mounted deployment (Modal), or the repo working
    tree all self-build from the same file (native/build.sh compiles the
    same path)."""
    out = os.path.join(_HERE, _LIB_NAME)
    src = os.path.join(_HERE, "codec.cpp")
    if not os.path.exists(src):
        return None
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17", src,
        "-lavformat", "-lavcodec", "-lavutil", "-lswresample", "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def _load_lib():
    global _lib, _lib_load_error
    if _lib is not None or _lib_load_error is not None:
        return _lib
    path = os.path.join(_HERE, _LIB_NAME)
    if not os.path.exists(path):
        built = _build_native()
        if built is None:
            _lib_load_error = "native codec library unavailable"
            return None
        path = built
    try:
        lib = ctypes.CDLL(path)
    except OSError as exc:  # missing libav at runtime
        _lib_load_error = str(exc)
        return None
    lib.as_last_error.restype = ctypes.c_char_p
    lib.as_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.as_decode.restype = ctypes.c_int
    lib.as_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int),
    ]
    lib.as_probe.restype = ctypes.c_int
    lib.as_encode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.as_encode.restype = ctypes.c_int
    lib.as_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def native_codec_available() -> bool:
    return _load_lib() is not None


@dataclass
class AudioInfo:
    sample_rate: int
    channels: int
    frames: int  # -1 if unknown
    bits_per_sample: int


# ---------------------------------------------------------------------------
# Subprocess codec path: same native code, own heap. Selected with
# AUDSEP_CODEC_SUBPROCESS=1 — used by the test suite to isolate decodes from
# an upstream in-process allocator bug, and available wherever heap isolation
# is worth ~20 ms per call.

_CLI_NAME = "audsep_codec"
_cli_path: Optional[str] = None


def _codec_cli() -> Optional[str]:
    global _cli_path
    if _cli_path is not None:
        return _cli_path or None
    path = os.path.join(_HERE, _CLI_NAME)
    if not os.path.exists(path):
        src = os.path.join(_HERE, "codec.cpp")
        try:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-DAUDSEP_CLI", src,
                 "-lavformat", "-lavcodec", "-lavutil", "-lswresample", "-o", path],
                check=True, capture_output=True, timeout=180)
        except Exception:
            _cli_path = ""
            return None
    _cli_path = path
    return path


def _use_subprocess() -> bool:
    return bool(os.environ.get("AUDSEP_CODEC_SUBPROCESS")) and _codec_cli() is not None


def _probe_subprocess(path: str) -> AudioInfo:
    out = subprocess.run([_codec_cli(), "probe", path],
                         capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError(f"probe failed for {path}: {out.stderr.strip()}")
    sr, ch, frames, bits = out.stdout.split()
    return AudioInfo(int(sr), int(ch), int(frames), int(bits))


def _load_subprocess(path: str, sample_rate, channels):
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".raw", delete=False) as tf:
        raw = tf.name
    try:
        out = subprocess.run(
            [_codec_cli(), "decode", path, str(sample_rate or 0),
             str(channels or 0), raw], capture_output=True, text=True)
        if out.returncode != 0:
            raise RuntimeError(f"decode failed for {path}: {out.stderr.strip()}")
        with open(raw, "rb") as f:
            header = np.fromfile(f, dtype=np.int64, count=1)
            meta = np.fromfile(f, dtype=np.int32, count=2)
            frames, ch, sr = int(header[0]), int(meta[0]), int(meta[1])
            data = np.fromfile(f, dtype=np.float32, count=frames * ch)
        pcm = data.reshape(frames, ch).T
        return np.ascontiguousarray(pcm), sr
    finally:
        try:
            os.unlink(raw)
        except OSError:
            pass


def _save_subprocess(path: str, interleaved: np.ndarray, sample_rate: int,
                     fmt: str, bit_depth: int, bitrate_kbps: int) -> None:
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".raw", delete=False) as tf:
        raw = tf.name
        interleaved.astype("<f4").tofile(tf)
    try:
        out = subprocess.run(
            [_codec_cli(), "encode", path, raw, str(interleaved.shape[0]),
             str(interleaved.shape[1]), str(sample_rate), fmt,
             str(bit_depth), str(bitrate_kbps)], capture_output=True, text=True)
        if out.returncode != 0:
            raise RuntimeError(f"encode failed for {path}: {out.stderr.strip()}")
    finally:
        try:
            os.unlink(raw)
        except OSError:
            pass


def probe(path: str) -> AudioInfo:
    """Stream properties without a full decode (bit-depth preservation,
    ref: common_separator.py:260-282)."""
    if _use_subprocess():
        return _probe_subprocess(path)
    lib = _load_lib()
    if lib is None:
        return _probe_wav(path)
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    fr = ctypes.c_longlong()
    bits = ctypes.c_int()
    rc = lib.as_probe(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                      ctypes.byref(fr), ctypes.byref(bits))
    if rc != 0:
        raise RuntimeError(f"probe failed for {path}: {lib.as_last_error().decode()}")
    return AudioInfo(sr.value, ch.value, fr.value, bits.value)


def load_audio(
    path: str,
    sample_rate: Optional[int] = None,
    channels: Optional[int] = None,
) -> Tuple[np.ndarray, int]:
    """Decode any supported container to float32 ``(channels, samples)``.

    Resampling/channel mixdown happens inside the native layer (libswresample)
    when requested — equivalent to ``librosa.load(..., sr=..., mono=False)``
    in the reference's ``prepare_mix``.
    """
    if _use_subprocess():
        return _load_subprocess(path, sample_rate, channels)
    lib = _load_lib()
    if lib is None:
        return _load_wav(path, sample_rate, channels)
    data = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_longlong()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    rc = lib.as_decode(path.encode(), sample_rate or 0, channels or 0,
                       ctypes.byref(data), ctypes.byref(frames),
                       ctypes.byref(ch), ctypes.byref(sr))
    if rc != 0:
        raise RuntimeError(f"decode failed for {path}: {lib.as_last_error().decode()}")
    try:
        n = frames.value * ch.value
        arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
    finally:
        lib.as_free(data)
    pcm = arr.reshape(frames.value, ch.value).T  # (channels, samples)
    return np.ascontiguousarray(pcm), sr.value


def save_audio(
    path: str,
    pcm: np.ndarray,
    sample_rate: int,
    output_format: Optional[str] = None,
    bit_depth: int = 16,
    bitrate_kbps: int = 0,
) -> None:
    """Encode float32 ``(channels, samples)`` PCM to ``path``.

    Format inferred from the extension when not given; bit depth preserved for
    wav/flac/aiff like the reference's pydub/soundfile writers.
    """
    if pcm.ndim == 1:
        pcm = pcm[None, :]
    fmt = (output_format or os.path.splitext(path)[1].lstrip(".") or "wav").lower()
    interleaved = np.ascontiguousarray(pcm.T, dtype=np.float32)
    if _use_subprocess() and fmt != "wav":
        _save_subprocess(path, interleaved, sample_rate, fmt, bit_depth,
                         bitrate_kbps)
        return
    if fmt == "wav":
        # WAV always routes through the pure-Python writer — skip the native
        # lib load (which may attempt a g++ build) entirely.
        _save_wav(path, interleaved, sample_rate, bit_depth)
        return
    lib = _load_lib()
    if lib is None:
        raise RuntimeError(
            f"cannot encode '{fmt}': native codec unavailable ({_lib_load_error})"
        )
    ptr = interleaved.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.as_encode(path.encode(), ptr, interleaved.shape[0], interleaved.shape[1],
                       sample_rate, fmt.encode(), bit_depth, bitrate_kbps)
    if rc != 0:
        raise RuntimeError(f"encode failed for {path}: {lib.as_last_error().decode()}")


# ----------------------------------------------------------------------------
# Pure-Python WAV fallback (no native lib needed).

def _save_wav(path: str, interleaved: np.ndarray, sample_rate: int, bit_depth: int):
    frames, channels = interleaved.shape
    clipped = np.clip(interleaved, -1.0, 1.0)
    if bit_depth >= 32:
        # float32 WAV needs a custom header; write via struct.
        _save_wav_float32(path, clipped, sample_rate)
        return
    if bit_depth == 24:
        ints = (clipped * 8388607.0).round().astype("<i4").reshape(-1)
        # 3 low bytes of each little-endian int32, vectorised (a Python-level
        # per-sample join here costs seconds per stem on long tracks).
        raw = ints.view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
        sampwidth = 3
    else:
        ints = (clipped * 32767.0).round().astype("<i2")
        raw = ints.tobytes()
        sampwidth = 2
    with wave.open(path, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(raw)


def _save_wav_float32(path: str, interleaved: np.ndarray, sample_rate: int):
    frames, channels = interleaved.shape
    data = interleaved.astype("<f4").tobytes()
    byte_rate = sample_rate * channels * 4
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 3, channels, sample_rate, byte_rate, channels * 4, 32))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


def _parse_riff(path: str):
    """Minimal RIFF/WAVE parser for formats the stdlib wave module rejects
    (notably IEEE-float, format code 3 — which _save_wav_float32 itself
    writes). Returns (format_code, channels, sample_rate, bits, data)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise RuntimeError(f"not a RIFF/WAVE file: {path}")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise RuntimeError(f"missing fmt/data chunk in {path}")
    code, ch, sr, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if code == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
        code = struct.unpack("<H", fmt[24:26])[0]
    return code, ch, sr, bits, payload


def _load_wav(path: str, sample_rate, channels):
    try:
        with wave.open(path, "rb") as w:
            ch, sw, sr, n = (w.getnchannels(), w.getsampwidth(),
                             w.getframerate(), w.getnframes())
            raw = w.readframes(n)
        code = 1
    except wave.Error:
        code, ch, sr, bits, raw = _parse_riff(path)
        sw = bits // 8
    if code == 3:  # IEEE float
        dt = "<f4" if sw == 4 else "<f8"
        x = np.frombuffer(raw, dtype=dt).astype(np.float32)
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = ((b[:, 0].astype(np.int32)) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        x = (x << 8 >> 8).astype(np.float32) / 8388608.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise RuntimeError(f"unsupported WAV sample width {sw}")
    pcm = x.reshape(-1, ch).T
    if channels and channels != ch:
        if channels == 2 and ch == 1:
            pcm = np.vstack([pcm, pcm])
        elif channels == 1:
            pcm = pcm.mean(axis=0, keepdims=True)
    if sample_rate and sample_rate != sr:
        from ..ops.resample import resample_poly_np

        pcm = resample_poly_np(pcm, sr, sample_rate)
        sr = sample_rate
    return np.ascontiguousarray(pcm.astype(np.float32)), sr


def _probe_wav(path: str) -> AudioInfo:
    try:
        with wave.open(path, "rb") as w:
            return AudioInfo(w.getframerate(), w.getnchannels(), w.getnframes(),
                             w.getsampwidth() * 8)
    except wave.Error:
        code, ch, sr, bits, payload = _parse_riff(path)
        return AudioInfo(sr, ch, len(payload) // max(1, ch * bits // 8), bits)
