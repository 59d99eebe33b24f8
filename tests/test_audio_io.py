"""Native codec I/O tests: formats, bit depths, resampling, probing."""

import os

import numpy as np
import pytest

from audio_separator_tpu.io import audio as audio_io


@pytest.fixture()
def sine():
    sr = 44100
    t = np.arange(sr * 2) / sr
    left = np.sin(2 * np.pi * 440 * t) * 0.5
    right = np.sin(2 * np.pi * 554 * t) * 0.5
    return np.stack([left, right]).astype(np.float32), sr


def test_native_codec_available():
    assert audio_io.native_codec_available()


@pytest.mark.parametrize("fmt,bit_depth,tol", [
    ("wav", 16, 1e-4), ("wav", 24, 1e-6), ("wav", 32, 1e-7),
    ("flac", 16, 1e-4), ("flac", 24, 1e-6),
])
def test_lossless_roundtrip(sine, tmp_path, fmt, bit_depth, tol):
    pcm, sr = sine
    path = str(tmp_path / f"t.{fmt}")
    audio_io.save_audio(path, pcm, sr, bit_depth=bit_depth)
    back, back_sr = audio_io.load_audio(path)
    assert back_sr == sr
    assert back.shape == pcm.shape
    np.testing.assert_allclose(back, pcm, atol=max(tol, 2 ** -(bit_depth - 2)))


@pytest.mark.parametrize("fmt", ["mp3", "ogg", "opus"])
def test_lossy_roundtrip(sine, tmp_path, fmt):
    pcm, sr = sine
    path = str(tmp_path / f"t.{fmt}")
    try:
        audio_io.save_audio(path, pcm, sr, bitrate_kbps=192)
    except RuntimeError as exc:
        pytest.skip(f"encoder unavailable: {exc}")
    back, back_sr = audio_io.load_audio(path, sample_rate=sr)
    n = min(back.shape[1], pcm.shape[1])
    # lossy: compare correlation, not samples
    corr = np.corrcoef(back[0, 2000 : n - 2000], pcm[0, 2000 : n - 2000])[0, 1]
    assert corr > 0.95, corr


def test_probe_reports_bit_depth(sine, tmp_path):
    pcm, sr = sine
    path = str(tmp_path / "t24.flac")
    audio_io.save_audio(path, pcm, sr, bit_depth=24)
    info = audio_io.probe(path)
    assert info.sample_rate == sr
    assert info.channels == 2
    assert info.bits_per_sample == 24


def test_decode_with_resample_and_mixdown(sine, tmp_path):
    pcm, sr = sine
    path = str(tmp_path / "t.wav")
    audio_io.save_audio(path, pcm, sr, bit_depth=24)
    mono_16k, out_sr = audio_io.load_audio(path, sample_rate=16000, channels=1)
    assert out_sr == 16000
    assert mono_16k.shape[0] == 1
    expected = int(pcm.shape[1] * 16000 / sr)
    assert abs(mono_16k.shape[1] - expected) < 50


def test_wav_fallback_matches_native(sine, tmp_path):
    pcm, sr = sine
    path = str(tmp_path / "t.wav")
    audio_io._save_wav(str(path), np.ascontiguousarray(pcm.T), sr, 16)
    native, _ = audio_io.load_audio(path)
    fallback, _ = audio_io._load_wav(path, None, None)
    np.testing.assert_allclose(native, fallback, atol=1e-4)


def test_float32_wav_pure_python_roundtrip(tmp_path, monkeypatch):
    """The stdlib wave module rejects IEEE-float WAVs (format 3); the RIFF
    fallback must read back what _save_wav_float32 writes."""
    from audio_separator_tpu.io import audio as audio_io

    # Force the pure-Python path regardless of the native lib.
    monkeypatch.setattr(audio_io, "_load_lib", lambda: None)
    monkeypatch.setattr(audio_io, "_use_subprocess", lambda: False)

    rng = np.random.default_rng(0)
    pcm = np.clip(rng.standard_normal((2, 4096)) * 0.4, -1, 1).astype(np.float32)
    path = str(tmp_path / "f32.wav")
    audio_io.save_audio(path, pcm, 44100, bit_depth=32)

    info = audio_io.probe(path)
    assert info.bits_per_sample == 32 and info.channels == 2

    out, sr = audio_io.load_audio(path)
    assert sr == 44100
    np.testing.assert_allclose(out, pcm, atol=1e-6)


def test_24bit_wav_vectorised_writer_roundtrip(tmp_path, monkeypatch):
    from audio_separator_tpu.io import audio as audio_io

    monkeypatch.setattr(audio_io, "_load_lib", lambda: None)
    monkeypatch.setattr(audio_io, "_use_subprocess", lambda: False)

    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal((2, 2048)) * 0.5).astype(np.float32)
    path = str(tmp_path / "p24.wav")
    audio_io.save_audio(path, pcm, 48000, bit_depth=24)
    out, sr = audio_io.load_audio(path)
    assert sr == 48000
    np.testing.assert_allclose(out, np.clip(pcm, -1, 1), atol=2e-7 * 8388608 / 8388608 + 1.5e-7)


def test_mono_file_prepare_mix_stereoifies(tmp_path):
    """load_audio returns (1, N) for mono files; prepare_mix must stereo-ify
    rather than treat it as a 1-channel/N-sample track."""
    import logging

    from audio_separator_tpu.io import audio as audio_io
    from audio_separator_tpu.separator.common import BaseSeparator

    t = np.arange(44100) / 44100
    mono = (np.sin(2 * np.pi * 220 * t) * 0.5).astype(np.float32)[None]
    path = str(tmp_path / "mono.wav")
    audio_io.save_audio(path, mono, 44100)

    inst = BaseSeparator.__new__(BaseSeparator)
    inst.logger = logging.getLogger("t")
    inst.sample_rate = 44100
    inst.input_bit_depth = None
    out = inst.prepare_mix(path)
    assert out.shape == (2, 44100)
    np.testing.assert_allclose(out[0], out[1])


def test_codec_source_is_single_and_buildable_path():
    """One codec source of truth: the packaged io/codec.cpp (what pip/Modal
    self-build from AND what native/build.sh compiles). The former duplicate
    native/codec.cpp must stay deleted — a reintroduced copy silently drifts."""
    import audio_separator_tpu.io as io_pkg

    io_dir = os.path.dirname(os.path.abspath(io_pkg.__file__))
    assert os.path.exists(os.path.join(io_dir, "codec.cpp"))
    repo = os.path.dirname(os.path.dirname(io_dir))
    native_dir = os.path.join(repo, "native")
    if os.path.isdir(native_dir):
        assert not os.path.exists(os.path.join(native_dir, "codec.cpp")), (
            "native/codec.cpp reintroduced — io/codec.cpp is the single source")
        with open(os.path.join(native_dir, "build.sh")) as f:
            assert "audio_separator_tpu/io/codec.cpp" in f.read()
