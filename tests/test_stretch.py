"""Phase-vocoder time-stretch / pitch-shift (replaces the reference's
rubberband subprocess wrapper, ref: uvr_lib_v5/pyrb.py:23-92)."""

import numpy as np

from audio_separator_tpu.ops.stretch import pitch_shift, time_stretch


def _dominant_freq(x: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.argmax(spec) * sr / len(x)


def test_time_stretch_changes_duration_not_pitch():
    sr = 22050
    t = np.arange(sr * 2) / sr
    y = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    for rate in (0.75, 1.5):
        out = time_stretch(y, sr, rate)
        assert abs(len(out) - len(y) / rate) < 2048, (rate, len(out))
        mid = out[len(out) // 4 : 3 * len(out) // 4]
        f = _dominant_freq(mid, sr)
        assert abs(f - 440.0) < 15.0, (rate, f)


def test_time_stretch_identity():
    y = np.random.default_rng(0).standard_normal(4096).astype(np.float32)
    out = time_stretch(y, 44100, 1.0)
    np.testing.assert_allclose(out, y, atol=1e-7)


def test_time_stretch_stereo_frames_first():
    sr = 22050
    t = np.arange(sr) / sr
    y = np.stack([np.sin(2 * np.pi * 220 * t), np.sin(2 * np.pi * 330 * t)],
                 axis=1).astype(np.float32)  # (T, C) like soundfile
    out = time_stretch(y, sr, 2.0)
    assert out.ndim == 2 and out.shape[1] == 2
    assert abs(out.shape[0] - len(t) / 2) < 2048


def test_pitch_shift_moves_frequency_keeps_length():
    sr = 22050
    t = np.arange(sr * 2) / sr
    y = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    for steps in (-5.0, 4.0):
        out = pitch_shift(y, sr, steps)
        assert out.shape == y.shape
        mid = out[len(out) // 4 : 3 * len(out) // 4]
        f = _dominant_freq(mid, sr)
        expect = 440.0 * 2 ** (steps / 12)
        assert abs(f - expect) < 0.03 * expect, (steps, f, expect)


def test_pitch_shift_zero_is_identity():
    y = np.random.default_rng(1).standard_normal(4096).astype(np.float32)
    np.testing.assert_allclose(pitch_shift(y, 44100, 0.0), y, atol=1e-7)


def test_augment_audio_file_roundtrip(tmp_path):
    """augment_audio (ref: spec_utils.augment_audio) writes a stretched file."""
    from audio_separator_tpu.io.audio import load_audio, save_audio
    from audio_separator_tpu.ops.stretch import augment_audio

    sr = 44100
    t = np.arange(sr * 2) / sr
    y = np.stack([np.sin(2 * np.pi * 220 * t), np.sin(2 * np.pi * 330 * t)]
                 ).astype(np.float32) * 0.5
    src = str(tmp_path / "in.wav")
    save_audio(src, y, sr)

    # time stretch: 2x speed -> half duration
    out_path = augment_audio(str(tmp_path / "fast.wav"), src, 2.0)
    pcm, out_sr = load_audio(out_path)
    assert out_sr == sr and pcm.shape[0] == 2
    assert abs(pcm.shape[1] - sr) < 4096

    # resample-trick pitch path keeps playback rate, changes length
    out2 = augment_audio(str(tmp_path / "pitched.wav"), src, 2.0,
                         is_time_correction=False, is_normalization=True)
    pcm2, sr2 = load_audio(out2)
    assert sr2 == sr and pcm2.shape[0] == 2
    assert pcm2.shape[1] > pcm.shape[1]  # -2 semitones -> longer
    assert np.abs(pcm2).max() <= 1.0 + 1e-3
