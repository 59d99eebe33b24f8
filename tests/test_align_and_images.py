"""Alignment toolkit + image/SSIM test-infrastructure tests."""

import os

import numpy as np

from audio_separator_tpu.ops.align import (
    adjust_leading_silence,
    align_tracks,
    best_shift,
    check_if_phase_inverted,
    phase_shift_hilbert,
    shift_track,
)

from utils_images import render_spectrogram, render_waveform, ssim, write_png


def test_best_shift_finds_known_lag():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(8000)
    b = np.roll(a, -137)  # b runs 137 samples ahead → delay by +137 to align
    assert abs(best_shift(a[:4000], b[:4000]) - 137) <= 1


def test_phase_inversion_detected():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((2, 44100))
    assert check_if_phase_inverted(a, -a)
    assert not check_if_phase_inverted(a, a)


def test_adjust_leading_silence():
    ref = np.concatenate([np.zeros(100), np.ones(900)])[None]
    target = np.concatenate([np.zeros(400), np.ones(600)])[None]
    out = adjust_leading_silence(target, ref)
    above = np.nonzero(np.abs(out[0]) >= 0.01)[0][0]
    assert abs(above - 100) <= 1


def test_align_tracks_recovers_shift_and_phase():
    rng = np.random.default_rng(2)
    sr = 8000
    a = rng.standard_normal((2, sr * 6)).astype(np.float32)
    b = -shift_track(a, 250)  # delayed and phase-inverted copy
    aligned, residual = align_tracks(a, b, sample_rate=sr)
    n = min(a.shape[-1], aligned.shape[-1])
    rel = np.abs(residual[..., 500 : n - 500]).mean() / np.abs(a).mean()
    assert rel < 0.25, rel


def test_phase_shift_hilbert_180_inverts():
    t = np.linspace(0, 1, 8000)
    x = np.sin(2 * np.pi * 440 * t)
    y = phase_shift_hilbert(x, 180)
    np.testing.assert_allclose(y[100:-100], -x[100:-100], atol=1e-2)


def test_images_and_ssim(fixtures_dir, tmp_path):
    mix = os.path.join(fixtures_dir, "mardy20s.flac")
    vocals = os.path.join(
        fixtures_dir,
        "mardy20s_(Vocals)_mel_band_roformer_karaoke_aufr33_viperx_sdr_10.flac")

    spec_mix = render_spectrogram(mix)
    spec_mix2 = render_spectrogram(mix)
    spec_voc = render_spectrogram(vocals)
    assert ssim(spec_mix, spec_mix2) > 0.999  # deterministic
    assert ssim(spec_mix, spec_voc) < 0.95  # different content differs

    wave = render_waveform(mix)
    assert wave.shape == (128, 1024) and wave.max() == 255

    png_path = str(tmp_path / "spec.png")
    write_png(png_path, spec_mix)
    with open(png_path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(png_path) > 1000


def test_time_correction_recovers_vocal_under_drift():
    """time_correction beats naive subtraction on a slowly drifting
    instrumental (ref: spec_utils.time_correction:1134-1243 semantics)."""
    from audio_separator_tpu.ops.align import time_correction

    sr = 8000
    rng = np.random.default_rng(7)
    n = sr * 2
    t = np.arange(n) / sr
    # High-frequency carrier with a slow random envelope: a ±25-sample drift
    # fully decorrelates it (period 10 samples), so naive subtraction fails
    # while windowed re-alignment can re-lock.
    env = np.convolve(rng.standard_normal(n), np.ones(400) / 400, mode="same")
    instrumental = env * np.sin(2 * np.pi * 800 * t)
    instrumental /= np.abs(instrumental).max()
    vocal = 0.2 * np.sin(2 * np.pi * 330 * t) * (np.sin(2 * np.pi * 0.7 * t) > 0)
    mix = instrumental + vocal

    # Instrumental as rendered elsewhere: drifts ±25 samples over the track.
    drift = np.linspace(-25.0, 25.0, n)
    drifted = np.interp(np.clip(np.arange(n) + drift, 0, n - 1),
                        np.arange(n), instrumental)

    naive = mix - drifted
    corrected = time_correction(mix, drifted, align_window=(0.08, 0.12, 0.25),
                                sample_rate=sr)
    err_naive = np.abs(naive - vocal).mean()
    err_tc = np.abs(corrected - vocal).mean()
    assert err_tc < 0.5 * err_naive, (err_tc, err_naive)


def test_time_correction_stereo_shapes_and_db_scan():
    from audio_separator_tpu.ops.align import time_correction

    sr = 4000
    rng = np.random.default_rng(1)
    n = sr  # 1 s
    inst = rng.standard_normal((2, n)) * 0.5
    mix = inst * 10 ** (3 / 20) + 0.05 * rng.standard_normal((2, n))
    out = time_correction(mix, inst, align_window=(0.1,),
                          db_analysis=(0.0, (0.0, 3.0, 6.0)), sample_rate=sr)
    assert out.shape == mix.shape
    # The +3 dB candidate should be chosen → residual well below mix level.
    assert np.abs(out).mean() < 0.5 * np.abs(mix).mean()
