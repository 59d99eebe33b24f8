"""Ensembler algorithm tests (ref behaviour: ensembler.py:6-156)."""

import logging

import numpy as np
import pytest

from audio_separator_tpu.separator.ensembler import ALGORITHMS, Ensembler


@pytest.fixture()
def waves():
    rng = np.random.default_rng(0)
    return [rng.standard_normal((2, 8000)).astype(np.float32) * 0.3 for _ in range(3)]


def test_single_waveform_passthrough(waves):
    out = Ensembler(algorithm="avg_wave").ensemble([waves[0]])
    np.testing.assert_array_equal(out, waves[0])


def test_avg_wave_weighted(waves):
    ens = Ensembler(algorithm="avg_wave", weights=[2.0, 1.0, 1.0])
    out = ens.ensemble(waves)
    expected = (2 * waves[0] + waves[1] + waves[2]) / 4
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_invalid_weights_fall_back_to_equal(waves):
    out_bad = Ensembler(algorithm="avg_wave", weights=[1.0, np.inf, 1.0]).ensemble(waves)
    out_eq = Ensembler(algorithm="avg_wave").ensemble(waves)
    np.testing.assert_allclose(out_bad, out_eq)


def test_median_min_max_wave(waves):
    med = Ensembler(algorithm="median_wave").ensemble(waves)
    np.testing.assert_allclose(med, np.median(np.array(waves), axis=0))
    mx = Ensembler(algorithm="max_wave").ensemble(waves)
    stacked = np.array(waves)
    np.testing.assert_allclose(np.abs(mx), np.abs(stacked).max(axis=0))
    mn = Ensembler(algorithm="min_wave").ensemble(waves)
    np.testing.assert_allclose(np.abs(mn), np.abs(stacked).min(axis=0))


@pytest.mark.parametrize("algo", ["avg_fft", "median_fft", "min_fft", "max_fft",
                                  "uvr_max_spec", "uvr_min_spec", "ensemble_wav"])
def test_spectral_and_wav_algorithms_shape(algo, waves):
    out = Ensembler(algorithm=algo).ensemble(waves)
    assert out.shape[0] == 2
    assert abs(out.shape[1] - waves[0].shape[1]) <= 2048
    assert np.isfinite(out).all()


def test_identical_inputs_are_fixed_point(waves):
    """Averaging identical inputs must return the input for every algorithm."""
    same = [waves[0].copy() for _ in range(3)]
    for algo in ("avg_wave", "median_wave", "min_wave", "max_wave"):
        out = Ensembler(algorithm=algo).ensemble(same)
        np.testing.assert_allclose(out, waves[0], atol=1e-6)
    out = Ensembler(algorithm="avg_fft").ensemble(same)
    n = out.shape[1]
    np.testing.assert_allclose(out[:, :n], waves[0][:, :n], atol=1e-3)


def test_mismatched_lengths_padded(waves):
    short = waves[1][:, :4000]
    out = Ensembler(algorithm="avg_wave").ensemble([waves[0], short])
    assert out.shape[1] == waves[0].shape[1]


def test_mismatched_channels_rejected(waves):
    with pytest.raises(ValueError):
        Ensembler(algorithm="avg_wave").ensemble([waves[0], waves[1][:1]])


def test_unknown_algorithm(waves):
    with pytest.raises(ValueError):
        Ensembler(algorithm="bogus").ensemble(waves)


def test_all_algorithms_registered():
    assert set(ALGORITHMS) == {
        "avg_wave", "median_wave", "min_wave", "max_wave", "avg_fft",
        "median_fft", "min_fft", "max_fft", "uvr_max_spec", "uvr_min_spec",
        "ensemble_wav"}


def test_ensemble_wav_stereo_picks_quietest_per_segment():
    """ensemble_wav must split along time, not channels (a (2, L) input used
    to splice whole channels and average empty segments)."""
    from audio_separator_tpu.separator.ensembler import Ensembler

    L = 4800
    loud = np.ones((2, L), np.float32)
    quiet = np.full((2, L), 0.1, np.float32)
    # make `loud` quieter in the second half
    loud[:, L // 2:] = 0.01

    out = Ensembler(logging.getLogger("t"), "ensemble_wav").ensemble([loud, quiet])
    assert out.shape == (2, L)
    # first half: quiet model wins (0.1 < 1.0); second half: loud model (0.01)
    assert np.allclose(out[:, : L // 4], 0.1)
    assert np.allclose(out[:, -L // 4 :], 0.01)
