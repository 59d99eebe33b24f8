"""Polyphase resampler parity: JAX conv path vs scipy.signal.resample_poly."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from audio_separator_tpu.ops.resample import (
    change_pitch_semitones_np,
    resample_jax,
    resample_poly_np,
)


@pytest.mark.parametrize(
    "orig,new",
    [(44100, 32000), (44100, 22050), (22050, 44100), (44100, 48000), (7350, 44100)],
)
def test_resample_jax_matches_scipy(orig, new):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 22050)).astype(np.float32)
    ref = resample_poly_np(x, orig, new)
    got = np.asarray(resample_jax(jnp.asarray(x), orig, new))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_resample_preserves_sine():
    sr, new_sr = 44100, 32000
    t = np.arange(sr, dtype=np.float32) / sr
    x = np.sin(2 * np.pi * 440.0 * t)[None]
    y = np.asarray(resample_jax(jnp.asarray(x), sr, new_sr))
    t2 = np.arange(y.shape[-1], dtype=np.float32) / new_sr
    expected = np.sin(2 * np.pi * 440.0 * t2)[None]
    # Ignore filter edge transients.
    err = np.abs(y[:, 500:-500] - expected[:, 500:-500]).max()
    assert err < 1e-3


def test_pitch_shift_round():
    x = np.random.default_rng(1).standard_normal((2, 44100)).astype(np.float32)
    shifted, rate = change_pitch_semitones_np(x, 44100, 2.0)
    assert rate == int(round(44100 / 2 ** (2 / 12)))
    assert abs(shifted.shape[-1] - x.shape[-1] * rate / 44100) <= 2
