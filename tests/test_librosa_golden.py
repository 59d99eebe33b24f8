"""Pin the oracle pipeline's librosa stft/istft shim to an independently
derived golden (tests/goldens/gen_librosa_transform.py: explicit O(N^2) DFT
sums from librosa 0.10's documented equations, no np.fft, no shared code) —
eliminating the shim-mirrors-ops failure mode from the VR/MDX parity
argument (the shim was the one non-reference link in that chain)."""

import os

import numpy as np
import pytest

from ref_pipeline import _librosa_istft, _librosa_stft

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "goldens", "librosa_transform.npz")
GEOMETRIES = [(256, 64), (128, 48)]


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.mark.parametrize("n_fft,hop", GEOMETRIES)
def test_shim_stft_matches_independent_dft(golden, n_fft, hop):
    got = _librosa_stft(golden["y"], n_fft=n_fft, hop_length=hop)
    want = golden[f"stft_{n_fft}_{hop}"]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-9 * np.abs(want).max())


@pytest.mark.parametrize("n_fft,hop", GEOMETRIES)
def test_shim_istft_matches_independent_ola(golden, n_fft, hop):
    spec = golden[f"stft_{n_fft}_{hop}"] * golden[f"mask_{n_fft}_{hop}"]
    got = _librosa_istft(spec, hop_length=hop, n_fft=n_fft)
    want = golden[f"istft_{n_fft}_{hop}"]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-9 * np.abs(want).max())
