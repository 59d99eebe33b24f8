"""STFT/iSTFT parity vs torch.stft/istft (the reference's transform backbone).

Parity target: sub-0.1dB SDR requires the transform itself to match torch to
~1e-5 relative error (ref semantics: uvr_lib_v5/stft.py, roformer internal
stft, demucs/spec.py).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audio_separator_tpu.ops import stft as jstft


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize(
    "n_fft,hop,length",
    [(2048, 512, 44100), (4096, 1024, 44100), (6144, 1024, 130560), (1024, 256, 8192)],
)
def test_stft_matches_torch(n_fft, hop, length):
    x = _rand((2, length))
    win_t = torch.hann_window(n_fft, periodic=True)
    ref = torch.stft(
        torch.from_numpy(x), n_fft=n_fft, hop_length=hop, window=win_t,
        center=True, return_complex=True,
    ).numpy()

    win_j = jstft.hann_window(n_fft)
    got = np.asarray(jstft.stft(jnp.asarray(x), n_fft, hop, win_j))

    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale, rtol=0)


@pytest.mark.parametrize("n_fft,hop", [(2048, 512), (4096, 1024), (6144, 1024)])
def test_istft_matches_torch(n_fft, hop):
    frames = 64
    f = n_fft // 2 + 1
    rng = np.random.default_rng(1)
    spec = (rng.standard_normal((2, f, frames)) + 1j * rng.standard_normal((2, f, frames))).astype(np.complex64)

    win_t = torch.hann_window(n_fft, periodic=True)
    ref = torch.istft(
        torch.from_numpy(spec), n_fft=n_fft, hop_length=hop, window=win_t, center=True
    ).numpy()

    win_j = jstft.hann_window(n_fft)
    got = np.asarray(jstft.istft(jnp.asarray(spec), n_fft, hop, win_j))

    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=5e-4 * scale, rtol=0)


def test_roundtrip_reconstruction():
    x = _rand((2, 44100), seed=2)
    n_fft, hop = 2048, 512
    win = jstft.hann_window(n_fft)
    spec = jstft.stft(jnp.asarray(x), n_fft, hop, win)
    y = np.asarray(jstft.istft(spec, n_fft, hop, win, length=44100))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_packed_stft_matches_reference_layout():
    """MDX packed layout: (B, C*2, dim_f, T) with [re, im] per channel.

    Mirrors uvr_lib_v5/stft.py:41-57 reshape semantics.
    """
    n_fft, hop, dim_f = 2048, 512, 2048 // 2
    x = _rand((3, 2, 16384), seed=3)
    win_t = torch.hann_window(n_fft, periodic=True)

    xt = torch.from_numpy(x).reshape(-1, 16384)
    ref = torch.stft(xt, n_fft=n_fft, hop_length=hop, window=win_t, center=True, return_complex=False)
    ref = ref.permute(0, 3, 1, 2).reshape(3, 2, 2, -1, ref.shape[2]).reshape(3, 4, -1, ref.shape[2])
    ref = ref[..., :dim_f, :].numpy()

    win_j = jstft.hann_window(n_fft)
    got = np.asarray(jstft.stft_real_packed(jnp.asarray(x), n_fft, hop, win_j, dim_f))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale, rtol=0)


def test_packed_istft_roundtrip():
    n_fft, hop, dim_f = 2048, 512, 1024
    x = _rand((1, 2, 16384), seed=4)
    win = jstft.hann_window(n_fft)
    packed = jstft.stft_real_packed(jnp.asarray(x), n_fft, hop, win, dim_f)
    y = np.asarray(jstft.istft_real_packed(packed, n_fft, hop, win))
    # dim_f crop discards top bins → inexact roundtrip; compare against torch
    # performing the identical crop+pad+inverse.
    win_t = torch.hann_window(n_fft, periodic=True)
    xt = torch.from_numpy(x).reshape(-1, 16384)
    spec = torch.stft(xt, n_fft=n_fft, hop_length=hop, window=win_t, center=True, return_complex=True)
    spec[:, dim_f:, :] = 0
    ref = torch.istft(spec, n_fft=n_fft, hop_length=hop, window=win_t, center=True)
    ref = ref.reshape(1, 2, -1).numpy()
    np.testing.assert_allclose(y[..., : ref.shape[-1]], ref, atol=5e-4)


def test_matmul_dft_matches_fft(monkeypatch):
    """ExecutionOptions(stft="matmul") evaluates the same transform on the MXU
    (process-level switch: DEFAULT_EXEC is parsed once at import, so tests
    swap the module attribute rather than the environment)."""
    import numpy as np

    from audio_separator_tpu.ops import exec_options, stft as stft_mod

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    win = stft_mod.hann_window(1024)

    spec_fft = np.asarray(stft_mod.stft(jnp.asarray(x), 1024, 256, win))
    monkeypatch.setattr(exec_options, "DEFAULT_EXEC",
                        exec_options.ExecutionOptions(stft="matmul"))
    stft_mod.stft.clear_cache()
    stft_mod.istft.clear_cache()
    try:
        spec_mm = np.asarray(stft_mod.stft(jnp.asarray(x), 1024, 256, win))
        np.testing.assert_allclose(spec_mm, spec_fft, atol=2e-4)
        y = np.asarray(stft_mod.istft(jnp.asarray(spec_mm), 1024, 256, win))
        np.testing.assert_allclose(y, x[:, : y.shape[-1]], atol=2e-4)
    finally:
        stft_mod.stft.clear_cache()
        stft_mod.istft.clear_cache()


def test_complex_link_helpers_roundtrip():
    """fetch_complex/put_complex must be exact and never expose a complex
    dtype to the transfer layer (the axon TPU runtime rejects complex64 in
    both directions — tools/tpu_op_probe.py)."""
    import jax
    import jax.numpy as jnp

    from audio_separator_tpu.ops.stft import fetch_complex, put_complex

    rng = np.random.default_rng(7)
    host = (rng.standard_normal((3, 65, 17))
            + 1j * rng.standard_normal((3, 65, 17))).astype(np.complex64)

    dev = put_complex(host)
    assert dev.dtype == jnp.complex64
    back = fetch_complex(dev)
    assert back.dtype == np.complex64
    np.testing.assert_array_equal(back, host)

    # non-contiguous host views (e.g. a transposed spectrogram) upload too
    view = host.transpose(0, 2, 1)
    np.testing.assert_array_equal(fetch_complex(put_complex(view)), view)

    # fetch of a freshly computed device array
    spec = jax.jit(lambda v: jax.lax.complex(v, -2.0 * v))(
        jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32)))
    got = fetch_complex(spec)
    np.testing.assert_allclose(got.real, -got.imag / 2.0, rtol=1e-6)


def test_link_quant_transfers():
    """AUDSEP_LINK_QUANT=int16/int8 transfers dequantise to the documented
    SNR (matching ops/demix's quantiser constants) and stay off by default."""
    import jax.numpy as jnp

    from audio_separator_tpu.ops.stft import (
        fetch_complex, fetch_real, istft, put_complex, put_real, stft,
        hann_window)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3001)).astype(np.float32)

    def snr(ref, got):
        return 10 * np.log10(np.sum(ref ** 2) / (np.sum((ref - got) ** 2) + 1e-30))

    # explicit quant arg (env-independent)
    for mode, floor in (("int16", 80.0), ("int8", 38.0)):
        got = fetch_real(put_real(x, quant=mode), quant="")
        assert snr(x, got) > floor, (mode, snr(x, got))

    # default mode is off: bit-exact
    np.testing.assert_array_equal(fetch_real(put_real(x)), x)

    # complex spec round trip through the quantised link, then back to audio
    win = hann_window(256)
    spec = stft(jnp.asarray(x), 256, 64, win)
    host_spec = fetch_complex(spec, quant="int16")
    y = fetch_real(istft(put_complex(host_spec, quant="int16"), 256, 64, win,
                         length=x.shape[-1]), quant="")
    assert snr(x, y) > 75.0, snr(x, y)

    # env knob routes every helper (monkeypatch-free: set and restore)
    import os

    old = os.environ.get("AUDSEP_LINK_QUANT")
    os.environ["AUDSEP_LINK_QUANT"] = "int16"
    try:
        dev = put_real(x)
        assert snr(x, np.asarray(dev)) > 80.0
        assert not np.array_equal(np.asarray(dev), x)  # actually quantised
    finally:
        if old is None:
            del os.environ["AUDSEP_LINK_QUANT"]
        else:
            os.environ["AUDSEP_LINK_QUANT"] = old


def test_link_quant_platform_default(monkeypatch):
    """Unset, the link policy defaults to int16 on TPU backends and off
    elsewhere (LINK_QUANT_SDR.json is the measured basis); an explicit
    ``off`` wins everywhere."""
    import jax

    from audio_separator_tpu.ops import stft

    monkeypatch.delenv("AUDSEP_LINK_QUANT", raising=False)
    monkeypatch.setattr(stft, "_platform_default", None)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert stft.link_quant_mode() == "int16"

    monkeypatch.setattr(stft, "_platform_default", None)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert stft.link_quant_mode() == ""

    monkeypatch.setattr(stft, "_platform_default", None)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("AUDSEP_LINK_QUANT", "off")
    assert stft.link_quant_mode() == ""
    monkeypatch.setenv("AUDSEP_LINK_QUANT", "int8")
    assert stft.link_quant_mode() == "int8"
