"""HDemucs (Demucs v3) parity + Wiener filtering tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_separator_tpu.models.filtering import wiener
from audio_separator_tpu.models.htdemucs import HTDemucsConfig, apply_hdemucs

from torch_oracles.htdemucs_oracle import HDemucsOracle


def _tree(sd):
    tree = {}
    for key, value in sd.items():
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value.numpy()
    return tree


def test_hdemucs_forward_parity():
    torch.manual_seed(3)
    sources = ("drums", "bass", "other", "vocals")
    oracle = HDemucsOracle(sources, channels=8, nfft=256, depth=4,
                           norm_starts=2, dconv_lstm=2, dconv_attn=2,
                           segment=0.5).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
    cfg = HTDemucsConfig(
        sources=sources, arch="hdemucs", channels=8, nfft=256, depth=4,
        norm_starts=2, segment=0.5, use_train_segment=False, cac=True,
    )
    params = jax.device_put(_tree(oracle.state_dict()))

    length = 22050  # 0.5 s
    mix = (np.random.default_rng(5).standard_normal((1, 2, length)) * 0.2).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(mix)).numpy()
    got = np.asarray(apply_hdemucs(params, cfg, jnp.asarray(mix)))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    # LSTM/attention chains accumulate fp32 reassociation noise; require
    # sub-1% agreement plus near-perfect correlation.
    np.testing.assert_allclose(got, ref, atol=8e-3 * max(scale, 1e-3), rtol=0)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99999, corr


def test_wiener_zero_iterations_is_mag_times_phase():
    rng = np.random.default_rng(0)
    t, f, c, s = 10, 17, 2, 3
    mags = np.abs(rng.standard_normal((t, f, c, s))).astype(np.float32)
    mix = (rng.standard_normal((t, f, c)) + 1j * rng.standard_normal((t, f, c))).astype(np.complex64)
    y = np.asarray(wiener(jnp.asarray(mags), jnp.asarray(mix), iterations=0))
    phase = mix / np.maximum(np.abs(mix), 1e-12)
    np.testing.assert_allclose(y, mags * phase[..., None], atol=1e-5)
    # magnitudes preserved
    np.testing.assert_allclose(np.abs(y), mags, atol=1e-5)


def test_wiener_residual_sums_to_mix():
    rng = np.random.default_rng(1)
    t, f, c, s = 8, 9, 2, 2
    mags = np.abs(rng.standard_normal((t, f, c, s))).astype(np.float32)
    mix = (rng.standard_normal((t, f, c)) + 1j * rng.standard_normal((t, f, c))).astype(np.complex64)
    y = np.asarray(wiener(jnp.asarray(mags), jnp.asarray(mix), iterations=0,
                          residual=True))
    np.testing.assert_allclose(y.sum(axis=-1), mix, atol=1e-5)


def test_wiener_em_improves_spatial_separation():
    """Two sources panned hard left/right: EM should recover the panning
    (channel separation) better than plain mag×phase."""
    rng = np.random.default_rng(2)
    t, f = 40, 33
    s1 = (rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f))).astype(np.complex64)
    s2 = (rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f))).astype(np.complex64)
    # source 1 left-only, source 2 right-only
    src1 = np.stack([s1, 0.05 * s1], axis=-1)
    src2 = np.stack([0.05 * s2, s2], axis=-1)
    mix = src1 + src2
    mags = np.stack([np.abs(s1)[..., None] * np.array([1.0, 0.05]),
                     np.abs(s2)[..., None] * np.array([0.05, 1.0])], axis=-1
                    ).astype(np.float32)  # (t, f, c, s)

    y0 = np.asarray(wiener(jnp.asarray(mags), jnp.asarray(mix), iterations=0))
    y2 = np.asarray(wiener(jnp.asarray(mags), jnp.asarray(mix), iterations=2))

    def err(y):
        return (np.abs(y[..., 0] - src1).mean() + np.abs(y[..., 1] - src2).mean())

    assert np.isfinite(y2).all()
    assert err(y2) < err(y0)


def test_wiener_passes_raw_negative_head_values_through():
    """The reference feeds the decoder head's RAW (possibly negative) values
    into the ratio mask / Wiener init (hdemucs._mask:640-646) — a negative
    value flips the mixture phase at that bin. iterations=0 must preserve
    the sign rather than rectify it."""
    rng = np.random.default_rng(7)
    t, f, c, s = 8, 9, 2, 2
    raw = rng.standard_normal((t, f, c, s)).astype(np.float32)  # signed!
    mix = (rng.standard_normal((t, f, c))
           + 1j * rng.standard_normal((t, f, c))).astype(np.complex64)
    y = np.asarray(wiener(jnp.asarray(raw), jnp.asarray(mix), iterations=0))
    phase = mix / np.maximum(np.abs(mix), 1e-12)
    np.testing.assert_allclose(y, raw * phase[..., None], atol=1e-5)


def test_hdemucs_magnitude_head_parity():
    """cac=False parity: magnitude-head input, raw decoder output through the
    zero-iteration Wiener (= raw * mixture phase), vs the torch oracle."""
    torch.manual_seed(4)
    sources = ("drums", "bass", "other", "vocals")
    oracle = HDemucsOracle(sources, channels=8, nfft=256, depth=4,
                           norm_starts=2, dconv_lstm=2, dconv_attn=2,
                           segment=0.5, cac=False).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
    params = jax.device_put(_tree(oracle.state_dict()))
    cfg = HTDemucsConfig(
        sources=sources, arch="hdemucs", channels=8, nfft=256, depth=4,
        norm_starts=2, segment=0.5, use_train_segment=False, cac=False,
        wiener_iters=0,
    )
    mix = (np.random.default_rng(8).standard_normal((1, 2, 22050)) * 0.2
           ).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(mix)).numpy()
    got = np.asarray(apply_hdemucs(params, cfg, jnp.asarray(mix)))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=8e-3 * max(scale, 1e-3), rtol=0)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999, corr
