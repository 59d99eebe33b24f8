"""RoFormer JAX implementation + converter parity vs a torch oracle with
checkpoint-identical state_dict layout."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audio_separator_tpu.models.convert import convert_roformer
from audio_separator_tpu.models.melbands import mel_band_membership
from audio_separator_tpu.models.roformer import (
    RoformerConfig,
    apply_roformer,
    band_layout,
)

from torch_oracles.roformer_oracle import RoformerOracle


def _bs_config():
    return RoformerConfig(
        kind="bs", dim=64, depth=2, stereo=True, num_stems=2,
        time_transformer_depth=1, freq_transformer_depth=1,
        freqs_per_bands=(2, 2, 4, 8, 16, 32, 64, 129),
        dim_head=16, heads=4, stft_n_fft=512, stft_hop_length=128,
        stft_win_length=512, mask_estimator_depth=2,
    )


def _bs_linear_config():
    """BS variant with a LinearAttention pre-stage per depth
    (ref: bs_roformer.py:376-377, linear_transformer_depth > 0)."""
    return RoformerConfig(
        kind="bs", dim=64, depth=2, stereo=True, num_stems=1,
        time_transformer_depth=1, freq_transformer_depth=1,
        linear_transformer_depth=1,
        freqs_per_bands=(2, 2, 4, 8, 16, 32, 64, 129),
        dim_head=16, heads=4, stft_n_fft=512, stft_hop_length=128,
        stft_win_length=512, mask_estimator_depth=2,
    )


def _mel_config():
    return RoformerConfig(
        kind="mel", dim=48, depth=2, stereo=True, num_stems=1,
        time_transformer_depth=1, freq_transformer_depth=1,
        num_bands=24, sample_rate=44100,
        dim_head=16, heads=4, stft_n_fft=512, stft_hop_length=128,
        stft_win_length=512, mask_estimator_depth=1,
    )


def _band_bins(cfg):
    if cfg.kind == "bs":
        bins, start = [], 0
        for nf in cfg.freqs_per_bands:
            bins.append(list(range(start, start + nf)))
            start += nf
        return bins
    member, _, _, _ = mel_band_membership(cfg.sample_rate, cfg.stft_n_fft, cfg.num_bands)
    return [list(np.nonzero(member[i])[0]) for i in range(cfg.num_bands)]


@pytest.mark.parametrize("cfg_fn", [_bs_config, _bs_linear_config, _mel_config],
                         ids=["bs", "bs_linear", "mel"])
def test_roformer_matches_torch_oracle(cfg_fn):
    cfg = cfg_fn()
    torch.manual_seed(0)
    oracle = RoformerOracle(
        kind=cfg.kind, band_bins=_band_bins(cfg), dim=cfg.dim, depth=cfg.depth,
        heads=cfg.heads, dim_head=cfg.dim_head, stereo=cfg.stereo,
        num_stems=cfg.num_stems, t_depth=cfg.time_transformer_depth,
        f_depth=cfg.freq_transformer_depth, n_fft=cfg.stft_n_fft,
        hop=cfg.stft_hop_length, mask_depth=cfg.mask_estimator_depth,
        mult=cfg.mlp_expansion_factor, lin_depth=cfg.linear_transformer_depth,
    ).eval()
    # Randomise weights (default inits are partly degenerate, e.g. ones).
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.2)

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = convert_roformer(sd, cfg)

    audio = np.random.default_rng(1).standard_normal((2, 2, 16384)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = oracle(torch.from_numpy(audio)).numpy()
    got = np.asarray(apply_roformer(params, cfg, jnp.asarray(audio)))

    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=3e-4 * max(scale, 1e-3), rtol=0)


def test_band_layout_bs_covers_all_bins():
    cfg = _bs_config()
    layout = band_layout(cfg)
    assert layout.n_bands == len(cfg.freqs_per_bands)
    # every feature covered exactly once
    counts = np.zeros(layout.n_feat)
    for i in range(layout.n_bands):
        counts[layout.starts[i] : layout.starts[i] + layout.in_dims[i]] += 1
    np.testing.assert_array_equal(counts, np.ones(layout.n_feat))


def test_mel_membership_properties():
    member, freq_indices, nfpb, nbpf = mel_band_membership(44100, 2048, 60)
    assert member.shape == (60, 1025)
    assert member[0, 0] and member[-1, -1]
    assert (nbpf >= 1).all()  # full coverage
    assert freq_indices.sum() == (member * np.arange(1025)[None, :]).sum()


def test_bf16_norm_switch_close_to_fp32():
    """ExecutionOptions(norm="bf16") stays within bf16 rounding of default."""
    import jax.numpy as jnp
    from audio_separator_tpu.models.init_params import init_roformer_params
    from audio_separator_tpu.models.roformer import RoformerConfig, apply_roformer
    from audio_separator_tpu.ops.exec_options import ExecutionOptions

    cfg = RoformerConfig(kind="bs", dim=32, depth=1, stereo=True, num_stems=2,
                         time_transformer_depth=1, freq_transformer_depth=1,
                         freqs_per_bands=(64, 65), dim_head=8, heads=2,
                         stft_n_fft=256, stft_hop_length=64,
                         stft_win_length=256, mask_estimator_depth=2)
    params = init_roformer_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((1, 2, 2048)).astype(np.float32))
    base = np.asarray(apply_roformer(params, cfg, audio))
    fast = np.asarray(apply_roformer(params, cfg, audio,
                                     opts=ExecutionOptions(norm="bf16")))
    scale = np.abs(base).max()
    assert np.abs(fast - base).max() < 0.02 * scale


def test_einsum_qkv_switch_matches_default():
    """ExecutionOptions(qkv="einsum") is a pure layout change — identical
    numerics, no env var or cache clearing involved."""
    import jax.numpy as jnp
    from audio_separator_tpu.models.init_params import init_roformer_params
    from audio_separator_tpu.models.roformer import RoformerConfig, apply_roformer
    from audio_separator_tpu.ops.exec_options import ExecutionOptions

    cfg = RoformerConfig(kind="bs", dim=32, depth=2, stereo=True, num_stems=2,
                         time_transformer_depth=1, freq_transformer_depth=1,
                         freqs_per_bands=(64, 65), dim_head=8, heads=2,
                         stft_n_fft=256, stft_hop_length=64,
                         stft_win_length=256, mask_estimator_depth=2)
    params = init_roformer_params(cfg, seed=1)
    rng = np.random.default_rng(2)
    audio = jnp.asarray(rng.standard_normal((1, 2, 2048)).astype(np.float32))
    base = np.asarray(apply_roformer(params, cfg, audio,
                                     opts=ExecutionOptions(qkv="matmul")))
    alt = np.asarray(apply_roformer(params, cfg, audio,
                                    opts=ExecutionOptions(qkv="einsum")))
    np.testing.assert_allclose(alt, base, atol=1e-5)


def test_per_call_stft_impl_and_seq_pad_zero():
    """ExecutionOptions(stft=..., seq_pad=0) per call: the matmul-DFT backend
    must actually be selected (not silently the import-time default) and the
    old AUDSEP_SEQ_PAD=0 'use the default granularity' contract must not
    divide by zero."""
    import jax.numpy as jnp
    from audio_separator_tpu.models.init_params import init_roformer_params
    from audio_separator_tpu.models.roformer import RoformerConfig, apply_roformer
    from audio_separator_tpu.ops.exec_options import ExecutionOptions

    cfg = RoformerConfig(kind="bs", dim=32, depth=1, stereo=True, num_stems=2,
                         time_transformer_depth=1, freq_transformer_depth=1,
                         freqs_per_bands=(64, 65), dim_head=8, heads=2,
                         stft_n_fft=256, stft_hop_length=64,
                         stft_win_length=256, mask_estimator_depth=1)
    params = init_roformer_params(cfg, seed=3)
    rng = np.random.default_rng(4)
    audio = jnp.asarray(rng.standard_normal((1, 2, 2048)).astype(np.float32))
    base = np.asarray(apply_roformer(params, cfg, audio,
                                     opts=ExecutionOptions(stft="fft")))
    alt = np.asarray(apply_roformer(
        params, cfg, audio, opts=ExecutionOptions(stft="matmul", seq_pad=0)))
    scale = np.abs(base).max()
    # Different rfft backends: tiny numerical differences expected, identical
    # otherwise. (Identical-to-the-bit would mean the option was ignored on
    # backends where fft and the DFT matmul round differently — don't assert
    # that; shape+closeness is the observable contract.)
    assert alt.shape == base.shape
    np.testing.assert_allclose(alt, base, atol=5e-4 * max(scale, 1e-3))
