"""Parity of the JAX models against the reference's OWN forward code.

Round-1 parity was proven only against builder-written torch oracles
(tests/torch_oracles/*), which can drift together with the JAX port — it
happened for the HDemucs magnitude head. These tests import the actual
reference modules (ref: uvr_lib_v5/roformer/{bs_roformer,mel_band_roformer}.py,
uvr_lib_v5/demucs/htdemucs.py) through tests/ref_shims.py and diff the JAX
forward against them with checkpoint-identical weights.

Caveat noted for the record: the mel-band test's band membership comes from
our own mel_filter_bank through the librosa shim (librosa itself is absent),
so band *definitions* are only as independent as the slaney-parity test in
test_roformer.py; the band-split/attention/mask numerics are still diffed
against the reference's real code.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_separator_tpu.models.convert import convert_roformer
from audio_separator_tpu.models.roformer import RoformerConfig, apply_roformer

from ref_shims import load_ref_module


def _torch_tree(sd):
    tree = {}
    for key, value in sd.items():
        node = tree
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value.detach().numpy()
    return tree


def _randomize(model, seed=0, scale=0.2):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * scale)


class _UpstreamScaledAttend(torch.nn.Module):
    """Upstream-semantics Attend for the linear-attention test case: accepts
    the fixed `scale` the reference's vendored Attend rejects."""

    def __init__(self, scale=None, dropout=0.0, flash=False):
        super().__init__()
        self.scale = scale

    def forward(self, q, k, v):
        scale = self.scale if self.scale is not None else q.shape[-1] ** -0.5
        sim = torch.einsum("b h i d, b h j d -> b h i j", q, k) * scale
        return torch.einsum("b h i j, b h j d -> b h i d", sim.softmax(-1), v)


# ---------------------------------------------------------------------------
# RoFormer family vs ref bs_roformer.py / mel_band_roformer.py
# ---------------------------------------------------------------------------

def _roformer_cases():
    return [
        pytest.param(dict(kind="bs", dim=64, depth=2, stereo=True, num_stems=2,
                          time_transformer_depth=1, freq_transformer_depth=1,
                          freqs_per_bands=(2, 2, 4, 8, 16, 32, 64, 129),
                          dim_head=16, heads=4, stft_n_fft=512,
                          stft_hop_length=128, stft_win_length=512,
                          mask_estimator_depth=2), id="bs"),
        pytest.param(dict(kind="bs", dim=64, depth=2, stereo=True, num_stems=1,
                          time_transformer_depth=1, freq_transformer_depth=1,
                          linear_transformer_depth=1,
                          freqs_per_bands=(2, 2, 4, 8, 16, 32, 64, 129),
                          dim_head=16, heads=4, stft_n_fft=512,
                          stft_hop_length=128, stft_win_length=512,
                          mask_estimator_depth=2), id="bs_linear"),
        pytest.param(dict(kind="mel", dim=48, depth=2, stereo=True, num_stems=1,
                          time_transformer_depth=1, freq_transformer_depth=1,
                          num_bands=24, sample_rate=44100, dim_head=16,
                          heads=4, stft_n_fft=512, stft_hop_length=128,
                          stft_win_length=512, mask_estimator_depth=1), id="mel"),
    ]


@pytest.mark.parametrize("cfg_kwargs", _roformer_cases())
def test_roformer_matches_reference_forward(cfg_kwargs):
    cfg = RoformerConfig(**cfg_kwargs)
    common = dict(
        dim=cfg.dim, depth=cfg.depth, stereo=cfg.stereo,
        num_stems=cfg.num_stems,
        time_transformer_depth=cfg.time_transformer_depth,
        freq_transformer_depth=cfg.freq_transformer_depth,
        dim_head=cfg.dim_head, heads=cfg.heads,
        attn_dropout=0.0, ff_dropout=0.0, flash_attn=False,
        stft_n_fft=cfg.stft_n_fft, stft_hop_length=cfg.stft_hop_length,
        stft_win_length=cfg.stft_win_length,
        mask_estimator_depth=cfg.mask_estimator_depth,
    )
    if cfg.kind == "bs":
        mod = load_ref_module("roformer.bs_roformer")
        if cfg.linear_transformer_depth:
            # The reference's vendored attend.py takes no `scale`, so its own
            # LinearAttention path raises TypeError at construction
            # (ref: bs_roformer.py:119 vs attend.py:42) — real linear-attn
            # checkpoints come from the upstream lucidrains code whose Attend
            # honours a fixed cosine-sim scale. Substitute that semantics
            # (sim = q·kᵀ · scale, softmax) so the path is testable.
            mod.Attend = _UpstreamScaledAttend
        ref = mod.BSRoformer(
            linear_transformer_depth=cfg.linear_transformer_depth,
            freqs_per_bands=cfg.freqs_per_bands, **common).eval()
    else:
        mod = load_ref_module("roformer.mel_band_roformer")
        ref = mod.MelBandRoformer(
            num_bands=cfg.num_bands, sample_rate=cfg.sample_rate,
            **common).eval()
    _randomize(ref)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_roformer(sd, cfg)

    audio = (np.random.default_rng(1).standard_normal((2, 2, 16384)) * 0.3
             ).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(audio)).numpy()
    got = np.asarray(apply_roformer(params, cfg, jnp.asarray(audio)))
    if cfg.num_stems == 1:
        got = got[:, 0]  # reference squeezes "b 1 s t -> b s t"

    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=4e-4 * max(scale, 1e-3), rtol=0)


# ---------------------------------------------------------------------------
# HTDemucs / HDemucs vs ref demucs/htdemucs.py, demucs/hdemucs.py
# ---------------------------------------------------------------------------

def test_htdemucs_matches_reference_forward():
    from audio_separator_tpu.models.htdemucs import apply_htdemucs, config_from_kwargs

    mod = load_ref_module("demucs.htdemucs")
    sources = ["drums", "bass", "other", "vocals"]
    kwargs = dict(channels=8, nfft=1024, depth=3, t_layers=3, t_heads=4,
                  segment=0.5, t_dropout=0.0)
    ref = mod.HTDemucs(sources, **kwargs).eval()
    _randomize(ref, scale=0.1)

    cfg = config_from_kwargs({"sources": sources, **kwargs})
    params = jax.device_put(_torch_tree(ref.state_dict()))

    length = cfg.training_length
    mix = (np.random.default_rng(2).standard_normal((1, 2, length)) * 0.2
           ).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mix)).numpy()
    got = np.asarray(apply_htdemucs(params, cfg, jnp.asarray(mix)))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=6e-4 * max(scale, 1e-3), rtol=0)


def test_hdemucs_matches_reference_forward():
    from audio_separator_tpu.models.htdemucs import HTDemucsConfig, apply_hdemucs

    mod = load_ref_module("demucs.hdemucs")
    sources = ["drums", "bass", "other", "vocals"]
    ref = mod.HDemucs(sources, channels=8, nfft=256, depth=4, norm_starts=2,
                      dconv_lstm=2, dconv_attn=2, segment=0.5).eval()
    _randomize(ref, seed=3, scale=0.1)

    cfg = HTDemucsConfig(sources=tuple(sources), arch="hdemucs", channels=8,
                         nfft=256, depth=4, norm_starts=2, segment=0.5,
                         use_train_segment=False, cac=True)
    params = jax.device_put(_torch_tree(ref.state_dict()))

    length = 22050  # 0.5 s
    mix = (np.random.default_rng(3).standard_normal((1, 2, length)) * 0.2
           ).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mix)).numpy()
    got = np.asarray(apply_hdemucs(params, cfg, jnp.asarray(mix)))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    # LSTM/attention chains accumulate fp32 reassociation noise (same bound
    # as the oracle test).
    np.testing.assert_allclose(got, want, atol=8e-3 * max(scale, 1e-3), rtol=0)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.99999, corr


# ---------------------------------------------------------------------------
# TFC-TDF v3 vs ref tfc_tdf_v3.py
# ---------------------------------------------------------------------------

def test_tfc_tdf_matches_reference_forward():
    """Wave-level forward (internal STFT → U-Net → iSTFT) vs the reference's
    TFC_TDF_net (ref: tfc_tdf_v3.py:151-268) with identical weights."""
    import ml_collections

    from audio_separator_tpu.models.convert import tree_from_state_dict
    from audio_separator_tpu.models.tfc_tdf import TFCTDFConfig, apply_tfc_tdf

    mod = load_ref_module("tfc_tdf_v3")
    config = ml_collections.ConfigDict({
        "audio": {"num_channels": 2, "sample_rate": 44100, "n_fft": 256,
                  "hop_length": 64, "dim_f": 64, "dim_t": 64},
        "model": {"num_subbands": 2, "num_scales": 2, "scale": [2, 2],
                  "num_blocks_per_scale": 1, "num_channels": 8, "growth": 8,
                  "bottleneck_factor": 2, "norm": "InstanceNorm", "act": "gelu"},
        "training": {"instruments": ["vocals", "other"],
                     "target_instrument": None},
    })
    ref = mod.TFC_TDF_net(config, device="cpu").eval()
    _randomize(ref, seed=4, scale=0.1)

    cfg = TFCTDFConfig(
        num_subbands=2, num_scales=2, scale=(2, 2), num_blocks_per_scale=1,
        num_channels=8, growth=8, bottleneck_factor=2, norm="InstanceNorm",
        act="gelu", dim_f=64, n_fft=256, hop_length=64, num_stems=2,
    )
    params = jax.device_put(tree_from_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}))

    # hop * (dim_t - 1) samples → exactly dim_t=64 STFT frames (the chunk
    # geometry mdxc feeds the model; frame count must divide by the scales).
    wave = (np.random.default_rng(4).standard_normal((1, 2, 64 * 63)) * 0.2
            ).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(wave)).numpy()
    got = np.asarray(apply_tfc_tdf(params, cfg, jnp.asarray(wave)))
    got = got[..., : want.shape[-1]]
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=5e-4 * max(scale, 1e-3), rtol=0)


# ---------------------------------------------------------------------------
# VR nets vs ref vr_network/{nets,nets_new}.py
# ---------------------------------------------------------------------------

def _randomize_with_buffers(model, seed=0, scale=0.1):
    """VR nets carry BatchNorm running stats — randomise those too so the
    parity check exercises the eval-mode normalisation math."""
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * scale)
        for name, b in model.named_buffers():
            if name.endswith("running_var"):
                b.copy_(torch.rand_like(b) + 0.5)
            elif name.endswith("running_mean"):
                b.copy_(torch.randn_like(b) * 0.1)
    return model


@pytest.mark.parametrize("arch", [31191, 33966])
def test_vr_cascaded_aspp_matches_reference(arch):
    """CascadedASPPNet v5 (incl. the 7-layer 33966 variant with shared
    conv6/conv7) vs ref nets.determine_model_capacity (ref: nets.py:67-178)."""
    from audio_separator_tpu.models.vr_nets import (
        predict_mask_v5, state_dict_to_tree)

    mod = load_ref_module("vr_network.nets")
    n_fft_bins = 256
    ref = _randomize_with_buffers(
        mod.determine_model_capacity(n_fft_bins, arch), seed=arch % 97).eval()
    params = jax.device_put(state_dict_to_tree(
        {k: v.numpy() for k, v in ref.state_dict().items()}))

    x = np.abs(np.random.default_rng(5).standard_normal(
        (1, 2, 129, 384))).astype(np.float32)
    with torch.no_grad():
        want = ref.predict_mask(torch.from_numpy(x)).numpy()
    got = np.asarray(predict_mask_v5(params, x, n_fft_bins, arch, offset=128))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_vr_cascaded_net_v51_matches_reference():
    """CascadedNet (VR 5.1, LSTM bottleneck) vs ref nets_new.CascadedNet
    (ref: nets_new.py:65-150)."""
    from audio_separator_tpu.models.vr_nets import (
        predict_mask_v51, state_dict_to_tree)

    mod = load_ref_module("vr_network.nets_new")
    n_fft_bins = 256
    ref = _randomize_with_buffers(
        mod.CascadedNet(n_fft_bins, nn_arch_size=123821, nout=8, nout_lstm=16),
        seed=6).eval()
    params = jax.device_put(state_dict_to_tree(
        {k: v.numpy() for k, v in ref.state_dict().items()}))

    x = np.abs(np.random.default_rng(6).standard_normal(
        (1, 2, 129, 256))).astype(np.float32)
    with torch.no_grad():
        want = ref.predict_mask(torch.from_numpy(x)).numpy()
    got = np.asarray(predict_mask_v51(params, x, n_fft_bins, offset=64))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4)
