"""TFC-TDF v3 parity vs torch oracle + MDXC unfold-path end-to-end."""

import logging
import os

import numpy as np
import pytest
import torch

import jax

from audio_separator_tpu.models.convert import tree_from_state_dict
from audio_separator_tpu.models.tfc_tdf import (
    TFCTDFConfig,
    apply_tfc_tdf_spec,
    build_tfc_tdf_config,
)

from torch_oracles.tfc_tdf_oracle import TFCTDFNetOracle


def _make(norm_type="InstanceNorm", num_stems=2, seed=0):
    torch.manual_seed(seed)
    oracle = TFCTDFNetOracle(num_subbands=2, num_scales=2, scale=(2, 2), l=1,
                             c=8, g=8, bn=2, dim_f=64, num_stems=num_stems,
                             norm_type=norm_type).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
    cfg = TFCTDFConfig(
        num_subbands=2, num_scales=2, scale=(2, 2), num_blocks_per_scale=1,
        num_channels=8, growth=8, bottleneck_factor=2, norm=norm_type,
        act="gelu", dim_f=64, n_fft=256, hop_length=64, num_stems=num_stems,
    )
    params = jax.device_put(tree_from_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()}))
    return oracle, cfg, params


@pytest.mark.parametrize("norm_type", ["InstanceNorm", "BatchNorm", "GroupNorm4"])
def test_tfc_tdf_body_parity(norm_type):
    oracle, cfg, params = _make(norm_type)
    spec = np.random.default_rng(0).standard_normal((2, 4, 64, 16)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(spec)).numpy()
    got = np.asarray(apply_tfc_tdf_spec(params, cfg, spec))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-4)


def test_mdxc_tfc_tdf_end_to_end(fixtures_dir, tmp_path):
    """MDX23C path through MDXCSeparator: unfold chunking + uniform overlap."""
    from audio_separator_tpu.architectures.mdxc import MDXCSeparator

    oracle, cfg, params = _make(num_stems=2, seed=1)
    ckpt = str(tmp_path / "MDX23C-test.ckpt")
    torch.save(oracle.state_dict(), ckpt)

    model_data = {
        "audio": {"num_channels": 2, "sample_rate": 44100, "n_fft": 256,
                  "hop_length": 64, "dim_f": 64, "dim_t": 64},
        "model": {"num_subbands": 2, "num_scales": 2, "scale": [2, 2],
                  "num_blocks_per_scale": 1, "num_channels": 8, "growth": 8,
                  "bottleneck_factor": 2, "norm": "InstanceNorm", "act": "gelu"},
        "training": {"instruments": ["vocals", "other"], "target_instrument": None},
        "inference": {"dim_t": 64, "batch_size": 2},
    }
    out_dir = str(tmp_path / "out")
    common = {
        "logger": logging.getLogger("test"),
        "model_name": "MDX23C-test",
        "model_path": ckpt,
        "model_data": model_data,
        "output_dir": out_dir,
        "output_format": "WAV",
        "normalization_threshold": 0.9,
        "amplification_threshold": 0.0,
        "sample_rate": 44100,
    }
    arch = {"segment_size": 64, "override_model_segment_size": False,
            "batch_size": 2, "overlap": 2, "pitch_shift": 0}
    sep = MDXCSeparator(common_config=common, arch_config=arch)
    assert not sep.is_roformer
    assert sep.primary_stem_name == "vocals"

    input_path = os.path.join(fixtures_dir, "mardy20s.flac")
    from audio_separator_tpu.io import audio as audio_io

    pcm, sr = audio_io.load_audio(input_path, sample_rate=44100)
    short = str(tmp_path / "short.wav")
    audio_io.save_audio(short, pcm[:, : sr * 2], sr)

    outputs = sep.separate(short)
    assert len(outputs) == 2
    for p in outputs:
        assert os.path.exists(os.path.join(out_dir, p))
