"""Facade-level ensemble separation with two local synthetic models
(ref: separator.py:1242-1412 _separate_ensemble; exercises local-model
loading, per-model separation, stem-name grouping and the ensemble combine).
"""

import logging
import os

import numpy as np
import pytest
import torch
import yaml

from audio_separator_tpu.io import audio as audio_io
from audio_separator_tpu.models.melbands import mel_band_membership

from torch_oracles.roformer_oracle import RoformerOracle

SR = 44100
N_FFT, HOP = 512, 128
DIM_T = 64
NUM_BANDS = 24


def _make_model(dirpath: str, name: str, seed: int) -> str:
    torch.manual_seed(seed)
    member, _, _, _ = mel_band_membership(SR, N_FFT, NUM_BANDS)
    band_bins = [list(np.nonzero(member[i])[0]) for i in range(NUM_BANDS)]
    oracle = RoformerOracle(
        kind="mel", band_bins=band_bins, dim=32, depth=1, heads=4, dim_head=8,
        stereo=True, num_stems=1, t_depth=1, f_depth=1, n_fft=N_FFT, hop=HOP,
        mask_depth=1,
    ).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
    ckpt = os.path.join(dirpath, f"{name}_mel_band_roformer.ckpt")
    torch.save({"state_dict": oracle.state_dict()}, ckpt)
    config = {
        "audio": {"sample_rate": SR, "hop_length": HOP},
        "model": {
            "dim": 32, "depth": 1, "stereo": True, "num_stems": 1,
            "time_transformer_depth": 1, "freq_transformer_depth": 1,
            "num_bands": NUM_BANDS, "dim_head": 8, "heads": 4,
            "stft_n_fft": N_FFT, "stft_hop_length": HOP, "stft_win_length": N_FFT,
            "mask_estimator_depth": 1, "sample_rate": SR,
        },
        "training": {"instruments": ["vocals", "other"], "target_instrument": "vocals"},
        "inference": {"dim_t": DIM_T, "batch_size": 2},
    }
    with open(os.path.splitext(ckpt)[0] + ".yaml", "w") as f:
        yaml.safe_dump(config, f)
    return os.path.basename(ckpt)


def test_ensemble_two_local_models_end_to_end(tmp_path):
    from audio_separator_tpu.separator import Separator

    model_dir = str(tmp_path / "models")
    os.makedirs(model_dir)
    m1 = _make_model(model_dir, "alpha", seed=1)
    m2 = _make_model(model_dir, "beta", seed=2)

    # 2 s stereo test signal
    t = np.arange(SR * 2) / SR
    mix = np.stack([np.sin(2 * np.pi * 440 * t),
                    np.sin(2 * np.pi * 330 * t)]).astype(np.float32) * 0.3
    in_path = str(tmp_path / "mix.wav")
    audio_io.save_audio(in_path, mix, SR)

    out_dir = str(tmp_path / "out")
    sep = Separator(
        log_level=logging.WARNING,
        model_file_dir=model_dir,
        output_dir=out_dir,
        output_format="WAV",
        ensemble_algorithm="avg_wave",
    )
    sep.load_model([m1, m2])
    outputs = sep.separate(in_path)

    assert len(outputs) == 2
    full = [os.path.join(out_dir, os.path.basename(p)) if not os.path.isabs(p) else p
            for p in outputs]
    for p in full:
        assert os.path.exists(p), p
    names = " ".join(outputs).lower()
    assert "vocals" in names and ("instrumental" in names or "other" in names)

    # ensemble = average: the vocals output must lie between (or equal) the
    # per-model outputs in energy, and be finite full-length audio
    voc = [p for p in full if "vocal" in p.lower()][0]
    pcm, sr = audio_io.load_audio(voc)
    assert sr == SR and np.isfinite(pcm).all()
    assert pcm.shape[1] >= SR * 2 - HOP


def test_chunked_processing_end_to_end(tmp_path):
    """chunk_duration splits, separates each chunk, and merges stems
    (ref: separator.py:1047-1156 + audio_chunking.py) — real model, no mocks."""
    from audio_separator_tpu.separator import Separator

    model_dir = str(tmp_path / "models")
    os.makedirs(model_dir)
    m1 = _make_model(model_dir, "gamma", seed=3)

    t = np.arange(SR * 4) / SR  # 4 s split into 2 s chunks
    mix = np.stack([np.sin(2 * np.pi * 220 * t),
                    np.sin(2 * np.pi * 550 * t)]).astype(np.float32) * 0.3
    in_path = str(tmp_path / "long.wav")
    audio_io.save_audio(in_path, mix, SR)

    out_dir = str(tmp_path / "out")
    sep = Separator(
        log_level=logging.WARNING,
        model_file_dir=model_dir,
        output_dir=out_dir,
        output_format="WAV",
        chunk_duration=2.0,
    )
    sep.load_model(m1)
    outputs = sep.separate(in_path)
    assert len(outputs) == 2
    for p in outputs:
        full = p if os.path.isabs(p) else os.path.join(out_dir, os.path.basename(p))
        pcm, sr = audio_io.load_audio(full)
        assert sr == SR
        # merged output covers the whole 4 s (chunk merge, not one chunk)
        assert pcm.shape[1] >= SR * 4 - SR // 2, (p, pcm.shape)
        assert np.isfinite(pcm).all()


def test_cli_end_to_end_with_real_model(tmp_path, monkeypatch, capsys):
    """Full CLI surface → facade → model → written stems, no mocks
    (the reference's integration tier runs the same flow on GPU CI)."""
    import sys

    from audio_separator_tpu.utils import cli

    model_dir = str(tmp_path / "models")
    os.makedirs(model_dir)
    model = _make_model(model_dir, "cli", seed=4)

    t = np.arange(SR) / SR
    mix = np.stack([np.sin(2 * np.pi * 440 * t),
                    np.sin(2 * np.pi * 330 * t)]).astype(np.float32) * 0.3
    in_path = str(tmp_path / "song.wav")
    audio_io.save_audio(in_path, mix, SR)
    out_dir = str(tmp_path / "out")

    monkeypatch.setattr(sys, "argv", [
        "audio-separator", in_path,
        "-m", model,
        "--model_file_dir", model_dir,
        "--output_dir", out_dir,
        "--output_format", "FLAC",
        "--log_level", "warning",
    ])
    cli.main()

    written = os.listdir(out_dir)
    assert len(written) == 2, written
    assert all(w.lower().endswith(".flac") for w in written)
    for w in written:
        pcm, sr = audio_io.load_audio(os.path.join(out_dir, w))
        assert sr == SR and np.isfinite(pcm).all()


def test_single_stem_and_custom_names_end_to_end(tmp_path):
    """output_single_stem writes exactly one file; custom_output_names renames
    it (ref: separator.py output_single_stem + common_separator.py:489-507)."""
    from audio_separator_tpu.separator import Separator

    model_dir = str(tmp_path / "models")
    os.makedirs(model_dir)
    model = _make_model(model_dir, "solo", seed=5)

    t = np.arange(SR) / SR
    mix = np.stack([np.sin(2 * np.pi * 440 * t),
                    np.sin(2 * np.pi * 330 * t)]).astype(np.float32) * 0.3
    in_path = str(tmp_path / "song.wav")
    audio_io.save_audio(in_path, mix, SR)

    out_dir = str(tmp_path / "out")
    sep = Separator(log_level=logging.WARNING, model_file_dir=model_dir,
                    output_dir=out_dir, output_format="WAV",
                    output_single_stem="vocals")
    sep.load_model(model)
    outputs = sep.separate(in_path, custom_output_names={"Vocals": "lead take 1"})
    assert len(outputs) == 1
    assert os.path.basename(outputs[0]) == "lead take 1.wav"
    assert os.path.exists(os.path.join(out_dir, "lead take 1.wav"))


def test_warmup_compiles_without_writing_outputs(tmp_path):
    """Separator.warmup primes the demix programs; the user-visible output
    dir stays untouched and a following real separation works."""
    from audio_separator_tpu.separator import Separator

    model_dir = str(tmp_path / "models")
    os.makedirs(model_dir)
    m1 = _make_model(model_dir, "warm", seed=9)
    out_dir = str(tmp_path / "out")
    sep = Separator(log_level=logging.WARNING, model_file_dir=model_dir,
                    output_dir=out_dir, output_format="WAV")
    sep.load_model(m1)
    elapsed = sep.warmup(seconds=2.0)
    assert elapsed > 0
    assert not os.path.exists(out_dir) or not os.listdir(out_dir)
    assert sep.model_instance.output_dir == out_dir  # restored

    t = np.arange(SR * 2) / SR
    mix = np.stack([np.sin(2 * np.pi * 440 * t),
                    np.sin(2 * np.pi * 330 * t)]).astype(np.float32) * 0.3
    in_path = str(tmp_path / "mix.wav")
    audio_io.save_audio(in_path, mix, SR)
    outputs = sep.separate(in_path)
    assert len(outputs) == 2 and os.listdir(out_dir)


def test_warmup_covers_ensemble_loads(tmp_path):
    """warmup() must work for ensemble loads too (it routes through the real
    separate() path, compiling every member model's programs)."""
    from audio_separator_tpu.separator import Separator

    model_dir = str(tmp_path / "models")
    os.makedirs(model_dir)
    m1 = _make_model(model_dir, "wa", seed=4)
    m2 = _make_model(model_dir, "wb", seed=5)
    out_dir = str(tmp_path / "out")
    sep = Separator(log_level=logging.WARNING, model_file_dir=model_dir,
                    output_dir=out_dir, output_format="WAV",
                    ensemble_algorithm="avg_wave")
    sep.load_model([m1, m2])
    elapsed = sep.warmup(seconds=2.0)
    assert elapsed > 0
    assert not os.path.exists(out_dir) or not os.listdir(out_dir)
    assert sep.output_dir == out_dir
