"""End-to-end MDXC/RoFormer separator test with a synthetic checkpoint.

Builds a tiny Mel-Band RoFormer via the torch oracle, saves it as a UVR-style
.ckpt + model_data, runs the full separator path (load → demix → residual
secondary → write), and checks sample-level parity against a direct
emulation of the reference's chunked demix loop
(ref: mdxc_separator.py:272-343,430-468).
"""

import logging
import os

import numpy as np
import pytest
import torch

from audio_separator_tpu.io import audio as audio_io
from audio_separator_tpu.models.melbands import mel_band_membership

from torch_oracles.roformer_oracle import RoformerOracle

SR = 44100
N_FFT, HOP = 512, 128
DIM_T = 64  # inference segment size
NUM_BANDS = 24


@pytest.fixture(scope="module")
def synthetic_model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mdxc-model")
    torch.manual_seed(7)
    member, _, _, _ = mel_band_membership(SR, N_FFT, NUM_BANDS)
    band_bins = [list(np.nonzero(member[i])[0]) for i in range(NUM_BANDS)]
    oracle = RoformerOracle(
        kind="mel", band_bins=band_bins, dim=48, depth=2, heads=4, dim_head=16,
        stereo=True, num_stems=1, t_depth=1, f_depth=1, n_fft=N_FFT, hop=HOP,
        mask_depth=1,
    ).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.2)

    ckpt_path = os.path.join(tmp, "test_mel_band_roformer.ckpt")
    torch.save({"state_dict": oracle.state_dict()}, ckpt_path)

    model_data = {
        "is_roformer": True,
        "audio": {"sample_rate": SR, "hop_length": HOP, "chunk_size": HOP * (DIM_T - 1)},
        "model": {
            "dim": 48, "depth": 2, "stereo": True, "num_stems": 1,
            "time_transformer_depth": 1, "freq_transformer_depth": 1,
            "num_bands": NUM_BANDS, "dim_head": 16, "heads": 4,
            "stft_n_fft": N_FFT, "stft_hop_length": HOP, "stft_win_length": N_FFT,
            "mask_estimator_depth": 1, "sample_rate": SR,
        },
        "training": {"instruments": ["vocals", "other"], "target_instrument": "vocals"},
        "inference": {"dim_t": DIM_T, "batch_size": 2},
    }
    return oracle, ckpt_path, model_data, str(tmp)


def _reference_demix(oracle, mix, chunk, step):
    """Numpy/torch emulation of the reference RoFormer demix loop."""
    from scipy.signal.windows import hamming

    window = hamming(chunk).astype(np.float32)
    total = mix.shape[1]
    result = np.zeros((1, 2, total), dtype=np.float32)
    counter = np.zeros(total, dtype=np.float32)
    with torch.no_grad():
        for i in range(0, total, step):
            start = i if i + chunk <= total else total - chunk
            part = torch.from_numpy(mix[:, start : start + chunk])
            out = oracle(part.unsqueeze(0))[0].numpy()  # (n_stems, 2, chunk)
            result[..., start : start + chunk] += out * window
            counter[start : start + chunk] += window
    return result / np.maximum(counter, 1e-10)


def test_mdxc_separator_end_to_end(synthetic_model, fixtures_dir, tmp_path):
    from audio_separator_tpu.architectures.mdxc import MDXCSeparator

    oracle, ckpt_path, model_data, _ = synthetic_model
    out_dir = str(tmp_path / "out")

    common = {
        "logger": logging.getLogger("test"),
        "model_name": "test_mel_band_roformer",
        "model_path": ckpt_path,
        "model_data": model_data,
        "output_dir": out_dir,
        "output_format": "FLAC",
        "normalization_threshold": 0.9,
        "amplification_threshold": 0.0,
        "sample_rate": SR,
    }
    arch = {"segment_size": 256, "override_model_segment_size": False,
            "batch_size": 2, "overlap": 2, "pitch_shift": 0}

    sep = MDXCSeparator(common_config=common, arch_config=arch)
    assert sep.primary_stem_name == "vocals"
    assert sep.secondary_stem_name == "other"

    input_path = os.path.join(fixtures_dir, "mardy20s.flac")
    outputs = sep.separate(input_path)
    assert len(outputs) == 2
    for path in outputs:
        assert os.path.exists(os.path.join(out_dir, path))

    # Parity vs reference-style loop on a short slice.
    mix, _ = audio_io.load_audio(input_path, sample_rate=SR, channels=2)
    mix = mix[:, : SR * 3]
    peak = np.abs(mix).max()
    norm_mix = mix * (0.9 / peak) if peak > 0.9 else mix

    chunk = HOP * (DIM_T - 1)
    step = min(int(2 * SR), chunk)
    ref = _reference_demix(oracle, norm_mix, chunk, step)[0]  # (2, T) vocals

    got_sources = sep.demix(norm_mix)
    got = got_sources["vocals"]
    assert got.shape == ref.shape
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert err < 2e-3, f"relative error {err}"
    # residual secondary
    np.testing.assert_allclose(got_sources["other"], norm_mix - got, atol=1e-6)


def test_mdxc_single_stem_fetch_two_stem_model(tmp_path):
    """output_single_stem on a 2-stem (no target_instrument) model fetches
    only that stem from device (engine fetch_stems): demix returns a dict
    restricted to it, values matching the full run; separate writes one file."""
    from audio_separator_tpu.architectures.mdxc import MDXCSeparator

    torch.manual_seed(11)
    member, _, _, _ = mel_band_membership(SR, N_FFT, NUM_BANDS)
    band_bins = [list(np.nonzero(member[i])[0]) for i in range(NUM_BANDS)]
    oracle = RoformerOracle(
        kind="mel", band_bins=band_bins, dim=48, depth=1, heads=4, dim_head=16,
        stereo=True, num_stems=2, t_depth=1, f_depth=1, n_fft=N_FFT, hop=HOP,
        mask_depth=1,
    ).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
    ckpt_path = str(tmp_path / "two_stem_mel_band_roformer.ckpt")
    torch.save({"state_dict": oracle.state_dict()}, ckpt_path)
    model_data = {
        "is_roformer": True,
        "audio": {"sample_rate": SR, "hop_length": HOP},
        "model": {
            "dim": 48, "depth": 1, "stereo": True, "num_stems": 2,
            "time_transformer_depth": 1, "freq_transformer_depth": 1,
            "num_bands": NUM_BANDS, "dim_head": 16, "heads": 4,
            "stft_n_fft": N_FFT, "stft_hop_length": HOP, "stft_win_length": N_FFT,
            "mask_estimator_depth": 1, "sample_rate": SR,
        },
        "training": {"instruments": ["vocals", "other"]},
        "inference": {"dim_t": DIM_T, "batch_size": 2},
    }

    def build(single_stem):
        common = {
            "logger": logging.getLogger("test"),
            "model_name": "two_stem_mel_band_roformer",
            "model_path": ckpt_path,
            "model_data": model_data,
            "output_dir": str(tmp_path / "out"),
            "output_format": "WAV",
            "normalization_threshold": 0.9,
            "amplification_threshold": 0.0,
            "sample_rate": SR,
            "output_single_stem": single_stem,
        }
        arch = {"segment_size": 256, "override_model_segment_size": False,
                "batch_size": 2, "overlap": 2, "pitch_shift": 0}
        return MDXCSeparator(common_config=common, arch_config=arch)

    rng = np.random.default_rng(5)
    mix = (rng.standard_normal((2, SR)) * 0.2).astype(np.float32)

    full = build(None).demix(mix)
    assert set(full) == {"vocals", "other"}
    only = build("other").demix(mix)
    assert set(only) == {"other"}
    np.testing.assert_allclose(only["other"], full["other"], atol=1e-5)

    in_path = str(tmp_path / "song.wav")
    audio_io.save_audio(in_path, mix, SR)
    sep = build("other")
    outputs = sep.separate(in_path)
    assert len(outputs) == 1 and "other" in outputs[0].lower()
    assert os.path.exists(os.path.join(str(tmp_path / "out"), outputs[0]))


def test_mdxc_pitch_shift_path(synthetic_model, tmp_path):
    """pitch_shift != 0 takes the resample-trick path (demix at shifted rate,
    restore with _pitch_fix, ref: mdxc_separator.py:230-270) and still returns
    full-length stems close to the unshifted separation."""
    from audio_separator_tpu.architectures.mdxc import MDXCSeparator

    _oracle, ckpt_path, model_data, _tmp = synthetic_model

    def build(semitones):
        return MDXCSeparator(
            common_config={
                "logger": logging.getLogger("test"),
                "model_name": "test_mel_band_roformer",
                "model_path": ckpt_path, "model_data": model_data,
                "output_dir": str(tmp_path), "output_format": "WAV",
                "normalization_threshold": 0.9, "amplification_threshold": 0.0,
                "sample_rate": SR,
            },
            arch_config={"segment_size": 256, "override_model_segment_size": False,
                         "batch_size": 2, "overlap": 2, "pitch_shift": semitones})

    rng = np.random.default_rng(11)
    t = np.arange(SR * 2) / SR
    mix = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 330 * t)]
                   ).astype(np.float32) * 0.3

    plain = build(0).demix(mix)
    shifted = build(2).demix(mix)
    assert isinstance(plain, dict) and isinstance(shifted, dict)
    for key in plain:
        assert shifted[key].shape == plain[key].shape, key
        assert np.isfinite(shifted[key]).all()
        # same model, mild pitch trick: outputs correlate strongly
        a, b = plain[key].ravel(), shifted[key].ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.5, (key, corr)


def test_mdxc_separate_batch_matches_sequential(synthetic_model, fixtures_dir,
                                                tmp_path):
    """Cross-job window batching at the arch level: separate_batch over two
    files writes the same stems as sequential separate() calls (one engine
    pass via ops/demix.demix_jobs; residual secondary per job)."""
    import shutil

    from audio_separator_tpu.architectures.mdxc import MDXCSeparator

    _, ckpt_path, model_data, _ = synthetic_model
    src = os.path.join(fixtures_dir, "mardy20s.flac")
    a = str(tmp_path / "track_a.flac")
    b = str(tmp_path / "track_b.flac")
    shutil.copy(src, a)
    shutil.copy(src, b)

    def build(out_dir):
        common = {
            "logger": logging.getLogger("test"),
            "model_name": "test_mel_band_roformer",
            "model_path": ckpt_path,
            "model_data": model_data,
            "output_dir": out_dir,
            "output_format": "WAV",
            "normalization_threshold": 0.9,
            "amplification_threshold": 0.0,
            "sample_rate": SR,
        }
        arch = {"segment_size": 256, "override_model_segment_size": False,
                "batch_size": 2, "overlap": 2, "pitch_shift": 0}
        return MDXCSeparator(common_config=common, arch_config=arch), out_dir

    sep_seq, seq_dir = build(str(tmp_path / "seq"))
    seq_outputs = [sep_seq.separate(a), sep_seq.separate(b)]

    sep_bat, bat_dir = build(str(tmp_path / "bat"))
    bat_outputs = sep_bat.separate_batch([a, b])

    assert [sorted(o) for o in bat_outputs] == [sorted(o) for o in seq_outputs]
    for seq_files, bat_files in zip(seq_outputs, bat_outputs):
        for name in seq_files:
            ref, _ = audio_io.load_audio(os.path.join(seq_dir, name))
            got, _ = audio_io.load_audio(os.path.join(bat_dir, name))
            assert ref.shape == got.shape
            np.testing.assert_allclose(got, ref, atol=3e-4)


def test_mdxc_separate_batch_short_audio_falls_back(synthetic_model, tmp_path):
    """Tracks under the 10 s segment-size override cannot share geometry —
    the batch path must fall back to sequential separate()."""
    from audio_separator_tpu.architectures.mdxc import MDXCSeparator

    _, ckpt_path, model_data, _ = synthetic_model
    rng = np.random.default_rng(3)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"short{i}.wav")
        pcm = (rng.standard_normal((2, SR * 3)) * 0.2).astype(np.float32)
        audio_io.save_audio(p, pcm, SR, "WAV")
        paths.append(p)

    common = {
        "logger": logging.getLogger("test"),
        "model_name": "test_mel_band_roformer",
        "model_path": ckpt_path,
        "model_data": model_data,
        "output_dir": str(tmp_path / "out"),
        "output_format": "WAV",
        "normalization_threshold": 0.9,
        "amplification_threshold": 0.0,
        "sample_rate": SR,
    }
    arch = {"segment_size": DIM_T, "override_model_segment_size": False,
            "batch_size": 2, "overlap": 2, "pitch_shift": 0}
    sep = MDXCSeparator(common_config=common, arch_config=arch)
    outputs = sep.separate_batch(paths)
    assert len(outputs) == 2
    for files in outputs:
        assert len(files) == 2
