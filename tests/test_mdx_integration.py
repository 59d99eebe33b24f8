"""End-to-end MDX separator test: torch-exported Conv-TDF ONNX model, full
demix parity vs an emulation of the reference chunk loop
(ref: mdx_separator.py:293-450)."""

import logging
import os

import numpy as np
import pytest
import torch

from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

from test_onnx_jax import MiniConvTDF  # reuse the Conv-TDF oracle

from audio_separator_tpu.io import audio as audio_io

N_FFT, HOP, DIM_F, SEGMENT = 512, 128, 128, 32
TRIM = N_FFT // 2
CHUNK = HOP * (SEGMENT - 1)


def _torch_stft_packed(x, dim_f):
    win = torch.hann_window(N_FFT)
    b, c, t = x.shape
    spec = torch.stft(x.reshape(-1, t), n_fft=N_FFT, hop_length=HOP, window=win,
                      center=True, return_complex=False)
    spec = spec.permute(0, 3, 1, 2).reshape(b, c * 2, -1, spec.shape[2])
    return spec[..., :dim_f, :]


def _torch_istft_packed(spec):
    win = torch.hann_window(N_FFT)
    b, c2, dim_f, t = spec.shape
    n_bins = N_FFT // 2 + 1
    spec = torch.nn.functional.pad(spec, (0, 0, 0, n_bins - dim_f))
    spec = spec.reshape(b, c2 // 2, 2, n_bins, t).reshape(-1, 2, n_bins, t)
    spec = spec.permute(0, 2, 3, 1).contiguous()
    wave = torch.istft(torch.view_as_complex(spec), n_fft=N_FFT, hop_length=HOP,
                       window=win, center=True)
    return wave.reshape(b, c2 // 2, -1)


def _reference_mdx_demix(model, mix, overlap, is_match_mix=False):
    chunk_size = CHUNK
    if is_match_mix:
        overlap = 0.02
    gen_size = chunk_size - 2 * TRIM
    pad = gen_size + TRIM - (mix.shape[-1] % gen_size)
    mixture = np.concatenate([np.zeros((2, TRIM), np.float32), mix,
                              np.zeros((2, pad), np.float32)], 1)
    step = int((1 - overlap) * chunk_size)
    result = np.zeros((1, 2, mixture.shape[-1]), np.float32)
    divider = np.zeros((1, 2, mixture.shape[-1]), np.float32)
    for i in range(0, mixture.shape[-1], step):
        start, end = i, min(i + chunk_size, mixture.shape[-1])
        actual = end - start
        window = np.tile(np.hanning(actual)[None, None, :], (1, 2, 1))
        part = mixture[:, start:end]
        if end != i + chunk_size:
            part = np.concatenate([part, np.zeros((2, (i + chunk_size) - end), np.float32)], -1)
        with torch.no_grad():
            spek = _torch_stft_packed(torch.from_numpy(part[None]), DIM_F)
            spek[:, :, :3, :] *= 0
            pred = spek if is_match_mix else model(spek)
            wave = _torch_istft_packed(pred).numpy()
        wave[..., :actual] *= window
        divider[..., start:end] += window
        result[..., start:end] += wave[..., :actual]
    tar = result / divider
    return tar[0][:, TRIM:-TRIM][:, : mix.shape[-1]]


@pytest.fixture(scope="module")
def mdx_model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mdx-model")
    torch.manual_seed(11)
    model = MiniConvTDF(f=DIM_F).eval()
    path = os.path.join(tmp, "UVR_test_mdx.onnx")
    torch.onnx.export(model, torch.randn(1, 4, DIM_F, SEGMENT), path,
                      input_names=["input"], output_names=["output"], dynamo=False)
    model_data = {
        "compensate": 1.035,
        "mdx_dim_f_set": DIM_F,
        "mdx_dim_t_set": 5,  # 2**5 = 32
        "mdx_n_fft_scale_set": N_FFT,
        "primary_stem": "Instrumental",
    }
    return model, path, model_data


def test_mdx_end_to_end(mdx_model, fixtures_dir, tmp_path):
    from audio_separator_tpu.architectures.mdx import MDXSeparator

    model, onnx_path, model_data = mdx_model
    out_dir = str(tmp_path / "out")
    common = {
        "logger": logging.getLogger("test"),
        "model_name": "UVR_test_mdx",
        "model_path": onnx_path,
        "model_data": model_data,
        "output_dir": out_dir,
        "output_format": "WAV",
        "normalization_threshold": 0.9,
        "amplification_threshold": 0.0,
        "sample_rate": 44100,
    }
    arch = {"hop_length": HOP, "segment_size": SEGMENT, "overlap": 0.25,
            "batch_size": 2, "enable_denoise": False}
    sep = MDXSeparator(common_config=common, arch_config=arch)
    assert sep.primary_stem_name == "Instrumental"
    assert sep.secondary_stem_name == "Vocals"

    input_path = os.path.join(fixtures_dir, "mardy20s.flac")
    outputs = sep.separate(input_path)
    assert len(outputs) == 2
    for p in outputs:
        assert os.path.exists(os.path.join(out_dir, p))

    # demix parity on a short slice
    mix, _ = audio_io.load_audio(input_path, sample_rate=44100, channels=2)
    mix = np.ascontiguousarray(mix[:, : 44100 * 2])
    got = sep.demix(mix)
    ref = _reference_mdx_demix(model, mix, overlap=0.25)
    assert got.shape == ref.shape
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert err < 2e-3, f"relative error {err}"

    # match-mix mode (no model): near-exact reconstruction path
    got_mm = sep.demix(mix, is_match_mix=True)
    ref_mm = _reference_mdx_demix(model, mix, overlap=0.25, is_match_mix=True)
    err_mm = np.abs(got_mm - ref_mm).max() / max(np.abs(ref_mm).max(), 1e-6)
    assert err_mm < 2e-3


def test_mdx_denoise_mode(mdx_model, tmp_path):
    from audio_separator_tpu.architectures.mdx import MDXSeparator

    model, onnx_path, model_data = mdx_model
    common = {
        "logger": logging.getLogger("test"),
        "model_name": "m",
        "model_path": onnx_path,
        "model_data": model_data,
        "output_dir": str(tmp_path),
        "output_format": "WAV",
        "normalization_threshold": 0.9,
        "amplification_threshold": 0.0,
        "sample_rate": 44100,
    }
    arch = {"hop_length": HOP, "segment_size": SEGMENT, "overlap": 0.5,
            "batch_size": 1, "enable_denoise": True}
    sep = MDXSeparator(common_config=common, arch_config=arch)
    mix = np.random.default_rng(0).standard_normal((2, 20000)).astype(np.float32) * 0.1
    out = sep.demix(mix)
    assert out.shape == mix.shape
    assert np.isfinite(out).all()


def test_mdx_autocast_close_to_fp32(mdx_model):
    """use_autocast runs the conv U-Net in bf16; output stays close to fp32."""
    from audio_separator_tpu.architectures.mdx import MDXSeparator

    model, onnx_path, model_data = mdx_model
    mk = lambda autocast: MDXSeparator(
        common_config={
            "logger": logging.getLogger("test"),
            "model_name": "UVR_test_mdx", "model_path": onnx_path,
            "model_data": model_data, "output_dir": "/tmp/mdx_ac",
            "output_format": "WAV", "normalization_threshold": 0.9,
            "amplification_threshold": 0.0, "sample_rate": 44100,
            "use_autocast": autocast,
        },
        arch_config={"hop_length": HOP, "segment_size": SEGMENT,
                     "overlap": 0.25, "batch_size": 2, "enable_denoise": False})

    rng = np.random.default_rng(5)
    mix = (rng.standard_normal((2, 44100)) * 0.1).astype(np.float32)
    full = mk(False).demix(mix)
    half = mk(True).demix(mix)
    assert np.isfinite(half).all()
    rel = np.abs(half - full).max() / max(np.abs(full).max(), 1e-6)
    assert rel < 0.1, f"bf16 deviates too much: {rel}"


def test_mdx_separate_batch_matches_solo(mdx_model, tmp_path):
    """Cross-job window batching (MDXSeparator.separate_batch →
    ops/demix.demix_jobs_layout): a coalesced group's outputs must equal the
    per-file solo separate() outputs — windows never cross a job boundary
    and each job's divider normalises only its own span."""
    from audio_separator_tpu.architectures.mdx import MDXSeparator

    _, onnx_path, model_data = mdx_model
    rng = np.random.default_rng(3)
    paths = []
    for i, secs in enumerate((1.3, 0.9, 2.1)):  # distinct window counts
        p = str(tmp_path / f"in{i}.wav")
        wav = (rng.standard_normal((2, int(44100 * secs))) * 0.2).astype(np.float32)
        audio_io.save_audio(p, wav, 44100)
        paths.append(p)

    def make_sep(out_name):
        common = {
            "logger": logging.getLogger("test"),
            "model_name": "m", "model_path": onnx_path,
            "model_data": model_data,
            "output_dir": str(tmp_path / out_name),
            "output_format": "WAV",
            "normalization_threshold": 0.9, "amplification_threshold": 0.0,
            "sample_rate": 44100,
        }
        arch = {"hop_length": HOP, "segment_size": SEGMENT, "overlap": 0.25,
                "batch_size": 2, "enable_denoise": False}
        return MDXSeparator(common_config=common, arch_config=arch)

    solo_sep = make_sep("solo")
    solo_outs = [solo_sep.separate(p) for p in paths]
    batch_sep = make_sep("batch")
    batch_outs = batch_sep.separate_batch(paths)

    assert [sorted(map(os.path.basename, o)) for o in batch_outs] == \
        [sorted(map(os.path.basename, o)) for o in solo_outs]
    for solo_files, batch_files in zip(solo_outs, batch_outs):
        for s, b in zip(sorted(solo_files), sorted(batch_files)):
            a, _ = audio_io.load_audio(os.path.join(str(tmp_path / "solo"), s))
            c, _ = audio_io.load_audio(os.path.join(str(tmp_path / "batch"), b))
            assert a.shape == c.shape
            np.testing.assert_allclose(a, c, atol=2e-4, rtol=0)

    # and the engine-level batch equals per-track demix exactly-ish
    mixes = [np.ascontiguousarray(
        audio_io.load_audio(p, sample_rate=44100, channels=2)[0]) for p in paths]
    batched = batch_sep._demix_batch(mixes)
    for m, got in zip(mixes, batched):
        solo = batch_sep.demix(m)
        assert got.shape == solo.shape
        np.testing.assert_allclose(got, solo, atol=1e-5, rtol=0)


def test_mix_fingerprint_covers_every_byte():
    """The device-resident mix cache is keyed by a content fingerprint; it
    must change for ANY byte of the mix (a strided sample would silently
    reuse a stale cached mix for audio edited between lattice points)."""
    from audio_separator_tpu.architectures.mdx import MDXSeparator

    rng = np.random.default_rng(0)
    mix = rng.standard_normal((2, 100_000)).astype(np.float32)
    base = MDXSeparator._mix_fingerprint(None, mix)
    for idx in (1, 2047, 2049, 99_999):  # all off the old ::2048 lattice
        edited = mix.copy()
        edited[1, idx] += 1e-3
        assert MDXSeparator._mix_fingerprint(None, edited) != base, idx
    # and it is a pure content hash: same bytes, same fingerprint
    assert MDXSeparator._mix_fingerprint(None, mix.copy()) == base
