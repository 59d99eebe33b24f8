"""Separator facade unit tests (mock-based tier, mirroring the reference's
tests/unit strategy — no models, no network)."""

import logging
import os
from unittest import mock

import numpy as np
import pytest

from audio_separator_tpu.io import audio as audio_io
from audio_separator_tpu.separator import Separator
from audio_separator_tpu.separator.separator import DEFAULT_MODEL, STEM_NAME_MAP


def make_separator(**kwargs):
    kwargs.setdefault("info_only", True)
    return Separator(**kwargs)


def test_invalid_normalization_threshold():
    with pytest.raises(ValueError):
        make_separator(normalization_threshold=0)
    with pytest.raises(ValueError):
        make_separator(normalization_threshold=1.5)
    with pytest.raises(ValueError):
        make_separator(amplification_threshold=-0.1)


def test_unknown_ensemble_algorithm_rejected():
    with pytest.raises(ValueError, match="Invalid ensemble algorithm"):
        make_separator(ensemble_algorithm="nope")


def test_unknown_preset_rejected():
    with pytest.raises(ValueError, match="Unknown ensemble preset"):
        make_separator(ensemble_preset="not_a_preset")


def test_preset_configures_models_and_algorithm():
    sep = make_separator(ensemble_preset="karaoke")
    assert sep._ensemble_preset_models and len(sep._ensemble_preset_models) >= 2
    assert sep.ensemble_algorithm in Separator.VALID_ENSEMBLE_ALGORITHMS


def test_load_model_list_enables_ensemble_mode():
    sep = make_separator()
    sep.load_model(["a.ckpt", "b.ckpt"])
    assert sep.model_filenames == ["a.ckpt", "b.ckpt"]
    assert sep.model_instance is None


def test_separate_without_model_raises():
    sep = make_separator()
    with pytest.raises(ValueError, match="load a model"):
        sep.separate("x.wav")


def test_simplified_model_list_filter_and_sort():
    sep = make_separator()
    models = sep.get_simplified_model_list()
    assert DEFAULT_MODEL in models
    by_vocals = sep.get_simplified_model_list(filter_sort_by="vocals")
    assert all("vocals" in v["SDR"] for v in by_vocals.values())
    sdrs = [v["SDR"]["vocals"] for v in by_vocals.values() if v["SDR"]["vocals"] is not None]
    assert sdrs == sorted(sdrs, reverse=True)
    by_name = sep.get_simplified_model_list(filter_sort_by="name")
    names = [v["Name"] for v in by_name.values()]
    assert names == sorted(names)


def test_model_registry_contains_all_arches():
    sep = make_separator()
    grouped = sep.list_supported_model_files()
    for arch in ("VR", "MDX", "MDXC"):
        assert grouped[arch], f"no models listed for {arch}"


def test_get_model_hash(tmp_path):
    sep = make_separator()
    path = tmp_path / "model.bin"
    path.write_bytes(b"x" * 1000)
    import hashlib

    assert sep.get_model_hash(str(path)) == hashlib.md5(b"x" * 1000).hexdigest()


def test_directory_walk_and_error_isolation(tmp_path, monkeypatch):
    """A failing file must not kill the batch (ref: separator.py:974-987)."""
    sep = make_separator(output_dir=str(tmp_path))
    sep.model_instance = mock.Mock()
    sep.model_filename = "m.ckpt"

    audio_dir = tmp_path / "batch"
    audio_dir.mkdir()
    pcm = np.zeros((2, 1000), np.float32)
    audio_io.save_audio(str(audio_dir / "a.wav"), pcm, 44100)
    audio_io.save_audio(str(audio_dir / "b.wav"), pcm, 44100)
    (audio_dir / "notes.txt").write_text("ignored")

    calls = []

    def fake_separate_file(path, custom=None):
        calls.append(os.path.basename(path))
        if "a.wav" in path:
            raise RuntimeError("boom")
        return [f"{os.path.basename(path)}_(Vocals)_m.wav"]

    monkeypatch.setattr(sep, "_separate_file", fake_separate_file)
    outputs = sep.separate(str(audio_dir))
    assert sorted(calls) == ["a.wav", "b.wav"]  # txt skipped
    assert outputs == ["b.wav_(Vocals)_m.wav"]


def test_chunked_processing_merges_stems(tmp_path, monkeypatch):
    """Chunk → separate each → merge per stem (ref: separator.py:1047-1156)."""
    sep = make_separator(output_dir=str(tmp_path / "out"), chunk_duration=1.0,
                         output_format="WAV")
    os.makedirs(sep.output_dir, exist_ok=True)
    sep.model_instance = mock.Mock()
    sep.model_instance.output_dir = None
    sep.model_filename = "m.ckpt"

    sr = 8000
    t = np.arange(sr * 3) / sr
    pcm = np.stack([np.sin(2 * np.pi * 220 * t), np.sin(2 * np.pi * 330 * t)]).astype(np.float32) * 0.5
    src = tmp_path / "long.wav"
    audio_io.save_audio(str(src), pcm, sr)

    def fake_separate_file(path, custom=None):
        # write two fake stems per chunk into the current output_dir
        chunk_pcm, chunk_sr = audio_io.load_audio(path)
        outs = []
        for stem in ("Vocals", "Instrumental"):
            name = f"{os.path.splitext(os.path.basename(path))[0]}_({stem})_m.wav"
            audio_io.save_audio(os.path.join(sep.output_dir, name), chunk_pcm, chunk_sr)
            outs.append(name)
        return outs

    monkeypatch.setattr(sep, "_separate_file", fake_separate_file)
    outputs = sep._process_with_chunking(str(src))
    assert len(outputs) == 2
    for out in outputs:
        assert os.path.exists(out)
        merged, merged_sr = audio_io.load_audio(out)
        assert abs(merged.shape[1] - pcm.shape[1]) < merged_sr * 0.1


def test_stem_name_map_canonicalisation():
    assert STEM_NAME_MAP["no_vocals"] == "Instrumental"
    assert STEM_NAME_MAP["karaoke"] == "Instrumental"
    assert STEM_NAME_MAP["drums"] == "Drums"


def test_use_mesh_resolves_device_mesh():
    """Separator(use_mesh=True) builds a data-parallel mesh over local devices
    and threads it to architecture separators via common_params."""
    from audio_separator_tpu.separator import Separator

    sep = Separator(use_mesh=True, info_only=True)
    mesh = sep._resolve_mesh()
    assert mesh is not None and mesh.shape["data"] >= 2

    import jax.numpy as jnp
    from jax.sharding import Mesh

    assert isinstance(mesh, Mesh)

    # explicit Mesh passes through unchanged
    sep2 = Separator(use_mesh=mesh, info_only=True)
    assert sep2._resolve_mesh() is mesh

    # off by default
    sep3 = Separator(info_only=True)
    assert sep3._resolve_mesh() is None


def test_single_file_failure_raises(tmp_path, monkeypatch):
    """A single-input separation surfaces its failure instead of silently
    returning [] (batch error-isolation only applies to multi-file runs)."""
    sep = make_separator(output_dir=str(tmp_path))
    sep.model_instance = mock.Mock()
    sep.model_filename = "m.ckpt"
    wav = tmp_path / "one.wav"
    audio_io.save_audio(str(wav), np.zeros((2, 1000), np.float32), 44100)

    def boom(path, custom=None):
        raise RuntimeError("model exploded")

    monkeypatch.setattr(sep, "_separate_file", boom)
    with pytest.raises(RuntimeError, match="model exploded"):
        sep.separate(str(wav))

    # ... but a two-file list still isolates the failure per file
    wav2 = tmp_path / "two.wav"
    audio_io.save_audio(str(wav2), np.zeros((2, 1000), np.float32), 44100)
    assert sep.separate([str(wav), str(wav2)]) == []


def test_prepare_mix_ndarray_layouts(tmp_path):
    """(N,1) mono columns and (N,C) arrays transpose correctly; (2,N) stays
    (ref contract: common_separator.py:256-263)."""
    from audio_separator_tpu.separator.common import BaseSeparator

    inst = BaseSeparator.__new__(BaseSeparator)
    inst.logger = logging.getLogger("t")
    inst.sample_rate = 44100

    n = 1000
    for arr, want in [
        (np.zeros((n, 1), np.float32), (2, n)),   # mono column -> stereo-ified
        (np.zeros((n, 2), np.float32), (2, n)),   # soundfile stereo
        (np.zeros((2, n), np.float32), (2, n)),   # already channels-first
        (np.zeros(n, np.float32), (2, n)),        # 1-D mono
        (np.zeros((n, 6), np.float32), (6, n)),   # multichannel
    ]:
        inst.input_bit_depth = None
        out = inst.prepare_mix(arr)
        assert out.shape == want, (arr.shape, out.shape)


def test_near_silent_stem_still_written(tmp_path):
    """Near-silent stems write a real file so chunk merge / ensembling never
    see phantom paths (deviation from ref common_separator.py:312-314)."""
    from audio_separator_tpu.separator.common import BaseSeparator

    inst = BaseSeparator.__new__(BaseSeparator)
    inst.logger = logging.getLogger("t")
    inst.output_dir = str(tmp_path)
    inst.output_format = "WAV"
    inst.output_bitrate = None
    inst.normalization_threshold = 0.9
    inst.amplification_threshold = 0.0
    inst.sample_rate = 44100
    inst.use_soundfile = False
    inst.input_bit_depth = 16
    inst.write_audio("silent.wav", np.zeros((1000, 2), np.float32))
    assert os.path.exists(tmp_path / "silent.wav")


def test_pipeline_env_typo_is_ignored(monkeypatch):
    """AUDSEP_PIPELINE=off must not crash demix (guarded parse)."""
    from audio_separator_tpu.ops.demix import overlap_add_demix

    monkeypatch.setenv("AUDSEP_PIPELINE", "off")

    def model_fn(chunks):
        return np.repeat(chunks[:, None], 1, axis=1)

    import jax.numpy as jnp

    def jfn(chunks):
        return jnp.repeat(chunks[:, None], 1, axis=1)

    mix = np.random.default_rng(0).standard_normal((2, 4096)).astype(np.float32)
    win = np.ones(1024, np.float32)
    out = overlap_add_demix(jfn, mix, 1024, 512, win, num_stems=1, batch_size=2)
    assert out.shape == (1, 2, 4096) and np.isfinite(out).all()


def test_device_probe_timeout_raises(monkeypatch):
    """A wedged TPU runtime (device discovery never returns) must fail fast
    with a diagnosis when AUDSEP_DEVICE_TIMEOUT_S is set, not hang forever."""
    import time

    import jax

    sep = make_separator()
    monkeypatch.setattr(jax, "devices", lambda: time.sleep(3600))
    monkeypatch.setenv("AUDSEP_DEVICE_TIMEOUT_S", "0.3")
    with pytest.raises(RuntimeError, match="did not respond"):
        sep._probe_devices_with_watchdog()


def test_device_probe_normal_path(monkeypatch):
    """Healthy discovery returns the device list unchanged."""
    monkeypatch.delenv("AUDSEP_DEVICE_TIMEOUT_S", raising=False)
    sep = make_separator()
    devices = sep._probe_devices_with_watchdog()
    assert devices and devices[0].platform == "cpu"


def test_device_probe_propagates_errors(monkeypatch):
    import jax

    sep = make_separator()

    def boom():
        raise ValueError("no backend")

    monkeypatch.setattr(jax, "devices", boom)
    with pytest.raises(ValueError, match="no backend"):
        sep._probe_devices_with_watchdog()


def test_sidecar_json_supplies_local_model_data(tmp_path):
    """A local custom MDX/VR model with a `<model>.json` sidecar resolves its
    params offline (the analogue of MDXC's companion YAML) instead of the
    network-bound UVR hash lookup; priority: yaml > sidecar > hash."""
    import json

    sep = make_separator()
    model = tmp_path / "custom_mdx.onnx"
    model.write_bytes(b"\x00" * 64)
    sidecar = tmp_path / "custom_mdx.json"
    data = {"compensate": 1.01, "mdx_dim_f_set": 2048, "mdx_dim_t_set": 8,
            "mdx_n_fft_scale_set": 4096, "primary_stem": "Instrumental"}
    sidecar.write_text(json.dumps(data))

    assert sep._resolve_model_data(str(model), None) == data

    # explicit YAML wins over the sidecar
    y = tmp_path / "cfg.yaml"
    y.write_text("training: {instruments: [vocals, other]}\n")
    got = sep._resolve_model_data(str(model), str(y))
    assert got["training"]["instruments"] == ["vocals", "other"]

    # no sidecar, no yaml → the hash flow (network-bound here, so it raises)
    bare = tmp_path / "bare.onnx"
    bare.write_bytes(b"\x00" * 64)
    with pytest.raises(Exception):
        sep._resolve_model_data(str(bare), None)
