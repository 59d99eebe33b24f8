"""Checkpoint-container robustness fuzz: every wild wrapping variant the
reference tolerates must load here, so the first real download on a
networked host is boring (ref loading semantics: roformer/roformer_loader.py
:97-105 container unwrap, demucs/repo.py:101-146 signature/bag resolution,
states.py torch packages; containers are synthesized — no network)."""

import hashlib
import os

import numpy as np
import pytest
import torch
import yaml

# torch's legacy exporter needs the onnx package only for the onnxscript
# post-pass; bypass it (no custom onnxscript functions in plain CNN exports).
from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

from audio_separator_tpu.models.convert import load_torch_state_dict
from audio_separator_tpu.models.demucs_load import (
    load_demucs_checkpoint, load_demucs_model_or_bag)


def _tensors():
    g = torch.Generator().manual_seed(5)
    return {
        "encoder.weight": torch.randn(4, 3, generator=g),
        "encoder.bias": torch.randn(4, generator=g),
        "head.scale": torch.randn(1, generator=g),
    }


def _assert_loaded(path):
    sd = load_torch_state_dict(path)
    want = {k: v.numpy() for k, v in _tensors().items()}
    assert set(sd) == set(want)
    for k in want:
        np.testing.assert_array_equal(sd[k], want[k])


# --------------------------------------------------------------- torch ckpts


@pytest.mark.parametrize("wrapper", [None, "state_dict", "model",
                                     "model_state_dict"])
@pytest.mark.parametrize("zipfmt", [True, False])  # zip vs legacy pickle
def test_container_wrappers_and_serialization_formats(tmp_path, wrapper, zipfmt):
    obj = _tensors()
    if wrapper:
        obj = {wrapper: obj, "epoch": 317, "arch": "mdx23c"}
    path = str(tmp_path / "m.ckpt")
    torch.save(obj, path, _use_new_zipfile_serialization=zipfmt)
    _assert_loaded(path)


def test_uniform_model_prefix_stripped(tmp_path):
    obj = {"state_dict": {f"model.{k}": v for k, v in _tensors().items()}}
    path = str(tmp_path / "m.ckpt")
    torch.save(obj, path)
    _assert_loaded(path)


def test_mixed_prefix_not_stripped(tmp_path):
    """A non-uniform ``model.`` prefix is real nesting, not a wrapper."""
    tensors = _tensors()
    obj = {"model.a": tensors["encoder.weight"], "b": tensors["encoder.bias"]}
    path = str(tmp_path / "m.pth")
    torch.save(obj, path)
    sd = load_torch_state_dict(path)
    assert set(sd) == {"model.a", "b"}


def test_non_tensor_extras_skipped(tmp_path):
    obj = dict(_tensors())
    obj["config"] = {"dim": 384, "depth": 6}
    obj["name"] = "synth"
    path = str(tmp_path / "m.ckpt")
    torch.save(obj, path)
    _assert_loaded(path)


def test_weights_only_unsafe_extras_fall_back(tmp_path):
    """Community files carry arbitrary pickled objects next to the tensors;
    the safe loader rejects them and the loader must fall back."""
    obj = dict(_tensors())
    obj["hp"] = np.float64(0.001)  # numpy scalar: rejected by weights_only
    path = str(tmp_path / "m.pth")
    torch.save(obj, path)
    _assert_loaded(path)


def test_non_dict_checkpoint_rejected(tmp_path):
    path = str(tmp_path / "m.pth")
    torch.save(torch.randn(3, 3), path)
    with pytest.raises(ValueError, match="unsupported checkpoint container"):
        load_torch_state_dict(path)


# --------------------------------------------------------------- demucs .th


def _fake_htdemucs_package(state=None, klass_name="HTDemucs", **kw):
    """Synthesize a demucs torch package the way states.py serialize_model
    does: the pickled stub class + (args, kwargs, state)."""
    import sys
    import types

    mod_name = "demucs.htdemucs" if klass_name == "HTDemucs" else "demucs.hdemucs"
    mod = sys.modules.get(mod_name)
    created = []
    if mod is None:
        if "demucs" not in sys.modules:
            sys.modules["demucs"] = types.ModuleType("demucs")
            created.append("demucs")
        mod = types.ModuleType(mod_name)
        sys.modules[mod_name] = mod
        created.append(mod_name)
    if not hasattr(mod, klass_name):
        cls = type(klass_name, (), {})
        cls.__module__ = mod_name
        setattr(mod, klass_name, cls)
    kwargs = {"sources": ["drums", "bass", "other", "vocals"],
              "audio_channels": 2, "channels": 4, "depth": 2,
              "segment": 7.8}
    kwargs.update(kw)
    if state is None:
        g = torch.Generator().manual_seed(7)
        state = {"encoder.0.conv.weight": torch.randn(4, 2, 8, generator=g),
                 "encoder.0.conv.num_batches_tracked": torch.tensor(12)}
    return ({"klass": getattr(mod, klass_name), "args": (),
             "kwargs": kwargs, "state": state}, created)


def _save_with_checksum(package, directory, sig):
    """Name the file <sig>-<sha256[:8]>.th the way the demucs repo does —
    the loader validates the filename checksum against the bytes."""
    tmp = os.path.join(directory, f"{sig}.tmp")
    torch.save(package, tmp)
    with open(tmp, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:8]
    path = os.path.join(directory, f"{sig}-{digest}.th")
    os.rename(tmp, path)
    return path


def test_demucs_th_package_roundtrip(tmp_path):
    package, created = _fake_htdemucs_package()
    path = _save_with_checksum(package, str(tmp_path), "abcdef12")
    klass, cfg, tree = load_demucs_checkpoint(path)
    assert klass == "HTDemucs"
    assert cfg.sources == ("drums", "bass", "other", "vocals")
    assert cfg.channels == 4 and cfg.depth == 2
    w = tree["encoder"]["0"]["conv"]["weight"]
    assert w.shape == (4, 2, 8) and w.dtype == np.float32
    # num_batches_tracked buffers are dropped, not converted
    assert "num_batches_tracked" not in tree["encoder"]["0"]["conv"]


def test_demucs_unsupported_class_rejected(tmp_path):
    package, _ = _fake_htdemucs_package(klass_name="HDemucs")
    package["klass"].__name__ = "ConvTasNet"
    path = str(tmp_path / "legacy.th")
    torch.save(package, path)
    with pytest.raises(NotImplementedError, match="not supported"):
        load_demucs_checkpoint(path)
    package["klass"].__name__ = "HDemucs"


def test_demucs_yaml_bag_with_weights_and_segment(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    sigs = ["aaaa1111", "bbbb2222"]
    for sig in sigs:
        package, _ = _fake_htdemucs_package()
        _save_with_checksum(package, str(repo), sig)
    bag = {"models": sigs,
           "weights": [[1.0, 0.0, 1.0, 1.0], [0.5, 1.0, 0.5, 0.5]],
           "segment": 11.0}
    with open(repo / "htdemucs_ft.yaml", "w", encoding="utf-8") as f:
        yaml.safe_dump(bag, f)
    models, weights, segment = load_demucs_model_or_bag("htdemucs_ft",
                                                        str(repo))
    assert len(models) == 2
    assert weights == bag["weights"]
    assert segment == 11.0


def test_demucs_single_th_by_signature(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    package, _ = _fake_htdemucs_package()
    _save_with_checksum(package, str(repo), "cccc3333")
    models, weights, segment = load_demucs_model_or_bag("cccc3333", str(repo))
    assert len(models) == 1


# ----------------------------------------------------------------- onnx


def _inject_unknown_fields(data: bytes) -> bytes:
    """Append unknown protobuf fields at the top-level ModelProto: a varint
    field (tag 1000) and a length-delimited field (tag 1001). Forward
    compatibility requires parsers to skip both."""

    def varint(v: int) -> bytes:
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    unknown = (varint((1000 << 3) | 0) + varint(12345)
               + varint((1001 << 3) | 2) + varint(6) + b"future")
    return data + unknown


def test_onnx_unknown_fields_skipped(tmp_path):
    import torch.nn as nn

    import jax.numpy as jnp

    from audio_separator_tpu.models.onnx_jax import onnx_to_jax

    model = nn.Sequential(nn.Conv2d(2, 3, 3, padding=1), nn.ReLU()).eval()
    example = torch.randn(1, 2, 8, 8)
    path = str(tmp_path / "m.onnx")
    torch.onnx.export(model, example, path, input_names=["input"],
                      output_names=["output"], opset_version=17, dynamo=False)
    with open(path, "rb") as f:
        data = f.read()
    fuzzed = str(tmp_path / "fuzzed.onnx")
    with open(fuzzed, "wb") as f:
        f.write(_inject_unknown_fields(data))

    fn, params, _, _ = onnx_to_jax(fuzzed)
    with torch.no_grad():
        ref = model(example).numpy()
    got = np.asarray(fn(params, jnp.asarray(example.numpy()))[0])
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_onnx_truncated_file_raises_cleanly(tmp_path):
    import torch.nn as nn

    from audio_separator_tpu.models.onnx_proto import load_model

    model = nn.Sequential(nn.Conv2d(2, 3, 3)).eval()
    path = str(tmp_path / "m.onnx")
    torch.onnx.export(model, torch.randn(1, 2, 8, 8), path,
                      opset_version=17, dynamo=False)
    with open(path, "rb") as f:
        data = f.read()
    trunc = str(tmp_path / "t.onnx")
    with open(trunc, "wb") as f:
        f.write(data[: len(data) // 2])
    with pytest.raises(Exception):  # malformed, but no hang/segfault
        load_model(trunc)
