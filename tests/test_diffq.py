"""diffq-quantized Demucs restore (models/diffq_restore.py).

Validates the two load-bearing claims separately:
  1. the constructor-derived parameter manifest matches the REFERENCE's own
     ``named_parameters`` order and shapes (the positional decode depends on
     this exactly),
  2. a package quantized with diffq's pack math round-trips through
     ``load_demucs_checkpoint`` to weights within quantization error.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")

from audio_separator_tpu.models.demucs_load import load_demucs_checkpoint
from audio_separator_tpu.models.diffq_restore import (
    demucs_param_manifest,
    dequantize_entry,
    quantize_diffq,
    restore_quantized_state,
)
from ref_shims import load_ref_module


def _ref_params(klass, kwargs):
    mod = load_ref_module(
        "demucs.htdemucs" if klass == "HTDemucs" else "demucs.hdemucs")
    model = getattr(mod, klass)(**kwargs)
    return model, [(n, tuple(p.shape)) for n, p in model.named_parameters()]


@pytest.mark.parametrize("klass,kwargs", [
    ("HTDemucs", dict(sources=["a", "b"], channels=8, nfft=256, depth=3,
                      t_layers=2, t_heads=4, segment=0.5)),
    ("HTDemucs", dict(sources=["a", "b"], channels=8, nfft=256, depth=3,
                      t_layers=3, t_heads=4, bottom_channels=16,
                      t_cross_first=True, segment=0.5)),
    ("HTDemucs", dict(sources=["drums", "bass", "other", "vocals"],
                      segment=10)),  # production htdemucs geometry
    ("HDemucs", dict(sources=["a", "b", "c", "d"], channels=8, nfft=512,
                     depth=4, norm_starts=2, dconv_lstm=2, dconv_attn=2,
                     segment=0.5)),
    ("HDemucs", dict(sources=["drums", "bass", "other", "vocals"],
                     segment=40)),  # production v3 geometry (mdx-era)
])
def test_manifest_matches_reference_named_parameters(klass, kwargs):
    _, want = _ref_params(klass, kwargs)
    got = demucs_param_manifest(klass, kwargs)
    assert got == want


def test_dequantize_entry_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 9, 3)).astype(np.float32) * 0.1
    entry = quantize_diffq(w, group_size=8, bits=8)
    back = dequantize_entry(entry, w.shape)
    # per-group max-abs scaling: error ≤ scale/(2^(b-1)-1)/2 per element
    step = np.abs(w).max() / 127
    assert np.abs(back - w).max() <= step
    # higher bits → int16 levels and tighter error
    entry12 = quantize_diffq(w, group_size=8, bits=12)
    assert entry12[0].dtype == np.int16
    back12 = dequantize_entry(entry12, w.shape)
    assert np.abs(back12 - w).max() < np.abs(back - w).max()


def test_dequantize_entry_uniform_format():
    rng = np.random.default_rng(1)
    w = rng.standard_normal(256).astype(np.float32)
    mn, mx = float(w.min()), float(w.max())
    scale = mx - mn
    bits = 8
    levels = np.round((w - mn) / scale * (2 ** bits - 1)).astype(np.uint8)
    back = dequantize_entry(
        (levels, np.float32(mn), np.float32(scale)), (256,))
    assert np.abs(back - w).max() <= scale / (2 ** bits - 1)


def _quantized_state_for(model, min_size_mb, group_size):
    """Build a diffq-layout state for a torch model: large params quantized,
    small ones cloned to ``others`` — the partition diffq's _find_params
    makes (threshold min_size·2**20/4 elements)."""
    threshold = int(min_size_mb * 2 ** 20 // 4)
    quantized, others = [], []
    for _, p in model.named_parameters():
        if p.numel() > threshold:
            quantized.append(quantize_diffq(p.detach().numpy(), group_size))
        else:
            others.append(p.detach().clone())
    return {
        "__quantized": True,
        "quantized": quantized,
        "float16": [],
        "others": others,
        "meta": {"init_kwargs": {"min_size": min_size_mb,
                                 "group_size": group_size}},
    }


@pytest.mark.parametrize("klass,kwargs", [
    ("HDemucs", dict(sources=["a", "b"], channels=8, nfft=512, depth=4,
                     norm_starts=2, dconv_lstm=2, dconv_attn=2, segment=0.5)),
    ("HTDemucs", dict(sources=["a", "b"], channels=8, nfft=256, depth=3,
                      t_layers=2, t_heads=4, segment=0.5)),
])
def test_restore_quantized_state_roundtrip(klass, kwargs):
    model, want = _ref_params(klass, kwargs)
    # tiny threshold so a realistic mix of params lands in each partition
    min_size_mb = 4096 * 4 / 2 ** 20  # > 4096 elements → quantized
    state = _quantized_state_for(model, min_size_mb, group_size=8)
    assert state["quantized"], "test config produced no quantized params"
    assert state["others"], "test config produced no small params"

    restored = restore_quantized_state(state, klass, kwargs)
    assert list(restored) == [n for n, _ in want]
    sd = dict(model.named_parameters())
    for name, arr in restored.items():
        ref = sd[name].detach().numpy()
        if ref.size > 4096:
            step = np.abs(ref).max() / 127  # quantization error bound
            assert np.abs(arr - ref).max() <= step, name
        else:
            np.testing.assert_array_equal(arr, ref, err_msg=name)


def test_restore_layout_mismatch_raises():
    kwargs = dict(sources=["a", "b"], channels=8, nfft=256, depth=3,
                  t_layers=2, t_heads=4, segment=0.5)
    model, _ = _ref_params("HTDemucs", kwargs)
    state = _quantized_state_for(model, 4096 * 4 / 2 ** 20, 8)
    state["quantized"] = state["quantized"][:-1]
    with pytest.raises(ValueError, match="layout mismatch"):
        restore_quantized_state(state, "HTDemucs", kwargs)


class _FakeKlass:  # pickled klass placeholder; only __name__ is used
    pass


_FakeKlass.__name__ = "HDemucs"


def test_load_demucs_checkpoint_accepts_quantized_package(tmp_path):
    """End-to-end: a diffq-quantized .th package loads through the normal
    checkpoint path and produces the same tree as its unquantized twin
    (within quantization error)."""
    kwargs = dict(sources=["vocals", "other"], channels=8, nfft=512, depth=4,
                  norm_starts=2, dconv_lstm=2, dconv_attn=2, segment=0.5)
    model, _ = _ref_params("HDemucs", kwargs)

    min_size_mb = 4096 * 4 / 2 ** 20
    q_pkg = {
        "klass": _FakeKlass,
        "args": (),
        "kwargs": kwargs,
        "state": _quantized_state_for(model, min_size_mb, 8),
    }
    path = tmp_path / "quant.th"
    torch.save(q_pkg, str(path))
    klass_name, cfg, tree = load_demucs_checkpoint(str(path))
    assert klass_name == "HDemucs" and cfg.arch == "hdemucs"

    def flatten(node, prefix=""):
        for k, v in node.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                yield from flatten(v, key)
            else:
                yield key, v

    flat = dict(flatten(tree))
    sd = dict(model.named_parameters())
    assert set(flat) == set(sd)
    for name, arr in flat.items():
        ref = sd[name].detach().numpy()
        bound = max(np.abs(ref).max() / 127, 1e-7)
        assert np.abs(arr - ref).max() <= bound, name
