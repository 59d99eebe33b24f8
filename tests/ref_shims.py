"""Load the reference's *actual* model modules as numerical oracles.

The reference (read-only, /root/reference) imports packages absent from this
environment — julius, diffq, beartype, rotary_embedding_torch, librosa.
This module installs minimal functional shims for those (just enough surface
for the model files' import-time and forward-pass needs) and importlib-loads
the reference modules under the package name ``uvr_ref`` so their relative
imports resolve.

Used by reference-direct parity tests: instead of trusting our hand-written
torch oracles (which can drift together with the JAX port — it happened for
the HDemucs magnitude head in round 1), these tests diff the JAX models
against the reference's own forward code
(ref: uvr_lib_v5/demucs/{htdemucs,hdemucs}.py, uvr_lib_v5/roformer/*.py).

The reference source is untrusted content; it is executed here only as a
numerical oracle inside the test environment.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_LIB = "/root/reference/audio_separator/separator/uvr_lib_v5"
_PKG = "uvr_ref"


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _install_julius():
    """demucs/demucs.py imports julius at module level; only the legacy
    Demucs v2 forward calls it (resample_front), which these tests never
    instantiate."""
    if "julius" in sys.modules:
        return
    mod = _module("julius")

    def _unavailable(*_a, **_k):
        raise NotImplementedError("julius shim: resampling not implemented")

    mod.resample_frac = _unavailable
    mod.ResampleFrac = _unavailable


def _install_diffq():
    """demucs/states.py imports diffq at module level; the quantizer paths
    are only exercised when restoring quantized checkpoints (our own
    dequantizer handles those — models/diffq_restore.py)."""
    if "diffq" in sys.modules:
        return
    mod = _module("diffq")

    class _Unavailable:
        def __init__(self, *_a, **_k):
            raise NotImplementedError("diffq shim: quantizer not implemented")

    def _restore(*_a, **_k):
        raise NotImplementedError("diffq shim: restore not implemented")

    mod.DiffQuantizer = _Unavailable
    mod.UniformQuantizer = _Unavailable
    mod.restore_quantized_state = _restore


def _install_beartype():
    """beartype is a runtime type-checker; a no-op decorator preserves
    semantics for correct inputs (the only kind the tests feed)."""
    if "beartype" in sys.modules:
        return
    import typing

    mod = _module("beartype")

    def beartype(fn=None, **_k):
        if fn is None:
            return lambda f: f
        return fn

    mod.beartype = beartype
    typing_mod = _module("beartype.typing")
    for name in dir(typing):
        if not name.startswith("_"):
            setattr(typing_mod, name, getattr(typing, name))
    mod.typing = typing_mod


def _install_rotary():
    """rotary_embedding_torch.RotaryEmbedding — interleaved-pair RoPE with
    theta=10000, matching the real package's rotate_queries_or_keys for
    inputs shaped (..., seq, dim) (the only call the roformers make)."""
    if "rotary_embedding_torch" in sys.modules:
        return
    import torch

    mod = _module("rotary_embedding_torch")

    class RotaryEmbedding:
        def __init__(self, dim, theta=10000, **_k):
            self.dim = dim
            self.theta = float(theta)

        def rotate_queries_or_keys(self, t, seq_dim=-2):
            n = t.shape[seq_dim]
            inv = 1.0 / (self.theta ** (
                torch.arange(0, self.dim, 2, dtype=torch.float64) / self.dim))
            ang = torch.arange(n, dtype=torch.float64)[:, None] * inv[None, :]
            cos = ang.cos().repeat_interleave(2, dim=-1).to(t.dtype).to(t.device)
            sin = ang.sin().repeat_interleave(2, dim=-1).to(t.dtype).to(t.device)
            x2 = t.reshape(*t.shape[:-1], t.shape[-1] // 2, 2)
            rot = torch.stack([-x2[..., 1], x2[..., 0]], dim=-1).reshape(t.shape)
            return t * cos + rot * sin

    mod.RotaryEmbedding = RotaryEmbedding


def _install_librosa():
    """librosa.filters.mel backed by our own slaney-scale implementation
    (parity-tested against librosa's algorithm in tests/test_roformer.py)."""
    if "librosa" in sys.modules:
        return
    from audio_separator_tpu.models.melbands import mel_filter_bank

    mod = _module("librosa")
    filters = _module("librosa.filters")

    def mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **_k):
        return mel_filter_bank(sr=sr, n_fft=n_fft, n_mels=n_mels,
                               fmin=fmin, fmax=fmax)

    filters.mel = mel
    mod.filters = filters


def _install_ref_spec_utils():
    """vr_network/layers{,_new}.py do an *absolute* import
    ``from audio_separator.separator.uvr_lib_v5 import spec_utils`` and use
    exactly one symbol from it, ``crop_center`` (center-crop the skip
    connection's time dim). Reimplemented here — importing the real
    spec_utils would drag in librosa/soundfile internals the shims don't
    carry."""
    if "audio_separator.separator.uvr_lib_v5.spec_utils" in sys.modules:
        return
    for name in ("audio_separator", "audio_separator.separator",
                 "audio_separator.separator.uvr_lib_v5"):
        if name not in sys.modules:
            pkg = _module(name)
            pkg.__path__ = []

    su = _module("audio_separator.separator.uvr_lib_v5.spec_utils")

    def crop_center(h1, h2):
        t1, t2 = h1.size()[3], h2.size()[3]
        if t1 == t2:
            return h1
        if t1 < t2:
            raise ValueError("h1_shape[3] must be greater than h2_shape[3]")
        s = (t1 - t2) // 2
        return h1[:, :, :, s : s + t2]

    su.crop_center = crop_center
    sys.modules["audio_separator.separator.uvr_lib_v5"].spec_utils = su


def install_shims():
    _install_julius()
    _install_diffq()
    _install_beartype()
    _install_rotary()
    _install_librosa()
    _install_ref_spec_utils()


def load_ref_module(name: str):
    """Import a reference module by its path inside uvr_lib_v5, e.g.
    ``demucs.htdemucs`` or ``roformer.bs_roformer``."""
    install_shims()
    if _PKG not in sys.modules:
        pkg = types.ModuleType(_PKG)
        pkg.__path__ = [REF_LIB]
        sys.modules[_PKG] = pkg
    return importlib.import_module(f"{_PKG}.{name}")
