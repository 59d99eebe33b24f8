"""Demucs checkpoint loading: signed .th packages and YAML bags.

Replaces the reference's repo/states machinery
(ref: uvr_lib_v5/demucs/repo.py:29-146, states.py:34-64, pretrained.py:62-82)
without importing the demucs package: the pickled ``klass`` global inside .th
files references ``demucs.*`` modules, so stub modules are registered for
unpickling and only the class *name* is used to dispatch to our JAX
implementations.
"""

from __future__ import annotations

import hashlib
import os
import sys
import types
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import yaml

from .htdemucs import HTDemucsConfig, config_from_kwargs

_STUB_MODULES = [
    "demucs", "demucs.htdemucs", "demucs.hdemucs", "demucs.demucs",
    "demucs.tasnet", "demucs.tasnet_v2", "demucs.model", "demucs.model_v2",
    "demucs.transformer", "demucs.states", "demucs.spec", "demucs.repo",
]
_STUB_CLASSES = ["HTDemucs", "HDemucs", "Demucs", "ConvTasNet"]


def _ensure_stub_modules():
    """Install unpickling stubs; returns the names added so the caller can
    remove them afterwards (leaving them would shadow a real `demucs`
    package for the rest of the process)."""
    added = []
    for name in _STUB_MODULES:
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        for cls_name in _STUB_CLASSES:
            stub = type(cls_name, (), {"__module__": name})
            setattr(mod, cls_name, stub)
        sys.modules[name] = mod
        added.append(name)
    return added


def check_checksum(path: str) -> None:
    """Demucs local-repo files embed a sha256 prefix in the name:
    <signature>-<checksum8>.th (ref: repo.py:29-39). Only names matching
    that scheme (hex suffix) are verified — a user's dash-named custom
    checkpoint (my-finetune.th) must not be rejected as corrupt."""
    import re

    stem = os.path.splitext(os.path.basename(path))[0]
    if not re.fullmatch(r"[^-]+-[0-9a-fA-F]{4,64}", stem):
        return
    checksum = stem.split("-", 1)[1]
    sha = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            block = f.read(1 << 20)
            if not block:
                break
            sha.update(block)
    actual = sha.hexdigest()[: len(checksum)]
    if actual != checksum:
        raise RuntimeError(f"Invalid checksum for file {path}, expected {checksum} but got {actual}")


def load_demucs_checkpoint(path: str) -> Tuple[str, HTDemucsConfig, Dict[str, Any]]:
    """Load one .th package → (klass_name, config, params-tree)."""
    import torch

    added_stubs = _ensure_stub_modules()
    try:
        # Demucs .th packages pickle the model *class* itself, so the plain
        # weights_only=True loader rejects them. Allowlist exactly the stub
        # classes (safe_globals) so the safe unpickler accepts klass and
        # nothing else; fall back to full unpickling only if a package
        # carries some other global (same exposure as the reference then).
        safe = [cls for name in _STUB_MODULES
                if name in sys.modules
                for cls in (getattr(sys.modules[name], c, None)
                            for c in _STUB_CLASSES)
                if isinstance(cls, type)]
        try:
            with torch.serialization.safe_globals(safe):
                package = torch.load(path, map_location="cpu",
                                     weights_only=True)
        except Exception:
            package = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        for name in added_stubs:
            sys.modules.pop(name, None)
    klass = package["klass"]
    klass_name = getattr(klass, "__name__", str(klass))
    kwargs = dict(package.get("kwargs") or {})
    args = tuple(package.get("args") or ())
    state = package["state"]

    if klass_name not in ("HTDemucs", "HDemucs"):
        raise NotImplementedError(
            f"Demucs model class {klass_name} not supported (HTDemucs v4 and "
            f"HDemucs v3 only; legacy v1/v2/TasNet are unreachable through the "
            f"reference's model list); file: {path}")

    if isinstance(state, dict) and state.get("__quantized"):
        # diffq-quantized package (ref: states.py:34-64 set_state →
        # diffq.restore_quantized_state): dequantize positionally against the
        # constructor-derived parameter manifest, no diffq needed.
        from .diffq_restore import restore_quantized_state

        state = restore_quantized_state(state, klass_name, kwargs, args)

    cfg = config_from_kwargs(kwargs, args)
    if klass_name == "HDemucs":
        cfg = cfg.__class__(**{**cfg.__dict__, "arch": "hdemucs", "depth": int(kwargs.get("depth", 6)),
                               "segment": float(kwargs.get("segment", 40.0)),
                               "use_train_segment": False})
    tree: Dict[str, Any] = {}
    for key, value in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        node = tree
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        if isinstance(value, np.ndarray):  # dequantized diffq restore
            node[parts[-1]] = value.astype(np.float32)
        else:
            node[parts[-1]] = value.detach().to(torch.float32).numpy()
    return klass_name, cfg, tree


def load_demucs_model_or_bag(
    name_or_path: str, repo_dir: str
) -> Tuple[List[Tuple[HTDemucsConfig, Dict[str, Any]]], List[List[float]], Optional[float]]:
    """Resolve a model name (yaml bag or .th signature) inside ``repo_dir``.

    Returns (models, per-source weights per model, segment override).
    ref: repo.py:101-146, apply.py:28-68 BagOfModels weight handling.
    """
    base = os.path.basename(name_or_path)
    stem = os.path.splitext(base)[0]

    # find .th by signature prefix (files are "<sig>-<checksum>.th")
    def find_th(sig: str) -> Optional[str]:
        for fn in os.listdir(repo_dir):
            if fn.endswith(".th") and (fn.split("-", 1)[0] == sig or os.path.splitext(fn)[0] == sig):
                return os.path.join(repo_dir, fn)
        return None

    yaml_path = os.path.join(repo_dir, f"{stem}.yaml")
    if os.path.exists(yaml_path):
        with open(yaml_path, encoding="utf-8") as f:
            bag = yaml.safe_load(f)
        signatures = bag["models"]
        models = []
        for sig in signatures:
            th_path = find_th(sig)
            if th_path is None:
                raise FileNotFoundError(f"model {sig}.th not found in {repo_dir}")
            check_checksum(th_path)
            _, cfg, params = load_demucs_checkpoint(th_path)
            models.append((cfg, params))
        weights = bag.get("weights")
        if weights is None:
            weights = [[1.0] * len(models[0][0].sources) for _ in models]
        segment = bag.get("segment")
        return models, weights, segment

    th_path = find_th(stem) or (name_or_path if os.path.exists(name_or_path) else None)
    if th_path is None:
        raise FileNotFoundError(f"no demucs model named {name_or_path} in {repo_dir}")
    check_checksum(th_path)
    _, cfg, params = load_demucs_checkpoint(th_path)
    return [(cfg, params)], [[1.0] * len(cfg.sources)], None
