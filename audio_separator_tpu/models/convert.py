"""Checkpoint conversion: torch state dicts → JAX parameter pytrees.

torch is used *only* here, at conversion time, on CPU. Converted pytrees are
cached as ``.npz`` so steady-state inference never imports torch
(ref loading semantics: roformer_loader.py:97-105 — unwraps ``state_dict`` /
``model`` containers; mdxc_separator.py:109; vr_separator.py:173).

Conversion also restructures for TPU execution:
* per-depth transformer layers are stacked along a leading axis for
  ``lax.scan``;
* ragged per-band BandSplit / MaskEstimator weights are zero-padded into
  dense ``(bands, max_in, …)`` batched-einsum tensors;
* all ``nn.Linear`` weights are transposed to ``(in, out)`` so applications
  are plain ``x @ w``.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from .roformer import BandLayout, RoformerConfig, band_layout


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .ckpt/.pth/.th torch checkpoint to numpy, unwrapping common
    containers."""
    import torch

    # Downloaded checkpoints are untrusted pickles: the safe tensor-only
    # loader first; unpickling arbitrary objects only as a fallback for the
    # rare community file that stores extra Python objects next to the
    # tensors (same exposure as the reference, but opt-in per file here).
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "model_state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    if not isinstance(obj, dict):
        raise ValueError(f"unsupported checkpoint container in {path}")
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    # strip a uniform "model." prefix if present
    if out and all(k.startswith("model.") for k in out):
        out = {k[len("model."):]: v for k, v in out.items()}
    return out


def _stack(dicts, key):
    return np.stack([d[key] for d in dicts])


def _convert_attention(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "attn_norm": sd[f"{prefix}.0.norm.gamma"],
        "wqkv": sd[f"{prefix}.0.to_qkv.weight"].T,
        "gate_w": sd[f"{prefix}.0.to_gates.weight"].T,
        "gate_b": sd[f"{prefix}.0.to_gates.bias"],
        "wo": sd[f"{prefix}.0.to_out.0.weight"].T,
        "ff_norm": sd[f"{prefix}.1.net.0.gamma"],
        "ff_w1": sd[f"{prefix}.1.net.1.weight"].T,
        "ff_b1": sd[f"{prefix}.1.net.1.bias"],
        "ff_w2": sd[f"{prefix}.1.net.4.weight"].T,
        "ff_b2": sd[f"{prefix}.1.net.4.bias"],
    }


def _convert_linear_attention(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """LinearAttention layer (ref: bs_roformer.py:104-133): no gates/RoPE,
    per-head temperature, bias-free projections."""
    return {
        "attn_norm": sd[f"{prefix}.0.norm.gamma"],
        "wqkv": sd[f"{prefix}.0.to_qkv.0.weight"].T,
        "temperature": sd[f"{prefix}.0.temperature"].reshape(-1),
        "wo": sd[f"{prefix}.0.to_out.1.weight"].T,
        "ff_norm": sd[f"{prefix}.1.net.0.gamma"],
        "ff_w1": sd[f"{prefix}.1.net.1.weight"].T,
        "ff_b1": sd[f"{prefix}.1.net.1.bias"],
        "ff_w2": sd[f"{prefix}.1.net.4.weight"].T,
        "ff_b2": sd[f"{prefix}.1.net.4.bias"],
    }


def _convert_transformer(sd, prefix: str, inner_depth: int, has_out_norm: bool,
                         linear: bool = False):
    convert = _convert_linear_attention if linear else _convert_attention
    layers = [convert(sd, f"{prefix}.layers.{l}") for l in range(inner_depth)]
    out = {k: _stack(layers, k) for k in layers[0]}
    if has_out_norm:
        out["out_norm"] = sd[f"{prefix}.norm.gamma"]
    return out


def convert_roformer(sd: Dict[str, np.ndarray], cfg: RoformerConfig) -> Dict[str, Any]:
    """Build the apply_roformer params pytree from a torch state dict."""
    layout: BandLayout = band_layout(cfg)
    nb, max_in, dim = layout.n_bands, layout.max_in, cfg.dim

    # --- band split (unpadded per equal-width run) ---------------------------
    bs_groups = []
    for (s0, e0, width, _dense) in layout.runs:
        gamma = np.stack([sd[f"band_split.to_features.{i}.0.gamma"]
                          for i in range(s0, e0)])
        w = np.stack([sd[f"band_split.to_features.{i}.1.weight"].T
                      for i in range(s0, e0)])
        bs_groups.append({"gamma": gamma.astype(np.float32),
                          "w": w.astype(np.float32)})
    b = np.stack([sd[f"band_split.to_features.{i}.1.bias"] for i in range(nb)])
    params: Dict[str, Any] = {"band_split": {"groups": bs_groups,
                                             "b": b.astype(np.float32)}}

    # --- transformer blocks (stacked for scan) -------------------------------
    has_inner_norm = cfg.kind == "mel"  # norm_output=True for mel variant
    has_linear = cfg.linear_transformer_depth > 0  # BS only (ref :376-377)
    time_idx, freq_idx = (1, 2) if has_linear else (0, 1)
    per_depth = []
    for d in range(cfg.depth):
        entry = {
            "time": _convert_transformer(sd, f"layers.{d}.{time_idx}",
                                         cfg.time_transformer_depth, has_inner_norm),
            "freq": _convert_transformer(sd, f"layers.{d}.{freq_idx}",
                                         cfg.freq_transformer_depth, has_inner_norm),
        }
        if has_linear:
            entry["linear"] = _convert_transformer(
                sd, f"layers.{d}.0", cfg.linear_transformer_depth,
                has_inner_norm, linear=True)
        per_depth.append(entry)
    blocks = {}
    for branch in per_depth[0]:
        blocks[branch] = {
            k: np.stack([pd[branch][k] for pd in per_depth])
            for k in per_depth[0][branch]
        }
    params["blocks"] = blocks

    if f"final_norm.gamma" in sd:
        params["final_norm"] = {"gamma": sd["final_norm.gamma"]}

    # --- mask estimators (padded, stacked over stems) ------------------------
    # The reference's two MLP builders disagree on what `depth` means:
    # bs_roformer.py:190 builds `depth` linears ((dim_hidden,) * (depth - 1))
    # while mel_band_roformer.py:149 builds `depth + 1` ((dim_hidden,) * depth)
    # — so a mel checkpoint with mask_estimator_depth=1 has TWO linears.
    depth = cfg.mask_estimator_depth
    n_hidden = depth if cfg.kind == "mel" else depth - 1
    hidden_dim = cfg.dim * cfg.mlp_expansion_factor
    hidden_layers = []
    for h in range(n_hidden):
        seq_idx = 2 * h
        in_dim = dim if h == 0 else hidden_dim
        wh = np.zeros((cfg.num_stems, nb, in_dim, hidden_dim), np.float32)
        bh = np.zeros((cfg.num_stems, nb, hidden_dim), np.float32)
        for s in range(cfg.num_stems):
            for i in range(nb):
                key = f"mask_estimators.{s}.to_freqs.{i}.0.{seq_idx}"
                wh[s, i] = sd[f"{key}.weight"].T
                bh[s, i] = sd[f"{key}.bias"]
        hidden_layers.append({"w": wh, "b": bh})

    final_idx = 2 * n_hidden
    me_groups = []
    for (s0, e0, width, _dense) in layout.runs:
        vw, vb, gw, gb = [], [], [], []
        for s in range(cfg.num_stems):
            vw.append([]); vb.append([]); gw.append([]); gb.append([])
            for i in range(s0, e0):
                key = f"mask_estimators.{s}.to_freqs.{i}.0.{final_idx}"
                wt = sd[f"{key}.weight"]  # (2*width, in) — GLU: value ; gate
                bt = sd[f"{key}.bias"]
                vw[s].append(wt[:width].T); gw[s].append(wt[width:].T)
                vb[s].append(bt[:width]);   gb[s].append(bt[width:])
        me_groups.append({
            "val_w": np.asarray(vw, np.float32),   # (S, g, in, width)
            "val_b": np.asarray(vb, np.float32),   # (S, g, width)
            "gate_w": np.asarray(gw, np.float32),
            "gate_b": np.asarray(gb, np.float32),
        })
    params["mask_est"] = {"hidden": hidden_layers, "groups": me_groups}
    return params


def tree_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """'a.b.c' keys → nested tree (drops num_batches_tracked buffers)."""
    tree: Dict[str, Any] = {}
    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        node = tree
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(value)
    return tree


def convert_tfc_tdf(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """TFC-TDF v3 checkpoints map directly to a path-addressed tree."""
    return tree_from_state_dict(sd)


# ---------------------------------------------------------------------------
# Pytree cache (npz) so steady-state inference is torch-free.


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        flat[f"{prefix}__len__"] = np.asarray(len(tree))
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def normalize(node):
        if not isinstance(node, dict):
            return node
        if "__len__" in node:
            n = int(node["__len__"])
            return [normalize(node[str(i)]) for i in range(n)]
        return {k: normalize(v) for k, v in node.items()}

    return normalize(tree)


def save_params(path: str, params: Any) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str) -> Any:
    with np.load(path, allow_pickle=False) as data:
        return _unflatten({k: data[k] for k in data.files})


def cached_convert(ckpt_path: str, cfg, converter, cache_dir: str | None = None):
    """Convert-with-cache: ``converter(state_dict, cfg)`` result is stored next
    to the checkpoint (or in cache_dir) keyed by file size + mtime."""
    st = os.stat(ckpt_path)
    base = os.path.basename(ckpt_path)
    cache_name = f"{base}.{st.st_size}.{int(st.st_mtime)}.jax.npz"
    cache_path = os.path.join(cache_dir or os.path.dirname(ckpt_path), cache_name)
    if os.path.exists(cache_path):
        try:
            return load_params(cache_path)
        except Exception:
            pass
    sd = load_torch_state_dict(ckpt_path)
    params = converter(sd, cfg)
    try:
        save_params(cache_path, params)
    except Exception:
        pass
    return params
