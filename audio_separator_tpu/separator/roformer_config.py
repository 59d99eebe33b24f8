"""RoFormer configuration normalisation & validation.

Port of the reference's config subsystem behaviour
(ref: audio_separator/separator/roformer/configuration_normalizer.py,
parameter_validator.py, roformer_loader.py:246-305): flatten nested YAML,
rename legacy aliases, coerce types, detect variant, validate, and produce the
framework's :class:`RoformerConfig`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from ..models.roformer import RoformerConfig


class RoformerConfigError(ValueError):
    """Raised when a RoFormer configuration is invalid."""


_NAME_MAP = {
    "n_fft": "stft_n_fft",
    "hop_length": "stft_hop_length",
    "win_length": "stft_win_length",
    "window_fn": "stft_window_fn",
    "normalized": "stft_normalized",
    "n_heads": "heads",
    "num_heads": "heads",
    "head_dim": "dim_head",
    "dropout": "attn_dropout",
    "attention_dropout": "attn_dropout",
    "feedforward_dropout": "ff_dropout",
    "expansion_factor": "mlp_expansion_factor",
    "mlp_ratio": "mlp_expansion_factor",
    "use_checkpoint": "use_torch_checkpoint",
    "checkpoint": "use_torch_checkpoint",
    "freq_bands": "freqs_per_bands",
    "frequency_bands": "freqs_per_bands",
    "mel_bands": "num_bands",
    "n_mels": "num_bands",
}

_BOOL_KEYS = {"stereo", "flash_attn", "sage_attention", "zero_dc",
              "use_torch_checkpoint", "skip_connection", "stft_normalized",
              "match_input_audio_length", "mono"}
_INT_KEYS = {"dim", "depth", "num_stems", "time_transformer_depth",
             "freq_transformer_depth", "linear_transformer_depth", "dim_head",
             "heads", "mlp_expansion_factor", "num_bands", "sample_rate",
             "stft_n_fft", "stft_hop_length", "stft_win_length",
             "mask_estimator_depth"}
_FLOAT_KEYS = {"attn_dropout", "ff_dropout", "multi_stft_resolution_loss_weight",
               "fmin", "fmax"}


def flatten_model_config(raw: Dict[str, Any]) -> Dict[str, Any]:
    """Flatten nested {model:..., audio:..., training:..., inference:...} YAML
    into a single parameter dict (ref: configuration_normalizer.py:74-97)."""
    flat: Dict[str, Any] = {}
    for key, value in raw.items():
        if isinstance(value, dict) and key in ("model", "architecture", "params"):
            flat.update(value)
        elif key in ("training", "inference", "audio") and isinstance(value, dict):
            for nk, nv in value.items():
                if nk in ("dim_t", "hop_length", "n_fft", "sample_rate") and nk not in flat:
                    flat.setdefault(nk, nv)
        else:
            flat[key] = value
    return flat


def normalize_roformer_params(config: Dict[str, Any]) -> Dict[str, Any]:
    """Rename aliases and coerce value types
    (ref: configuration_normalizer.py:100-210)."""
    out: Dict[str, Any] = {}
    for key, value in config.items():
        key = _NAME_MAP.get(key, key)
        if key in _BOOL_KEYS:
            value = value.lower() in ("true", "1", "yes", "on") if isinstance(value, str) else bool(value)
        elif key in _INT_KEYS and value is not None:
            try:
                value = int(float(value))
            except (TypeError, ValueError):
                pass
        elif key in _FLOAT_KEYS and value is not None:
            try:
                value = float(value)
            except (TypeError, ValueError):
                pass
        elif key == "freqs_per_bands" and value is not None:
            if isinstance(value, str):
                cleaned = value.strip("()[]").replace(" ", "")
                if cleaned:
                    value = tuple(int(v) for v in cleaned.split(","))
            elif isinstance(value, (list, tuple)):
                value = tuple(int(v) for v in value)
        out[key] = value
    return out


def detect_roformer_type(config: Dict[str, Any], model_path: str = "") -> str:
    """bs_roformer vs mel_band_roformer from config keys, falling back to the
    file name (ref: configuration_normalizer.py:237-266,
    roformer_loader.py:246-255)."""
    if "freqs_per_bands" in config and config["freqs_per_bands"]:
        return "bs_roformer"
    if any(k in config for k in ("num_bands", "n_mels", "mel_bands")):
        return "mel_band_roformer"
    hint = str(config.get("model_type", config.get("type", config.get("architecture", ""))))
    hint = hint.lower()
    if "mel" in hint and "roformer" in hint:
        return "mel_band_roformer"
    if "roformer" in hint:
        return "bs_roformer"
    path = model_path.lower()
    if any(t in path for t in ("mel_band_roformer", "mel-band-roformer", "melband")):
        return "mel_band_roformer"
    if any(t in path for t in ("bs_roformer", "bs-roformer", "bsroformer", "roformer")):
        return "bs_roformer"
    raise RoformerConfigError(f"Cannot determine RoFormer model type from config or path {model_path!r}")


def validate_roformer_params(params: Dict[str, Any], model_type: str) -> None:
    """Essential structural checks (ref: bs_roformer_validator.py:23-139,
    mel_band_roformer_validator.py)."""
    for key in ("dim", "depth"):
        if key not in params:
            raise RoformerConfigError(f"missing required parameter {key!r}")
        if not isinstance(params[key], int) or params[key] <= 0:
            raise RoformerConfigError(f"{key} must be a positive integer, got {params[key]!r}")
    if model_type == "bs_roformer":
        fpb = params.get("freqs_per_bands")
        if not fpb or len(fpb) < 2:
            raise RoformerConfigError("bs_roformer requires freqs_per_bands with >= 2 bands")
        n_bins = params.get("stft_n_fft", 2048) // 2 + 1
        if sum(fpb) != n_bins:
            raise RoformerConfigError(
                f"freqs_per_bands must sum to {n_bins} (n_fft//2+1), got {sum(fpb)}"
            )
    else:
        nb = params.get("num_bands")
        if not nb or nb <= 1:
            raise RoformerConfigError("mel_band_roformer requires num_bands > 1")
        sr = params.get("sample_rate", 44100)
        if sr <= 0:
            raise RoformerConfigError(f"invalid sample_rate {sr}")


def build_roformer_config(raw_config: Dict[str, Any], model_path: str = "") -> RoformerConfig:
    """Full pipeline: flatten → rename/coerce → detect → validate → config."""
    flat = normalize_roformer_params(flatten_model_config(raw_config))
    model_type = detect_roformer_type(flat, model_path)
    validate_roformer_params(flat, model_type)
    kind = "bs" if model_type == "bs_roformer" else "mel"
    return RoformerConfig(
        kind=kind,
        dim=flat["dim"],
        depth=flat["depth"],
        stereo=flat.get("stereo", False),
        num_stems=flat.get("num_stems", 1),
        time_transformer_depth=flat.get("time_transformer_depth", 2),
        freq_transformer_depth=flat.get("freq_transformer_depth", 2),
        linear_transformer_depth=flat.get("linear_transformer_depth", 0),
        freqs_per_bands=tuple(flat["freqs_per_bands"]) if kind == "bs" else None,
        num_bands=flat.get("num_bands") if kind == "mel" else None,
        sample_rate=flat.get("sample_rate", 44100),
        dim_head=flat.get("dim_head", 64),
        heads=flat.get("heads", 8),
        stft_n_fft=flat.get("stft_n_fft", 2048),
        stft_hop_length=flat.get("stft_hop_length", 512),
        stft_win_length=flat.get("stft_win_length", flat.get("stft_n_fft", 2048)),
        mask_estimator_depth=flat.get("mask_estimator_depth", 2 if kind == "bs" else 1),
        mlp_expansion_factor=flat.get("mlp_expansion_factor", 4),
        match_input_audio_length=flat.get("match_input_audio_length", False),
    )
