"""RoFormer configuration normalisation & validation.

Port of the reference's config subsystem behaviour
(ref: audio_separator/separator/roformer/configuration_normalizer.py,
parameter_validator.py, roformer_loader.py:246-305): flatten nested YAML,
rename legacy aliases, coerce types, detect variant, validate, and produce the
framework's :class:`RoformerConfig`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

from ..models.roformer import RoformerConfig


class RoformerConfigError(ValueError):
    """Raised when a RoFormer configuration is invalid."""


class ParameterValidationError(RoformerConfigError):
    """Structured single-parameter validation failure
    (ref: audio_separator/separator/roformer/parameter_validation_error.py).

    Carries the offending parameter, what was expected, what was found, and a
    suggestion — so callers/UIs can render actionable messages instead of a
    bare string.
    """

    def __init__(self, parameter: str, expected: str, actual: Any,
                 suggestion: str = ""):
        self.parameter = parameter
        self.expected = expected
        self.actual = actual
        self.suggestion = suggestion
        msg = f"parameter {parameter!r}: expected {expected}, got {actual!r}"
        if suggestion:
            msg += f" — {suggestion}"
        super().__init__(msg)


@dataclasses.dataclass
class ModelLoadingResult:
    """Outcome record for a RoFormer model load
    (ref: audio_separator/separator/roformer/model_loading_result.py).

    ``implementation_used`` is always the JAX path in this framework (the
    reference tracks current-vs-legacy torch implementations); kept for API
    parity so downstream tooling can read the same fields.
    """

    success: bool
    model_type: str = ""
    implementation_used: str = "jax"
    parameter_count: int = 0
    load_duration_seconds: float = 0.0
    warnings: List[str] = dataclasses.field(default_factory=list)
    error: Optional[str] = None

    def add_warning(self, message: str) -> None:
        self.warnings.append(message)

    def summary(self) -> str:
        status = "loaded" if self.success else f"FAILED ({self.error})"
        return (f"{self.model_type or 'roformer'} {status} via "
                f"{self.implementation_used}: {self.parameter_count:,} params "
                f"in {self.load_duration_seconds:.2f}s"
                + (f"; {len(self.warnings)} warning(s)" if self.warnings else ""))


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
        mapped = _NAME_MAP.get(key, key)
        if mapped != key and mapped in config:
            # An alias (e.g. audio-section hop_length) must not clobber an
            # explicitly-present canonical key (model-section
            # stft_hop_length) — the canonical value wins regardless of
            # dict order.
            continue
        key = mapped
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
    mel_band_roformer_validator.py). Raises :class:`ParameterValidationError`
    identifying the offending parameter."""
    for key in ("dim", "depth"):
        if key not in params:
            raise ParameterValidationError(
                key, "a value (missing required parameter)", None,
                "add it to the model section of the YAML config")
        if not isinstance(params[key], int) or params[key] <= 0:
            raise ParameterValidationError(key, "a positive integer", params[key])
    for key in ("heads", "dim_head", "num_stems", "stft_n_fft", "stft_hop_length"):
        v = params.get(key)
        if v is not None and (not isinstance(v, int) or v <= 0):
            raise ParameterValidationError(key, "a positive integer", v)
    if model_type == "bs_roformer":
        fpb = params.get("freqs_per_bands")
        if not fpb or len(fpb) < 2:
            raise ParameterValidationError(
                "freqs_per_bands", ">= 2 bands", fpb,
                "bs_roformer requires the per-band frequency table")
        n_bins = params.get("stft_n_fft", 2048) // 2 + 1
        if sum(fpb) != n_bins:
            raise ParameterValidationError(
                "freqs_per_bands", f"values that sum to {n_bins} (n_fft//2+1)",
                sum(fpb))
    else:
        nb = params.get("num_bands")
        if not nb or nb <= 1:
            raise ParameterValidationError(
                "num_bands", "> 1", nb,
                "mel_band_roformer requires the mel band count")
        sr = params.get("sample_rate", 44100)
        if sr <= 0:
            raise ParameterValidationError("sample_rate", "a positive rate", sr)


# Parameters the JAX implementation consumes, plus accepted no-op extras
# (training-time knobs that are valid in checkpoint YAMLs but irrelevant at
# inference). Anything else earns a warning on the ModelLoadingResult.
_CONSUMED_KEYS = {
    "dim", "depth", "stereo", "num_stems", "time_transformer_depth",
    "freq_transformer_depth", "linear_transformer_depth", "freqs_per_bands",
    "num_bands", "sample_rate", "dim_head", "heads", "stft_n_fft",
    "stft_hop_length", "stft_win_length", "mask_estimator_depth",
    "mlp_expansion_factor", "match_input_audio_length",
}
_ACCEPTED_NOOP_KEYS = {
    "attn_dropout", "ff_dropout", "flash_attn", "sage_attention", "zero_dc",
    "use_torch_checkpoint", "skip_connection", "stft_normalized",
    "stft_window_fn", "multi_stft_resolutions_window_sizes",
    "multi_stft_hop_size", "multi_stft_normalized", "multi_stft_window_fn",
    "multi_stft_resolution_loss_weight", "mask_add", "mlp_expansion_factor",
    "dim_freqs_in", "time_rel_pos", "freq_rel_pos", "norm", "act", "fmin",
    "fmax", "mel_scale", "mono", "dim_t", "hop_length", "n_fft",
    "model_type", "type", "architecture",
}


def collect_config_warnings(flat: Dict[str, Any]) -> List[str]:
    """Non-fatal observations about a normalized config
    (ref: roformer_loader.py loading-stats warnings)."""
    warnings: List[str] = []
    unknown = sorted(k for k in flat
                     if k not in _CONSUMED_KEYS and k not in _ACCEPTED_NOOP_KEYS)
    if unknown:
        warnings.append(f"ignoring unknown config parameters: {', '.join(unknown)}")
    for k in ("attn_dropout", "ff_dropout"):
        if flat.get(k):
            warnings.append(f"{k}={flat[k]} is a training-time setting; "
                            "inference runs with dropout disabled")
    return warnings


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
