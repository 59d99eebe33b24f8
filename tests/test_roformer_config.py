"""RoFormer config normalisation/validation contract tests
(ref: tests/contract/test_parameter_validator_interface.py,
tests/unit/test_configuration_normalizer.py behaviours)."""

import pytest

from audio_separator_tpu.separator.roformer_config import (
    RoformerConfigError,
    build_roformer_config,
    detect_roformer_type,
    flatten_model_config,
    normalize_roformer_params,
    validate_roformer_params,
)


def test_flatten_nested_yaml_structure():
    raw = {
        "model": {"dim": 512, "depth": 12},
        "audio": {"hop_length": 441, "sample_rate": 44100},
        "training": {"instruments": ["vocals", "other"]},
        "inference": {"dim_t": 801},
        "extra": 1,
    }
    flat = flatten_model_config(raw)
    assert flat["dim"] == 512
    assert flat["hop_length"] == 441
    assert flat["dim_t"] == 801
    assert flat["extra"] == 1
    assert "training" not in flat


def test_alias_renames_and_coercion():
    out = normalize_roformer_params({
        "n_fft": "2048", "n_heads": "8", "head_dim": 64.0,
        "mel_bands": "60", "stereo": "true", "attn_dropout": "0.1",
        "freqs_per_bands": "(2, 4, 8)",
    })
    assert out["stft_n_fft"] == 2048
    assert out["heads"] == 8
    assert out["dim_head"] == 64
    assert out["num_bands"] == 60
    assert out["stereo"] is True
    assert out["attn_dropout"] == 0.1
    assert out["freqs_per_bands"] == (2, 4, 8)


def test_type_detection():
    assert detect_roformer_type({"freqs_per_bands": (2, 3)}) == "bs_roformer"
    assert detect_roformer_type({"num_bands": 60}) == "mel_band_roformer"
    assert detect_roformer_type({}, "x/mel_band_roformer_foo.ckpt") == "mel_band_roformer"
    assert detect_roformer_type({}, "bs_roformer_x.ckpt") == "bs_roformer"
    with pytest.raises(RoformerConfigError):
        detect_roformer_type({}, "plain_model.ckpt")


def test_validation_errors():
    with pytest.raises(RoformerConfigError, match="missing required"):
        validate_roformer_params({"depth": 4}, "bs_roformer")
    with pytest.raises(RoformerConfigError, match="positive integer"):
        validate_roformer_params({"dim": -1, "depth": 4}, "bs_roformer")
    with pytest.raises(RoformerConfigError, match="sum to"):
        validate_roformer_params(
            {"dim": 64, "depth": 2, "freqs_per_bands": (2, 4), "stft_n_fft": 2048},
            "bs_roformer")
    with pytest.raises(RoformerConfigError, match="num_bands"):
        validate_roformer_params({"dim": 64, "depth": 2}, "mel_band_roformer")


def test_build_full_config_from_uvr_yaml_shape():
    model_data = {
        "model": {
            "dim": 384, "depth": 6, "stereo": True, "num_stems": 1,
            "num_bands": 60, "dim_head": 64, "heads": 8,
            "stft_n_fft": 2048, "stft_hop_length": 441,
            "stft_win_length": 2048, "mask_estimator_depth": 2,
            "sample_rate": 44100,
        },
        "training": {"instruments": ["Vocals", "Instrumental"],
                     "target_instrument": "Vocals"},
    }
    cfg = build_roformer_config(model_data, "mel_band_roformer_test.ckpt")
    assert cfg.kind == "mel"
    assert cfg.dim == 384 and cfg.depth == 6
    assert cfg.num_bands == 60
    assert cfg.stereo is True
    assert cfg.mask_estimator_depth == 2


def test_defaults_for_missing_mask_depth():
    bs = build_roformer_config(
        {"model": {"dim": 64, "depth": 2,
                   "freqs_per_bands": tuple([2] * 16 + [4] * 16 + [929])}},
        "bs_roformer.ckpt")
    assert bs.mask_estimator_depth == 2  # BS default
    mel = build_roformer_config(
        {"model": {"dim": 64, "depth": 2, "num_bands": 60}},
        "mel_band_roformer.ckpt")
    assert mel.mask_estimator_depth == 1  # Mel default


def test_parameter_validation_error_structure():
    """ParameterValidationError carries structured fields
    (ref: roformer/parameter_validation_error.py)."""
    from audio_separator_tpu.separator.roformer_config import (
        ParameterValidationError,
        validate_roformer_params,
    )

    with pytest.raises(ParameterValidationError) as ei:
        validate_roformer_params({"dim": -4, "depth": 2}, "bs_roformer")
    err = ei.value
    assert err.parameter == "dim"
    assert err.actual == -4
    assert "positive integer" in str(err)


def test_collect_config_warnings_flags_unknown_and_dropout():
    from audio_separator_tpu.separator.roformer_config import collect_config_warnings

    warnings = collect_config_warnings(
        {"dim": 64, "depth": 2, "attn_dropout": 0.1, "banana_mode": True})
    text = "\n".join(warnings)
    assert "banana_mode" in text
    assert "attn_dropout" in text
    assert collect_config_warnings({"dim": 64, "depth": 2}) == []


def test_model_loading_result_summary():
    from audio_separator_tpu.separator.roformer_config import ModelLoadingResult

    res = ModelLoadingResult(success=True, model_type="bs_roformer",
                             parameter_count=1234567, load_duration_seconds=1.5)
    res.add_warning("something benign")
    s = res.summary()
    assert "bs_roformer" in s and "jax" in s and "1,234,567" in s and "warning" in s

    failed = ModelLoadingResult(success=False, error="bad checkpoint")
    assert "FAILED" in failed.summary()


def test_alias_does_not_clobber_canonical_stft_keys():
    """An audio-section hop_length/n_fft alias must not overwrite explicit
    model-section stft_* values, regardless of dict order."""
    from audio_separator_tpu.separator.roformer_config import normalize_roformer_params

    flat = {"stft_hop_length": 441, "stft_n_fft": 2048,
            "hop_length": 1024, "n_fft": 4096}
    out = normalize_roformer_params(flat)
    assert out["stft_hop_length"] == 441
    assert out["stft_n_fft"] == 2048
    # alias alone still renames
    out2 = normalize_roformer_params({"hop_length": 512})
    assert out2["stft_hop_length"] == 512
