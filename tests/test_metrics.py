"""BSS Eval implementation sanity + stem verification classifier tests."""

import os

import numpy as np
import pytest

from audio_separator_tpu.utils.metrics import bss_eval, simple_sdr


def _tones(n, sr=8000):
    t = np.arange(n) / sr
    s1 = np.sin(2 * np.pi * 440 * t)
    s2 = np.sign(np.sin(2 * np.pi * 123 * t)) * 0.5
    return s1.astype(np.float64), s2.astype(np.float64)


def test_simple_sdr_perfect_and_noisy():
    ref = np.random.default_rng(0).standard_normal(10000)
    assert simple_sdr(ref, ref) > 90
    noisy = ref + 0.1 * np.random.default_rng(1).standard_normal(10000)
    sdr = simple_sdr(noisy, ref)
    assert 15 < sdr < 25  # ~20 dB for 10% noise


def test_bss_eval_perfect_separation():
    s1, s2 = _tones(16000)
    res = bss_eval([s1[None], s2[None]], [s1[None], s2[None]], sample_rate=8000)
    assert res[0]["SDR"] > 40
    assert res[1]["SDR"] > 40


def test_bss_eval_interference_detected():
    s1, s2 = _tones(16000)
    est1 = s1 + 0.3 * s2  # vocal estimate contaminated by source 2
    res = bss_eval([s1[None], s2[None]], [est1[None], s2[None]], sample_rate=8000)
    # projection model: interference explains the bleed → SIR finite & lower
    # than for the clean source; SDR stays high because bleed is interference
    assert res[0]["SIR"] < res[1]["SIR"]
    assert res[0]["SIR"] < 30


def test_bss_eval_filtered_target_allowed():
    """A short FIR filtering of the target should barely hurt SDR (the
    512-tap projection absorbs it) while additive noise should."""
    rng = np.random.default_rng(2)
    s1 = rng.standard_normal(16000)
    s2 = rng.standard_normal(16000)
    fir = np.array([0.9, 0.1, -0.05])
    filtered = np.convolve(s1, fir)[:16000]
    res_f = bss_eval([s1[None], s2[None]], [filtered[None], s2[None]], sample_rate=8000)
    noisy = s1 + 0.3 * rng.standard_normal(16000)
    res_n = bss_eval([s1[None], s2[None]], [noisy[None], s2[None]], sample_rate=8000)
    assert res_f[0]["SDR"] > 40  # filter absorbed by projection
    assert res_n[0]["SDR"] < 15  # additive noise is artifact


def test_stem_verification_classifier(fixtures_dir):
    from audio_separator_tpu.utils.audio_verification import (
        classify_audio,
        load_references,
        verify_stem,
    )

    ref_vocal, ref_inst, ref_mix, min_len = load_references(fixtures_dir)
    _, _, corr_mix, _, detected = classify_audio(
        ref_mix, ref_vocal, ref_inst, ref_mix, min_len)
    assert detected == "FULL_MIX" and corr_mix > 0.99

    _, _, _, _, detected_v = classify_audio(
        ref_vocal, ref_vocal, ref_inst, ref_mix, min_len)
    assert detected_v == "VOCALS"

    import os

    result = verify_stem(
        os.path.join(fixtures_dir,
                     "mardy20s_(Instrumental)_mel_band_roformer_karaoke_aufr33_viperx_sdr_10.flac"),
        "Instrumental", ref_vocal, ref_inst, ref_mix, min_len)
    assert result.detected_content == "INSTRUMENTAL"
    assert result.label_matches


def test_isr_differs_from_sar_and_nan_for_mono():
    """ISR is the images-model spatial ratio: distinct from SAR on stereo
    stems, NaN for mono (no spatial subspace)."""
    rng = np.random.default_rng(3)
    n = 44100 * 2
    ref_l = rng.standard_normal(n).astype(np.float64)
    # stereo image: slightly different channels
    ref = np.stack([ref_l, 0.8 * ref_l + 0.2 * rng.standard_normal(n)])
    other = rng.standard_normal((2, n))
    est = ref + 0.1 * rng.standard_normal((2, n))

    res = bss_eval([ref, other], [est, other], window_seconds=1.0)
    r = res[0]
    assert np.isfinite(r["ISR"]) and np.isfinite(r["SAR"])
    assert abs(r["ISR"] - r["SAR"]) > 1e-6

    res_mono = bss_eval([ref.mean(0), other.mean(0)],
                        [est.mean(0), other.mean(0)], window_seconds=1.0)
    assert np.isnan(res_mono[0]["ISR"])


def test_scores_entry_schema_matches_reference_snapshot():
    """tools/model_metrics.make_entry emits entries byte-compatible in shape
    with the reference's models-scores.json (carried in data/scores.json)."""
    import importlib.util
    import json
    from importlib import resources

    spec = importlib.util.spec_from_file_location(
        "model_metrics",
        os.path.join(os.path.dirname(__file__), "..", "tools", "model_metrics.py"))
    mm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mm)

    with resources.files("audio_separator_tpu.data").joinpath(
            "scores.json").open("r", encoding="utf-8") as f:
        snapshot = json.load(f)
    ref_entry = snapshot["1_HP-UVR.pth"]

    got = mm.make_entry(
        "VR Arch Single Model v5: 1_HP-UVR",
        [{"track_name": "Synth - Track",
          "scores": {"vocals": {"SDR": 5.248713, "SIR": 15.46238,
                                "SAR": 4.833914, "ISR": 8.885696},
                     "instrumental": {"SDR": 14.89268, "SIR": 19.31578,
                                      "SAR": 18.24, "ISR": 18.81073}}}],
        "instrumental")

    # Exact key structure parity, level by level.
    assert list(got) == list(ref_entry)
    assert list(got["track_scores"][0]) == list(ref_entry["track_scores"][0])
    ref_stem_scores = ref_entry["track_scores"][0]["scores"]
    got_stem_scores = got["track_scores"][0]["scores"]
    assert set(got_stem_scores) == set(ref_stem_scores)
    for stem in got_stem_scores:
        assert list(got_stem_scores[stem]) == ["SDR", "SIR", "SAR", "ISR"]
    for stem, metrics in got["median_scores"].items():
        assert list(metrics) == ["SDR", "SIR", "SAR", "ISR"]
        for v in metrics.values():
            assert v == float(f"{v:.6g}")  # 6-significant-digit policy
    assert got["stems"] == ref_entry["stems"]
    assert got["target_stem"] == ref_entry["target_stem"]


def test_packaged_scores_carry_reference_track_scores():
    """data/scores.json carries the reference's full per-track museval data
    (ref models-scores.json: 115 models, track_scores per MUSDB18 track)."""
    import json
    from importlib import resources

    with resources.files("audio_separator_tpu.data").joinpath(
            "scores.json").open("r", encoding="utf-8") as f:
        scores = json.load(f)
    assert len(scores) == 115
    with_tracks = [k for k, v in scores.items() if v.get("track_scores")]
    assert len(with_tracks) >= 90  # 96 of 115 reference entries carry per-track data
    entry = scores[with_tracks[0]]
    assert {"model_name", "track_scores", "median_scores", "stems",
            "target_stem"} <= set(entry)
    rec = entry["track_scores"][0]
    stem_scores = next(iter(rec["scores"].values()))
    assert {"SDR", "SIR", "SAR", "ISR"} <= set(stem_scores)
