"""Parity vs the reference's OWN pipeline code (not emulations).

Two tiers:

* The ``*_pipeline_parity`` tests run every suite pass at small geometry —
  the reference's real MDXCSeparator/MDXSeparator/VRSeparator loops and
  demucs apply_model (loaded via ref_pipeline.py) against our production
  separators, end to end (written stems on our side).
* ``test_production_parity_report_committed`` validates the committed
  PARITY.json produced by tools/parity_report.py at FULL production geometry
  (flagship 62-band/depth-12/dim-512 BS-RoFormer, Kim-class Mel, HQ3-class
  MDX ONNX, 4band_v2 VR, real-shape htdemucs on a >=30 s track) — the slow
  generation is a tool run; the assertion that its committed evidence meets
  the bar runs on every suite pass.

Thresholds: parity SDR >= 40 dB per stem makes any museval-SDR drift of a
downstream quality number <= 0.1 dB (BASELINE target) trivially satisfied;
small-geometry fp32 runs actually land at 90-130 dB.
"""

import json
import os

import numpy as np
import pytest

from parity_cases import htdemucs_case, mdx_case, roformer_case, vr_case

MIN_PARITY_SDR = 40.0


def _assert_ok(deltas, floor=MIN_PARITY_SDR):
    for name, d in deltas.items():
        assert d.parity_sdr_db >= floor, (name, d.as_dict())
        assert np.isfinite(d.max_abs)


def test_bs_roformer_pipeline_parity(tmp_path):
    geom = dict(dim=64, depth=2, stereo=True, num_stems=2,
                time_transformer_depth=1, freq_transformer_depth=1,
                freqs_per_bands=(2, 2, 4, 8, 16, 32, 64, 129),
                dim_head=16, heads=4, stft_n_fft=512, stft_hop_length=128,
                stft_win_length=512, mask_estimator_depth=2)
    deltas, _ = roformer_case("bs", geom, seconds=4.0, tmp_dir=str(tmp_path))
    _assert_ok(deltas)


def test_mel_roformer_pipeline_parity(tmp_path):
    geom = dict(dim=48, depth=2, stereo=True, num_stems=2,
                time_transformer_depth=1, freq_transformer_depth=1,
                num_bands=24, sample_rate=44100, dim_head=16, heads=4,
                stft_n_fft=512, stft_hop_length=128, stft_win_length=512,
                mask_estimator_depth=1)
    deltas, _ = roformer_case("mel", geom, seconds=4.0, tmp_dir=str(tmp_path))
    _assert_ok(deltas)


def test_mdx_pipeline_parity(tmp_path):
    geom = dict(n_fft=1024, dim_f=256, dim_t_log2=5, segment_size=32,
                hop_length=512, channels=8, scales=1, compensate=1.035)
    deltas, _ = mdx_case(geom, seconds=3.0, tmp_dir=str(tmp_path))
    _assert_ok(deltas)


def test_vr_pipeline_parity(tmp_path):
    deltas, _ = vr_case("4band_v2", 31191, seconds=4.0,
                        tmp_dir=str(tmp_path), window_size=320)
    _assert_ok(deltas)


def test_vr_pipeline_parity_tta_postprocess(tmp_path):
    """TTA + aggression + post-process + high-end mirroring through the
    reference's real inference_vr/spec_to_wav."""
    deltas, _ = vr_case("4band_v2", 31191, seconds=4.0,
                        tmp_dir=str(tmp_path), window_size=320,
                        aggression=10, enable_tta=True,
                        enable_post_process=True, high_end_process=True)
    _assert_ok(deltas)


def test_htdemucs_pipeline_parity():
    geom = dict(channels=8, nfft=1024, depth=3, t_layers=3, t_heads=4,
                segment=0.5, t_dropout=0.0)
    deltas, _ = htdemucs_case(geom, seconds=2.0)
    _assert_ok(deltas)


# ---------------------------------------------------------------------------
# Committed production-geometry evidence


def test_production_parity_report_committed():
    """PARITY.json (from tools/parity_report.py) exists, covers all five
    production configs, and every stem meets the parity bar at FULL geometry."""
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY.json")
    assert os.path.exists(path), "run tools/parity_report.py to generate"
    with open(path) as f:
        report = json.load(f)
    cases = report["cases"]
    expected = {"bs_roformer_flagship", "mel_roformer_kim", "mdx_inst_hq3",
                "vr_4band_v2", "htdemucs"}
    assert expected <= set(cases), sorted(cases)
    for name in expected:
        case = cases[name]
        assert case["meta"]["seconds"] >= 30.0, name
        for stem, delta in case["stems"].items():
            assert delta["parity_sdr_db"] >= MIN_PARITY_SDR, (name, stem, delta)
    # geometry spot checks: the report must really be at production scale
    assert cases["bs_roformer_flagship"]["meta"]["dim"] == 512
    assert cases["bs_roformer_flagship"]["meta"]["depth"] == 12
    assert cases["bs_roformer_flagship"]["meta"]["params_m"] > 200
    assert cases["mdx_inst_hq3"]["meta"]["n_fft"] == 6144
    assert cases["mdx_inst_hq3"]["meta"]["dim_f"] == 2560
    assert cases["vr_4band_v2"]["meta"]["bins"] == 672
    assert cases["htdemucs"]["meta"]["nfft"] == 4096


@pytest.mark.skipif(not os.environ.get("AUDSEP_PARITY_QUICK"),
                    reason="opt-in: AUDSEP_PARITY_QUICK=1 re-derives every "
                           "parity case at reduced geometry (~minutes)")
def test_parity_quick_rederivation():
    """Runs tools/parity_report.py --quick end to end: every PARITY case
    re-derived at reduced depth/width through the SAME code paths, asserted
    within 3 dB of the committed PARITY_QUICK.json (the tool exits non-zero
    on regression). The cheap between-rounds gate for the 4,000 s full tier."""
    import subprocess
    import sys as _sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "parity_report.py"),
         "--quick"],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert cases["htdemucs"]["meta"]["channels"] == 48
