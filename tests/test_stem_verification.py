"""Regression-tier stem-label policy + all-models sweep tool.

Counterpart of the reference's on-demand regression run
(ref: tests/regression/test_all_models_stem_verification.py). The policy is
tested hermetically with synthetic reference stems; the sweep tool is tested
with a stubbed Separator (the real all-models run needs model downloads and
is driven by tools/stem_verification.py on demand).
"""

import os

import numpy as np
import pytest

from audio_separator_tpu.io import audio as audio_io
from audio_separator_tpu.utils.audio_verification import (
    is_specialized_model, verify_stem_label)

SR = 44100
N = SR * 2  # 2 s is plenty for correlation


@pytest.fixture(scope="module")
def refs(tmp_path_factory):
    """Synthetic reference trio: uncorrelated vocal/inst, mix = sum."""
    rng = np.random.default_rng(7)
    vocal = (rng.standard_normal(N) * 0.1).astype(np.float32)
    inst = (rng.standard_normal(N) * 0.1).astype(np.float32)
    mix = vocal + inst
    return vocal, inst, mix, N


def _write(tmp_path, name, mono):
    path = str(tmp_path / name)
    audio_io.save_audio(path, np.stack([mono, mono]), SR)
    return path


def test_correct_vocal_stem_passes(refs, tmp_path):
    vocal, inst, mix, n = refs
    noisy = vocal + np.random.default_rng(1).standard_normal(n).astype(np.float32) * 0.01
    path = _write(tmp_path, "x_(Vocals)_m.wav", noisy)
    passed, msg = verify_stem_label(path, "Vocals", vocal, inst, mix, n)
    assert passed, msg


def test_mislabelled_vocal_stem_fails(refs, tmp_path):
    vocal, inst, mix, n = refs
    path = _write(tmp_path, "x_(Vocals)_m.wav", inst)
    passed, msg = verify_stem_label(path, "Vocals", vocal, inst, mix, n)
    assert not passed and "detected INSTRUMENTAL" in msg


def test_silent_primary_stem_fails(refs, tmp_path):
    vocal, inst, mix, n = refs
    path = _write(tmp_path, "x_(Instrumental)_m.wav", np.zeros(n, np.float32))
    passed, msg = verify_stem_label(path, "Instrumental", vocal, inst, mix, n)
    assert not passed and "SILENT" in msg


def test_mix_leak_fails(refs, tmp_path):
    vocal, inst, mix, n = refs
    path = _write(tmp_path, "x_(Instrumental)_m.wav", mix)
    passed, msg = verify_stem_label(path, "Instrumental", vocal, inst, mix, n)
    assert not passed and "FULL_MIX" in msg


def test_silent_sub_stem_passes(refs, tmp_path):
    vocal, inst, mix, n = refs
    path = _write(tmp_path, "x_(Drums)_m.wav", np.zeros(n, np.float32))
    passed, msg = verify_stem_label(path, "Drums", vocal, inst, mix, n)
    assert passed, msg


def test_utility_stem_mix_passthrough_passes(refs, tmp_path):
    vocal, inst, mix, n = refs
    path = _write(tmp_path, "x_(No Reverb)_m.wav", mix)
    passed, msg = verify_stem_label(path, "No Reverb", vocal, inst, mix, n)
    assert passed, msg


def test_partial_vocal_low_corr_passes(refs, tmp_path):
    vocal, inst, mix, n = refs
    # Backing vocals: weakly correlated with the full vocal reference.
    backing = (vocal * 0.3
               + np.random.default_rng(3).standard_normal(n).astype(np.float32) * 0.08)
    path = _write(tmp_path, "x_(Backing Vocals)_m.wav", backing)
    passed, msg = verify_stem_label(path, "Backing Vocals", vocal, inst, mix, n)
    assert passed, msg


def test_unknown_label_fails_with_reason(refs, tmp_path):
    vocal, inst, mix, n = refs
    path = _write(tmp_path, "x_(Mystery)_m.wav", vocal)
    passed, msg = verify_stem_label(path, "Mystery", vocal, inst, mix, n)
    assert not passed and "unknown stem type" in msg


def test_specialized_model_patterns():
    assert is_specialized_model("UVR-BVE-4B_SN-44100-1.pth")
    assert is_specialized_model("UVR-DeEcho-DeReverb.pth")
    assert is_specialized_model("x.ckpt", friendly_name="Mel Band De-Noise")
    assert not is_specialized_model("model_bs_roformer_ep_317_sdr_12.9755.ckpt")


# ---------------------------------------------------------------------------
# Sweep tool over a stubbed Separator


def test_sweep_tool_end_to_end(refs, tmp_path, monkeypatch):
    import tools.stem_verification as sweep

    vocal, inst, mix, n = refs
    fixtures = tmp_path / "inputs"
    fixtures.mkdir()
    _write(fixtures, "mardy20s.flac", mix)
    _write(fixtures,
           "mardy20s_(Vocals)_mel_band_roformer_karaoke_aufr33_viperx_sdr_10.flac",
           vocal)
    _write(fixtures,
           "mardy20s_(Instrumental)_mel_band_roformer_karaoke_aufr33_viperx_sdr_10.flac",
           inst)

    class StubSeparator:
        def __init__(self, output_dir=None, **kw):
            self.output_dir = output_dir

        def list_supported_model_files(self):
            return {"MDXC": {"Good Model": {"filename": "good.ckpt"},
                             "Bad Model": {"filename": "bad.ckpt"},
                             "Empty Model": {"filename": "empty.ckpt"}},
                    "VR": {"Broken Model": {"filename": "broken.pth"}}}

        def load_model(self, filename):
            self.filename = filename
            if filename == "broken.pth":
                raise RuntimeError("download failed")

        def separate(self, input_file):
            if self.filename == "empty.ckpt":
                return []  # produced nothing: must be FAIL, not a silent PASS
            stem = vocal if self.filename == "good.ckpt" else inst
            out = os.path.join(self.output_dir, f"t_(Vocals)_{self.filename}.wav")
            audio_io.save_audio(out, np.stack([stem, stem]), SR)
            inst_out = os.path.join(
                self.output_dir, f"t_(Instrumental)_{self.filename}.wav")
            audio_io.save_audio(inst_out, np.stack([inst, inst]), SR)
            return [out, inst_out]

    import audio_separator_tpu.separator as sep_pkg

    monkeypatch.setattr(sep_pkg, "Separator", StubSeparator)

    report = tmp_path / "report.json"
    rc = sweep.main([str(fixtures / "mardy20s.flac"), "--json", str(report)])
    assert rc == 1  # bad.ckpt mislabels vocals

    import json

    data = json.loads(report.read_text())
    assert data["counts"] == {"PASS": 1, "FAIL": 2, "SKIP": 1}
    by_model = {r["model"]: r for r in data["results"]}
    assert by_model["good.ckpt"]["status"] == "PASS"
    assert by_model["bad.ckpt"]["status"] == "FAIL"
    assert by_model["empty.ckpt"]["status"] == "FAIL"
    assert "no output files" in by_model["empty.ckpt"]["error"]
    assert by_model["broken.pth"]["status"] == "SKIP"

    # report-only + filters: only the failing model, but exit 0
    rc = sweep.main([str(fixtures / "mardy20s.flac"), "--filter", "bad",
                     "--report-only"])
    assert rc == 0
