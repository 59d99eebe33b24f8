"""Stem-content verification: correlate outputs against known-good stems.

Port of the reference's regression-test classifier
(ref: tests/utils_audio_verification.py:28-120): classifies a separated stem
as VOCALS / INSTRUMENTAL / FULL_MIX / SILENT / UNCLEAR by correlation against
reference separations, and checks the label matches.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Tuple

import numpy as np

from ..io import audio as audio_io


@dataclass
class StemVerification:
    file_path: str
    label: str
    corr_vocal: float
    corr_instrumental: float
    corr_mix: float
    rms: float
    detected_content: str
    label_matches: bool


def _load_mono(path: str, sr: int = 44100) -> np.ndarray:
    pcm, _ = audio_io.load_audio(path, sample_rate=sr)
    return pcm.mean(axis=0)


def load_references(input_dir: str = "tests/inputs", sr: int = 44100):
    """Load known-good reference stems + mix → (vocal, inst, mix, min_len)."""
    ref_vocal = _load_mono(os.path.join(
        input_dir, "mardy20s_(Vocals)_mel_band_roformer_karaoke_aufr33_viperx_sdr_10.flac"), sr)
    ref_inst = _load_mono(os.path.join(
        input_dir, "mardy20s_(Instrumental)_mel_band_roformer_karaoke_aufr33_viperx_sdr_10.flac"), sr)
    ref_mix = _load_mono(os.path.join(input_dir, "mardy20s.flac"), sr)
    min_len = min(len(ref_vocal), len(ref_inst), len(ref_mix))
    return ref_vocal[:min_len], ref_inst[:min_len], ref_mix[:min_len], min_len


def classify_audio(audio_mono, ref_vocal, ref_instrumental, ref_mix, min_len):
    """Correlation classifier (thresholds per the reference)."""
    y = np.asarray(audio_mono)[:min_len]
    if len(y) < min_len:
        y = np.pad(y, (0, min_len - len(y)))
    corr_vocal = float(np.corrcoef(y, ref_vocal)[0, 1])
    corr_inst = float(np.corrcoef(y, ref_instrumental)[0, 1])
    corr_mix = float(np.corrcoef(y, ref_mix)[0, 1])
    rms = float(np.sqrt(np.mean(y ** 2)))
    if corr_mix > 0.95:
        detected = "FULL_MIX"
    elif rms < 0.005:
        detected = "SILENT"
    elif corr_vocal > corr_inst and corr_vocal > 0.5:
        detected = "VOCALS"
    elif corr_inst > corr_vocal and corr_inst > 0.5:
        detected = "INSTRUMENTAL"
    else:
        detected = "UNCLEAR"
    return corr_vocal, corr_inst, corr_mix, rms, detected


_LABEL_CONTENT = {
    "vocals": "VOCALS",
    "lead vocals": "VOCALS",
    "backing vocals": "VOCALS",
    "instrumental": "INSTRUMENTAL",
    "other": "INSTRUMENTAL",
    "no vocals": "INSTRUMENTAL",
}


def verify_stem(file_path: str, label: str, ref_vocal, ref_instrumental, ref_mix,
                min_len, sr: int = 44100) -> StemVerification:
    mono = _load_mono(file_path, sr)
    corr_vocal, corr_inst, corr_mix, rms, detected = classify_audio(
        mono, ref_vocal, ref_instrumental, ref_mix, min_len)
    expected = _LABEL_CONTENT.get(label.lower())
    matches = expected is None or detected == expected or detected == "UNCLEAR"
    return StemVerification(file_path, label, corr_vocal, corr_inst, corr_mix,
                            rms, detected, matches)
