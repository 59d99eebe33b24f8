"""Output naming / sanitization parity
(ref: tests/unit/test_stem_naming.py; common_separator.py:481-507)."""

import logging

import numpy as np
import pytest

from audio_separator_tpu.separator.common import BaseSeparator


class _Sep(BaseSeparator):
    def separate(self, *a, **k):  # pragma: no cover
        raise NotImplementedError


def make(**over):
    cfg = {
        "logger": logging.getLogger("t"),
        "model_name": "model_bs_roformer_ep_317_sdr_12.9755",
        "model_path": "/tmp/m.ckpt",
        "model_data": {"primary_stem": "Vocals"},
        "output_dir": "/tmp/out",
        "output_format": "FLAC",
        "normalization_threshold": 0.9,
        "amplification_threshold": 0.0,
        "sample_rate": 44100,
    }
    cfg.update(over)
    sep = _Sep(config=cfg)
    sep.audio_file_base = over.get("audio_file_base", "My Song")
    return sep


def test_default_naming_format():
    sep = make()
    path = sep.get_stem_output_path("Vocals", None)
    assert path == "My Song_(Vocals)_model_bs_roformer_ep_317_sdr_12.9755.flac"


def test_custom_output_names_case_insensitive():
    sep = make()
    path = sep.get_stem_output_path("Vocals", {"vocals": "lead vox take"})
    assert path == "lead vox take.flac"
    # stems without a custom entry keep the default pattern
    other = sep.get_stem_output_path("Instrumental", {"vocals": "x"})
    assert other.startswith("My Song_(Instrumental)_")


def test_filename_sanitization():
    sep = make()
    sep.audio_file_base = 'bad<name>:with"chars/\\|?*'
    path = sep.get_stem_output_path("Vocals", None)
    assert not any(c in path for c in '<>:"/\\|?*')
    assert sep.sanitize_filename("__x__") == "x"
    assert sep.sanitize_filename("a///b") == "a_b"


def test_stem_pairing_and_secondary():
    sep = make()
    assert sep.primary_stem_name == "Vocals"
    assert sep.secondary_stem_name == "Instrumental"
    sep2 = make(model_data={"primary_stem": "Drums"})
    assert sep2.secondary_stem_name == "No Drums"
