"""CLI tests (patched Separator, mirroring the reference's test_cli.py
strategy)."""

import json
from unittest import mock

import pytest

from audio_separator_tpu.utils import cli


def run_cli(argv):
    return cli.main(argv)


def test_no_args_prints_help_and_exits():
    with pytest.raises(SystemExit) as excinfo:
        run_cli([])
    assert excinfo.value.code == 1


def test_list_models_exits_zero(capsys):
    with pytest.raises(SystemExit) as excinfo:
        run_cli(["--list_models", "--list_limit", "3"])
    assert excinfo.value.code == 0
    out = capsys.readouterr().out
    assert "Model Filename" in out


def test_list_models_json(capsys):
    with pytest.raises(SystemExit):
        run_cli(["--list_models", "--list_format", "json"])
    data = json.loads(capsys.readouterr().out)
    assert "MDXC" in data


def test_list_presets(capsys):
    with pytest.raises(SystemExit):
        run_cli(["--list_presets"])
    assert "karaoke" in capsys.readouterr().out


def test_separate_invokes_separator(monkeypatch, tmp_path):
    instances = []

    class FakeSeparator:
        def __init__(self, **kwargs):
            self.kwargs = kwargs
            instances.append(self)

        def load_model(self, model_filename=None):
            self.loaded = model_filename

        def separate(self, files, custom_output_names=None):
            self.separated = (files, custom_output_names)
            return ["out_(Vocals)_x.flac"]

    monkeypatch.setattr("audio_separator_tpu.separator.Separator", FakeSeparator)
    run_cli(["song.flac", "-m", "model.ckpt", "--output_format", "MP3",
             "--mdxc_overlap", "4", "--custom_output_names",
             '{"Vocals": "v"}'])
    sep = instances[0]
    assert sep.kwargs["output_format"] == "MP3"
    assert sep.kwargs["mdxc_params"]["overlap"] == 4
    assert sep.loaded == "model.ckpt"
    assert sep.separated[0] == ["song.flac"]
    assert sep.separated[1] == {"Vocals": "v"}


def test_separate_with_extra_models_builds_ensemble(monkeypatch):
    loaded = {}

    class FakeSeparator:
        def __init__(self, **kwargs):
            pass

        def load_model(self, model_filename=None):
            loaded["models"] = model_filename

        def separate(self, files, custom_output_names=None):
            return []

    monkeypatch.setattr("audio_separator_tpu.separator.Separator", FakeSeparator)
    run_cli(["song.flac", "-m", "a.ckpt", "--extra_models", "b.onnx"])
    assert loaded["models"] == ["a.ckpt", "b.onnx"]
