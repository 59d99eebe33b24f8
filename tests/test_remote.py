"""Remote API integration: real HTTP server + client round trip, with the
Separator's model resolution patched to a synthetic checkpoint."""

import json
import os
import threading
import time

import numpy as np
import pytest

from audio_separator_tpu.remote.api_client import AudioSeparatorAPIClient
from audio_separator_tpu.remote.job_store import FileJobStore, InMemoryJobStore
from audio_separator_tpu.remote.output_store import LocalOutputStore
from audio_separator_tpu.remote.server import generate_file_hash, serve


def test_job_store_roundtrip(tmp_path):
    for store in (InMemoryJobStore(), FileJobStore(str(tmp_path / "jobs"))):
        store.set_job_status("abc", {"status": "queued", "progress": 0})
        store.update_job_status("abc", {"progress": 50})
        data = store.get_job_status("abc")
        assert data["progress"] == 50 and data["status"] == "queued"
        store.delete_job("abc")
        assert store.get_job_status("abc") is None


def test_output_store_roundtrip(tmp_path):
    store = LocalOutputStore(str(tmp_path / "outputs"))
    src = tmp_path / "a.txt"
    src.write_bytes(b"hello")
    store.upload_file("task1", str(src))
    assert store.list_files("task1") == ["a.txt"]
    assert store.download_file("task1", "a.txt") == b"hello"
    store.delete_task_outputs("task1")
    assert store.list_files("task1") == []


def test_file_hash_stable():
    assert generate_file_hash("a.flac") == generate_file_hash("a.flac")
    assert len(generate_file_hash("a.flac")) == 16


@pytest.fixture()
def http_server(tmp_path, monkeypatch):
    server = serve(host="127.0.0.1", port=0, work_dir=str(tmp_path / "work"))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server, f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_health_models_and_job_flow(http_server, tmp_path, monkeypatch, fixtures_dir):
    server, url = http_server
    client = AudioSeparatorAPIClient(url)

    assert client.get_server_version() != ""
    models = client.list_models(format_type="json")
    assert "MDXC" in models

    # Patch the separation pipeline: the worker's Separator.load_model/separate
    # are replaced with a passthrough writer (no checkpoints available offline).
    from audio_separator_tpu.separator.separator import Separator

    def fake_load_model(self, model_filename="default"):
        self.model_filename = model_filename if isinstance(model_filename, str) else model_filename[0]
        self.model_filenames = [self.model_filename]
        self.model_instance = object()

    def fake_separate(self, audio_file_path, custom_output_names=None):
        from audio_separator_tpu.io import audio as audio_io

        pcm, sr = audio_io.load_audio(audio_file_path, sample_rate=44100)
        out = os.path.join(self.output_dir, "out_(Vocals)_fake.flac")
        audio_io.save_audio(out, pcm[:, : sr], sr)
        return [out]

    monkeypatch.setattr(Separator, "load_model", fake_load_model)
    monkeypatch.setattr(Separator, "separate", fake_separate)

    input_path = os.path.join(fixtures_dir, "mardy20s.flac")
    result = client.separate_audio(file_path=input_path, model="whatever.ckpt")
    task_id = result["task_id"]
    assert result["status"] == "queued"

    deadline = time.time() + 60
    status = {}
    while time.time() < deadline:
        status = client.get_job_status(task_id)
        if status["status"] in ("completed", "error"):
            break
        time.sleep(0.2)
    assert status["status"] == "completed", status
    assert len(status["files"]) == 1
    entry = status["files"][0]
    out = client.download_file_by_hash(task_id, entry["hash"], entry["filename"],
                                       str(tmp_path / "dl"))
    assert os.path.getsize(out) > 1000

    # unknown task id → 404 path
    import requests

    resp = requests.get(f"{url}/status/nope", timeout=10)
    assert resp.status_code == 404


def test_remote_real_separation_end_to_end(tmp_path):
    """Full remote stack with a REAL model: upload → worker separates with a
    local synthetic checkpoint → poll → download stems (no mocks)."""
    import numpy as np

    from audio_separator_tpu.io import audio as audio_io
    from test_ensemble_e2e import SR, _make_model

    model_dir = str(tmp_path / "models")
    os.makedirs(model_dir)
    model_name = _make_model(model_dir, "remote", seed=9)

    server = serve(host="127.0.0.1", port=0, work_dir=str(tmp_path / "work"),
                   model_file_dir=model_dir)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        client = AudioSeparatorAPIClient(url)

        t = np.arange(SR) / SR
        mix = np.stack([np.sin(2 * np.pi * 440 * t),
                        np.sin(2 * np.pi * 330 * t)]).astype(np.float32) * 0.3
        in_path = str(tmp_path / "song.wav")
        audio_io.save_audio(in_path, mix, SR)

        result = client.separate_audio_and_wait(
            file_path=in_path, model=model_name,
            output_dir=str(tmp_path / "dl"), timeout=300, poll_interval=1)
        files = result.get("downloaded_files")
        assert files, result
        assert len(files) == 2
        for f in files:
            path = f if os.path.isabs(f) else os.path.join(str(tmp_path / "dl"), f)
            pcm, sr = audio_io.load_audio(path)
            assert sr == SR and np.isfinite(pcm).all()
    finally:
        server.shutdown()
