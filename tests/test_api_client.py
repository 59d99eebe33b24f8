"""Remote API client unit tests over a mocked requests session
(counterpart of the reference's tests/unit/test_remote_api_client.py)."""

import json

import pytest

from audio_separator_tpu.remote.api_client import AudioSeparatorAPIClient


class FakeResponse:
    def __init__(self, payload=None, content=b"", status=200):
        self._payload = payload
        self.content = content
        self.status_code = status

    def raise_for_status(self):
        if self.status_code >= 400:
            import requests

            raise requests.HTTPError(f"{self.status_code}")

    def json(self):
        return self._payload


class FakeSession:
    """Scripted session: queues of responses per (method, path-prefix)."""

    def __init__(self):
        self.headers = {}
        self.calls = []
        self.routes = {}

    def route(self, method, prefix, responses):
        self.routes[(method, prefix)] = list(responses)

    def _dispatch(self, method, url, **kwargs):
        self.calls.append((method, url, kwargs))
        for (m, prefix), queue in self.routes.items():
            if m == method and prefix in url:
                return queue.pop(0) if len(queue) > 1 else queue[0]
        raise AssertionError(f"unrouted {method} {url}")

    def get(self, url, **kw):
        return self._dispatch("GET", url, **kw)

    def post(self, url, **kw):
        return self._dispatch("POST", url, **kw)


@pytest.fixture
def client(monkeypatch):
    monkeypatch.delenv("AUDSEP_API_KEY", raising=False)
    c = AudioSeparatorAPIClient("http://host:1/")
    c.session = FakeSession()
    return c


def test_api_key_header_from_env(monkeypatch):
    monkeypatch.setenv("AUDSEP_API_KEY", "sekrit")
    c = AudioSeparatorAPIClient("http://host:1")
    assert c.session.headers["X-API-Key"] == "sekrit"
    # explicit arg wins over env
    c2 = AudioSeparatorAPIClient("http://host:1", api_key="other")
    assert c2.session.headers["X-API-Key"] == "other"


def test_separate_audio_argument_validation(client, tmp_path):
    with pytest.raises(ValueError, match="either file_path or gcs_uri"):
        client.separate_audio()
    f = tmp_path / "x.wav"
    f.write_bytes(b"RIFF")
    with pytest.raises(ValueError, match="not both"):
        client.separate_audio(file_path=str(f), gcs_uri="gs://b/x.wav")
    with pytest.raises(FileNotFoundError):
        client.separate_audio(file_path=str(tmp_path / "missing.wav"))


def test_separate_audio_model_selection_priority(client, tmp_path):
    f = tmp_path / "x.wav"
    f.write_bytes(b"RIFF")
    client.session.route("POST", "/separate",
                         [FakeResponse({"task_id": "t1", "status": "queued"})])
    out = client.separate_audio(file_path=str(f), model="solo.ckpt",
                                models=["a.ckpt", "b.ckpt"], preset="karaoke")
    assert out["task_id"] == "t1"
    _, _, kwargs = client.session.calls[-1]
    data = kwargs["data"]
    # preset beats models beats model (server-side semantics mirrored)
    assert data["preset"] == "karaoke"
    assert "models" not in data and "model" not in data

    client.separate_audio(file_path=str(f), model="solo.ckpt",
                          models=["a.ckpt", "b.ckpt"])
    data = client.session.calls[-1][2]["data"]
    assert json.loads(data["models"]) == ["a.ckpt", "b.ckpt"]
    assert "model" not in data


def test_wait_polls_to_completion_and_downloads(client, tmp_path):
    f = tmp_path / "x.wav"
    f.write_bytes(b"RIFF")
    client.session.route("POST", "/separate",
                         [FakeResponse({"task_id": "t2", "status": "queued"})])
    client.session.route("GET", "/status/t2", [
        FakeResponse({"status": "queued"}),
        FakeResponse({"status": "processing", "progress": 50}),
        FakeResponse({"status": "completed",
                      "files": [{"hash": "h1", "filename": "x_(Vocals)_m.flac"}]}),
    ])
    client.session.route("GET", "/download/t2/h1",
                         [FakeResponse(content=b"FLACDATA")])
    out = client.separate_audio_and_wait(
        file_path=str(f), model="m.ckpt", output_dir=str(tmp_path),
        poll_interval=0.0)
    assert out["status"]["status"] == "completed"
    assert len(out["downloaded_files"]) == 1
    with open(out["downloaded_files"][0], "rb") as fh:
        assert fh.read() == b"FLACDATA"


def test_wait_raises_on_remote_error(client, tmp_path):
    f = tmp_path / "x.wav"
    f.write_bytes(b"RIFF")
    client.session.route("POST", "/separate",
                         [FakeResponse({"task_id": "t3", "status": "queued"})])
    client.session.route("GET", "/status/t3",
                         [FakeResponse({"status": "error", "error": "bad model"})])
    with pytest.raises(RuntimeError, match="bad model"):
        client.separate_audio_and_wait(file_path=str(f), model="m",
                                       poll_interval=0.0)


def test_wait_times_out(client, tmp_path):
    f = tmp_path / "x.wav"
    f.write_bytes(b"RIFF")
    client.session.route("POST", "/separate",
                         [FakeResponse({"task_id": "t4", "status": "queued"})])
    client.session.route("GET", "/status/t4",
                         [FakeResponse({"status": "processing"})])
    with pytest.raises(TimeoutError):
        client.separate_audio_and_wait(file_path=str(f), model="m",
                                       timeout=0, poll_interval=0.0)


def test_download_filename_cannot_escape_output_dir(client, tmp_path):
    client.session.route("GET", "/download/t5/hh",
                         [FakeResponse(content=b"X")])
    out = client.download_file_by_hash("t5", "hh", "../../../etc/evil.wav",
                                       output_dir=str(tmp_path))
    assert out == str(tmp_path / "evil.wav")  # traversal stripped


def test_list_models_filter(client):
    client.session.route("GET", "/models", [FakeResponse({
        "Model A": {"stems": ["vocals"]},
        "Model B": {"stems": ["drums"]},
    })])
    got = client.list_models(filter_by="vocals")
    assert list(got) == ["Model A"]


def test_server_version(client):
    client.session.route("GET", "/health",
                         [FakeResponse({"status": "healthy", "version": "9.9"})])
    assert client.get_server_version() == "9.9"
