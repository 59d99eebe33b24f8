"""Deployment adapters: ASGI app protocol tests + platform-SDK-mocked tests
of the Modal and Cloud Run entry points (ref: remote/deploy_modal.py,
remote/deploy_cloudrun.py)."""

import asyncio
import importlib
import json
import os
import sys
import time
import types

import pytest


# ---------------------------------------------------------------------------
# ASGI driver


def asgi_request(app, method, path, headers=None, body=b""):
    """Drive one request through the raw ASGI 3.0 interface."""
    messages = []

    async def run():
        scope = {
            "type": "http", "method": method, "path": path,
            "headers": [(k.lower().encode(), v.encode())
                        for k, v in (headers or {}).items()],
        }
        received = [False]

        async def receive():
            if received[0]:
                return {"type": "http.disconnect"}
            received[0] = True
            return {"type": "http.request", "body": body, "more_body": False}

        async def send(message):
            messages.append(message)

        await app(scope, receive, send)

    asyncio.run(run())
    status = next(m["status"] for m in messages
                  if m["type"] == "http.response.start")
    payload = b"".join(m.get("body", b"") for m in messages
                       if m["type"] == "http.response.body")
    return status, payload


def multipart_body(fields, file_field=None):
    boundary = "testboundary123"
    parts = []
    for name, value in fields.items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{name}"'
            f"\r\n\r\n{value}\r\n".encode())
    if file_field:
        fname, data = file_field
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
            f'filename="{fname}"\r\nContent-Type: application/octet-stream'
            f"\r\n\r\n".encode() + data + b"\r\n")
    parts.append(f"--{boundary}--\r\n".encode())
    return (b"".join(parts),
            f"multipart/form-data; boundary={boundary}")


# ---------------------------------------------------------------------------
# ASGI app


def test_asgi_info_health_models_presets(tmp_path):
    from audio_separator_tpu.remote.asgi import create_app

    app = create_app(work_dir=str(tmp_path / "work"))
    status, body = asgi_request(app, "GET", "/")
    assert status == 200
    info = json.loads(body)
    assert "/presets" in info["endpoints"]

    status, body = asgi_request(app, "GET", "/health")
    assert status == 200 and json.loads(body)["status"] == "healthy"

    status, body = asgi_request(app, "GET", "/models-json")
    assert status == 200 and "MDXC" in json.loads(body)

    status, body = asgi_request(app, "GET", "/presets")
    assert status == 200
    presets = json.loads(body)
    assert isinstance(presets, dict) and len(presets) >= 1

    status, _ = asgi_request(app, "GET", "/nope")
    assert status == 404
    status, _ = asgi_request(app, "GET", "/status/unknown-task")
    assert status == 404


def test_asgi_separate_job_flow(tmp_path, monkeypatch, fixtures_dir):
    from audio_separator_tpu.remote.asgi import create_app
    from audio_separator_tpu.separator.separator import Separator

    def fake_load_model(self, model_filename="default"):
        self.model_filename = model_filename
        self.model_instance = object()

    def fake_separate(self, audio_file_path, custom_output_names=None):
        from audio_separator_tpu.io import audio as audio_io

        pcm, sr = audio_io.load_audio(audio_file_path, sample_rate=44100)
        out = os.path.join(self.output_dir, "out_(Vocals)_fake.flac")
        audio_io.save_audio(out, pcm[:, : sr], sr)
        return [out]

    monkeypatch.setattr(Separator, "load_model", fake_load_model)
    monkeypatch.setattr(Separator, "separate", fake_separate)

    app = create_app(work_dir=str(tmp_path / "work"))
    with open(os.path.join(fixtures_dir, "mardy20s.flac"), "rb") as f:
        audio_bytes = f.read()
    body, ctype = multipart_body({"model": "whatever.ckpt"},
                                 ("mardy20s.flac", audio_bytes))
    status, payload = asgi_request(app, "POST", "/separate",
                                   {"Content-Type": ctype}, body)
    assert status == 200, payload
    task_id = json.loads(payload)["task_id"]

    deadline = time.time() + 60
    data = {}
    while time.time() < deadline:
        status, payload = asgi_request(app, "GET", f"/status/{task_id}")
        data = json.loads(payload)
        if data["status"] in ("completed", "error"):
            break
        time.sleep(0.2)
    assert data["status"] == "completed", data
    entry = data["files"][0]
    status, blob = asgi_request(
        app, "GET", f"/download/{task_id}/{entry['hash']}")
    assert status == 200 and len(blob) > 1000

    # missing file and malformed POSTs
    status, _ = asgi_request(app, "GET", f"/download/{task_id}/deadbeef")
    assert status == 404
    status, _ = asgi_request(app, "POST", "/separate",
                             {"Content-Type": "application/json"}, b"{}")
    assert status == 400
    body2, ctype2 = multipart_body({"model": "m.ckpt"})
    status, _ = asgi_request(app, "POST", "/separate",
                             {"Content-Type": ctype2}, body2)
    assert status == 400  # no file and no gcs_uri


def test_asgi_api_key_gate(tmp_path, monkeypatch):
    from audio_separator_tpu.remote.asgi import create_app

    monkeypatch.setenv("AUDSEP_API_KEY", "sekrit")
    app = create_app(work_dir=str(tmp_path / "work"))
    status, _ = asgi_request(app, "GET", "/status/x")
    assert status == 401
    status, _ = asgi_request(app, "GET", "/status/x",
                             {"Authorization": "Bearer sekrit"})
    assert status == 404  # authorized; task simply doesn't exist
    status, _ = asgi_request(app, "GET", "/health")
    assert status == 200  # health stays open


# ---------------------------------------------------------------------------
# Modal entry point (SDK mocked)


class _FakeModalFunction:
    def __init__(self, fn, kwargs):
        self.fn = fn
        self.kwargs = kwargs

    def __call__(self, *a, **k):
        return self.fn(*a, **k)


class _FakeModalApp:
    def __init__(self, name):
        self.name = name
        self.functions = {}

    def function(self, **kwargs):
        def deco(fn):
            wrapped = _FakeModalFunction(fn, kwargs)
            self.functions[fn.__name__] = wrapped
            return wrapped
        return deco


def _install_fake_modal(monkeypatch):
    fake = types.ModuleType("modal")
    fake.App = _FakeModalApp

    class Image:
        @staticmethod
        def debian_slim(python_version=None):
            return Image()

        def pip_install(self, *a, **k):
            return self

        def apt_install(self, *a, **k):
            return self

        def add_local_python_source(self, *a, **k):
            return self

    class Volume:
        commits = 0
        reloads = 0

        @staticmethod
        def from_name(name, create_if_missing=False):
            v = Volume()
            v.name = name
            return v

        def commit(self):
            Volume.commits += 1

        def reload(self):
            Volume.reloads += 1

    def asgi_app():
        def deco(fn):
            fn.__modal_asgi__ = True
            return fn
        return deco

    fake.Image = Image
    fake.Volume = Volume
    fake.asgi_app = asgi_app
    monkeypatch.setitem(sys.modules, "modal", fake)
    return fake


def test_deploy_modal_entry_point(monkeypatch, tmp_path):
    _install_fake_modal(monkeypatch)
    sys.modules.pop("audio_separator_tpu.remote.deploy_modal", None)
    mod = importlib.import_module("audio_separator_tpu.remote.deploy_modal")

    assert mod.app.name == "audio-separator"
    # The reference's function surface (deploy_modal.py:152-830).
    for name in ("api", "separate_audio_function", "get_job_status_function",
                 "get_file_by_hash_function", "list_available_models",
                 "get_simplified_models"):
        assert name in mod.app.functions, name
    # Volume wiring mirrors the reference: storage + models mounts.
    api_kwargs = mod.app.functions["api"].kwargs
    assert set(api_kwargs["volumes"]) == {"/storage", "/models"}
    assert mod.app.functions["api"].fn.__modal_asgi__

    # The asgi factory returns a servable app (don't touch /storage on CI).
    monkeypatch.setattr(
        mod, "api", mod.app.functions["api"], raising=False)
    models = mod.app.functions["list_available_models"]
    listing = models()
    assert "MDXC" in listing

    sys.modules.pop("audio_separator_tpu.remote.deploy_modal", None)


def test_deploy_modal_separation_runs_to_completion(monkeypatch):
    """separate_audio_function must finish the job INSIDE the invocation
    (Modal can reclaim the container once the call returns) and commit the
    volume only after the terminal status exists."""
    fake = _install_fake_modal(monkeypatch)
    sys.modules.pop("audio_separator_tpu.remote.deploy_modal", None)
    mod = importlib.import_module("audio_separator_tpu.remote.deploy_modal")

    events = []

    class StubService:
        def submit(self, filename, file_bytes, fields):
            events.append("submit")
            return "t1"

        def wait(self, task_id, timeout=None, poll_interval=1.0):
            events.append("wait")
            return {"task_id": task_id, "status": "completed",
                    "files": ["x_(Vocals).wav"]}

    monkeypatch.setattr(mod, "_shared_service", lambda: StubService())
    commits_before = fake.Volume.commits
    out = mod.app.functions["separate_audio_function"]("a.wav", b"bytes", {})
    assert out["status"] == "completed"
    assert events == ["submit", "wait"]  # wait happens before return
    assert fake.Volume.commits == commits_before + 1
    sys.modules.pop("audio_separator_tpu.remote.deploy_modal", None)


def test_separator_service_wait_reaches_terminal_status():
    from audio_separator_tpu.remote.server import SeparatorService

    svc = SeparatorService.__new__(SeparatorService)  # no worker thread
    states = iter([{"status": "queued"}, {"status": "processing"},
                   {"status": "completed", "files": []}])
    svc.get_status = lambda task_id: next(states)
    out = svc.wait("t", poll_interval=0.0)
    assert out["status"] == "completed"

    svc.get_status = lambda task_id: {"status": "processing"}
    out = svc.wait("t", timeout=0.05, poll_interval=0.01)
    assert out["status"] == "processing"  # timeout returns last observation


# ---------------------------------------------------------------------------
# Cloud Run entry point (SDK mocked)


def test_deploy_cloudrun_model_sync_and_service(monkeypatch, tmp_path):
    from audio_separator_tpu.remote import deploy_cloudrun as dc

    # Mocked GCS client: two blobs, one already cached with matching size.
    class Blob:
        def __init__(self, name, data):
            self.name, self._data = name, data
            self.size = len(data)

        def download_to_filename(self, path):
            with open(path, "wb") as f:
                f.write(self._data)

    class Bucket:
        def __init__(self, blobs):
            self._blobs = blobs

        def list_blobs(self):
            return list(self._blobs)

    class Client:
        def __init__(self, blobs):
            self._bucket = Bucket(blobs)

        def bucket(self, name):
            return self._bucket

    model_dir = tmp_path / "models"
    model_dir.mkdir()
    cached = model_dir / "cached.ckpt"
    cached.write_bytes(b"x" * 10)
    blobs = [Blob("cached.ckpt", b"y" * 10), Blob("new.onnx", b"z" * 20)]

    ok = dc.download_models_from_gcs(bucket_name="bkt",
                                     model_dir=str(model_dir),
                                     client=Client(blobs))
    assert ok
    assert cached.read_bytes() == b"x" * 10  # size-matched → skipped
    assert (model_dir / "new.onnx").read_bytes() == b"z" * 20

    # build_service honours env store selection + work dir.
    monkeypatch.setenv("AUDSEP_WORK_DIR", str(tmp_path / "work"))
    monkeypatch.setenv("AUDSEP_JOB_STORE", "file")
    monkeypatch.setattr(dc, "WORK_DIR", str(tmp_path / "work"))
    service = dc.build_service()
    from audio_separator_tpu.remote.job_store import FileJobStore

    assert isinstance(service.jobs, FileJobStore)

    # create_app returns a servable ASGI app without a model bucket.
    monkeypatch.setattr(dc, "MODEL_BUCKET", None)
    monkeypatch.setattr(dc, "build_service", lambda: service)
    app = dc.create_app()
    status, body = asgi_request(app, "GET", "/health")
    assert status == 200
