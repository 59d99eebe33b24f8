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


def test_service_concurrent_workers(tmp_path, monkeypatch):
    """workers=2 runs queued jobs concurrently (AUDSEP_SERVER_WORKERS /
    serve(workers=) plumbing): with a fake separate that sleeps, two jobs'
    processing windows must overlap; all jobs complete."""
    from audio_separator_tpu.remote.server import SeparatorService
    from audio_separator_tpu.separator.separator import Separator

    windows = []
    lock = threading.Lock()

    def fake_load_model(self, model_filename="default"):
        self.model_filename = str(model_filename)
        self.model_filenames = [self.model_filename]
        self.model_instance = object()

    def fake_separate(self, audio_file_path, custom_output_names=None):
        t0 = time.time()
        time.sleep(0.5)
        out = os.path.join(self.output_dir, "out_(Vocals)_fake.wav")
        with open(out, "wb") as f:
            f.write(b"RIFF" + b"\0" * 64)
        with lock:
            windows.append((t0, time.time()))
        return [out]

    monkeypatch.setattr(Separator, "load_model", fake_load_model)
    monkeypatch.setattr(Separator, "separate", fake_separate)
    # This test measures WORKER overlap; same-settings jobs would otherwise
    # coalesce into one engine group (test_service_coalesces_jobs covers that).
    monkeypatch.setenv("AUDSEP_SERVER_COALESCE", "1")

    service = SeparatorService(work_dir=str(tmp_path / "work"), workers=2)
    assert service.workers == 2
    ids = [service.submit(f"t{i}.wav", b"x", {"model": "m.ckpt"})
           for i in range(4)]
    for tid in ids:
        st = service.wait(tid, timeout=30)
        assert st and st["status"] == "completed", st

    overlapped = any(
        a0 < b1 and b0 < a1
        for i, (a0, a1) in enumerate(windows)
        for (b0, b1) in windows[i + 1:])
    assert overlapped, windows


def test_service_workers_env_default(tmp_path, monkeypatch):
    monkeypatch.setenv("AUDSEP_SERVER_WORKERS", "3")
    from audio_separator_tpu.remote.server import SeparatorService

    service = SeparatorService(work_dir=str(tmp_path / "work"))
    assert service.workers == 3


def test_firestore_job_store_with_fake_client():
    """FirestoreJobStore maps the store interface onto a Firestore client
    (ref: remote/job_store.py:14-73) — exercised against an in-memory fake."""
    import time as _time

    from audio_separator_tpu.remote.job_store import FirestoreJobStore

    docs = {}

    class FakeDoc:
        def __init__(self, key):
            self.key = key
            self.reference = self

        @property
        def exists(self):
            return self.key in docs

        def to_dict(self):
            return dict(docs[self.key])

        def get(self):
            return self

        def set(self, data, merge=False):
            if merge and self.key in docs:
                docs[self.key].update(data)
            else:
                docs[self.key] = dict(data)

        def update(self, fields):
            if self.key not in docs:
                raise KeyError(self.key)
            docs[self.key].update(fields)

        def delete(self):
            docs.pop(self.key, None)

    class FakeCollection:
        def document(self, task_id):
            return FakeDoc(task_id)

        def where(self, field, op, value):
            assert (field, op) == ("_updated_at", "<")
            hits = [FakeDoc(k) for k, v in list(docs.items())
                    if v.get("_updated_at", 0) < value]

            class Q:
                def stream(self_q):
                    return iter(hits)

            return Q()

    class FakeClient:
        def collection(self, name):
            return FakeCollection()

    store = FirestoreJobStore(client=FakeClient())
    store.set_job_status("t1", {"status": "processing", "progress": 10})
    assert store.get_job_status("t1")["progress"] == 10
    store.update_job_status("t1", {"progress": 80})
    assert store.get_job_status("t1")["progress"] == 80
    store.update_job_status("t2", {"status": "queued"})  # create-on-update
    assert store.get_job_status("t2")["status"] == "queued"
    docs["t1"]["_updated_at"] = _time.time() - 99999
    assert store.cleanup_old_jobs(3600) == 1
    assert store.get_job_status("t1") is None
    store.delete_job("t2")
    assert store.get_job_status("t2") is None


def test_gcs_output_store_with_fake_bucket(tmp_path):
    """GCSOutputStore maps the store interface onto a GCS bucket
    (ref: remote/output_store.py:11-58) — exercised against a fake bucket."""
    from audio_separator_tpu.remote.output_store import GCSOutputStore

    blobs = {}

    class FakeBlob:
        def __init__(self, name):
            self.name = name

        def upload_from_filename(self, path):
            with open(path, "rb") as f:
                blobs[self.name] = f.read()

        def download_as_bytes(self):
            return blobs[self.name]

        def delete(self):
            blobs.pop(self.name, None)

    class FakeBucket:
        def blob(self, name):
            return FakeBlob(name)

        def list_blobs(self, prefix=""):
            return [FakeBlob(n) for n in sorted(blobs) if n.startswith(prefix)]

    store = GCSOutputStore(bucket=FakeBucket())
    src = tmp_path / "vocals.wav"
    src.write_bytes(b"RIFFdata")
    assert store.upload_file("task9", str(src)) == "task9/vocals.wav"
    assert store.list_files("task9") == ["vocals.wav"]
    assert store.download_file("task9", "vocals.wav") == b"RIFFdata"
    store.delete_task_outputs("task9")
    assert store.list_files("task9") == []


def test_server_store_wiring_from_env(tmp_path, monkeypatch):
    """AUDSEP_JOB_STORE/AUDSEP_OUTPUT_STORE select the backing stores
    (Cloud Run-style deployment wiring, ref: deploy_cloudrun.py setup)."""
    from audio_separator_tpu.remote.job_store import FileJobStore
    from audio_separator_tpu.remote.output_store import LocalOutputStore
    from audio_separator_tpu.remote.server import _stores_from_env

    monkeypatch.setenv("AUDSEP_JOB_STORE", "file")
    monkeypatch.delenv("AUDSEP_OUTPUT_STORE", raising=False)
    jobs, outputs = _stores_from_env(str(tmp_path))
    assert isinstance(jobs, FileJobStore)
    assert isinstance(outputs, LocalOutputStore)
    jobs.set_job_status("t", {"status": "queued"})
    assert jobs.get_job_status("t")["status"] == "queued"


def test_gcs_uri_submission(monkeypatch, tmp_path):
    """POST /separate with a gcs_uri field and no file part fetches the object
    server-side (ref: deploy_cloudrun.py gcs_uri input option)."""
    import json as _json
    import urllib.request

    from audio_separator_tpu.remote import server as server_mod

    monkeypatch.setattr(server_mod, "_fetch_gcs",
                        lambda uri: ("song.wav", b"RIFFfake"))
    srv = server_mod.serve(port=0, work_dir=str(tmp_path))
    port = srv.server_address[1]
    import threading

    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        boundary = "XBOUND"
        body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="gcs_uri"\r\n\r\ngs://bucket/song.wav\r\n'
                f"--{boundary}--\r\n").encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/separate", data=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req, timeout=10) as resp:
            payload = _json.loads(resp.read())
        assert payload["status"] == "queued" and payload["task_id"]
    finally:
        srv.shutdown()

def test_gcs_uri_bucket_allowlist(monkeypatch):
    """_fetch_gcs refuses buckets outside AUDSEP_GCS_INPUT_BUCKETS /
    AUDSEP_GCS_BUCKET (confused-deputy guard: the server's service account
    must not become an open GCS proxy)."""
    from audio_separator_tpu.remote import server as server_mod

    monkeypatch.delenv("AUDSEP_GCS_INPUT_BUCKETS", raising=False)
    monkeypatch.delenv("AUDSEP_GCS_BUCKET", raising=False)
    # No allowlist configured: every bucket refused, before any GCS import.
    with pytest.raises(PermissionError):
        server_mod._fetch_gcs("gs://victim-bucket/secret.wav")

    monkeypatch.setenv("AUDSEP_GCS_INPUT_BUCKETS", "uploads-a, uploads-b")
    with pytest.raises(PermissionError):
        server_mod._fetch_gcs("gs://victim-bucket/secret.wav")
    assert server_mod._allowed_input_buckets() == ["uploads-a", "uploads-b"]

    # Fallback to the deployment's own output bucket.
    monkeypatch.delenv("AUDSEP_GCS_INPUT_BUCKETS", raising=False)
    monkeypatch.setenv("AUDSEP_GCS_BUCKET", "deploy-bucket")
    assert server_mod._allowed_input_buckets() == ["deploy-bucket"]


def test_gcs_uri_submission_rejected_outside_allowlist(monkeypatch, tmp_path):
    """An out-of-allowlist gcs_uri submission returns 403 over HTTP."""
    import threading
    import urllib.error
    import urllib.request

    from audio_separator_tpu.remote import server as server_mod

    monkeypatch.delenv("AUDSEP_GCS_INPUT_BUCKETS", raising=False)
    monkeypatch.delenv("AUDSEP_GCS_BUCKET", raising=False)
    srv = server_mod.serve(port=0, work_dir=str(tmp_path))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        boundary = "XBOUND"
        body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="gcs_uri"\r\n\r\ngs://victim/secret.wav\r\n'
                f"--{boundary}--\r\n").encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/separate", data=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
        with pytest.raises(urllib.error.HTTPError) as excinfo:
            urllib.request.urlopen(req, timeout=10)
        assert excinfo.value.code == 403
    finally:
        srv.shutdown()


def test_api_key_gate(monkeypatch, tmp_path):
    """With AUDSEP_API_KEY set, /separate//status//download require the key;
    /health and the root stay open."""
    import threading
    import urllib.error
    import urllib.request

    from audio_separator_tpu.remote import server as server_mod

    monkeypatch.setenv("AUDSEP_API_KEY", "sekrit")
    srv = server_mod.serve(port=0, work_dir=str(tmp_path))
    port = srv.server_address[1]
    base = f"http://127.0.0.1:{port}"
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(base + "/health", timeout=10) as resp:
            assert resp.status == 200

        with pytest.raises(urllib.error.HTTPError) as excinfo:
            urllib.request.urlopen(base + "/status/nope", timeout=10)
        assert excinfo.value.code == 401

        # Correct key (either header form) reaches the handler: 404 job.
        for headers in ({"X-API-Key": "sekrit"},
                        {"Authorization": "Bearer sekrit"}):
            req = urllib.request.Request(base + "/status/nope", headers=headers)
            with pytest.raises(urllib.error.HTTPError) as excinfo:
                urllib.request.urlopen(req, timeout=10)
            assert excinfo.value.code == 404

        boundary = "XBOUND"
        body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="model"\r\n\r\nx\r\n--{boundary}--\r\n').encode()
        req = urllib.request.Request(
            base + "/separate", data=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
        with pytest.raises(urllib.error.HTTPError) as excinfo:
            urllib.request.urlopen(req, timeout=10)
        assert excinfo.value.code == 401
    finally:
        srv.shutdown()


def test_service_coalesces_jobs(tmp_path, monkeypatch):
    """Same-settings queued jobs run through ONE Separator.separate_batch
    call (cross-job window batching); a different-settings job stays solo;
    per-job statuses/files all complete."""
    from audio_separator_tpu.remote.server import SeparatorService
    from audio_separator_tpu.separator.separator import Separator

    groups = []
    solo = []
    started = threading.Event()

    def fake_load_model(self, model_filename="default"):
        self.model_filename = str(model_filename)
        self.model_filenames = [self.model_filename]
        self.model_instance = object()

    def fake_separate_batch(self, paths, names=None):
        started.wait(5)  # keep the worker parked until all jobs are queued
        groups.append(list(paths))
        outs = []
        for p in paths:
            base = os.path.splitext(os.path.basename(p))[0]
            out = os.path.join(self.output_dir, f"{base}_(Vocals)_fake.wav")
            with open(out, "wb") as f:
                f.write(b"RIFF" + b"\0" * 16)
            outs.append([out])
        return outs

    def fake_separate(self, audio_file_path, custom_output_names=None):
        started.wait(5)
        solo.append(audio_file_path)
        base = os.path.splitext(os.path.basename(audio_file_path))[0]
        out = os.path.join(self.output_dir, f"{base}_(Vocals)_fake.wav")
        with open(out, "wb") as f:
            f.write(b"RIFF" + b"\0" * 16)
        return [out]

    monkeypatch.setattr(Separator, "load_model", fake_load_model)
    monkeypatch.setattr(Separator, "separate_batch", fake_separate_batch)
    monkeypatch.setattr(Separator, "separate", fake_separate)
    monkeypatch.setenv("AUDSEP_SERVER_COALESCE", "4")

    service = SeparatorService(work_dir=str(tmp_path / "work"), workers=1)
    same = {"model": "m.ckpt", "output_format": "wav"}
    ids = [service.submit(f"t{i}.wav", b"x", dict(same)) for i in range(3)]
    other = service.submit("o.wav", b"x", {"model": "n.ckpt",
                                           "output_format": "wav"})
    started.set()
    for tid in ids + [other]:
        st = service.wait(tid, timeout=30)
        assert st and st["status"] == "completed", st
        assert len(st["files"]) == 1

    batched = [g for g in groups if len(g) > 1]
    assert batched and len(batched[0]) >= 2  # same-settings jobs coalesced
    # the different-settings job never joined a same-settings group
    assert all("o.wav" not in os.path.basename(p)
               for g in batched for p in g)


def test_coalesce_default_follows_worker_count(tmp_path, monkeypatch):
    """The coalesce cap defaults from the measured crossover (SERVING.json):
    off below 3 workers (solo pipeline is faster there), 4 at >=3 workers;
    AUDSEP_SERVER_COALESCE overrides either way."""
    from audio_separator_tpu.remote.server import SeparatorService

    monkeypatch.delenv("AUDSEP_SERVER_COALESCE", raising=False)
    monkeypatch.delenv("AUDSEP_SERVER_WORKERS", raising=False)
    svc1 = SeparatorService(work_dir=str(tmp_path / "w1"), workers=1)
    svc3 = SeparatorService(work_dir=str(tmp_path / "w3"), workers=3)
    assert svc1._coalesce_cap() == 1
    assert svc3._coalesce_cap() == 4
    monkeypatch.setenv("AUDSEP_SERVER_COALESCE", "2")
    assert svc1._coalesce_cap() == 2
    assert svc3._coalesce_cap() == 2


def test_custom_output_names_never_coalesce(tmp_path):
    """Coalesced groups share ONE output directory and a custom output name
    maps straight to a filename, so two jobs with the same custom name would
    overwrite each other's stems. _batch_key must refuse to coalesce them."""
    from audio_separator_tpu.remote.server import SeparatorService

    base = {"model": "m.ckpt", "output_format": "wav"}
    with_names = dict(base, custom_output_names='{"Vocals": "vocals"}')
    assert SeparatorService._batch_key(base) is not None
    assert SeparatorService._batch_key(with_names) is None


def test_displaced_job_runs_via_starvation_guard(tmp_path, monkeypatch):
    """A job that a coalescing scan keeps displacing must still complete:
    once its displacement budget is exhausted the scanning worker holds it
    and processes it right after the current group instead of re-queueing
    it behind new arrivals."""
    from audio_separator_tpu.remote.server import SeparatorService
    from audio_separator_tpu.separator.separator import Separator

    solo = []
    started = threading.Event()

    def fake_load_model(self, model_filename="default"):
        self.model_filename = str(model_filename)
        self.model_filenames = [self.model_filename]
        self.model_instance = object()

    def _emit(self, path):
        base = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(self.output_dir, f"{base}_(Vocals)_fake.wav")
        with open(out, "wb") as f:
            f.write(b"RIFF" + b"\0" * 16)
        return out

    def fake_separate_batch(self, paths, names=None):
        started.wait(5)
        return [[_emit(self, p)] for p in paths]

    def fake_separate(self, audio_file_path, custom_output_names=None):
        started.wait(5)
        solo.append(os.path.basename(audio_file_path))
        return [_emit(self, audio_file_path)]

    monkeypatch.setattr(Separator, "load_model", fake_load_model)
    monkeypatch.setattr(Separator, "separate_batch", fake_separate_batch)
    monkeypatch.setattr(Separator, "separate", fake_separate)
    monkeypatch.setenv("AUDSEP_SERVER_COALESCE", "4")
    # budget 0: the first displacement already exceeds it, so the scan must
    # hold-and-run the mismatched job rather than bounce it to the tail
    monkeypatch.setattr(SeparatorService, "_MAX_DISPLACE", 0)

    service = SeparatorService(work_dir=str(tmp_path / "work"), workers=1)
    same = {"model": "m.ckpt", "output_format": "wav"}
    a1 = service.submit("a1.wav", b"x", dict(same))
    b = service.submit("b.wav", b"x", {"model": "n.ckpt",
                                       "output_format": "wav"})
    rest = [service.submit(f"a{i}.wav", b"x", dict(same)) for i in (2, 3)]
    started.set()
    for tid in [a1, b] + rest:
        st = service.wait(tid, timeout=30)
        assert st and st["status"] == "completed", st
    # ran via the guard, not a coalesced group (upload names are
    # task-id-prefixed)
    assert any(p.endswith("_b.wav") for p in solo), solo
    assert not service._displaced  # bookkeeping cleaned up


def test_group_failure_retries_only_incomplete_jobs(tmp_path, monkeypatch):
    """A late group failure (upload of job 2 dies) must not re-run — or
    regress the status of — jobs already marked completed; only the jobs
    still pending are reprocessed individually."""
    from audio_separator_tpu.remote.server import SeparatorService
    from audio_separator_tpu.separator.separator import Separator

    solo = []
    started = threading.Event()

    def fake_load_model(self, model_filename="default"):
        self.model_filename = str(model_filename)
        self.model_filenames = [self.model_filename]
        self.model_instance = object()

    def _emit(self, path):
        base = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(self.output_dir, f"{base}_(Vocals)_fake.wav")
        with open(out, "wb") as f:
            f.write(b"RIFF" + b"\0" * 16)
        return out

    def fake_separate_batch(self, paths, names=None):
        started.wait(5)
        return [[_emit(self, p)] for p in paths]

    def fake_separate(self, audio_file_path, custom_output_names=None):
        started.wait(5)
        solo.append(os.path.basename(audio_file_path))
        return [_emit(self, audio_file_path)]

    monkeypatch.setattr(Separator, "load_model", fake_load_model)
    monkeypatch.setattr(Separator, "separate_batch", fake_separate_batch)
    monkeypatch.setattr(Separator, "separate", fake_separate)
    monkeypatch.setenv("AUDSEP_SERVER_COALESCE", "4")

    service = SeparatorService(work_dir=str(tmp_path / "work"), workers=1)

    real_upload = service.outputs.upload_file
    failed_once = []

    def flaky_upload(task_id, path):
        if "second" in path and not failed_once:
            failed_once.append(task_id)
            raise OSError("disk full")
        return real_upload(task_id, path)

    monkeypatch.setattr(service.outputs, "upload_file", flaky_upload)

    # The worker parks on this solo blocker until everything is queued, so
    # first+second are both in the queue when the coalescing scan runs.
    blocker = service.submit("blocker.wav", b"x", {"model": "z.ckpt",
                                                   "output_format": "wav"})
    same = {"model": "m.ckpt", "output_format": "wav"}
    first = service.submit("first.wav", b"x", dict(same))
    second = service.submit("second.wav", b"x", dict(same))
    started.set()
    assert service.wait(blocker, timeout=30)["status"] == "completed"
    st1 = service.wait(first, timeout=30)
    st2 = service.wait(second, timeout=30)
    assert st1 and st1["status"] == "completed", st1
    assert st2 and st2["status"] == "completed", st2
    # the failed job was retried once (the group really coalesced), and the
    # already-completed job never re-ran (upload names are task-id-prefixed)
    assert failed_once, "jobs never coalesced — blocker setup broken"
    retried = [p for p in solo if not p.endswith("_blocker.wav")]
    assert len(retried) == 1 and retried[0].endswith("_second.wav"), solo
