"""Modal deployment entry point.

TPU-native counterpart of the reference's Modal deploy script
(ref: remote/deploy_modal.py:63-830): one `modal.App` named
``audio-separator`` with persistent volumes for separated files
(``audio-separator-storage`` → /storage) and cached model downloads
(``audio-separator-models`` → /models), serving the same HTTP surface.

Where the reference builds a FastAPI app inline and spawns a GPU function
per job, this deployment hosts the framework's dependency-free ASGI app
(remote/asgi.py) inside one accelerator container: a TPU container holds
exactly one chip, and the in-container job queue (SeparatorService) already
provides async submission + status/progress polling, so jobs serialise on
the chip with no cross-container choreography.

Deploy:
    modal deploy -m audio_separator_tpu.remote.deploy_modal
Serve locally against real Modal infra:
    modal serve -m audio_separator_tpu.remote.deploy_modal

The module imports lazily so that environments without the ``modal`` SDK
(CI, tests) can still import and mock it; tests inject a fake ``modal``
module (tests/test_remote.py).
"""

from __future__ import annotations

import os

import modal

APP_NAME = "audio-separator"
STORAGE_VOLUME = "audio-separator-storage"
MODELS_VOLUME = "audio-separator-models"

app = modal.App(APP_NAME)

# Image: the package's full declared dependency set (pyproject.toml
# [project.dependencies] — add_local_python_source only mounts code, it does
# NOT install deps), plus the libav toolchain so the first-party codec
# (shipped as audio_separator_tpu/io/codec.cpp) can be built on first import
# by io/audio._build_native(). (No CUDA base — this framework targets TPU
# runtimes; swap gpu= for the accelerator your Modal plan provides.)
image = (
    modal.Image.debian_slim(python_version="3.12")
    .apt_install("g++", "pkg-config", "libavcodec-dev", "libavformat-dev",
                 "libavutil-dev", "libswresample-dev")
    .pip_install("jax[tpu]", "numpy", "scipy", "einops", "pyyaml",
                 "requests", "tqdm", "uvicorn")
    .add_local_python_source("audio_separator_tpu")
)

volume = modal.Volume.from_name(STORAGE_VOLUME, create_if_missing=True)
models_volume = modal.Volume.from_name(MODELS_VOLUME, create_if_missing=True)


@app.function(image=image, timeout=1200, scaledown_window=300,
              volumes={"/storage": volume, "/models": models_volume})
@modal.asgi_app()
def api():
    """The full HTTP surface (POST /separate, GET /status|download|models|
    models-json|presets|health) backed by the in-container job queue."""
    from .asgi import create_app

    return create_app(work_dir="/storage", model_file_dir="/models")


@app.function(image=image, timeout=1200,
              volumes={"/storage": volume, "/models": models_volume})
def separate_audio_function(filename: str, file_bytes: bytes,
                            fields: dict | None = None) -> dict:
    """Direct function-call separation (ref separate_audio_function:153-379):
    runs the job to completion INSIDE the invocation — Modal may reclaim the
    container the moment this returns, so returning "queued" while a worker
    thread kept separating would lose the job and never commit its outputs.
    Returns the terminal status dict ({task_id, status, files, ...})."""
    service = _shared_service()
    task_id = service.submit(filename, file_bytes, fields or {})
    status = service.wait(task_id, timeout=1140)
    volume.commit()
    return status if status is not None else {"task_id": task_id,
                                              "status": "not_found"}


@app.function(image=image, timeout=300, volumes={"/storage": volume})
def get_job_status_function(task_id: str) -> dict:
    """(ref get_job_status_function:381-398)."""
    volume.reload()
    status = _shared_service().get_status(task_id)
    return status if status is not None else {"task_id": task_id,
                                              "status": "not_found"}


@app.function(image=image, timeout=300, volumes={"/storage": volume})
def get_file_by_hash_function(task_id: str, file_hash: str):
    """(ref get_file_by_hash_function:414-487): returns (bytes, filename)."""
    volume.reload()
    return _shared_service().get_file_by_hash(task_id, file_hash)


@app.function(image=image, timeout=60, volumes={"/models": models_volume})
def list_available_models() -> dict:
    """(ref list_available_models:489-510)."""
    from ..separator import Separator

    return Separator(info_only=True,
                     model_file_dir="/models").list_supported_model_files()


@app.function(image=image, timeout=60, volumes={"/models": models_volume})
def get_simplified_models(filter_sort_by: str = None) -> dict:
    """(ref get_simplified_models:512-537)."""
    from ..separator import Separator

    return Separator(info_only=True,
                     model_file_dir="/models").get_simplified_model_list(
        filter_sort_by=filter_sort_by)


_SERVICE = None


def _shared_service():
    """One SeparatorService per container, rooted on the shared volume so
    status/files written by the api() container are visible here."""
    global _SERVICE
    if _SERVICE is None:
        from .server import SeparatorService
        from .job_store import FileJobStore

        work_dir = "/storage" if os.path.isdir("/storage") else None
        store = (FileJobStore(os.path.join("/storage", "jobs"))
                 if os.path.isdir("/storage") else None)
        _SERVICE = SeparatorService(work_dir=work_dir, model_file_dir="/models",
                                    job_store=store)
    return _SERVICE
