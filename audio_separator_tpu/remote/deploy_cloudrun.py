"""Google Cloud Run deployment entry point.

TPU-native counterpart of the reference's Cloud Run service
(ref: remote/deploy_cloudrun.py:38-700): the same HTTP surface served from a
single container, configured entirely by environment:

  PORT                       listen port (Cloud Run contract; default 8080)
  AUDSEP_MODEL_BUCKET        GCS bucket to pre-sync model checkpoints from
  AUDSEP_MODEL_DIR           local model cache dir (default /models)
  AUDSEP_JOB_STORE           memory | file | firestore (server._stores_from_env)
  AUDSEP_OUTPUT_STORE        local | gcs
  AUDSEP_GCS_BUCKET          output bucket (and default gcs_uri allowlist)
  AUDSEP_GCS_INPUT_BUCKETS   comma-separated allowlist for gcs_uri submissions
  AUDSEP_GCP_PROJECT         GCP project for Firestore/GCS clients
  AUDSEP_API_KEY             optional shared key for submit/status/download

Run:  python -m audio_separator_tpu.remote.deploy_cloudrun
Build/deploy: see remote/Dockerfile.cloudrun + remote/cloudbuild.yaml.

Serving prefers uvicorn over the framework's ASGI app (remote/asgi.py);
without uvicorn installed it falls back to the stdlib threaded HTTP server
(remote/server.py) — identical endpoints either way.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

MODEL_DIR = os.environ.get("AUDSEP_MODEL_DIR", "/models")
MODEL_BUCKET = os.environ.get("AUDSEP_MODEL_BUCKET")
WORK_DIR = os.environ.get("AUDSEP_WORK_DIR", "/tmp/audio-separator-work")


def download_models_from_gcs(bucket_name=None, model_dir=None, client=None) -> bool:
    """Pre-sync model checkpoints from a GCS bucket into the local cache
    (ref: deploy_cloudrun.py:128-167 download_models_from_gcs). Size-matched
    files are skipped; failures are non-fatal (models can still be fetched on
    demand by the Separator)."""
    bucket_name = bucket_name or MODEL_BUCKET
    model_dir = model_dir or MODEL_DIR
    if not bucket_name:
        logger.info("AUDSEP_MODEL_BUCKET not set; models download on demand")
        return True
    try:
        if client is None:
            from google.cloud import storage

            client = storage.Client(
                project=os.environ.get("AUDSEP_GCP_PROJECT") or None)
        bucket = client.bucket(bucket_name)
        os.makedirs(model_dir, exist_ok=True)
        for blob in bucket.list_blobs():
            local_path = os.path.join(model_dir, blob.name)
            if (os.path.exists(local_path)
                    and os.path.getsize(local_path) == blob.size):
                continue
            os.makedirs(os.path.dirname(local_path) or model_dir, exist_ok=True)
            blob.download_to_filename(local_path)
            logger.info(f"downloaded model {blob.name}")
        return True
    except Exception as exc:
        logger.error(f"GCS model pre-sync failed (continuing): {exc}")
        return False


def build_service():
    """Service wired to the env-selected job/output stores."""
    from .server import SeparatorService, _stores_from_env

    os.makedirs(WORK_DIR, exist_ok=True)
    jobs, outputs = _stores_from_env(WORK_DIR)
    model_dir = MODEL_DIR if os.path.isdir(MODEL_DIR) else None
    return SeparatorService(work_dir=WORK_DIR, model_file_dir=model_dir,
                            job_store=jobs, output_store=outputs)


def create_app():
    """ASGI app for `uvicorn audio_separator_tpu.remote.deploy_cloudrun:app`
    factory-style serving."""
    from .asgi import create_app as _create

    download_models_from_gcs()
    return _create(service=build_service())


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    port = int(os.environ.get("PORT", 8080))
    download_models_from_gcs()
    service = build_service()
    try:
        import uvicorn

        from .asgi import create_app as _create

        uvicorn.run(_create(service=service), host="0.0.0.0", port=port)
    except ImportError:
        from .server import ThreadingHTTPServer, make_handler

        logger.info("uvicorn not installed; stdlib HTTP server fallback")
        server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
        logger.info(f"Serving on 0.0.0.0:{port}")
        server.serve_forever()


if __name__ == "__main__":
    main()
