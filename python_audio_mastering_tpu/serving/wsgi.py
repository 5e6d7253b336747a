"""Gunicorn entry points: build backend/worker WSGI apps from environment.

Env vars (reference names kept: backend/app.py:20-22, worker/main.py:54):

* ``GCS_BUCKET_NAME`` — bucket (default ``audio-uploads``)
* ``PAM_STORE`` — ``local`` (default; blobs under ``PAM_BLOB_ROOT``) or ``gs``
* ``GCP_PROJECT_ID`` / ``PUB_SUB_TOPIC`` — Pub/Sub publishing (gs mode)
* ``PAM_BLOB_ROOT`` — local blob root (default ``/tmp/pam_blobs``)

``backend_app``: in local mode jobs are consumed in-process by a LocalQueue
worker thread (single-container deployment); in gs mode jobs publish to
Pub/Sub and a separate worker deployment consumes them (the reference's
split architecture).
"""

from __future__ import annotations

import os

from python_audio_mastering_tpu.serving.backend import make_backend_app
from python_audio_mastering_tpu.serving.store import GCSBlobStore, LocalFSBlobStore
from python_audio_mastering_tpu.serving.worker import make_consumer, make_worker_app

_BUCKET = os.environ.get("GCS_BUCKET_NAME", "audio-uploads")
_MODE = os.environ.get("PAM_STORE", "local")


def _store():
    if _MODE == "gs":
        return GCSBlobStore(
            _BUCKET, project=os.environ.get("GCP_PROJECT_ID"),
            service_account_email=os.environ.get("SERVICE_ACCOUNT_EMAIL"))
    return LocalFSBlobStore(os.environ.get("PAM_BLOB_ROOT", "/tmp/pam_blobs"),
                            bucket=_BUCKET)


def _publisher(store):
    if _MODE == "gs":
        from python_audio_mastering_tpu.serving.jobqueue import PubSubQueue

        return PubSubQueue(os.environ["GCP_PROJECT_ID"],
                           os.environ.get("PUB_SUB_TOPIC", "mastering-jobs")).publish
    from python_audio_mastering_tpu.serving.jobqueue import LocalQueue

    q = LocalQueue(consumer=make_consumer(store))
    q.start()
    return q.publish


_backend_store = _store()
backend_app = make_backend_app(_backend_store, _publisher(_backend_store))
worker_app = make_worker_app(_store())


def __getattr__(name):
    if name == "monolith_app":
        from python_audio_mastering_tpu.serving.monolith import make_monolith_app

        return make_monolith_app(_store())
    raise AttributeError(name)
