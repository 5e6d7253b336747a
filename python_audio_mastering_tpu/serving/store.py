"""Blob stores: the job data plane (reference: GCS, engine:29-43/92-108).

``BlobStore`` is the seam the reference leaves implicit in its direct GCS
calls.  Implementations:

* :class:`LocalFSBlobStore` — filesystem-backed, used by tests, the local
  serving stack and the desktop engine.  Signed-URL semantics are
  reproduced with HMAC tokens + expiry.
* :class:`GCSBlobStore` — thin adapter over google-cloud-storage, available
  only when that package is installed (cloud deployments); mirrors the
  reference's bucket/blob calls and V4 signed URLs.

URIs: ``local://bucket/key`` or ``gs://bucket/key`` — `parse_uri` mirrors
the reference's ``gcs_uri.replace("gs://", "").split("/", 1)`` (engine:33).
"""

from __future__ import annotations

import hashlib
import hmac
import os
import time

__all__ = ["BlobStore", "LocalFSBlobStore", "GCSBlobStore", "parse_uri",
           "output_key_for", "get_store"]


def parse_uri(uri: str):
    """``scheme://bucket/key`` → (scheme, bucket, key)."""
    scheme, rest = uri.split("://", 1)
    bucket, key = rest.split("/", 1)
    return scheme, bucket, key


def output_key_for(uri: str) -> str:
    """The job-output naming contract (worker engine:92):
    ``processed/mastered_{basename}``.  ONE definition shared by the
    backend (poll-name response) and the worker (blob writer) — if the
    sides derived it independently, a drift would leave clients polling
    names that are never written."""
    import os

    _, _, key = parse_uri(uri)
    return f"processed/mastered_{os.path.basename(key)}"


class BlobStore:
    scheme = "abstract"

    def download(self, key: str) -> bytes:
        raise NotImplementedError

    def upload(self, key: str, data: bytes, content_type: str = "application/octet-stream"):
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        raise NotImplementedError

    def delete(self, key: str):
        raise NotImplementedError

    def uri(self, key: str) -> str:
        return f"{self.scheme}://{self.bucket}/{key}"

    def stat(self, key: str):
        """Cheap content-version fingerprint ``(size, version)`` or None.

        Used to key resumable-job checkpoints: a re-uploaded blob (same
        name, new bytes) must invalidate stale checkpoints, so the job id
        folds this in.  None (unknown) simply weakens the key."""
        return None

    def signed_put_url(self, key: str, expires_s: int = 900, content_type=None) -> str:
        raise NotImplementedError

    def signed_get_url(self, key: str, expires_s: int = 3600) -> str:
        raise NotImplementedError


class LocalFSBlobStore(BlobStore):
    """Filesystem bucket with HMAC-"signed" URL tokens.

    The returned URLs are paths (``/blob/<key>?token=...&expires=...``)
    served by the backend app itself — the local stand-in for GCS's signed
    PUT/GET URLs (backend/app.py:57-64, 124-130).
    """

    scheme = "local"

    def __init__(self, root: str, bucket: str = "audio-uploads", secret=None):
        self.root = root
        self.bucket = bucket
        self.secret = secret or os.environ.get("PAM_URL_SECRET", "dev-secret")
        os.makedirs(self._bucket_dir, exist_ok=True)

    @property
    def _bucket_dir(self):
        return os.path.join(self.root, self.bucket)

    def _path(self, key: str) -> str:
        path = os.path.normpath(os.path.join(self._bucket_dir, key))
        if not path.startswith(os.path.abspath(self._bucket_dir) + os.sep) and \
                path != os.path.abspath(self._bucket_dir):
            path = os.path.join(self._bucket_dir, key.replace("/", "_"))
        return path

    def download(self, key: str) -> bytes:
        with open(self._path(key), "rb") as f:
            return f.read()

    def upload(self, key: str, data: bytes, content_type="application/octet-stream"):
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic: .complete flags must never be partial

    def exists(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    def delete(self, key: str):
        if self.exists(key):
            os.remove(self._path(key))

    def stat(self, key: str):
        try:
            st = os.stat(self._path(key))
        except OSError:
            return None
        return (st.st_size, st.st_mtime_ns)

    # -- signed URLs ------------------------------------------------------
    def _token(self, method: str, key: str, expires: int) -> str:
        msg = f"{method}:{self.bucket}:{key}:{expires}".encode()
        return hmac.new(self.secret.encode(), msg, hashlib.sha256).hexdigest()[:32]

    def check_token(self, method: str, key: str, expires: str, token: str) -> bool:
        try:
            exp = int(expires)
        except (TypeError, ValueError):
            return False
        if exp < time.time():
            return False
        return hmac.compare_digest(self._token(method, key, exp), token or "")

    def signed_put_url(self, key, expires_s=900, content_type=None):
        exp = int(time.time()) + expires_s
        return f"/blob/{key}?token={self._token('PUT', key, exp)}&expires={exp}"

    def signed_get_url(self, key, expires_s=3600):
        exp = int(time.time()) + expires_s
        return f"/blob/{key}?token={self._token('GET', key, exp)}&expires={exp}"


class GCSBlobStore(BlobStore):
    """google-cloud-storage adapter (cloud deployments only).

    Mirrors the reference's usage: lazy client (backend/app.py:52), V4
    signed URLs (app.py:57-64), in-memory blob transfer (engine:37-43).
    """

    scheme = "gs"

    def __init__(self, bucket: str, project=None, service_account_email=None):
        from google.cloud import storage  # deferred: cloud-only dependency

        self._client = storage.Client(project=project)
        self._bucket = self._client.bucket(bucket)
        self.bucket = bucket
        self.service_account_email = service_account_email

    def download(self, key):
        return self._bucket.blob(key).download_as_bytes()

    def upload(self, key, data, content_type="application/octet-stream"):
        self._bucket.blob(key).upload_from_string(data, content_type=content_type)

    def exists(self, key):
        return self._bucket.blob(key).exists()

    def delete(self, key):
        self._bucket.blob(key).delete()

    def stat(self, key):
        blob = self._bucket.get_blob(key)
        if blob is None:
            return None
        return (blob.size, blob.generation)

    def signed_put_url(self, key, expires_s=900, content_type=None):
        import datetime

        return self._bucket.blob(key).generate_signed_url(
            version="v4", expiration=datetime.timedelta(seconds=expires_s),
            method="PUT", content_type=content_type,
            service_account_email=self.service_account_email)

    def signed_get_url(self, key, expires_s=3600):
        import datetime

        return self._bucket.blob(key).generate_signed_url(
            version="v4", expiration=datetime.timedelta(seconds=expires_s),
            method="GET", service_account_email=self.service_account_email)


def get_store(uri_or_scheme: str, **kwargs) -> BlobStore:
    """Factory from a URI scheme: ``local://`` or ``gs://``."""
    scheme = uri_or_scheme.split("://", 1)[0]
    if scheme == "local":
        _, bucket, _ = parse_uri(uri_or_scheme + ("/x" if uri_or_scheme.count("/") < 3 else ""))
        root = kwargs.pop("root", os.environ.get("PAM_BLOB_ROOT", "/tmp/pam_blobs"))
        return LocalFSBlobStore(root, bucket=bucket, **kwargs)
    if scheme == "gs":
        _, bucket, _ = parse_uri(uri_or_scheme + ("/x" if uri_or_scheme.count("/") < 3 else ""))
        return GCSBlobStore(bucket, **kwargs)
    raise ValueError(f"unknown blob scheme {scheme!r}")
