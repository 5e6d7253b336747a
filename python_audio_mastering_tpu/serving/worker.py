"""The processing worker: queue consumer + Pub/Sub-push-compatible endpoint.

Two consumption modes, matching the reference's split architecture
(worker/main.py):

* :func:`make_consumer` — a callback for ``LocalQueue`` (single-machine
  serving stack).
* :func:`make_worker_app` — an HTTP push endpoint accepting the base64
  Pub/Sub envelope POST exactly as Eventarc delivers it
  (worker/main.py:16-50), for cloud deployment behind Pub/Sub.

Failure policy (deliberate fix over the reference): the reference returns
204 on errors so failed jobs vanish and clients poll forever
(worker/main.py:46-50).  Here a failure writes a ``{output}.failed`` flag
blob with the error message; /status surfaces it as ``status: error``.
Jobs remain idempotent (deterministic output key, pure pipeline), so
bounded retries are safe: ``max_retries`` re-runs before flagging failure.
"""

from __future__ import annotations

import os
import traceback

from python_audio_mastering_tpu import engine
from python_audio_mastering_tpu.serving.http import App, text_response
from python_audio_mastering_tpu.serving.jobqueue import decode_envelope
from python_audio_mastering_tpu.serving.store import BlobStore, output_key_for

__all__ = ["make_consumer", "make_worker_app", "run_job", "job_options"]

_output_key = output_key_for  # shared naming contract (store.output_key_for)


def job_options() -> dict:
    """Deployment knobs for the job execution path, read per job so tests
    and operators can flip them without restarting.

    The defaults ARE the benchmarked configuration (BENCH config 5): the
    production worker must run the same path the bench measures.

    * ``PAM_TRANSFER`` = ``pcm16`` (default) | ``float32`` — host↔device
      wire format.  pcm16 halves the link bytes at the 16-bit export noise
      floor (the output is exported at 16 bits anyway, engine:125).
    * ``PAM_CHECKPOINT`` = ``off`` (default) | ``sync`` | ``every_n[:N]``
      — chunk-granular album checkpointing.  Off by default: recovery is
      the bounded idempotent retry (re-running an album costs seconds of
      compute), while per-chunk audio readback costs real wall time on
      link-bound deployments — it would make the deployed path ~10× slower
      than the benchmark.  Enable ``every_n:4`` for jobs where mid-album
      resume matters more than latency (saves run on a background thread
      either way).  ``PAM_CHECKPOINT_N`` sets N when ``every_n`` has no
      suffix (default 4).
    * ``PAM_METERS`` = ``1`` (default) | ``0`` — upload the R128 summary
      sidecar (``{output}.meters.json``) per mastered file.
    """
    transfer = os.environ.get("PAM_TRANSFER", "pcm16").strip().lower()
    if transfer not in ("pcm16", "float32"):
        transfer = "pcm16"
    ck = os.environ.get("PAM_CHECKPOINT", "off").strip().lower()
    if ck in ("", "off", "0", "none", "false"):
        every = 0
    elif ck in ("on", "sync", "1", "true"):
        every = 1
    elif ck.startswith("every_n"):
        try:
            every = int(ck.split(":", 1)[1]) if ":" in ck else \
                int(os.environ.get("PAM_CHECKPOINT_N", "4"))
        except ValueError:
            every = 4
        every = max(1, every)
    else:
        every = 0
    meters = os.environ.get("PAM_METERS", "1").strip().lower() \
        not in ("0", "false", "off", "no")
    return {"transfer": transfer, "checkpoint_every": every,
            "emit_meters": meters}


def _album_job_id(uris, settings, store) -> str:
    """Checkpoint key for an album job: URIs + settings + blob versions.

    Folding the settings dict and each blob's content fingerprint
    (``store.stat``) in means a resubmission with changed sliders or
    re-uploaded audio gets a FRESH checkpoint dir — stale chunks mastered
    with old settings/audio can never be silently resumed into the new
    job's output."""
    import hashlib
    import json

    from python_audio_mastering_tpu.serving import store as store_mod

    h = hashlib.sha1("\n".join(uris).encode())
    h.update(json.dumps(settings, sort_keys=True, default=str).encode())
    for u in uris:
        try:
            _, _, key = store_mod.parse_uri(u)
            h.update(repr(store.stat(key)).encode())
        except Exception:  # noqa: BLE001 — stat is best-effort
            h.update(b"?")
    return h.hexdigest()[:16]


def run_job(payload: dict, store: BlobStore, max_retries: int = 1,
            config=None):
    """Execute one mastering job with bounded retries + failure flag.

    Two payload shapes: ``{gcs_uri, settings}`` (the reference wire,
    worker/main.py:28-39) or ``{gcs_uris: [...], settings}`` — an album
    job, mastered as one batched chunked device call with per-file outputs
    and ``.complete`` flags (framework extension).  Execution knobs
    (transfer format, checkpoint cadence, meter sidecars) come from
    :func:`job_options`; the defaults match the benchmarked path."""
    uris = payload.get("gcs_uris")
    gcs_uri = payload.get("gcs_uri")
    settings = payload.get("settings")
    if (not gcs_uri and not uris) or not settings:
        raise ValueError(f"Missing GCS URI or settings in job data: {payload}")
    # Derive keys defensively: one malformed URI must not prevent the
    # .failed flags of the parseable ones (otherwise every file of the job
    # polls forever — the reference's lost-job mode this module exists to
    # fix).
    out_keys, bad_uri_err = [], None
    for u in (uris or [gcs_uri]):
        try:
            out_keys.append(_output_key(u))
        except Exception as e:  # noqa: BLE001 — malformed client input
            bad_uri_err = ValueError(f"malformed job URI {u!r}: {e}")
    if bad_uri_err is not None:
        for k in out_keys:
            store.upload(f"{k}.failed", str(bad_uri_err).encode("utf-8"))
        raise bad_uri_err
    opts = job_options()
    last = None
    ckpt_dir = None
    if uris and opts["checkpoint_every"] > 0:
        # chunk-granular checkpoints keyed by URIs + settings + blob
        # versions: a retry after a mid-album crash resumes from the last
        # completed chunk; a *different* job with the same filenames gets
        # a fresh dir (never resumes stale chunks)
        import tempfile

        ckpt_dir = os.path.join(tempfile.gettempdir(), "pam_album_ckpt",
                                _album_job_id(uris, settings, store))
    for attempt in range(max_retries + 1):
        try:
            if uris:
                engine.process_album_from_uris(
                    uris, settings, store=store, config=config,
                    transfer=opts["transfer"], checkpoint_dir=ckpt_dir,
                    checkpoint_every=max(1, opts["checkpoint_every"]),
                    emit_meters=opts["emit_meters"])
                if ckpt_dir:
                    import shutil

                    shutil.rmtree(ckpt_dir, ignore_errors=True)
            else:
                engine.process_audio_from_uri(
                    gcs_uri, settings, store=store, config=config,
                    transfer=opts["transfer"],
                    emit_meters=opts["emit_meters"])
            for k in out_keys:
                store.delete(f"{k}.failed")
            return out_keys if uris else out_keys[0]
        except Exception as e:  # noqa: BLE001 — job isolation
            last = e
            print(f"Job attempt {attempt + 1} failed for "
                  f"{uris or gcs_uri}: {e}")
            traceback.print_exc()
    for k in out_keys:
        store.upload(f"{k}.failed", str(last).encode("utf-8"))
    raise last


def make_consumer(store: BlobStore, max_retries: int = 1, config=None):
    def consume(payload: dict):
        run_job(payload, store, max_retries=max_retries, config=config)

    return consume


def make_worker_app(store: BlobStore, max_retries: int = 1, config=None) -> App:
    """Pub/Sub push endpoint (wire format of worker/main.py:16-50)."""
    app = App("pam-worker")

    @app.route("/", methods=["POST"])
    def process_mastering_job(req):
        try:
            payload = decode_envelope(req.get_json())
        except (ValueError, KeyError, TypeError):
            return text_response("Bad Request: invalid Pub/Sub message format", 400)
        target = payload.get("gcs_uri") or payload.get("gcs_uris")
        settings = payload.get("settings")
        if not target or not settings:
            return text_response("Bad Request: missing GCS URI or settings", 400)
        try:
            run_job(payload, store, max_retries=max_retries, config=config)
        except Exception:  # noqa: BLE001
            # ACK so the queue does not redeliver a poison message (the
            # reference's policy, worker/main.py:46-50) — but the .failed
            # flag written by run_job keeps the job observable.
            pass
        return text_response("", 204)

    return app
