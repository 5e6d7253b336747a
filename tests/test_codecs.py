"""Arbitrary-container codec parity for the cloud paths.

The reference's worker decodes any container ffmpeg handles from an
in-memory buffer (worker/audio_mastering_engine.py:43) and the monolith
exports in the *source* container format (main.py:74-75).  The image has no
ffmpeg, so the pipe wiring is exercised with a stand-in codec binary (a
"FAKE" 4-byte container framing a real WAV); a real-ffmpeg round-trip test
runs when a binary is on PATH.
"""

import io
import os
import shutil
import stat
import sys

import numpy as np
import pytest

from python_audio_mastering_tpu import engine
from python_audio_mastering_tpu.io import wavio
from python_audio_mastering_tpu.serving.monolith import run_legacy_job
from python_audio_mastering_tpu.serving.store import LocalFSBlobStore
from tests.conftest import make_signal

FS = 44100

FAKE_FFMPEG = """#!{python}
import os, sys
args = sys.argv[1:]
inp = args[args.index("-i") + 1]
out = args[-1]
data = sys.stdin.buffer.read() if inp == "-" else open(inp, "rb").read()
if data.startswith(b"FAKE"):
    if inp == "-" and os.environ.get("FAKE_FFMPEG_NOPIPE"):
        sys.stderr.write("pipe demux unsupported\\n")
        sys.exit(1)
    data = data[4:]          # "decode": unwrap the FAKE container
else:
    data = b"FAKE" + data    # "encode": wrap WAV in the FAKE container
if out == "-":
    sys.stdout.buffer.write(data)
else:
    open(out, "wb").write(data)
"""


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    script = tmp_path / "fake_ffmpeg"
    script.write_text(FAKE_FFMPEG.format(python=sys.executable))
    script.chmod(script.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setattr(wavio, "_ffmpeg", lambda: str(script))
    return script


def _wav_bytes(seconds=0.5):
    x = (make_signal(int(FS * seconds)) * 0.4).astype(np.float32)
    buf = io.BytesIO()
    wavio.write_wav(buf, x, FS, float_format=True)
    return buf.getvalue(), x


def test_decode_audio_bytes_wav_native():
    blob, x = _wav_bytes()
    y, fs = wavio.decode_audio_bytes(blob, name_hint="a.wav")
    assert fs == FS
    np.testing.assert_array_equal(y, x)


def test_decode_nonwav_without_ffmpeg_errors(monkeypatch):
    monkeypatch.setattr(wavio, "_ffmpeg", lambda: None)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        wavio.decode_audio_bytes(b"\xffFAKE not audio", name_hint="a.mp3")


def test_decode_audio_bytes_pipe(fake_ffmpeg):
    blob, x = _wav_bytes()
    y, fs = wavio.decode_audio_bytes(b"FAKE" + blob, name_hint="a.mp3")
    assert fs == FS
    np.testing.assert_array_equal(y, x)


def test_decode_audio_bytes_tempfile_fallback(fake_ffmpeg, monkeypatch):
    """Containers that can't be demuxed from a pipe fall back to a temp
    file named with the upload's extension."""
    monkeypatch.setenv("FAKE_FFMPEG_NOPIPE", "1")
    blob, x = _wav_bytes()
    y, fs = wavio.decode_audio_bytes(b"FAKE" + blob, name_hint="a.mp3")
    assert fs == FS
    np.testing.assert_array_equal(y, x)


def test_encode_audio_bytes_wav_and_container(fake_ffmpeg):
    x = (make_signal(1024) * 0.4).astype(np.float32)
    wav = wavio.encode_audio_bytes(x, FS, "wav")
    y, fs = wavio.read_wav(wav)
    assert fs == FS and y.shape == x.shape
    mp3 = wavio.encode_audio_bytes(x, FS, "mp3")
    assert mp3.startswith(b"FAKE")
    y2, _ = wavio.read_wav(mp3[4:])
    np.testing.assert_array_equal(y2, x)


def test_audio_content_type():
    assert wavio.audio_content_type("wav") == "audio/wav"
    assert wavio.audio_content_type(".mp3") == "audio/mpeg"
    assert wavio.audio_content_type("FLAC") == "audio/flac"
    assert wavio.audio_content_type("xyz") == "application/octet-stream"


def test_worker_accepts_nonwav_upload(fake_ffmpeg, tmp_path):
    """An 'mp3' upload (frontend/index.html:38 accepts any audio/*)
    completes end-to-end through the worker engine (engine:43 contract)."""
    from python_audio_mastering_tpu import ChainConfig

    store = LocalFSBlobStore(str(tmp_path / "blobs"), bucket="b")
    blob, _ = _wav_bytes()
    store.upload("song.mp3", b"FAKE" + blob, content_type="audio/mpeg")
    key = engine.process_audio_from_uri(
        "local://b/song.mp3", {"saturation": 10, "lufs": -14.0},
        store=store, config=ChainConfig(sample_rate=FS, dtype="float32"))
    assert key == "processed/mastered_song.mp3"
    out, fs = wavio.read_wav(store.download(key))  # worker exports WAV
    assert fs == FS and np.isfinite(out).all()
    assert store.exists(f"{key}.complete")


def test_monolith_exports_original_container(fake_ffmpeg, tmp_path):
    """main.py:74-75: output container = input extension; key keeps the
    original basename (processed/x.mp3)."""
    from python_audio_mastering_tpu import ChainConfig

    store = LocalFSBlobStore(str(tmp_path / "blobs"), bucket="b")
    blob, _ = _wav_bytes()
    store.upload("x.mp3", b"FAKE" + blob, content_type="audio/mpeg")
    key = run_legacy_job(store, "x.mp3", {"saturation": 10, "lufs": -14.0},
                         config=ChainConfig(sample_rate=FS, dtype="float32",
                                            variant="legacy"))
    assert key == "processed/x.mp3"
    payload = store.download(key)
    assert payload.startswith(b"FAKE")  # re-encoded into the FAKE container
    out, fs = wavio.read_wav(payload[4:])
    assert fs == FS and np.isfinite(out).all()
    assert store.download(f"{key}.complete") == b"done"


@pytest.mark.skipif(shutil.which("ffmpeg") is None,
                    reason="no ffmpeg on PATH")
def test_real_ffmpeg_roundtrip(tmp_path):
    x = (make_signal(FS // 2) * 0.4).astype(np.float32)
    flac = wavio.encode_audio_bytes(x, FS, "flac")
    y, fs = wavio.decode_audio_bytes(flac, name_hint="a.flac")
    assert fs == FS
    np.testing.assert_allclose(y, x, atol=1e-4)
