"""Engine entry-point contracts: the GUI-facing process_audio /
batch_process_audio surfaces (mastering_gui.py:204/220/226) and the
blob-store worker engine."""

import os

import numpy as np
import pytest

from python_audio_mastering_tpu import engine
from python_audio_mastering_tpu.config import ChainConfig
from python_audio_mastering_tpu.io import wavio
from python_audio_mastering_tpu.serving import LocalFSBlobStore
from tests.conftest import make_signal

FS = 44100
FAST_CFG = ChainConfig(sample_rate=FS, dtype="float32")


def _write_input(path, seconds=1.0, seed=0):
    x = (make_signal(int(FS * seconds), seed=seed) * 0.4).astype(np.float32)
    wavio.write_wav(path, x, FS)
    return x


def test_process_audio_single_file(tmp_path):
    in_path = str(tmp_path / "in.wav")
    out_path = str(tmp_path / "out.wav")
    _write_input(in_path)
    msgs = []
    ok = engine.process_audio(
        {"input_file": in_path, "output_file": out_path,
         "saturation": 10, "preset": "pop", "lufs": -15.0},
        status_callback=msgs.append, config=FAST_CFG)
    assert ok
    assert os.path.exists(out_path)
    # completion detection contract: GUI string-matches "complete"
    assert any("complete" in m.lower() for m in msgs)
    assert any("LUFS" in m for m in msgs)  # loudness log line (engine:221)
    out, fs = wavio.read_wav(out_path)
    assert fs == FS and out.shape[1] == 2


def test_process_audio_missing_input_reports_error():
    msgs = []
    ok = engine.process_audio(
        {"input_file": "/nonexistent/x.wav", "output_file": "/tmp/y.wav",
         "lufs": -14.0}, status_callback=msgs.append, config=FAST_CFG)
    assert not ok
    assert any("error" in m.lower() for m in msgs)


def test_batch_process_audio(tmp_path):
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    for i in range(3):
        _write_input(str(in_dir / f"t{i}.wav"), seconds=0.5, seed=i)
    (in_dir / "notes.txt").write_text("not audio")
    msgs = []
    n = engine.batch_process_audio({"saturation": 5, "lufs": -16.0},
                                   str(in_dir), str(out_dir),
                                   status_callback=msgs.append,
                                   config=FAST_CFG)
    assert n == 3
    outs = sorted(os.listdir(out_dir))
    assert outs == ["t0_mastered.wav", "t1_mastered.wav", "t2_mastered.wav"]
    assert any("complete" in m.lower() for m in msgs)


def test_batch_empty_folder_message(tmp_path):
    in_dir = tmp_path / "empty"
    in_dir.mkdir()
    msgs = []
    n = engine.batch_process_audio({}, str(in_dir), str(tmp_path / "o"),
                                   status_callback=msgs.append)
    assert n == 0
    # exact GUI-matched string (mastering_gui.py:226)
    assert any("no audio files" in m.lower() for m in msgs)


def test_process_audio_from_uri_blob_contract(tmp_path):
    store = LocalFSBlobStore(str(tmp_path), bucket="bkt")
    x = (make_signal(FS // 2) * 0.4).astype(np.float32)
    import io

    buf = io.BytesIO()
    wavio.write_wav(buf, x, FS)
    store.upload("uploads/my beat.wav", buf.getvalue())

    out_key = engine.process_audio_from_gcs(
        "local://bkt/uploads/my beat.wav",
        {"saturation": 10, "lufs": -14.0}, store=store, config=FAST_CFG)
    # exact output-key contract (engine:92) + flag blob (engine:105-108)
    assert out_key == "processed/mastered_my beat.wav"
    assert store.exists(out_key)
    assert store.exists(out_key + ".complete")
    out, fs = wavio.read_wav(store.download(out_key))
    assert fs == FS


def test_process_audio_output_sample_rate(tmp_path):
    """Optional output_sample_rate setting resamples before export
    (framework extension; absent key = reference behavior, source rate)."""
    in_path = str(tmp_path / "in.wav")
    out_path = str(tmp_path / "out48.wav")
    _write_input(in_path)
    msgs = []
    ok = engine.process_audio(
        {"input_file": in_path, "output_file": out_path, "lufs": -16.0,
         "output_sample_rate": 48000},
        status_callback=msgs.append, config=FAST_CFG)
    assert ok
    out, fs = wavio.read_wav(out_path)
    assert fs == 48000
    assert out.shape[0] == -(-FS * 160 // 147)
    assert any("Resampling" in m for m in msgs)
    # no-op when equal to the source rate
    out_path2 = str(tmp_path / "out44.wav")
    ok = engine.process_audio(
        {"input_file": in_path, "output_file": out_path2, "lufs": -16.0,
         "output_sample_rate": FS},
        status_callback=None, config=FAST_CFG)
    assert ok
    _, fs2 = wavio.read_wav(out_path2)
    assert fs2 == FS


def test_process_audio_from_uri_output_sample_rate(tmp_path):
    """The cloud path honors output_sample_rate too."""
    store = LocalFSBlobStore(str(tmp_path / "bucket"))
    x = (make_signal(FS, seed=3) * 0.4).astype(np.float32)
    import io as _io
    buf = _io.BytesIO()
    wavio.write_wav(buf, x, FS)
    store.upload("uploads/t.wav", buf.getvalue())
    key = engine.process_audio_from_uri(
        "local://bucket/uploads/t.wav",
        {"lufs": -16.0, "output_sample_rate": 48000},
        store=store, config=FAST_CFG)
    out, fs = wavio.read_wav(store.download(key))
    assert fs == 48000
    assert out.shape[0] == -(-FS * 160 // 147)


def test_quality_settings_key(tmp_path):
    """The optional `quality` settings key switches the chain to the
    lookahead true-peak limiter: a hot master stays under the -1 dBTP
    ceiling where the reference soft knee lets inter-sample peaks through."""
    from python_audio_mastering_tpu.ops import meters as met

    in_path = str(tmp_path / "in.wav")
    x = (make_signal(FS, seed=5) * 0.9).astype(np.float32)
    wavio.write_wav(in_path, x, FS)
    out_q = str(tmp_path / "q.wav")
    ok = engine.process_audio(
        {"input_file": in_path, "output_file": out_q, "lufs": -9.0,
         "quality": True},
        status_callback=None, config=FAST_CFG)
    assert ok
    y, fs = wavio.read_wav(out_q)
    assert float(met.true_peak_db(y)) <= -0.8  # brickwall held (1 dBTP - eps)


def test_dither_settings_key(tmp_path):
    """`dither: true` applies TPDF dither at the 16-bit export; the
    default export keeps the reference's truncation bytes."""
    in_path = str(tmp_path / "in.wav")
    _write_input(in_path, seconds=0.5)
    out_d = str(tmp_path / "d.wav")
    out_p = str(tmp_path / "p.wav")
    for out, s in ((out_d, {"dither": True}), (out_p, {})):
        ok = engine.process_audio(
            {"input_file": in_path, "output_file": out, "lufs": -20.0, **s},
            status_callback=None, config=FAST_CFG)
        assert ok
    yd, _ = wavio.read_wav(out_d)
    yp, _ = wavio.read_wav(out_p)
    assert yd.shape == yp.shape
    assert not np.array_equal(yd, yp)  # dither changed the quantization
    # and only at the ~1-LSB level
    assert np.abs(yd - yp).max() <= 3.0 / 32768.0


def test_conform_album_max_rate_policy():
    """Mixed-rate albums conform to the MAX rate present (a 22.05 kHz
    first file must not downgrade the 48 kHz tracks — VERDICT r2 #5)."""
    import numpy as np

    from python_audio_mastering_tpu import engine
    from tests.conftest import make_signal

    lo = (make_signal(11025, fs=22050) * 0.4).astype(np.float32)
    hi = (make_signal(24000, fs=48000, seed=1) * 0.4).astype(np.float32)
    tracks, fs = engine.conform_album_tracks(
        [(lo, 22050), (hi, 48000)], ["lo.wav", "hi.wav"], lambda m: None)
    assert fs == 48000
    # the low-rate track was upsampled (~2.177x frames), the high-rate
    # track untouched
    assert abs(tracks[0].shape[0] - int(11025 * 48000 / 22050)) <= 2
    np.testing.assert_array_equal(tracks[1], hi)


def test_meters_summary_silent_track_is_strict_json():
    """Silence gates to -inf LUFS; the sidecar/API payload must stay
    strict-JSON parseable (json.dumps would otherwise emit the
    non-standard ``-Infinity`` token that browsers' response.json()
    rejects) — every non-finite value becomes null."""
    import json

    import numpy as np

    from python_audio_mastering_tpu import engine

    s = engine.meters_summary({
        "integrated_lufs": float("-inf"),
        "lra_lu": float("nan"),
        "true_peak_dbtp": float("-inf"),
        "momentary_lufs": np.array([-np.inf, -np.inf]),
        "short_term_lufs": np.array([]),
    })
    blob = json.dumps(s)

    def _reject(tok):
        raise ValueError(f"non-standard JSON token {tok}")

    parsed = json.loads(blob, parse_constant=_reject)  # strict parser
    assert parsed == {"integrated_lufs": None, "lra_lu": None,
                      "true_peak_dbtp": None, "max_momentary_lufs": None,
                      "max_short_term_lufs": None}
