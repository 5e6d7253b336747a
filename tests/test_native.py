"""Native C++ I/O library vs the pure-python reference implementation."""

import io

import numpy as np
import pytest

from python_audio_mastering_tpu.io import native, wavio
from tests.conftest import make_signal


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain to build pam_native")


def _wav_bytes(x, fs=44100, **kw):
    buf = io.BytesIO()
    wavio.write_wav(buf, x, fs, **kw)
    return buf.getvalue()


@pytest.mark.parametrize("width", [2, 3, 4])
def test_decode_matches_python(width):
    x = (make_signal(8192) * 0.7).astype(np.float32)
    blob = _wav_bytes(x, sample_width=width)
    y_native, fs_n = native.decode_wav(blob)
    y_py, fs_p = wavio.read_wav(blob)
    assert fs_n == fs_p == 44100
    np.testing.assert_allclose(y_native, y_py, rtol=0, atol=1e-7)


def test_decode_float32_wav():
    x = (make_signal(4096) * 0.9).astype(np.float32)
    blob = _wav_bytes(x, float_format=True)
    y, fs = native.decode_wav(blob)
    np.testing.assert_array_equal(y, x)


def test_encode_pcm_matches_python():
    x = (make_signal(16384) * 1.2).astype(np.float32)  # includes clipping
    for width in (2, 3, 4):
        got = native.encode_pcm(x, sample_width=width)
        ints = wavio.float_to_pcm(x.reshape(-1), width)
        if width == 3:
            expected = wavio._pack_pcm24(ints)
        else:
            expected = ints.astype("<i%d" % width).tobytes()
        assert got == expected


def test_batch_decode_album():
    tracks = [(make_signal(4096 + 911 * i, seed=i) * 0.5).astype(np.float32)
              for i in range(5)]
    blobs = [_wav_bytes(t) for t in tracks]
    batch, lengths, rate = native.decode_batch(blobs, pad_multiple=256)
    assert rate == 44100
    assert batch.shape[0] == 5 and batch.shape[1] % 256 == 0
    for i, t in enumerate(tracks):
        assert lengths[i] == t.shape[0]
        np.testing.assert_allclose(batch[i, : t.shape[0]],
                                   wavio.read_wav(blobs[i])[0],
                                   rtol=0, atol=1e-7)
        assert np.all(batch[i, t.shape[0]:] == 0)


def test_probe_rejects_garbage():
    with pytest.raises(ValueError):
        native.decode_wav(b"RIFFxxxxWAVEgarbage")


def test_album_engine_uses_native_batch_decoder(tmp_path, monkeypatch):
    """The album job path must take the C++ batch decoder when it is
    available and the uploads are uniform WAVs (VERDICT r3 #3), and its
    outputs must equal the pure-numpy decode path's."""
    import json

    from python_audio_mastering_tpu import engine
    from python_audio_mastering_tpu.config import ChainConfig
    from python_audio_mastering_tpu.serving.store import LocalFSBlobStore

    store = LocalFSBlobStore(str(tmp_path), bucket="t")
    uris = []
    for i in range(3):
        x = (make_signal(30000 + 777 * i, seed=i) * 0.5).astype(np.float32)
        store.upload(f"up/t{i}.wav", _wav_bytes(x))
        uris.append(f"local://t/up/t{i}.wav")
    settings = {"saturation": 10, "lufs": -16.0}
    cfg = ChainConfig(sample_rate=44100)

    calls = {"batch": 0}
    real = native.decode_batch

    def spy(*a, **kw):
        calls["batch"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(native, "decode_batch", spy)
    keys = engine.process_album_from_uris(uris, settings, store=store,
                                          config=cfg, emit_meters=True)
    assert calls["batch"] == 1
    outs_native = [wavio.read_wav(store.download(k))[0] for k in keys]
    for k in keys:
        assert store.exists(f"{k}.complete")
        json.loads(store.download(f"{k}.meters.json"))

    # numpy decode path (native reported unavailable) must agree
    monkeypatch.setattr(native, "available", lambda: False)
    keys2 = engine.process_album_from_uris(uris, settings, store=store,
                                           config=cfg, emit_meters=False)
    assert keys2 == keys
    for k, ref in zip(keys2, outs_native):
        np.testing.assert_allclose(wavio.read_wav(store.download(k))[0],
                                   ref, rtol=0, atol=2e-5)
