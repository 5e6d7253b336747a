"""WAV I/O roundtrips and reference-compatible PCM scaling."""

import io

import numpy as np
import pytest

from python_audio_mastering_tpu.io import wavio
from tests.conftest import make_signal


@pytest.mark.parametrize("width", [1, 2, 3, 4])
def test_pcm_roundtrip(tmp_path, width):
    x = (make_signal(4096) * 0.7).astype(np.float32)
    p = tmp_path / "t.wav"
    wavio.write_wav(p, x, 44100, sample_width=width)
    y, fs = wavio.read_wav(p)
    assert fs == 44100
    assert y.shape == x.shape
    tol = 2.0 ** (-(8 * width - 1)) * 1.01 + 1e-7
    np.testing.assert_allclose(y, x, rtol=0, atol=tol)


def test_float32_roundtrip(tmp_path):
    x = (make_signal(2048) * 0.9).astype(np.float32)
    p = tmp_path / "t32.wav"
    wavio.write_wav(p, x, 48000, float_format=True)
    y, fs = wavio.read_wav(p)
    assert fs == 48000
    np.testing.assert_array_equal(y, x)


def test_bytes_and_filelike():
    x = (make_signal(1024) * 0.5).astype(np.float32)
    buf = io.BytesIO()
    wavio.write_wav(buf, x, 44100, float_format=True)
    y, fs = wavio.read_wav(buf.getvalue())
    np.testing.assert_array_equal(y, x)


def test_scaling_matches_reference_contract():
    """int→float uses x / 2^(8w-1) (engine:117-121); float→int clips then
    scales (engine:123-126) — but honours the width instead of the
    reference's int16 hardcode bug (engine:125)."""
    ints = np.array([-32768, -1, 0, 1, 32767], dtype=np.int16)
    f = wavio.pcm_to_float(ints, 2)
    np.testing.assert_allclose(f, ints / 32768.0, rtol=0, atol=0)
    back = wavio.float_to_pcm(f, 2)
    np.testing.assert_array_equal(back, ints)
    # out-of-range floats clip, +1.0 maps to max code
    np.testing.assert_array_equal(
        wavio.float_to_pcm(np.array([-2.0, 1.0, 2.0]), 2),
        np.array([-32768, 32767, 32767]))


def test_mono_write_read(tmp_path):
    x = (make_signal(1000, channels=1) * 0.3).astype(np.float32)
    p = tmp_path / "m.wav"
    wavio.write_wav(p, x[:, 0], 22050)
    y, fs = wavio.read_wav(p)
    assert y.shape == (1000, 1)
    assert fs == 22050


def test_tpdf_dither_preserves_sub_lsb_content():
    """TPDF dither at the 16-bit boundary: a half-LSB sine vanishes under
    the reference's plain truncation but survives (decorrelated, audible
    as signal under a flat noise floor) when dithered."""
    fs = 44100
    t = np.arange(fs) / fs
    lsb = 1.0 / 32768.0
    sine = (0.5 * lsb) * np.sin(2 * np.pi * 997.0 * t)

    trunc = wavio.float_to_pcm(sine, 2)
    assert np.all(trunc == 0)  # truncation destroys it entirely

    dithered = wavio.float_to_pcm(sine, 2, dither=True, dither_seed=7)
    assert np.any(dithered != 0)
    # the sine is recoverable: correlation against the carrier is far above
    # what chance alone gives (noise-only correlation ~ N(0, 1/sqrt(n)))
    carrier = np.sin(2 * np.pi * 997.0 * t)
    corr = float(np.dot(dithered.astype(np.float64), carrier))
    noise_scale = np.std(dithered.astype(np.float64)) * np.sqrt((carrier**2).sum())
    assert corr > 4 * noise_scale

    # undithered path is untouched (reference truncation semantics)
    x = np.random.default_rng(0).standard_normal(1000) * 0.5
    np.testing.assert_array_equal(wavio.float_to_pcm(x, 2),
                                  wavio.float_to_pcm(x, 2, dither=False))
