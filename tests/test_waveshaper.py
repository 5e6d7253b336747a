"""Elementwise ops vs direct transcriptions of the reference formulas."""

import numpy as np

from python_audio_mastering_tpu.ops import stereo, waveshaper
from tests.conftest import make_signal


def test_saturate_matches_reference_formula():
    x = make_signal(4096)
    for pct in [0.0, 10.0, 35.0, 100.0]:
        mix = (pct / 100.0) ** 2
        expected = (1 - mix) * x + mix * np.tanh(x * (1 + mix * 4))
        got = np.asarray(waveshaper.saturate(x, pct))
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-14)


def test_saturate_zero_is_identity():
    x = make_signal(512)
    np.testing.assert_array_equal(np.asarray(waveshaper.saturate(x, 0.0)), x)


def test_saturate_legacy_matches_reference_formula():
    x = make_signal(4096)
    for amt in [25.0, 80.0]:
        gain = 1.0 + amt / 100.0 * 4.0
        expected = np.tanh(x * gain) / gain
        got = np.asarray(waveshaper.saturate_legacy(x, amt))
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-14)
    # skip-at-zero (main.py:95)
    np.testing.assert_array_equal(np.asarray(waveshaper.saturate_legacy(x, 0.0)), x)


def test_soft_limiter_matches_reference_formula():
    x = make_signal(4096) * 2.0  # force overs
    thr = 0.98
    ax = np.abs(x)
    over = ax > thr
    expected = x.copy()
    expected[over] = (thr + (ax[over] - thr)
                      / np.sqrt(1 + ((ax[over] - thr) / 0.02) ** 2)) * np.sign(x[over])
    got = np.asarray(waveshaper.soft_limiter(x, thr))
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-14)
    assert np.max(np.abs(got)) <= thr + 0.02 + 1e-9


def test_soft_limiter_is_pure():
    x = make_signal(256) * 2.0
    x0 = x.copy()
    waveshaper.soft_limiter(x)
    np.testing.assert_array_equal(x, x0)  # the reference mutates (engine:226)


def test_soft_limiter_legacy():
    x = make_signal(1024) * 1.5
    got = np.asarray(waveshaper.soft_limiter_legacy(x))
    over = np.abs(x) > 0.98
    np.testing.assert_allclose(got[over], np.tanh(x[over]) * 0.98, rtol=1e-12)
    np.testing.assert_array_equal(got[~over], x[~over])


def test_stereo_width_matches_reference():
    x = make_signal(2048)
    for w in [0.0, 0.5, 1.0, 1.7, 2.0]:
        left, right = x[:, 0], x[:, 1]
        mid, side = (left + right) / 2, (left - right) / 2 * w
        expected = np.stack([mid + side, mid - side], axis=1)
        got = np.asarray(stereo.stereo_width(x, w))
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-14)


def test_stereo_width_mono_noop():
    x = make_signal(512, channels=1)[:, 0]
    np.testing.assert_array_equal(np.asarray(stereo.stereo_width(x, 1.5)), x)


def test_stereo_width_unity_identity():
    x = make_signal(512)
    np.testing.assert_allclose(np.asarray(stereo.stereo_width(x, 1.0)), x,
                               rtol=0, atol=1e-15)
