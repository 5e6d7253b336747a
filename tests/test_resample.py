"""Rational polyphase resampler parity vs scipy.signal.resample_poly.

Two parity levels: identical-taps (float tolerance — proves the upfirdn
execution and scipy's group-delay slice are reproduced exactly) and
default-design (~1e-6 — proves the Kaiser/sinc design matches scipy's
firwin construction).
"""

import numpy as np
import pytest
import scipy.signal as sps

from python_audio_mastering_tpu.ops import resample as rs
from tests.conftest import make_signal

RATIOS = [(160, 147), (147, 160), (2, 1), (1, 2), (3, 4), (320, 441),
          (441, 320)]


@pytest.mark.parametrize("up,down", RATIOS)
def test_matches_scipy_with_identical_taps(up, down):
    x = np.random.default_rng(up * 1000 + down).standard_normal(44100)
    h = rs.design_resample_taps(up, down)
    y_ref = sps.resample_poly(x, up, down, window=h / up)
    y = np.asarray(rs.resample_poly(x, up, down, taps=h))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("up,down", [(160, 147), (2, 1), (3, 4)])
def test_matches_scipy_default_design(up, down):
    """Our Kaiser/sinc design vs scipy's own firwin default."""
    x = np.random.default_rng(7).standard_normal(30000)
    y_sp = sps.resample_poly(x, up, down)
    y = np.asarray(rs.resample_poly(x, up, down))
    np.testing.assert_allclose(y, y_sp, rtol=1e-4, atol=1e-5)


def test_stereo_and_rate_reduction():
    x = make_signal(44100, channels=2)
    y = np.asarray(rs.resample(x, 44100, 48000))
    assert y.shape == (-(-44100 * 160 // 147), 2)
    # channels resample independently
    y0 = np.asarray(rs.resample(np.asarray(x)[:, 0], 44100, 48000))
    np.testing.assert_allclose(y[:, 0], y0, rtol=1e-6, atol=1e-7)


def test_tone_preservation_44k_to_48k_and_back():
    """A mid-band tone survives 44.1k -> 48k -> 44.1k within ~0.02 dB
    (identical to scipy's own round-trip error — two stacked passband
    ripples of the default Kaiser design)."""
    fs = 44100
    n = 4 * fs
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * 997.0 * t).astype(np.float64)
    y = np.asarray(rs.resample(x, 44100, 48000))
    z = np.asarray(rs.resample(y, 48000, 44100))[:n]
    core = slice(fs // 2, -fs // 2)  # ignore filter edges
    rms_in = np.sqrt(np.mean(x[core] ** 2))
    rms_out = np.sqrt(np.mean(z[core] ** 2))
    assert abs(20 * np.log10(rms_out / rms_in)) < 0.02
    # and the waveform itself is preserved (group delay fully compensated)
    assert np.max(np.abs(z[core] - x[core])) < 5e-3


def test_identity_and_validation():
    x = make_signal(1000, channels=2)
    assert rs.resample(x, 48000, 48000) is x
    assert rs.resample_poly(x, 3, 3) is x
    with pytest.raises(ValueError):
        rs.resample(x, 0, 48000)
    with pytest.raises(ValueError):
        rs.resample_poly(x, 2, 1, taps=np.ones(10))  # even-length taps
