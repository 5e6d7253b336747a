"""Momentary/short-term loudness, LRA and true peak."""

import numpy as np
import pytest
import scipy.signal as sps

from python_audio_mastering_tpu.ops import meters
from tests.conftest import make_signal

FS = 48000


def sine(freq, seconds, amp_db, fs=FS):
    t = np.arange(int(seconds * fs)) / fs
    a = 10 ** (amp_db / 20.0)
    return np.tile((a * np.sin(2 * np.pi * freq * t))[:, None], (1, 2))


def test_momentary_and_shortterm_of_steady_sine():
    x = sine(997.0, 5.0, -23.0)
    mom = np.asarray(meters.momentary_loudness(x, FS))
    st = np.asarray(meters.shortterm_loudness(x, FS))
    # steady-state 997 Hz at -23 dBFS stereo → -23 LUFS on every window
    assert abs(np.median(mom[5:]) - (-23.0)) < 0.05
    assert abs(np.median(st) - (-23.0)) < 0.05
    assert st.shape[0] == mom.shape[0] - 26  # 3 s vs 400 ms windows


def test_loudness_range_steady_vs_dynamic():
    steady = sine(997.0, 8.0, -20.0)
    lra_steady = float(meters.loudness_range(steady, FS))
    assert lra_steady < 0.2
    # alternating loud/quiet sections → wide LRA
    quiet = sine(997.0, 4.0, -35.0)
    loud = sine(997.0, 4.0, -15.0)
    dyn = np.concatenate([quiet, loud, quiet, loud], axis=0)
    lra_dyn = float(meters.loudness_range(dyn, FS))
    assert lra_dyn > 10.0


def test_true_peak_exceeds_sample_peak_for_intersample_over():
    """A 997·(fs/4)-ish sine phased so its sample peaks miss the crest has a
    true peak above the sample peak."""
    fs = 44100
    t = np.arange(fs) / fs
    # quarter-rate sine with 45° phase: samples land at ±0.707 of the crest
    x = (0.99 * np.sin(2 * np.pi * (fs / 4) * t + np.pi / 4))[:, None]
    sample_peak = np.abs(x).max()
    tp = float(meters.true_peak_linear(x, fs))
    assert sample_peak < 0.71
    assert tp > 0.9  # recovers most of the inter-sample crest


def test_true_peak_matches_scipy_oversampling():
    x = make_signal(FS // 2, fs=FS) * 0.7
    tp = float(meters.true_peak_linear(x, FS))
    ref = np.abs(sps.resample_poly(np.asarray(x), 8, 1, axis=0)).max()
    assert abs(tp - ref) / ref < 0.02


def test_true_peak_db():
    x = sine(997.0, 0.5, -6.0)
    assert abs(float(meters.true_peak_db(x, FS)) - (-6.0)) < 0.1
