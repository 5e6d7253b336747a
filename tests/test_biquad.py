"""Filter-design parity: our closed-form designs vs scipy and the reference
formulas (reference worker/audio_mastering_engine.py:170-194), plus the
BS.1770-4 spec coefficient tables."""

import numpy as np
import pytest
import scipy.signal as sps

from python_audio_mastering_tpu.ops import biquad


def _reference_shelf_sos_numpy(sample_rate, cutoff_hz, gain_db, filter_type, q=0.707):
    """Direct transcription of the reference's shelf math for oracle use."""
    nyquist = 0.5 * sample_rate
    wn = cutoff_hz / nyquist
    gain = 10.0 ** (gain_db / 20.0)
    alpha = np.sin(wn * 2 * np.pi) / (2.0 * q)
    c = np.cos(wn * 2 * np.pi)
    s = np.sqrt(gain)
    if filter_type == "low":
        b0, b1, b2 = (gain * ((gain + 1) - (gain - 1) * c + 2 * s * alpha),
                      2 * gain * ((gain - 1) - (gain + 1) * c),
                      gain * ((gain + 1) - (gain - 1) * c - 2 * s * alpha))
        a0, a1, a2 = ((gain + 1) + (gain - 1) * c + 2 * s * alpha,
                      -2 * ((gain - 1) + (gain + 1) * c),
                      (gain + 1) + (gain - 1) * c - 2 * s * alpha)
    else:
        b0, b1, b2 = (gain * ((gain + 1) + (gain - 1) * c + 2 * s * alpha),
                      -2 * gain * ((gain - 1) + (gain + 1) * c),
                      gain * ((gain + 1) + (gain - 1) * c - 2 * s * alpha))
        a0, a1, a2 = ((gain + 1) - (gain - 1) * c + 2 * s * alpha,
                      2 * ((gain - 1) - (gain + 1) * c),
                      (gain + 1) - (gain - 1) * c - 2 * s * alpha)
    return np.array([[b0 / a0, b1 / a0, b2 / a0, 1, a1 / a0, a2 / a0]])


def _reference_peak_sos_numpy(sample_rate, center_hz, gain_db, q=1.0):
    nyquist = 0.5 * sample_rate
    wn = center_hz / nyquist
    gain = 10.0 ** (gain_db / 20.0)
    alpha = np.sin(wn * 2 * np.pi) / (2.0 * q)
    c = np.cos(wn * 2 * np.pi)
    b0, b1, b2 = 1 + alpha * gain, -2 * c, 1 - alpha * gain
    a0, a1, a2 = 1 + alpha / gain, -2 * c, 1 - alpha / gain
    return np.array([[b0 / a0, b1 / a0, b2 / a0, 1, a1 / a0, a2 / a0]])


@pytest.mark.parametrize("fc,gain,kind", [
    (250.0, 4.0, "low"), (250.0, -3.5, "low"),
    (8000.0, 3.0, "high"), (8000.0, -6.0, "high"),
])
def test_reference_shelf_matches_reference_formula(fc, gain, kind):
    ours = np.asarray(biquad.reference_shelf_sos(44100, fc, gain, kind))
    ref = _reference_shelf_sos_numpy(44100, fc, gain, kind)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("fc,gain", [(1000.0, -3.0), (4000.0, 2.5), (1000.0, 0.0)])
def test_reference_peak_matches_reference_formula(fc, gain):
    ours = np.asarray(biquad.reference_peak_sos(44100, fc, gain))
    ref = _reference_peak_sos_numpy(44100, fc, gain)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-14)


def test_zero_gain_sections_are_identity():
    """0 dB shelf/peak must be algebraically pass-through (replaces the
    reference's skip-branch, engine:171/186)."""
    x = np.random.default_rng(1).standard_normal(4096)
    for sos in [biquad.reference_shelf_sos(44100, 250, 0.0, "low"),
                biquad.reference_shelf_sos(44100, 8000, 0.0, "high"),
                biquad.reference_peak_sos(44100, 1000, 0.0)]:
        y = sps.sosfilt(np.array(sos, dtype=np.float64), x)
        np.testing.assert_allclose(y, x, rtol=0, atol=1e-10)


def _freq_response(sos, worN=4096):
    w, h = sps.sosfreqz(np.asarray(sos, dtype=np.float64), worN=worN)
    return w, h


@pytest.mark.parametrize("order,wn,btype", [
    (4, 250 / 22050, "lowpass"),
    (4, 4000 / 22050, "highpass"),
    (5, 250 / 22050, "lowpass"),
    (5, 8000 / 22050, "highpass"),
    (2, [900 / 22050, 1100 / 22050], "bandpass"),
])
def test_butter_matches_scipy_transfer_function(order, wn, btype):
    ours = biquad.butter_sos(order, wn, btype)
    theirs = sps.butter(order, wn, btype, output="sos")
    _, h1 = _freq_response(ours)
    _, h2 = _freq_response(theirs)
    np.testing.assert_allclose(h1, h2, rtol=1e-7, atol=1e-9)


def test_butter_fs_argument_matches_scipy():
    ours = biquad.butter_sos(4, 250, "lowpass", fs=44100)
    theirs = sps.butter(4, 250, "lowpass", fs=44100, output="sos")
    _, h1 = _freq_response(ours)
    _, h2 = _freq_response(theirs)
    np.testing.assert_allclose(h1, h2, rtol=1e-7, atol=1e-9)


def test_kweighting_matches_bs1770_spec_tables_at_48k():
    """ITU-R BS.1770-4 publishes exact 48 kHz coefficients; our parametric
    design must reproduce them to near machine precision."""
    shelf = biquad.deman_high_shelf_sos(48000)[0]
    np.testing.assert_allclose(
        shelf[:3], [1.53512485958697, -2.69169618940638, 1.19839281085285],
        rtol=0, atol=1e-13)
    np.testing.assert_allclose(
        shelf[4:], [-1.69065929318241, 0.73248077421585], rtol=0, atol=1e-13)
    hp = biquad.deman_high_pass_sos(48000)[0]
    np.testing.assert_allclose(hp[:3], [1.0, -2.0, 1.0], rtol=0, atol=0)
    np.testing.assert_allclose(
        hp[4:], [-1.99004745483398, 0.99007225036621], rtol=0, atol=1e-13)
