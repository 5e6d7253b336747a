"""Full-chain golden parity vs a numpy/scipy/oracle composition of the
reference algorithm (BASELINE: <0.1 dB spectral deviation — we hold far
tighter in float64), plus presets/settings-schema behaviour."""

import numpy as np
import pytest
import scipy.signal as sps

from python_audio_mastering_tpu import ChainConfig, EQ_PRESETS, MasteringParams, master
from python_audio_mastering_tpu.models import chain as chain_mod
from tests.conftest import make_signal
from tests.oracles import bs1770_ref, pydub_compress_ref
from tests.test_biquad import (
    _reference_peak_sos_numpy,
    _reference_shelf_sos_numpy,
)

FS = 44100


def _oracle_chain(x, settings):
    """The reference worker chain, single chunk, float64, via oracles."""
    s = dict(settings)
    pct = s.get("saturation", 0)
    if pct != 0:
        mix = (pct / 100.0) ** 2
        x = (1 - mix) * x + mix * np.tanh(x * (1 + mix * 4))
    # EQ (engine:146-168)
    for sos_fn, fc, g in [
        (lambda: _reference_shelf_sos_numpy(FS, 250, s.get("bass_boost", 0.0), "low"),
         250, s.get("bass_boost", 0.0)),
        (lambda: _reference_peak_sos_numpy(FS, 1000, -s.get("mid_cut", 0.0)),
         1000, -s.get("mid_cut", 0.0)),
        (lambda: _reference_peak_sos_numpy(FS, 4000, s.get("presence_boost", 0.0)),
         4000, s.get("presence_boost", 0.0)),
        (lambda: _reference_shelf_sos_numpy(FS, 8000, s.get("treble_boost", 0.0), "high"),
         8000, s.get("treble_boost", 0.0)),
    ]:
        if g != 0:
            x = sps.sosfilt(sos_fn(), x, axis=0)
    w = s.get("width", 1.0)
    if w != 1.0:
        mid = (x[:, 0] + x[:, 1]) / 2
        side = (x[:, 0] - x[:, 1]) / 2 * w
        x = np.stack([mid + side, mid - side], axis=1)
    if s.get("multiband"):
        from python_audio_mastering_tpu.ops.biquad import butter_sos
        from python_audio_mastering_tpu.ops.multiband import BAND_BALLISTICS_MS

        lp = np.array(butter_sos(4, 250, "lowpass", fs=FS))
        hp = np.array(butter_sos(4, 4000, "highpass", fs=FS))
        low = sps.sosfilt(lp, x, axis=0)
        high = sps.sosfilt(hp, x, axis=0)
        mid_b = x - low - high
        thr = (s.get("low_thresh", -25.0), s.get("mid_thresh", -20.0),
               s.get("high_thresh", -15.0))
        rat = (s.get("low_ratio", 6.0), s.get("mid_ratio", 3.0),
               s.get("high_ratio", 4.0))
        x = sum(pydub_compress_ref.compress_dynamic_range(
            b, FS, threshold=t, ratio=r,
            attack=BAND_BALLISTICS_MS[i][0], release=BAND_BALLISTICS_MS[i][1])
            for i, (b, t, r) in enumerate(zip([low, mid_b, high], thr, rat)))
    if s.get("lufs") is not None:
        measured = bs1770_ref.integrated_loudness(x.mean(axis=1), FS)
        x = x * 10.0 ** ((s["lufs"] - measured) / 20.0)
    ax = np.abs(x)
    over = ax > 0.98
    x = x.copy()
    x[over] = (0.98 + (ax[over] - 0.98)
               / np.sqrt(1 + ((ax[over] - 0.98) / 0.02) ** 2)) * np.sign(x[over])
    return x


@pytest.mark.parametrize("settings", [
    {"saturation": 20, "bass_boost": 4.0, "mid_cut": 3.0, "presence_boost": 1.0,
     "treble_boost": 3.0, "width": 1.3, "lufs": -14.0},
    {"saturation": 0, "width": 1.0, "lufs": -16.0, "preset": "pop"},
    {"saturation": 35, "bass_boost": 2.0, "width": 0.8, "lufs": None},
])
def test_chain_matches_oracle(settings):
    x = make_signal(FS * 2, fs=FS) * 0.4
    expected = _oracle_chain(x, MasteringParams.from_settings(settings).to_settings())
    params = MasteringParams.from_settings(settings)
    cfg = ChainConfig(sample_rate=FS, dtype="float64", filter_method="scan")
    got = np.asarray(master(x, params, cfg))
    np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-9)


def test_chain_multiband_matches_oracle():
    settings = {"saturation": 10, "bass_boost": 3.0, "width": 1.2, "lufs": -14.0,
                "multiband": True, "low_thresh": -25.0, "low_ratio": 6.0,
                "mid_thresh": -20.0, "mid_ratio": 3.0, "high_thresh": -15.0,
                "high_ratio": 4.0}
    x = make_signal(FS, fs=FS) * 0.5
    expected = _oracle_chain(x, settings)
    params = MasteringParams.from_settings(settings)
    cfg = ChainConfig(sample_rate=FS, dtype="float64", filter_method="scan")
    got = np.asarray(master(x, params, cfg))
    np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-9)


def test_blocked_execution_matches_scan_execution():
    """The TPU execution config must produce the same master (within the
    0.1 dB chain budget; in f64 far tighter)."""
    settings = {"saturation": 15, "preset": "techno", "width": 1.4, "lufs": -13.0}
    x = make_signal(FS * 2, fs=FS) * 0.4
    params = MasteringParams.from_settings(settings)
    a = np.asarray(master(x, params, ChainConfig(sample_rate=FS, dtype="float64",
                                                 filter_method="scan")))
    b = np.asarray(master(x, params, ChainConfig(sample_rate=FS, dtype="float64",
                                                 filter_method="blocked")))
    np.testing.assert_allclose(b, a, rtol=1e-7, atol=1e-9)


def test_settings_key_skew_both_spellings():
    """GUI long spelling and worker short spelling must coincide
    (fixes the reference's key-name skew, SURVEY.md §2)."""
    short = MasteringParams.from_settings(
        {"multiband": True, "low_thresh": -30.0, "high_ratio": 8.0})
    long_ = MasteringParams.from_settings(
        {"use_multiband": True, "low_band_threshold": -30.0,
         "high_band_ratio": 8.0})
    assert short.low_thresh == long_.low_thresh == -30.0
    assert short.high_ratio == long_.high_ratio == 8.0
    assert short.multiband and long_.multiband


def test_presets_verbatim():
    assert EQ_PRESETS["techno"]["bass_boost"] == 4.0
    assert EQ_PRESETS["dubstep"]["treble_boost"] == 3.5
    assert EQ_PRESETS["rock"]["mid_cut"] == -2.0
    p = MasteringParams.from_settings({}, preset="dubstep")
    assert (p.bass_boost, p.mid_cut, p.presence_boost, p.treble_boost) == \
        (5.0, 4.0, 2.0, 3.5)


def test_lufs_none_skips_normalization():
    x = make_signal(FS, fs=FS) * 0.1
    p = MasteringParams.from_settings({"lufs": None})
    y = np.asarray(master(x, p, ChainConfig(sample_rate=FS, dtype="float64",
                                            filter_method="scan")))
    np.testing.assert_allclose(y, x, rtol=1e-9, atol=1e-12)


def test_legacy_variant_mono_eq_passthrough():
    """Legacy EQ returns mono unprocessed (main.py:130-131)."""
    x = make_signal(FS // 2, channels=1, fs=FS) * 0.2
    p = MasteringParams.from_settings({"bass_boost": 5.0, "lufs": None})
    cfg = ChainConfig(sample_rate=FS, variant="legacy", dtype="float64",
                      filter_method="scan")
    y = np.asarray(master(x, p, cfg))
    np.testing.assert_allclose(y, x, rtol=1e-9, atol=1e-12)


def test_jit_and_grad():
    """The chain is one jit graph and differentiable end-to-end."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(make_signal(FS // 2, fs=FS) * 0.3)
    cfg = ChainConfig(sample_rate=FS, dtype="float64", filter_method="scan")

    @jax.jit
    def loss(params):
        y = master(x, params, cfg)
        return jnp.mean(y ** 2)

    p = MasteringParams.from_settings({"saturation": 20.0, "preset": "pop",
                                       "width": 1.2, "lufs": -14.0})
    g = jax.grad(loss)(p)
    assert np.isfinite(float(g.bass_boost))
    assert np.isfinite(float(g.saturation))
    assert float(jnp.abs(g.bass_boost)) > 0
