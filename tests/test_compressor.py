"""Compressor parity: exact scan vs the per-frame pydub-contract oracle,
block-parallel ballistics vs exact, control-rate decimation accuracy."""

import numpy as np
import pytest

from python_audio_mastering_tpu.ops import compressor as comp
from python_audio_mastering_tpu.ops import multiband
from tests.conftest import make_signal
from tests.oracles import pydub_compress_ref


FS = 44100


@pytest.mark.parametrize("threshold,ratio,attack,release", [
    (-20.0, 4.0, 5.0, 50.0),
    (-25.0, 6.0, 10.0, 200.0),
    (-15.0, 4.0, 1.0, 50.0),
])
def test_exact_scan_matches_oracle(threshold, ratio, attack, release):
    x = make_signal(FS // 2, fs=FS) * 0.8
    y_ref = pydub_compress_ref.compress_dynamic_range(
        x, FS, threshold=threshold, ratio=ratio, attack=attack, release=release)
    y = np.asarray(comp.compress_dynamic_range(
        x, FS, threshold=threshold, ratio=ratio, attack=attack, release=release))
    np.testing.assert_allclose(y, y_ref, rtol=1e-9, atol=1e-11)


def test_below_threshold_is_transparent():
    x = make_signal(FS // 4, fs=FS) * 0.01  # ~ -40 dB, under -20 threshold
    y = np.asarray(comp.compress_dynamic_range(x, FS, threshold=-20.0))
    np.testing.assert_allclose(y, x, rtol=0, atol=1e-12)


def test_blocked_ballistics_close_to_exact():
    x = make_signal(FS * 2, fs=FS) * 0.8
    y_exact = np.asarray(comp.compress_dynamic_range(x, FS, threshold=-22.0))
    y_blk = np.asarray(comp.compress_dynamic_range(
        x, FS, threshold=-22.0, block_ctrl=2048))
    # warm-up error budget: < 0.01 dB on the gain
    err_db = 20 * np.log10(np.maximum(np.abs(y_blk), 1e-12)
                           / np.maximum(np.abs(y_exact), 1e-12))
    assert np.max(np.abs(err_db)) < 0.01


def test_hop_decimation_close_to_exact():
    x = make_signal(FS, fs=FS) * 0.8
    y_exact = np.asarray(comp.compress_dynamic_range(x, FS, threshold=-22.0))
    y_hop = np.asarray(comp.compress_dynamic_range(x, FS, threshold=-22.0, hop=8))
    err = np.abs(y_hop - y_exact)
    # decimated ballistics: small dB wobble, bounded amplitude error
    assert np.max(err) < 0.02
    assert np.sqrt(np.mean(err ** 2)) < 2e-3


def test_multiband_matches_oracle_composition():
    """Full 3-band compressor vs an oracle composed from scipy crossovers +
    the per-frame pydub oracle per band (worker subtraction split,
    engine:196-210)."""
    import scipy.signal as sps
    from python_audio_mastering_tpu.ops.biquad import butter_sos

    x = make_signal(FS // 2, fs=FS) * 0.7
    thr = (-25.0, -20.0, -15.0)
    ratio = (6.0, 3.0, 4.0)

    lp = np.array(butter_sos(4, 250, "lowpass", fs=FS))
    hp = np.array(butter_sos(4, 4000, "highpass", fs=FS))
    low = sps.sosfilt(lp, x, axis=0)
    high = sps.sosfilt(hp, x, axis=0)
    mid = x - low - high
    bands = [low, mid, high]
    y_ref = sum(
        pydub_compress_ref.compress_dynamic_range(
            b, FS, threshold=t, ratio=r,
            attack=multiband.BAND_BALLISTICS_MS[i][0],
            release=multiband.BAND_BALLISTICS_MS[i][1])
        for i, (b, t, r) in enumerate(zip(bands, thr, ratio)))

    y = np.asarray(multiband.multiband_compress(
        x, FS, thresholds_db=thr, ratios=ratio, variant="worker",
        filter_method="scan"))
    np.testing.assert_allclose(y, y_ref, rtol=1e-8, atol=1e-10)


def test_worker_split_reconstructs_input():
    """low + mid + high == x exactly for the subtraction split."""
    x = make_signal(FS // 2, fs=FS)
    bands, _ = multiband.crossover_split(x, FS, variant="worker",
                                         filter_method="scan")
    np.testing.assert_allclose(np.asarray(bands.sum(axis=0)), x,
                               rtol=1e-10, atol=1e-12)


def test_legacy_split_matches_reference_topology():
    """Legacy mid band = LP4@4k(HP4@250(x)) cascade (main.py:165-168)."""
    import scipy.signal as sps
    from python_audio_mastering_tpu.ops.biquad import butter_sos

    x = make_signal(FS // 4, fs=FS)
    bands, _ = multiband.crossover_split(x, FS, variant="legacy",
                                         filter_method="scan")
    hp250 = np.array(butter_sos(4, 250, "highpass", fs=FS))
    lp4k = np.array(butter_sos(4, 4000, "lowpass", fs=FS))
    mid_ref = sps.sosfilt(lp4k, sps.sosfilt(hp250, x, axis=0), axis=0)
    np.testing.assert_allclose(np.asarray(bands[1]), mid_ref, rtol=1e-8,
                               atol=1e-10)


@pytest.mark.parametrize("n,axis", [(100, -1), (2048, -1), (5000, -1),
                                    (65537, -1), (4096, 0)])
def test_cumsum_mxu_matches_jnp_cumsum(n, axis):
    """The blocked-MXU cumsum must agree with jnp.cumsum at every length
    regime: below the passthrough threshold, exact block multiples, ragged
    tails, and a non-default axis."""
    import jax.numpy as jnp
    rng = np.random.default_rng(n)
    shape = (n,) if axis == -1 else (n, 3)
    x = rng.standard_normal(shape).astype(np.float64)
    got = np.asarray(comp.cumsum_mxu(jnp.asarray(x), axis=axis))
    np.testing.assert_allclose(got, np.cumsum(x, axis=axis),
                               rtol=1e-12, atol=1e-9)


def test_cumsum_mxu_float32_accuracy_vs_naive():
    """In float32 the two-stage blocked summation should be at least as
    accurate as a naive sequential cumsum over ~1M elements (it is the
    detector's summation path at tpu_default shapes)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1_000_000)
    exact = np.cumsum(x)  # float64 reference
    blocked = np.asarray(comp.cumsum_mxu(jnp.asarray(x, jnp.float32)))
    naive = np.cumsum(x.astype(np.float32), dtype=np.float32)
    denom = np.maximum(np.abs(exact), 1.0)
    assert np.max(np.abs(blocked - exact) / denom) \
        <= np.max(np.abs(naive - exact) / denom) * 1.5


def test_multiband_streamed_short_final_chunk_keeps_fused_state():
    """A short final chunk (below the blocked-filter threshold) after fused
    chunks must keep consuming the carried control-rate detector tail —
    falling back to the stateless general path would silently reset the
    compressor lookback window mid-stream."""
    x = make_signal(4096 + 1024, fs=FS) * 0.7
    thr = (-25.0, -20.0, -15.0)
    ratio = (6.0, 3.0, 4.0)
    kw = dict(thresholds_db=thr, ratios=ratio, variant="worker",
              filter_method="auto")

    one_shot = np.asarray(multiband.multiband_compress(x, FS, **kw))

    y1, st = multiband.multiband_compress(x[:4096], FS, return_state=True,
                                          **kw)
    assert st.get("ctrl_tail") is not None
    y2, st2 = multiband.multiband_compress(x[4096:], FS, state=st,
                                           return_state=True, **kw)
    assert st2.get("ctrl_tail") is not None
    streamed = np.concatenate([np.asarray(y1), np.asarray(y2)])
    np.testing.assert_allclose(streamed, one_shot, rtol=1e-5, atol=1e-6)


def test_multiband_rows_matches_channel_major():
    """multiband_compress_rows (the one-shot chain hot path) must equal the
    fused channel-major path on the same block-aligned signal — for both
    the exact hop=1 contract and the bucketed hop-8 + blocked-ballistics
    TPU profile."""
    import jax.numpy as jnp

    fs, L = 44100, 512
    n = 48 * L
    x = make_signal(n, channels=2) * 0.5
    xT = jnp.asarray(x.T)
    xrows = xT.reshape(2, n // L, L)
    kw = dict(thresholds_db=(-25.0, -20.0, -15.0), ratios=(6.0, 3.0, 4.0))
    for hop, block_ctrl, ballistics in [(1, None, "scan"),
                                        (8, 2048, "blocked")]:
        ref = np.asarray(multiband.multiband_compress(
            xT, fs, variant="worker", filter_method="blocked",
            hop=hop, block_ctrl=block_ctrl, ballistics=ballistics,
            channel_major=True, **kw))
        got = np.asarray(multiband.multiband_compress_rows(
            xrows, fs, hop=hop, block_ctrl=block_ctrl,
            ballistics=ballistics, **kw)).reshape(2, n)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-8)
