"""IIR execution parity: scan vs scipy.sosfilt, blocked-MXU vs scan,
carried-state streaming equivalence."""

import numpy as np
import pytest
import scipy.signal as sps

from python_audio_mastering_tpu.ops import biquad, iir
from tests.conftest import make_signal


def _eq_cascade():
    return np.concatenate([
        np.asarray(biquad.reference_shelf_sos(44100, 250, 4.0, "low")),
        np.asarray(biquad.reference_peak_sos(44100, 1000, -3.0)),
        np.asarray(biquad.reference_peak_sos(44100, 4000, 2.0)),
        np.asarray(biquad.reference_shelf_sos(44100, 8000, 3.0, "high")),
    ])


@pytest.mark.parametrize("channels", [1, 2])
def test_sosfilt_scan_matches_scipy(channels):
    sos = _eq_cascade()
    x = make_signal(8192, channels=channels)
    y_ref = sps.sosfilt(sos, x, axis=0)
    y, _ = iir.sosfilt_scan(sos, x)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-10, atol=1e-12)


def test_sosfilt_scan_zi_matches_scipy():
    sos = _eq_cascade()
    x = make_signal(4096, channels=2)
    zi = np.random.default_rng(3).standard_normal((sos.shape[0], 2, 2)) * 0.1
    y_ref, zf_ref = sps.sosfilt(sos, x, axis=0, zi=zi)
    y, zf = iir.sosfilt_scan(sos, x, zi=zi)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(zf), zf_ref, rtol=1e-9, atol=1e-11)


def test_butter_crossover_scan_matches_scipy():
    """The multiband crossovers (engine:197-203) through our executor."""
    x = make_signal(16384, channels=2)
    for sos in [biquad.butter_sos(4, 250, "lowpass", fs=44100),
                biquad.butter_sos(4, 4000, "highpass", fs=44100)]:
        y_ref = sps.sosfilt(sos, x, axis=0)
        y, _ = iir.sosfilt_scan(sos, x)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("n,block", [(8192, 512), (8192, 1024), (5000, 512),
                                     (1000, 512), (4096, 4096)])
def test_blocked_matches_scan(n, block):
    sos = _eq_cascade()
    x = make_signal(n, channels=2)
    y_scan, zf_scan = iir.sosfilt_scan(sos, x)
    y_blk, zf_blk = iir.sosfilt_blocked(sos, x, block_size=block)
    np.testing.assert_allclose(np.asarray(y_blk), np.asarray(y_scan),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(zf_blk), np.asarray(zf_scan),
                               rtol=1e-7, atol=1e-9)


def test_blocked_with_initial_state():
    sos = biquad.butter_sos(4, 250, "lowpass", fs=44100)
    x = make_signal(4096, channels=2)
    zi = np.random.default_rng(7).standard_normal((2, 2, 2)) * 0.05
    y_scan, zf_scan = iir.sosfilt_scan(sos, x, zi=zi)
    y_blk, zf_blk = iir.sosfilt_blocked(sos, x, zi=zi, block_size=256)
    np.testing.assert_allclose(np.asarray(y_blk), np.asarray(y_scan),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(zf_blk), np.asarray(zf_scan),
                               rtol=1e-7, atol=1e-9)


def test_chunked_streaming_equals_full_file():
    """Carried state across chunk boundaries must reproduce the one-shot
    result exactly — the defect fix over the reference's per-chunk state
    reset (SURVEY.md §5)."""
    sos = _eq_cascade()
    x = make_signal(12000, channels=2)
    y_full, _ = iir.sosfilt_scan(sos, x)

    chunks = [x[0:3000], x[3000:7000], x[7000:12000]]
    zi = None
    outs = []
    for c in chunks:
        y, zi = iir.sosfilt_blocked(sos, c, zi=zi, block_size=512)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(y_full),
                               rtol=1e-8, atol=1e-10)


def test_cascade_state_space_impulse_response():
    """State-space (A,B,C,D) must reproduce the cascade's impulse response."""
    sos = _eq_cascade()
    a, b, c, d = [np.asarray(m) for m in iir.cascade_state_space(sos)]
    n = 256
    imp = np.zeros(n)
    imp[0] = 1.0
    h_ref = sps.sosfilt(sos, imp)
    h = np.empty(n)
    h[0] = d
    s = b.copy()
    for t in range(1, n):
        h[t] = c @ s
        s = a @ s
    np.testing.assert_allclose(h, h_ref, rtol=1e-9, atol=1e-12)


def test_float32_blocked_accuracy_within_chain_tolerance():
    """In float32 (the TPU runtime dtype) the blocked path must stay well
    inside the 0.1 dB chain budget (~1.2% amplitude)."""
    sos = _eq_cascade().astype(np.float32)
    x = make_signal(44100, channels=2).astype(np.float32)
    y64 = sps.sosfilt(sos.astype(np.float64), x.astype(np.float64), axis=0)
    y_blk, _ = iir.sosfilt_blocked(sos, x, block_size=512)
    err = np.abs(np.asarray(y_blk, dtype=np.float64) - y64)
    scale = np.max(np.abs(y64))
    assert np.max(err) / scale < 2e-4


def test_blocked_superblock_boundary_path_long_signal():
    """The two-level boundary recurrence (static SOS, nb >= 128 blocks →
    superblocks of 128) must match the scan exactly, including at a block
    count that is not a multiple of the superblock size and with a ragged
    final block (n not a multiple of block_size)."""
    sos = _eq_cascade()
    # block_size=512 → nb = 391 blocks (= 3×128 + 7), final block ragged
    n = 200_000
    x = make_signal(n, channels=2)
    zi = np.random.default_rng(11).standard_normal((sos.shape[0], 2, 2)) * 0.05
    y_scan, zf_scan = iir.sosfilt_scan(sos, x, zi=zi)
    y_blk, zf_blk = iir.sosfilt_blocked(sos, x, zi=zi, block_size=512)
    np.testing.assert_allclose(np.asarray(y_blk), np.asarray(y_scan),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(zf_blk), np.asarray(zf_scan),
                               rtol=1e-7, atol=1e-9)


def test_blocked_multi_matches_individual_passes():
    """The shared-block multi-filter pass must equal separate blocked calls
    for every filter, including carried state and a ragged final block."""
    lp = biquad.butter_sos(4, 250, "lowpass", fs=44100)
    hp = biquad.butter_sos(4, 4000, "highpass", fs=44100)
    x = make_signal(10_000, channels=2)
    zi_lp = np.random.default_rng(5).standard_normal((2, 2, 2)) * 0.05
    (y_lp, y_hp), (zf_lp, zf_hp) = iir.sosfilt_blocked_multi(
        (lp, hp), x, (zi_lp, None))
    y_lp_ref, zf_lp_ref = iir.sosfilt_blocked(lp, x, zi=zi_lp)
    y_hp_ref, zf_hp_ref = iir.sosfilt_blocked(hp, x)
    np.testing.assert_allclose(np.asarray(y_lp), np.asarray(y_lp_ref),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(y_hp), np.asarray(y_hp_ref),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(zf_lp), np.asarray(zf_lp_ref),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(zf_hp), np.asarray(zf_hp_ref),
                               rtol=1e-8, atol=1e-10)


def test_blocked_rows_matches_blocked_cm():
    """The rows-form entry points (the chain's TPU-resident layout) must
    equal the channel-major wrappers exactly: same contractions, the rows
    form only skips the (C, N) relayouts.  Covers single-cascade (traced
    coefficients), multi-filter (static), padded n_valid state evolution."""
    import jax.numpy as jnp

    L = 512
    n, c = 9_700, 2            # nb = 19, ragged final block (pad 28)
    nb = -(-n // L)
    x = make_signal(n, channels=c)
    xT = jnp.asarray(x.T)
    xrows = jnp.pad(xT, ((0, 0), (0, nb * L - n))).reshape(c, nb, L)

    # single cascade, traced coefficients (the EQ path)
    sos = jnp.asarray(_eq_cascade())
    y_cm, zf_cm = iir.sosfilt_blocked_cm(sos, xT, block_size=L)
    y_rows, zf_rows = iir.sosfilt_blocked_rows(sos, xrows, n_valid=n)
    np.testing.assert_allclose(
        np.asarray(y_rows.reshape(c, nb * L)[:, :n]), np.asarray(y_cm),
        rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(zf_rows), np.asarray(zf_cm),
                               rtol=1e-8, atol=1e-10)

    # multi-filter, static coefficients (the crossover path)
    lp = biquad.butter_sos(4, 250, "lowpass", fs=44100)
    hp = biquad.butter_sos(4, 4000, "highpass", fs=44100)
    (lo_cm, hi_cm), (zl_cm, zh_cm) = iir.sosfilt_blocked_multi_cm(
        (lp, hp), xT, block_size=L)
    (lo_r, hi_r), (zl_r, zh_r) = iir.sosfilt_blocked_multi_rows(
        (lp, hp), xrows, n_valid=n)
    for got, ref in [(lo_r, lo_cm), (hi_r, hi_cm)]:
        np.testing.assert_allclose(
            np.asarray(got.reshape(c, nb * L)[:, :n]), np.asarray(ref),
            rtol=1e-9, atol=1e-11)
    for got, ref in [(zl_r, zl_cm), (zh_r, zh_cm)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-8, atol=1e-10)
