"""BS.1770-4 loudness parity: vs the independent oracle, vs analytic sine
levels at the spec's own 48 kHz coefficients, and streaming equivalence."""

import numpy as np
import pytest

from python_audio_mastering_tpu.ops import loudness
from tests.conftest import make_signal
from tests.oracles import bs1770_ref


def sine(freq, fs, seconds, amp_db, channels=2):
    t = np.arange(int(seconds * fs)) / fs
    a = 10.0 ** (amp_db / 20.0)
    x = a * np.sin(2 * np.pi * freq * t)
    return np.tile(x[:, None], (1, channels))


def test_997hz_sine_compliance_48k():
    """BS.2217-style: 997 Hz stereo sine at −23 dBFS → −23.0 LKFS (the
    −0.691 offset is defined to cancel the K-weighting gain at ~1 kHz)."""
    x = sine(997.0, 48000, 3.0, -23.0)
    lufs = float(loudness.integrated_loudness(x, 48000))
    assert abs(lufs - (-23.0)) < 0.05


def test_997hz_sine_mono_left_only_not_gated():
    x = sine(997.0, 48000, 3.0, -3.0, channels=1)
    lufs = float(loudness.integrated_loudness(x, 48000))
    # mono −3 dBFS sine: MS = a²/2 → 10log10 = −3−3.01; +0.691 K gain ≈ −6.0
    assert abs(lufs - (-6.02)) < 0.1


@pytest.mark.parametrize("fs", [44100, 48000])
@pytest.mark.parametrize("seconds", [1.0, 7.3])
def test_matches_oracle_stereo(fs, seconds):
    x = make_signal(int(seconds * fs), channels=2, fs=fs) * 0.3
    ours = float(loudness.integrated_loudness(x, fs))
    ref = bs1770_ref.integrated_loudness(x, fs)
    assert abs(ours - ref) < 1e-6


def test_matches_oracle_with_gating():
    """Loud intro + long quiet tail exercises both gates."""
    fs = 44100
    loud = make_signal(fs * 2, fs=fs) * 0.5
    quiet = make_signal(fs * 6, fs=fs, seed=5) * 0.003
    x = np.concatenate([loud, quiet], axis=0)
    ours = float(loudness.integrated_loudness(x, fs))
    ref = bs1770_ref.integrated_loudness(x, fs)
    assert abs(ours - ref) < 1e-6
    # sanity: gating keeps the measure near the loud section's level
    loud_only = bs1770_ref.integrated_loudness(loud, fs)
    assert ours > loud_only - 4.0


def test_silence_returns_neg_inf():
    x = np.zeros((44100, 2))
    assert float(loudness.integrated_loudness(x, 44100)) == -np.inf


def test_reference_mono_mean_mode():
    """The reference measures mean(channels) as mono (engine:214-218)."""
    fs = 44100
    x = make_signal(fs * 2, fs=fs) * 0.4
    ours = float(loudness.integrated_loudness(x, fs, downmix="reference_mono_mean"))
    ref = bs1770_ref.integrated_loudness(x.mean(axis=1), fs)
    assert abs(ours - ref) < 1e-6


def test_normalize_to_lufs_hits_target():
    fs = 44100
    x = make_signal(fs * 3, fs=fs) * 0.2
    y, measured, gain = loudness.normalize_to_lufs(x, fs, target_lufs=-14.0)
    after = bs1770_ref.integrated_loudness(np.asarray(y).mean(axis=1), fs)
    # single linear gain on a gated measure: re-measured value lands close
    assert abs(after - (-14.0)) < 0.15
    ref_measured = bs1770_ref.integrated_loudness(x.mean(axis=1), fs)
    assert abs(float(measured) - ref_measured) < 1e-6


def test_streaming_cells_equal_full_measure():
    """Chunked cell accumulation (with carried K-filter state) must equal
    the one-shot measurement exactly."""
    fs = 44100
    x = make_signal(fs * 4, fs=fs) * 0.3
    full = float(loudness.integrated_loudness(x, fs))

    acc = loudness.BlockEnergyAccumulator(sample_rate=fs)
    cell = acc.cell_len
    step = 10 * cell
    for start in range(0, x.shape[0] - (x.shape[0] % cell), step):
        acc.update(x[start:start + step])
    streamed = float(acc.loudness())
    assert abs(streamed - full) < 1e-9


def test_float32_accuracy_within_baseline():
    """float32 runtime dtype must stay ≤0.1 LU of the float64 oracle
    (BASELINE.md LUFS target)."""
    fs = 44100
    x = make_signal(fs * 5, fs=fs).astype(np.float32) * 0.3
    ours = float(loudness.integrated_loudness(x, fs))
    ref = bs1770_ref.integrated_loudness(x.astype(np.float64), fs)
    assert abs(ours - ref) < 0.02


def test_rows_form_loudness_matches_cm():
    """The rows-resident meter (MXU bucket cell sums) must match the
    channel-major path to float accumulation noise, including the
    valid-frames mask on a padded block-aligned signal."""
    import jax.numpy as jnp

    fs, L = 44100, 512
    n = int(fs * 2.5)
    nb = -(-n // L)
    x = make_signal(n, channels=2) * 0.3
    xT = jnp.asarray(x.T)
    xrows = jnp.pad(xT, ((0, 0), (0, nb * L - n))).reshape(2, nb, L)
    for downmix in ("reference_mono_mean", "bs1770"):
        ref = float(loudness.integrated_loudness_cm(
            jnp.pad(xT, ((0, 0), (0, nb * L - n))), fs, downmix=downmix,
            valid_frames=n))
        got = float(loudness.integrated_loudness_rows(
            xrows, fs, downmix=downmix, valid_frames=n))
        assert abs(got - ref) < 1e-6, (downmix, got, ref)
