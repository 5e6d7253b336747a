"""Pallas ballistics kernel vs the exact scan (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from python_audio_mastering_tpu.ops import compressor as comp
from python_audio_mastering_tpu.ops import multiband
from python_audio_mastering_tpu.ops import pallas_kernels as pk
from tests.conftest import make_signal

FS = 44100


def _stats(seconds=1.0, hop=8, dtype=jnp.float32):
    x = make_signal(int(FS * seconds), fs=FS) * 0.6
    bands, _ = multiband.crossover_split(x, FS, filter_method="blocked")
    ss = [comp.detector_stats(bands[i].astype(dtype), FS, t, r,
                              *multiband.BAND_BALLISTICS_MS[i], hop=hop)
          for i, (t, r) in enumerate([(-25., 6.), (-20., 3.), (-15., 4.)])]
    return {k: jnp.stack([s[k] for s in ss], -1) for k in ss[0]}


@pytest.mark.parametrize("tile", [512, 2048])
def test_matches_scan(tile):
    """Same recurrence; the rate-factor formulation reassociates one
    multiply, so agreement is to float roundoff (≤1e-3 dB attenuation)."""
    stats = _stats()
    ref, f_ref = comp.attenuation_scan(stats)
    got, f_got = pk.ballistics_pallas(stats, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(f_got), np.asarray(f_ref),
                               rtol=0, atol=1e-3)


def test_rates_kernel_matches_equivalent_scan():
    """Same rate factors; XLA may contract mul+add into an FMA inside the
    kernel, so agreement is to float roundoff, not bitwise."""
    stats = _stats(seconds=0.8)
    m = stats["max_att"]
    ca = jnp.asarray([8 / max(a * FS / 1000.0, 1.0)
                      for a, _ in multiband.BAND_BALLISTICS_MS], m.dtype)
    cr = jnp.asarray([8 / max(r * FS / 1000.0, 1.0)
                      for _, r in multiband.BAND_BALLISTICS_MS], m.dtype)
    stats_eq = {"max_att": m, "above": m > 0.0,
                "inc": m * ca, "dec": m * cr}
    ref, f_ref = comp.attenuation_scan(stats_eq)
    got, f_got = pk.ballistics_pallas_rates(m, ca, cr, tile=512, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_got), np.asarray(f_ref), rtol=0, atol=2e-4)


def test_nonzero_initial_state_and_single_band():
    stats = _stats(seconds=0.5)
    m = stats["max_att"][:, :1]
    att0 = jnp.asarray([3.0], jnp.float32)
    ca = jnp.asarray([0.01], jnp.float32)
    cr = jnp.asarray([0.001], jnp.float32)
    stats_eq = {"max_att": m, "above": m > 0.0, "inc": m * ca, "dec": m * cr}
    ref, f_ref = comp.attenuation_scan(stats_eq, att0)
    got, f_got = pk.ballistics_pallas_rates(m, ca, cr, att0=att0, tile=512,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=2e-4)


def test_ragged_length_padding():
    stats = _stats(seconds=0.37)  # T not a tile multiple
    ref, _ = comp.attenuation_scan(stats)
    got, _ = pk.ballistics_pallas(stats, tile=1024, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-3)


def test_tile_hint_pinned_to_quantum():
    """Any tile hint must produce correct results: the boundary kernel
    emits exactly 128 boundary states per grid step, so the tile is pinned
    to 128^2 internally (a larger accepted tile would drop boundaries).
    Regression: T an exact multiple of the hinted tile used to pass the
    oversized tile through and break the pass-1 output blocking."""
    from python_audio_mastering_tpu.ops import compressor as comp

    t = 32768  # exact multiple of the 32768 hint below
    rng = np.random.default_rng(9)
    m = jnp.asarray(np.abs(rng.standard_normal((t, 2))).astype(np.float32))
    ca = jnp.asarray([0.05, 0.2], jnp.float32)
    cr = jnp.asarray([0.002, 0.01], jnp.float32)
    stats = {"max_att": m, "above": m > 0, "inc": m * ca, "dec": m * cr}
    ref, ref_f = comp.attenuation_scan(stats)
    for tile in (8192, 32768, 65536):
        att, att_f = pk.ballistics_pallas_rates(m, ca, cr, tile=tile,
                                                interpret=True)
        np.testing.assert_allclose(np.asarray(att), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(att_f), np.asarray(ref_f),
                                   rtol=1e-6, atol=1e-6)
