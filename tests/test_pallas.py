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


def _case_battery():
    """Signals spanning the collapse pipeline's regimes: collapsing active
    blocks, frozen silences (identity jumps), never-saturating wander
    (fixed-point still converges or falls back), nonzero carried state."""
    rng = np.random.default_rng(0)
    t0 = 128 * 128 * 2 + 999  # 2+ tiles, ragged tail
    act = (rng.random(t0) < 0.5).astype(np.float32)
    tt = np.arange(t0, dtype=np.float32)
    blip = np.zeros((3, t0), np.float32)
    blip[:, ::3000] = 10.0
    walk = np.abs(np.cumsum(rng.standard_normal(t0)).astype(np.float32)) / 50
    return [
        ("bursty", (rng.random((3, t0)).astype(np.float32) * 12) * act,
         np.float32([0, 0, 0])),
        ("silence", np.zeros((3, t0), np.float32), np.float32([3, 0, 1.5])),
        ("sustained", 6.0 + rng.random((3, t0)).astype(np.float32),
         np.float32([0, 2, 9])),
        ("slow-wander",
         ((5.0 + 4.0 * np.sin(2 * np.pi * tt / 50000.0))[None, :]
          * np.ones((3, 1), np.float32)).astype(np.float32),
         np.float32([20.0, 0.0, 5.0])),
        ("blips", blip, np.float32([1, 1, 1])),
        ("randomwalk",
         np.stack([walk + 0.5] * 3) * np.float32([1, 0.5, 2])[:, None],
         np.float32([8, 0, 0])),
    ]


def test_collapse_matches_serial_and_scan():
    """The block-parallel fixed-point path (mode="collapse") vs the serial
    boundary walk and the exact scan.  Collapse-vs-serial differ only by
    the FMA ulp at block-incoming states (the serial path has the same
    internal pass1-vs-replay skew); both sit inside the kernel-vs-scan
    contract."""
    ca = np.float32([8 / 220.5, 8 / 441.0, 8 / 882.0])
    cr = np.float32([8 / 2205.0, 8 / 4410.0, 8 / 8820.0])
    for name, m, att0 in _case_battery():
        outs = {}
        for mode in ("serial", "collapse"):
            att, fin = pk.ballistics_pallas_rates_bt(
                jnp.asarray(m), jnp.asarray(ca), jnp.asarray(cr),
                jnp.asarray(att0), interpret=True, mode=mode)
            outs[mode] = (np.asarray(att), np.asarray(fin))
        stats = {"max_att": jnp.asarray(m.T), "above": jnp.asarray(m.T) > 0,
                 "inc": jnp.asarray((m * ca[:, None]).T),
                 "dec": jnp.asarray((m * cr[:, None]).T)}
        ref, ref_f = comp.attenuation_scan(stats, jnp.asarray(att0))
        ref = np.asarray(ref).T
        x_err = np.abs(outs["serial"][0] - outs["collapse"][0]).max()
        assert x_err < 1e-5, (name, x_err)
        np.testing.assert_allclose(outs["collapse"][0], ref, rtol=0,
                                   atol=2e-4, err_msg=name)
        np.testing.assert_allclose(outs["collapse"][1], np.asarray(ref_f),
                                   rtol=0, atol=2e-4, err_msg=name)


def test_collapse_fallback_is_exact():
    """With the iteration budget forced to 1, signals that need more
    rounds take the in-graph serial fallback — results must be unchanged
    (the fallback shares the serial walk + replay)."""
    import functools

    ca = jnp.asarray([0.03, 0.01, 0.005], jnp.float32)
    cr = jnp.asarray([0.003, 0.001, 0.0005], jnp.float32)
    rng = np.random.default_rng(4)
    t0 = 128 * 128 * 2
    m = jnp.asarray(
        (np.abs(np.cumsum(rng.standard_normal((3, t0)), axis=1)) / 80
         + 0.2).astype(np.float32))
    att0 = jnp.asarray([5.0, 0.0, 1.0], jnp.float32)
    quantum = pk._LANES * pk._LANES
    sub = pk._SUBLANES
    m_p = jnp.pad(m, ((0, sub - 3), (0, 0)))
    ca_p = jnp.pad(ca, (0, sub - 3))[:, None]
    cr_p = jnp.pad(cr, (0, sub - 3))[:, None]
    a0_p = jnp.pad(att0, (0, sub - 3))[:, None]
    full, _ = pk._run_collapse(m_p, ca_p, cr_p, a0_p, quantum, True)
    capped, _ = pk._run_collapse(m_p, ca_p, cr_p, a0_p, quantum, True,
                                 iters=1)
    serial, _ = pk._run(m_p, ca_p, cr_p, a0_p, quantum, True)
    # the capped run MUST have fallen back to the serial walk: bit-equal
    np.testing.assert_array_equal(np.asarray(capped), np.asarray(serial))
    np.testing.assert_allclose(np.asarray(full), np.asarray(serial),
                               rtol=0, atol=1e-5)


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
