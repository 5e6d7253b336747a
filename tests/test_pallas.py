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
def test_matches_scan_exactly(tile):
    stats = _stats()
    ref, f_ref = comp.attenuation_scan(stats)
    got, f_got = pk.ballistics_pallas(stats, tile=tile, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(f_got), np.asarray(f_ref))


def test_nonzero_initial_state_and_single_band():
    stats = _stats(seconds=0.5)
    one = {k: v[:, :1] for k, v in stats.items()}
    att0 = jnp.asarray([3.0], jnp.float32)
    ref, f_ref = comp.attenuation_scan(one, att0)
    got, f_got = pk.ballistics_pallas(one, att0=att0, tile=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ragged_length_padding():
    stats = _stats(seconds=0.37)  # T not a tile multiple
    ref, _ = comp.attenuation_scan(stats)
    got, _ = pk.ballistics_pallas(stats, tile=1024, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
