"""Extended loudness/peak telemetry: momentary, short-term, LRA, true peak.

The reference only measures integrated loudness (engine:212-222).  A
mastering framework needs the full EBU R128 / BS.1770-4 meter family:

* momentary loudness (400 ms) and short-term loudness (3 s) time series —
  built from the same 100 ms K-weighted cell energies the integrated meter
  accumulates (so they stream for free);
* loudness range (LRA, EBU R128 / EBU Tech 3342): the 10th→95th percentile
  spread of short-term loudness after an absolute −70 and relative −20 LU
  gate;
* true peak (BS.1770-4 Annex 2): inter-sample peaks estimated by 4×
  polyphase FIR oversampling, expressed in dBTP.

All jit-compatible; validated against scipy (resample_poly) and closed-form
sine cases in tests/test_meters.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from python_audio_mastering_tpu.ops.loudness import (
    _LOUDNESS_OFFSET,
    block_cell_energies,
    channel_weights,
)

__all__ = ["momentary_loudness", "shortterm_loudness", "loudness_range",
           "true_peak_db", "true_peak_linear"]


def _sliding_loudness(cell_ms, cells_per_window, weights=None):
    n_cells, c = cell_ms.shape
    if weights is None:
        weights = channel_weights(c, dtype=cell_ms.dtype)
    if n_cells < cells_per_window:
        return jnp.full((0,), jnp.nan, cell_ms.dtype)
    csum = jnp.concatenate([jnp.zeros((1, c), cell_ms.dtype),
                            jnp.cumsum(cell_ms, axis=0)])
    win = (csum[cells_per_window:] - csum[:-cells_per_window]) / cells_per_window
    eps = jnp.asarray(np.finfo(np.float32).tiny, cell_ms.dtype)
    return _LOUDNESS_OFFSET + 10.0 * jnp.log10(jnp.maximum(win @ weights, eps))


def momentary_loudness(x, sample_rate, downmix="bs1770"):
    """400 ms momentary loudness series (one value per 100 ms step)."""
    if x.ndim == 2 and downmix == "reference_mono_mean":
        x = x.mean(axis=1)
    cells, _ = block_cell_energies(x, sample_rate)
    return _sliding_loudness(cells, 4)


def shortterm_loudness(x, sample_rate, downmix="bs1770"):
    """3 s short-term loudness series (one value per 100 ms step)."""
    if x.ndim == 2 and downmix == "reference_mono_mean":
        x = x.mean(axis=1)
    cells, _ = block_cell_energies(x, sample_rate)
    return _sliding_loudness(cells, 30)


def loudness_range(x, sample_rate):
    """EBU R128 loudness range (LU), from gated short-term percentiles."""
    return lra_from_shortterm(shortterm_loudness(x, sample_rate))


def lra_from_shortterm(st):
    """LRA from a precomputed short-term loudness series (streaming path:
    the series comes from accumulated 100 ms cells, no second signal pass)."""
    if st.shape[0] == 0:
        return jnp.asarray(jnp.nan)
    abs_mask = st > -70.0
    n_abs = jnp.sum(abs_mask)
    mean_power = jnp.sum(jnp.where(abs_mask, 10.0 ** (st / 10.0), 0.0)) / \
        jnp.maximum(n_abs, 1)
    rel_gate = 10.0 * jnp.log10(jnp.maximum(mean_power, 1e-30)) - 20.0
    mask = abs_mask & (st >= rel_gate)

    # masked percentiles via sorting (gated-out entries pushed to +inf)
    vals = jnp.where(mask, st, jnp.inf)
    svals = jnp.sort(vals)
    cnt = jnp.sum(mask)

    def pct(p):
        idx = jnp.clip((p * (cnt - 1)).astype(jnp.int32), 0, st.shape[0] - 1)
        return svals[idx]

    lra = pct(0.95) - pct(0.10)
    return jnp.where(cnt > 1, lra, 0.0)


@functools.lru_cache(maxsize=8)
def _oversample_taps(factor=4, taps_per_phase=32):
    """Kaiser-windowed-sinc polyphase interpolator.

    Longer and flatter than the BS.1770 Annex 2 example filter (whose stated
    accuracy is only +0.55/−0.59 dB); this one tracks a 16× scipy
    resample_poly reference within ~0.05 dB on broadband material.
    """
    n = factor * taps_per_phase
    t = (np.arange(n) - (n - 1) / 2.0) / factor
    h = np.sinc(t) * np.kaiser(n, 9.0)
    return (h * factor / h.sum()).astype(np.float64)


def true_peak_linear(x, sample_rate=None, factor: int = 4,
                     exclude_pad=(False, False)):
    """Max inter-sample (true) peak magnitude, linear scale.

    4× polyphase FIR oversampling per BS.1770-4 Annex 2; sample_rate is
    accepted for API symmetry (the estimate is rate-agnostic).

    ``exclude_pad=(head, tail)``: when a side is True, interpolation
    windows touching that side's zero padding are excluded from the max
    (the direct sample-peak term always covers every real sample).  Used
    by the streaming meter, where an edge evaluated against zeros here is
    re-evaluated with its real neighbour samples in the adjacent chunk —
    keeping the zero-context value would let a truncated interpolation sum
    exceed the true one (parallel/streaming._tp_chunk).
    """
    if x.ndim == 1:
        x = x[:, None]
    n = x.shape[0]
    h = jnp.asarray(_oversample_taps(factor), x.dtype)
    n_taps = h.shape[0]
    # polyphase: phase p taps are h[p::factor]
    phases = h.reshape(-1, factor).T  # (factor, taps_per_phase)
    k = n_taps // factor  # taps per phase == pad per side
    xp = jnp.pad(x, ((k, k), (0, 0)))
    # acc[j] reads xp[j .. j+k-1]; entries touching the left zero pad have
    # j < k, entries touching the right zero pad have j >= n + 1
    lo = k if exclude_pad[0] else 0
    hi = (n + 1) if exclude_pad[1] else (xp.shape[0] - k + 1)

    def conv_phase(taps):
        acc = jnp.zeros((xp.shape[0] - k + 1, x.shape[1]), x.dtype)
        for i in range(k):  # static, small
            acc = acc + taps[i] * jax.lax.slice_in_dim(
                xp, k - 1 - i, xp.shape[0] - i, axis=0)
        return jnp.max(jnp.abs(acc[lo:hi]))

    peaks = jnp.stack([conv_phase(phases[p]) for p in range(factor)])
    return jnp.maximum(jnp.max(peaks), jnp.max(jnp.abs(x)))


def true_peak_db(x, sample_rate=None, factor: int = 4):
    """True peak in dBTP."""
    tp = true_peak_linear(x, sample_rate, factor)
    return 20.0 * jnp.log10(jnp.maximum(tp, 1e-12))
