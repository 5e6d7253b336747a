"""True-peak lookahead brickwall limiter (quality mode).

The reference's limiter is an instantaneous soft knee (engine:224-227) —
it distorts sustained overs and ignores inter-sample peaks.  This one is a
proper mastering limiter, and every stage is parallel:

* detection: per-sample cross-channel peak, optionally the 4× oversampled
  *true peak* envelope (BS.1770-4 Annex 2 interpolator, shared with
  ``ops.meters``);
* attack: the raw gain is eroded by a forward-looking windowed **min**
  (log-depth doubling passes) while the signal is delayed by the lookahead,
  so gain reaches its floor *before* the peak arrives — no overshoot;
* release: the one-pole exponential recovery ``g[i] = min(t[i],
  1 - (1-g[i-1])·ρ)`` is a composition of monotone clamp-affine maps,
  which is closed under composition — so it runs as an **exact
  ``associative_scan``** (no sequential pass, no approximation).

Exact vs the per-sample reference loop (tests/test_limiter.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["lookahead_limiter"]


def _windowed_min_forward(g, window):
    """min over [i, i+window) per position, via log-depth doubling."""
    n = g.shape[0]
    out = g
    span = 1
    while span < window:
        step = min(span, window - span)
        shifted = jnp.concatenate([out[step:], jnp.full((step,), jnp.inf,
                                                        out.dtype)])[:n]
        out = jnp.minimum(out, shifted)
        span += step
    return out


def _release_scan(target, rho):
    """Exact parallel release: g[i] = min(target[i], 1 - (1-g[i-1])·rho).

    Each step is ``f_i(g) = min(t_i, rho·g + (1-rho))`` — affine with a cap.
    Composition: ``f2∘f1 = min(min(t2, rho·t1 + (1-rho)),
    rho²·g + ...)`` stays in the (scale, offset, cap) family, so the whole
    recurrence is one associative scan.
    """
    n = target.shape[0]
    dt = target.dtype
    scale = jnp.full((n,), rho, dt)
    offset = jnp.full((n,), 1.0 - rho, dt)
    cap = target

    def combine(left, right):
        s1, o1, c1 = left
        s2, o2, c2 = right
        return (s1 * s2, o1 * s2 + o2, jnp.minimum(c2, c1 * s2 + o2))

    s, o, c = jax.lax.associative_scan(combine, (scale, offset, cap))
    g0 = jnp.asarray(1.0, dt)  # unity gain before the signal starts
    return jnp.minimum(c, s * g0 + o)


def lookahead_limiter(x, sample_rate, ceiling_db=-1.0, lookahead_ms=1.5,
                      release_ms=60.0, true_peak=True):
    """Limit ``(N, C)`` (or mono) audio to ``ceiling_db`` (dBTP by default).

    Returns audio of the same shape, delayed internally by the lookahead
    (output is time-aligned: the delay is applied to the signal relative to
    its gain curve, then trimmed).
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, c = x.shape
    dt = x.dtype
    ceiling = jnp.asarray(10.0 ** (ceiling_db / 20.0), dt)
    look = max(1, int(lookahead_ms * sample_rate / 1000.0))

    peak = jnp.max(jnp.abs(x), axis=1)
    if true_peak:
        # interpolate the SIGNED waveform per channel (rectifying first
        # would alias away the inter-sample crests), then rectify and pool
        from python_audio_mastering_tpu.ops.meters import _oversample_taps

        taps = jnp.asarray(_oversample_taps(4), dt)
        phases = taps.reshape(-1, 4).T  # (4, taps_per_phase)
        k = phases.shape[1]
        xp = jnp.pad(x, ((k // 2, k // 2), (0, 0)))
        env = peak
        for p in range(4):
            acc = jnp.zeros((xp.shape[0] - k + 1, c), dt)
            for i in range(k):
                acc = acc + phases[p, i] * jax.lax.slice_in_dim(
                    xp, k - 1 - i, xp.shape[0] - i, axis=0)
            env = jnp.maximum(env, jnp.max(jnp.abs(acc[:n]), axis=1))
        peak = env

    raw_gain = jnp.minimum(1.0, ceiling / jnp.maximum(peak, 1e-9))

    # centered erosion (±look): att[i] = min raw_gain[i-look .. i+look]
    padded = jnp.concatenate([jnp.full((look,), raw_gain[0], dt), raw_gain,
                              jnp.full((look,), raw_gain[-1], dt)])
    att_gain = _windowed_min_forward(padded, 2 * look + 1)[:n]

    # look-wide moving average: every att[j] in the average has a window
    # covering position i, so smoothed[i] ≤ raw_gain[i] — a smooth attack
    # ramp with a hard no-overshoot guarantee and zero added latency.
    if look > 1:
        ext = jnp.concatenate([att_gain, jnp.full((look,), att_gain[-1], dt)])
        csum = jnp.concatenate([jnp.zeros((1,), dt), jnp.cumsum(ext)])
        att_gain = (csum[look: n + look] - csum[:n]) / look

    rho = jnp.asarray(math.exp(-1.0 / (release_ms * sample_rate / 1000.0)), dt)
    gain = _release_scan(att_gain, rho)

    y = x * gain[:, None]
    if squeeze:
        y = y[:, 0]
    return y
