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

Streaming: every stage has *finite* temporal support except the release
recurrence, whose per-step map is clamp-affine (carryable as one scalar).
:func:`lookahead_limiter_chunk` therefore processes arbitrarily long audio
chunk by chunk with a carried ``(look+khalf)``-sample history +
``(2·look+khalf)``-sample pending buffer and a release-gain scalar,
matching the one-shot limiter to float roundoff (tests/test_streaming.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["lookahead_limiter", "lookahead_limiter_chunk",
           "lookahead_limiter_init", "LookaheadLimiterState"]


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


def _release_scan(target, rho, g0=None):
    """Exact parallel release: g[i] = min(target[i], 1 - (1-g[i-1])·rho).

    Each step is ``f_i(g) = min(t_i, rho·g + (1-rho))`` — affine with a cap.
    Composition: ``f2∘f1 = min(min(t2, rho·t1 + (1-rho)),
    rho²·g + ...)`` stays in the (scale, offset, cap) family, so the whole
    recurrence is one associative scan.  ``g0``: incoming gain (1 at the
    signal start; the carried value when streaming).
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
    if g0 is None:
        g0 = jnp.asarray(1.0, dt)  # unity gain before the signal starts
    return jnp.minimum(c, s * g0 + o)


def _tp_khalf(true_peak: bool) -> int:
    """Half-width of the true-peak interpolator's per-phase tap window."""
    if not true_peak:
        return 0
    from python_audio_mastering_tpu.ops.meters import _oversample_taps

    return (_oversample_taps(4).shape[0] // 4) // 2


def _peak_env(x, true_peak):
    """Per-position cross-channel (true-)peak envelope of ``(N, C)`` audio.

    Zero-pads ``x`` by ``khalf`` for the interpolator — correct at the true
    signal edges; interior streaming callers arrange real context so the
    padded positions are never consumed.
    """
    n, c = x.shape
    dt = x.dtype
    peak = jnp.max(jnp.abs(x), axis=1)
    if not true_peak:
        return peak
    # interpolate the SIGNED waveform per channel (rectifying first would
    # alias away the inter-sample crests), then rectify and pool
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
    return env


def _attack_gain(raw_gain, look):
    """Erosion (centered windowed min, edge-replicated) + look-wide moving
    average — the attack shaping shared by one-shot and streamed paths."""
    n = raw_gain.shape[0]
    dt = raw_gain.dtype
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
    return att_gain


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
    dt = x.dtype
    ceiling = jnp.asarray(10.0 ** (ceiling_db / 20.0), dt)
    look = max(1, int(lookahead_ms * sample_rate / 1000.0))

    peak = _peak_env(x, true_peak)
    raw_gain = jnp.minimum(1.0, ceiling / jnp.maximum(peak, 1e-9))
    att_gain = _attack_gain(raw_gain, look)

    rho = jnp.asarray(math.exp(-1.0 / (release_ms * sample_rate / 1000.0)), dt)
    gain = _release_scan(att_gain, rho)

    y = x * gain[:, None]
    if squeeze:
        y = y[:, 0]
    return y


# ---------------------------------------------------------------------------
# Streaming (chunked) execution with exact one-shot parity
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LookaheadLimiterState:
    """Carried streaming state.

    ``buf`` holds the raw input samples still needed: ``pend`` not-yet-
    emitted positions (they lack right context) preceded by up to
    ``look + khalf`` history samples (left context for the pending
    positions' gain windows).  ``g`` is the release-recurrence carry.
    ``pend`` is static metadata (it stabilizes at ``2·look + khalf`` after
    the first chunk, so compiled shapes stabilize too).
    """

    buf: Any
    g: Any
    pend: int = 0


jax.tree_util.register_dataclass(
    LookaheadLimiterState, data_fields=["buf", "g"], meta_fields=["pend"])


def lookahead_limiter_init(channels: int, dtype=jnp.float32):
    """Fresh state for :func:`lookahead_limiter_chunk`."""
    return LookaheadLimiterState(
        buf=jnp.zeros((0, channels), dtype), g=jnp.asarray(1.0, dtype), pend=0)


def lookahead_limiter_chunk(chunk, state: LookaheadLimiterState, sample_rate,
                            ceiling_db=-1.0, lookahead_ms=1.5,
                            release_ms=60.0, true_peak=True, flush=False):
    """One streaming step of the lookahead limiter.

    Feed ``(M, C)`` chunks in order, then one final call with
    ``flush=True`` (``chunk`` may be None) to drain the pending buffer with
    the one-shot right-edge semantics.  Concatenated emissions equal
    :func:`lookahead_limiter` on the whole signal to float roundoff: every
    gain stage except the release has finite support (erosion needs ±look,
    the average +look, the interpolator ±khalf), so recomputing it on
    ``buf ++ chunk`` windows is exact; the release carry ``g`` is exact
    because its per-step maps are clamp-affine.

    Returns ``(y_emitted (E, C), new_state)`` — E varies at the first and
    final calls and equals the chunk length at steady state.
    """
    look = max(1, int(lookahead_ms * sample_rate / 1000.0))
    khalf = _tp_khalf(true_peak)
    h_left = look + khalf
    h_right = 2 * look + khalf

    if chunk is None:
        chunk = jnp.zeros((0,) + state.buf.shape[1:], state.buf.dtype)
    if chunk.ndim == 1:
        chunk = chunk[:, None]
    work = jnp.concatenate([state.buf.astype(chunk.dtype), chunk]) \
        if state.buf.shape[0] else chunk
    w = work.shape[0]
    b = state.buf.shape[0]
    e0 = b - state.pend            # first un-emitted position in `work`
    n_avail = w - e0
    n_emit = n_avail if flush else max(0, n_avail - h_right)

    if n_emit == 0:
        new_pend = n_avail
        new_buf = work[max(0, w - (new_pend + h_left)):]
        return (jnp.zeros((0, work.shape[1]), work.dtype),
                LookaheadLimiterState(buf=new_buf, g=state.g, pend=new_pend))

    dt = work.dtype
    ceiling = jnp.asarray(10.0 ** (ceiling_db / 20.0), dt)
    peak = _peak_env(work, true_peak)
    raw_gain = jnp.minimum(1.0, ceiling / jnp.maximum(peak, 1e-9))
    att_gain = _attack_gain(raw_gain, look)

    rho = jnp.asarray(math.exp(-1.0 / (release_ms * sample_rate / 1000.0)), dt)
    gain = _release_scan(att_gain[e0: e0 + n_emit], rho, g0=state.g)
    y = work[e0: e0 + n_emit] * gain[:, None]

    new_pend = n_avail - n_emit
    new_buf = work[max(0, w - (new_pend + h_left)):]
    return y, LookaheadLimiterState(buf=new_buf, g=gain[-1], pend=new_pend)
