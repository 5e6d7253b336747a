"""Dynamic-range compressor replicating pydub's ``compress_dynamic_range``.

The reference's per-band compressor (engine:207-209) is pydub's pure-Python
per-frame loop — the slowest hot loop in the reference system.  Its contract:

* detector: RMS over a *lookback* window of ``attack`` ms ending at (and
  excluding) the current frame, pooled across channels; partial windows at
  the start of the signal.
* gain computer: ``max_attenuation = (1 - 1/ratio) * max(0, dB(rms/thresh))``.
* ballistics (per frame, attenuation in dB):
    if rms > thresh and att <= max_att: att = min(att + max_att/attack_frames, max_att)
    else:                               att = max(att - max_att/release_frames, 0)
  Note the quirk this inherits from pydub: below threshold ``max_att == 0``
  so the decrement is 0 — attenuation *freezes* rather than releasing.  We
  replicate it: it is the sound of the reference (and the structural fact
  the fast paths exploit: ``above ⇔ max_att > 0`` and inc/dec are
  ``max_att`` times constant per-band rates).
* output: ``y = x * 10^(-att/20)``.

TPU decomposition: the detector and gain computer are fully parallel
(log-depth cumsum + strided prefix-sum slices); only the ballistics
recurrence is sequential.  Three executions, all sharing the pydub
contract: the exact ``lax.scan`` (per *control frame*: ``hop`` samples per
step, hop=1 exact), the **block-parallel** approximation (blocks scanned
concurrently under ``vmap``, warm-started by an exact-at-freeze coarse
pre-scan and refined over ``overlap_ctrl`` frames of context), and the
exact single-pass Pallas kernel in ``ops.pallas_kernels`` (the TPU
default).

The float pipeline intentionally skips the reference's int16 round-trip
between stages (engine:204-206) — quantization noise is not replicated.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

__all__ = ["compress_dynamic_range", "compressor_gain_db", "detector_stats"]


def cumsum_mxu(x, axis=-1, block=512):
    """Inclusive cumsum along ``axis`` as a blocked MXU pass.

    XLA lowers ``jnp.cumsum`` over ~1M control frames to log-depth vector
    passes; at detector sizes a (nb, block) @ upper-triangular-ones matmul
    plus a tiny carry cumsum over block totals is several times faster on
    TPU and *more* accurate in f32 (two-stage summation).  Exact same
    partition sums as ``jnp.cumsum`` within each block.
    """
    axis = axis % x.ndim
    if x.shape[axis] <= 2 * block:
        return jnp.cumsum(x, axis=axis)
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    nb = -(-n // block)
    xb = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, nb * block - n)])
    xb = xb.reshape(x.shape[:-1] + (nb, block))
    tri = jnp.triu(jnp.ones((block, block), x.dtype))
    within = jnp.dot(xb, tri, precision=jax.lax.Precision.HIGHEST)
    totals = within[..., -1]
    carry = jnp.cumsum(totals, axis=-1) - totals  # exclusive block carry
    out = (within + carry[..., None]).reshape(x.shape[:-1] + (nb * block,))
    return jnp.moveaxis(out[..., :n], -1, axis)


def _moving_mean_square(x2_mean, look, hop=1):
    """mean(x²) over frames [i-look, i), sampled every ``hop`` frames.

    ``x2_mean``: (N,) channel-pooled squared signal.  The window excludes
    frame i itself (pydub's ``get_sample_slice(i-look, i)``) and is partial
    at the start of the signal (count = min(i, look)); value 0 at i = 0.

    Gather-free: window sums are differences of *slices* of the prefix sum
    (strided for hop > 1, where ``look`` is rounded up to a hop multiple so
    both ends land on the control grid).  Exact at hop=1.
    """
    n = x2_mean.shape[0]
    dt = x2_mean.dtype
    if hop == 1:
        csum = jnp.concatenate([jnp.zeros((1,), dt), cumsum_mxu(x2_mean)])
        hi = csum[:n]
        pad = min(look, n)
        lo = jnp.concatenate([jnp.zeros((pad,), dt), csum[: n - pad]])
        cnt = jnp.minimum(jnp.arange(n), max(look, 1)).clip(1)
        return hi - lo, cnt.astype(dt)
    look_eff = max(hop, -(-look // hop) * hop)
    t = -(-n // hop)
    # Only hop-grid prefix values are consumed, so bucket x² into hop-sized
    # bins first and cumsum T = N/hop partial sums instead of N samples —
    # hop× less sequential-scan work and better f32 summation accuracy
    # (two-stage summation), same values by partition.
    xb = jnp.pad(x2_mean, (0, t * hop - n)).reshape(t, hop).sum(axis=1)
    hi = jnp.concatenate([jnp.zeros((1,), dt), cumsum_mxu(xb)])[:t]
    pad = min(look_eff // hop, t)
    lo = jnp.concatenate([jnp.zeros((pad,), dt), hi[: t - pad]])
    cnt = jnp.minimum(jnp.arange(t) * hop, look_eff).clip(1)
    return hi - lo, cnt.astype(dt)


def detector_stats(x, sample_rate, threshold_db, ratio, attack_ms, release_ms, hop=1):
    """Per-control-frame ballistics inputs (the fully parallel part).

    Args:
      x: ``(N, C)`` band signal (full scale ±1.0).
      hop: control decimation — stats are taken every ``hop`` frames and the
        per-step inc/dec are scaled by ``hop`` (exact at hop=1).

    Returns dict of ``(T,)`` arrays: ``max_att``, ``above``, ``inc``, ``dec``.
    """
    if x.ndim == 1:
        x = x[:, None]
    dt = x.dtype
    look = max(0, int(attack_ms * sample_rate / 1000.0))
    thresh_amp = 10.0 ** (jnp.asarray(threshold_db, dt) / 20.0)
    x2 = (x * x).mean(axis=1)
    wsum, cnt = _moving_mean_square(x2, look, hop=hop)
    ms = wsum / cnt
    rms = jnp.sqrt(jnp.maximum(ms, 0.0))
    eps = jnp.asarray(1e-30, dt)
    db_over = jnp.maximum(20.0 * jnp.log10(jnp.maximum(rms, eps) / thresh_amp), 0.0)
    db_over = jnp.where(rms > 0, db_over, 0.0)
    ratio = jnp.asarray(ratio, dt)
    max_att = (1.0 - 1.0 / ratio) * db_over
    attack_frames = max(attack_ms * sample_rate / 1000.0, 1.0)
    release_frames = max(release_ms * sample_rate / 1000.0, 1.0)
    return {
        "max_att": max_att,
        "above": rms > thresh_amp,
        "inc": max_att / attack_frames * hop,
        "dec": max_att / release_frames * hop,
    }


def detector_stats_bands(bands, sample_rate, thresholds_db, ratios,
                         attacks_ms, releases_ms, hop=1):
    """Batched :func:`detector_stats` over a leading bands axis.

    One squared-signal/bucket/cumsum pass for all bands (the HBM-heavy
    part — per-band calls each re-traverse the signal), then per-band
    window slices and gain computers (cheap, control-rate).  Exact: the
    per-row summation order equals the single-band path's.

    Args:
      bands: ``(B, N, C)`` band signals, or a sequence of B ``(N, C)``
        arrays.  The sequence form is the hot path: per-band squared means
        fuse into each band's producer instead of forcing a stacked
        ``(B, N, C)`` materialization (see multiband._crossover_bands).
      thresholds_db / ratios: length-B (traced OK).
      attacks_ms / releases_ms: length-B static floats.

    Returns dict of ``(T, B)`` arrays (``attenuation_scan``'s stacked
    layout): ``max_att``, ``above``, ``inc``, ``dec``.
    """
    if hasattr(bands, "ndim"):
        bands = [bands[i] for i in range(bands.shape[0])]
    b = len(bands)
    n = bands[0].shape[0]
    dt = bands[0].dtype
    x2_rows = [(x * x).mean(axis=1) for x in bands]  # B × (N,)

    if hop == 1:
        csum = jnp.concatenate(
            [jnp.zeros((b, 1), dt),
             cumsum_mxu(jnp.stack(x2_rows), axis=1)], axis=1)
        hi_rows = csum[:, :n]
        t = n
        grid = 1
    else:
        # bucket each band to the control rate FIRST (a (T,) array), then
        # stack: all stacked work is control-rate, never sample-rate
        t = -(-n // hop)
        xb = jnp.stack([
            jnp.pad(r, (0, t * hop - n)).reshape(t, hop).sum(-1)
            for r in x2_rows])
        hi_rows = jnp.concatenate(
            [jnp.zeros((b, 1), dt), cumsum_mxu(xb, axis=1)], axis=1)[:, :t]
        grid = hop

    ms_cols = []
    att_f = []
    rel_f = []
    for i in range(b):
        look = max(0, int(attacks_ms[i] * sample_rate / 1000.0))
        look_eff = look if grid == 1 else max(hop, -(-look // hop) * hop)
        pad = min(look_eff // grid if grid > 1 else min(look, t), t)
        hi = hi_rows[i]
        lo = jnp.concatenate([jnp.zeros((pad,), dt), hi[: t - pad]])
        cnt = jnp.minimum(jnp.arange(t) * grid,
                          max(look_eff if grid > 1 else look, 1)).clip(1)
        ms_cols.append((hi - lo) / cnt.astype(dt))
        att_f.append(max(attacks_ms[i] * sample_rate / 1000.0, 1.0))
        rel_f.append(max(releases_ms[i] * sample_rate / 1000.0, 1.0))

    ms = jnp.stack(ms_cols, axis=-1)  # (T, B)
    return gain_computer_stats(ms, thresholds_db, ratios, att_f, rel_f, hop)


def gain_computer_stats(ms, thresholds_db, ratios, att_f, rel_f, hop):
    """dB-domain gain computer + ballistics rates from mean-square
    envelopes — the ONE definition of the detector→stats contract, shared
    by :func:`detector_stats_bands` and the fused worker-path detector
    (``ops.multiband.detector_stats_fused``) so the two can never diverge.

    Args:
      ms: ``(T, B)`` per-band mean-square envelope columns.
      att_f / rel_f: length-B attack/release frame counts (static floats).
    Returns the ``attenuation_scan`` stats dict of ``(T, B)`` arrays.
    """
    dt = ms.dtype
    thresh_amp = 10.0 ** (jnp.stack(
        [jnp.asarray(x, dt) for x in thresholds_db]) / 20.0)  # (B,)
    rms = jnp.sqrt(jnp.maximum(ms, 0.0))
    eps = jnp.asarray(1e-30, dt)
    db_over = jnp.maximum(
        20.0 * jnp.log10(jnp.maximum(rms, eps) / thresh_amp), 0.0)
    db_over = jnp.where(rms > 0, db_over, 0.0)
    ratio = jnp.stack([jnp.asarray(r, dt) for r in ratios])
    max_att = (1.0 - 1.0 / ratio) * db_over
    att_f = jnp.asarray(att_f, dt)
    rel_f = jnp.asarray(rel_f, dt)
    return {
        "max_att": max_att,
        "above": rms > thresh_amp,
        "inc": max_att / att_f * hop,
        "dec": max_att / rel_f * hop,
    }


def gain_computer_stats_bt(ms_bt, thresholds_db, ratios, att_f, rel_f, hop):
    """Band-major ``(B, T)`` twin of :func:`gain_computer_stats` — same
    math with the band axis leading (stats dict of ``(B, T)`` arrays).
    Control pipelines that feed the band-major Pallas ballistics kernel
    keep this layout end to end: bands ride the sublane axis instead of
    wasting 125/128 lanes per control-rate op."""
    dt = ms_bt.dtype
    thresh_amp = 10.0 ** (jnp.stack(
        [jnp.asarray(x, dt) for x in thresholds_db]) / 20.0)[:, None]
    rms = jnp.sqrt(jnp.maximum(ms_bt, 0.0))
    eps = jnp.asarray(1e-30, dt)
    db_over = jnp.maximum(
        20.0 * jnp.log10(jnp.maximum(rms, eps) / thresh_amp), 0.0)
    db_over = jnp.where(rms > 0, db_over, 0.0)
    ratio = jnp.stack([jnp.asarray(r, dt) for r in ratios])[:, None]
    max_att = (1.0 - 1.0 / ratio) * db_over
    att_f = jnp.asarray(att_f, dt)[:, None]
    rel_f = jnp.asarray(rel_f, dt)[:, None]
    return {
        "max_att": max_att,
        "above": rms > thresh_amp,
        "inc": max_att / att_f * hop,
        "dec": max_att / rel_f * hop,
    }


def _ballistics_step(att, inputs):
    m, above, inc, dec = inputs
    attack = jnp.minimum(att + inc, m)
    release = jnp.maximum(att - dec, 0.0)
    new = jnp.where(above & (att <= m), attack, release)
    return new, new


def attenuation_scan(stats, att0=None):
    """Exact sequential ballistics over stacked control stats.

    ``stats`` values are ``(T, ...)`` — trailing dims (e.g. a bands axis)
    ride along in the carry, so one scan serves all bands at once.
    Returns ``(att (T, ...), att_final)``.
    """
    m = stats["max_att"]
    if att0 is None:
        att0 = jnp.zeros(m.shape[1:], m.dtype)
    final, att = jax.lax.scan(
        _ballistics_step, att0, (m, stats["above"], stats["inc"], stats["dec"])
    )
    return att, final


def attenuation_coarse(stats, factor, att0=None):
    """Exact-at-freeze coarse estimate: the ballistics run on every
    ``factor``-th control frame with rates scaled by ``factor``.

    pydub's below-threshold freeze (max_att == 0 → dec == 0 → identity) is
    representable exactly at any rate, so this coarse pass tracks the long
    memory that overlap warm-up cannot; active periods are coarse here but
    are corrected by the blocked pass's local warm-up.  Returns the coarse
    attenuation sampled back onto the full control grid ``(T, ...)``.
    """
    sub = {
        "max_att": stats["max_att"][::factor],
        "above": stats["above"][::factor],
        "inc": stats["inc"][::factor] * factor,
        "dec": stats["dec"][::factor] * factor,
    }
    att_c, final = attenuation_scan(sub, att0)
    t = stats["max_att"].shape[0]
    idx = jnp.arange(t) // factor
    return att_c[idx], final


def attenuation_blocked(stats, block_ctrl, overlap_ctrl, att0=None,
                        coarse_factor=64):
    """Block-parallel ballistics: coarse pre-scan + overlap warm-up.

    The control timeline is cut into blocks of ``block_ctrl`` steps; all
    blocks scan concurrently under ``vmap`` (sequential depth
    ``overlap_ctrl + block_ctrl`` instead of T).  Each block is warm-started
    from the coarse pre-scan's value at its start (handling pydub's
    below-threshold freeze, whose memory never fades) and refined over
    ``overlap_ctrl`` preceding frames (handling active periods, where the
    clamps give fading memory).  Block 0's pre-context is masked to a no-op,
    so it starts exactly at ``att0``.
    """
    m = stats["max_att"]
    t = m.shape[0]
    trailing = m.shape[1:]
    nb = -(-t // block_ctrl)
    pad = nb * block_ctrl - t

    def window(a, fill):
        a = jnp.concatenate([a, jnp.full((pad,) + trailing, fill, a.dtype)])
        idx = (jnp.arange(nb)[:, None] * block_ctrl
               + jnp.arange(-overlap_ctrl, block_ctrl)[None, :])
        valid = idx >= 0
        return jnp.where(
            valid.reshape(valid.shape + (1,) * len(trailing)),
            a[jnp.clip(idx, 0, nb * block_ctrl - 1)],
            fill,
        ), valid

    mw, _ = window(m, 0.0)
    aw, _ = window(stats["above"].astype(m.dtype), 0.0)
    iw, _ = window(stats["inc"], 0.0)
    dw, _ = window(stats["dec"], 0.0)

    if att0 is None:
        att0 = jnp.zeros(trailing, m.dtype)
    if coarse_factor and t > coarse_factor:
        att_coarse, _ = attenuation_coarse(stats, coarse_factor, att0)
        # coarse value just before each block's warm-up window begins
        warm_start = jnp.maximum(jnp.arange(nb) * block_ctrl - overlap_ctrl, 0)
        att0s = att_coarse[warm_start]
        att0s = att0s.at[0].set(att0)
    else:
        att0s = jnp.broadcast_to(att0, (nb,) + trailing)

    def scan_block(a0, mm, ab, ii, dd):
        _, att = jax.lax.scan(_ballistics_step, a0, (mm, ab.astype(bool), ii, dd))
        return att

    att = jax.vmap(scan_block)(att0s, mw, aw, iw, dw)  # (nb, ov+blk, ...)
    att = att[:, overlap_ctrl:].reshape((nb * block_ctrl,) + trailing)[:t]
    return att, att[-1]


def compressor_gain_db(x, sample_rate, threshold_db, ratio, attack_ms, release_ms,
                       hop=1, block_ctrl=None, overlap_ctrl=None):
    """Full-rate attenuation (dB ≥ 0) for one band. ``(N,)`` output."""
    stats = detector_stats(x, sample_rate, threshold_db, ratio, attack_ms,
                           release_ms, hop=hop)
    if block_ctrl is None:
        att, _ = attenuation_scan(stats)
    else:
        if overlap_ctrl is None:
            overlap_ctrl = _default_overlap(sample_rate, release_ms, hop)
        att, _ = attenuation_blocked(stats, block_ctrl, overlap_ctrl)
    n = x.shape[0]
    if hop > 1:
        att = jnp.repeat(att, hop, axis=0)[:n]
    return att


def _default_overlap(sample_rate, release_ms, hop):
    # ≥ 4 release time-constants of context wipes out the warm-up error.
    return max(64, int(4 * release_ms * sample_rate / 1000.0 / hop))


def compress_dynamic_range(x, sample_rate, threshold=-20.0, ratio=4.0,
                           attack=5.0, release=50.0, hop=1,
                           block_ctrl=None, overlap_ctrl=None):
    """pydub-contract compressor on float audio ``(N, C)`` or ``(N,)``."""
    att = compressor_gain_db(x, sample_rate, threshold, ratio, attack, release,
                             hop=hop, block_ctrl=block_ctrl,
                             overlap_ctrl=overlap_ctrl)
    gain = 10.0 ** (-att / 20.0)
    if x.ndim == 2:
        gain = gain[:, None]
    return x * gain
