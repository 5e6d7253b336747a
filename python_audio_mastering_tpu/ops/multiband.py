"""3-band multiband compressor (reference engine:196-210, main.py:156-176).

Crossovers at 250 Hz / 4 kHz via 4th-order Butterworth filters (static
coefficients, designed host-side in float64).  Two split topologies from the
reference's divergent engine copies:

* ``"worker"`` (canonical): ``low = LP4(x)``, ``high = HP4(x)``,
  ``mid = x - low - high`` — the subtraction split (engine:200-202).  Not
  phase-coherent, but it is the reference's sound; bands sum back to the
  input minus compressor action.
* ``"legacy"``: ``mid = LP4@4k( HP4@250(x) )`` cascade (main.py:165-168).

Per-band compression uses the pydub-contract compressor with the reference's
fixed ballistics: low 10/200 ms, mid 5/150 ms, high 1/50 ms attack/release
(engine:207-209).  Band recombination is a float sum (the reference
overlays int16 segments — saturating adds — which we deliberately do not
replicate; the chain's limiter handles overs).

The three band detectors run fully in parallel; the three ballistics
recurrences are fused into a *single* scan with a (3,)-vector carry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from python_audio_mastering_tpu.ops import compressor as comp
from python_audio_mastering_tpu.ops import iir
from python_audio_mastering_tpu.ops.biquad import butter_sos

__all__ = ["crossover_split", "multiband_compress",
           "multiband_compress_rows", "BAND_BALLISTICS_MS",
           "detector_stats_fused"]

# (attack_ms, release_ms) per band, fixed in the reference (engine:207-209).
BAND_BALLISTICS_MS = ((10.0, 200.0), (5.0, 150.0), (1.0, 50.0))


@functools.lru_cache(maxsize=None)
def _crossover_sos(sample_rate, low_crossover, high_crossover):
    lp = butter_sos(4, low_crossover, "lowpass", fs=sample_rate)
    hp = butter_sos(4, high_crossover, "highpass", fs=sample_rate)
    return np.asarray(lp), np.asarray(hp)


# Control-rate resampling as MXU matmuls (measured on the bench chip,
# 3-min track, hop 8): the (t, hop) reshape needed by a lane-axis bucket
# sum puts ``hop`` on the 128-lane axis, which costs a full-signal relayout
# copy per band (~0.78 ms each), and ``jnp.repeat`` of the control-rate
# gains pays the same relayout in reverse (~0.79 ms per gain).  Folding
# the signal as ``(n/512, 512)`` rows is free (512 stays minor), and a
# tiny ones matrix turns bucket-sum (and its transpose, hop-upsample)
# into one fused MXU pass: detector stats 5.9 → 1.6 ms, gain epilogue
# 5.3 → 1.7 ms.
_BUCKET_BLK = 512


@functools.lru_cache(maxsize=None)
def _bucket_matrix(blk, hop):
    """(blk, blk//hop) 0/1 matrix: column k sums lanes [k·hop, (k+1)·hop)."""
    s = np.zeros((blk, blk // hop), np.float32)
    for k in range(blk // hop):
        s[hop * k:hop * (k + 1), k] = 1.0
    return s


def _bucket_aligned(n, hop):
    return hop > 1 and _BUCKET_BLK % hop == 0 and n % _BUCKET_BLK == 0


def _bucket_sum_mxu(r, n, hop):
    """Hop-bucket sums of a flat ``(n,)`` row via one MXU dot → ``(n//hop,)``."""
    s = jnp.asarray(_bucket_matrix(_BUCKET_BLK, hop), r.dtype)
    folded = r.reshape(n // _BUCKET_BLK, _BUCKET_BLK)
    out = jax.lax.dot_general(folded, s, (((1,), (0,)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST)
    return out.reshape(n // hop)


def _upsample_mxu(cols, n, hop):
    """Hop-upsample ``(t, K)`` control-rate columns → ``(K, n)`` full rate."""
    t, k = cols.shape
    u = jnp.asarray(_bucket_matrix(_BUCKET_BLK, hop).T, cols.dtype)
    rows = cols.T.reshape(k * (n // _BUCKET_BLK), _BUCKET_BLK // hop)
    full = jax.lax.dot_general(rows, u, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)
    return full.reshape(k, n)


def _crossover_bands(x, sample_rate, variant="worker", low_crossover=250.0,
                     high_crossover=4000.0, filter_method="auto", zi=None):
    """Split ``(N, C)`` audio into a ``(low, mid, high)`` TUPLE of bands.

    The tuple form is the hot-path representation: ``jnp.stack`` on three
    full-length bands lowers to pad+add concatenates that XLA materializes
    per consumer (~2×570 MB of HBM traffic per 3-min track, measured in the
    compiled HLO) — keeping bands separate lets each one fuse into its
    detector/recombine consumers instead.
    """
    lp_sos, hp_sos = _crossover_sos(sample_rate, low_crossover, high_crossover)
    zi = zi or {}
    run = functools.partial(iir.sosfilt, method=filter_method)
    # 512 here is the iir default block_size these crossover calls use;
    # 4x is sosfilt's own auto scan/blocked threshold
    blocked = filter_method == "blocked" or (
        filter_method == "auto" and x.shape[0] >= 4 * 512)

    if variant == "worker":
        if blocked:
            # shared-block pass: x is read once for both crossover filters
            (low, high), (z_lp, z_hp) = iir.sosfilt_blocked_multi(
                (lp_sos, hp_sos), x, (zi.get("lp"), zi.get("hp")))
        else:
            low, z_lp = run(lp_sos, x, zi.get("lp"))
            high, z_hp = run(hp_sos, x, zi.get("hp"))
        mid = x - low - high
        zf = {"lp": z_lp, "hp": z_hp}
    elif variant == "legacy":
        hp_low = butter_sos(4, low_crossover, "highpass", fs=sample_rate)
        lp_high = butter_sos(4, high_crossover, "lowpass", fs=sample_rate)
        if blocked:
            # lp/hp/mid-hp all read x — one shared-block pass for the three
            (low, high, mid1), (z_lp, z_hp, z_m1) = iir.sosfilt_blocked_multi(
                (lp_sos, hp_sos, hp_low), x,
                (zi.get("lp"), zi.get("hp"), zi.get("mid_hp")))
        else:
            low, z_lp = run(lp_sos, x, zi.get("lp"))
            high, z_hp = run(hp_sos, x, zi.get("hp"))
            mid1, z_m1 = run(hp_low, x, zi.get("mid_hp"))
        mid, z_m2 = run(lp_high, mid1, zi.get("mid_lp"))
        zf = {"lp": z_lp, "hp": z_hp, "mid_hp": z_m1, "mid_lp": z_m2}
    else:
        raise ValueError(f"unknown crossover variant {variant!r}")
    return (low, mid, high), zf


def crossover_split(x, sample_rate, variant="worker", low_crossover=250.0,
                    high_crossover=4000.0, filter_method="auto", zi=None):
    """Split ``(N, C)`` audio into (low, mid, high), stacked as ``(3, N, C)``.

    ``zi``: optional carried crossover filter state (pytree of per-filter
    states) for chunked streaming.  Returns ``(bands, zf)``.
    """
    bands, zf = _crossover_bands(x, sample_rate, variant=variant,
                                 low_crossover=low_crossover,
                                 high_crossover=high_crossover,
                                 filter_method=filter_method, zi=zi)
    return jnp.stack(list(bands)), zf


def detector_lookpad(sample_rate, hop=1):
    """Carried detector-tail length: max band lookback, rounded up to hop."""
    look_max = max(int(a * sample_rate / 1000.0) for a, _ in BAND_BALLISTICS_MS)
    return -(-look_max // hop) * hop


def detector_stats_fused(x, low, high, sample_rate, thresholds_db, ratios,
                         hop=1, ctrl_tail=None, channel_major=False):
    """Detector stats for the worker split WITHOUT materializing the mid
    band — the HBM-lean formulation (VERDICT r2 #2).

    ``mid = x - low - high`` appears only inside the squared-energy
    reduction here (and inside the gain-apply epilogue in
    :func:`multiband_compress`), so XLA fuses it into each consumer
    instead of writing a third full-length band to HBM and re-reading it.

    Streaming state is carried at the CONTROL rate: ``ctrl_tail``
    ``(3, look_ctrl)`` holds the previous chunk's last hop-bucketed x²
    sums per band — a few hundred floats instead of the
    ``(3, look_pad, C)`` sample tail, and no full-length
    ``concatenate(tail, band)`` copy per chunk.  Bucket sums concatenate
    exactly (chunk lengths and ``look_pad`` are hop-aligned), so the
    moving-window sums equal the sample-tail formulation's by partition.

    Returns ``(stats dict of (T, 3) arrays, new_ctrl_tail (3, look_ctrl))``.
    """
    time_ax = 1 if channel_major else 0
    n = x.shape[time_ax]
    dt = x.dtype
    t = -(-n // hop)
    look_ctrl = detector_lookpad(sample_rate, hop) // hop

    mid = x - low - high  # fused into the reduction; never an output
    rows = [(b * b).mean(axis=1 - time_ax) for b in (low, mid, high)]
    if hop == 1:
        xb = jnp.stack(rows)  # (3, t), t == n
    elif _bucket_aligned(n, hop):
        xb = jnp.stack([_bucket_sum_mxu(r, n, hop) for r in rows])
    else:
        xb = jnp.stack([
            jnp.pad(r, (0, t * hop - n)).reshape(t, hop).sum(-1)
            for r in rows])
    return _fused_stats_from_ctrl(xb, t, sample_rate, thresholds_db, ratios,
                                  hop, ctrl_tail, look_ctrl, dt)


def _fused_stats_from_ctrl(xb, t, sample_rate, thresholds_db, ratios, hop,
                           ctrl_tail, look_ctrl, dt,
                           global_ctrl_pos0=None, band_major=False):
    """Shared tail of the fused detector: windowed means + gain computer.

    ``xb``: ``(3, t)`` hop-bucketed x² sums per band (low, mid, high).
    ``global_ctrl_pos0`` (traced scalar, optional): this segment's first
    control step's GLOBAL index — the sequence-parallel case, where a
    shard always carries a (zero-padded on shard 0) tail but the pydub
    partial-window COUNT must clamp to the true global position
    (reference detector window: pydub ``get_sample_slice(i-look, i)``).
    Returns ``(stats dict of (t, 3) arrays, new_ctrl_tail (3, look_ctrl))``.
    """
    from python_audio_mastering_tpu.ops.compressor import cumsum_mxu

    attacks = tuple(a for a, _ in BAND_BALLISTICS_MS)
    releases = tuple(r for _, r in BAND_BALLISTICS_MS)
    offset = 0
    ext = xb
    if ctrl_tail is not None:
        offset = ctrl_tail.shape[1]
        ext = jnp.concatenate([ctrl_tail.astype(dt), xb], axis=1)
    csum = jnp.concatenate(
        [jnp.zeros((3, 1), dt), cumsum_mxu(ext, axis=1)], axis=1)

    ms_cols, att_f, rel_f = [], [], []
    for i in range(3):
        look = max(0, int(attacks[i] * sample_rate / 1000.0))
        look_eff = look if hop == 1 else max(hop, -(-look // hop) * hop)
        wb = min(look if hop == 1 else look_eff // hop, t + offset)
        hi = jax.lax.dynamic_slice_in_dim(csum[i], offset, t)
        if offset >= wb:
            lo = jax.lax.dynamic_slice_in_dim(csum[i], offset - wb, t)
            if global_ctrl_pos0 is None:
                cnt = jnp.full((t,), max(look_eff, 1), dt)
            else:
                cnt = jnp.minimum(
                    (global_ctrl_pos0 + jnp.arange(t)) * hop,
                    max(look_eff, 1)).clip(1).astype(dt)
        else:
            lo = jnp.concatenate([jnp.zeros((wb,), dt), hi[: t - wb]])
            cnt = jnp.minimum(jnp.arange(t) * hop,
                              max(look_eff, 1)).clip(1).astype(dt)
        ms_cols.append((hi - lo) / cnt)
        att_f.append(max(attacks[i] * sample_rate / 1000.0, 1.0))
        rel_f.append(max(releases[i] * sample_rate / 1000.0, 1.0))

    from python_audio_mastering_tpu.ops.compressor import (
        gain_computer_stats, gain_computer_stats_bt)

    if band_major:
        # (3, T) stats end to end: bands ride the 8-sublane axis instead
        # of wasting 125/128 lanes per control-rate op, and the Pallas
        # ballistics kernel consumes this layout natively (no full-length
        # transpose copies) — the fused-kernel path's layout
        ms = jnp.stack(ms_cols, axis=0)  # (3, T)
        stats = gain_computer_stats_bt(ms, thresholds_db, ratios, att_f,
                                       rel_f, hop)
    else:
        ms = jnp.stack(ms_cols, axis=-1)  # (T, 3)
        stats = gain_computer_stats(ms, thresholds_db, ratios, att_f,
                                    rel_f, hop)
    if look_ctrl > 0:
        pad = max(0, look_ctrl - ext.shape[1])
        new_tail = jnp.concatenate(
            [jnp.zeros((3, pad), dt), ext], axis=1)[:, -look_ctrl:]
    else:
        new_tail = jnp.zeros((3, 0), dt)
    return stats, new_tail


def _run_ballistics_bt(stacked_bt, sample_rate, hop, ballistics, block_ctrl,
                       overlap_ctrl, att0, interpret=False):
    """Band-major ``(3, T)`` ballistics dispatch for the fused-kernel path.

    The Pallas kernel consumes ``(B, T)`` natively (no transpose copies);
    the scan/blocked fallbacks transpose at the control rate.  Returns
    ``(att (3, T), att_final (3,))``.
    """
    from python_audio_mastering_tpu.ops import pallas_kernels as pk

    if ballistics == "auto":
        ballistics = "pallas" if (pk.available() or interpret) else (
            "blocked" if block_ctrl is not None else "scan")
    if ballistics == "pallas":
        dt = stacked_bt["max_att"].dtype
        ca = jnp.asarray([hop / max(a * sample_rate / 1000.0, 1.0)
                          for a, _ in BAND_BALLISTICS_MS], dt)
        cr = jnp.asarray([hop / max(r * sample_rate / 1000.0, 1.0)
                          for _, r in BAND_BALLISTICS_MS], dt)
        return pk.ballistics_pallas_rates_bt(stacked_bt["max_att"], ca, cr,
                                             att0, interpret=interpret)
    stacked = {k: v.T for k, v in stacked_bt.items()}
    att, att_f = _run_ballistics(stacked, sample_rate, hop, ballistics,
                                 block_ctrl, overlap_ctrl, att0)
    return att.T, att_f


def _run_ballistics(stacked, sample_rate, hop, ballistics, block_ctrl,
                    overlap_ctrl, att0):
    """Dispatch the fused 3-band attack/release recurrence.

    ``"auto"`` prefers the exact Pallas kernel on TPU, else the blocked
    formulation when a control-rate block size is configured, else the
    exact scan.  Returns ``(att (T, 3), att_final (3,))``.
    """
    if ballistics == "auto":
        from python_audio_mastering_tpu.ops import pallas_kernels as pk

        ballistics = "pallas" if pk.available() else (
            "blocked" if block_ctrl is not None else "scan")
    if ballistics == "pallas":
        from python_audio_mastering_tpu.ops import pallas_kernels as pk

        dt = stacked["max_att"].dtype
        ca = jnp.asarray([hop / max(a * sample_rate / 1000.0, 1.0)
                          for a, _ in BAND_BALLISTICS_MS], dt)
        cr = jnp.asarray([hop / max(r * sample_rate / 1000.0, 1.0)
                          for _, r in BAND_BALLISTICS_MS], dt)
        return pk.ballistics_pallas_rates(stacked["max_att"], ca, cr, att0)
    if ballistics == "blocked" and block_ctrl is not None:
        if overlap_ctrl is None:
            overlap_ctrl = comp._default_overlap(sample_rate, 200.0, hop)
        return comp.attenuation_blocked(stacked, block_ctrl, overlap_ctrl,
                                        att0)
    return comp.attenuation_scan(stacked, att0)


def _multiband_rows_pallas(xrows, sample_rate, thresholds_db, ratios,
                           low_crossover, high_crossover, hop, block_ctrl,
                           overlap_ctrl, ballistics, state, return_state,
                           emit_mono=False, interpret=False):
    """Fused-kernel execution of the worker-variant rows multiband.

    Same contract, state dict, and recombination algebra as the XLA body of
    :func:`multiband_compress_rows`; the band signals never materialize in
    HBM (see ``ops.pallas_multiband``).  The sequential part — per-block
    incoming crossover states — is the tiny control-rate XLA pass
    ``iir.sosfilt_states_multi_rows``; the detector stats / ballistics /
    gain stages between the two kernels are the shared control-rate code.
    """
    from python_audio_mastering_tpu.ops import pallas_multiband as pmb

    c, nb, L = xrows.shape
    dt = xrows.dtype
    state = state or {}
    lp_sos, hp_sos = _crossover_sos(sample_rate, low_crossover,
                                    high_crossover)
    zi = state.get("crossover") or {}
    (s_in_lp, s_in_hp), (z_lp, z_hp) = iir.sosfilt_states_multi_rows(
        (lp_sos, hp_sos), xrows, (zi.get("lp"), zi.get("hp")),
        return_state=return_state)
    xb = pmb.band_energies(xrows, s_in_lp, s_in_hp, lp_sos, hp_sos,
                           hop=hop, interpret=interpret)
    t = xb.shape[1]
    look_ctrl = detector_lookpad(sample_rate, hop) // hop
    stacked, new_ctrl_tail = _fused_stats_from_ctrl(
        xb, t, sample_rate, thresholds_db, ratios, hop,
        state.get("ctrl_tail"), look_ctrl, dt, band_major=True)
    att, att_f = _run_ballistics_bt(stacked, sample_rate, hop, ballistics,
                                    block_ctrl, overlap_ctrl,
                                    state.get("att"), interpret=interpret)
    gains = 10.0 ** (-att / 20.0)  # (3, T) control-rate, band-major
    cols = jnp.stack([gains[1], gains[0] - gains[1],
                      gains[2] - gains[1]])  # (3, T)
    y = pmb.band_gain_apply(xrows, s_in_lp, s_in_hp, cols, lp_sos, hp_sos,
                            hop=hop, emit_mono=emit_mono,
                            interpret=interpret)
    if return_state:
        st = {"crossover": {"lp": z_lp, "hp": z_hp}, "att": att_f,
              "ctrl_tail": new_ctrl_tail}
        return (*y, st) if emit_mono else (y, st)
    return y


def multiband_compress_rows(xrows, sample_rate, thresholds_db, ratios,
                            low_crossover=250.0, high_crossover=4000.0,
                            hop=1, block_ctrl=None, overlap_ctrl=None,
                            ballistics="auto", state=None,
                            return_state=False, kernel="auto",
                            emit_mono=False):
    """Fused worker-variant 3-band compressor over ROWS-form ``(C, nb, L)``.

    The chain/streaming hot path (models/chain._master_cm and the rows
    branch of streaming._fx_chunk): crossovers run in the rows-resident
    blocked form, the detector's per-band x² energies reduce straight from
    rows to the control rate (one MXU bucket dot — no flatten relayout),
    and the control-rate gains upsample directly back into rows form.
    ``state``/``return_state``: the same ``{"crossover", "att",
    "ctrl_tail"}`` carried streaming state as the fused channel-major path
    — the two layouts' states are interchangeable (scipy-layout zi +
    control-rate scalars), so checkpoints resume across layouts.  Same
    numerics as the fused channel-major path on the same padded signal.

    ``kernel``: "auto" runs the fused Pallas crossover+detector/gain-apply
    kernels on TPU (band signals never touch HBM — ops.pallas_multiband),
    the XLA body elsewhere; "pallas"/"xla" force; "pallas_interpret" for
    CPU parity tests.  NOT vmappable / differentiable in kernel mode —
    batched and gradient paths pass "xla" (see parallel.batch).
    """
    c, nb, L = xrows.shape
    n = nb * L
    dt = xrows.dtype
    state = state or {}
    if kernel != "xla" and (hop == 1 or L % hop == 0):
        from python_audio_mastering_tpu.ops import pallas_multiband as pmb

        interpret = kernel == "pallas_interpret"
        if interpret or kernel == "pallas" or (
                kernel == "auto" and pmb.available()
                and dt == jnp.float32):
            return _multiband_rows_pallas(
                xrows, sample_rate, thresholds_db, ratios, low_crossover,
                high_crossover, hop, block_ctrl, overlap_ctrl, ballistics,
                state, return_state, emit_mono=emit_mono,
                interpret=interpret)
    lp_sos, hp_sos = _crossover_sos(sample_rate, low_crossover,
                                    high_crossover)
    zi = state.get("crossover") or {}
    (low, high), (z_lp, z_hp) = iir.sosfilt_blocked_multi_rows(
        (lp_sos, hp_sos), xrows, (zi.get("lp"), zi.get("hp")),
        return_state=return_state)

    # detector: mean over channels, hop-bucket along the lane axis
    mid = xrows - low - high  # fused into the reduction; never an output
    erows = [(b * b).mean(axis=0) for b in (low, mid, high)]  # (nb, L)
    if hop > 1 and L % hop == 0:
        s = jnp.asarray(_bucket_matrix(L, hop), dt)
        xb = jnp.stack([
            jax.lax.dot_general(r, s, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST
                                ).reshape(n // hop)
            for r in erows])
    else:
        t_full = -(-n // hop)
        xb = jnp.stack([
            jnp.pad(r.reshape(n), (0, t_full * hop - n)
                    ).reshape(t_full, hop).sum(-1)
            for r in erows]) if hop > 1 else jnp.stack(
            [r.reshape(n) for r in erows])
    t = xb.shape[1]
    look_ctrl = detector_lookpad(sample_rate, hop) // hop
    stacked, new_ctrl_tail = _fused_stats_from_ctrl(
        xb, t, sample_rate, thresholds_db, ratios, hop,
        state.get("ctrl_tail"), look_ctrl, dt)

    att, att_f = _run_ballistics(stacked, sample_rate, hop, ballistics,
                                 block_ctrl, overlap_ctrl, state.get("att"))
    gains = 10.0 ** (-att / 20.0)  # (T, 3) control-rate

    # y = x·g_mid + low·(g_low − g_mid) + high·(g_high − g_mid), with the
    # three control-rate columns upsampled straight into rows form
    cols = jnp.stack([gains[:, 1], gains[:, 0] - gains[:, 1],
                      gains[:, 2] - gains[:, 1]], axis=1)  # (T, 3)
    if hop > 1 and L % hop == 0:
        u = jnp.asarray(_bucket_matrix(L, hop).T, dt)  # (L//hop, L)
        grows = jax.lax.dot_general(
            cols.T.reshape(3 * nb, L // hop), u, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST).reshape(3, nb, L)
    elif hop > 1:
        full = jnp.repeat(cols.T, hop, axis=1)[:, :n]
        grows = full.reshape(3, nb, L)
    else:
        grows = cols.T.reshape(3, nb, L)
    gm, dl, dh = grows[0][None], grows[1][None], grows[2][None]
    y = xrows * gm + low * dl + high * dh
    if return_state:
        st = {"crossover": {"lp": z_lp, "hp": z_hp}, "att": att_f,
              "ctrl_tail": new_ctrl_tail}
        return (y, y.mean(axis=0), st) if emit_mono else (y, st)
    return (y, y.mean(axis=0)) if emit_mono else y


def multiband_compress(x, sample_rate, thresholds_db, ratios, variant="worker",
                       low_crossover=250.0, high_crossover=4000.0,
                       filter_method="auto", hop=1, block_ctrl=None,
                       overlap_ctrl=None, state=None, return_state=False,
                       ballistics="auto", channel_major=False):
    """Full 3-band compressor.

    Args:
      thresholds_db / ratios: length-3 (low, mid, high), traced OK.
      hop / block_ctrl / overlap_ctrl: ballistics execution knobs (see
        ``ops.compressor``); hop=1 + exact ballistics is the exact contract.
      ballistics: "auto" (Pallas kernel on TPU — exact; else blocked/scan),
        "pallas", "blocked", or "scan".  NOTE: "pallas" must not be vmapped
        (its sequential-grid carry is per-call); batched/album paths use
        "blocked" (see parallel.batch).
      state: carried streaming state dict {"crossover", "att", "tail"} from a
        previous chunk (None = start of signal).  ``tail`` holds the last
        ``detector_lookpad`` frames of each band so the RMS lookback window
        is seamless across chunk boundaries.

    Returns ``y`` ``(N, C)``, or ``(y, new_state)`` if ``return_state``.
    """
    if channel_major:
        # x is (C, N).  The fused worker path runs natively channel-major;
        # everything else (legacy variant, scan fallback, sample-tail
        # resume) round-trips through the (N, C) layout.
        squeeze = False
        c, n = x.shape
    else:
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        n, c = x.shape
    state = state or {}
    # same 4 x (iir default block_size) rule as _crossover_bands
    blocked = filter_method == "blocked" or (
        filter_method == "auto" and n >= 4 * 512)
    # HBM-lean fused path (VERDICT r2 #2): worker split + blocked filters —
    # the mid band exists only inside fused expressions (detector reduction
    # + gain-apply epilogue), never as a third full-length HBM array, and
    # the streaming detector tail is carried at the control rate.  A legacy
    # sample-tail state (old checkpoint) falls back to the general path.
    # A carried control-rate tail FORCES the fused detector even for a
    # chunk too short for the blocked filters (scan crossovers instead):
    # the general path cannot consume ``ctrl_tail``, and dropping it would
    # silently reset the compressor lookback window mid-stream.
    fused = (variant == "worker" and state.get("tail") is None
             and (blocked or state.get("ctrl_tail") is not None))

    if channel_major and not (fused and blocked):
        y = multiband_compress(
            x.T, sample_rate, thresholds_db, ratios, variant=variant,
            low_crossover=low_crossover, high_crossover=high_crossover,
            filter_method=filter_method, hop=hop, block_ctrl=block_ctrl,
            overlap_ctrl=overlap_ctrl, state=state,
            return_state=return_state, ballistics=ballistics)
        if return_state:
            y, st = y
            return y.T, st
        return y.T

    if fused:
        lp_sos, hp_sos = _crossover_sos(sample_rate, low_crossover,
                                        high_crossover)
        zi = state.get("crossover") or {}
        if channel_major:
            (low, high), (z_lp, z_hp) = iir.sosfilt_blocked_multi_cm(
                (lp_sos, hp_sos), x, (zi.get("lp"), zi.get("hp")))
        elif blocked:
            (low, high), (z_lp, z_hp) = iir.sosfilt_blocked_multi(
                (lp_sos, hp_sos), x, (zi.get("lp"), zi.get("hp")))
        else:
            # short continuation chunk under a fused ctrl_tail: scan
            # crossovers (same filters, carried zi) feed the fused detector
            low, z_lp = iir.sosfilt(lp_sos, x, zi.get("lp"),
                                    method=filter_method)
            high, z_hp = iir.sosfilt(hp_sos, x, zi.get("hp"),
                                     method=filter_method)
        zf = {"lp": z_lp, "hp": z_hp}
        stacked, new_ctrl_tail = detector_stats_fused(
            x, low, high, sample_rate, thresholds_db, ratios, hop=hop,
            ctrl_tail=state.get("ctrl_tail"), channel_major=channel_major)
    else:
        bands, zf = _crossover_bands(x, sample_rate, variant=variant,
                                     low_crossover=low_crossover,
                                     high_crossover=high_crossover,
                                     filter_method=filter_method,
                                     zi=state.get("crossover"))

        tail = state.get("tail")
        look_pad = detector_lookpad(sample_rate, hop)
        det_bands = bands if tail is None else tuple(
            jnp.concatenate([tail[i], b]) for i, b in enumerate(bands))
        skip_ctrl = 0 if tail is None else look_pad // hop

        # Detectors: one batched pass over all 3 bands (different lookback
        # windows handled per band at the cheap control-rate stage).
        stacked = comp.detector_stats_bands(
            det_bands, sample_rate, thresholds_db, ratios,
            tuple(a for a, _ in BAND_BALLISTICS_MS),
            tuple(r for _, r in BAND_BALLISTICS_MS), hop=hop)
        stacked = {k: v[skip_ctrl:] for k, v in stacked.items()}

    # Ballistics: ONE pass, (3,)-vector carry.
    att, att_f = _run_ballistics(stacked, sample_rate, hop, ballistics,
                                 block_ctrl, overlap_ctrl, state.get("att"))

    gains = 10.0 ** (-att / 20.0)  # (T, 3) control-rate

    def up(col):
        g = col
        if hop > 1:
            g = jnp.repeat(g, hop, axis=0)[:n]
        return g[None, :] if channel_major else g[:, None]

    if fused:
        # y = Σ band·gain with mid = x − low − high folded in algebraically:
        # x·g_mid + low·(g_low − g_mid) + high·(g_high − g_mid) — reads
        # x/low/high once, never touches a materialized mid (deltas are
        # formed at the control rate before the hop upsample)
        if _bucket_aligned(n, hop):
            # MXU hop-upsample of all three control-rate columns at once;
            # the final multiply-add is ONE elementwise fusion over
            # x/low/high (no per-gain repeat relayouts — see _bucket_matrix)
            cols = jnp.stack([gains[:, 1], gains[:, 0] - gains[:, 1],
                              gains[:, 2] - gains[:, 1]], axis=1)
            full = _upsample_mxu(cols, n, hop)
            gm, dl, dh = (full[i][None, :] if channel_major
                          else full[i][:, None] for i in range(3))
            y = x * gm + low * dl + high * dh
        else:
            y = (x * up(gains[:, 1])
                 + low * up(gains[:, 0] - gains[:, 1])
                 + high * up(gains[:, 2] - gains[:, 1]))
        if squeeze:
            y = y[:, 0]
        if return_state:
            return y, {"crossover": zf, "att": att_f,
                       "ctrl_tail": new_ctrl_tail}
        return y

    # Per-band repeat+multiply, accumulated into ONE output fusion.  The
    # repeat (broadcast+reshape) fuses into the multiply; keeping bands as
    # separate arrays avoids any (3, N, C) materialization (NOT einsum
    # either: XLA lowers "bnc,nb->nc" as N tiny batched matmuls).
    y = sum(b * up(gains[:, i]) for i, b in enumerate(bands))
    if squeeze:
        y = y[:, 0]
    if return_state:
        stacked_bands = jnp.stack(
            [b[-look_pad:] for b in bands]) if n >= look_pad else None
        new_tail = stacked_bands if stacked_bands is not None \
            else jnp.concatenate(
                [tail if tail is not None
                 else jnp.zeros((3, look_pad, c), x.dtype),
                 jnp.stack(list(bands))], axis=1)[:, -look_pad:, :]
        return y, {"crossover": zf, "att": att_f, "tail": new_tail}
    return y
