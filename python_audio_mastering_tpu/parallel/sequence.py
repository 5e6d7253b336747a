"""Sequence parallelism: ONE long track sharded across the device mesh.

The second scaling axis (SURVEY.md §5's ring-attention analog): the
waveform itself is partitioned over devices under ``shard_map``.  Per
stage:

* elementwise stages run shard-local;
* every IIR cascade (EQ, crossovers, K-weighting) uses
  ``ops.iir.sosfilt_sharded`` — shard-local blocked MXU passes plus an
  ``all_gather`` of tiny boundary-state summaries over ICI (exact);
* the compressor detector gets the previous shard's band tail via
  ``ppermute`` and uses *global* sample positions for its partial-window
  counts (exact);
* the ballistics recurrence has two modes (``sp_ballistics``): the default
  "approx" takes a globally coarse pre-scan (``all_gather`` of decimated
  stats → tiny replicated scan) for shard warm-starts, then runs
  block-parallel within each shard (the fast-mode approximation, same
  budget as single-device blocked mode); "exact" serializes the recurrence
  across shards with a ppermute handoff of the final attenuation (exact at
  any config — the one op that pays for exactness with its SP speedup);
* loudness cells are computed shard-locally, gathered, and gated globally;
  the gain is a replicated scalar.

Use :func:`master_track_sharded` for files too long for one chip's HBM or
to cut latency on a multi-chip slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from python_audio_mastering_tpu.config import ChainConfig, MasteringParams
from python_audio_mastering_tpu.models.chain import eq_sos
from python_audio_mastering_tpu.ops import compressor as comp
from python_audio_mastering_tpu.ops import iir
from python_audio_mastering_tpu.ops import loudness as loud
from python_audio_mastering_tpu.ops.biquad import butter_sos
from python_audio_mastering_tpu.ops.loudness import kweight_sos
from python_audio_mastering_tpu.ops.multiband import BAND_BALLISTICS_MS, detector_lookpad
from python_audio_mastering_tpu.ops.stereo import stereo_width
from python_audio_mastering_tpu.ops.waveshaper import (
    saturate,
    saturate_legacy,
    soft_limiter,
    soft_limiter_legacy,
)
from python_audio_mastering_tpu.parallel.mesh import make_mesh

__all__ = ["master_track_sharded", "master_album_sharded"]


def _sharded_detector(band, axis, sample_rate, threshold_db, ratio,
                      attack_ms, release_ms, hop, look_pad):
    """pydub detector stats for one sharded band signal — exact.

    Windows crossing the shard boundary read the previous shard's tail
    (``ppermute``); partial windows at the very start of the *track* use
    the true global position for their sample count.
    """
    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    n_local = band.shape[0]
    dt = band.dtype

    x2 = (band * band).mean(axis=1)
    tail = jax.lax.ppermute(x2[-look_pad:], axis,
                            [(i, i + 1) for i in range(d - 1)])
    tail = jnp.where(idx == 0, jnp.zeros_like(tail), tail)
    x2p = jnp.concatenate([tail, x2])

    look = max(0, int(attack_ms * sample_rate / 1000.0))
    look_eff = max(hop, -(-look // hop) * hop) if hop > 1 else look
    csum = jnp.concatenate([jnp.zeros((1,), dt), jnp.cumsum(x2p)])
    t_ctrl = n_local // hop
    # control positions are local_i = k*hop; padded index = look_pad + k*hop
    hi_idx_start = look_pad
    hi = csum[hi_idx_start::hop][:t_ctrl]
    lo = csum[hi_idx_start - look_eff::hop][:t_ctrl]
    global_pos = idx * n_local + jnp.arange(t_ctrl) * hop
    cnt = jnp.minimum(global_pos, max(look_eff, 1)).clip(1).astype(dt)
    ms = (hi - lo) / cnt

    thresh_amp = 10.0 ** (jnp.asarray(threshold_db, dt) / 20.0)
    rms = jnp.sqrt(jnp.maximum(ms, 0.0))
    eps = jnp.asarray(1e-30, dt)
    db_over = jnp.maximum(20.0 * jnp.log10(jnp.maximum(rms, eps) / thresh_amp), 0.0)
    db_over = jnp.where(rms > 0, db_over, 0.0)
    max_att = (1.0 - 1.0 / jnp.asarray(ratio, dt)) * db_over
    attack_frames = max(attack_ms * sample_rate / 1000.0, 1.0)
    release_frames = max(release_ms * sample_rate / 1000.0, 1.0)
    return {"max_att": max_att, "above": rms > thresh_amp,
            "inc": max_att / attack_frames * hop,
            "dec": max_att / release_frames * hop}


def _sharded_ballistics_exact(stats, axis):
    """EXACT sequential shard handoff of the ballistics recurrence.

    The recurrence is the one truly sequential op in the chain, so exactness
    under SP costs its parallel speedup (everything else still shards):
    run D rounds of the exact per-shard scan; after each round the final
    attenuation ``ppermute``s forward, so device k's scan is correct from
    round k+1 on (and stays correct — its incoming state no longer
    changes).  After D rounds every shard holds the exact result.  Total
    sequential work = one full-signal scan, same as a single device.
    """
    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    m = stats["max_att"]
    att0 = jnp.zeros(m.shape[1:], m.dtype)
    att = jnp.zeros_like(m)

    def round_fn(_, carry):
        att0, _ = carry
        att, final = comp.attenuation_scan(stats, att0)
        nxt = jax.lax.ppermute(final, axis,
                               [(i, i + 1) for i in range(d - 1)])
        return jnp.where(idx == 0, jnp.zeros_like(nxt), nxt), att

    _, att = jax.lax.fori_loop(0, d, round_fn, (att0, att))
    return att


def _sharded_ballistics(stats, axis, block_ctrl, overlap_ctrl, coarse=64,
                        use_pallas=False):
    """Coarse global pre-scan (replicated) + per-shard refinement.

    ``use_pallas``: run the per-shard recurrence through the exact Pallas
    ballistics kernel from the coarse warm start (strictly more accurate
    than the blocked refinement, and the measured bottleneck of the old
    SP body — the vmapped overlap scans cost ~45 ms/60 s audio on the
    bench chip vs ~2 ms for the kernel)."""
    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    t_local = stats["max_att"].shape[0]

    sub = {"max_att": stats["max_att"][::coarse],
           "above": stats["above"][::coarse],
           "inc": stats["inc"][::coarse] * coarse,
           "dec": stats["dec"][::coarse] * coarse}
    gathered = {k: jax.lax.all_gather(v, axis).reshape(
        (-1,) + v.shape[1:]) for k, v in sub.items()}
    att_coarse, _ = comp.attenuation_scan(gathered)
    t_sub = t_local // coarse
    att0 = jnp.where(idx == 0,
                     jnp.zeros_like(att_coarse[0]),
                     att_coarse[jnp.maximum(idx * t_sub - 1, 0)])
    if use_pallas:
        from python_audio_mastering_tpu.ops import pallas_kernels as pk

        att, _ = pk.ballistics_pallas(stats, att0=att0)
        return att
    att, _ = comp.attenuation_blocked(stats, block_ctrl, overlap_ctrl,
                                      att0=att0, coarse_factor=coarse)
    return att


def _sharded_lookahead(x, axis, n_valid, sample_rate, ceiling_db=-1.0,
                       lookahead_ms=1.5, release_ms=60.0, true_peak=True):
    """EXACT lookahead true-peak limiter under shard_map.

    Every stage except the release has finite support, so halo exchange
    suffices: the true-peak interpolator needs ±khalf samples, the
    erosion (centered windowed min) ±look, the moving average +look —
    one backward halo of ``look+khalf`` and one forward halo of
    ``2·look+khalf`` samples via ``ppermute``.  Subtleties that keep this
    bit-matched to the one-shot :func:`ops.limiter.lookahead_limiter` on
    the UNPADDED track:

    * zero halos at the global edges reproduce the one-shot's zero-padded
      interpolator, and raw-gain 1.0 entries from zeros can never lower
      the erosion min (raw ≤ 1 and the real entries stay in-window), so
      erosion is exact without explicit edge replication;
    * the one-shot's END replication (``att[-1]`` padding of the moving
      average) is emulated arithmetically: window entries at global
      positions ≥ ``n_valid`` are replaced by the attack gain at
      ``n_valid−1`` (fetched with one masked ``psum``);
    * the release recurrence's per-step maps are clamp-affine
      ``(scale, offset, cap)`` triples, closed under composition — each
      shard composes its own map with a local ``associative_scan``, the D
      shard-total maps ``all_gather`` and prefix-compose in a tiny
      replicated scan, and each shard applies its incoming gain exactly
      (the IIR boundary-state pattern, for a nonlinear-but-composable op).
    """
    import math as _math

    from python_audio_mastering_tpu.ops import limiter as lim

    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    n_loc, c = x.shape
    dt = x.dtype
    ceiling = jnp.asarray(10.0 ** (ceiling_db / 20.0), dt)
    look = max(1, int(lookahead_ms * sample_rate / 1000.0))
    khalf = lim._tp_khalf(true_peak)
    back = look + khalf
    fwd = 2 * look + khalf

    prev_tail = jax.lax.ppermute(x[-back:], axis,
                                 [(i, i + 1) for i in range(d - 1)])
    prev_tail = jnp.where(idx == 0, jnp.zeros_like(prev_tail), prev_tail)
    next_head = jax.lax.ppermute(x[:fwd], axis,
                                 [(i + 1, i) for i in range(d - 1)])
    next_head = jnp.where(idx == d - 1, jnp.zeros_like(next_head), next_head)
    ext = jnp.concatenate([prev_tail, x, next_head])  # (back+n_loc+fwd, C)

    peak = lim._peak_env(ext, true_peak)
    raw = jnp.minimum(1.0, ceiling / jnp.maximum(peak, 1e-9))
    # att[j] = min(raw[j-look .. j+look]) for local j in [0, n_loc+look)
    seg = raw[back - look:]
    att = lim._windowed_min_forward(seg, 2 * look + 1)[: n_loc + look]

    if look > 1:
        # moving average with the one-shot's end replication at n_valid
        gpos = idx * n_loc + jnp.arange(n_loc + look)
        att_last = jax.lax.psum(
            jnp.sum(jnp.where((gpos == n_valid - 1)
                              & (jnp.arange(n_loc + look) < n_loc),
                              att, 0.0)), axis)
        att_m = jnp.where(gpos < n_valid, att, 0.0)
        csum = jnp.concatenate([jnp.zeros((1,), dt), jnp.cumsum(att_m)])
        win_sum = csum[look: n_loc + look] - csum[:n_loc]
        gpos_loc = idx * n_loc + jnp.arange(n_loc)
        in_valid = jnp.clip(n_valid - gpos_loc, 0, look).astype(dt)
        att_gain = (win_sum + (look - in_valid) * att_last) / look
    else:
        att_gain = att[:n_loc]

    # sharded exact release: local prefix maps + cross-shard composition
    rho = jnp.asarray(_math.exp(-1.0 / (release_ms * sample_rate / 1000.0)),
                      dt)
    scale = jnp.full((n_loc,), rho, dt)
    offset = jnp.full((n_loc,), 1.0 - rho, dt)
    cap = att_gain

    def combine(left, right):
        s1, o1, c1 = left
        s2, o2, c2 = right
        return (s1 * s2, o1 * s2 + o2, jnp.minimum(c2, c1 * s2 + o2))

    s_p, o_p, c_p = jax.lax.associative_scan(combine, (scale, offset, cap))
    totals = tuple(jax.lax.all_gather(t[-1], axis) for t in (s_p, o_p, c_p))

    def comp_step(carry, tot):
        return combine(carry, tot), carry

    ident = (jnp.asarray(1.0, dt), jnp.asarray(0.0, dt),
             jnp.asarray(jnp.inf, dt))
    _, incoming = jax.lax.scan(comp_step, ident, totals)
    s_in, o_in, c_in = jax.tree.map(lambda t: t[idx], incoming)
    g_in = jnp.minimum(c_in, s_in * 1.0 + o_in)  # global g0 = 1
    gains = jnp.minimum(c_p, s_p * g_in + o_p)
    return x * gains[:, None]


@functools.lru_cache(maxsize=128)
def _a_pow_static(sos_bytes, k, n):
    """``A^n`` of a static cascade, float64 host build (shard transition)."""
    a, _, _, _ = iir._state_space_static(sos_bytes, k)
    return np.linalg.matrix_power(a, n)


def _rows_shard_states(sos_list, xrows, axis, want_block_states=False):
    """TRUE incoming cascade states for F filters over a BLOCKS-sharded
    rows signal ``(C, nb_loc, L)`` — the rows-form heart of the SP chain.

    One shared ``rows @ G_cat`` read yields every filter's local block
    summaries; the local zero-state boundary recurrence's final state is
    each shard's transition summary, which ``all_gather``s (a few hundred
    bytes over ICI) and prefix-folds through the static ``A^{n_loc}``
    shard transition exactly as :func:`ops.iir.sosfilt_sharded` does; the
    boundary recurrence then re-runs (control-rate, cheap) from the true
    shard-incoming state.  Traced coefficients (the EQ) take the in-graph
    operator path with ``A^{n_loc}`` by binary exponentiation.

    Returns ``(s_ins, zis, ops)``: per-filter per-block TRUE incoming
    states ``(C, nb, S)`` (``None``s unless ``want_block_states``),
    per-shard incoming scipy-layout states ``(K, 2, C)`` (for handing to
    the ordinary rows filters / ``multiband`` as carried streaming state),
    and the per-filter ``(t_mat, g, w, al)`` operator tuples for kernels
    that reuse them.
    """
    c, nb, L = xrows.shape
    dt = xrows.dtype
    rows = xrows.reshape(c * nb, L)
    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    ops, statics = [], []
    for sos in sos_list:
        static = None
        if isinstance(sos, np.ndarray):
            static = np.asarray(sos, np.float64)
        elif isinstance(sos, jax.Array) and not isinstance(
                sos, jax.core.Tracer):
            static = np.asarray(sos, np.float64)
        statics.append(static)
        if static is not None:
            o = iir._blocked_operators_static(static.tobytes(),
                                              static.shape[0], L)
            ops.append(tuple(jnp.asarray(m, dt) for m in o))
        else:
            ops.append(iir._blocked_operators(iir._as_sos(sos, dt), L))

    g_cat = jnp.concatenate([g for (_, g, _, _) in ops], axis=1)
    tv_cat = jnp.dot(rows, g_cat, precision=jax.lax.Precision.HIGHEST)

    s_ins, zis = [], []
    col = 0
    for f, (t_mat, g, w, al) in enumerate(ops):
        s_dim = al.shape[0]
        tv = tv_cat[:, col: col + s_dim].reshape(c, nb, s_dim)
        col += s_dim
        if statics[f] is not None:
            bfun = (lambda tvc, s0c, _st=statics[f], _al=al:
                    iir._boundary_states_static(tvc, s0c, _st, L, nb, _al,
                                                dt))
            a_shard = jnp.asarray(_a_pow_static(
                statics[f].tobytes(), statics[f].shape[0], nb * L), dt)
        else:
            bfun = (lambda tvc, s0c, _al=al:
                    iir._boundary_states_traced(tvc, s0c, _al))
            a_full, _, _, _ = iir.cascade_state_space(
                iir._as_sos(sos_list[f], dt))
            a_shard = iir._matpow_traced(a_full, nb * L)
        vb = jax.vmap(bfun, in_axes=(0, 1), out_axes=(0, 1))
        s0z = jnp.zeros((s_dim, c), dt)
        _, s_last0 = vb(tv, s0z)                     # (S, C): shard summary
        t_all = jax.lax.all_gather(s_last0, axis)    # (D, S, C)
        s_acc = jnp.zeros_like(s_last0)
        s_in_sh = s_acc
        for j in range(d):
            s_in_sh = jnp.where(idx == j, s_acc, s_in_sh)
            s_acc = jnp.einsum("ij,jc->ic", a_shard, s_acc,
                               precision=jax.lax.Precision.HIGHEST) \
                + t_all[j]
        zis.append(iir.state_to_zi(s_in_sh, s_dim // 2))
        if want_block_states:
            s_in, _ = vb(tv, s_in_sh)                # TRUE per-block states
            s_ins.append(s_in)
        else:
            s_ins.append(None)
    return s_ins, zis, ops


def _tp_sharded(x, axis, n_valid):
    """Sharded streaming true peak of a frames-sharded ``(n_loc, C)``
    finalized signal (carried-tail pattern; see the comment block in
    :func:`_chain_shard`)."""
    from python_audio_mastering_tpu.ops.meters import true_peak_linear

    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    n_loc = x.shape[0]
    gpos = idx * n_loc + jnp.arange(n_loc)
    x_tp = jnp.where(gpos[:, None] < n_valid, x, 0.0)
    tail = jax.lax.ppermute(x_tp[-32:], axis,
                            [(i, i + 1) for i in range(d - 1)])
    tail = jnp.where(idx == 0, jnp.zeros_like(tail), tail)
    ext = jnp.concatenate([tail, x_tp])
    tp_interior = true_peak_linear(ext, exclude_pad=(True, True))
    tp_last = true_peak_linear(ext, exclude_pad=(True, False))
    return jax.lax.pmax(jnp.where(idx == d - 1, tp_last, tp_interior), axis)


def _chain_shard_rows(xrows, params, n_valid, config: ChainConfig,
                      axis: str, sp_ballistics: str = "approx",
                      want_meters: bool = False, mb_kernel: str = "auto"):
    """ROWS-resident SP chain body: this shard's ``(C, nb_loc, L)`` slice.

    The round-3 SP body ran the row-major ``(N, C)`` formulation whose
    vmap-over-channels filters pay batched-dot layout copies the one-shot
    chain eliminated (ops/iir.py channel-major section).  This body is the
    one-shot rows chain (models/chain._master_cm) with every carried state
    replaced by its cross-shard summary:

    * EQ / K-weighting: shard-incoming ``zi`` from
      :func:`_rows_shard_states` (boundary-summary all_gather — exact),
      then the ordinary rows blocked filter;
    * multiband: TRUE per-block crossover states feed the fused Pallas
      kernels (``ops.pallas_multiband``; band signals never in HBM) or
      their XLA mirrors (CPU mesh / vmapped album paths); the detector's
      control-rate tail ``ppermute``s from the previous shard and window
      counts clamp to GLOBAL positions (exact, pydub contract); the
      ballistics warm-starts from the gathered coarse pre-scan and runs
      the exact Pallas kernel per shard (fast-mode budget), or the exact
      cross-shard handoff under ``sp_ballistics="exact"``;
    * loudness cells gather and gate globally (exact); gain is a
      replicated scalar; the reference soft limiter is elementwise.

    Returns the same tuple contract as :func:`_chain_shard`, with the
    audio in rows form ``(C, nb_loc, L)``.
    """
    from python_audio_mastering_tpu.ops import multiband as mb
    from python_audio_mastering_tpu.ops import pallas_multiband as pmb

    fs = config.sample_rate
    c, nb, L = xrows.shape
    dt = xrows.dtype
    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    hop = config.comp_hop

    use_pallas = (mb_kernel != "xla" and pmb.available()
                  and dt == jnp.float32 and (hop == 1 or L % hop == 0))
    eq = eq_sos(params, fs).astype(dt)
    # no-multiband meter downmix folds into the front kernel's epilogue
    # (the multiband chain gets it from the gain-apply epilogue instead)
    want_mono_front = (not params.multiband
                       and (params.lufs_enabled or want_meters) and c > 1
                       and config.measure_downmix == "reference_mono_mean")
    meter_rows = None
    if c <= 2:
        # fused front (see models.chain._front), with the EQ states'
        # cross-shard correction in place of the streaming zi
        xs = saturate(xrows, params.saturation)
        (s_eq,), _, (eq_ops,) = _rows_shard_states(
            (eq,), xs, axis, want_block_states=True)
        t_eq, _, w_eq, _ = eq_ops
        front = pmb.front_chain if use_pallas else pmb.front_chain_xla
        x = front(xrows, s_eq, t_eq, w_eq, params.saturation, params.width,
                  emit_mono=want_mono_front)
        if want_mono_front:
            x, meter_rows = x
    else:
        x = saturate(xrows, params.saturation)
        _, (zi_eq,), _ = _rows_shard_states((eq,), x, axis)
        x, _ = iir.sosfilt_blocked_rows(eq, x, zi=zi_eq, return_state=False)
        x = stereo_width(x, params.width, channel_axis=0)

    if params.multiband:
        lp_sos, hp_sos = mb._crossover_sos(fs, 250.0, 4000.0)
        (s_lp, s_hp), _, _ = _rows_shard_states((lp_sos, hp_sos), x, axis,
                                                want_block_states=True)
        if use_pallas:
            xb = pmb.band_energies(x, s_lp, s_hp, lp_sos, hp_sos, hop=hop)
        else:
            xb = pmb.band_energies_xla(x, s_lp, s_hp, lp_sos, hp_sos,
                                       hop=hop)
        t_loc = xb.shape[1]
        look_ctrl = detector_lookpad(fs, hop) // hop
        tail = jax.lax.ppermute(xb[:, -look_ctrl:], axis,
                                [(i, i + 1) for i in range(d - 1)])
        tail = jnp.where(idx == 0, jnp.zeros_like(tail), tail)
        thr = (params.low_thresh, params.mid_thresh, params.high_thresh)
        rat = (params.low_ratio, params.mid_ratio, params.high_ratio)
        stats, _ = mb._fused_stats_from_ctrl(
            xb, t_loc, fs, thr, rat, hop, tail, look_ctrl, dt,
            global_ctrl_pos0=idx * t_loc)
        if sp_ballistics == "exact":
            att = _sharded_ballistics_exact(stats, axis)
        else:
            block_ctrl = config.comp_block_ctrl or 2048
            overlap_ctrl = config.comp_overlap_ctrl or \
                comp._default_overlap(fs, 200.0, hop)
            att = _sharded_ballistics(stats, axis, block_ctrl, overlap_ctrl,
                                      use_pallas=use_pallas)
        gains = 10.0 ** (-att / 20.0)                 # (T_loc, 3)
        cols = jnp.stack([gains[:, 1], gains[:, 0] - gains[:, 1],
                          gains[:, 2] - gains[:, 1]])
        apply_fn = pmb.band_gain_apply if use_pallas \
            else pmb.band_gain_apply_xla
        want_mono = ((params.lufs_enabled or want_meters) and c > 1
                     and config.measure_downmix == "reference_mono_mean")
        res = apply_fn(x, s_lp, s_hp, cols, lp_sos, hp_sos, hop=hop,
                       emit_mono=want_mono)
        x, meter_rows = res if want_mono else (res, None)

    # global gated loudness from shard-local rows cells (exact)
    all_cells = None
    gain = jnp.ones((), dt)
    if params.lufs_enabled or want_meters:
        if meter_rows is not None:
            meter = meter_rows[None]
        elif c > 1 and config.measure_downmix == "reference_mono_mean":
            meter = x.mean(axis=0, keepdims=True)
        else:
            meter = x
        kw = np.asarray(kweight_sos(fs), np.float64)
        _, (zi_k,), _ = _rows_shard_states((kw,), meter, axis)
        cells, _, _ = loud.block_cell_energies_rows(meter, fs, zi=zi_k,
                                                    kernel=mb_kernel)
        all_cells = jax.lax.all_gather(cells, axis).reshape(
            -1, cells.shape[-1])
    if params.lufs_enabled:
        cell = int(round(0.1 * fs))
        mask = jnp.arange(all_cells.shape[0]) < (n_valid // cell)
        measured = loud.loudness_from_cells(all_cells, cell_mask=mask)
        gain = 10.0 ** ((jnp.asarray(params.lufs, dt) - measured) / 20.0)
        gain = jnp.where(jnp.isfinite(measured), gain, 1.0)
        x = x * gain
        gain_db = 20.0 * jnp.log10(gain)
    else:
        measured = jnp.asarray(jnp.nan, dt)
        gain_db = jnp.zeros((), dt)

    x = soft_limiter(x, threshold=config.limiter_threshold)
    if not want_meters:
        return x, measured, gain_db
    x_nc = x.reshape(c, nb * L).T       # local relayout, meters mode only
    tp = _tp_sharded(x_nc, axis, n_valid)
    return x, measured, gain_db, all_cells * (gain ** 2), tp


def _chain_shard(x, params, n_valid, config: ChainConfig, axis: str,
                 sp_ballistics: str = "approx", want_meters: bool = False):
    fs = config.sample_rate
    run_iir = functools.partial(iir.sosfilt_sharded, axis_name=axis,
                                block_size=config.block_size)

    if config.variant == "worker":
        x = saturate(x, params.saturation)
    else:
        x = saturate_legacy(x, params.saturation)
    x, _ = run_iir(eq_sos(params, fs).astype(x.dtype), x)
    x = stereo_width(x, params.width)

    if params.multiband:
        # concrete numpy coefficients → sosfilt_sharded's static path
        # (host-built float64 operators; no in-graph constant folding)
        lp = np.asarray(butter_sos(4, 250.0, "lowpass", fs=fs), np.float64)
        hp = np.asarray(butter_sos(4, 4000.0, "highpass", fs=fs), np.float64)
        low, _ = run_iir(lp, x)
        high, _ = run_iir(hp, x)
        mid = x - low - high
        bands = [low, mid, high]
        hop = config.comp_hop
        look_pad = detector_lookpad(fs, hop)
        thr = (params.low_thresh, params.mid_thresh, params.high_thresh)
        rat = (params.low_ratio, params.mid_ratio, params.high_ratio)
        stats = [
            _sharded_detector(bands[i], axis, fs, thr[i], rat[i],
                              BAND_BALLISTICS_MS[i][0], BAND_BALLISTICS_MS[i][1],
                              hop, look_pad)
            for i in range(3)
        ]
        stacked = {k: jnp.stack([s[k] for s in stats], axis=-1)
                   for k in stats[0]}
        if sp_ballistics == "exact":
            att = _sharded_ballistics_exact(stacked, axis)
        else:
            block_ctrl = config.comp_block_ctrl or 2048
            overlap_ctrl = config.comp_overlap_ctrl or comp._default_overlap(
                fs, 200.0, hop)
            att = _sharded_ballistics(stacked, axis, block_ctrl, overlap_ctrl)
        if hop > 1:
            att = jnp.repeat(att, hop, axis=0)[: x.shape[0]]
        gains = 10.0 ** (-att / 20.0)
        x = (jnp.stack(bands) * gains.T[:, :, None]).sum(axis=0)

    # global gated loudness from shard-local cells
    all_cells = None
    gain = jnp.ones((), x.dtype)
    if params.lufs_enabled or want_meters:
        meter = x.mean(axis=1, keepdims=True) \
            if config.measure_downmix == "reference_mono_mean" else x
        kx, _ = run_iir(np.asarray(kweight_sos(fs), np.float64), meter)
        cell = int(round(0.1 * fs))
        n_cells = kx.shape[0] // cell
        cells = (kx[: n_cells * cell] ** 2).reshape(n_cells, cell, -1).mean(axis=1)
        all_cells = jax.lax.all_gather(cells, axis).reshape(-1, cells.shape[-1])
    if params.lufs_enabled:
        cell = int(round(0.1 * fs))
        mask = jnp.arange(all_cells.shape[0]) < (n_valid // cell)
        measured = loud.loudness_from_cells(all_cells, cell_mask=mask)
        gain = 10.0 ** ((jnp.asarray(params.lufs, x.dtype) - measured) / 20.0)
        gain = jnp.where(jnp.isfinite(measured), gain, 1.0)
        x = x * gain
        gain_db = 20.0 * jnp.log10(gain)
    else:
        measured = jnp.asarray(jnp.nan, x.dtype)
        gain_db = jnp.zeros((), x.dtype)

    if config.limiter_mode == "lookahead_truepeak":
        x = _sharded_lookahead(x, axis, n_valid, fs)
    elif config.variant == "worker":
        x = soft_limiter(x, threshold=config.limiter_threshold)
    else:
        x = soft_limiter_legacy(x, threshold=config.limiter_threshold)
    if not want_meters:
        return x, measured, gain_db

    # sharded true peak of the finalized output: carried-tail pattern —
    # interior shards exclude interpolation windows touching their zero
    # padding (the neighbour re-evaluates them with real context); the last
    # shard's trailing zeros ARE the one-shot end padding, so it includes
    # them (see parallel.streaming._tp_chunk for the single-device analog).
    # Samples at global positions ≥ n_valid are masked to zero first: the
    # alignment-padding region carries (LUFS-amplified) chain ring-out that
    # is NOT part of the returned [:n] audio — master_streamed trims its
    # last chunk before metering for exactly this reason.
    from python_audio_mastering_tpu.ops.meters import true_peak_linear

    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    n_loc = x.shape[0]
    gpos = idx * n_loc + jnp.arange(n_loc)
    x_tp = jnp.where(gpos[:, None] < n_valid, x, 0.0)
    tail = jax.lax.ppermute(x_tp[-32:], axis,
                            [(i, i + 1) for i in range(d - 1)])
    tail = jnp.where(idx == 0, jnp.zeros_like(tail), tail)
    ext = jnp.concatenate([tail, x_tp])
    tp_interior = true_peak_linear(ext, exclude_pad=(True, True))
    tp_last = true_peak_linear(ext, exclude_pad=(True, False))
    tp = jax.lax.pmax(jnp.where(idx == d - 1, tp_last, tp_interior), axis)
    return x, measured, gain_db, all_cells * (gain ** 2), tp


@functools.lru_cache(maxsize=64)
def _track_sharded_fn(mesh, axis, config, sp_ballistics, want_meters,
                      rows=False):
    """Cached jitted shard_map chain: one compile per (mesh, config, flags).

    Building a fresh ``jax.jit(shard_map(partial(...)))`` per call defeats
    jit's C++ cache (the partial's identity differs every time), which on
    the real TPU backend meant a full recompile on EVERY
    ``master_track_sharded`` call (~35 s each, measured).

    ``rows``: the rows-resident body (``_chain_shard_rows``) — input and
    output are ``(C, NB, L)`` sharded on the blocks axis.
    """
    in_spec = P(None, axis, None) if rows else P(axis, None)
    out_specs = (in_spec, P(), P())
    if want_meters:
        out_specs = out_specs + (P(), P())
    body = _chain_shard_rows if rows else _chain_shard
    # mb_kernel forwards from the config (ADVICE r4): without it the rows
    # body always ran its 'auto' default and ChainConfig.mb_kernel="xla"
    # (the documented A/B + on-chip fallback knob) silently did nothing here
    extra = {"mb_kernel": config.mb_kernel} if rows else {}
    return jax.jit(
        jax.shard_map(
            functools.partial(body, config=config, axis=axis,
                              sp_ballistics=sp_ballistics,
                              want_meters=want_meters, **extra),
            mesh=mesh, in_specs=(in_spec, P(), P()),
            out_specs=out_specs, check_vma=False),
    )


@functools.lru_cache(maxsize=64)
def _album_sharded_fn(mesh, taxis, saxis, config, sp_ballistics,
                      rows=False):
    """Cached jitted 2-D (tracks x frames) shard_map chain (see above).

    The rows body under ``vmap`` runs the SAME Pallas kernels as the 1-D
    path: ``pallas_call``'s batching rule folds the local-tracks axis
    into a leading grid dimension (round 5 — previously this path pinned
    the XLA mirrors, measured 2.35× the 1-D SP chain per audio-second;
    ``mb_kernel="xla"`` remains the A/B + fallback knob here too)."""

    if rows:
        def block(xb, pb, nv):
            run = functools.partial(_chain_shard_rows, config=config,
                                    axis=saxis,
                                    sp_ballistics=sp_ballistics,
                                    mb_kernel=config.mb_kernel)
            return jax.vmap(run)(xb, pb, nv)

        return jax.jit(jax.shard_map(
            block, mesh=mesh,
            in_specs=(P(taxis, None, saxis, None), P(taxis), P(taxis)),
            out_specs=(P(taxis, None, saxis, None), P(taxis), P(taxis)),
            check_vma=False))

    def block(xb, pb, nv):
        run = functools.partial(_chain_shard, config=config, axis=saxis,
                                sp_ballistics=sp_ballistics)
        return jax.vmap(run)(xb, pb, nv)

    return jax.jit(jax.shard_map(
        block, mesh=mesh,
        in_specs=(P(taxis, saxis, None), P(taxis), P(taxis)),
        out_specs=(P(taxis, saxis, None), P(taxis), P(taxis)),
        check_vma=False))


def master_track_sharded(audio, params: MasteringParams, config: ChainConfig,
                         mesh=None, axis: str = "seq",
                         sp_ballistics: str = "approx",
                         return_meters: bool = False):
    """Master one long track sharded over the mesh's devices.

    ``sp_ballistics``: ``"approx"`` (default — coarse-warm-start blocked
    refinement, the fast-mode budget; see DESIGN.md §4) or ``"exact"``
    (sequential ppermute handoff — exact at any config, but the ballistics
    op itself serializes across shards; the rest of the chain still
    shards).

    ``return_meters``: also return the R128 meter family (momentary/
    short-term/LRA/true-peak/integrated) computed from the gathered 100 ms
    cells and a sharded true-peak pass — same dict as
    ``streaming.master_streamed(return_meters=True)``.

    Returns ``(audio_out np.ndarray, measured_lufs, gain_db)`` and a
    meters dict when ``return_meters``.
    """
    if mesh is None:
        mesh = make_mesh(axis)
    else:
        axis = mesh.axis_names[0]
    d = int(mesh.devices.size)
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[:, None]
    n, c = audio.shape
    cell = int(round(0.1 * config.sample_rate))
    L = config.block_size
    # Rows-resident SP body (round 4): worker variant + blocked filters +
    # reference limiter run the one-shot rows chain per shard with
    # cross-shard state summaries — the row-major body below paid
    # vmap-over-channels layout copies per filter pass.
    rows = (config.channel_major(4 * L) and config.variant == "worker"
            and config.limiter_mode == "reference")
    align = int(np.lcm(np.lcm(cell, max(config.comp_hop, 1)),
                       L if rows else 1)) * d
    n_pad = -(-n // align) * align
    x = np.concatenate([np.asarray(audio),
                        np.zeros((n_pad - n, c), np.asarray(audio).dtype)])

    fn = _track_sharded_fn(mesh, axis, config, sp_ballistics, return_meters,
                           rows=rows)
    if rows:
        xw = np.ascontiguousarray(x.T).reshape(c, n_pad // L, L)
        x_dev = jax.device_put(jnp.asarray(xw, config.jnp_dtype()),
                               NamedSharding(mesh, P(None, axis, None)))
    else:
        x_dev = jax.device_put(
            jnp.asarray(x, config.jnp_dtype()),
            NamedSharding(mesh, P(axis, None)))
    res = fn(x_dev, params, jnp.asarray(n))
    y, measured, gain_db = res[:3]
    out = np.asarray(y)
    out = (out.reshape(c, -1).T if rows else out)[:n]
    if squeeze:
        out = out[:, 0]
    if not return_meters:
        return out, float(measured), float(gain_db)

    from python_audio_mastering_tpu.ops import meters as met

    cells, tp = res[3], res[4]
    valid_cells = jnp.asarray(cells)[: n // cell]
    mom = met._sliding_loudness(valid_cells, 4)
    st = met._sliding_loudness(valid_cells, 30)
    gain_db_f = float(gain_db)
    meters = {
        "momentary_lufs": np.asarray(mom),
        "short_term_lufs": np.asarray(st),
        "lra_lu": float(met.lra_from_shortterm(st)),
        "true_peak_dbtp": float(20.0 * np.log10(max(float(tp), 1e-12))),
        "integrated_lufs": float(measured) + gain_db_f,
    }
    return out, float(measured), gain_db_f, meters


def master_album_sharded(tracks, params, config: ChainConfig, mesh=None,
                         sp_ballistics: str = "approx"):
    """Album mastering on a 2-D (tracks × frames) mesh: data parallelism
    over tracks COMPOSED with sequence parallelism within each track.

    The composed layout is the full-slice scaling story: an 8-chip slice
    runs e.g. 2 track groups × 4-way frame sharding, so albums of few very
    long tracks still use every chip.  Inside ``shard_map`` the local block
    is ``(tracks_local, frames_local, C)``; the per-track chain is the same
    ``_chain_shard`` vmapped over the local tracks axis — its ``seq``-axis
    collectives (boundary-state ``all_gather``s, detector-tail
    ``ppermute``s, loudness-cell gathers) batch across tracks, and each
    track's gated loudness masks its own valid length.

    ``params``: one ``MasteringParams`` or a per-track sequence.
    Returns ``(list of (N_i, C) arrays, measured_lufs (T,))``.
    """
    from python_audio_mastering_tpu.parallel.batch import (
        pad_tracks, stack_params)
    from python_audio_mastering_tpu.parallel.mesh import make_mesh_2d

    if mesh is None:
        mesh = make_mesh_2d()
    taxis, saxis = mesh.axis_names
    dt_mesh, ds_mesh = mesh.devices.shape
    batch, lengths = pad_tracks(tracks)
    if isinstance(params, MasteringParams):
        params = [params] * len(tracks)
    stacked = stack_params(list(params))

    t0, n, c = batch.shape
    # pad the tracks axis to a mesh multiple with silent tracks
    if t0 % dt_mesh:
        extra = dt_mesh - t0 % dt_mesh
        batch = np.concatenate(
            [batch, np.zeros((extra,) + batch.shape[1:], batch.dtype)])
        stacked = jax.tree.map(
            lambda leaf: jnp.concatenate(
                [leaf, jnp.broadcast_to(leaf[-1:], (extra,) + leaf.shape[1:])]),
            stacked)
    # frame-axis alignment (same rule as master_track_sharded)
    cell = int(round(0.1 * config.sample_rate))
    L = config.block_size
    rows = (config.channel_major(4 * L) and config.variant == "worker"
            and config.limiter_mode == "reference")
    align = int(np.lcm(np.lcm(cell, max(config.comp_hop, 1)),
                       L if rows else 1)) * ds_mesh
    n_pad = -(-n // align) * align
    if n_pad != n:
        batch = np.concatenate(
            [batch, np.zeros((batch.shape[0], n_pad - n, c), batch.dtype)],
            axis=1)
    lengths_dev = jnp.asarray(lengths)
    n_valid = jnp.concatenate(
        [lengths_dev,
         jnp.zeros((batch.shape[0] - t0,), lengths_dev.dtype)]) \
        if batch.shape[0] != t0 else lengths_dev

    fn = _album_sharded_fn(mesh, taxis, saxis, config, sp_ballistics,
                           rows=rows)
    if rows:
        w = np.ascontiguousarray(batch.transpose(0, 2, 1)).reshape(
            batch.shape[0], c, n_pad // L, L)
        x_dev = jax.device_put(jnp.asarray(w, config.jnp_dtype()),
                               NamedSharding(mesh,
                                             P(taxis, None, saxis, None)))
        y, measured, _ = fn(x_dev, stacked, n_valid)
        out = np.asarray(y).reshape(batch.shape[0], c, -1).transpose(0, 2, 1)
    else:
        x_dev = jax.device_put(jnp.asarray(batch, config.jnp_dtype()),
                               NamedSharding(mesh, P(taxis, saxis, None)))
        y, measured, _ = fn(x_dev, stacked, n_valid)
        out = np.asarray(y)
    return ([out[i, : int(lengths[i])] for i in range(len(tracks))],
            np.asarray(measured)[: len(tracks)])
