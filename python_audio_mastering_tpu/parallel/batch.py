"""Batched (album) mastering: vmap over a padded tracks axis, sharded pjit.

The reference's batch mode loops over a folder sequentially
(mastering_gui.py:208-222 → missing ``batch_process_audio``); its cloud
path fans one job per worker instance.  Here an album is ONE batched call:

* tracks are padded to a common length (zero padding is benign: effects are
  causal, and BS.1770 gating discards silent blocks, so each track's
  loudness is measured correctly inside the batch);
* per-track parameters are a stacked ``MasteringParams`` pytree (each leaf
  gains a leading tracks axis) — every track can use different sliders;
* the batch axis is sharded over the mesh (``parallel.mesh``): XLA
  partitions the whole fused chain with zero communication (the tracks
  axis is embarrassingly parallel; collectives only appear if you shard
  further).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from python_audio_mastering_tpu.config import ChainConfig, MasteringParams
from python_audio_mastering_tpu.models.chain import master
from python_audio_mastering_tpu.parallel.mesh import make_mesh, tracks_sharding

__all__ = ["pad_tracks", "stack_params", "master_album",
           "master_album_streamed", "make_album_fn"]


def pad_tracks(tracks: Sequence[np.ndarray], multiple: int = 1):
    """Stack variable-length tracks into ``(T, N_max, C)`` + lengths.

    ``multiple`` rounds the padded length up (e.g. to a loudness cell or
    block size) to stabilize compiled shapes across albums.
    """
    tracks = [t[:, None] if t.ndim == 1 else t for t in tracks]
    n_max = max(t.shape[0] for t in tracks)
    n_max = -(-n_max // multiple) * multiple
    c = tracks[0].shape[1]
    dt = np.result_type(*[t.dtype for t in tracks], np.float32)
    out = np.zeros((len(tracks), n_max, c), dtype=dt)
    lengths = np.zeros((len(tracks),), dtype=np.int64)
    for i, t in enumerate(tracks):
        out[i, : t.shape[0]] = t
        lengths[i] = t.shape[0]
    return out, lengths


def stack_params(params: Sequence[MasteringParams]) -> MasteringParams:
    """Stack per-track params into one batched pytree (leaves get a leading
    tracks axis).  Static switches must agree across the album."""
    first = params[0]
    for p in params[1:]:
        if (p.multiband, p.lufs_enabled) != (first.multiband, first.lufs_enabled):
            raise ValueError("all tracks in a batch must share the static "
                             "multiband/lufs switches (split the album)")
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *params)


def make_album_fn(config: ChainConfig, mesh=None):
    """jit-compiled ``fn(batch (T,N,C), stacked_params, lengths (T,)) ->
    (T,N,C)`` with the tracks axis sharded over ``mesh`` (default: all
    devices).  ``lengths`` masks each track's loudness measurement so zero
    padding does not dilute the gated LUFS."""
    mesh = mesh or make_mesh()
    sharding = tracks_sharding(mesh)
    # the Pallas ballistics kernel's sequential-grid carry is per-call and
    # must not be vmapped; batched tracks use the block-parallel ballistics
    import dataclasses as _dc

    config = _dc.replace(
        config, comp_ballistics="blocked" if config.comp_block_ctrl else "scan",
        mb_kernel="xla")

    def one(audio, params, n_valid):
        return master(audio, params, config=config, valid_frames=n_valid)

    batched = jax.vmap(one)

    @functools.partial(jax.jit, in_shardings=(sharding, None, sharding),
                       out_shardings=sharding)
    def fn(batch, params, lengths):
        return batched(batch, params, lengths)

    return fn


def _tiny_readback(x):
    """Reliable completion barrier on the tunneled-TPU platform (where
    block_until_ready can return early): a one-element host readback."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf[tuple(slice(0, 1) for _ in leaf.shape)])


@functools.lru_cache(maxsize=32)
def _compiled_album(config: ChainConfig):
    """Per-config jitted album-chunk kernels, cached across calls.

    Fresh ``jax.jit`` wrappers per call would re-trace and re-lower the
    whole chunk graph on every album (seconds per call — it dominated the
    steady-state BASELINE config-5 wall time); an album service masters
    many albums with one config, so cache like ``streaming._compiled``.
    """
    from python_audio_mastering_tpu.ops import loudness as loud
    from python_audio_mastering_tpu.parallel import streaming as strm
    from python_audio_mastering_tpu.ops.waveshaper import (
        soft_limiter, soft_limiter_legacy)

    fx = jax.jit(functools.partial(_fx_chunk_batched, config=config),
                 static_argnames=("first", "need_cells", "channel_major"))
    cell_len = int(round(0.1 * config.sample_rate))

    def track_gain(cells, n_valid, target):
        mask = jnp.arange(cells.shape[0]) < (n_valid // cell_len)
        measured = loud.loudness_from_cells(cells, cell_mask=mask)
        g = 10.0 ** ((target - measured) / 20.0)
        return jnp.where(jnp.isfinite(measured), g, 1.0), measured

    gains_fn = jax.jit(jax.vmap(track_gain))

    limiter = soft_limiter if config.variant == "worker" else soft_limiter_legacy

    @functools.partial(jax.jit, static_argnames=("emit_i16",))
    def finalize(chunk, g, emit_i16=False):
        chunk = strm._dequant_if_int(chunk, config)  # spilled pcm16 chunks
        gb = g.reshape(g.shape + (1,) * (chunk.ndim - 1))
        y = limiter(chunk * gb, threshold=config.limiter_threshold)
        return strm.requantize_pcm16(y) if emit_i16 else y

    @functools.partial(jax.jit,
                       static_argnames=("flush", "emit_i16", "channel_major"))
    def finalize_la(chunk, g, lstate, flush=False, emit_i16=False,
                    channel_major=False):
        """Quality mode (lookahead true-peak limiter), batched over tracks:
        per-track carried delay-line/release state, same chunked contract
        as streaming._finalize_lookahead.  Padding zeros after a track's
        real end are what the one-shot limiter's own edge padding would
        contain, so per-track outputs match the one-shot quality master."""
        from python_audio_mastering_tpu.ops import limiter as lim

        def one(c, s):
            if channel_major and c is not None:
                c = c.T
            out, ns = lim.lookahead_limiter_chunk(
                c, s, config.sample_rate, flush=flush)
            return (out.T if channel_major else out), ns

        chunk = strm._dequant_if_int(chunk, config)  # spilled pcm16 chunks
        if chunk is None:
            out, ns = jax.vmap(lambda s: one(None, s))(lstate)
        else:
            out, ns = jax.vmap(one)(chunk * g[:, None, None], lstate)
        if emit_i16:
            out = strm.requantize_pcm16(out)
        return out, ns

    @functools.partial(jax.jit, static_argnames=("last", "channel_major"))
    def tp_batched(tail, chunk, start, lengths_dev, last=False,
                   channel_major=False):
        """Per-track streaming true peak over one finalized batched chunk.

        Samples at positions ≥ each track's real length are masked to zero
        first: the padded region carries LUFS-amplified ring-out that is
        not part of that track's returned audio (same rule as the sharded
        meter path and streaming's last-chunk trim)."""
        pos = start + jnp.arange(chunk.shape[2 if channel_major else 1])
        if channel_major:
            chunk = jnp.where(pos[None, None, :] < lengths_dev[:, None, None],
                              chunk, jnp.zeros((), chunk.dtype))
        else:
            chunk = jnp.where(pos[None, :, None] < lengths_dev[:, None, None],
                              chunk, jnp.zeros((), chunk.dtype))

        def one(t, c):
            return strm._tp_chunk(t, c, config, last=last,
                                  channel_major=channel_major)

        return jax.vmap(one)(tail, chunk)

    return fx, gains_fn, finalize, finalize_la, tp_batched


def _build_wire_batch(tracks_n, tt, n_padded, cm, rows, blk, pcm16, dtype):
    """Preallocated fused pad+transpose+quantize album wire buffer.

    Builds the device wire layout DIRECTLY from the per-track arrays on a
    thread pool — one threaded strided copy per channel — replacing three
    full-album host passes (pad_tracks' stack, the pad concatenate, and
    to_wire's single-threaded ``ascontiguousarray`` transpose) that were
    the bulk of config 5's measured ~7 s single-core host residual
    (VERDICT r4 #4).  Quantization matches ``streaming.quantize_pcm16``
    exactly: float32 round(clip(x)·32767) — the int16 assignment casts
    exact integers losslessly.
    """
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    from python_audio_mastering_tpu.parallel.streaming import PCM16_SCALE

    c = tracks_n[0].shape[1]
    wire_dt = np.int16 if pcm16 else dtype
    if rows:
        w = np.zeros((tt, c, n_padded // blk, blk), wire_dt)
    elif cm:
        w = np.zeros((tt, c, n_padded), wire_dt)
    else:
        w = np.zeros((tt, n_padded, c), wire_dt)

    def fill(i):
        t = tracks_n[i]
        ln = t.shape[0]
        if cm or rows:
            v = w[i].reshape(c, -1)
            for ch in range(c):
                col = t[:, ch]  # native dtype — matches quantize_pcm16's
                if pcm16:       # math on the bounded path exactly
                    v[ch, :ln] = np.round(np.clip(col, -1.0, 1.0)
                                          * PCM16_SCALE)
                else:
                    v[ch, :ln] = col
        else:
            if pcm16:
                w[i, :ln] = np.round(np.clip(t, -1.0, 1.0) * PCM16_SCALE)
            else:
                w[i, :ln] = t
    with ThreadPoolExecutor(
            max_workers=min(len(tracks_n), _os.cpu_count() or 1)) as ex:
        list(ex.map(fill, range(len(tracks_n))))
    return w


def master_album_streamed(tracks: Sequence[np.ndarray], params,
                          config: ChainConfig, mesh=None,
                          chunk_seconds: float = 30.0, progress_cb=None,
                          transfer: str = "float32",
                          timings: dict | None = None,
                          checkpoint_dir: str | None = None,
                          checkpoint_every: int = 1,
                          return_meters: bool = False,
                          on_track_done=None):
    """Album mastering, batched over tracks AND chunked over time.

    The production path for long albums: device memory is bounded by
    ``tracks_per_shard × chunk`` (not album length), every stateful op
    carries state across chunks, loudness accumulates per-track cell
    energies with valid-length masks, and the tracks axis shards over the
    mesh.  This is BASELINE config 5 ("batched album, chunked
    double-buffered streaming with progress callbacks").

    ``transfer="pcm16"`` ships int16 PCM over the host↔device link (on-
    device de/requantize; half the float32 bytes each way — the win when
    the link, not the chip, bounds album throughput).  ``timings``: pass a
    dict to receive an h2d/compute/d2h wall-time breakdown (adds sync
    barriers between phases, so end-to-end overlap is measured separately
    by calling without it).  ``checkpoint_dir``: chunk-granular atomic
    checkpoints (same format/machinery as ``streaming.master_streamed``);
    an interrupted album job resumes from the last completed chunk instead
    of restarting — note each checkpoint reads the batched chunk back to
    the host, which costs real wall time on link-bound deployments;
    ``checkpoint_every=N`` bounds that cost to one readback burst per N
    chunks (the pending chunks are flushed together, preserving the
    contiguous-prefix resume format).  ``return_meters``: also return a
    per-track list of R128 meter dicts (momentary/short-term series, LRA,
    true peak, integrated) — built from the already-accumulated 100 ms
    cells plus one batched true-peak pass over the finalized chunks, no
    extra pass over the audio.
    """
    import dataclasses as _dc
    import time as _time

    from python_audio_mastering_tpu.parallel import streaming as strm

    if transfer not in ("float32", "pcm16"):
        raise ValueError(f"unknown transfer format {transfer!r}")
    pcm16 = transfer == "pcm16"
    config = _dc.replace(
        config, comp_ballistics="blocked" if config.comp_block_ctrl else "scan",
        mb_kernel="xla")
    tracks_n = [t[:, None] if t.ndim == 1 else t for t in tracks]
    lengths = np.asarray([t.shape[0] for t in tracks_n], np.int64)
    if isinstance(params, MasteringParams):
        params = [params] * len(tracks)
    stacked = stack_params(list(params))
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    t0 = len(tracks_n)
    tt = t0 if t0 % n_dev == 0 else t0 + (n_dev - t0 % n_dev)
    if tt != t0:  # pad the tracks axis with silent tracks (zeros in wire)
        stacked = jax.tree.map(
            lambda leaf: jnp.concatenate(
                [leaf, jnp.broadcast_to(leaf[-1:],
                                        (tt - t0,) + leaf.shape[1:])]),
            stacked)
    sharding = tracks_sharding(mesh)

    chunk_frames = strm.default_chunk_frames(config, chunk_seconds)
    n = max(t.shape[0] for t in tracks_n)
    num_chunks = max(1, -(-n // chunk_frames))
    dtype = config.jnp_dtype()

    fx, gains_fn, finalize, finalize_la, tp_batched = _compiled_album(config)

    # Channel-major hot path (same gate as streaming.master_streamed):
    # device layout is (tracks, C, frames) so each vmapped per-track body
    # runs the folded-rows TPU form with zero per-op layout copies.  With
    # block-aligned chunks (the default_chunk_frames production geometry)
    # the layout is (tracks, C, nb, L) ROWS — no relayouts at all.
    cm = config.channel_major(chunk_frames)
    rows = cm and chunk_frames % config.block_size == 0
    blk = config.block_size
    tax = 2 if cm else 1  # time axis of device-side batched chunks
    nch = tracks_n[0].shape[1]

    state = strm.StreamState()  # replaced by per-track states after chunk 0
    processed = []
    cells_list = []

    def to_wire(arr):
        w = strm.quantize_pcm16(arr) if pcm16 else np.asarray(arr, dtype)
        if rows:
            return np.ascontiguousarray(w.transpose(0, 2, 1)).reshape(
                w.shape[0], nch, -1, blk)
        return np.ascontiguousarray(w.transpose(0, 2, 1)) if cm else w

    # Keep the (small relative to HBM) input batch device-resident and slice
    # chunks on-device: chunking bounds the *intermediates*, and host↔device
    # transfers happen once per album, not once per chunk.  Fall back to
    # the BOUNDED mode (host-streamed chunks, pass-A outputs spilled past
    # the budget, finalized chunks read back immediately — same policy as
    # streaming.master_streamed) when input + retained chunks + finalized
    # outputs would exceed config.device_budget_bytes.
    n_padded = num_chunks * chunk_frames
    wire_itemsize = 2 if pcm16 else dtype.itemsize
    batch_bytes = tt * n_padded * nch * wire_itemsize
    chunk_dev_bytes = tt * chunk_frames * nch * dtype.itemsize
    device_resident = (batch_bytes + 2 * num_chunks * chunk_dev_bytes
                       <= config.device_budget_bytes)
    keep_dev = max(2, (config.device_budget_bytes // 2)
                   // max(chunk_dev_bytes, 1))
    t_start = _time.perf_counter()
    if device_resident:
        # preallocated fused pad+transpose+quantize wire build, threaded
        # per track — no pad_tracks stack / pad concat / to_wire relayout
        x_dev = jax.device_put(
            _build_wire_batch(tracks_n, tt, n_padded, cm, rows, blk,
                              pcm16, dtype), sharding)

        def chunk_at(i):
            if rows:  # slice whole blocks along the nb axis
                cpb = chunk_frames // blk
                return jax.lax.slice_in_dim(x_dev, i * cpb, (i + 1) * cpb,
                                            axis=2)
            return jax.lax.slice_in_dim(x_dev, i * chunk_frames,
                                        (i + 1) * chunk_frames, axis=tax)
    else:
        batch, _ = pad_tracks(tracks)  # host-streamed chunks slice this
        if tt != t0:
            batch = np.concatenate(
                [batch, np.zeros((tt - t0,) + batch.shape[1:], batch.dtype)])

        def chunk_at(i):
            s = i * chunk_frames
            c_arr = batch[:, s: s + chunk_frames]
            if c_arr.shape[1] < chunk_frames:
                c_arr = np.concatenate(
                    [c_arr, np.zeros((c_arr.shape[0],
                                      chunk_frames - c_arr.shape[1],
                                      c_arr.shape[2]), c_arr.dtype)], axis=1)
            return jax.device_put(to_wire(c_arr), sharding)

    if device_resident:
        # Phase barrier after the upload.  Besides isolating h2d time for
        # the ``timings`` breakdown, this is a throughput win on RPC-tunneled
        # links: flooding the stream with the whole async pipeline (upload +
        # 10 chunk graphs + readback) measurably degrades the link (~2x
        # end-to-end vs phase-serialized on the tunneled bench chip).
        _tiny_readback(x_dev)
        if timings is not None:
            timings["h2d_s"] = _time.perf_counter() - t_start
            timings["wire_bytes_in"] = batch_bytes
        t_start = _time.perf_counter()

    need_cells = stacked.lufs_enabled or return_meters
    i0 = 0
    if checkpoint_dir:
        import os as _os

        _os.makedirs(checkpoint_dir, exist_ok=True)
        i0, state, processed, cells_list = strm._load_checkpoints(
            checkpoint_dir, num_chunks, dtype, layout="cn" if cm else "nc",
            to_device=device_resident)
        if rows:  # resumed chunks re-fold into the rows execution form
            processed = [y.reshape(y.shape[0], nch, -1, blk)
                         for y in processed]
        if need_cells:
            # checkpoints written by a no-lufs/no-meters run carry no cells
            cells_list, state = strm._rebuild_cells(
                processed, cells_list, state, config, cm, batched=True)
        if i0 and progress_cb:
            progress_cb(f"Resuming from checkpoint: {i0}/{num_chunks} "
                        "chunks already processed.")

    checkpoint_every = max(1, int(checkpoint_every))
    # Checkpoint saves run on ONE ordered background thread: the device
    # readback (np.asarray inside _save_checkpoint) happens off the
    # dispatch loop's critical path, so compute keeps running while the
    # (link-expensive on tunneled deployments) readback drains.  A single
    # FIFO worker preserves the contiguous-prefix resume invariant: chunk
    # i's file can only exist if 0..i-1 were written first.
    ckpt_pool = None
    ckpt_futures = []
    if checkpoint_dir:
        from concurrent.futures import ThreadPoolExecutor

        ckpt_pool = ThreadPoolExecutor(max_workers=1,
                                       thread_name_prefix="pam-ckpt")
    def _spill(y):
        # always float32 (lossless): pass-A chunks are pre-gain/pre-limiter
        # and can exceed ±1.0 — the pcm16 wire quantizer would clip them
        # (ADVICE r4); the spill buffer is host RAM, not the link
        return np.asarray(y)

    dev_start = len(processed)  # checkpoint-resumed entries are host numpy
    spilled = 0
    next_dev = chunk_at(i0) if i0 < num_chunks else None
    seg_ys, seg_cells = [], []
    try:
        for i in range(i0, num_chunks):
            cur = next_dev
            if i + 1 < num_chunks:
                next_dev = chunk_at(i + 1)
            y, state, cells = fx(cur, stacked, state, first=(i == 0),
                                 need_cells=need_cells, channel_major=cm)
            processed.append(y)
            if not device_resident and len(processed) - dev_start > keep_dev:
                processed[dev_start] = _spill(processed[dev_start])
                dev_start += 1
                spilled += 1
            cells_list.append(cells)
            if checkpoint_dir:
                # one segment file per checkpoint_every chunks (keyed by
                # its last chunk index; resume replays whole segments)
                seg_ys.append(y)
                seg_cells.append(cells)
                if len(seg_ys) >= checkpoint_every or i == num_chunks - 1:
                    ckpt_futures.append(ckpt_pool.submit(
                        strm._save_checkpoint, checkpoint_dir, i,
                        list(seg_ys), state, list(seg_cells),
                        layout="cn" if cm else "nc", rows=rows))
                    seg_ys, seg_cells = [], []
            if progress_cb:
                progress_cb(f"Processed chunk {i + 1}/{num_chunks} "
                            f"({tt} tracks)...")
        if ckpt_pool is not None:
            # drain the writer before the finalize phase: every submitted
            # segment must be durable (and any save error surfaced) before
            # the caller can treat the run as checkpointed
            for fut in ckpt_futures:
                fut.result()
    finally:
        if ckpt_pool is not None:
            # On interrupt too, let already-submitted segment saves finish:
            # persisting the progress an interrupted job DID make is the
            # point of checkpointing (and keeps resume deterministic).
            ckpt_pool.shutdown(wait=True)

    if timings is not None:
        timings["device_resident"] = device_resident
        timings["spilled_chunks"] = spilled
        timings["max_retained_bytes"] = min(len(processed), keep_dev + 1
                                            if not device_resident
                                            else len(processed)) \
            * chunk_dev_bytes

    lengths_dev = jnp.asarray(lengths)
    all_cells = jnp.concatenate(cells_list, axis=1) if need_cells else None
    dev_lengths = jnp.concatenate(
        [lengths_dev,
         jnp.full((tt - t0,), n, lengths_dev.dtype)]) \
        if tt != t0 else lengths_dev

    if stacked.lufs_enabled:
        gains, measured = gains_fn(
            all_cells, dev_lengths, jnp.asarray(stacked.lufs, dtype))
    else:
        gains = jnp.ones((tt,), dtype)
        measured = jnp.full((tt,), jnp.nan, dtype)

    if config.limiter_mode == "lookahead_truepeak":
        # quality mode streams here too: trim the padded tail of the final
        # chunk so the flush drains at the real signal end, carry per-track
        # limiter state across chunks, one flush call at the end
        from python_audio_mastering_tpu.ops import limiter as lim

        init = lim.lookahead_limiter_init(nch, dtype)
        lstate = jax.tree.map(
            lambda leaf: jnp.broadcast_to(
                leaf, (tt,) + jnp.shape(leaf)), init)
        rem = n - (num_chunks - 1) * chunk_frames
        finalized = []
        for i, y in enumerate(processed):
            if rows:  # the limiter state machine is (N, C)-sequential
                y = y.reshape(y.shape[0], nch, -1)
            if i == num_chunks - 1 and rem < chunk_frames:
                y = jax.lax.slice_in_dim(y, 0, rem, axis=tax)
            o, lstate = finalize_la(y, gains, lstate, emit_i16=pcm16,
                                    channel_major=cm)
            if o.shape[tax]:
                finalized.append(o if device_resident else np.asarray(o))
        o, _ = finalize_la(None, gains, lstate, flush=True, emit_i16=pcm16,
                           channel_major=cm)
        if o.shape[tax]:
            finalized.append(o if device_resident else np.asarray(o))
        fin_rows = False
    else:
        # rows chunks stay rows through the elementwise finalize; padded
        # tails past each track's length are masked/cut downstream.  In
        # bounded mode each finalized chunk reads back immediately so
        # pass-B device residency stays O(budget) too.
        finalized = [finalize(y, gains, emit_i16=pcm16) if device_resident
                     else np.asarray(finalize(y, gains, emit_i16=pcm16))
                     for y in processed]
        fin_rows = rows

    tp_max = None
    if return_meters:
        # per-track streaming true peak over the finalized output, carried
        # boundary tails, per-track valid-length masking inside tp_batched
        tp_tail = jnp.zeros((tt, 32, nch), dtype)
        startf = 0
        for fi, f in enumerate(finalized):
            if fin_rows:
                f = f.reshape(f.shape[0], nch, -1)
            tpv, tp_tail = tp_batched(tp_tail, f, jnp.asarray(startf),
                                      dev_lengths,
                                      last=(fi == len(finalized) - 1),
                                      channel_major=cm)
            startf += f.shape[2 if cm else 1]
            tp_max = tpv if tp_max is None else jnp.maximum(tp_max, tpv)
    # Compute-phase barrier before the bulk readback (see h2d barrier note).
    _tiny_readback(finalized[-1])
    if timings is not None:
        if device_resident:
            timings["compute_s"] = _time.perf_counter() - t_start
        else:
            # host-streamed chunks: per-chunk uploads overlap the compute
            # loop, so a pure-compute time does not exist in this mode —
            # label the phase honestly instead of calling it compute
            timings["h2d_plus_compute_s"] = _time.perf_counter() - t_start
    cat_ax = 2 if fin_rows else tax
    measured_np = np.asarray(measured)[: len(tracks)]

    meters = None
    if return_meters:
        from python_audio_mastering_tpu.ops import meters as met

        # Meter series from the already-accumulated cells (scaled by gain²
        # — metering sits after normalization, before the brickwall, same
        # point as streaming.master_streamed); batched across tracks, then
        # trimmed to each track's complete cells.  Built BEFORE the audio
        # readback: per-track completion hands (audio, meters) together.
        cell_len = int(round(0.1 * config.sample_rate))
        gains_np = np.asarray(gains)
        scaled = all_cells * jnp.asarray(gains_np)[:, None, None] ** 2
        mom_all = np.asarray(jax.vmap(
            lambda cells: met._sliding_loudness(cells, 4))(scaled))
        st_all = np.asarray(jax.vmap(
            lambda cells: met._sliding_loudness(cells, 30))(scaled))
        tp_np = np.asarray(tp_max)
        meters = []
        for i in range(len(tracks)):
            nv = int(lengths[i]) // cell_len
            mom = mom_all[i][: max(nv - 3, 0)]
            st = st_all[i][: max(nv - 29, 0)]
            gain_db = 20.0 * float(np.log10(max(float(gains_np[i]), 1e-12)))
            meters.append({
                "momentary_lufs": mom,
                "short_term_lufs": st,
                "lra_lu": float(met.lra_from_shortterm(jnp.asarray(st))),
                "true_peak_dbtp": float(
                    20.0 * np.log10(max(float(tp_np[i]), 1e-12))),
                "integrated_lufs": float(measured_np[i]) + gain_db,
            })

    # Per-track readback + postprocess/export pipeline (VERDICT r4 #4):
    # tracks read back one at a time, and each track's host finish (rows
    # unfold, pcm16 dequantize, transpose+trim) plus the caller's
    # ``on_track_done(i, audio, meters_i)`` — e.g. the engine's WAV encode
    # + blob upload — run on a small pool, OVERLAPPING the next track's
    # d2h transfer.  The album's host codec work hides under the link
    # instead of serializing after one big-barrier readback.
    import os as _os2
    from concurrent.futures import ThreadPoolExecutor as _TPE

    if timings is not None:
        t_start = _time.perf_counter()
    outs = [None] * len(tracks)

    def _post_one(i, w):
        y = w
        if fin_rows:
            y = y.reshape(nch, -1)
        if pcm16:
            y = strm.dequantize_pcm16_host(y)
        ln = int(lengths[i])
        y = np.ascontiguousarray(y[:, :ln].T) if cm else y[:ln]
        outs[i] = y
        if on_track_done is not None:
            on_track_done(i, y, meters[i] if meters is not None else None)

    wire_out = 0
    with _TPE(max_workers=min(4, _os2.cpu_count() or 1)) as post_pool:
        futs = []
        if device_resident:
            out_dev = jnp.concatenate(finalized, axis=cat_ax)
            for i in range(len(tracks)):
                w = np.asarray(out_dev[i])  # per-track d2h (sequential —
                # the link is serial anyway); postprocess/export of track i
                # runs while track i+1 transfers
                wire_out += w.nbytes
                futs.append(post_pool.submit(_post_one, i, w))
        else:
            out_host = np.concatenate([np.asarray(y) for y in finalized],
                                      axis=cat_ax)
            wire_out = out_host.nbytes
            for i in range(len(tracks)):
                futs.append(post_pool.submit(_post_one, i, out_host[i]))
        for f in futs:
            f.result()
    if timings is not None:
        timings["d2h_s"] = _time.perf_counter() - t_start
        timings["wire_bytes_out"] = wire_out
    if not return_meters:
        return outs, measured_np
    return outs, measured_np, meters


def _fx_chunk_batched(chunk, params, state, config, first, need_cells=True,
                      channel_major=False):
    from python_audio_mastering_tpu.parallel import streaming as strm

    def one(c, p, s):
        return strm._fx_chunk(c, p, config=config, state=s, first=first,
                              variant_mb=config.variant,
                              need_cells=need_cells,
                              channel_major=channel_major)

    if first:
        # build a fresh empty state per track (pytree of Nones broadcast)
        return jax.vmap(lambda c, p: one(c, p, strm.StreamState()))(chunk, params)
    return jax.vmap(one)(chunk, params, state)


def master_album(tracks: Sequence[np.ndarray], params, config: ChainConfig,
                 mesh=None, pad_multiple: int = 1):
    """Master an album in one sharded batched call.

    ``params``: a single ``MasteringParams`` (applied to every track) or a
    sequence of per-track params.  Returns a list of ``(N_i, C)`` arrays.
    """
    batch, lengths = pad_tracks(tracks, multiple=pad_multiple)
    if isinstance(params, MasteringParams):
        params = [params] * len(tracks)
    stacked = stack_params(list(params))
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    dev_lengths = lengths
    if batch.shape[0] % n_dev != 0:
        # pad the batch to a device multiple with silent tracks
        extra = n_dev - batch.shape[0] % n_dev
        batch = np.concatenate([batch, np.zeros((extra,) + batch.shape[1:],
                                                batch.dtype)])
        dev_lengths = np.concatenate([lengths, np.full((extra,), batch.shape[1],
                                                       lengths.dtype)])
        stacked = jax.tree.map(
            lambda leaf: jnp.concatenate(
                [leaf, jnp.broadcast_to(leaf[-1:], (extra,) + leaf.shape[1:])]),
            stacked)
    fn = make_album_fn(config, mesh)
    out = np.asarray(fn(batch, stacked, dev_lengths))
    return [out[i, : int(lengths[i])] for i in range(len(tracks))]
