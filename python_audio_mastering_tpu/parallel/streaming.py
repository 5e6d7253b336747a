"""Chunked streaming execution — the long-context axis (SURVEY.md §5).

The reference bounds memory with a sequential 30 s chunk loop
(engine:48-80) but resets every IIR filter and compressor envelope at each
chunk boundary, producing discontinuities.  Here chunking is an *execution
strategy*, not a semantic: all stateful ops carry explicit state
(EQ/crossover ``zi``, compressor ballistics + detector lookback tail,
K-weighting filter state + loudness cell energies), so the streamed result
matches the one-shot fused graph and device memory is BOUNDED by
``ChainConfig.device_budget_bytes`` regardless of file length (pass-A
outputs beyond the budget spill to the host in wire format and re-upload
during pass B — see ``master_streamed``).

Loudness needs no second pass over samples: 100 ms cell energies of the
*processed* signal are accumulated during the effects pass; the global gain
is computed from the gated cells, and a second lightweight pass applies
gain + limiter chunk by chunk (the reference re-reads the whole assembled
file instead, engine:82-88).

Host→device overlap: chunk ``i+1`` is ``device_put`` while chunk ``i``
computes (JAX async dispatch gives the double-buffering; nothing blocks
until the host reads a result back).

Transfer format: ``transfer="pcm16"`` ships int16 PCM over the host↔device
link and dequantizes on-device (and symmetrically requantizes before
readback) — half the bytes of float32 in each direction.  Audio almost
always *originates* as ≤16-bit PCM and is exported at 16 bits (the
reference hardcodes int16 out, engine:125), so the quantization step adds
nothing beyond the format's own -96 dBFS floor.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from python_audio_mastering_tpu.config import ChainConfig, MasteringParams
from python_audio_mastering_tpu.models.chain import apply_eq
from python_audio_mastering_tpu.ops import loudness as loud
from python_audio_mastering_tpu.ops import multiband
from python_audio_mastering_tpu.ops.stereo import stereo_width
from python_audio_mastering_tpu.ops.waveshaper import (
    saturate,
    saturate_legacy,
    soft_limiter,
    soft_limiter_legacy,
)

__all__ = ["master_streamed", "StreamState", "default_chunk_frames",
           "quantize_pcm16", "PCM16_SCALE"]


@dataclasses.dataclass
class StreamState:
    """Carried state across chunks (a pytree; device-resident)."""

    eq_zi: Any = None
    mb: Any = None          # multiband {"crossover", "att", "tail"}
    kw_zi: Any = None       # K-weighting filter state (loudness metering)


jax.tree_util.register_dataclass(
    StreamState, data_fields=["eq_zi", "mb", "kw_zi"], meta_fields=[])


def default_chunk_frames(config: ChainConfig, seconds: float = 30.0) -> int:
    """A chunk length aligned to every streaming grid:

    the 100 ms loudness cell and the compressor control hop — so per-chunk
    grids concatenate into exactly the one-shot grids (the blocked IIR
    handles any chunk length with an exact carried state).  Defaults to the
    reference's 30 s granularity (engine:48).

    When the channel-major hot path is available AND the requested chunk
    is long enough, the alignment additionally includes the IIR block size
    so chunks are an exact multiple of ``block_size`` — the per-chunk body
    then runs the rows-resident form (signal lives as ``(C, nb, L)``, zero
    layout-change copies between stages; see ``models/chain._master_cm``).
    At 44.1 kHz/512 this quantizes the default 30 s chunk to 25.6 s
    (lcm(cell, hop, 512)); shorter requests fall back to cell/hop-only
    alignment and the channel-major body.
    """
    cell = int(round(0.1 * config.sample_rate))
    align = int(np.lcm(cell, max(config.comp_hop, 1)))
    frames = int(seconds * config.sample_rate)
    if (config.layout != "nc" and config.variant == "worker"
            and config.filter_method in ("auto", "blocked")):
        align_rows = int(np.lcm(align, config.block_size))
        if frames >= max(align_rows, 4 * config.block_size):
            return (frames // align_rows) * align_rows
    return max(align, (frames // align) * align)


PCM16_SCALE = 32767.0  # symmetric round-trip scale for pcm16 transfers


def _host_parallel_rows(n_rows, work, min_rows=1 << 16):
    """Run ``work(lo, hi)`` over row ranges on a thread pool (numpy ufuncs
    release the GIL, so big host-side PCM conversions scale with cores —
    the single-threaded quantize/dequant legs measured ~21 s of a 12×5-min
    album job's wall)."""
    workers = min(os.cpu_count() or 1, 16)
    if n_rows < 2 * min_rows or workers < 2:
        work(0, n_rows)
        return
    from concurrent.futures import ThreadPoolExecutor

    step = -(-n_rows // workers)
    bounds = [(lo, min(lo + step, n_rows))
              for lo in range(0, n_rows, step)]
    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(lambda b: work(*b), bounds))


def quantize_pcm16(x: np.ndarray) -> np.ndarray:
    """Host-side float → int16 for the device link (symmetric scale)."""
    x = np.asarray(x)
    if not x.flags.c_contiguous or x.size < (1 << 20):
        return np.round(np.clip(x, -1.0, 1.0) * PCM16_SCALE).astype(np.int16)
    out = np.empty(x.shape, np.int16)
    xv = x.reshape(x.shape[0], -1)
    ov = out.reshape(x.shape[0], -1)

    def work(lo, hi):
        t = np.clip(xv[lo:hi], -1.0, 1.0)
        np.multiply(t, PCM16_SCALE, out=t)
        np.round(t, out=t)
        ov[lo:hi] = t  # exact: t holds exact integers within int16 range

    _host_parallel_rows(xv.shape[0], work, min_rows=max(1, (1 << 22)
                                                        // max(xv.shape[1], 1)))
    return out


def dequantize_pcm16_host(y: np.ndarray) -> np.ndarray:
    """Host-side int16 → float32 for the readback leg (threaded)."""
    y = np.asarray(y)
    out = np.empty(y.shape, np.float32)
    yv = y.reshape(y.shape[0], -1) if y.flags.c_contiguous else None
    if yv is None or y.size < (1 << 20):
        np.divide(y, PCM16_SCALE, out=out, dtype=np.float32)
        return out
    ov = out.reshape(y.shape[0], -1)

    def work(lo, hi):
        np.divide(yv[lo:hi], PCM16_SCALE, out=ov[lo:hi], dtype=np.float32)

    _host_parallel_rows(yv.shape[0], work, min_rows=max(1, (1 << 22)
                                                        // max(yv.shape[1], 1)))
    return out


def requantize_pcm16(y):
    """Device-side float → int16 for the readback leg of the pcm16 link.

    Clips in the integer domain to the full [-32768, 32767] range (the
    limiter already bounds |y| near 1, so the asymmetric LSB only matters
    for pathological overs).  One definition for every finalize path —
    the quantization contract must not fork per call site."""
    return jnp.clip(jnp.round(y * PCM16_SCALE),
                    -32768.0, 32767.0).astype(jnp.int16)


def _fx_chunk(chunk, params, config: ChainConfig, state: StreamState,
              first: bool, variant_mb: str, need_cells: bool = True,
              channel_major: bool = False):
    """Effects chain on one chunk with carried state + loudness cells.

    ``need_cells`` (static): False skips the K-weighting/cell pass entirely
    (cells/kw_zi return None) — a ``--no-lufs`` job with no meters
    requested must not pay a full-signal HBM pass per chunk for a
    measurement nobody consumes.

    ``channel_major`` (static): the chunk is ``(C, L)`` and the whole body
    runs the TPU-native channel-major form (models/chain._master_cm, but
    with carried state): every blocked-IIR pass is a plain folded-rows
    matmul and time rides the lane axis for elementwise/detector/cell work
    — no per-op layout copies, which on (L, 2) row-major chunks waste
    126/128 lanes of every structured pass.  States (scipy-layout zi,
    control-rate detector tails, (cells, C) energies) are layout-agnostic
    and interchangeable with the row-major body's.  Worker variant +
    blocked filters only (the caller gates)."""
    x = chunk
    if jnp.issubdtype(x.dtype, jnp.integer):
        # pcm16 transfer path: dequantize on-device (first op fuses away)
        x = x.astype(config.jnp_dtype()) / PCM16_SCALE
    if channel_major and x.ndim == 3:
        # rows-resident chunk body: the chunk arrives as (C, nb, L) — the
        # MXU-native tiling — and every stage below reads/writes it without
        # a single layout-change copy (see models/chain._master_cm).  The
        # carried states are identical to the channel-major body's
        # (scipy-layout zi, control-rate tails), so the two layouts'
        # checkpoints interchange.
        from python_audio_mastering_tpu.models.chain import _front

        mb_state = state.mb
        # fold the meter's mono downmix into the multiband epilogue (or,
        # no-multiband, into the front kernel's epilogue) so the cell pass
        # never re-reads the full chunk (see chain._master_cm)
        meter_rows = None
        want_mono = (need_cells and x.shape[0] > 1
                     and config.measure_downmix == "reference_mono_mean")
        if not params.multiband and want_mono:
            x, meter_rows, eq_zi = _front(x, params, config,
                                          state=state.eq_zi,
                                          return_state=True, emit_mono=True)
        else:
            x, eq_zi = _front(x, params, config, state=state.eq_zi,
                              return_state=True)
        if params.multiband:
            x = multiband.multiband_compress_rows(
                x, config.sample_rate,
                thresholds_db=(params.low_thresh, params.mid_thresh,
                               params.high_thresh),
                ratios=(params.low_ratio, params.mid_ratio,
                        params.high_ratio),
                hop=config.comp_hop, block_ctrl=config.comp_block_ctrl,
                overlap_ctrl=config.comp_overlap_ctrl,
                ballistics=config.comp_ballistics,
                state=None if first else mb_state, return_state=True,
                kernel=config.mb_kernel, emit_mono=want_mono)
            if want_mono:
                x, meter_rows, mb_state = x
            else:
                x, mb_state = x
        if not need_cells:
            return x, StreamState(eq_zi=eq_zi, mb=mb_state, kw_zi=None), None
        if meter_rows is not None:
            meter_sig = meter_rows[None]
        elif (config.measure_downmix == "reference_mono_mean"
              and x.shape[0] > 1):
            meter_sig = x.mean(axis=0, keepdims=True)
        else:
            meter_sig = x
        cells, _, kw_zi = loud.block_cell_energies_rows(
            meter_sig, config.sample_rate, zi=state.kw_zi, return_state=True,
            kernel=config.mb_kernel)
        return x, StreamState(eq_zi=eq_zi, mb=mb_state, kw_zi=kw_zi), cells
    if channel_major:
        from python_audio_mastering_tpu.models.chain import eq_sos
        from python_audio_mastering_tpu.ops import iir

        x = saturate(x, params.saturation)
        sos = eq_sos(params, config.sample_rate).astype(x.dtype)
        x, eq_zi = iir.sosfilt_blocked_cm(sos, x, zi=state.eq_zi,
                                          block_size=config.block_size)
        x = stereo_width(x, params.width, channel_axis=0)
        mb_state = state.mb
        if params.multiband:
            x, mb_state = multiband.multiband_compress(
                x, config.sample_rate,
                thresholds_db=(params.low_thresh, params.mid_thresh,
                               params.high_thresh),
                ratios=(params.low_ratio, params.mid_ratio,
                        params.high_ratio),
                variant=variant_mb, filter_method="blocked",
                hop=config.comp_hop, block_ctrl=config.comp_block_ctrl,
                overlap_ctrl=config.comp_overlap_ctrl,
                ballistics=config.comp_ballistics,
                state=None if first else mb_state, return_state=True,
                channel_major=True)
        if not need_cells:
            return x, StreamState(eq_zi=eq_zi, mb=mb_state, kw_zi=None), None
        meter_sig = x.mean(axis=0, keepdims=True) \
            if (config.measure_downmix == "reference_mono_mean"
                and x.shape[0] > 1) else x
        cells, _, kw_zi = loud.block_cell_energies_cm(
            meter_sig, config.sample_rate, zi=state.kw_zi)
        return x, StreamState(eq_zi=eq_zi, mb=mb_state, kw_zi=kw_zi), cells
    if config.variant == "worker":
        x = saturate(x, params.saturation)
    else:
        x = saturate_legacy(x, params.saturation)
    x, eq_zi = apply_eq(x, params, config, zi=state.eq_zi)
    x = stereo_width(x, params.width)
    mb_state = state.mb
    if params.multiband:
        x, mb_state = multiband.multiband_compress(
            x, config.sample_rate,
            thresholds_db=(params.low_thresh, params.mid_thresh, params.high_thresh),
            ratios=(params.low_ratio, params.mid_ratio, params.high_ratio),
            variant=variant_mb, filter_method=config.filter_method,
            hop=config.comp_hop, block_ctrl=config.comp_block_ctrl,
            overlap_ctrl=config.comp_overlap_ctrl,
            ballistics=config.comp_ballistics,
            state=None if first else mb_state, return_state=True)

    if not need_cells:
        return x, StreamState(eq_zi=eq_zi, mb=mb_state, kw_zi=None), None
    # loudness cells of the *processed* chunk (pre-gain, pre-limiter)
    meter_sig = x.mean(axis=1, keepdims=True) \
        if (config.measure_downmix == "reference_mono_mean" and x.ndim == 2) else x
    cells, kw_zi = loud.block_cell_energies(meter_sig, config.sample_rate,
                                            zi=state.kw_zi,
                                            filter_method=config.filter_method)
    return x, StreamState(eq_zi=eq_zi, mb=mb_state, kw_zi=kw_zi), cells


def _cells_chunk(chunk, zi, config: ChainConfig, channel_major: bool = False):
    """Loudness cells of an already-processed chunk (checkpoint replay).

    A checkpoint written by a run with ``need_cells=False`` stores no
    cells; a resume that DOES need them (lufs re-enabled or meters newly
    requested) rebuilds them from the saved processed audio.  Cells are
    measured on exactly this signal (post-effects, pre-gain), so the
    rebuilt values equal what the original run would have accumulated.
    """
    x = chunk
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(config.jnp_dtype()) / PCM16_SCALE
    if channel_major and x.ndim == 3:
        meter_sig = x.mean(axis=0, keepdims=True) \
            if (config.measure_downmix == "reference_mono_mean"
                and x.shape[0] > 1) else x
        cells, _, kw_zi = loud.block_cell_energies_rows(
            meter_sig, config.sample_rate, zi=zi, return_state=True,
            kernel=config.mb_kernel)
    elif channel_major:
        meter_sig = x.mean(axis=0, keepdims=True) \
            if (config.measure_downmix == "reference_mono_mean"
                and x.shape[0] > 1) else x
        cells, _, kw_zi = loud.block_cell_energies_cm(
            meter_sig, config.sample_rate, zi=zi)
    else:
        meter_sig = x.mean(axis=1, keepdims=True) \
            if (config.measure_downmix == "reference_mono_mean"
                and x.ndim == 2) else x
        cells, kw_zi = loud.block_cell_energies(
            meter_sig, config.sample_rate, zi=zi,
            filter_method=config.filter_method)
    return cells, kw_zi


@functools.lru_cache(maxsize=32)
def _compiled_cells(config: ChainConfig, batched: bool = False):
    base = functools.partial(_cells_chunk, config=config)
    if not batched:
        return jax.jit(base, static_argnames=("channel_major",))

    def run(chunk, zi, channel_major=False):
        if zi is None:
            return jax.vmap(
                lambda c: base(c, None, channel_major=channel_major))(chunk)
        return jax.vmap(
            lambda c, z: base(c, z, channel_major=channel_major))(chunk, zi)

    return jax.jit(run, static_argnames=("channel_major",))


def _rebuild_cells(processed, cell_list, state, config: ChainConfig,
                   channel_major: bool, batched: bool = False):
    """Fill in cells for chunks replayed from cell-less checkpoints.

    Recomputes the WHOLE replayed prefix (carrying K-filter state from
    zero, as the original pass would have) whenever any entry is missing,
    and patches ``state.kw_zi`` so chunks processed after the resume point
    continue the K-filter seamlessly.  No-op when every cell is present.
    """
    if not processed or all(c is not None for c in cell_list):
        return cell_list, state
    fn = _compiled_cells(config, batched)
    kw_zi = None
    rebuilt = []
    for y in processed:
        cells, kw_zi = fn(y, kw_zi, channel_major=channel_major)
        rebuilt.append(cells)
    return rebuilt, dataclasses.replace(state, kw_zi=kw_zi)


def _dequant_if_int(x, config: ChainConfig):
    """Spilled pcm16 pass-A chunks re-enter pass B as int16 — dequantize."""
    if x is not None and jnp.issubdtype(x.dtype, jnp.integer):
        return x.astype(config.jnp_dtype()) / PCM16_SCALE
    return x


def _finalize_lookahead(chunk, gain, lstate, config: ChainConfig,
                        flush: bool = False, emit_i16: bool = False,
                        channel_major: bool = False):
    """Pass-B step for quality mode: gain → streamed lookahead limiter.

    The limiter's delay-line/release state is carried in ``lstate`` (see
    ops.limiter.lookahead_limiter_chunk); emissions lag input by the
    pending-buffer depth and drain on the ``flush`` call.  In
    ``channel_major`` mode the ``(C, L)`` chunk is transposed around the
    limiter's (N, C) state machine — one relayout per chunk, only in
    quality mode (its envelope scan dominates anyway).
    """
    from python_audio_mastering_tpu.ops import limiter as lim

    chunk = _dequant_if_int(chunk, config)
    y = None if chunk is None else chunk * gain
    if channel_major and y is not None:
        y = y.T
    out, new_state = lim.lookahead_limiter_chunk(
        y, lstate, config.sample_rate, flush=flush)
    if channel_major:
        out = out.T
    if emit_i16:
        out = requantize_pcm16(out)
    return out, new_state


def _tp_chunk(tail, chunk, config: ChainConfig, last: bool = False,
              channel_major: bool = False):
    """Streaming true-peak step: chunk (+ carried boundary tail) → scalar
    max true peak and the next tail.  int16 (pcm16) chunks are dequantized
    first — the quantized samples ARE the output, so this is the honest
    measurement.

    Interpolation windows touching the zero padding are excluded
    (``exclude_pad``): an edge position evaluated against zeros is
    re-evaluated with its real neighbours via the carried tail in the next
    call, and keeping the zero-context value could overestimate the true
    peak.  The head exclusion is safe on the very first chunk too — its
    zero tail physically encodes the start-of-signal zeros, so windows
    inside it match the one-shot padded evaluation.  ``last`` re-enables
    the trailing zero-pad windows (the genuine end-of-signal edge)."""
    from python_audio_mastering_tpu.ops.meters import true_peak_linear

    x = chunk
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(config.jnp_dtype()) / PCM16_SCALE
    if channel_major:
        x = x.T  # meters are optional; one relayout per chunk when asked
    ext = jnp.concatenate([tail, x], axis=0)
    return (true_peak_linear(ext, exclude_pad=(True, not last)),
            ext[-tail.shape[0]:])


def _finalize_chunk(chunk, gain, config: ChainConfig, emit_i16: bool = False):
    x = _dequant_if_int(chunk, config) * gain
    if config.variant == "worker":
        y = soft_limiter(x, threshold=config.limiter_threshold)
    else:
        y = soft_limiter_legacy(x, threshold=config.limiter_threshold)
    if emit_i16:
        # pcm16 transfer path: requantize on-device so the readback ships
        # half the bytes
        return requantize_pcm16(y)
    return y


def _ckpt_path(checkpoint_dir, i):
    return os.path.join(checkpoint_dir, f"chunk_{i:05d}.pkl")


def _save_checkpoint(checkpoint_dir, i, y, state, cells, layout="nc",
                     rows=False):
    """Durable chunk-granular progress: atomic write of audio + state.

    ``y``/``cells`` may be single chunk arrays or LISTS of consecutive
    chunks (a *segment* — the batched album runner checkpoints every N
    chunks, so one file carries the N chunks ending at index ``i``).
    The file is keyed by the LAST chunk index it contains.  ``layout``
    records the audio axis order (``"nc"`` time-major / ``"cn"``
    channel-major) so a resume under the other execution layout can
    transpose on load instead of corrupting the concat.  ``rows=True``
    marks chunks in the on-device ``(…, C, nb, L)`` rows form: they are
    flattened HOST-side (free — the readback is row-major) into the
    ``"cn"`` on-disk format, so checkpoints stay layout-portable."""
    ys = y if isinstance(y, (list, tuple)) else [y]
    cells_seq = cells if isinstance(cells, (list, tuple)) else [cells]
    if rows:
        ys = [np.asarray(v).reshape(np.shape(v)[:-2] + (-1,)) for v in ys]
    payload = {
        "ys": [np.asarray(v) for v in ys],
        "state": jax.tree.map(np.asarray, state),
        "cells": [None if c is None else np.asarray(c) for c in cells_seq],
        "start": i - len(ys) + 1,
        "layout": layout,
    }
    path = _ckpt_path(checkpoint_dir, i)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def _load_checkpoints(checkpoint_dir, num_chunks, dtype, layout="nc",
                      to_device=True):
    """Replay the contiguous prefix of saved chunk segments.

    ``layout`` is the CALLER's execution layout; segments saved under the
    other layout (e.g. a pre-channel-major checkpoint resumed by a
    channel-major run) are transposed on load.

    ``to_device=False`` (bounded-memory callers) keeps replayed chunks as
    HOST numpy: a bounded job resumed late must not re-hold the whole
    replayed prefix in HBM (ADVICE r4) — pass B uploads them one at a
    time, exactly like spilled chunks."""
    import glob

    processed, cell_list = [], []
    state = StreamState()
    i = 0
    files = sorted(glob.glob(os.path.join(checkpoint_dir, "chunk_*.pkl")))
    for path in files:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        ys = payload.get("ys")
        if ys is None:  # pre-segment single-chunk format
            ys = [payload["y"]]
            cells_seq = [payload.get("cells")]
            start = int(os.path.basename(path)[6:11])
        else:
            cells_seq = payload["cells"]
            start = payload["start"]
        if payload.get("layout", "nc") != layout:
            # audio axes are the trailing two in both the streamed (2-D)
            # and batched-album (3-D, tracks leading) formats
            ys = [np.swapaxes(np.asarray(y), -1, -2) for y in ys]
        if start != i:  # gap → stop at the contiguous prefix
            break
        for y, cells in zip(ys, cells_seq):
            processed.append(jnp.asarray(y, dtype=dtype) if to_device
                             else np.asarray(y, dtype=dtype))
            cell_list.append(None if cells is None
                             else jnp.asarray(cells, dtype=dtype))
        state = jax.tree.map(jnp.asarray, payload["state"])
        i = start + len(ys)
        if i >= num_chunks:
            break
    return min(i, num_chunks), state, processed[:num_chunks], \
        cell_list[:num_chunks]


@functools.lru_cache(maxsize=32)
def _compiled(config: ChainConfig):
    """Per-config jitted chunk kernels, cached across master_streamed calls
    (a worker serving many jobs compiles once per config + chunk shape)."""
    fx = jax.jit(functools.partial(_fx_chunk, config=config,
                                   variant_mb=config.variant),
                 static_argnames=("first", "need_cells", "channel_major"))
    fin = jax.jit(functools.partial(_finalize_chunk, config=config),
                  static_argnames=("emit_i16",))
    fin_la = jax.jit(functools.partial(_finalize_lookahead, config=config),
                     static_argnames=("flush", "emit_i16", "channel_major"))
    tp = jax.jit(functools.partial(_tp_chunk, config=config),
                 static_argnames=("last", "channel_major"))
    req = jax.jit(requantize_pcm16)
    return fx, fin, fin_la, tp, req


def master_streamed(audio, params: MasteringParams, config: ChainConfig,
                    chunk_seconds: float = 30.0, progress_cb=None,
                    carry_state: bool = True, checkpoint_dir: str | None = None,
                    transfer: str = "float32", return_meters: bool = False,
                    stats: dict | None = None):
    """Master arbitrarily long audio in bounded device memory
    (``config.device_budget_bytes``; spill policy below).

    Args:
      audio: ``(N, C)`` float array (numpy; ``np.memmap`` works for
        larger-than-RAM files).
      progress_cb: optional ``cb(message: str)`` — the GUI/worker progress
        contract (mastering_gui.py:224, engine:77).
      carry_state: True (default) carries all filter/ballistics state across
        chunks (streamed == one-shot).  False reproduces the reference's
        per-chunk state reset behaviour (engine:48-77) for parity studies.
      checkpoint_dir: optional directory for chunk-granular resume: after
        each chunk, carried state + processed audio land in
        ``chunk_NNNNN.pkl``; an interrupted job re-run with the same
        directory resumes at the first missing chunk instead of from zero
        (the reference restarts whole jobs, SURVEY.md §5).
      transfer: ``"float32"`` (default) or ``"pcm16"`` — int16 PCM over the
        host↔device link with on-device de/requantization (half the bytes
        each way; for slow links, e.g. a tunneled chip).
      return_meters: also return the R128 meter family, streamed from the
        accumulated 100 ms cells (momentary/short-term series, LRA) plus
        the output true peak (chunked with carried boundary tails) — no
        second pass over the audio.
      stats: optional dict that receives residency telemetry
        (``max_retained_bytes``, ``spilled_chunks``, ``device_resident``)
        — asserted by the bounded-memory test.

    Device-memory policy: when input + retained pass-A chunks + finalized
    outputs fit ``config.device_budget_bytes`` everything stays
    device-resident (one transfer per file).  Otherwise the run is
    BOUNDED: the input streams from the host per chunk, pass-A outputs
    beyond ``budget/2`` spill to the host in float32 (always lossless —
    pass-A outputs are pre-gain/pre-limiter and may exceed ±1.0, so the
    pcm16 wire quantizer must never touch them) and re-upload during
    pass B, and finalized chunks read back immediately — device residency
    stays O(budget) for any file length.

    Returns ``(audio_out (N, C) np.float32, measured_lufs, gain_db)``, plus
    a meters dict when ``return_meters``.

    Quality mode: ``config.limiter_mode="lookahead_truepeak"`` streams too —
    the limiter's delay-line + release state is carried across chunks
    (ops.limiter.lookahead_limiter_chunk), matching the one-shot master().
    """
    if transfer not in ("float32", "pcm16"):
        raise ValueError(f"unknown transfer format {transfer!r}")
    pcm16 = transfer == "pcm16"
    dtype = config.jnp_dtype()
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[:, None]
    n, c = audio.shape
    chunk_frames = default_chunk_frames(config, chunk_seconds)
    num_chunks = max(1, -(-n // chunk_frames))

    fx, fin, fin_la, tp_fn, _ = _compiled(config)

    # Channel-major hot path (same gate as models.chain.master): chunks
    # live on device as (C, chunk_frames) and the whole per-chunk body runs
    # the folded-rows TPU form — the host transposes once per file (cheap
    # next to the link), not the device once per op.  When the chunk length
    # is additionally a block_size multiple (the default_chunk_frames
    # production geometry), chunks live as (C, nb, L) ROWS and the body
    # pays zero layout-change copies (see _fx_chunk).
    cm = config.channel_major(chunk_frames)
    rows = cm and chunk_frames % config.block_size == 0
    blk = config.block_size
    tax = 1 if cm else 0  # time axis of device-side chunks

    def to_wire(arr):
        w = quantize_pcm16(arr) if pcm16 else np.asarray(arr, dtype)
        if rows:
            return np.ascontiguousarray(w.T).reshape(c, -1, blk)
        return np.ascontiguousarray(w.T) if cm else w

    # Device-residency policy (config.device_budget_bytes): the input, the
    # retained pass-A chunks, and the finalized outputs together must fit
    # the budget, or the run switches to bounded mode — host-streamed
    # input, oldest pass-A chunks spilled to the host in wire format and
    # re-uploaded during pass B, finalized chunks read back immediately.
    # np.memmap inputs always take the bounded path.
    n_padded = num_chunks * chunk_frames
    wire_itemsize = 2 if pcm16 else dtype.itemsize
    budget = config.device_budget_bytes
    chunk_dev_bytes = chunk_frames * c * dtype.itemsize
    device_resident = (
        not isinstance(audio, np.memmap)
        and n_padded * c * wire_itemsize
        + 2 * num_chunks * chunk_dev_bytes <= budget)
    # bounded mode: at most keep_dev processed chunks stay device-resident
    keep_dev = max(2, (budget // 2) // max(chunk_dev_bytes, 1))
    if device_resident:
        whole = np.asarray(audio)
        if n_padded > n:
            whole = np.concatenate(
                [whole, np.zeros((n_padded - n, c), whole.dtype)])
        x_dev = jax.device_put(to_wire(whole))

        def chunk_at(i):
            if rows:  # slice whole blocks along the nb axis
                cpb = chunk_frames // blk
                return jax.lax.slice_in_dim(x_dev, i * cpb, (i + 1) * cpb,
                                            axis=1)
            return jax.lax.slice_in_dim(x_dev, i * chunk_frames,
                                        (i + 1) * chunk_frames, axis=tax)
    else:
        def chunk_at(i):
            # one compiled shape for every chunk: the tail is zero-padded and
            # its padded cells are masked out of the loudness measure below
            s = i * chunk_frames
            c_arr = audio[s: s + chunk_frames]
            if c_arr.shape[0] < chunk_frames:
                c_arr = np.concatenate(
                    [c_arr, np.zeros((chunk_frames - c_arr.shape[0], c),
                                     c_arr.dtype)])
            return jax.device_put(to_wire(c_arr))

    need_cells = params.lufs_enabled or return_meters
    state = StreamState()
    processed = []
    cell_list = []
    start_chunk = 0
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        start_chunk, state, processed, cell_list = _load_checkpoints(
            checkpoint_dir, num_chunks, dtype, layout="cn" if cm else "nc",
            to_device=device_resident)
        if rows:  # resumed chunks re-fold into the rows execution form
            processed = [y.reshape(c, -1, blk) for y in processed]
        if need_cells:
            # checkpoints written by a no-lufs/no-meters run carry no cells
            cell_list, state = _rebuild_cells(processed, cell_list, state,
                                              config, cm)
        if start_chunk and progress_cb:
            progress_cb(f"Resuming from chunk {start_chunk + 1}/{num_chunks}...")

    def _spill(y):
        # device → host ALWAYS in float32 (lossless): pass-A outputs are
        # pre-LUFS-gain / pre-limiter and can exceed ±1.0 on hot material,
        # so the pcm16 wire quantizer would hard-clip them (ADVICE r4) —
        # an error the non-spilled run never incurs.  The spill buffer is
        # host RAM, not the link; only pass B's re-upload pays float width.
        return np.asarray(y)

    dev_start = len(processed)  # checkpoint-resumed entries are host numpy
    mem_stats = {"max_retained_bytes": 0, "spilled_chunks": 0,
                 "device_resident": device_resident}
    if stats is not None:
        stats.update(mem_stats)
        mem_stats = stats
    next_dev = chunk_at(start_chunk) if start_chunk < num_chunks else None
    for i in range(start_chunk, num_chunks):
        cur = next_dev
        if i + 1 < num_chunks:
            next_dev = chunk_at(i + 1)
        y, new_state, cells = fx(cur, params, state=state,
                                 first=(i == 0 or not carry_state),
                                 need_cells=need_cells, channel_major=cm)
        state = new_state if carry_state else StreamState()
        processed.append(y)  # device-resident until pass B (or spilled)
        mem_stats["max_retained_bytes"] = max(
            mem_stats["max_retained_bytes"],
            (len(processed) - dev_start) * chunk_dev_bytes)
        if not device_resident and len(processed) - dev_start > keep_dev:
            processed[dev_start] = _spill(processed[dev_start])
            dev_start += 1
            mem_stats["spilled_chunks"] += 1
        cell_list.append(cells)
        if checkpoint_dir:
            _save_checkpoint(checkpoint_dir, i, y, state, cells,
                             layout="cn" if cm else "nc", rows=rows)
        if progress_cb:
            progress_cb(f"Processed chunk {i + 1}/{num_chunks}...")

    cell_len = int(round(0.1 * config.sample_rate))
    all_cells = jnp.concatenate(cell_list, axis=0) \
        if (params.lufs_enabled or return_meters) else None
    if params.lufs_enabled:
        # cells across chunks concatenate into exactly the one-shot grid;
        # cells that are not fully inside the real n samples are masked
        # (the spec's complete-blocks-only rule, as in the one-shot path)
        mask = jnp.arange(all_cells.shape[0]) < (n // cell_len)
        measured = loud.loudness_from_cells(all_cells, cell_mask=mask)
        gain = 10.0 ** ((jnp.asarray(params.lufs, dtype) - measured) / 20.0)
        gain = jnp.where(jnp.isfinite(measured), gain, 1.0)
    else:
        measured = jnp.asarray(jnp.nan, dtype)
        gain = jnp.ones((), dtype)

    finalized = []
    if config.limiter_mode == "lookahead_truepeak":
        from python_audio_mastering_tpu.ops import limiter as lim

        # quality mode streams: carried delay-line/release limiter state;
        # the padded tail is trimmed *before* the limiter so edge semantics
        # match the one-shot master() exactly.
        lstate = lim.lookahead_limiter_init(c, dtype)
        rem = n - (num_chunks - 1) * chunk_frames
        for i, y in enumerate(processed):
            if rows:  # the limiter state machine is (N, C)-sequential
                y = y.reshape(c, -1)
            if i == num_chunks - 1 and rem < chunk_frames:
                y = jax.lax.slice_in_dim(y, 0, rem, axis=tax)
            o, lstate = fin_la(y, gain, lstate, emit_i16=pcm16,
                               channel_major=cm)
            if o.shape[tax]:
                finalized.append(o if device_resident else np.asarray(o))
            if progress_cb:
                progress_cb(f"Finalizing chunk {i + 1}/{num_chunks}...")
        o, _ = fin_la(None, gain, lstate, flush=True, emit_i16=pcm16,
                      channel_major=cm)
        if o.shape[tax]:
            finalized.append(o if device_resident else np.asarray(o))
        fin_rows = False
    else:
        # trim the zero-padding/ring-out tail of the last chunk BEFORE
        # finalize so the streamed true-peak meter below never sees samples
        # that are not part of the returned audio (fin is elementwise, so
        # trimming before vs. after it is identical for kept samples).
        # Rows-form chunks stay rows (fin is elementwise); the padded tail
        # is cut on the host after readback, and the meter loop below
        # flattens + trims its own view.
        rem = n - (num_chunks - 1) * chunk_frames
        for i, y in enumerate(processed):
            if not rows and i == num_chunks - 1 and rem < chunk_frames:
                y = jax.lax.slice_in_dim(y, 0, rem, axis=tax)
            o = fin(y, gain, emit_i16=pcm16)
            # bounded mode: finalized chunks read back immediately so
            # device residency never exceeds the budget in pass B either
            finalized.append(o if device_resident else np.asarray(o))
            if progress_cb:
                progress_cb(f"Finalizing chunk {i + 1}/{num_chunks}...")
        fin_rows = rows

    tp_max = None
    if return_meters:
        tp_tail = jnp.zeros((32, c), dtype)
        for fi, f in enumerate(finalized):
            if fin_rows:
                f = f.reshape(c, -1)
                if fi == len(finalized) - 1 and rem < chunk_frames:
                    f = jax.lax.slice_in_dim(f, 0, rem, axis=1)
            tpv, tp_tail = tp_fn(tp_tail, f, last=(fi == len(finalized) - 1),
                                 channel_major=cm)
            tp_max = tpv if tp_max is None else jnp.maximum(tp_max, tpv)

    cat_ax = 1 if fin_rows else tax
    if device_resident:
        out = np.asarray(jnp.concatenate(finalized, axis=cat_ax))
    else:
        out = np.concatenate([np.asarray(y) for y in finalized], axis=cat_ax)
    if fin_rows:
        out = out.reshape(c, -1)  # host-side unfold (free: row-major)
    out = np.ascontiguousarray(out[:, :n].T) if cm else out[:n]
    if pcm16:
        out = dequantize_pcm16_host(out)
    if squeeze:
        out = out[:, 0]
    gain_db = 20.0 * float(np.log10(float(gain)))
    if not return_meters:
        return out, float(measured), gain_db

    from python_audio_mastering_tpu.ops import meters as met

    # loudness series of the *normalized* signal: cell energies scale by
    # gain² (meters sit before the brickwall, the standard metering point)
    valid_cells = all_cells[: n // cell_len] * (gain ** 2)
    mom = met._sliding_loudness(valid_cells, 4)
    st = met._sliding_loudness(valid_cells, 30)
    meters = {
        "momentary_lufs": np.asarray(mom),
        "short_term_lufs": np.asarray(st),
        "lra_lu": float(met.lra_from_shortterm(st)),
        "true_peak_dbtp": float(20.0 * np.log10(max(float(tp_max), 1e-12)))
        if tp_max is not None else None,
        "integrated_lufs": float(measured) + gain_db,
    }
    return out, float(measured), gain_db, meters
