"""The mastering chain: one fused, differentiable, jit-compiled graph.

Reference pipeline (worker/audio_mastering_engine.py:53-89):
saturation → 4-band EQ → stereo width → [3-band multiband compressor] →
LUFS normalize → soft limiter.

Differences by design (each one documented in DESIGN.md):
* The whole chain is one ``jit`` graph over the full ``(N, C)`` array — no
  30 s chunk objects, no int16 round-trips between stages.  Chunked
  execution for long files lives in ``parallel.streaming`` and carries
  filter/ballistics state across chunk boundaries (the reference resets
  state every chunk — a defect, SURVEY.md §5).
* The four EQ biquads are concatenated into a single 8-state cascade and
  executed in ONE blocked-IIR pass (two MXU matmuls) instead of four
  sequential scipy calls per channel (engine:154-161).
* All parameters are traced — moving a slider never recompiles.  The two
  structural switches (multiband on/off, lufs on/off) are static and select
  one of four compiled variants, mirroring the reference's Python branches.

Both reference engine variants are provided: ``variant="worker"`` (the
canonical cloud engine) and ``variant="legacy"`` (main.py:94-192, which has
a different saturation, EQ topology, mid-band split and limiter — and
returns mono EQ input unprocessed, main.py:130-131).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from python_audio_mastering_tpu.config import ChainConfig, MasteringParams
from python_audio_mastering_tpu.ops import iir, multiband
from python_audio_mastering_tpu.ops.biquad import (
    butter_sos,
    reference_peak_sos,
    reference_shelf_sos,
)
from python_audio_mastering_tpu.ops.loudness import normalize_to_lufs
from python_audio_mastering_tpu.ops.stereo import stereo_width
from python_audio_mastering_tpu.ops.waveshaper import (
    saturate,
    saturate_legacy,
    soft_limiter,
    soft_limiter_legacy,
)

__all__ = ["master", "make_master_fn", "MasterResult", "eq_sos", "apply_eq"]


@dataclasses.dataclass
class MasterResult:
    """Chain output + the quantitative observability the reference logs."""

    audio: Any
    measured_lufs: Any   # loudness before normalization (engine:221)
    applied_gain_db: Any

jax.tree_util.register_dataclass(
    MasterResult, data_fields=["audio", "measured_lufs", "applied_gain_db"],
    meta_fields=[])


def eq_sos(params: MasteringParams, sample_rate: int):
    """The worker EQ as one 4-section cascade (engine:146-168).

    low shelf @250 (bass), peak @1k (−mid_cut), peak @4k (presence),
    high shelf @8k (treble) — reference formulas incl. its doubled-w0 quirk.
    Gains are traced; 0 dB sections are algebraically identity.
    """
    return jnp.concatenate([
        reference_shelf_sos(sample_rate, 250.0, params.bass_boost, "low"),
        reference_peak_sos(sample_rate, 1000.0, -jnp.asarray(params.mid_cut)),
        reference_peak_sos(sample_rate, 4000.0, params.presence_boost),
        reference_shelf_sos(sample_rate, 8000.0, params.treble_boost, "high"),
    ], axis=0)


def apply_eq(x, params, config, zi=None):
    """Worker-variant EQ: one fused cascade pass. Returns (y, zf)."""
    sos = eq_sos(params, config.sample_rate).astype(x.dtype)
    return iir.sosfilt(sos, x, zi=zi, method=config.filter_method,
                       block_size=config.block_size)


def _apply_eq_legacy(x, params, config):
    """Legacy EQ (main.py:118-154): parallel-blend Butterworth filters.

    Mono input is returned unprocessed (main.py:130-131).  Shelves are an
    order-5 Butterworth band split blended by gain; the 'peak' is an
    order-2 bandpass parallel add.  All crossover designs are static.
    """
    if x.ndim == 1 or x.shape[1] != 2:
        return x
    fs = config.sample_rate
    run = functools.partial(iir.sosfilt, method=config.filter_method,
                            block_size=config.block_size)

    def shelf(sig, fc, gain_db, btype):
        filtered, _ = run(butter_sos(5, fc / (0.5 * fs), btype), sig)
        g = 10.0 ** (jnp.asarray(gain_db, sig.dtype) / 20.0)
        boosted = sig + filtered * (g - 1.0)
        cut = sig * g + filtered * (1.0 - g)
        return jnp.where(jnp.asarray(gain_db) > 0, boosted, cut)

    def peak(sig, fc, gain_db, q=1.0):
        import numpy as np
        normal = fc / (0.5 * fs)
        e1, e2 = normal / np.sqrt(q), normal * np.sqrt(q)
        lo, hi = min(e1, e2), max(e1, e2)
        hi = min(hi, 0.999999)
        filtered, _ = run(butter_sos(2, [lo, hi], "bandpass"), sig)
        g = 10.0 ** (jnp.asarray(gain_db, sig.dtype) / 20.0)
        return sig + filtered * (g - 1.0)

    x = shelf(x, 250.0, params.bass_boost, "lowpass")
    x = peak(x, 1000.0, -jnp.asarray(params.mid_cut))
    x = peak(x, 4000.0, params.presence_boost)
    x = shelf(x, 8000.0, params.treble_boost, "highpass")
    return x


def _front(xr, params: MasteringParams, config: ChainConfig, state=None,
           return_state: bool = False, emit_mono: bool = False):
    """Chain front over rows form: saturate → EQ → widener.

    On TPU (``config.mb_kernel`` gate, same as the multiband kernels) the
    three stages fuse into ONE Pallas pass (``ops.pallas_multiband.
    front_chain``): the EQ's per-block incoming states come from a tiny
    states-only pass whose ``rows @ G`` read absorbs the waveshaper, and
    the kernel reads the raw signal once and writes the widened EQ output
    once — replacing ~5 XLA full-signal passes.  Elsewhere the plain ops
    run (XLA fuses the elementwise stages anyway).  ``state``/
    ``return_state``: carried EQ ``zi`` for the streaming chunk body.

    ``emit_mono``: also return the output's channel-mean mono rows — the
    loudness downmix for the NO-multiband chain, folded into this pass so
    the meter never re-reads the full output (the multiband chain gets it
    from the gain-apply epilogue instead).

    Returns ``y``, extended to ``(y, ym)`` when ``emit_mono`` and with
    ``eq_zf`` appended when ``return_state``.
    """
    from python_audio_mastering_tpu.ops import pallas_multiband as pmb

    km = config.mb_kernel
    interpret = km == "pallas_interpret"
    c = xr.shape[0]
    use_kernel = (km != "xla" and c <= 2
                  and (interpret or km == "pallas"
                       or (km == "auto" and pmb.available()
                           and xr.dtype == jnp.float32)))
    eq = eq_sos(params, config.sample_rate).astype(xr.dtype)
    emit = emit_mono and c > 1
    ym = None
    if use_kernel:
        xs = saturate(xr, params.saturation)  # fuses into the states G-dot
        s_in, eq_zf, (t_eq, _, w_eq, _) = iir.sosfilt_states_rows(
            eq, xs, zi=state, return_state=return_state)
        y = pmb.front_chain(xr, s_in, t_eq, w_eq, params.saturation,
                            params.width, emit_mono=emit,
                            interpret=interpret)
        if emit:
            y, ym = y
    else:
        xs = saturate(xr, params.saturation)
        y, eq_zf = iir.sosfilt_blocked_rows(eq, xs, zi=state,
                                            return_state=return_state)
        y = stereo_width(y, params.width, channel_axis=0)
        if emit:
            ym = y.mean(axis=0)
    if emit_mono and not emit:
        ym = y[0]  # mono input: the signal is its own downmix
    if emit_mono:
        return (y, ym, eq_zf) if return_state else (y, ym)
    return (y, eq_zf) if return_state else y


def _master_cm(x, params: MasteringParams, config: ChainConfig,
               return_result: bool, valid_frames):
    """Rows-resident worker-variant chain body (the TPU hot path).

    Internal execution layout is ``(C, nb, L)`` — the signal folded into
    ``block_size``-sample rows, which is exactly the operand tiling every
    blocked-IIR MXU dot wants:

    * rows-resident: each filter pass reads the signal and writes its
      output as a pure ``(C·nb, L)`` dimension merge — ZERO layout-change
      copies between stages (the earlier ``(C, N)`` channel-major body paid
      a full-signal relayout into and out of every blocked pass: ~0.76 GB
      of the 1.97 GB total HBM writes on a 3-min stereo track);
    * the multiband detector reduces rows straight to the control rate and
      upsamples gains straight back into rows (one MXU bucket dot each
      way), and the loudness cell sums bucket along the lane axis — the
      signal is never unfolded until the single output transpose;
    * block-aligned padding: loudness gating masks cells beyond
      ``valid_frames``, trailing filter ring-out lives only in the padded
      region, which the final slice cuts.

    Numerically this is the same chain (same per-row contractions; float
    reassociation only — parity-tested against the row-major path).
    """
    from python_audio_mastering_tpu.ops.loudness import (
        gain_for_target,
        integrated_loudness_rows,
    )

    n, c = x.shape
    L = config.block_size
    nb = -(-n // L)
    vf = n if valid_frames is None else jnp.minimum(valid_frames, n)
    xr = jnp.pad(x.T, ((0, 0), (0, nb * L - n))).reshape(c, nb, L)

    # The loudness meter's mono downmix folds into the multiband's
    # gain-apply epilogue (emit_mono), or — no-multiband chain — into the
    # front kernel's epilogue, so the meter pass never re-reads the full
    # (C, nb, L) output (VERDICT r3 #6 / r4 #5).
    meter_rows = None
    want_mono = (params.lufs_enabled and c > 1
                 and config.measure_downmix == "reference_mono_mean")
    if params.multiband:
        xr = _front(xr, params, config)
        xr = multiband.multiband_compress_rows(
            xr, config.sample_rate,
            thresholds_db=(params.low_thresh, params.mid_thresh,
                           params.high_thresh),
            ratios=(params.low_ratio, params.mid_ratio, params.high_ratio),
            hop=config.comp_hop, block_ctrl=config.comp_block_ctrl,
            overlap_ctrl=config.comp_overlap_ctrl,
            ballistics=config.comp_ballistics, kernel=config.mb_kernel,
            emit_mono=want_mono)
        if want_mono:
            xr, meter_rows = xr
    elif want_mono:
        xr, meter_rows = _front(xr, params, config, emit_mono=True)
    else:
        xr = _front(xr, params, config)

    if params.lufs_enabled:
        measured = integrated_loudness_rows(
            meter_rows[None] if meter_rows is not None else xr,
            config.sample_rate, downmix=config.measure_downmix,
            valid_frames=vf, kernel=config.mb_kernel)
        gain = gain_for_target(measured, params.lufs, xr.dtype)
        xr = xr * gain
        gain_db = 20.0 * jnp.log10(gain)
    else:
        measured = jnp.asarray(jnp.nan, xr.dtype)
        gain_db = jnp.zeros((), xr.dtype)

    if config.limiter_mode == "lookahead_truepeak":
        from python_audio_mastering_tpu.ops.limiter import lookahead_limiter

        y = lookahead_limiter(xr.reshape(c, nb * L).T[:n],
                              config.sample_rate)
    else:
        y = soft_limiter(xr, threshold=config.limiter_threshold)
        y = y.reshape(c, nb * L).T[:n]

    if return_result:
        return MasterResult(audio=y, measured_lufs=measured,
                            applied_gain_db=gain_db)
    return y


def master(audio, params: MasteringParams, config: ChainConfig,
           return_result: bool = False, valid_frames=None):
    """Run the full mastering chain on ``(N, C)`` or ``(N,)`` float audio.

    Pure function of (audio, params) — safe to ``jit``, ``vmap`` (albums),
    ``grad`` (automastering) and shard.  Use :func:`make_master_fn` for a
    pre-jitted closure over the static config.

    ``valid_frames`` (traced OK): for zero-padded batched tracks, restricts
    the loudness measurement to the real samples so the gated LUFS equals
    the unpadded track's.
    """
    x = jnp.asarray(audio, dtype=config.jnp_dtype())

    # TPU hot path: worker variant + blocked filters → the channel-major,
    # block-aligned body (see _master_cm).  Short signals, the legacy
    # variant, and layout="nc" keep the row-major body below.
    if x.ndim == 2 and config.channel_major(x.shape[0]):
        return _master_cm(x, params, config, return_result, valid_frames)

    if config.variant == "worker":
        x = saturate(x, params.saturation)
        x, _ = apply_eq(x, params, config)
        x = stereo_width(x, params.width)
        if params.multiband:
            x = multiband.multiband_compress(
                x, config.sample_rate,
                thresholds_db=(params.low_thresh, params.mid_thresh, params.high_thresh),
                ratios=(params.low_ratio, params.mid_ratio, params.high_ratio),
                variant="worker", filter_method=config.filter_method,
                hop=config.comp_hop, block_ctrl=config.comp_block_ctrl,
                overlap_ctrl=config.comp_overlap_ctrl,
                ballistics=config.comp_ballistics)
        limiter = soft_limiter
    elif config.variant == "legacy":
        x = saturate_legacy(x, params.saturation)
        x = _apply_eq_legacy(x, params, config)
        x = stereo_width(x, params.width)
        if params.multiband:
            x = multiband.multiband_compress(
                x, config.sample_rate,
                thresholds_db=(params.low_thresh, params.mid_thresh, params.high_thresh),
                ratios=(params.low_ratio, params.mid_ratio, params.high_ratio),
                variant="legacy", filter_method=config.filter_method,
                hop=config.comp_hop, block_ctrl=config.comp_block_ctrl,
                overlap_ctrl=config.comp_overlap_ctrl,
                ballistics=config.comp_ballistics)
        limiter = functools.partial(soft_limiter_legacy,
                                    threshold=config.limiter_threshold)
    else:
        raise ValueError(f"unknown variant {config.variant!r}")

    if params.lufs_enabled:
        x, measured, gain = normalize_to_lufs(
            x, config.sample_rate, params.lufs, downmix=config.measure_downmix,
            filter_method=config.filter_method, valid_frames=valid_frames)
        gain_db = 20.0 * jnp.log10(gain)
    else:
        measured = jnp.asarray(jnp.nan, x.dtype)
        gain_db = jnp.zeros((), x.dtype)

    if config.limiter_mode == "lookahead_truepeak":
        from python_audio_mastering_tpu.ops.limiter import lookahead_limiter

        x = lookahead_limiter(x, config.sample_rate)
    elif config.variant == "worker":
        x = limiter(x, threshold=config.limiter_threshold)
    else:
        x = limiter(x)

    if return_result:
        return MasterResult(audio=x, measured_lufs=measured, applied_gain_db=gain_db)
    return x


def make_master_fn(config: ChainConfig, return_result: bool = True):
    """jit-compiled ``fn(audio, params) -> MasterResult`` for a fixed config.

    Compiles once per (audio shape, multiband/lufs switches); slider values
    are traced arguments.
    """
    @functools.partial(jax.jit, static_argnames=())
    def fn(audio, params):
        return master(audio, params, config, return_result=return_result)

    return fn
