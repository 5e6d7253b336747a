"""Pallas kernels for the HBM-lean 3-band multiband compressor.

The XLA rows path (``ops.multiband.multiband_compress_rows``) is the
dominant HBM consumer of the mastering chain: the two crossover band
outputs materialize in HBM between the filter pass and the gain-apply
epilogue, and the detector's per-band squared-energy rows materialize on
their way to the control rate — measured 4.8 GB of the chain's 6.63 GB
XLA-cost-model traffic on a 3-min stereo track (BENCH_DETAILS.json r03).

This module removes the band signals from HBM entirely with a three-phase
split around the *sequential* part of the filter (reference multiband:
engine:196-210; crossovers engine:197-198):

1. **States (XLA, tiny):** ``ops.iir.sosfilt_states_multi_rows`` — one
   ``rows @ G`` read of the signal plus the control-rate boundary-state
   recurrence yields every block's incoming cascade state ``(C, nb, S)``
   (~1 MB for a 3-min track).  With those states in hand, every block's
   band samples are *independently recomputable*: ``band = x_blk @ T +
   s_in @ Wᵀ`` — the same dense-operator algebra as the XLA blocked path.

2. **Energies (Pallas, parallel grid):** :func:`band_energies` streams
   superblocks of ``M`` blocks through VMEM, recomputes low/high there,
   forms ``mid = x − low − high`` in registers, and emits only the
   hop-bucketed channel-mean x² sums ``(3, nb, L/hop)`` — the detector's
   control-rate input.  The band signals live only in VMEM.

3. **Gain apply (Pallas, parallel grid):** after the (existing, exact)
   Pallas ballistics kernel produces control-rate gains,
   :func:`band_gain_apply` recomputes low/high the same way, upsamples
   the three gain columns with an in-VMEM MXU dot, and writes
   ``y = x·g_mid + low·(g_low−g_mid) + high·(g_high−g_mid)`` — the same
   recombination algebra as the fused XLA path (mid never exists).

Total multiband HBM traffic: ~3 signal reads + 1 write + control-rate
side bands, vs ~75 signal-equivalents for the XLA path.  Numerics: the
per-row contractions are identical to the XLA blocked path's (same
float64-precomputed operators, same recombination algebra); parity is
tested in interpret mode against the XLA rows path
(tests/test_pallas_multiband.py).

Both kernels use a *parallel* grid — no carried scratch — so they compose
with the non-divisible tail (out-of-range rows read/compute garbage that
never crosses row boundaries and is sliced off in XLA) and stay simple to
pipeline.  Not differentiable (no VJP); gradient paths use the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from python_audio_mastering_tpu.ops.pallas_kernels import available

__all__ = ["band_energies", "band_gain_apply", "front_chain",
           "front_chain_xla", "kweight_cells", "available"]

_SUP = 128  # blocks per superblock (grid step); M·L = 64k samples/step

# Mosaic's default f32 matmul runs reduced-precision passes — measured
# 0.105 max abs chain error vs the XLA path (which dots at HIGHEST) on the
# real chip, vs exact equality in interpret mode.  HIGHEST restores the
# XLA path's 6-pass f32 contraction; the kernels are HBM-bound, so the
# extra MXU passes are hidden.
_DOT = functools.partial(jnp.dot, precision=jax.lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=32)
def _filter_ops_np(sos_bytes, k, L):
    """(T (L, L), Wt (S, L)) for one static cascade, float64 host build."""
    from python_audio_mastering_tpu.ops.iir import _blocked_operators_static

    t_mat, _, w, _ = _blocked_operators_static(sos_bytes, k, L)
    return t_mat, np.ascontiguousarray(w.T)


def _kernel_operands(sos_lp, sos_hp, L, hop, dtype):
    """Shared resident operands: ``tcat (L, 2L)``, ``wt (2, S, L)``,
    ``bucket (L, L/hop)`` (None at hop=1)."""
    lp = np.asarray(sos_lp, np.float64)
    hp = np.asarray(sos_hp, np.float64)
    t_lp, wt_lp = _filter_ops_np(lp.tobytes(), lp.shape[0], L)
    t_hp, wt_hp = _filter_ops_np(hp.tobytes(), hp.shape[0], L)
    if wt_lp.shape != wt_hp.shape:
        raise ValueError("crossover cascades must share the state size")
    tcat = jnp.asarray(np.concatenate([t_lp, t_hp], axis=1), dtype)
    wt = jnp.asarray(np.stack([wt_lp, wt_hp]), dtype)
    bucket = None
    if hop > 1:
        from python_audio_mastering_tpu.ops.multiband import _bucket_matrix

        bucket = jnp.asarray(_bucket_matrix(L, hop), dtype)
    return tcat, wt, bucket


def _bands_block(x_ref, t_ref, wt_ref, slp_ref, shp_ref):
    """Recompute (x, low, high) for one superblock, all ``(C·M, L)``."""
    c, m, L = x_ref.shape
    xall = x_ref[:, :, :].reshape(c * m, L)
    y0 = _DOT(xall, t_ref[:, :], preferred_element_type=xall.dtype)
    s_lp = slp_ref[:, :, :].reshape(c * m, slp_ref.shape[2])
    s_hp = shp_ref[:, :, :].reshape(c * m, shp_ref.shape[2])
    low = y0[:, :L] + _DOT(s_lp, wt_ref[0],
                              preferred_element_type=xall.dtype)
    high = y0[:, L:] + _DOT(s_hp, wt_ref[1],
                               preferred_element_type=xall.dtype)
    return xall, low, high


def _energies_kernel(x_ref, t_ref, wt_ref, slp_ref, shp_ref, *refs, inv_c):
    bk_ref, out_ref = refs if len(refs) == 2 else (None, refs[0])
    c, m, L = x_ref.shape
    xall, low, high = _bands_block(x_ref, t_ref, wt_ref, slp_ref, shp_ref)
    mid = xall - low - high
    for band, sig in enumerate((low, mid, high)):
        e = (sig * sig).reshape(c, m, L)
        esum = e[0] if c == 1 else jnp.sum(e, axis=0)
        if bk_ref is None:
            out_ref[band] = esum * inv_c
        else:
            out_ref[band] = _DOT(esum, bk_ref[:, :],
                                    preferred_element_type=esum.dtype) * inv_c


def _gain_apply_kernel(x_ref, t_ref, wt_ref, slp_ref, shp_ref, cols_ref,
                       *refs, emit_mono):
    if emit_mono:
        *refs, mono_ref = refs
    up_ref, out_ref = refs if len(refs) == 2 else (None, refs[0])
    c, m, L = x_ref.shape
    xall, low, high = _bands_block(x_ref, t_ref, wt_ref, slp_ref, shp_ref)
    if up_ref is None:
        gm, dl, dh = cols_ref[0], cols_ref[1], cols_ref[2]  # (M, L)
    else:
        gm = _DOT(cols_ref[0], up_ref[:, :],
                     preferred_element_type=xall.dtype)
        dl = _DOT(cols_ref[1], up_ref[:, :],
                     preferred_element_type=xall.dtype)
        dh = _DOT(cols_ref[2], up_ref[:, :],
                     preferred_element_type=xall.dtype)
    y = (xall.reshape(c, m, L) * gm[None]
         + low.reshape(c, m, L) * dl[None]
         + high.reshape(c, m, L) * dh[None])
    out_ref[:, :, :] = y
    if emit_mono:
        # loudness downmix folded into the recombination epilogue: the
        # meter pass reads this (N,) mono signal instead of re-reading the
        # full (N, C) output (VERDICT r3 #6 — one fewer full-signal pass)
        mono_ref[:, :] = (y[0] if c == 1 else jnp.sum(y, axis=0)) * (1.0 / c)


def _front_kernel(coef_ref, x_ref, t_ref, wt_ref, se_ref, out_ref,
                  *refs, emit_mono=False):
    """saturate → EQ (from per-block states) → stereo width, fused.

    The chain front paid ~5 XLA full-signal passes (saturate write/read,
    EQ T-dot read/write, width write); this kernel reads the raw signal
    once and writes the widened EQ output once, recomputing the EQ from
    the tiny boundary states exactly like the multiband kernels do.
    Reference formulas: saturation engine:128-134, widener engine:136-144.

    ``emit_mono``: also write the channel mean of the output — the
    loudness meter's downmix for the no-multiband chain, folded into this
    pass so the meter never re-reads the full output (the multiband chain
    gets the same service from the gain-apply epilogue's emit_mono).
    """
    mono_ref = refs[0] if emit_mono else None
    mix = coef_ref[0, 0]
    drive = coef_ref[0, 1]
    width = coef_ref[0, 2]
    c, m, L = x_ref.shape
    xall = x_ref[:, :, :].reshape(c * m, L)
    xs = (1.0 - mix) * xall + mix * jnp.tanh(xall * drive)
    s_in = se_ref[:, :, :].reshape(c * m, se_ref.shape[2])
    y = _DOT(xs, t_ref[:, :], preferred_element_type=xall.dtype) + \
        _DOT(s_in, wt_ref[:, :], preferred_element_type=xall.dtype)
    y3 = y.reshape(c, m, L)
    if c == 2:
        mid = (y3[0] + y3[1]) * 0.5
        side = (y3[0] - y3[1]) * (0.5 * width)
        a = mid + side
        b = mid - side
        out_ref[0] = a
        out_ref[1] = b
        if emit_mono:
            mono_ref[:, :] = (a + b) * 0.5
    else:
        out_ref[:, :, :] = y3
        if emit_mono:
            mono_ref[:, :] = y3[0]


def front_chain(xrows, s_in_eq, t_eq, w_eq, saturation_percent, width,
                emit_mono: bool = False, interpret: bool = False):
    """Fused chain front over rows form: one signal read + one write.

    Args:
      xrows: ``(C, nb, L)`` RAW rows signal (pre-saturation).
      s_in_eq: ``(C, nb, S)`` per-block EQ incoming states computed from
        the SATURATED signal (``iir.sosfilt_states_rows`` on
        ``saturate(x)`` — the G-dot fuses the waveshaper into its operand
        read, so the states pass still reads the signal once).
      t_eq / w_eq: the EQ's ``T (L, L)`` and ``W (L, S)`` operators
        (traced in-graph arrays are fine — they enter as kernel operands).
      saturation_percent / width: traced scalars (the slider values).
      emit_mono: also emit the output's channel mean as ``(nb, L)`` mono
        rows (the loudness downmix).  Returns ``(y, ym)``.
    """
    c, nb, L = xrows.shape
    if c > 2:
        raise ValueError("front kernel supports mono/stereo only")
    s = s_in_eq.shape[2]
    m = min(_SUP, nb)
    nbs = -(-nb // m)
    dt = xrows.dtype
    mix = (jnp.asarray(saturation_percent, dt) / 100.0) ** 2
    coefs = jnp.stack([mix, 1.0 + mix * 4.0,
                       jnp.asarray(width, dt), jnp.zeros((), dt)])[None, :]
    wt = w_eq.T.astype(dt)
    out_specs = pl.BlockSpec((c, m, L), lambda i: (0, i, 0))
    out_shape = jax.ShapeDtypeStruct((c, nbs * m, L), dt)
    if emit_mono:
        out_specs = [out_specs, pl.BlockSpec((m, L), lambda i: (i, 0))]
        out_shape = [out_shape, jax.ShapeDtypeStruct((nbs * m, L), dt)]
    out = pl.pallas_call(
        functools.partial(_front_kernel, emit_mono=emit_mono),
        grid=(nbs,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0)),
            pl.BlockSpec((c, m, L), lambda i: (0, i, 0)),
            pl.BlockSpec((L, L), lambda i: (0, 0)),
            pl.BlockSpec((s, L), lambda i: (0, 0)),
            pl.BlockSpec((c, m, s), lambda i: (0, i, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(coefs, xrows, t_eq.astype(dt), wt, s_in_eq)
    if emit_mono:
        return out[0][:, :nb], out[1][:nb]
    return out[:, :nb]


def front_chain_xla(xrows, s_in_eq, t_eq, w_eq, saturation_percent, width,
                    emit_mono: bool = False):
    """XLA mirror of :func:`front_chain` (same algebra, for CPU/tests)."""
    from python_audio_mastering_tpu.ops.stereo import stereo_width
    from python_audio_mastering_tpu.ops.waveshaper import saturate

    c, nb, L = xrows.shape
    xs = saturate(xrows, saturation_percent).reshape(c * nb, L)
    y = _DOT(xs, t_eq.astype(xrows.dtype)) + \
        _DOT(s_in_eq.reshape(c * nb, s_in_eq.shape[2]),
             w_eq.T.astype(xrows.dtype))
    y = stereo_width(y.reshape(c, nb, L), width, channel_axis=0)
    if emit_mono:
        return y, y.mean(axis=0)
    return y


def _cells_kernel(x_ref, t_ref, wt_ref, se_ref, bk_ref, out_ref):
    """K-weighted bucketed energies for one superblock.

    Recomputes the K-filtered signal block-locally from the tiny boundary
    states (``kx = x @ T + s_in @ Wᵀ`` — the blocked-IIR algebra), squares
    it in VMEM, and emits only the ``h``-bucket sums ``(C, M, L/h)``: the
    full-length K-weighted signal never touches HBM (the XLA rows path
    writes it out and reads it back — 2 extra full-signal passes).
    """
    c, m, L = x_ref.shape
    xall = x_ref[:, :, :].reshape(c * m, L)
    s_in = se_ref[:, :, :].reshape(c * m, se_ref.shape[2])
    kx = _DOT(xall, t_ref[:, :], preferred_element_type=xall.dtype) + \
        _DOT(s_in, wt_ref[:, :], preferred_element_type=xall.dtype)
    e = kx * kx
    out_ref[:, :, :] = _DOT(e, bk_ref[:, :],
                            preferred_element_type=e.dtype).reshape(
        c, m, bk_ref.shape[1])


def kweight_cells(xrows, s_in, t_kw, w_kw, hop, interpret: bool = False):
    """Hop-bucketed K-weighted energy sums ``(C, nb·L/hop)``.

    Args:
      xrows: ``(C, nb, L)`` rows-form signal (the loudness meter input —
        mono ``(1, nb, L)`` on the reference-parity chain).
      s_in: ``(C, nb, S)`` per-block incoming K-filter cascade states
        (``iir.sosfilt_states_rows`` on the same signal).
      t_kw / w_kw: the K-filter's ``T (L, L)`` / ``W (L, S)`` operators
        (from the states pass — float64-precomputed, accuracy-critical
        for the near-unit-circle K-weighting poles).
      hop: bucket width (``gcd(cell_len, L)`` — loudness cells are then
        exact sums of these buckets; see loudness.block_cell_energies_rows).

    Equals the XLA rows path's bucket sums to float roundoff (identical
    per-row contractions); exact equality in interpret mode.
    """
    from python_audio_mastering_tpu.ops.multiband import _bucket_matrix

    c, nb, L = xrows.shape
    if L % hop != 0:
        raise ValueError(f"hop {hop} must divide block size {L}")
    dt = xrows.dtype
    s = s_in.shape[2]
    m = min(_SUP, nb)
    nbs = -(-nb // m)
    lh = L // hop
    bucket = jnp.asarray(_bucket_matrix(L, hop), dt)
    out = pl.pallas_call(
        _cells_kernel,
        grid=(nbs,),
        in_specs=[
            pl.BlockSpec((c, m, L), lambda i: (0, i, 0)),
            pl.BlockSpec((L, L), lambda i: (0, 0)),
            pl.BlockSpec((s, L), lambda i: (0, 0)),
            pl.BlockSpec((c, m, s), lambda i: (0, i, 0)),
            pl.BlockSpec((L, lh), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c, m, lh), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, nbs * m, lh), dt),
        interpret=interpret,
    )(xrows, t_kw.astype(dt), w_kw.T.astype(dt), s_in, bucket)
    return out[:, :nb].reshape(c, nb * lh)


def _bands_from_states_xla(xrows, s_in_lp, s_in_hp, sos_lp, sos_hp):
    """XLA mirror of the kernels' band recompute: ``band = rows @ T +
    s_in @ Wᵀ`` — same operators, same contractions.  Used where the
    kernels cannot run (CPU tests, vmapped album paths)."""
    c, nb, L = xrows.shape
    rows = xrows.reshape(c * nb, L)
    out = []
    for sos, s_in in ((sos_lp, s_in_lp), (sos_hp, s_in_hp)):
        t_np, wt_np = _filter_ops_np(
            np.asarray(sos, np.float64).tobytes(), sos.shape[0], L)
        y = _DOT(rows, jnp.asarray(t_np, xrows.dtype)) + \
            _DOT(s_in.reshape(c * nb, s_in.shape[2]),
                 jnp.asarray(wt_np, xrows.dtype))
        out.append(y.reshape(c, nb, L))
    return tuple(out)


def band_energies_xla(xrows, s_in_lp, s_in_hp, sos_lp, sos_hp, hop=1):
    """XLA mirror of :func:`band_energies` (same values, bands DO
    materialize) — the fallback for paths the kernels can't serve."""
    from python_audio_mastering_tpu.ops.multiband import _bucket_matrix

    c, nb, L = xrows.shape
    low, high = _bands_from_states_xla(xrows, s_in_lp, s_in_hp,
                                       sos_lp, sos_hp)
    mid = xrows - low - high
    inv_c = 1.0 / c
    rows = []
    for sig in (low, mid, high):
        e = (sig * sig).sum(axis=0).reshape(nb, L)
        if hop > 1:
            e = _DOT(e, jnp.asarray(_bucket_matrix(L, hop), xrows.dtype))
        rows.append(e.reshape(-1) * inv_c)
    return jnp.stack(rows)


def band_gain_apply_xla(xrows, s_in_lp, s_in_hp, cols, sos_lp, sos_hp,
                        hop=1, emit_mono: bool = False):
    """XLA mirror of :func:`band_gain_apply` (same recombination)."""
    from python_audio_mastering_tpu.ops.multiband import _bucket_matrix

    c, nb, L = xrows.shape
    low, high = _bands_from_states_xla(xrows, s_in_lp, s_in_hp,
                                       sos_lp, sos_hp)
    lh = L // hop
    cols3 = cols.reshape(3, nb, lh)
    if hop > 1:
        up = jnp.asarray(np.ascontiguousarray(_bucket_matrix(L, hop).T),
                         xrows.dtype)
        g = _DOT(cols3.reshape(3 * nb, lh), up).reshape(3, nb, L)
    else:
        g = cols3
    y = (xrows * g[0][None] + low * g[1][None] + high * g[2][None])
    if emit_mono:
        return y, y.mean(axis=0)
    return y


def band_energies(xrows, s_in_lp, s_in_hp, sos_lp, sos_hp, hop=1,
                  interpret: bool = False):
    """Hop-bucketed channel-mean band energies ``(3, nb·L/hop)``.

    Equals the XLA fused detector's ``xb`` (``multiband`` low/mid/high x²
    bucket sums) to float roundoff; the band signals exist only in VMEM.

    Args:
      xrows: ``(C, nb, L)`` rows-form signal.
      s_in_lp / s_in_hp: ``(C, nb, S)`` per-block incoming cascade states
        from :func:`~python_audio_mastering_tpu.ops.iir.sosfilt_states_multi_rows`.
      sos_lp / sos_hp: concrete ``(K, 6)`` crossover coefficients.
    """
    c, nb, L = xrows.shape
    if hop > 1 and L % hop != 0:
        raise ValueError(f"hop {hop} must divide block size {L}")
    tcat, wt, bucket = _kernel_operands(sos_lp, sos_hp, L, hop, xrows.dtype)
    s = s_in_lp.shape[2]
    m = min(_SUP, nb)
    nbs = -(-nb // m)
    lh = L // hop

    kern = functools.partial(_energies_kernel, inv_c=1.0 / c)
    in_specs = [
        pl.BlockSpec((c, m, L), lambda i: (0, i, 0)),
        pl.BlockSpec((L, 2 * L), lambda i: (0, 0)),
        pl.BlockSpec((2, s, L), lambda i: (0, 0, 0)),
        pl.BlockSpec((c, m, s), lambda i: (0, i, 0)),
        pl.BlockSpec((c, m, s), lambda i: (0, i, 0)),
    ]
    args = [xrows, tcat, wt, s_in_lp, s_in_hp]
    if bucket is not None:
        in_specs.append(pl.BlockSpec((L, lh), lambda i: (0, 0)))
        args.append(bucket)
    out = pl.pallas_call(
        kern,
        grid=(nbs,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, m, lh), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((3, nbs * m, lh), xrows.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :nb].reshape(3, nb * lh)


def band_gain_apply(xrows, s_in_lp, s_in_hp, cols, sos_lp, sos_hp, hop=1,
                    emit_mono: bool = False, interpret: bool = False):
    """Recombine with control-rate gain deltas: ``y = x·gm + low·dl +
    high·dh`` over rows form, one signal read + one write.

    Args:
      cols: ``(3, T)`` control-rate columns ``(g_mid, g_low−g_mid,
        g_high−g_mid)``, ``T = nb·L/hop``.
      emit_mono: also emit the channel-mean of ``y`` as ``(nb, L)`` mono
        rows — the loudness meter's downmix, folded into this pass so the
        meter never re-reads the full output.  Returns ``(y, ym)``.
    """
    c, nb, L = xrows.shape
    if hop > 1 and L % hop != 0:
        raise ValueError(f"hop {hop} must divide block size {L}")
    tcat, wt, bucket = _kernel_operands(sos_lp, sos_hp, L, hop, xrows.dtype)
    s = s_in_lp.shape[2]
    m = min(_SUP, nb)
    nbs = -(-nb // m)
    lh = L // hop
    cols = cols.reshape(3, nb, lh)

    kern = functools.partial(_gain_apply_kernel, emit_mono=emit_mono)
    in_specs = [
        pl.BlockSpec((c, m, L), lambda i: (0, i, 0)),
        pl.BlockSpec((L, 2 * L), lambda i: (0, 0)),
        pl.BlockSpec((2, s, L), lambda i: (0, 0, 0)),
        pl.BlockSpec((c, m, s), lambda i: (0, i, 0)),
        pl.BlockSpec((c, m, s), lambda i: (0, i, 0)),
        pl.BlockSpec((3, m, lh), lambda i: (0, i, 0)),
    ]
    args = [xrows, tcat, wt, s_in_lp, s_in_hp, cols]
    if hop > 1:
        from python_audio_mastering_tpu.ops.multiband import _bucket_matrix

        up = jnp.asarray(np.ascontiguousarray(_bucket_matrix(L, hop).T),
                         xrows.dtype)
        in_specs.append(pl.BlockSpec((lh, L), lambda i: (0, 0)))
        args.append(up)
    out_specs = pl.BlockSpec((c, m, L), lambda i: (0, i, 0))
    out_shape = jax.ShapeDtypeStruct((c, nbs * m, L), xrows.dtype)
    if emit_mono:
        out_specs = [out_specs, pl.BlockSpec((m, L), lambda i: (i, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((nbs * m, L), xrows.dtype)]
    out = pl.pallas_call(
        kern,
        grid=(nbs,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if emit_mono:
        return out[0][:, :nb], out[1][:nb]
    return out[:, :nb]
