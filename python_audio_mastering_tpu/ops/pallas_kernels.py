"""Pallas TPU kernels for the ops XLA handles poorly.

The one hot op left after the MXU-blocked IIR and the gather-free detector
is the compressor *ballistics* recurrence — a strictly sequential scalar
state machine per band.  `lax.scan` pays ~10-20 µs per step in dispatch and
dynamic-slice overhead; the block-parallel version trades accuracy for
depth.  :func:`ballistics_pallas` instead runs the WHOLE recurrence exactly
in one kernel: stats live in VMEM laid out ``(bands_padded=8, T)`` (sublane
-major so each control step is one lane column), the time axis is tiled
over a sequential grid with the attenuation carry held in VMEM scratch
across grid steps, and the inner ``fori_loop`` is pure VPU work.

Numerically identical to ``ops.compressor.attenuation_scan`` (tested in
interpret mode on CPU and compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ballistics_pallas", "available"]

_SUBLANES = 8  # float32 sublane count; bands are padded up to this


def available() -> bool:
    return jax.default_backend() in ("tpu", "axon")


_LANES = 128


def _kernel(m_ref, ab_ref, inc_ref, dec_ref, att0_ref, out_ref, final_ref,
            carry_ref, *, tile: int):
    """Sequential ballistics over one (SUBLANES, tile) block.

    Mosaic has no cheap dynamic lane indexing, so the time axis is walked
    128 lanes at a time: each macro step loads one vreg-sized (8, 128) tile
    per stat, and the inner loop consumes lane 0 / emits lane 127 while
    rotating the tiles with ``pltpu.roll`` — every slice index static, all
    state in vector registers.
    """
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        carry_ref[:, :] = att0_ref[:, :]

    def macro(k, att):
        base = pl.multiple_of(k * _LANES, _LANES)
        mv = m_ref[:, pl.ds(base, _LANES)]
        abv = ab_ref[:, pl.ds(base, _LANES)]
        iv = inc_ref[:, pl.ds(base, _LANES)]
        dv = dec_ref[:, pl.ds(base, _LANES)]
        outs = jnp.zeros((m_ref.shape[0], _LANES), m_ref.dtype)

        def inner(_, c):
            att, mv, abv, iv, dv, outs = c
            m0 = mv[:, 0:1]
            ab0 = abv[:, 0:1]
            i0 = iv[:, 0:1]
            d0 = dv[:, 0:1]
            attack = jnp.minimum(att + i0, m0)
            release = jnp.maximum(att - d0, 0.0)
            new = jnp.where((ab0 > 0.0) & (att <= m0), attack, release)
            outs = jnp.concatenate(
                [pltpu.roll(outs, _LANES - 1, axis=1)[:, :_LANES - 1], new], axis=1)
            return (new, pltpu.roll(mv, _LANES - 1, axis=1),
                    pltpu.roll(abv, _LANES - 1, axis=1), pltpu.roll(iv, _LANES - 1, axis=1),
                    pltpu.roll(dv, _LANES - 1, axis=1), outs)

        att, _, _, _, _, outs = jax.lax.fori_loop(
            0, _LANES, inner, (att, mv, abv, iv, dv, outs))
        out_ref[:, pl.ds(base, _LANES)] = outs
        return att

    att = jax.lax.fori_loop(0, tile // _LANES, macro, carry_ref[:, :])
    carry_ref[:, :] = att

    @pl.when(step == n_steps - 1)
    def _():
        final_ref[:, :] = att


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _run(m, ab, inc, dec, att0, tile, interpret):
    bp, t = m.shape  # (SUBLANES, T_padded), T_padded % tile == 0
    grid = (t // tile,)
    spec = pl.BlockSpec((bp, tile), lambda i: (0, i))
    out, final = pl.pallas_call(
        functools.partial(_kernel, tile=tile),
        grid=grid,
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((bp, 1), lambda i: (0, 0))],
        out_specs=[spec, pl.BlockSpec((bp, 1), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((bp, t), m.dtype),
                   jax.ShapeDtypeStruct((bp, 1), m.dtype)],
        scratch_shapes=[pltpu.VMEM((bp, 1), m.dtype)],
        interpret=interpret,
    )(m, ab, inc, dec, att0)
    return out, final


def ballistics_pallas(stats, att0=None, tile: int = 4096, interpret: bool = False):
    """Exact sequential ballistics as ONE Pallas kernel.

    ``stats``: dict of ``(T, B)`` arrays (``max_att``, ``above``, ``inc``,
    ``dec``) with B ≤ 8 bands.  Returns ``(att (T, B), att_final (B,))`` —
    the same contract as ``attenuation_scan``.
    """
    m = stats["max_att"]
    squeeze = m.ndim == 1
    if squeeze:
        stats = {k: v[:, None] for k, v in stats.items()}
        m = stats["max_att"]
    t, b = m.shape
    if b > _SUBLANES:
        raise ValueError(f"at most {_SUBLANES} bands, got {b}")
    dt = m.dtype
    if att0 is None:
        att0 = jnp.zeros((b,), dt)

    tile = max(_LANES, min(tile, -(-t // _LANES) * _LANES))
    tile = -(-tile // _LANES) * _LANES
    t_pad = -(-t // tile) * tile

    def prep(a, fill=0.0):
        a = a.astype(dt)
        a = jnp.pad(a, ((0, t_pad - t), (0, _SUBLANES - b)),
                    constant_values=fill)
        return a.T  # (SUBLANES, T_pad), band-per-sublane

    m_p = prep(stats["max_att"])
    ab_p = prep(stats["above"].astype(dt))
    inc_p = prep(stats["inc"])
    dec_p = prep(stats["dec"])
    att0_p = jnp.pad(att0.astype(dt), (0, _SUBLANES - b))[:, None]

    out, final = _run(m_p, ab_p, inc_p, dec_p, att0_p, tile, interpret)
    att = out.T[:t, :b]
    att_f = final[:b, 0]
    if squeeze:
        att = att[:, 0]
        att_f = att_f[0]
    return att, att_f
