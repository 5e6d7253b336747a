"""Pallas TPU kernels for the ops XLA handles poorly.

The one hot op left after the MXU-blocked IIR and the gather-free detector
is the compressor *ballistics* recurrence — a strictly sequential scalar
state machine per band (``lax.scan`` pays ~10-20 µs per step in dispatch
overhead; the block-parallel version trades accuracy for depth).

Key structural fact (from the pydub contract, see ops/compressor.py): the
per-step inputs collapse to ONE array.  ``above ⇔ max_att > 0`` (both mean
rms > threshold) and ``inc``/``dec`` are ``max_att`` times constant
per-band rate factors.  So the kernel streams a single ``(bands, T)`` array
through VMEM: time is tiled over a *sequential* grid with the attenuation
carry held in VMEM scratch across grid steps; inside a tile the kernel
walks 128 control steps per vector register with a *fully unrolled* static
loop (Mosaic has no cheap dynamic lane indexing — every slice index stays
static; static unrolling keeps the per-step critical path at just the
5-op ballistics update, ~4x faster than the earlier register-rotation
scheme that paid two ``pltpu.roll`` shuffles per step).

Numerically identical to ``ops.compressor.attenuation_scan`` (tested in
interpret mode on CPU and compiled on TPU).  Not differentiable (no VJP);
gradient paths (models/automaster.py) use the scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ballistics_pallas", "ballistics_pallas_rates", "available"]

_SUBLANES = 8   # float32 sublane count; bands are padded up to this
_LANES = 128


def available() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _kernel(m_ref, ca_ref, cr_ref, att0_ref, out_ref, final_ref, carry_ref,
            *, tile: int):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        carry_ref[:, :] = att0_ref[:, :]

    ca = ca_ref[:, :]  # (SUBLANES, 1) per-band attack rate factor
    cr = cr_ref[:, :]  # (SUBLANES, 1) per-band release rate factor

    lanes = jax.lax.broadcasted_iota(jnp.int32, (m_ref.shape[0], _LANES), 1)

    def macro(k, att):
        base = pl.multiple_of(k * _LANES, _LANES)
        mv = m_ref[:, pl.ds(base, _LANES)]
        # inc/dec vectors precomputed per 128-step block: the per-step
        # extracts are att-independent, so the scheduler hides them in the
        # recurrence's stall slots
        iv = mv * ca
        dv = mv * cr
        outs = jnp.zeros((m_ref.shape[0], _LANES), m_ref.dtype)
        for j in range(_LANES):  # static unroll: static lane slices only
            m0 = mv[:, j: j + 1]
            # the (m0 > 0) test of the contract is redundant: when m0 == 0,
            # att <= m0 iff att == 0, and both branches then yield att
            attack = jnp.minimum(att + iv[:, j: j + 1], m0)
            release = jnp.maximum(att - dv[:, j: j + 1], 0.0)
            att = jnp.where(att <= m0, attack, release)
            # place att in lane j via a constant one-hot select (linear
            # cost — concatenate/roll collection is quadratic in Mosaic;
            # the depth-3 cmp/add+min/select chain is the latency floor)
            outs = jnp.where(lanes == j, att, outs)
        out_ref[:, pl.ds(base, _LANES)] = outs
        return att

    att = jax.lax.fori_loop(0, tile // _LANES, macro, carry_ref[:, :])
    carry_ref[:, :] = att

    @pl.when(step == n_steps - 1)
    def _():
        final_ref[:, :] = att


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _run(m, ca, cr, att0, tile, interpret):
    bp, t = m.shape  # (SUBLANES, T_padded), T_padded % tile == 0
    grid = (t // tile,)
    spec = pl.BlockSpec((bp, tile), lambda i: (0, i))
    one = pl.BlockSpec((bp, 1), lambda i: (0, 0))
    out, final = pl.pallas_call(
        functools.partial(_kernel, tile=tile),
        grid=grid,
        in_specs=[spec, one, one, one],
        out_specs=[spec, one],
        out_shape=[jax.ShapeDtypeStruct((bp, t), m.dtype),
                   jax.ShapeDtypeStruct((bp, 1), m.dtype)],
        scratch_shapes=[pltpu.VMEM((bp, 1), m.dtype)],
        interpret=interpret,
    )(m, ca, cr, att0)
    return out, final


def ballistics_pallas_rates(max_att, attack_rate, release_rate, att0=None,
                            tile: int = 8192, interpret: bool = False):
    """Exact sequential ballistics as ONE Pallas kernel.

    Args:
      max_att: ``(T, B)`` (or ``(T,)``) per-control-step attenuation targets
        (dB ≥ 0; 0 ⇔ below threshold).
      attack_rate / release_rate: ``(B,)`` per-band per-step rate factors
        (``hop/attack_frames`` and ``hop/release_frames``).
    Returns ``(att (T, B), att_final (B,))`` — the ``attenuation_scan``
    contract.
    """
    m = max_att
    squeeze = m.ndim == 1
    if squeeze:
        m = m[:, None]
    t, b = m.shape
    if b > _SUBLANES:
        raise ValueError(f"at most {_SUBLANES} bands, got {b}")
    dt = m.dtype
    if att0 is None:
        att0 = jnp.zeros((b,), dt)

    tile = max(_LANES, min(tile, -(-t // _LANES) * _LANES))
    tile = -(-tile // _LANES) * _LANES
    t_pad = -(-t // tile) * tile

    m_p = jnp.pad(m.astype(dt), ((0, t_pad - t), (0, _SUBLANES - b))).T
    ca_p = jnp.pad(jnp.asarray(attack_rate, dt), (0, _SUBLANES - b))[:, None]
    cr_p = jnp.pad(jnp.asarray(release_rate, dt), (0, _SUBLANES - b))[:, None]
    att0_p = jnp.pad(jnp.asarray(att0, dt), (0, _SUBLANES - b))[:, None]

    out, final = _run(m_p, ca_p, cr_p, att0_p, tile, interpret)
    att = out.T[:t, :b]
    att_f = final[:b, 0]
    if squeeze:
        att = att[:, 0]
        att_f = att_f[0]
    return att, att_f


def ballistics_pallas(stats, att0=None, tile: int = 8192,
                      interpret: bool = False):
    """``attenuation_scan``-compatible wrapper over the rate-factor kernel.

    Derives the constant per-band rates from the stats arrays (valid by
    construction: ``inc = m * hop/attack_frames``, ``dec = m *
    hop/release_frames`` — see ``detector_stats``).
    """
    m = stats["max_att"]
    squeeze = m.ndim == 1
    if squeeze:
        m = m[:, None]
    eps = jnp.asarray(1e-30, m.dtype)
    inc = stats["inc"].reshape(m.shape)
    dec = stats["dec"].reshape(m.shape)
    # rate = sum(inc)/sum(m): exact since inc/m is constant where m > 0
    denom = jnp.maximum(m.sum(axis=0), eps)
    ca = inc.sum(axis=0) / denom
    cr = dec.sum(axis=0) / denom
    att0_v = None if att0 is None else (jnp.atleast_1d(att0))
    att, att_f = ballistics_pallas_rates(m, ca, cr, att0_v, tile=tile,
                                         interpret=interpret)
    if squeeze:
        return att[:, 0] if att.ndim == 2 else att, att_f
    return att, att_f
