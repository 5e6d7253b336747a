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

__all__ = ["ballistics_pallas", "ballistics_pallas_rates",
           "ballistics_pallas_rates_bt", "available"]

_SUBLANES = 8   # float32 sublane count; bands are padded up to this
_LANES = 128


def available() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _bnd_kernel(m_ref, ca_ref, cr_ref, att0_ref, bnd_ref, carry_ref,
                *, tile: int):
    """Pass 1: sequential boundary pass.

    Runs the exact recurrence over the whole timeline but EMITS ONLY the
    attenuation at each 128-step block boundary (collected with one
    shift-concat per block).  Keeping the hot loop free of per-step output
    collection keeps live vector registers under Mosaic's spill cliff —
    measured ~8× faster than any per-step collection scheme.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[:, :] = att0_ref[:, :]

    ca = ca_ref[:, :]  # (SUBLANES, 1) per-band attack rate factor
    cr = cr_ref[:, :]  # (SUBLANES, 1) per-band release rate factor
    sub = m_ref.shape[0]

    def macro(k, carry):
        att, bnd = carry
        base = pl.multiple_of(k * _LANES, _LANES)
        mv = m_ref[:, pl.ds(base, _LANES)]
        # inc/dec vectors precomputed per block (full-register muls): a
        # per-step multiply with a lane-extracted operand is ~60 cycles on
        # Mosaic, while extract-feeding add/min/compare is ~free
        iv = mv * ca
        dv = mv * cr
        for j in range(_LANES):  # static unroll: static lane slices only
            m0 = mv[:, j: j + 1]
            # the (m0 > 0) test of the contract is redundant: when m0 == 0,
            # att <= m0 iff att == 0, and both branches then yield att
            attack = jnp.minimum(att + iv[:, j: j + 1], m0)
            release = jnp.maximum(att - dv[:, j: j + 1], 0.0)
            att = jnp.where(att <= m0, attack, release)
        bnd = jnp.concatenate([bnd[:, 1:], att], axis=1)
        return att, bnd

    bnd0 = jnp.zeros((sub, _LANES), m_ref.dtype)
    att, bnd = jax.lax.fori_loop(0, tile // _LANES, macro,
                                 (carry_ref[:, :], bnd0))
    carry_ref[:, :] = att
    bnd_ref[:, :] = bnd


def _replay_kernel(mt_ref, ca_ref, cr_ref, att0_ref, out_ref):
    """Pass 2: lane-parallel replay.

    One grid step replays 128 independent blocks (lanes) × 128 time steps
    from their exact pass-1 incoming states.  Every op is a full-register
    (8, 128) op on a contiguous leading-dim slice — no lane extraction at
    all — so each sequential step advances 128 blocks at once (the
    timeline's sequential depth drops from T to T/128).  Bitwise identical
    to the monolithic scan: same op sequence per position, exact incoming
    states.
    """
    ca = ca_ref[:, :]
    cr = cr_ref[:, :]

    def body(j, att):
        m_j = mt_ref[j]
        attack = jnp.minimum(att + m_j * ca, m_j)
        release = jnp.maximum(att - m_j * cr, 0.0)
        att = jnp.where(att <= m_j, attack, release)
        out_ref[j] = att
        return att

    jax.lax.fori_loop(0, _LANES, body, att0_ref[0])


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _run(m, ca, cr, att0, tile, interpret):
    bp, t = m.shape  # (SUBLANES, T_padded), T_padded % (128*128) == 0
    blk = _LANES                    # control steps per block
    nb = t // blk                   # blocks (pass-2 lanes)
    nt = nb // _LANES               # pass-2 grid tiles (128 blocks each)
    grid1 = (t // tile,)

    # ---- pass 1: boundary states, sequential grid with VMEM carry ----
    bnd = pl.pallas_call(
        functools.partial(_bnd_kernel, tile=tile),
        grid=grid1,
        in_specs=[pl.BlockSpec((bp, tile), lambda i: (0, i)),
                  pl.BlockSpec((bp, 1), lambda i: (0, 0)),
                  pl.BlockSpec((bp, 1), lambda i: (0, 0)),
                  pl.BlockSpec((bp, 1), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bp, tile // blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((bp, nb), m.dtype),
        scratch_shapes=[pltpu.VMEM((bp, 1), m.dtype)],
        interpret=interpret,
    )(m, ca, cr, att0)
    final = bnd[:, -1:]

    # incoming state per block: att0 for block 0, else previous boundary
    att0_blocks = jnp.concatenate([att0, bnd[:, :-1]], axis=1)  # (bp, nb)

    # ---- layout: time-major per block so pass 2 reads full registers ----
    # mt[ti*blk + j, s, l] = m[s, (ti*128 + l)*blk + j]
    mt = m.reshape(bp, nt, _LANES, blk).transpose(1, 3, 0, 2) \
          .reshape(nt * blk, bp, _LANES)
    a0 = att0_blocks.reshape(bp, nt, _LANES).transpose(1, 0, 2)  # (nt,bp,128)

    out2 = pl.pallas_call(
        _replay_kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec((blk, bp, _LANES), lambda i: (i, 0, 0)),
                  pl.BlockSpec((bp, 1), lambda i: (0, 0)),
                  pl.BlockSpec((bp, 1), lambda i: (0, 0)),
                  pl.BlockSpec((1, bp, _LANES), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((blk, bp, _LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt * blk, bp, _LANES), m.dtype),
        interpret=interpret,
    )(mt, ca, cr, a0)

    out = out2.reshape(nt, blk, bp, _LANES).transpose(2, 0, 3, 1) \
              .reshape(bp, t)
    return out, final


def ballistics_pallas_rates_bt(max_att_bt, attack_rate, release_rate,
                               att0=None, interpret: bool = False):
    """Band-major ``(B, T)`` twin of :func:`ballistics_pallas_rates`.

    The kernel's native layout is band-major already (bands on sublanes,
    time on lanes) — the ``(T, B)`` wrapper pays a full-length transpose
    copy each way (measured 32 MB per leg on a 3-min hop-8 track).  Control
    pipelines that keep stats band-major (the fused Pallas multiband) call
    this directly.  Returns ``(att (B, T), att_final (B,))``.
    """
    m = max_att_bt
    b, t = m.shape
    if b > _SUBLANES:
        raise ValueError(f"at most {_SUBLANES} bands, got {b}")
    dt = m.dtype
    if att0 is None:
        att0 = jnp.zeros((b,), dt)
    quantum = _LANES * _LANES
    t_pad = -(-t // quantum) * quantum
    m_p = jnp.pad(m.astype(dt), ((0, _SUBLANES - b), (0, t_pad - t)))
    ca_p = jnp.pad(jnp.asarray(attack_rate, dt), (0, _SUBLANES - b))[:, None]
    cr_p = jnp.pad(jnp.asarray(release_rate, dt), (0, _SUBLANES - b))[:, None]
    att0_p = jnp.pad(jnp.asarray(att0, dt), (0, _SUBLANES - b))[:, None]
    out, final = _run(m_p, ca_p, cr_p, att0_p, quantum, interpret)
    return out[:b, :t], final[:b, 0]


def ballistics_pallas_rates(max_att, attack_rate, release_rate, att0=None,
                            tile: int = 16384, interpret: bool = False):
    """Exact sequential ballistics as a two-pass Pallas pipeline
    (boundary pass + lane-parallel replay — see the kernel docstrings).

    Args:
      max_att: ``(T, B)`` (or ``(T,)``) per-control-step attenuation targets
        (dB ≥ 0; 0 ⇔ below threshold).
      attack_rate / release_rate: ``(B,)`` per-band per-step rate factors
        (``hop/attack_frames`` and ``hop/release_frames``).
    Returns ``(att (T, B), att_final (B,))`` — the ``attenuation_scan``
    contract.  T is padded internally to a multiple of 128² (zero targets
    freeze the state, so padding is inert; the pass-1 tile is pinned to
    that quantum — its rolling boundary accumulator is 128 wide).
    """
    m = max_att
    squeeze = m.ndim == 1
    if squeeze:
        m = m[:, None]
    att, att_f = ballistics_pallas_rates_bt(m.T, attack_rate, release_rate,
                                            att0=att0, interpret=interpret)
    att = att.T
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
