"""ITU-R BS.1770-4 loudness: K-weighting, gated integrated LUFS, streaming.

Replaces the reference's ``pyloudnorm`` dependency (engine:212-222) with a
native, jit-compatible implementation:

* K-weighting = high shelf + high pass biquads whose tan-based parametric
  designs reproduce the BS.1770-4 48 kHz coefficient tables to machine
  precision and generalize to any sample rate (see ``ops.biquad``).
* 400 ms gating blocks with 75 % overlap, computed from 100 ms "cell" sums
  (the 4-cell decomposition keeps float32 accumulation exact-enough and is
  cheaply streamable — no full-file second pass needed).
* −70 LUFS absolute gate + −10 LU relative gate as *masked reductions*
  (static shapes, so gating lives inside the fused jit graph).

Two downmix modes:
* ``"reference_mono_mean"`` — measure the plain mean of channels as one mono
  signal.  This replicates the reference's (non-spec) behaviour
  (engine:214-218) and is the chain default for output parity.
* ``"bs1770"`` — per-channel energies with spec channel weights
  (G = 1, 1, 1, 1.41, 1.41) summed before log — the correct meter.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from python_audio_mastering_tpu.ops.biquad import deman_high_pass_sos, deman_high_shelf_sos
from python_audio_mastering_tpu.ops import iir

__all__ = [
    "kweight_sos",
    "integrated_loudness",
    "integrated_loudness_cm",
    "integrated_loudness_rows",
    "normalize_to_lufs",
    "block_cell_energies",
    "block_cell_energies_cm",
    "block_cell_energies_rows",
    "loudness_from_cells",
    "BlockEnergyAccumulator",
]

_ABS_GATE_LUFS = -70.0
_REL_GATE_LU = -10.0
_LOUDNESS_OFFSET = -0.691


def kweight_sos(sample_rate):
    """The 2-section K-weighting prefilter cascade, float64 numpy ``(2, 6)``."""
    return np.concatenate(
        [deman_high_shelf_sos(sample_rate), deman_high_pass_sos(sample_rate)], axis=0
    )


def channel_weights(num_channels, dtype=jnp.float32):
    """BS.1770 channel weights: L, R, C get 1.0; Ls, Rs get 1.41."""
    g = np.ones(num_channels)
    if num_channels >= 4:
        g[3:5] = 1.41
    return jnp.asarray(g, dtype=dtype)


def _gating_geometry(sample_rate):
    """(cell_len, cells_per_block) for 400 ms blocks at 75 % overlap.

    BS.1770: block T_g = 400 ms, stride = 100 ms, so each gating block is
    exactly 4 consecutive 100 ms cells whenever round(0.4*fs) == 4*round(0.1*fs)
    (true for every standard audio rate).
    """
    win = int(round(0.4 * sample_rate))
    cell = int(round(0.1 * sample_rate))
    if win != 4 * cell:  # pragma: no cover - exotic rates
        cell = win // 4
    return cell, 4


def block_cell_energies(x, sample_rate, zi=None, filter_method="auto"):
    """K-weight ``x`` and return per-cell mean-square energies.

    Args:
      x: ``(N, C)`` (or ``(N,)``) audio.
      zi: optional carried K-filter state (for streaming; shape as in
        :func:`~python_audio_mastering_tpu.ops.iir.sosfilt_scan`).

    Returns:
      ``(cell_ms, zf)`` where ``cell_ms`` is ``(num_cells, C)`` mean-square
      energy per 100 ms cell (trailing partial cell dropped, as the spec's
      complete-blocks-only rule requires).
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    cell, _ = _gating_geometry(sample_rate)
    # pass float64 numpy coefficients: static-SOS blocked execution then
    # precomputes its operators in float64 host-side (accuracy-critical for
    # the near-unit-circle K-weighting poles in float32 runs)
    kx, zf = iir.sosfilt(kweight_sos(sample_rate), x, zi=zi, method=filter_method)
    n_cells = x.shape[0] // cell
    z = kx[: n_cells * cell] ** 2
    cell_ms = z.reshape(n_cells, cell, x.shape[1]).mean(axis=1)
    return cell_ms, zf


def block_cell_energies_cm(xT, sample_rate, zi=None, valid_frames=None):
    """Channel-major :func:`block_cell_energies`: ``xT`` is ``(C, N)``.

    The K-filter runs in the folded-rows blocked form
    (:func:`~python_audio_mastering_tpu.ops.iir.sosfilt_blocked_cm`) and the
    cell reduction happens along the minor (time) axis — no transposes, no
    batched-dot layout copies.  ``valid_frames`` marks trailing padded
    samples; cells extending past it are dropped via the returned mask.

    Returns ``(cell_ms (num_cells, C), cell_mask or None, zf)``.
    """
    cell, _ = _gating_geometry(sample_rate)
    n = xT.shape[1]
    if n >= 4 * 512:
        kx, zf = iir.sosfilt_blocked_cm(kweight_sos(sample_rate), xT, zi=zi)
    else:
        y, zf = iir.sosfilt_scan(
            jnp.asarray(kweight_sos(sample_rate), xT.dtype), xT.T, zi=zi)
        kx = y.T
    n_cells = n // cell
    z = kx[:, : n_cells * cell] ** 2
    cell_ms = z.reshape(xT.shape[0], n_cells, cell).mean(axis=2).T
    cell_mask = None
    if valid_frames is not None:
        cell_mask = jnp.arange(n_cells) < (valid_frames // cell)
    return cell_ms, cell_mask, zf


def block_cell_energies_rows(xrows, sample_rate, zi=None, valid_frames=None,
                             return_state=False, kernel="auto"):
    """Rows-form :func:`block_cell_energies`: ``xrows`` is ``(C, nb, L)``.

    The K-filter runs in the rows-resident blocked form (zero layout-change
    copies — see ``ops.iir.sosfilt_blocked_rows``) and the 100 ms cell sums
    are computed WITHOUT unfolding the rows: ``kx²`` is bucket-summed along
    the lane axis by one MXU dot at hop ``h = gcd(cell, L)`` (64 at 48 kHz,
    2 at 44.1 kHz), and cells — whose length is a multiple of ``h`` — are
    then exact sums of the ``h``-buckets.  This replaces the
    ``(C, N) → (C, n_cells, cell)`` reshape of the channel-major path,
    whose 4410-minor tiling forced a full-signal relayout copy.

    ``kernel``: "auto" fuses the K-filter recompute + square + bucket dot
    into ONE Pallas pass on TPU (``ops.pallas_multiband.kweight_cells``:
    the K-weighted signal lives only in VMEM — the XLA body writes it to
    HBM and reads it back); "xla" forces the XLA body; "pallas" /
    "pallas_interpret" force the kernel (interpret for CPU tests).  Same
    gate as the multiband kernels (``ChainConfig.mb_kernel``).

    ``zi``/``return_state``: carried K-filter state for chunked streaming
    (chunk lengths are cell multiples there, so cells concatenate exactly).

    Returns ``(cell_ms (num_cells, C), cell_mask or None, zf)``.
    """
    import math

    c, nb, L = xrows.shape
    n = nb * L
    cell, _ = _gating_geometry(sample_rate)
    h = math.gcd(cell, L)
    n_cells = n // cell

    interpret = kernel == "pallas_interpret"
    use_kernel = False
    if h > 1 and kernel != "xla":
        from python_audio_mastering_tpu.ops import pallas_multiband as pmb

        use_kernel = (interpret or kernel == "pallas"
                      or (kernel == "auto" and pmb.available()
                          and xrows.dtype == jnp.float32))
    if use_kernel:
        # tiny states pass (control-rate boundary recurrence) + one fused
        # kernel pass: read the signal once, emit only the bucket sums
        s_in, zf, ops = iir.sosfilt_states_rows(
            kweight_sos(sample_rate), xrows, zi=zi,
            return_state=return_state)
        buck = pmb.kweight_cells(xrows, s_in, ops[0], ops[2], h,
                                 interpret=interpret)  # (C, n//h)
        per_cell = cell // h
        cells = buck[:, : n_cells * per_cell]
        cell_ms = cells.reshape(c, n_cells, per_cell).sum(axis=2).T / cell
    else:
        kx, zf = iir.sosfilt_blocked_rows(kweight_sos(sample_rate), xrows,
                                          zi=zi, return_state=return_state)
        if h > 1:
            ones = jnp.asarray(np.kron(np.eye(L // h), np.ones((h, 1))),
                               xrows.dtype)  # (L, L//h) bucket matrix
            z2 = (kx * kx).reshape(c * nb, L)
            buck = jax.lax.dot_general(
                z2, ones, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)  # (C·nb, L//h)
            per_cell = cell // h
            cells = buck.reshape(c, n // h)[:, : n_cells * per_cell]
            cell_ms = cells.reshape(c, n_cells, per_cell).sum(axis=2).T / cell
        else:  # pragma: no cover - no common divisor (exotic rate/block)
            z = kx.reshape(c, n)[:, : n_cells * cell] ** 2
            cell_ms = z.reshape(c, n_cells, cell).mean(axis=2).T
    cell_mask = None
    if valid_frames is not None:
        cell_mask = jnp.arange(n_cells) < (valid_frames // cell)
    return cell_ms, cell_mask, zf


def integrated_loudness_rows(xrows, sample_rate, downmix="bs1770",
                             valid_frames=None, kernel="auto"):
    """Rows-form :func:`integrated_loudness` (``xrows`` is ``(C, nb, L)``)."""
    if downmix == "reference_mono_mean":
        xrows = xrows.mean(axis=0, keepdims=True)
    cell_ms, cell_mask, _ = block_cell_energies_rows(
        xrows, sample_rate, valid_frames=valid_frames, kernel=kernel)
    return loudness_from_cells(cell_ms, cell_mask=cell_mask)


def integrated_loudness_cm(xT, sample_rate, downmix="bs1770",
                           valid_frames=None):
    """Channel-major :func:`integrated_loudness` (``xT`` is ``(C, N)``)."""
    if xT.ndim == 2 and downmix == "reference_mono_mean":
        xT = xT.mean(axis=0, keepdims=True)
    cell_ms, cell_mask, _ = block_cell_energies_cm(
        xT, sample_rate, valid_frames=valid_frames)
    return loudness_from_cells(cell_ms, cell_mask=cell_mask)


def loudness_from_cells(cell_ms, weights=None, cell_mask=None):
    """Gated integrated loudness from 100 ms cell energies.

    ``cell_ms``: ``(num_cells, C)``.  ``cell_mask``: optional ``(num_cells,)``
    validity mask (for padded streaming tails).  Returns LUFS scalar
    (−inf if no gating block survives, matching pyloudnorm's contract).
    """
    n_cells, c = cell_ms.shape
    if weights is None:
        weights = channel_weights(c, dtype=cell_ms.dtype)
    if cell_mask is None:
        cell_mask = jnp.ones((n_cells,), dtype=bool)

    # 400 ms blocks = mean of 4 consecutive cells; block valid iff all cells are.
    if n_cells < 4:
        return jnp.asarray(-jnp.inf, dtype=cell_ms.dtype)
    block_ms = (cell_ms[:-3] + cell_ms[1:-2] + cell_ms[2:-1] + cell_ms[3:]) / 4.0
    block_ok = cell_mask[:-3] & cell_mask[1:-2] & cell_mask[2:-1] & cell_mask[3:]

    eps = jnp.asarray(np.finfo(np.float32).tiny, dtype=cell_ms.dtype)
    wsum = block_ms @ weights  # (B,) weighted mean-square per block
    l_blocks = _LOUDNESS_OFFSET + 10.0 * jnp.log10(jnp.maximum(wsum, eps))

    def masked_mean(values, mask):
        cnt = jnp.sum(mask)
        s = jnp.sum(jnp.where(mask[:, None], values, 0.0), axis=0)
        return s / jnp.maximum(cnt, 1), cnt

    m_abs = block_ok & (l_blocks > _ABS_GATE_LUFS)
    ms_abs, cnt_abs = masked_mean(block_ms, m_abs)
    rel_gate = (_LOUDNESS_OFFSET + 10.0 * jnp.log10(jnp.maximum(ms_abs @ weights, eps))
                + _REL_GATE_LU)
    m_rel = m_abs & (l_blocks > rel_gate)
    ms_rel, cnt_rel = masked_mean(block_ms, m_rel)
    lufs = _LOUDNESS_OFFSET + 10.0 * jnp.log10(jnp.maximum(ms_rel @ weights, eps))
    return jnp.where(cnt_rel > 0, lufs, -jnp.inf)


def integrated_loudness(x, sample_rate, downmix="bs1770", filter_method="auto",
                        valid_frames=None):
    """Gated integrated loudness (LUFS) of ``x``.

    ``downmix="reference_mono_mean"`` measures ``mean(channels)`` as mono —
    the reference engine's behaviour (engine:215); ``"bs1770"`` is the
    spec-correct multichannel measurement.

    ``valid_frames`` (optional, traced OK): only cells fully inside the
    first ``valid_frames`` samples count — for zero-padded batched tracks,
    so the measure equals the unpadded track's (complete-blocks-only rule).
    """
    if x.ndim == 2 and downmix == "reference_mono_mean":
        x = x.mean(axis=1)
    cell_ms, _ = block_cell_energies(x, sample_rate, filter_method=filter_method)
    cell_mask = None
    if valid_frames is not None:
        cell = _gating_geometry(sample_rate)[0]
        cell_mask = jnp.arange(cell_ms.shape[0]) < (valid_frames // cell)
    return loudness_from_cells(cell_ms, cell_mask=cell_mask)


def normalize_to_lufs(x, sample_rate, target_lufs=-14.0, downmix="reference_mono_mean",
                      filter_method="auto", valid_frames=None,
                      channel_major=False):
    """Measure + linear gain to hit ``target_lufs`` (engine:212-222).

    Like the reference: single-pass gain, no re-measure, no clip guard (the
    chain's limiter follows).  Returns ``(y, measured_lufs, gain_linear)``.
    ``channel_major=True`` treats ``x`` as ``(C, N)``.
    """
    if channel_major:
        loudness = integrated_loudness_cm(x, sample_rate, downmix=downmix,
                                          valid_frames=valid_frames)
    else:
        loudness = integrated_loudness(x, sample_rate, downmix=downmix,
                                       filter_method=filter_method,
                                       valid_frames=valid_frames)
    gain = gain_for_target(loudness, target_lufs, x.dtype)
    return x * gain, loudness, gain


def gain_for_target(loudness, target_lufs, dtype):
    """Linear gain that moves ``loudness`` to ``target_lufs``.

    A silent/gated-out input measures −inf → infinite gain; pass through
    unchanged instead (the reference would blow up here, engine:220-222).
    """
    gain = 10.0 ** ((jnp.asarray(target_lufs, dtype=dtype) - loudness) / 20.0)
    return jnp.where(jnp.isfinite(loudness), gain, 1.0)


@dataclasses.dataclass
class BlockEnergyAccumulator:
    """Host-side streaming loudness state (see parallel/streaming.py).

    Accumulates per-cell energies chunk by chunk so integrated loudness
    needs no second pass over the audio.  Chunks must be multiples of the
    100 ms cell length (the streaming runner guarantees this).
    """

    sample_rate: int
    zi: object = None
    cells: list = dataclasses.field(default_factory=list)

    @property
    def cell_len(self):
        return _gating_geometry(self.sample_rate)[0]

    def update(self, chunk):
        cell_ms, self.zi = block_cell_energies(chunk, self.sample_rate, zi=self.zi)
        self.cells.append(cell_ms)
        return cell_ms

    def loudness(self, downmix="bs1770"):
        cells = jnp.concatenate(self.cells, axis=0)
        if downmix == "reference_mono_mean":
            raise ValueError(
                "reference_mono_mean downmix must be applied before update(); "
                "pass chunk.mean(axis=1) chunks instead")
        return loudness_from_cells(cells)
