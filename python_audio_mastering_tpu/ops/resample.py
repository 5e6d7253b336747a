"""Rational polyphase sample-rate conversion (TPU-native upfirdn).

The reference delegates all rate handling to ffmpeg's decoder (pydub's
``AudioSegment.from_file``, worker/audio_mastering_engine.py:43) and never
resamples explicitly — its EQ centers and crossovers silently assume the
source rate.  This op family makes rate conversion a first-class device
operation so a mastering service can normalize any upload to its target
rate (44.1 k/48 k) on the TPU before the chain runs.

Design and execution:

* Taps are the classic Kaiser-windowed sinc low-pass at ``1/max(up, down)``
  of Nyquist, normalized to unit DC gain and scaled by ``up`` — the same
  construction as ``scipy.signal.resample_poly``'s default (firwin +
  ``('kaiser', 5.0)``); parity is tested against scipy both with identical
  taps (float tolerance) and against scipy's own design (~1e-6).
* Execution is the POLYPHASE decomposition, not a zero-stuffed filter: for
  output index ``j = m·up + r``,

      ``y[j] = Σ_v h[r·down + half − up·v] · x[m·down + v]``

  so the ``up`` phase filters (each ``~K/up ≈ 21`` taps) form one host-
  precomputed bank ``G (up, W)`` applied as a single stride-``down``
  cross-correlation with ``up`` output channels — no sample of the
  up-sampled grid ever exists.  (A ``lhs_dilation=up`` convolution computes
  the identical numbers but makes XLA walk the dilated domain: measured
  ~1800× slower on a 30 s track.)  The grouped conv output interleaves
  back to ``y`` by one transpose+reshape.
* The phase alignment reproduces ``scipy.signal.resample_poly``'s
  group-delay-centered slice exactly; output length is ``ceil(N·up/down)``.
* ``resample(x, sr_in, sr_out)`` reduces the ratio by gcd, so
  44.1 k → 48 k runs as up=160/down=147.

All jit-compatible; taps and the phase bank are designed host-side in
float64 and cached.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["design_resample_taps", "resample_poly", "resample"]

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=64)
def design_resample_taps(up: int, down: int, half_len_mult: int = 10,
                         beta: float = 5.0):
    """Kaiser-windowed sinc anti-aliasing taps for an up/down converter.

    Matches ``scipy.signal.resample_poly``'s default design: cutoff at
    ``1/max(up, down)`` (normalized to Nyquist of the up-sampled grid),
    ``2·10·max(up, down) + 1`` taps, Kaiser β=5.0, unit DC gain, scaled by
    ``up`` to preserve amplitude through the rate change.  Returns a
    float64 numpy array (host constant; cast at use).
    """
    if up < 1 or down < 1:
        raise ValueError("up/down must be positive integers")
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = half_len_mult * max_rate
    n = 2 * half_len + 1
    k = np.arange(n) - half_len
    h = f_c * np.sinc(f_c * k) * np.kaiser(n, beta)
    h /= h.sum()
    return h * up


@functools.lru_cache(maxsize=64)
def _polyphase_bank(taps_bytes: bytes, k_len: int, up: int, down: int):
    """Host-side phase-filter bank ``G (up, W)`` and input offset ``v_lo``.

    Row r holds ``h[r·down + half − up·v]`` over the common valid-``v``
    window of all phases (rows zero-padded outside their own support), so
    every phase reads the same input window ``x[m·down + v_lo : … + W]``.
    """
    h = np.frombuffer(taps_bytes, dtype=np.float64)
    half = (k_len - 1) // 2
    bases = np.arange(up) * down + half
    v_lo = int(np.ceil((bases - k_len + 1) / up).min())
    v_hi = int((bases // up).max())
    w_len = v_hi - v_lo + 1
    g = np.zeros((up, w_len))
    for r in range(up):
        idx = bases[r] - up * (v_lo + np.arange(w_len))
        valid = (idx >= 0) & (idx < k_len)
        g[r, valid] = h[idx[valid]]
    return g, v_lo


def resample_poly(x, up: int, down: int, taps=None):
    """Polyphase resampling of ``(N,)`` or ``(N, C)`` audio by ``up/down``.

    ``taps``: optional custom FIR (odd length, centered, already scaled by
    ``up``) — pass scipy's own ``firwin`` output times ``up`` for bit-level
    scipy parity; default is :func:`design_resample_taps`.  Output length
    is ``ceil(N·up/down)`` (scipy's convention).
    """
    up, down = int(up), int(down)
    if up == down:
        return x
    x = jnp.asarray(x)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, c = x.shape
    dt = x.dtype
    h = design_resample_taps(up, down) if taps is None \
        else np.asarray(taps, np.float64)
    if h.shape[0] % 2 != 1:
        raise ValueError("taps must have odd length (centered FIR)")
    g, v_lo = _polyphase_bank(h.tobytes(), h.shape[0], up, down)
    w_len = g.shape[1]
    n_out = -(-n * up // down)
    m = -(-n_out // up)  # output superframes of `up` samples each
    # xp[i] = x[i + v_lo]; the m-th window is xp[m·down : m·down + W]
    pad_l = max(0, -v_lo)
    pad_r = max(0, (m - 1) * down + v_lo + w_len - n)
    xp = jnp.pad(x, ((pad_l, pad_r), (0, 0)))
    lhs = xp.T[:, None, :]  # (C, 1, Np)
    rhs = jnp.asarray(g, dt)[:, None, :]  # (up, 1, W) correlation kernels
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(down,), padding=[(0, 0)],
        precision=_HIGHEST)  # (C, up, M') — XLA convs are cross-correlations
    y = jnp.transpose(y[:, :, :m], (2, 1, 0)).reshape(m * up, c)[:n_out]
    return y[:, 0] if squeeze else y


def resample(x, sr_in: int, sr_out: int, taps=None):
    """Resample audio from ``sr_in`` to ``sr_out`` Hz (rational reduction
    by gcd: 44100 → 48000 runs as up=160, down=147)."""
    sr_in, sr_out = int(sr_in), int(sr_out)
    if sr_in <= 0 or sr_out <= 0:
        raise ValueError("sample rates must be positive")
    if sr_in == sr_out:
        return x
    g = math.gcd(sr_in, sr_out)
    return resample_poly(x, sr_out // g, sr_in // g, taps=taps)
