"""Biquad / SOS filter *design* (coefficient computation).

All designs are closed-form and implemented with ``jnp`` so that gains and
frequencies may be traced values inside ``jit`` (this is what makes the whole
mastering chain differentiable and recompilation-free when sliders move).
Every function returns second-order sections in scipy layout: rows of
``[b0, b1, b2, 1.0, a1, a2]``.

Three families:

* ``reference_*`` — bit-faithful re-derivations of the reference engine's
  shelf/peak formulas (reference worker/audio_mastering_engine.py:170-194).
  NOTE the reference computes ``w0 = 2*pi * (fc / nyquist)`` which is TWICE
  the textbook RBJ ``w0 = 2*pi*fc/fs``; its "250 Hz" shelf therefore corners
  at 500 Hz.  We replicate that exactly because the behavioural contract
  (preset sound) depends on it; the corrected textbook designs are available
  as ``rbj_*``.
* ``rbj_*`` — textbook RBJ Audio-EQ-Cookbook designs.
* ``deman_*`` — the tan-based parametric K-weighting designs that reproduce
  the ITU-R BS.1770-4 48 kHz coefficient tables exactly and generalize to
  any sample rate (used by ``ops.loudness``).

``butter_sos`` is a host-side (numpy, float64) Butterworth design matching
``scipy.signal.butter(..., output='sos')`` transfer functions; it is used for
the static 250/4000 Hz multiband crossovers (reference engine:196-203).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "reference_shelf_sos",
    "reference_peak_sos",
    "rbj_shelf_sos",
    "rbj_peak_sos",
    "rbj_highpass_sos",
    "deman_high_shelf_sos",
    "deman_high_pass_sos",
    "butter_sos",
    "sos_identity",
]


def sos_identity(dtype=jnp.float32):
    """A single pass-through SOS section."""
    return jnp.array([[1.0, 0.0, 0.0, 1.0, 0.0, 0.0]], dtype=dtype)


def _shelf_sos(w0, gain_db, kind):
    """Shared RBJ shelf algebra given an (arbitrary-convention) w0."""
    a = 10.0 ** (jnp.asarray(gain_db) / 20.0)  # reference calls this `gain`
    q = 0.707  # fixed in the reference signature (engine:170)
    cosw0 = jnp.cos(w0)
    alpha = jnp.sin(w0) / (2.0 * q)
    sqrt_a = jnp.sqrt(a)
    if kind == "low":
        b0 = a * ((a + 1) - (a - 1) * cosw0 + 2 * sqrt_a * alpha)
        b1 = 2 * a * ((a - 1) - (a + 1) * cosw0)
        b2 = a * ((a + 1) - (a - 1) * cosw0 - 2 * sqrt_a * alpha)
        a0 = (a + 1) + (a - 1) * cosw0 + 2 * sqrt_a * alpha
        a1 = -2 * ((a - 1) + (a + 1) * cosw0)
        a2 = (a + 1) + (a - 1) * cosw0 - 2 * sqrt_a * alpha
    elif kind == "high":
        b0 = a * ((a + 1) + (a - 1) * cosw0 + 2 * sqrt_a * alpha)
        b1 = -2 * a * ((a - 1) + (a + 1) * cosw0)
        b2 = a * ((a + 1) + (a - 1) * cosw0 - 2 * sqrt_a * alpha)
        a0 = (a + 1) - (a - 1) * cosw0 + 2 * sqrt_a * alpha
        a1 = 2 * ((a - 1) - (a + 1) * cosw0)
        a2 = (a + 1) - (a - 1) * cosw0 - 2 * sqrt_a * alpha
    else:  # pragma: no cover
        raise ValueError(f"kind must be 'low' or 'high', got {kind!r}")
    row = jnp.stack([b0 / a0, b1 / a0, b2 / a0, jnp.ones_like(a0), a1 / a0, a2 / a0])
    return row[None, :]


def reference_shelf_sos(sample_rate, cutoff_hz, gain_db, kind):
    """Shelf exactly as the reference computes it (engine:170-183).

    Uses the reference's doubled angular frequency ``w0 = 2*pi*fc/nyquist``.
    At ``gain_db == 0`` the section is algebraically the identity, so no
    skip-branch is needed under ``jit`` (the reference early-returns instead,
    engine:171 — numerically equivalent).

    The doubled convention sends ``w0`` past π when ``fc > nyquist/2``
    (e.g. the 8 kHz treble shelf below fs = 32 kHz), where the reference's
    filter turns unstable and its output blows up; we clamp ``w0`` just
    under π instead (DESIGN.md D10).  At 44.1/48 kHz the clamp is inactive
    and the reference formula holds exactly.
    """
    w0 = min(2.0 * math.pi * (cutoff_hz / (0.5 * sample_rate)),
             0.999 * math.pi)
    return _shelf_sos(w0, gain_db, kind)


def rbj_shelf_sos(sample_rate, cutoff_hz, gain_db, kind):
    """Textbook RBJ shelf (corner actually at ``cutoff_hz``)."""
    w0 = 2.0 * math.pi * cutoff_hz / sample_rate
    return _shelf_sos(w0, gain_db, kind)


def _peak_sos(w0, gain_db, q):
    a = 10.0 ** (jnp.asarray(gain_db) / 20.0)
    cosw0 = jnp.cos(w0)
    alpha = jnp.sin(w0) / (2.0 * q)
    b0 = 1 + alpha * a
    b1 = -2 * cosw0
    b2 = 1 - alpha * a
    a0 = 1 + alpha / a
    a1 = -2 * cosw0
    a2 = 1 - alpha / a
    row = jnp.stack([b0 / a0, b1 / a0, b2 / a0, jnp.ones_like(a0), a1 / a0, a2 / a0])
    return row[None, :]


def reference_peak_sos(sample_rate, center_hz, gain_db, q=1.0):
    """Peaking EQ exactly as the reference computes it (engine:185-194).

    Same doubled-``w0`` convention (and stability clamp) as
    :func:`reference_shelf_sos`.  Identity at 0 dB.
    """
    w0 = min(2.0 * math.pi * (center_hz / (0.5 * sample_rate)),
             0.999 * math.pi)
    return _peak_sos(w0, gain_db, q)


def rbj_peak_sos(sample_rate, center_hz, gain_db, q=1.0):
    w0 = 2.0 * math.pi * center_hz / sample_rate
    return _peak_sos(w0, gain_db, q)


def rbj_highpass_sos(sample_rate, cutoff_hz, q):
    w0 = 2.0 * math.pi * cutoff_hz / sample_rate
    cosw0 = jnp.cos(w0)
    alpha = jnp.sin(w0) / (2.0 * q)
    b0 = (1 + cosw0) / 2
    b1 = -(1 + cosw0)
    b2 = (1 + cosw0) / 2
    a0 = 1 + alpha
    a1 = -2 * cosw0
    a2 = 1 - alpha
    row = jnp.stack([b0 / a0, b1 / a0, b2 / a0, jnp.ones_like(alpha), a1 / a0, a2 / a0])
    return row[None, :]


# ---------------------------------------------------------------------------
# K-weighting designs (ITU-R BS.1770-4).
#
# Tan-based parametric forms with constants that reproduce the BS.1770-4
# 48 kHz coefficient tables to machine precision (verified in
# tests/test_loudness.py) while generalizing to arbitrary sample rates —
# the same parameterization used by common BS.1770 meter implementations.
# ---------------------------------------------------------------------------

_KW_SHELF_G = 3.999843853973347
_KW_SHELF_Q = 0.7071752369554196
_KW_SHELF_FC = 1681.974450955533
_KW_HP_Q = 0.5003270373238773
_KW_HP_FC = 38.13547087602444


def deman_high_shelf_sos(sample_rate, gain_db=_KW_SHELF_G, q=_KW_SHELF_Q, fc=_KW_SHELF_FC,
                         dtype=jnp.float64):
    """Stage-1 K-weighting high shelf (+4 dB above ~1.5 kHz)."""
    k = math.tan(math.pi * fc / sample_rate)
    vh = 10.0 ** (gain_db / 20.0)
    vb = vh ** 0.4996667741545416
    a0 = 1.0 + k / q + k * k
    b0 = (vh + vb * k / q + k * k) / a0
    b1 = 2.0 * (k * k - vh) / a0
    b2 = (vh - vb * k / q + k * k) / a0
    a1 = 2.0 * (k * k - 1.0) / a0
    a2 = (1.0 - k / q + k * k) / a0
    return np.array([[b0, b1, b2, 1.0, a1, a2]], dtype=np.float64)


def deman_high_pass_sos(sample_rate, q=_KW_HP_Q, fc=_KW_HP_FC):
    """Stage-2 K-weighting high pass (RLB weighting, ~38 Hz)."""
    k = math.tan(math.pi * fc / sample_rate)
    denom = 1.0 + k / q + k * k
    a1 = 2.0 * (k * k - 1.0) / denom
    a2 = (1.0 - k / q + k * k) / denom
    return np.array([[1.0, -2.0, 1.0, 1.0, a1, a2]], dtype=np.float64)


# ---------------------------------------------------------------------------
# Butterworth design (scipy.signal.butter parity), host-side float64.
#
# Used for the static multiband crossovers: butter(4, 250, 'lowpass') /
# butter(4, 4000, 'highpass') at engine:197-198 and the legacy variants at
# main.py:133-154 (order 5 low/high, order 2 bandpass).  The *sections* may
# be paired differently from scipy's zpk2sos, but the overall transfer
# function is identical (verified against scipy output in tests).
# ---------------------------------------------------------------------------


def _butter_prototype(order):
    """Analog Butterworth lowpass prototype poles (gain 1, no zeros)."""
    k = np.arange(1, order + 1)
    theta = np.pi * (2 * k - 1) / (2 * order)
    poles = -np.sin(theta) + 1j * np.cos(theta)
    return poles


def _bilinear_zpk(z, p, k, fs):
    fs2 = 2.0 * fs
    degree = len(p) - len(z)
    z_d = (fs2 + z) / (fs2 - z)
    p_d = (fs2 + p) / (fs2 - p)
    z_d = np.append(z_d, -np.ones(degree))
    k_d = k * np.real(np.prod(fs2 - z) / np.prod(fs2 - p))
    return z_d, p_d, k_d


def _zpk2sos(z, p, k):
    """Pair conjugate roots into SOS rows (gain folded into first section).

    Poles/zeros are paired in order of ascending pole magnitude so the
    highest-Q section runs last, mirroring scipy's default ordering intent.
    """
    # Sort into conjugate pairs (+ possibly one real root for odd orders).
    def split(roots):
        real = sorted([r.real for r in roots if abs(r.imag) < 1e-10])
        cplx = sorted([r for r in roots if r.imag > 1e-10], key=lambda r: abs(r))
        return real, cplx

    preal, pcplx = split(p)
    zreal, zcplx = split(z)

    sections = []
    # Complex pole pairs, ascending magnitude (least → most resonant).
    for pp in pcplx:
        a = np.poly([pp, np.conj(pp)]).real  # [1, a1, a2]
        if zcplx:
            zz = zcplx.pop(0)
            b = np.poly([zz, np.conj(zz)]).real
        elif len(zreal) >= 2:
            b = np.poly([zreal.pop(0), zreal.pop(0)]).real
        elif len(zreal) == 1:
            b = np.array([0.0, 1.0, -zreal.pop(0)])  # degree-1 numerator
            b = np.array([b[1], b[2], 0.0])
        else:
            b = np.array([1.0, 0.0, 0.0])
        sections.append(np.concatenate([b, a]))
    # Real poles: combine two at a time, else a first-order section.
    while preal:
        if len(preal) >= 2:
            a = np.poly([preal.pop(0), preal.pop(0)]).real
        else:
            a = np.array([1.0, -preal.pop(0), 0.0])
        if len(zreal) >= 2 and a[2] != 0.0:
            b = np.poly([zreal.pop(0), zreal.pop(0)]).real
        elif zreal:
            b = np.array([1.0, -zreal.pop(0), 0.0])
        else:
            b = np.array([1.0, 0.0, 0.0])
        sections.append(np.concatenate([b, a]))
    sos = np.array(sections, dtype=np.float64)
    sos[0, :3] *= k
    return sos


def butter_sos(order, wn, btype="lowpass", fs=None):
    """Butterworth digital filter as SOS, matching scipy's transfer function.

    Args mirror ``scipy.signal.butter``: ``wn`` is the -3 dB frequency,
    normalized to Nyquist unless ``fs`` is given.  ``btype`` in
    {'lowpass', 'highpass', 'bandpass'}.
    """
    wn = np.asarray(wn, dtype=np.float64)
    if fs is not None:
        wn = wn / (0.5 * fs)
    if np.any(wn <= 0) or np.any(wn >= 1):
        raise ValueError(f"wn must be in (0, 1) after normalization, got {wn}")

    p = _butter_prototype(order)
    z = np.array([], dtype=complex)
    k = 1.0
    fs_design = 2.0
    warped = 2.0 * fs_design * np.tan(np.pi * wn / fs_design)

    if btype == "lowpass":
        p = p * warped
        k = k * np.real(warped ** order)
    elif btype == "highpass":
        k = k * np.real(1.0 / np.prod(-p))
        p = warped / p
        z = np.zeros(order, dtype=complex)
    elif btype == "bandpass":
        bw = warped[1] - warped[0]
        w0 = np.sqrt(warped[0] * warped[1])
        p_lp = p * bw / 2
        p = np.concatenate([
            p_lp + np.sqrt(p_lp ** 2 - w0 ** 2),
            p_lp - np.sqrt(p_lp ** 2 - w0 ** 2),
        ])
        z = np.zeros(order, dtype=complex)
        k = k * bw ** order
    else:
        raise ValueError(f"unsupported btype {btype!r}")

    z, p, k = _bilinear_zpk(z, p, k, fs_design)
    return _zpk2sos(z, p, k)
