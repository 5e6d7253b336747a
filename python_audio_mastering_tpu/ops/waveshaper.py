"""Memoryless nonlinearities: harmonic exciter (saturation) and soft limiter.

Pure elementwise ops — XLA fuses these into adjacent stages for free.  Two
variants of each exist in the reference (divergent engine copies); both are
provided and selected by the chain's ``variant`` config:

* ``saturate`` / ``soft_limiter`` — the canonical cloud worker
  (reference worker/audio_mastering_engine.py:128-134, 224-227).
* ``saturate_legacy`` / ``soft_limiter_legacy`` — the monolithic variant
  (reference main.py:94-97, 189-192).

Unlike the reference's ``soft_limiter`` (which mutates its input in place,
engine:226), all functions here are pure.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["saturate", "saturate_legacy", "soft_limiter", "soft_limiter_legacy"]


def saturate(x, saturation_percent):
    """Dry/wet tanh waveshaper (worker variant, engine:128-134).

    ``mix = (pct/100)^2``; drive ``1 + 4*mix``;
    ``out = (1-mix)*x + mix*tanh(x*(1+4*mix))``.
    Naturally the identity at 0 % — no skip branch needed under jit.
    """
    mix = (jnp.asarray(saturation_percent, dtype=x.dtype) / 100.0) ** 2
    driven = jnp.tanh(x * (1.0 + mix * 4.0))
    return (1.0 - mix) * x + mix * driven


def saturate_legacy(x, amount):
    """Gain-compensated tanh (legacy variant, main.py:94-97).

    ``tanh(x*g)/g`` with ``g = 1 + 4*amount/100``; the reference skips at
    amount == 0 (main.py:95) which we reproduce with a ``where`` so the
    parameter may be traced.
    """
    amount = jnp.asarray(amount, dtype=x.dtype)
    gain = 1.0 + (amount / 100.0) * 4.0
    shaped = jnp.tanh(x * gain) / gain
    return jnp.where(amount == 0.0, x, shaped)


def soft_limiter(x, threshold=0.98, knee=0.02):
    """Rational soft-knee limiter (worker variant, engine:224-227).

    Above ``threshold``: ``thr + (|x|-thr)/sqrt(1 + ((|x|-thr)/knee)^2)``,
    sign preserving.  Pure (the reference mutates in place).
    """
    ax = jnp.abs(x)
    over = ax - threshold
    limited = threshold + over / jnp.sqrt(1.0 + (over / knee) ** 2)
    return jnp.where(ax > threshold, limited * jnp.sign(x), x)


def soft_limiter_legacy(x, threshold=0.98):
    """tanh limiter (legacy variant, main.py:189-192)."""
    return jnp.where(jnp.abs(x) > threshold, jnp.tanh(x) * threshold, x)
