"""Mid/side stereo processing (reference engine:136-144)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["stereo_width"]


def stereo_width(x, width_factor, channel_axis=1):
    """Mid/side stereo widener.

    ``mid = (L+R)/2``, ``side = (L-R)/2 * width``; remixed to L/R.  A no-op
    for mono input (matching engine:137).  ``width_factor`` may be traced;
    at 1.0 this is algebraically the identity, matching the reference's
    skip-at-1.0 behaviour (engine:60-61).

    ``channel_axis=0`` operates on channel-major ``(C, N)`` audio (the
    chain's internal TPU layout — see models/chain.py).
    """
    if x.ndim == 1 or x.shape[channel_axis] != 2:
        return x
    width = jnp.asarray(width_factor, dtype=x.dtype)
    if channel_axis == 0:
        left, right = x[0], x[1]
    else:
        left, right = x[:, 0], x[:, 1]
    mid = (left + right) * 0.5
    side = (left - right) * 0.5 * width
    return jnp.stack([mid + side, mid - side], axis=channel_axis)
