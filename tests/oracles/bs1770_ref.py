"""Independent numpy/scipy BS.1770-4 oracle for loudness parity tests.

A deliberately naive, loop-and-boolean-indexing implementation of ITU-R
BS.1770-4 integrated loudness (the pyloudnorm algorithm): K-weighting
prefilters executed by scipy.sosfilt, 400 ms / 75 %-overlap gating blocks,
−70 LUFS absolute and −10 LU relative gates.  Shares only the closed-form
filter *coefficients* with the framework (they are the spec's); the
executor, blocking and gating logic are written independently so framework
bugs cannot cancel out.
"""

import math

import numpy as np
import scipy.signal as sps


def _kweight_sos(fs):
    # High shelf (tan-form parametric; reproduces the BS.1770-4 48 kHz table).
    g, q, fc = 3.999843853973347, 0.7071752369554196, 1681.974450955533
    k = math.tan(math.pi * fc / fs)
    vh = 10.0 ** (g / 20.0)
    vb = vh ** 0.4996667741545416
    a0 = 1 + k / q + k * k
    shelf = [(vh + vb * k / q + k * k) / a0, 2 * (k * k - vh) / a0,
             (vh - vb * k / q + k * k) / a0, 1.0,
             2 * (k * k - 1) / a0, (1 - k / q + k * k) / a0]
    q, fc = 0.5003270373238773, 38.13547087602444
    k = math.tan(math.pi * fc / fs)
    a0 = 1 + k / q + k * k
    hp = [1.0, -2.0, 1.0, 1.0, 2 * (k * k - 1) / a0, (1 - k / q + k * k) / a0]
    return np.array([shelf, hp])


def integrated_loudness(x, fs):
    """x: (N,) or (N, C) float. Returns gated LUFS (float, may be -inf)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, c = x.shape
    g = np.ones(c)
    if c >= 4:
        g[3:5] = 1.41

    kx = sps.sosfilt(_kweight_sos(fs), x, axis=0)

    t_g = 0.4
    win = int(round(t_g * fs))
    step = int(round(t_g * fs * 0.25))
    if n < win:
        return -np.inf
    n_blocks = (n - win) // step + 1
    z = np.empty((n_blocks, c))
    for j in range(n_blocks):
        seg = kx[j * step: j * step + win]
        z[j] = np.mean(seg ** 2, axis=0)

    with np.errstate(divide="ignore"):
        l_blocks = -0.691 + 10 * np.log10(z @ g)
    mask_abs = l_blocks > -70.0
    if not mask_abs.any():
        return -np.inf
    rel_gate = -0.691 + 10 * np.log10(z[mask_abs].mean(axis=0) @ g) - 10.0
    mask = mask_abs & (l_blocks > rel_gate)
    if not mask.any():
        return -np.inf
    return -0.691 + 10 * np.log10(z[mask].mean(axis=0) @ g)
