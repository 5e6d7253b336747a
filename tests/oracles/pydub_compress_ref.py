"""Per-frame numpy oracle of the pydub ``compress_dynamic_range`` contract.

The reference's per-band compressor is pydub's pure-Python loop
(engine:207-209).  This oracle restates that algorithm — lookback-RMS
detector, dB gain computer, asymmetric attack/release ballistics with the
below-threshold freeze quirk — as a literal per-frame loop on float audio,
independent of the framework's vectorized implementation.
"""

import numpy as np


def compress_dynamic_range(x, fs, threshold=-20.0, ratio=4.0, attack=5.0,
                           release=50.0):
    """x: (N, C) float in [-1, 1] (full scale 1.0). Returns compressed copy."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n = x.shape[0]
    thresh_amp = 10.0 ** (threshold / 20.0)
    look = int(attack * fs / 1000.0)
    attack_frames = max(attack * fs / 1000.0, 1.0)
    release_frames = max(release * fs / 1000.0, 1.0)

    att = 0.0
    gains = np.empty(n)
    x2 = (x ** 2).mean(axis=1)
    for i in range(n):
        lo = max(0, i - look)
        window = x2[lo:i]
        rms = np.sqrt(window.mean()) if window.size else 0.0
        db_over = max(20.0 * np.log10(rms / thresh_amp), 0.0) if rms > 0 else 0.0
        max_att = (1.0 - 1.0 / ratio) * db_over
        if rms > thresh_amp and att <= max_att:
            att = min(att + max_att / attack_frames, max_att)
        else:
            att = max(att - max_att / release_frames, 0.0)
        gains[i] = 10.0 ** (-att / 20.0)
    return x * gains[:, None]
