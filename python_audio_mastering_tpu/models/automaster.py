"""Differentiable automastering: fit chain parameters by gradient descent.

The mastering chain is a pure, differentiable JAX function, which enables a
capability the reference cannot express: *solve for* the slider settings
that make a track match a target sound (a reference track's spectral
profile + loudness) instead of hand-tuning them.  This is the framework's
"training" path: a real optimizer loop with a loss, gradients through the
full DSP graph (biquad design → blocked IIR → gated loudness), optax
updates, and data parallelism over a tracks mesh axis (shared-parameter
mode all-reduces gradients across devices — the classic DP collective).

Technique references (see PAPERS.md): gradient-trained parametric IIR EQs
("Deep Optimization of Parametric IIR Filters for Audio Equalization") and
differentiable-biquad effect modeling (hyperconditioned differentiable
biquads) — here applied to the mastering chain's own parameter space.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from python_audio_mastering_tpu.config import ChainConfig, MasteringParams
from python_audio_mastering_tpu.models.chain import master
from python_audio_mastering_tpu.ops import loudness as loud

__all__ = ["AutoMasterModel", "spectral_profile", "fit", "make_train_step"]

# (name, lo, hi) — the tunable slider subspace and its GUI ranges.
_LATENT_SPEC = [
    ("saturation", 0.0, 60.0),
    ("bass_boost", -6.0, 6.0),
    ("mid_cut", -6.0, 6.0),
    ("presence_boost", -6.0, 6.0),
    ("treble_boost", -6.0, 6.0),
    ("width", 0.5, 1.8),
]


def latent_to_params(theta, lufs=-14.0):
    """Unconstrained ``theta (6,)`` → in-range MasteringParams via tanh."""
    vals = {}
    for i, (name, lo, hi) in enumerate(_LATENT_SPEC):
        mid, half = (hi + lo) / 2.0, (hi - lo) / 2.0
        vals[name] = mid + half * jnp.tanh(theta[i])
    return MasteringParams(lufs=lufs, **vals)


def spectral_profile(x, sample_rate, n_bands=24, n_fft=4096):
    """Log-band energy profile (dB) over log-spaced bands 40 Hz..18 kHz.

    Windowed rFFT power averaged over frames, pooled into log-spaced bands —
    a compact, differentiable "sound" descriptor for matching.
    """
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = (x.shape[0] // n_fft) * n_fft
    frames = x[:n].reshape(-1, n_fft) * jnp.hanning(n_fft)
    spec = jnp.abs(jnp.fft.rfft(frames, axis=1)) ** 2
    power = spec.mean(axis=0)  # (n_fft//2+1,)
    freqs = jnp.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    edges = jnp.logspace(jnp.log10(40.0), jnp.log10(18000.0), n_bands + 1)
    band_idx = jnp.clip(jnp.searchsorted(edges, freqs) - 1, 0, n_bands - 1)
    band_pow = jax.ops.segment_sum(power, band_idx, num_segments=n_bands)
    band_cnt = jax.ops.segment_sum(jnp.ones_like(power), band_idx,
                                   num_segments=n_bands)
    return 10.0 * jnp.log10(band_pow / jnp.maximum(band_cnt, 1.0) + 1e-12)


@dataclasses.dataclass(frozen=True)
class AutoMasterModel:
    """Fit chain params so mastered audio matches a target profile."""

    config: ChainConfig
    target_lufs: float = -14.0
    n_bands: int = 24
    profile_weight: float = 1.0
    loudness_weight: float = 0.3

    def loss(self, theta, audio, target_profile):
        params = latent_to_params(theta, lufs=self.target_lufs)
        y = master(audio, params, self.config)
        prof = spectral_profile(y, self.config.sample_rate, self.n_bands)
        # profile match is shift-invariant (LUFS stage owns absolute level)
        d = (prof - prof.mean()) - (target_profile - target_profile.mean())
        l_prof = jnp.mean(d ** 2)
        measured = loud.integrated_loudness(
            y, self.config.sample_rate, downmix=self.config.measure_downmix,
            filter_method=self.config.filter_method)
        l_loud = jnp.where(jnp.isfinite(measured),
                           (measured - self.target_lufs) ** 2, 0.0)
        return self.profile_weight * l_prof + self.loudness_weight * l_loud


def make_train_step(model: AutoMasterModel, optimizer, shared: bool = True):
    """One jittable optimizer step.

    ``shared=True``: one theta for a whole (possibly sharded) batch of
    tracks — per-track losses are meaned, so under a sharded tracks axis
    XLA inserts the gradient all-reduce (data parallelism over ICI).
    ``shared=False``: per-track theta, vmapped (embarrassingly parallel).
    """

    if shared:
        def loss_fn(theta, batch, targets):
            per_track = jax.vmap(lambda a, t: model.loss(theta, a, t))(batch, targets)
            return per_track.mean()
    else:
        def loss_fn(theta, batch, targets):
            per_track = jax.vmap(model.loss)(theta, batch, targets)
            return per_track.mean()

    @jax.jit
    def step(theta, opt_state, batch, targets):
        loss, grads = jax.value_and_grad(loss_fn)(theta, batch, targets)
        updates, opt_state = optimizer.update(grads, opt_state, theta)
        return optax.apply_updates(theta, updates), opt_state, loss

    return step


def fit(model: AutoMasterModel, audio, target_profile, steps=60, lr=0.05,
        theta0=None, callback=None):
    """Fit one track. Returns (MasteringParams, losses)."""
    optimizer = optax.adam(lr)
    theta = jnp.zeros((len(_LATENT_SPEC),)) if theta0 is None else theta0
    opt_state = optimizer.init(theta)
    batch = jnp.asarray(audio)[None]
    targets = jnp.asarray(target_profile)[None]
    step = make_train_step(model, optimizer, shared=True)
    losses = []
    for i in range(steps):
        theta, opt_state, loss = step(theta, opt_state, batch, targets)
        losses.append(float(loss))
        if callback:
            callback(i, losses[-1])
    return latent_to_params(theta, lufs=model.target_lufs), losses
