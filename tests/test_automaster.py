"""Differentiable automastering: loss decreases, fitted params are in range,
and the recovered EQ moves in the right direction."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from python_audio_mastering_tpu import ChainConfig, MasteringParams, master
from python_audio_mastering_tpu.models import automaster
from tests.conftest import make_signal

FS = 44100


def _cfg():
    return ChainConfig(sample_rate=FS, dtype="float32")


def test_spectral_profile_shape_and_tilt():
    x = make_signal(FS, fs=FS).astype(np.float32)
    prof = np.asarray(automaster.spectral_profile(x, FS, n_bands=24))
    assert prof.shape == (24,)
    # the test signal is bass-heavy: low bands should dominate the top band
    assert prof[:4].mean() > prof[-1]


def test_latent_params_respect_ranges():
    theta = jnp.asarray([10.0, -10.0, 10.0, -10.0, 10.0, -10.0])
    p = automaster.latent_to_params(theta)
    assert 0.0 <= float(p.saturation) <= 60.0
    assert -6.0 <= float(p.bass_boost) <= 6.0
    assert 0.5 <= float(p.width) <= 1.8


def test_fit_reduces_loss_and_recovers_direction():
    """Target = the same track mastered with boosted bass; the fitted
    params should move bass_boost upward and reduce the loss."""
    x = make_signal(FS * 2, fs=FS).astype(np.float32) * 0.3
    cfg = _cfg()
    target_params = MasteringParams.from_settings(
        {"bass_boost": 5.0, "treble_boost": -3.0, "lufs": -14.0})
    y_target = master(x, target_params, cfg)
    target_prof = automaster.spectral_profile(y_target, FS)

    model = automaster.AutoMasterModel(config=cfg, target_lufs=-14.0)
    fitted, losses = automaster.fit(model, x, target_prof, steps=25, lr=0.1)
    assert losses[-1] < losses[0] * 0.8
    assert float(fitted.bass_boost) > 0.5       # moved toward the boost
    assert float(fitted.treble_boost) < 0.5     # moved toward the cut


def test_shared_train_step_on_batch():
    x = jnp.stack([jnp.asarray(make_signal(FS, fs=FS, seed=i) * 0.3,
                               jnp.float32) for i in range(2)])
    cfg = _cfg()
    import jax

    targets = jax.vmap(lambda a: automaster.spectral_profile(a, FS))(x)
    model = automaster.AutoMasterModel(config=cfg)
    opt = optax.adam(0.05)
    step = automaster.make_train_step(model, opt, shared=True)
    theta = jnp.zeros((6,), jnp.float32)
    theta, _, loss = step(theta, opt.init(theta), x, targets)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(theta)))
