"""Test harness config.

Tests run on the JAX CPU backend with 8 virtual devices (the stand-in for a
TPU slice — SURVEY.md §4) and float64 enabled so parity oracles (scipy,
vendored BS.1770/pydub references) can be matched at full precision.
Set before any jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

# The environment's sitecustomize may import jax at interpreter startup
# (freezing JAX_PLATFORMS before we run), so also force via jax.config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_signal(n, channels=2, fs=44100, seed=0, kind="mix"):
    """Deterministic test signals: tonal mix + noise bursts, full-scale-ish."""
    r = np.random.default_rng(seed)
    t = np.arange(n) / fs
    base = (0.4 * np.sin(2 * np.pi * 55 * t)
            + 0.25 * np.sin(2 * np.pi * 440 * t + 0.3)
            + 0.15 * np.sin(2 * np.pi * 5200 * t + 1.1)
            + 0.1 * r.standard_normal(n))
    # amplitude envelope so dynamics processing has something to chew on
    env = 0.3 + 0.7 * (0.5 + 0.5 * np.sin(2 * np.pi * 0.7 * t)) ** 2
    base = base * env
    if channels == 1:
        return base.astype(np.float64)[:, None]
    out = np.stack([base, np.roll(base, 17) * 0.9 + 0.05 * r.standard_normal(n)],
                   axis=1)
    return out.astype(np.float64)
