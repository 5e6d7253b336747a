"""Typed configuration: the settings-dict wire contract as a JAX pytree.

The reference's de-facto API is a flat JSON settings dict assembled by three
different clients with *divergent key spellings* (SURVEY.md §2): the GUI
emits ``low_band_threshold``-style multiband keys (mastering_gui.py:187-189)
while the canonical worker engine reads ``low_thresh``-style keys
(engine:67-72).  :meth:`MasteringParams.from_settings` accepts both (short
spelling wins if both present), fixing the reference's silent key-skew bug
while staying wire-compatible with every reference client.

``MasteringParams`` is a registered dataclass pytree: numeric fields are
leaves (traced — sliders move without recompilation), the structural
``multiband``/``lufs_enabled`` switches are static metadata (two compiled
graph variants, as in the reference's branchy chain).

``ChainConfig`` is fully static and hashable: sample rate, engine variant,
and the TPU execution knobs (blocked-IIR block size, compressor control-rate
decimation / block-parallel ballistics).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["MasteringParams", "ChainConfig", "CompressorBandParams", "settings_from_params"]

# GUI slider ranges (mastering_gui.py:95-112) — used for validation/clamping.
PARAM_RANGES = {
    "saturation": (0.0, 100.0),
    "bass_boost": (-6.0, 6.0),
    "mid_cut": (-6.0, 6.0),  # GUI range is 0..6 but rock preset uses -2.0
    "presence_boost": (-6.0, 6.0),
    "treble_boost": (-6.0, 6.0),
    "width": (0.0, 2.0),
    "lufs": (-24.0, -6.0),
    "low_thresh": (-40.0, 0.0), "low_ratio": (1.0, 12.0),
    "mid_thresh": (-40.0, 0.0), "mid_ratio": (1.0, 12.0),
    "high_thresh": (-40.0, 0.0), "high_ratio": (1.0, 12.0),
}

# (short worker key, GUI/long key, default) — engine:67-72, mastering_gui.py:107-112.
_MB_KEYS = [
    ("low_thresh", "low_band_threshold", -25.0),
    ("low_ratio", "low_band_ratio", 6.0),
    ("mid_thresh", "mid_band_threshold", -20.0),
    ("mid_ratio", "mid_band_ratio", 3.0),
    ("high_thresh", "high_band_threshold", -15.0),
    ("high_ratio", "high_band_ratio", 4.0),
]


@dataclasses.dataclass
class CompressorBandParams:
    """One band's threshold/ratio (ballistics are fixed per band slot)."""

    threshold_db: Any
    ratio: Any


jax.tree_util.register_dataclass(
    CompressorBandParams, data_fields=["threshold_db", "ratio"], meta_fields=[]
)


@dataclasses.dataclass
class MasteringParams:
    """All per-job mastering parameters (the settings-dict schema, typed)."""

    saturation: Any = 0.0
    bass_boost: Any = 0.0
    mid_cut: Any = 0.0
    presence_boost: Any = 0.0
    treble_boost: Any = 0.0
    width: Any = 1.0
    lufs: Any = -14.0
    low_thresh: Any = -25.0
    low_ratio: Any = 6.0
    mid_thresh: Any = -20.0
    mid_ratio: Any = 3.0
    high_thresh: Any = -15.0
    high_ratio: Any = 4.0
    multiband: bool = False      # static: selects the compiled graph variant
    lufs_enabled: bool = True    # static: settings.get("lufs") is not None

    @classmethod
    def from_settings(cls, settings, preset=None):
        """Build from a reference-wire settings dict (both key spellings).

        ``preset`` (or ``settings['preset']``) applies EQ_PRESETS values
        verbatim, overridden by explicit EQ keys in ``settings``.
        """
        from python_audio_mastering_tpu.models.presets import EQ_PRESETS

        s = dict(settings or {})
        preset = preset or s.pop("preset", None)
        base = {}
        if preset and preset != "None":
            p = EQ_PRESETS[preset]
            base.update({k: p[k] for k in
                         ("bass_boost", "mid_cut", "presence_boost", "treble_boost")})

        kwargs = dict(base)
        for key in ("saturation", "bass_boost", "mid_cut", "presence_boost",
                    "treble_boost", "width"):
            if s.get(key) is not None:
                kwargs[key] = float(s[key])
        lufs = s.get("lufs")
        kwargs["lufs_enabled"] = lufs is not None
        if lufs is not None:
            kwargs["lufs"] = float(lufs)
        # `multiband` (web/worker, engine:65) or `use_multiband` (GUI→missing
        # engine + legacy main.py:61) — accept both.
        kwargs["multiband"] = bool(s.get("multiband", s.get("use_multiband", False)))
        for short, long_, default in _MB_KEYS:
            if s.get(short) is not None:
                kwargs[short] = float(s[short])
            elif s.get(long_) is not None:
                kwargs[short] = float(s[long_])
        return cls(**kwargs)

    def to_settings(self):
        """Back to the reference wire format (short multiband spelling)."""
        out = {
            "saturation": float(self.saturation),
            "bass_boost": float(self.bass_boost),
            "mid_cut": float(self.mid_cut),
            "presence_boost": float(self.presence_boost),
            "treble_boost": float(self.treble_boost),
            "width": float(self.width),
            "lufs": float(self.lufs) if self.lufs_enabled else None,
            "multiband": bool(self.multiband),
        }
        for short, _, _ in _MB_KEYS:
            out[short] = float(getattr(self, short))
        return out

    def band_params(self):
        return (
            CompressorBandParams(self.low_thresh, self.low_ratio),
            CompressorBandParams(self.mid_thresh, self.mid_ratio),
            CompressorBandParams(self.high_thresh, self.high_ratio),
        )


jax.tree_util.register_dataclass(
    MasteringParams,
    data_fields=[
        "saturation", "bass_boost", "mid_cut", "presence_boost", "treble_boost",
        "width", "lufs", "low_thresh", "low_ratio", "mid_thresh", "mid_ratio",
        "high_thresh", "high_ratio",
    ],
    meta_fields=["multiband", "lufs_enabled"],
)


def settings_from_params(params):
    return params.to_settings()


@dataclasses.dataclass(frozen=True)
class ChainConfig:
    """Static chain configuration (hashable → usable as a jit static arg)."""

    sample_rate: int = 44100
    variant: str = "worker"          # "worker" (canonical) | "legacy" (main.py)
    dtype: str = "float32"
    # IIR execution: "auto" | "scan" | "blocked"
    filter_method: str = "auto"
    block_size: int = 512
    # Compressor ballistics execution (exact contract: hop=1, scan).
    comp_hop: int = 1
    comp_block_ctrl: int | None = None
    comp_overlap_ctrl: int | None = None
    # "auto": exact Pallas kernel on TPU, blocked/scan elsewhere.  Batched
    # (vmapped) paths override to "blocked" — see parallel.batch.
    comp_ballistics: str = "auto"
    # Multiband execution over the rows-form hot path: "auto" uses the
    # fused Pallas crossover+detector/gain-apply kernels on TPU (band
    # signals never materialize in HBM — see ops.pallas_multiband), the
    # XLA fused path elsewhere; "pallas" / "xla" force.  Batched (vmapped)
    # and gradient paths use "xla" (the kernels have no batching rule or
    # VJP) — parallel.batch overrides like it does for comp_ballistics.
    mb_kernel: str = "auto"
    # Internal execution layout: "auto" runs the worker-variant blocked
    # chain channel-major ("cm", the TPU hot path — see models/chain.py);
    # "nc" forces the row-major (N, C) body (A/B + fallback knob).
    layout: str = "auto"
    # Loudness measurement downmix: reference parity is mono-mean.
    measure_downmix: str = "reference_mono_mean"
    limiter_threshold: float = 0.98
    # Device-residency budget for the streaming runners (bytes): inputs /
    # retained pass-A chunks / finalized outputs beyond it spill to the
    # host (wire format) and re-upload in pass B, so arbitrarily long
    # files master in bounded device memory (the reference's "any size"
    # claim, README.md:19 — made true rather than asserted).  Default 6 GB:
    # the 12x5-min BASELINE album (~3.2 GB peak) stays fully resident on a
    # 16 GB chip; anything larger runs bounded.
    device_budget_bytes: int = 6 << 30
    # "reference": the engine's instantaneous soft knee (engine:224-227).
    # "lookahead_truepeak": brickwall true-peak lookahead limiter
    # (ops/limiter.py) — a quality upgrade; works in one-shot master(),
    # the streaming runner, AND the batched album path (per-track
    # delay-line/release state carried across chunks).
    limiter_mode: str = "reference"

    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    def channel_major(self, n_frames: int) -> bool:
        """Shared gate for the TPU channel-major blocked body
        (models.chain._master_cm and the streaming/batched runners):
        worker variant, blocked-capable filter method, layout not forced
        row-major, and enough frames that blocked filtering beats the
        scan — the same ``4 × block_size`` rule ``ops.iir.sosfilt`` uses
        for its auto method choice, so a row-major fallback run always
        picks the same filter algorithm as the channel-major body."""
        return (self.layout != "nc" and self.variant == "worker"
                and self.filter_method in ("auto", "blocked")
                and n_frames >= 4 * self.block_size)

    @classmethod
    def tpu_default(cls, sample_rate=44100):
        """Throughput defaults for real TPU runs: blocked MXU IIR + hop-8
        detector decimation + the exact Pallas ballistics kernel
        (~0.03 dB rms vs the bit-exact hop-1 contract).  The measured
        walls for this profile live in BENCH_DETAILS.json
        (``configs.full_chain_3min``) — quoted numbers in docstrings go
        stale; the artifact is the source of truth.

        ``block_size=384``: the kernels' per-sample MXU dot cost is ∝ L
        (each block contracts against (L, L) response operators), so a
        smaller L cuts recompute FLOPs while the states pass stays cheap;
        the round-5 A/B on the bench chip measured full-chain slope walls
        8.69 / 8.06 / 7.96 ms at L = 512 / 256 / 384 (output deltas
        within the usual detector threshold-flip budget, max ~1.4e-3)."""
        return cls(sample_rate=sample_rate, filter_method="blocked",
                   block_size=384, comp_hop=8, comp_block_ctrl=2048)

    @classmethod
    def tpu_fast(cls, sample_rate=44100):
        """Maximum-throughput profile (hop-16 detector decimation,
        ~0.06 dB rms vs the bit-exact contract).  Measured walls:
        BENCH_DETAILS.json ``configs.full_chain_3min_fast_profile``."""
        return cls(sample_rate=sample_rate, filter_method="blocked",
                   block_size=384, comp_hop=16, comp_block_ctrl=1024,
                   comp_overlap_ctrl=1102)
