"""python_audio_mastering_tpu — a TPU-native audio mastering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
theouterlimitz/Python-Audio-Mastering (reference mounted at /root/reference):
the full mastering chain — harmonic exciter (tanh waveshaper), 4-band
shelving/peaking EQ with genre presets, mid/side stereo widener, 3-band
multiband compressor, ITU-R BS.1770-4 gated LUFS normalization and a soft
limiter — compiled into a single fused ``jit`` graph.

Design stance (see SURVEY.md §7): the reference's AudioSegment-centric,
per-chunk-object design is *not* ported.  The core is a pure-functional JAX
library over ``float32[frames, channels]`` arrays.  IIR biquads are computed
either as an exact ``lax.scan`` (scipy ``sosfilt`` parity, with explicit
carried state) or as a block-parallel formulation that maps the linear
recurrence onto MXU matmuls (see ``ops.iir``).  Loudness is a native
BS.1770-4 implementation validated against the ITU spec tables.

Key entry points:
    >>> from python_audio_mastering_tpu import master, MasteringParams, ChainConfig
    >>> y = master(x, MasteringParams.from_settings({"saturation": 20}), ChainConfig(sample_rate=44100))

Reference-parity entry points (GUI/worker contract):
    ``engine.process_audio(settings, callback)``
    ``engine.batch_process_audio(settings, in_dir, out_dir, callback)``
    ``engine.process_audio_from_gcs(gcs_uri, settings)``
"""

from python_audio_mastering_tpu.version import __version__
from python_audio_mastering_tpu.config import ChainConfig, MasteringParams, CompressorBandParams
from python_audio_mastering_tpu.models.presets import EQ_PRESETS
from python_audio_mastering_tpu.models.chain import master, make_master_fn

__all__ = [
    "__version__",
    "ChainConfig",
    "MasteringParams",
    "CompressorBandParams",
    "EQ_PRESETS",
    "master",
    "make_master_fn",
]
