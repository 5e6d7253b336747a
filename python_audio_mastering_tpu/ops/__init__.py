"""DSP ops: filter design, IIR execution, waveshapers, dynamics, loudness."""

from python_audio_mastering_tpu.ops.biquad import (
    reference_shelf_sos,
    reference_peak_sos,
    rbj_shelf_sos,
    rbj_peak_sos,
    rbj_highpass_sos,
    deman_high_shelf_sos,
    deman_high_pass_sos,
    butter_sos,
    sos_identity,
)
from python_audio_mastering_tpu.ops.iir import (
    sosfilt_scan,
    sosfilt_blocked,
    sosfilt,
    cascade_state_space,
    zi_to_state,
    state_to_zi,
)
from python_audio_mastering_tpu.ops.waveshaper import (
    saturate,
    saturate_legacy,
    soft_limiter,
    soft_limiter_legacy,
)
from python_audio_mastering_tpu.ops.stereo import stereo_width
from python_audio_mastering_tpu.ops.loudness import (
    kweight_sos,
    integrated_loudness,
    normalize_to_lufs,
    BlockEnergyAccumulator,
)
from python_audio_mastering_tpu.ops.compressor import compress_dynamic_range
from python_audio_mastering_tpu.ops.multiband import multiband_compress, crossover_split
from python_audio_mastering_tpu.ops.meters import (
    momentary_loudness,
    shortterm_loudness,
    loudness_range,
    true_peak_db,
)
# NOTE: the bare `resample` function is deliberately NOT re-exported here —
# it would shadow the `ops.resample` submodule attribute.  Use
# `ops.resample.resample` or the re-exported `resample_poly`.
from python_audio_mastering_tpu.ops.resample import (
    design_resample_taps,
    resample_poly,
)
