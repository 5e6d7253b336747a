from python_audio_mastering_tpu.models.presets import EQ_PRESETS
from python_audio_mastering_tpu.models.chain import master, make_master_fn, MasterResult
