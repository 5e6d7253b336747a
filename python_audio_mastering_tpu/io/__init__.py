from python_audio_mastering_tpu.io.wavio import (
    read_wav,
    write_wav,
    pcm_to_float,
    float_to_pcm,
    read_audio,
    write_audio,
)
