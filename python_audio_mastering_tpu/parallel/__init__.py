from python_audio_mastering_tpu.parallel.mesh import make_mesh, tracks_sharding
from python_audio_mastering_tpu.parallel.batch import (
    master_album,
    make_album_fn,
    pad_tracks,
    stack_params,
)
from python_audio_mastering_tpu.parallel.streaming import (
    master_streamed,
    StreamState,
    default_chunk_frames,
)
