from python_audio_mastering_tpu.serving.store import (
    BlobStore,
    LocalFSBlobStore,
    GCSBlobStore,
    parse_uri,
    get_store,
)
from python_audio_mastering_tpu.serving.jobqueue import (
    LocalQueue,
    PubSubQueue,
    encode_envelope,
    decode_envelope,
)
from python_audio_mastering_tpu.serving.backend import make_backend_app
from python_audio_mastering_tpu.serving.worker import make_worker_app, make_consumer, run_job
