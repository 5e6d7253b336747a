"""The monolithic cloud-function variant (reference main.py:16-91).

The reference repo contains an older all-in-one service with a *different*
wire schema and engine than the split worker: envelope payload is
``{bucket_name, file_name, settings}`` (not ``gcs_uri``), files already
under ``processed/`` are skipped (self-trigger guard, main.py:34-36), the
output key is ``processed/{basename}`` (no ``mastered_`` prefix,
main.py:77), the ``.complete`` flag contains ``"done"`` (main.py:84), the
export keeps the original container format (main.py:74-75), and the DSP is
the legacy engine variant (different saturation/EQ/limiter — main.py:94-192,
``ChainConfig(variant="legacy")`` here).  Also: the legacy multiband is
gated on ``use_multiband`` (main.py:61), which ``MasteringParams`` already
honours.
"""

from __future__ import annotations

import os

from python_audio_mastering_tpu.config import ChainConfig, MasteringParams
from python_audio_mastering_tpu.io import wavio
from python_audio_mastering_tpu.parallel.streaming import master_streamed
from python_audio_mastering_tpu.serving.http import App, text_response
from python_audio_mastering_tpu.serving.jobqueue import decode_envelope
from python_audio_mastering_tpu.serving.store import BlobStore

__all__ = ["make_monolith_app", "run_legacy_job"]


def legacy_config(sample_rate: int) -> ChainConfig:
    import dataclasses

    return dataclasses.replace(ChainConfig.tpu_default(sample_rate),
                               variant="legacy")


def run_legacy_job(store: BlobStore, file_name: str, settings: dict,
                   config: ChainConfig | None = None) -> str:
    """Process one legacy-schema job; returns the output key."""
    blob = store.download(file_name)
    audio, fs = wavio.decode_audio_bytes(blob, name_hint=file_name)
    params = MasteringParams.from_settings(settings)
    out, _, _ = master_streamed(audio, params, config or legacy_config(fs))
    output_key = f"processed/{os.path.basename(file_name)}"
    # export in the original container format (main.py:74-75)
    fmt = os.path.splitext(file_name)[1].lstrip(".") or "wav"
    payload = wavio.encode_audio_bytes(out, fs, fmt)
    store.upload(output_key, payload,
                 content_type=wavio.audio_content_type(fmt))
    store.upload(f"{output_key}.complete", b"done")
    return output_key


def make_monolith_app(store: BlobStore, config: ChainConfig | None = None) -> App:
    app = App("pam-monolith")

    @app.route("/", methods=["POST"])
    def process_mastering(req):
        try:
            data = decode_envelope(req.get_json())
        except (ValueError, KeyError, TypeError):
            return text_response("Bad Request: Invalid Pub/Sub message format", 400)
        file_name = data.get("file_name")
        settings = data.get("settings", {})
        if not file_name or data.get("bucket_name") is None:
            return text_response("Bad Request: missing bucket/file", 400)
        if "processed/" in file_name:
            # self-trigger guard (main.py:34-36)
            return text_response("OK", 200)
        run_legacy_job(store, file_name, settings, config=config)
        return text_response("OK", 200)

    return app
