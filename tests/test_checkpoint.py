"""Chunk-granular checkpoint/resume for streamed jobs (SURVEY.md §5: the
reference restarts interrupted jobs from zero)."""

import numpy as np

from python_audio_mastering_tpu import ChainConfig, MasteringParams
from python_audio_mastering_tpu.parallel import streaming
from tests.conftest import make_signal

FS = 44100


def test_resume_matches_uninterrupted(tmp_path):
    x = make_signal(FS * 2, fs=FS) * 0.4
    params = MasteringParams.from_settings({"preset": "techno", "saturation": 10,
                                            "lufs": -14.0, "multiband": True})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")

    full, m_full, g_full = streaming.master_streamed(x, params, cfg,
                                                     chunk_seconds=0.5)

    # "interrupted" run: process only the first 2 chunks, checkpointing
    ckpt = str(tmp_path / "job1")
    msgs = []

    class Stop(Exception):
        pass

    def interrupt(msg):
        msgs.append(msg)
        if "Processed chunk 2/" in msg:
            raise Stop()

    try:
        streaming.master_streamed(x, params, cfg, chunk_seconds=0.5,
                                  progress_cb=interrupt, checkpoint_dir=ckpt)
    except Stop:
        pass

    # resume: must skip done chunks and reproduce the uninterrupted result
    msgs2 = []
    out, m, g = streaming.master_streamed(x, params, cfg, chunk_seconds=0.5,
                                          progress_cb=msgs2.append,
                                          checkpoint_dir=ckpt)
    assert any(m_.startswith("Resuming from chunk 3/") for m_ in msgs2)
    np.testing.assert_allclose(out, full, rtol=1e-12, atol=1e-14)
    assert abs(m - m_full) < 1e-12


def test_completed_checkpoints_skip_all_compute(tmp_path):
    x = make_signal(FS, fs=FS) * 0.3
    params = MasteringParams.from_settings({"lufs": -16.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")
    ckpt = str(tmp_path / "job2")
    first, m1, _ = streaming.master_streamed(x, params, cfg, chunk_seconds=0.4,
                                             checkpoint_dir=ckpt)
    msgs = []
    again, m2, _ = streaming.master_streamed(x, params, cfg, chunk_seconds=0.4,
                                             progress_cb=msgs.append,
                                             checkpoint_dir=ckpt)
    assert not any(m.startswith("Processed chunk") for m in msgs)
    np.testing.assert_array_equal(first, again)
    assert m1 == m2


def test_album_resume_matches_uninterrupted(tmp_path):
    """Album checkpoint/resume: an interrupted batched album job resumes
    from the last completed chunk and reproduces the uninterrupted result
    for every track."""
    from python_audio_mastering_tpu.parallel import batch as pbatch

    tracks = [make_signal(int(FS * 1.2), fs=FS, seed=s) * 0.4 for s in (0, 1)]
    params = MasteringParams.from_settings(
        {"preset": "pop", "lufs": -15.0, "multiband": True})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")

    full, m_full = pbatch.master_album_streamed(tracks, params, cfg,
                                                chunk_seconds=0.4)

    ckpt = str(tmp_path / "albumjob")

    class Stop(Exception):
        pass

    def interrupt(msg):
        if "Processed chunk 2/" in msg:
            raise Stop()

    try:
        pbatch.master_album_streamed(tracks, params, cfg, chunk_seconds=0.4,
                                     progress_cb=interrupt,
                                     checkpoint_dir=ckpt)
    except Stop:
        pass

    msgs = []
    outs, measured = pbatch.master_album_streamed(
        tracks, params, cfg, chunk_seconds=0.4, progress_cb=msgs.append,
        checkpoint_dir=ckpt)
    assert any(m.startswith("Resuming from checkpoint: 2/") for m in msgs)
    for i in range(2):
        np.testing.assert_allclose(outs[i], full[i], rtol=1e-12, atol=1e-14)
        assert abs(measured[i] - m_full[i]) < 1e-12


def test_album_segment_checkpoints_every_n(tmp_path):
    """checkpoint_every=N writes one segment file per N chunks (bounding
    the readback bursts) and resume replays whole segments exactly."""
    import glob
    import os

    from python_audio_mastering_tpu.parallel import batch as pbatch

    tracks = [make_signal(int(FS * 1.2), fs=FS, seed=s) * 0.4 for s in (3, 4)]
    params = MasteringParams.from_settings({"preset": "rock", "lufs": -15.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")

    full, m_full = pbatch.master_album_streamed(tracks, params, cfg,
                                                chunk_seconds=0.4)

    # full run with every-2 checkpointing: 3 chunks -> 2 segment files
    ckpt = str(tmp_path / "seg")
    pbatch.master_album_streamed(tracks, params, cfg, chunk_seconds=0.4,
                                 checkpoint_dir=ckpt, checkpoint_every=2)
    files = sorted(glob.glob(os.path.join(ckpt, "chunk_*.pkl")))
    assert [os.path.basename(f) for f in files] == ["chunk_00001.pkl",
                                                    "chunk_00002.pkl"]

    # interrupt mid-segment: with 5 chunks and every-2 segments, stopping
    # after chunk 3 leaves chunk 2's segment incomplete (never submitted),
    # so only chunks 0-1 are durable; resume replays the whole segment and
    # recomputes the rest, matching the uninterrupted result
    tracks5 = [make_signal(int(FS * 2.0), fs=FS, seed=s) * 0.4 for s in (5, 6)]
    full5, m_full5 = pbatch.master_album_streamed(tracks5, params, cfg,
                                                  chunk_seconds=0.4)
    ckpt2 = str(tmp_path / "seg2")

    class Stop(Exception):
        pass

    def interrupt(msg):
        if "Processed chunk 3/" in msg:
            raise Stop()

    try:
        pbatch.master_album_streamed(tracks5, params, cfg, chunk_seconds=0.4,
                                     progress_cb=interrupt,
                                     checkpoint_dir=ckpt2,
                                     checkpoint_every=2)
    except Stop:
        pass
    msgs = []
    outs, measured = pbatch.master_album_streamed(
        tracks5, params, cfg, chunk_seconds=0.4, progress_cb=msgs.append,
        checkpoint_dir=ckpt2, checkpoint_every=2)
    assert any(m.startswith("Resuming from checkpoint: 2/") for m in msgs)
    for i in range(2):
        np.testing.assert_allclose(outs[i], full5[i], rtol=1e-12, atol=1e-14)
        assert abs(measured[i] - m_full5[i]) < 1e-12


def test_resume_with_lufs_rebuilds_missing_cells(tmp_path):
    """Checkpoints written by a no-lufs/no-meters run store no loudness
    cells; a resume that needs them (lufs re-enabled) must rebuild them
    from the saved processed audio instead of crashing on the None
    entries or mis-measuring the prefix."""
    x = make_signal(FS * 2, fs=FS) * 0.4
    p_nolufs = MasteringParams.from_settings(
        {"preset": "techno", "saturation": 10, "lufs": None,
         "multiband": True})
    p_lufs = MasteringParams.from_settings(
        {"preset": "techno", "saturation": 10, "lufs": -14.0,
         "multiband": True})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")

    ckpt = str(tmp_path / "job_nolufs")

    class Stop(Exception):
        pass

    def interrupt(msg):
        if "Processed chunk 2/" in msg:
            raise Stop()

    try:
        streaming.master_streamed(x, p_nolufs, cfg, chunk_seconds=0.5,
                                  progress_cb=interrupt, checkpoint_dir=ckpt)
    except Stop:
        pass

    fresh, m_fresh, g_fresh, met_fresh = streaming.master_streamed(
        x, p_lufs, cfg, chunk_seconds=0.5, return_meters=True)
    out, m, g, met = streaming.master_streamed(
        x, p_lufs, cfg, chunk_seconds=0.5, checkpoint_dir=ckpt,
        return_meters=True)
    np.testing.assert_allclose(out, fresh, rtol=1e-12, atol=1e-14)
    assert abs(m - m_fresh) < 1e-12
    np.testing.assert_allclose(met["momentary_lufs"],
                               met_fresh["momentary_lufs"],
                               rtol=1e-9, atol=1e-12)


def test_album_resume_with_lufs_rebuilds_missing_cells(tmp_path):
    from python_audio_mastering_tpu.parallel import batch as pbatch

    tracks = [make_signal(FS * 2, fs=FS, seed=s) * 0.4 for s in (1, 2)]
    p_nolufs = MasteringParams.from_settings(
        {"preset": "pop", "saturation": 5, "lufs": None, "multiband": True})
    p_lufs = MasteringParams.from_settings(
        {"preset": "pop", "saturation": 5, "lufs": -15.0, "multiband": True})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")
    ckpt = str(tmp_path / "album_nolufs")

    class Stop(Exception):
        pass

    def interrupt(msg):
        if "Processed chunk 2/" in msg:
            raise Stop()

    try:
        pbatch.master_album_streamed(tracks, p_nolufs, cfg, chunk_seconds=0.5,
                                     progress_cb=interrupt,
                                     checkpoint_dir=ckpt)
    except Stop:
        pass

    fresh, m_fresh = pbatch.master_album_streamed(tracks, p_lufs, cfg,
                                                  chunk_seconds=0.5)
    outs, measured = pbatch.master_album_streamed(tracks, p_lufs, cfg,
                                                  chunk_seconds=0.5,
                                                  checkpoint_dir=ckpt)
    for o, f in zip(outs, fresh):
        np.testing.assert_allclose(o, f, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(measured, m_fresh, rtol=1e-12, atol=1e-12)
