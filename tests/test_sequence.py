"""Sequence parallelism: one track sharded over the 8-device mesh."""

import numpy as np
import pytest

from python_audio_mastering_tpu import ChainConfig, MasteringParams, master
from python_audio_mastering_tpu.parallel import sequence
from tests.conftest import make_signal

FS = 44100


def test_sharded_track_exact_without_multiband():
    x = make_signal(FS * 4, fs=FS) * 0.4
    p = MasteringParams.from_settings(
        {"saturation": 20, "preset": "techno", "width": 1.3, "lufs": -14.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float64", filter_method="blocked")
    ref = np.asarray(master(x, p, cfg))
    got, measured, gain_db = sequence.master_track_sharded(x, p, cfg)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-11)
    assert np.isfinite(measured) and np.isfinite(gain_db)


def test_sharded_track_multiband_within_fast_budget():
    x = make_signal(FS * 4, fs=FS) * 0.4
    p = MasteringParams.from_settings(
        {"saturation": 10, "bass_boost": 3.0, "lufs": -14.0, "multiband": True})
    cfg = ChainConfig(sample_rate=FS, dtype="float64", filter_method="blocked",
                      comp_hop=8, comp_block_ctrl=512)
    ref = np.asarray(master(x, p, cfg))
    got, _, _ = sequence.master_track_sharded(x, p, cfg)
    d = got - ref
    assert np.sqrt((d ** 2).mean()) < 4e-3
    assert np.abs(d).max() < 0.1


def test_sharded_track_unaligned_length():
    x = make_signal(FS * 2 + 1234, fs=FS) * 0.3
    p = MasteringParams.from_settings({"preset": "pop", "lufs": -16.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float64", filter_method="blocked")
    ref = np.asarray(master(x, p, cfg))
    got, _, _ = sequence.master_track_sharded(x, p, cfg)
    assert got.shape == x.shape
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-11)


def test_sharded_track_multiband_exact_mode():
    """sp_ballistics='exact': sequential ppermute handoff makes the sharded
    multiband chain equal the one-shot exact contract at float tolerance."""
    x = make_signal(FS * 2, fs=FS) * 0.4
    p = MasteringParams.from_settings(
        {"saturation": 10, "bass_boost": 3.0, "lufs": -14.0, "multiband": True})
    # exact contract: hop=1, scan ballistics (ChainConfig defaults)
    cfg = ChainConfig(sample_rate=FS, dtype="float64", filter_method="blocked",
                      comp_ballistics="scan")
    ref = np.asarray(master(x, p, cfg))
    got, _, _ = sequence.master_track_sharded(x, p, cfg, sp_ballistics="exact")
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-11)


def test_sharded_track_exact_mode_with_hop():
    """Exact mode also matches at decimated hop configs (exact *given* the
    config's own hop grid)."""
    x = make_signal(FS * 2, fs=FS) * 0.4
    p = MasteringParams.from_settings(
        {"lufs": -14.0, "multiband": True, "low_thresh": -30.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float64", filter_method="blocked",
                      comp_hop=8, comp_ballistics="scan")
    ref = np.asarray(master(x, p, cfg))
    got, _, _ = sequence.master_track_sharded(x, p, cfg, sp_ballistics="exact")
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-11)


def test_album_sharded_2d_matches_per_track():
    """2-D (tracks × frames) mesh: dp composed with sp.  Each track of the
    album must equal its own single-device one-shot master (exact without
    multiband), with per-track LUFS gating masked to each track's length."""
    from python_audio_mastering_tpu.parallel.mesh import make_mesh_2d
    from python_audio_mastering_tpu.parallel.sequence import (
        master_album_sharded)

    cfg = ChainConfig(sample_rate=FS, dtype="float64", filter_method="blocked")
    tracks = [make_signal(int(FS * 1.3), fs=FS, seed=s) * 0.5
              for s in (0, 1)] + [make_signal(int(FS * 0.9), fs=FS, seed=2) * 0.4]
    params = MasteringParams.from_settings(
        {"preset": "pop", "saturation": 15, "width": 1.2, "lufs": -17.0})
    mesh = make_mesh_2d(tracks=2)  # 8 virtual devices -> 2 x 4
    assert mesh.devices.shape == (2, 4)
    outs, measured = master_album_sharded(tracks, params, cfg, mesh=mesh)
    assert len(outs) == 3
    for i, t in enumerate(tracks):
        ref = np.asarray(master(t, params, cfg))
        assert outs[i].shape == ref.shape
        np.testing.assert_allclose(outs[i], ref, rtol=1e-9, atol=1e-11)
        assert np.isfinite(measured[i])


def test_sharded_lookahead_limiter_exact():
    """Quality mode under sequence parallelism: the halo-exchanged
    erosion/average + composed clamp-affine release must equal the
    one-shot lookahead limiter at float tolerance, including the
    end-replication emulation at the (unaligned) true track end."""
    x = make_signal(FS * 2 + 1234, fs=FS) * 0.95  # hot -> limiter active
    p = MasteringParams.from_settings({"preset": "rock", "lufs": -9.0})
    import dataclasses

    cfg = dataclasses.replace(
        ChainConfig(sample_rate=FS, dtype="float64", filter_method="blocked"),
        limiter_mode="lookahead_truepeak")
    ref = np.asarray(master(x, p, cfg))
    assert np.abs(ref).max() < np.abs(np.asarray(x)).max()  # it limited
    got, _, _ = sequence.master_track_sharded(x, p, cfg)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-11)


def test_album_sharded_2d_quality_mode():
    """Quality mode composes with 2-D (tracks × frames) parallelism: the
    vmapped sharded lookahead limiter (halo ppermutes + psum + composed
    release) batches across the tracks axis."""
    import dataclasses

    from python_audio_mastering_tpu.parallel.mesh import make_mesh_2d
    from python_audio_mastering_tpu.parallel.sequence import (
        master_album_sharded)

    cfg = dataclasses.replace(
        ChainConfig(sample_rate=FS, dtype="float64", filter_method="blocked"),
        limiter_mode="lookahead_truepeak")
    tracks = [make_signal(int(FS * 1.1), fs=FS, seed=s) * 0.9 for s in (0, 1)]
    params = MasteringParams.from_settings({"preset": "rock", "lufs": -9.0})
    outs, _ = master_album_sharded(tracks, params, cfg,
                                   mesh=make_mesh_2d(tracks=2))
    for i, t in enumerate(tracks):
        ref = np.asarray(master(t, params, cfg))
        np.testing.assert_allclose(outs[i], ref, rtol=1e-9, atol=1e-11)


def test_sharded_meters_match_streaming_meters():
    """SP return_meters equals the streaming runner's meter family on the
    same signal (same gathered-cells math; sharded true-peak pass)."""
    from python_audio_mastering_tpu.parallel import streaming

    x = make_signal(FS * 3 + 517, fs=FS) * 0.5
    p = MasteringParams.from_settings({"preset": "pop", "lufs": -18.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float64", filter_method="blocked")
    out_s, m_s, g_s, met_s = streaming.master_streamed(
        x, p, cfg, chunk_seconds=1.0, return_meters=True)
    out_q, m_q, g_q, met_q = sequence.master_track_sharded(
        x, p, cfg, return_meters=True)
    np.testing.assert_allclose(out_q, out_s, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(met_q["momentary_lufs"],
                               met_s["momentary_lufs"], rtol=0, atol=1e-9)
    np.testing.assert_allclose(met_q["short_term_lufs"],
                               met_s["short_term_lufs"], rtol=0, atol=1e-9)
    assert abs(met_q["lra_lu"] - met_s["lra_lu"]) < 1e-9
    assert abs(met_q["true_peak_dbtp"] - met_s["true_peak_dbtp"]) < 1e-9
    assert abs(met_q["integrated_lufs"] - met_s["integrated_lufs"]) < 1e-9


def test_album_sharded_2d_rows_pallas_kernels():
    """The 2-D rows body runs the REAL Pallas kernels under vmap (round 5:
    pallas_call's batching rule folds the local-tracks axis into the
    grid — previously this path silently pinned the XLA mirrors).  Each
    track must match its own 1-D sharded master at float32 tolerance with
    the kernels forced on via interpret mode."""
    import dataclasses

    from python_audio_mastering_tpu.parallel.mesh import make_mesh_2d
    from python_audio_mastering_tpu.parallel.sequence import (
        master_album_sharded, master_track_sharded)

    cfg = dataclasses.replace(
        ChainConfig.tpu_default(sample_rate=FS),
        mb_kernel="pallas_interpret")
    assert cfg.variant == "worker" and cfg.limiter_mode == "reference"
    tracks = [make_signal(int(FS * 1.2), fs=FS, seed=s) * 0.5
              for s in (0, 1)]
    params = MasteringParams.from_settings(
        {"preset": "pop", "saturation": 15, "width": 1.2, "lufs": -17.0,
         "multiband": True})
    outs, measured = master_album_sharded(tracks, params, cfg,
                                          mesh=make_mesh_2d(tracks=2))
    for i, t in enumerate(tracks):
        ref, m_ref, _ = master_track_sharded(t, params, cfg)
        np.testing.assert_allclose(outs[i], np.asarray(ref),
                                   rtol=0, atol=5e-5)
        assert abs(float(measured[i]) - float(m_ref)) < 1e-3
