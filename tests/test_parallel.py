"""Album batching + mesh sharding on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from python_audio_mastering_tpu import ChainConfig, MasteringParams
from python_audio_mastering_tpu.models.chain import master
from python_audio_mastering_tpu.parallel import batch as pbatch
from python_audio_mastering_tpu.parallel import mesh as pmesh
from tests.conftest import make_signal

FS = 44100


def test_mesh_has_8_virtual_devices():
    m = pmesh.make_mesh()
    assert m.devices.size == 8


def test_album_matches_per_track_mastering():
    cfg = ChainConfig(sample_rate=FS, dtype="float64")
    tracks = [make_signal(FS + i * 4410, fs=FS, seed=i) * 0.4 for i in range(4)]
    params = [MasteringParams.from_settings({"preset": p, "lufs": -14.0})
              for p in ("techno", "pop", "rock", "dubstep")]
    album = pbatch.master_album(tracks, params, cfg)
    assert len(album) == 4
    for t, p, out in zip(tracks, params, album):
        solo = np.asarray(master(t.astype(np.float64), p, cfg))
        assert out.shape == t.shape
        # zero padding is benign: gated loudness ignores the silent tail
        np.testing.assert_allclose(out, solo, rtol=1e-6, atol=1e-7)


def test_album_single_params_broadcast():
    cfg = ChainConfig(sample_rate=FS, dtype="float64")
    tracks = [make_signal(FS // 2, fs=FS, seed=i) * 0.3 for i in range(3)]
    p = MasteringParams.from_settings({"saturation": 15, "lufs": -16.0})
    album = pbatch.master_album(tracks, p, cfg)  # 3 tracks on 8 devices → pads
    assert len(album) == 3


def test_album_sharded_across_devices():
    """The batch must actually be partitioned over the tracks axis."""
    cfg = ChainConfig(sample_rate=FS, dtype="float32")
    m = pmesh.make_mesh()
    batch = np.stack([make_signal(FS // 2, fs=FS, seed=i).astype(np.float32) * 0.3
                      for i in range(8)])
    params = pbatch.stack_params(
        [MasteringParams.from_settings({"lufs": -14.0})] * 8)
    fn = pbatch.make_album_fn(cfg, m)
    lengths = np.full((8,), batch.shape[1], dtype=np.int64)
    out = fn(batch, params, lengths)
    assert len(out.sharding.device_set) == 8
    assert out.shape == batch.shape


def test_stack_params_rejects_mixed_static_switches():
    with pytest.raises(ValueError):
        pbatch.stack_params([
            MasteringParams.from_settings({"multiband": True}),
            MasteringParams.from_settings({"multiband": False}),
        ])


def test_album_streamed_matches_per_track_streamed():
    """Batched+chunked streaming == per-track streaming exactly
    (BASELINE config 5 path)."""
    from python_audio_mastering_tpu.parallel import streaming

    cfg = ChainConfig(sample_rate=FS, dtype="float64")
    tracks = [make_signal(FS + i * 4410, fs=FS, seed=i) * 0.4 for i in range(2)]
    params = [MasteringParams.from_settings({"preset": p, "lufs": -14.0,
                                             "multiband": True})
              for p in ("techno", "pop")]
    outs, measured = pbatch.master_album_streamed(tracks, params, cfg,
                                                  chunk_seconds=0.5)
    for i, (t, p) in enumerate(zip(tracks, params)):
        solo, m_solo, _ = streaming.master_streamed(t, p, cfg,
                                                    chunk_seconds=0.5)
        np.testing.assert_allclose(outs[i], solo, rtol=0, atol=1e-10)
        assert abs(float(measured[i]) - m_solo) < 1e-9


def test_album_streamed_on_track_done():
    """Per-track completion callback: called exactly once per track with
    the same audio the return value carries (plus that track's meters),
    so callers can export/upload each track as its readback lands instead
    of waiting on an album-wide barrier."""
    cfg = ChainConfig(sample_rate=FS, dtype="float32")
    tracks = [make_signal(FS + i * 4410, fs=FS, seed=i) * 0.4
              for i in range(3)]
    params = MasteringParams.from_settings({"preset": "pop", "lufs": -14.0})
    got = {}

    def cb(i, audio, meters):
        got[i] = (np.array(audio, copy=True), meters)

    outs, _, meters = pbatch.master_album_streamed(
        tracks, params, cfg, chunk_seconds=0.5, return_meters=True,
        on_track_done=cb)
    assert sorted(got) == [0, 1, 2]
    for i in range(3):
        np.testing.assert_array_equal(got[i][0], outs[i])
        assert got[i][1] is meters[i]
        assert np.isfinite(got[i][1]["integrated_lufs"])
    # without return_meters the callback's meters argument is None
    got.clear()
    pbatch.master_album_streamed(tracks, params, cfg, chunk_seconds=0.5,
                                 on_track_done=cb)
    assert all(got[i][1] is None for i in range(3))


def test_album_streamed_pcm16_and_timings():
    """pcm16 link format matches float32 within the PCM16 noise floor and
    the timings breakdown accounts for h2d/compute/d2h."""
    cfg = ChainConfig(sample_rate=FS, dtype="float32")
    tracks = [make_signal(int(FS * 1.2), seed=i) * 0.4 for i in range(4)]
    params = MasteringParams.from_settings(
        {"saturation": 10, "preset": "pop", "lufs": -14.0, "multiband": True})
    outs_f, meas_f = pbatch.master_album_streamed(tracks, params, cfg,
                                                  chunk_seconds=0.5)
    tm = {}
    outs_p, meas_p = pbatch.master_album_streamed(tracks, params, cfg,
                                                  chunk_seconds=0.5,
                                                  transfer="pcm16", timings=tm)
    for a, b in zip(outs_f, outs_p):
        assert np.max(np.abs(a - b)) < 3e-3
    np.testing.assert_allclose(meas_p, meas_f, atol=0.01)
    assert tm["h2d_s"] > 0 and tm["compute_s"] > 0 and tm["d2h_s"] > 0
    # the wire carries int16: exactly 2 bytes/sample on the padded batch
    from python_audio_mastering_tpu.parallel import streaming as pstream

    cf = pstream.default_chunk_frames(cfg, 0.5)
    n_pad = -(-tracks[0].shape[0] // cf) * cf
    t_pad = pmesh.make_mesh().devices.size  # tracks padded to a device multiple
    assert tm["wire_bytes_in"] == t_pad * n_pad * 2 * 2  # T×N_pad×C×int16


def test_album_streamed_lookahead_quality_mode():
    """limiter_mode="lookahead_truepeak" works in the batched album path:
    each track equals its own one-shot quality-mode master (the padded
    zeros past a track's end match the one-shot limiter's edge padding)."""
    import dataclasses

    from python_audio_mastering_tpu.models.chain import master

    cfg = dataclasses.replace(
        ChainConfig(sample_rate=FS, dtype="float64"),
        limiter_mode="lookahead_truepeak")
    tracks = [(make_signal(int(FS * (0.9 + 0.4 * i)), seed=i) * 0.9)
              for i in range(3)]  # hot tracks -> limiter active
    params = MasteringParams.from_settings({"preset": "rock", "lufs": -9.0})
    outs, _ = pbatch.master_album_streamed(tracks, params, cfg,
                                           chunk_seconds=0.5)
    for i, t in enumerate(tracks):
        ref = np.asarray(master(t, params, cfg))
        assert outs[i].shape == ref.shape
        np.testing.assert_allclose(outs[i], ref, rtol=1e-9, atol=1e-9)


def test_album_meters_match_per_track_streamed():
    """Album return_meters: every track's R128 meter family equals its own
    single-track streamed measurement (VERDICT r2 #4)."""
    from python_audio_mastering_tpu.parallel import streaming

    # track lengths straddle the 3 s short-term window so LRA is defined
    # for the long tracks and nan for the short one (both paths must agree)
    tracks = [make_signal(int(FS * sec), fs=FS, seed=s) * 0.4
              for s, sec in ((11, 3.6), (12, 3.3), (13, 1.3))]
    params = MasteringParams.from_settings(
        {"preset": "techno", "saturation": 8, "lufs": -15.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")

    outs, measured, meters = pbatch.master_album_streamed(
        tracks, params, cfg, chunk_seconds=0.5, return_meters=True)

    for i, t in enumerate(tracks):
        ref_out, ref_m, ref_g, ref_meters = streaming.master_streamed(
            t, params, cfg, chunk_seconds=0.5, return_meters=True)
        np.testing.assert_allclose(outs[i], ref_out, rtol=1e-12, atol=1e-14)
        m = meters[i]
        np.testing.assert_allclose(m["momentary_lufs"],
                                   ref_meters["momentary_lufs"],
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(m["short_term_lufs"],
                                   ref_meters["short_term_lufs"],
                                   rtol=1e-10, atol=1e-10)
        if np.isnan(ref_meters["lra_lu"]):
            assert np.isnan(m["lra_lu"])
        else:
            assert abs(m["lra_lu"] - ref_meters["lra_lu"]) < 1e-9
        assert abs(m["true_peak_dbtp"] - ref_meters["true_peak_dbtp"]) < 1e-9
        assert abs(m["integrated_lufs"]
                   - ref_meters["integrated_lufs"]) < 1e-9


def test_album_no_lufs_skips_cells():
    """With LUFS off and no meters requested, the fx pass must not compute
    loudness cells at all (VERDICT r2 #6/#7) — and output is unchanged."""
    from python_audio_mastering_tpu.parallel import streaming

    x = make_signal(int(FS * 0.9), fs=FS, seed=20) * 0.4
    params = MasteringParams.from_settings({"preset": "pop", "lufs": None})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")
    out, measured, gain_db = streaming.master_streamed(x, params, cfg,
                                                       chunk_seconds=0.4)
    assert gain_db == 0.0 and not np.isfinite(measured)

    # direct check: need_cells=False returns no cells and identical audio
    import jax.numpy as jnp

    y1, s1, c1 = streaming._fx_chunk(jnp.asarray(x), params, cfg,
                                     streaming.StreamState(), first=True,
                                     variant_mb=cfg.variant,
                                     need_cells=False)
    y2, s2, c2 = streaming._fx_chunk(jnp.asarray(x), params, cfg,
                                     streaming.StreamState(), first=True,
                                     variant_mb=cfg.variant,
                                     need_cells=True)
    assert c1 is None and s1.kw_zi is None and c2 is not None
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_album_streamed_rows_form_matches_one_shot():
    """Block-aligned chunks engage the rows-resident batched body (the
    production geometry — see streaming.default_chunk_frames); the result
    must equal per-track one-shot masters exactly.  fs=12800 makes the
    rows chunk 2560 frames so the test is CPU-cheap."""
    from python_audio_mastering_tpu import master
    from python_audio_mastering_tpu.parallel import streaming

    fs = 12800
    cfg = ChainConfig(sample_rate=fs, dtype="float64",
                      filter_method="blocked")
    assert streaming.default_chunk_frames(cfg, 0.4) % cfg.block_size == 0
    tracks = [make_signal(int(fs * 1.1) + 257 * i, fs=fs, seed=i) * 0.4
              for i in range(3)]
    params = [MasteringParams.from_settings({"preset": p, "lufs": -14.0,
                                             "multiband": True})
              for p in ("techno", "pop", "rock")]
    outs, measured, meters = pbatch.master_album_streamed(
        tracks, params, cfg, chunk_seconds=0.4, return_meters=True)
    for i, (t, p) in enumerate(zip(tracks, params)):
        solo = np.asarray(master(t, p, cfg))
        np.testing.assert_allclose(outs[i], solo, rtol=0, atol=1e-10)
        assert np.isfinite(meters[i]["true_peak_dbtp"])
