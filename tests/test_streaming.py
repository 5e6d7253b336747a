"""Streamed (chunked, carried-state) execution vs the one-shot fused graph."""

import numpy as np
import pytest

from python_audio_mastering_tpu import ChainConfig, MasteringParams, master
from python_audio_mastering_tpu.parallel import streaming
from tests.conftest import make_signal

FS = 44100


def _run(settings, seconds=3.0, chunk_seconds=0.9, config=None, **kw):
    x = make_signal(int(FS * seconds), fs=FS) * 0.4
    params = MasteringParams.from_settings(settings)
    cfg = config or ChainConfig(sample_rate=FS, dtype="float64", filter_method="auto")
    one_shot = np.asarray(master(x, params, cfg))
    streamed, measured, gain_db = streaming.master_streamed(
        x, params, cfg, chunk_seconds=chunk_seconds, **kw)
    return x, one_shot, streamed, measured


def test_streamed_equals_one_shot_basic():
    _, full, streamed, _ = _run(
        {"saturation": 20, "preset": "techno", "width": 1.3, "lufs": -14.0})
    np.testing.assert_allclose(streamed, full, rtol=1e-9, atol=1e-11)


def test_streamed_equals_one_shot_multiband():
    _, full, streamed, _ = _run(
        {"saturation": 10, "bass_boost": 3.0, "lufs": -14.0, "multiband": True},
        seconds=2.0, chunk_seconds=0.5)
    np.testing.assert_allclose(streamed, full, rtol=1e-9, atol=1e-11)


def test_streamed_with_hop_and_blocked_ballistics():
    cfg = ChainConfig(sample_rate=FS, dtype="float64", filter_method="blocked",
                      comp_hop=8, comp_block_ctrl=512)
    _, full, streamed, _ = _run(
        {"saturation": 10, "bass_boost": 3.0, "lufs": -14.0, "multiband": True},
        seconds=2.0, chunk_seconds=0.5, config=cfg)
    # approximate mode: hop decimation + blocked-ballistics warm-up
    # boundaries differ between chunked and one-shot execution; hold the
    # fast-mode budget (rms ~0.03 dB on a 0.4-peak signal) instead.
    assert np.sqrt(np.mean((streamed - full) ** 2)) < 2e-3
    assert np.max(np.abs(streamed - full)) < 2e-2


def test_streamed_partial_last_chunk():
    """N not divisible by the chunk length (and not by the cell)."""
    x = make_signal(int(FS * 1.77) + 123, fs=FS) * 0.4
    params = MasteringParams.from_settings({"preset": "pop", "lufs": -15.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")
    full = np.asarray(master(x, params, cfg))
    streamed, _, _ = streaming.master_streamed(x, params, cfg, chunk_seconds=0.6)
    np.testing.assert_allclose(streamed, full, rtol=1e-9, atol=1e-11)


def test_progress_callback_messages():
    msgs = []
    x = make_signal(FS, fs=FS) * 0.3
    params = MasteringParams.from_settings({"lufs": -16.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")
    streaming.master_streamed(x, params, cfg, chunk_seconds=0.4,
                              progress_cb=msgs.append)
    assert any("Processed chunk 1/" in m for m in msgs)
    assert any(m.startswith("Finalizing") for m in msgs)


def test_reference_reset_mode_differs_at_boundaries():
    """carry_state=False reproduces the reference's per-chunk state resets —
    the output must differ from the carried version (documented defect)."""
    x = make_signal(FS * 2, fs=FS) * 0.4
    params = MasteringParams.from_settings({"preset": "techno", "lufs": None})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")
    carried, _, _ = streaming.master_streamed(x, params, cfg, chunk_seconds=0.5)
    reset, _, _ = streaming.master_streamed(x, params, cfg, chunk_seconds=0.5,
                                            carry_state=False)
    assert np.max(np.abs(carried - reset)) > 1e-6


def test_pcm16_transfer_matches_float32():
    """int16-over-the-link mode: de/requantization adds only the PCM16
    noise floor (~-96 dBFS, scaled by the chain gain)."""
    x = make_signal(int(FS * 2.0), fs=FS) * 0.4
    params = MasteringParams.from_settings(
        {"saturation": 15, "preset": "pop", "lufs": -14.0, "multiband": True})
    cfg = ChainConfig(sample_rate=FS, dtype="float32")
    f32, m32, _ = streaming.master_streamed(x, params, cfg, chunk_seconds=0.5)
    p16, m16, _ = streaming.master_streamed(x, params, cfg, chunk_seconds=0.5,
                                            transfer="pcm16")
    assert np.max(np.abs(p16 - f32)) < 3e-3
    assert np.sqrt(np.mean((p16 - f32) ** 2)) < 3e-4
    assert abs(m16 - m32) < 0.01


def test_unknown_transfer_format_rejected():
    x = make_signal(4410, fs=FS) * 0.4
    params = MasteringParams.from_settings({"lufs": -14.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float32")
    with pytest.raises(ValueError, match="transfer"):
        streaming.master_streamed(x, params, cfg, transfer="pcm12")


def test_streamed_lookahead_limiter_matches_one_shot():
    """Quality mode streams: carried delay-line + release state makes the
    chunked lookahead limiter equal the one-shot master()."""
    x = make_signal(int(FS * 2.2) + 123, fs=FS) * 0.9  # hot: limiter engages
    params = MasteringParams.from_settings(
        {"saturation": 20, "preset": "techno", "lufs": -9.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float64",
                      limiter_mode="lookahead_truepeak")
    full = np.asarray(master(x, params, cfg))
    streamed, _, _ = streaming.master_streamed(x, params, cfg,
                                               chunk_seconds=0.6)
    assert np.abs(full).max() > 0.5  # the limiter actually worked
    np.testing.assert_allclose(streamed, full, rtol=1e-9, atol=1e-10)


def test_streamed_lookahead_multiband_and_partial_chunk():
    x = make_signal(int(FS * 1.83) + 77, fs=FS) * 0.8
    params = MasteringParams.from_settings(
        {"bass_boost": 3.0, "lufs": -10.0, "multiband": True})
    cfg = ChainConfig(sample_rate=FS, dtype="float64",
                      limiter_mode="lookahead_truepeak")
    full = np.asarray(master(x, params, cfg))
    streamed, _, _ = streaming.master_streamed(x, params, cfg,
                                               chunk_seconds=0.5)
    np.testing.assert_allclose(streamed, full, rtol=1e-9, atol=1e-10)


def test_streamed_meters_match_one_shot_meters():
    """Meters stream from the accumulated cells: momentary/short-term/LRA
    and true peak equal the one-shot meter family on the output signal
    (quiet target, so the reference limiter is exactly identity)."""
    from python_audio_mastering_tpu.ops import meters as met

    x = make_signal(int(FS * 5.0), fs=FS) * 0.4
    params = MasteringParams.from_settings({"preset": "pop", "lufs": -20.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")
    out, measured, gain_db, meters = streaming.master_streamed(
        x, params, cfg, chunk_seconds=1.0, return_meters=True)
    assert np.abs(out).max() < 0.98  # limiter inactive -> out == normalized
    mom_ref = np.asarray(met.momentary_loudness(
        out, FS, downmix="reference_mono_mean"))
    st_ref = np.asarray(met.shortterm_loudness(
        out, FS, downmix="reference_mono_mean"))
    np.testing.assert_allclose(meters["momentary_lufs"], mom_ref,
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(meters["short_term_lufs"], st_ref,
                               rtol=0, atol=1e-6)
    import jax.numpy as jnp

    lra_ref = float(met.lra_from_shortterm(jnp.asarray(st_ref)))
    assert abs(meters["lra_lu"] - lra_ref) < 1e-6
    tp_ref = float(met.true_peak_db(out))
    assert abs(meters["true_peak_dbtp"] - tp_ref) < 1e-6
    assert abs(meters["integrated_lufs"] - (-20.0)) < 0.05


def test_streamed_true_peak_exact_on_ragged_length():
    """The streamed true-peak meter must equal the one-shot meter even when
    the track length is NOT a chunk multiple (the padded ring-out tail of
    the final chunk must never be measured) and at interior chunk
    boundaries (zero-context interpolator edge evaluations are excluded
    and re-evaluated with real context via the carried tail)."""
    from python_audio_mastering_tpu.ops import meters as met

    # 2.37 s at 1 s chunks -> ragged final chunk; hot signal so the
    # limiter and true peak are active near full scale
    x = make_signal(int(FS * 2.37), fs=FS) * 0.9
    params = MasteringParams.from_settings({"preset": "rock", "lufs": -10.0})
    cfg = ChainConfig(sample_rate=FS, dtype="float64")
    out, _, _, meters = streaming.master_streamed(
        x, params, cfg, chunk_seconds=1.0, return_meters=True)
    tp_ref = float(met.true_peak_db(out))
    assert abs(meters["true_peak_dbtp"] - tp_ref) < 1e-9


def test_true_peak_exclude_pad_windows():
    """exclude_pad drops exactly the interpolation windows touching the
    zero padding: excluding both sides of a signal with silent edges
    changes nothing; excluding the tail of a hot-edged signal removes the
    edge overshoot that zero-context interpolation can invent."""
    from python_audio_mastering_tpu.ops import meters as met
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    quiet_edges = np.zeros(4096)
    quiet_edges[64:-64] = rng.standard_normal(4096 - 128) * 0.5
    full = float(met.true_peak_linear(jnp.asarray(quiet_edges)))
    excl = float(met.true_peak_linear(jnp.asarray(quiet_edges),
                                      exclude_pad=(True, True)))
    assert abs(full - excl) < 1e-12

    # direct sample peaks are always covered even when windows are excluded
    hot = np.zeros(256)
    hot[-1] = 0.99
    excl = float(met.true_peak_linear(jnp.asarray(hot),
                                      exclude_pad=(True, True)))
    assert excl >= 0.99


# -- rows-resident streaming (block-aligned chunks) -------------------------
#
# At 44.1 kHz the rows chunk geometry is lcm(cell, hop, 512) = 25.6 s —
# too slow for a CPU unit test.  fs = 12800 gives cell = 1280 and
# lcm(1280, 512) = 2560 frames (0.2 s) with the same code path: chunks are
# block-aligned, so master_streamed's rows gate engages exactly as it does
# for production 30 s chunks at 44.1 kHz.
FS_ROWS = 12800


def _rows_cfg(**kw):
    kw.setdefault("dtype", "float64")
    return ChainConfig(sample_rate=FS_ROWS, filter_method="blocked", **kw)


def test_rows_chunk_geometry_engages():
    cfg = _rows_cfg()
    frames = streaming.default_chunk_frames(cfg, 0.4)
    assert frames == 5120 and frames % cfg.block_size == 0
    # production geometry at 44.1 kHz: 30 s requests quantize to 25.6 s
    cfg44 = ChainConfig(sample_rate=44100, filter_method="blocked",
                        comp_hop=8, comp_block_ctrl=2048)
    assert streaming.default_chunk_frames(cfg44, 30.0) == 1128960
    # short requests keep the cell/hop alignment (channel-major body)
    assert streaming.default_chunk_frames(cfg44, 0.5) % 4410 == 0


def test_rows_streamed_equals_one_shot():
    x = make_signal(int(FS_ROWS * 1.05) + 321, fs=FS_ROWS) * 0.4
    params = MasteringParams.from_settings(
        {"saturation": 15, "bass_boost": 2.0, "width": 1.2, "lufs": -15.0,
         "multiband": True})
    cfg = _rows_cfg()
    full = np.asarray(master(x, params, cfg))
    streamed, measured, _ = streaming.master_streamed(
        x, params, cfg, chunk_seconds=0.4)
    # the gate must actually have engaged (chunks block-aligned → rows)
    assert streaming.default_chunk_frames(cfg, 0.4) % cfg.block_size == 0
    np.testing.assert_allclose(streamed, full, rtol=1e-9, atol=1e-11)


def test_rows_streamed_meters_and_pcm16():
    x = make_signal(int(FS_ROWS * 1.2), fs=FS_ROWS) * 0.4
    params = MasteringParams.from_settings({"preset": "pop", "lufs": -14.0})
    cfg = _rows_cfg(dtype="float32")
    out32, _, _ = streaming.master_streamed(x, params, cfg,
                                            chunk_seconds=0.4)
    out16, _, _, meters = streaming.master_streamed(
        x, params, cfg, chunk_seconds=0.4, transfer="pcm16",
        return_meters=True)
    assert np.max(np.abs(out16 - out32)) < 2.5 / streaming.PCM16_SCALE
    assert np.isfinite(meters["true_peak_dbtp"])
    assert np.isfinite(meters["integrated_lufs"])


def test_rows_checkpoint_resume_cross_layout(tmp_path):
    """A checkpoint written mid-run by the rows body resumes to the exact
    uninterrupted output (the on-disk format stays 'cn', so resumes are
    layout-portable)."""
    x = make_signal(int(FS_ROWS * 1.0) + 77, fs=FS_ROWS) * 0.4
    params = MasteringParams.from_settings(
        {"saturation": 10, "lufs": -14.0, "multiband": True})
    cfg = _rows_cfg()
    full, _, _ = streaming.master_streamed(x, params, cfg, chunk_seconds=0.2)

    def boom(msg):
        if msg.startswith("Processed chunk 2/"):
            raise KeyboardInterrupt

    ck = str(tmp_path / "ck")
    with pytest.raises(KeyboardInterrupt):
        streaming.master_streamed(x, params, cfg, chunk_seconds=0.2,
                                  checkpoint_dir=ck, progress_cb=boom)
    resumed, _, _ = streaming.master_streamed(
        x, params, cfg, chunk_seconds=0.2, checkpoint_dir=ck)
    np.testing.assert_allclose(resumed, full, rtol=1e-11, atol=1e-12)


def test_bounded_device_memory_memmap(tmp_path):
    """VERDICT r3 #5: a memmap file masters with BOUNDED device residency —
    pass-A chunks beyond the budget spill to the host and re-upload in
    pass B — and the output equals the fully device-resident run."""
    import dataclasses

    x = make_signal(int(FS_ROWS * 4.0), fs=FS_ROWS) * 0.4
    params = MasteringParams.from_settings(
        {"saturation": 10, "preset": "pop", "lufs": -15.0,
         "multiband": True})
    cfg = _rows_cfg(dtype="float32")
    ref, _, _ = streaming.master_streamed(x, params, cfg, chunk_seconds=0.4)

    mm_path = tmp_path / "long.f32"
    mm = np.memmap(mm_path, dtype=np.float32, mode="w+", shape=x.shape)
    mm[:] = x.astype(np.float32)
    mm.flush()
    mm = np.memmap(mm_path, dtype=np.float32, mode="r", shape=x.shape)

    chunk_frames = streaming.default_chunk_frames(cfg, 0.4)
    chunk_bytes = chunk_frames * x.shape[1] * 4
    # budget = 2 retained chunks (the floor) → most chunks must spill
    tight = dataclasses.replace(cfg, device_budget_bytes=4 * chunk_bytes)
    stats = {}
    out, _, _ = streaming.master_streamed(mm, params, tight,
                                          chunk_seconds=0.4, stats=stats)
    assert not stats["device_resident"]
    assert stats["spilled_chunks"] > 0
    assert stats["max_retained_bytes"] <= 4 * chunk_bytes
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)

    # pcm16 wire: the spill adds a second pre-gain quantization that the
    # LUFS gain then amplifies — stays inside the documented pcm16 budget
    # (DESIGN.md §4: ≤3e-3 peak after chain gain)
    out16, _, _ = streaming.master_streamed(mm, params, tight,
                                            chunk_seconds=0.4,
                                            transfer="pcm16")
    assert np.max(np.abs(out16 - ref)) < 3e-3


def test_bounded_album_spill_matches_resident():
    """Album runner: the bounded mode (spilled pass-A chunks, immediate
    finalize readback) equals the device-resident album bit-for-bit in
    float32 wire mode."""
    import dataclasses

    from python_audio_mastering_tpu.parallel import batch as pbatch
    from python_audio_mastering_tpu.parallel.mesh import make_mesh

    tracks = [make_signal(int(FS_ROWS * 2.0) + 777 * i, fs=FS_ROWS,
                          seed=i) * 0.4 for i in range(3)]
    params = MasteringParams.from_settings(
        {"saturation": 10, "lufs": -15.0, "multiband": True})
    cfg = _rows_cfg(dtype="float32")
    mesh = make_mesh(devices=None)

    ref_outs, ref_lufs = pbatch.master_album_streamed(
        tracks, params, cfg, mesh=mesh, chunk_seconds=0.4)

    chunk_frames = streaming.default_chunk_frames(cfg, 0.4)
    chunk_bytes = 4 * chunk_frames * 2 * 4  # padded to 4 tracks x C=2
    tight = dataclasses.replace(cfg, device_budget_bytes=4 * chunk_bytes)
    tm = {}
    outs, lufs = pbatch.master_album_streamed(
        tracks, params, tight, mesh=mesh, chunk_seconds=0.4, timings=tm)
    assert not tm["device_resident"]
    assert tm["spilled_chunks"] > 0
    for o, r in zip(outs, ref_outs):
        np.testing.assert_allclose(o, r, rtol=0, atol=0)
    np.testing.assert_allclose(lufs, ref_lufs, rtol=0, atol=0)


def test_bounded_spill_lookahead_quality_mode():
    """Spilled pcm16 pass-A chunks through the QUALITY (lookahead) pass-B:
    the limiter's finalize must dequantize spilled int16 chunks and match
    the unspilled quality run within the pcm16 budget."""
    import dataclasses

    x = make_signal(int(FS_ROWS * 2.5), fs=FS_ROWS) * 0.6
    params = MasteringParams.from_settings(
        {"saturation": 10, "preset": "pop", "lufs": -12.0})
    cfg = _rows_cfg(dtype="float32", limiter_mode="lookahead_truepeak")
    ref, _, _ = streaming.master_streamed(x, params, cfg, chunk_seconds=0.4,
                                          transfer="pcm16")
    chunk_frames = streaming.default_chunk_frames(cfg, 0.4)
    tight = dataclasses.replace(
        cfg, device_budget_bytes=4 * chunk_frames * x.shape[1] * 4)
    stats = {}
    out, _, _ = streaming.master_streamed(x, params, tight,
                                          chunk_seconds=0.4,
                                          transfer="pcm16", stats=stats)
    assert stats["spilled_chunks"] > 0
    assert np.max(np.abs(out - ref)) < 3e-3
