"""Cross-cutting coverage: other sample rates, concurrency isolation,
tracing/logging utilities."""

import threading
import time

import numpy as np
import pytest
import scipy.signal as sps

from python_audio_mastering_tpu import ChainConfig, MasteringParams, master
from python_audio_mastering_tpu.ops import biquad, iir, loudness
from python_audio_mastering_tpu.utils import tracing
from tests.conftest import make_signal
from tests.oracles import bs1770_ref


@pytest.mark.parametrize("fs", [22050, 48000, 96000])
def test_chain_at_other_sample_rates(fs):
    x = make_signal(fs, fs=fs) * 0.4
    p = MasteringParams.from_settings({"preset": "rock", "saturation": 10,
                                       "lufs": -16.0})
    y = np.asarray(master(x, p, ChainConfig(sample_rate=fs, dtype="float64")))
    assert np.isfinite(y).all()
    got = bs1770_ref.integrated_loudness(y.mean(axis=1), fs)
    assert abs(got - (-16.0)) < 0.3


@pytest.mark.parametrize("fs", [22050, 48000])
def test_eq_cascade_matches_scipy_at_rate(fs):
    x = make_signal(8192, fs=fs)
    sos = np.concatenate([
        np.asarray(biquad.reference_shelf_sos(fs, 250, 3.0, "low")),
        np.asarray(biquad.reference_peak_sos(fs, 1000, -2.0)),
    ])
    y_ref = sps.sosfilt(sos, x, axis=0)
    y, _ = iir.sosfilt_blocked(sos, x, block_size=512)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-8, atol=1e-10)


def test_loudness_meter_at_96k():
    fs = 96000
    t = np.arange(3 * fs) / fs
    a = 10 ** (-23 / 20)
    x = np.tile((a * np.sin(2 * np.pi * 997 * t))[:, None], (1, 2))
    lufs = float(loudness.integrated_loudness(x, fs))
    assert abs(lufs - (-23.0)) < 0.1


def test_concurrent_jobs_are_isolated(tmp_path):
    """Two queues + stores (the multi-worker deployment shape) running
    concurrently must not interfere."""
    import io

    from python_audio_mastering_tpu.io import wavio
    from python_audio_mastering_tpu.serving import (LocalFSBlobStore,
                                                    LocalQueue, make_consumer)

    cfg = ChainConfig(sample_rate=44100, dtype="float32")
    results = {}

    def run(name, seed):
        store = LocalFSBlobStore(str(tmp_path / name), bucket="b")
        x = (make_signal(22050, seed=seed) * 0.4).astype(np.float32)
        buf = io.BytesIO()
        wavio.write_wav(buf, x, 44100)
        store.upload("in.wav", buf.getvalue())
        q = LocalQueue(consumer=make_consumer(store, config=cfg))
        q.start()
        q.publish({"gcs_uri": "local://b/in.wav",
                   "settings": {"saturation": 10.0 * seed, "lufs": -15.0}})
        q.join()
        q.stop()
        results[name] = store.exists("processed/mastered_in.wav")

    threads = [threading.Thread(target=run, args=(f"j{i}", i + 1))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(results.get(f"j{i}") for i in range(3))


def test_tracing_spans_nest_and_aggregate():
    tracing.clear_trace()
    with tracing.span("outer"):
        with tracing.span("inner"):
            time.sleep(0.01)
    names = [r["name"] for r in tracing.get_trace()]
    assert "outer" in names and "outer/inner" in names
    summary = tracing.trace_summary()
    assert "outer" in summary
    c = tracing.counters("jobs")
    c.inc()
    c.inc(2)
    assert tracing.counters.snapshot()["jobs"] == 3


def test_random_settings_property_sweep():
    """Property sweep: 20 random settings dicts across the full slider
    ranges (both key spellings, random preset/variant/multiband) must
    always produce finite, limiter-bounded audio with the LUFS target hit
    when loud enough content exists."""
    fs = 44100
    rng = np.random.default_rng(42)
    x = make_signal(fs, fs=fs) * 0.5
    presets = [None, "techno", "dubstep", "pop", "rock"]
    for trial in range(20):
        s = {
            "saturation": float(rng.uniform(0, 100)),
            "bass_boost": float(rng.uniform(-6, 6)),
            "mid_cut": float(rng.uniform(0, 6)),
            "presence_boost": float(rng.uniform(-6, 6)),
            "treble_boost": float(rng.uniform(-6, 6)),
            "width": float(rng.uniform(0, 2)),
            "lufs": float(rng.uniform(-24, -6)),
            "multiband": bool(rng.integers(0, 2)),
            "compress": False,
        }
        if rng.integers(0, 2):  # long-spelling multiband keys sometimes
            s["low_band_threshold"] = float(rng.uniform(-40, 0))
            s["high_band_ratio"] = float(rng.uniform(1, 12))
        else:
            s["low_thresh"] = float(rng.uniform(-40, 0))
            s["high_ratio"] = float(rng.uniform(1, 12))
        preset = presets[int(rng.integers(0, len(presets)))]
        if preset:
            s["preset"] = preset
        variant = "worker" if rng.integers(0, 2) else "legacy"
        p = MasteringParams.from_settings(s)
        cfg = ChainConfig(sample_rate=fs, dtype="float64", variant=variant)
        y = np.asarray(master(x, p, cfg))
        assert np.isfinite(y).all(), f"non-finite output at trial {trial}: {s}"
        assert np.abs(y).max() <= 1.0 + 1e-6, f"unlimited output: {s}"


def test_perf_doc_generator_renders_from_artifact():
    """scripts/sync_perf_docs.py must render a table from the checked-in
    BENCH_DETAILS.json without error (the --check mode is NOT asserted
    here: the driver refreshes the artifact at round end without a doc
    sync, and that must not redden the suite)."""
    import importlib.util
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "sync_perf_docs", root / "scripts" / "sync_perf_docs.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    details = json.loads((root / "BENCH_DETAILS.json").read_text())
    block = mod.render(details)
    assert block.startswith(mod.BEGIN) and block.rstrip().endswith(mod.END)
    # one table row per config named in the generated rows
    assert block.count("\n| ") >= 12
    readme = (root / "README.md").read_text()
    assert mod.BEGIN in readme and mod.END in readme
