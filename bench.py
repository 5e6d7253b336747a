"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json north star): realtime factor
(audio-seconds per wall-second per chip) for the FULL mastering chain —
saturation → fused 4-band EQ → stereo widener → 3-band multiband
compressor → gated LUFS normalize → soft limiter — on a 3-minute
44.1 kHz stereo track on one TPU chip.  The reference publishes no
numbers (BASELINE.md); ``vs_baseline`` is reported against the north-star
target of 360× (3 min in <0.5 s).

Set BENCH_FULL=1 to also run the five BASELINE.json config scenarios and
write BENCH_DETAILS.json.
"""

import json
import os
import sys
import time

import numpy as np


def _mk_audio(seconds, fs=44100, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * fs)) / fs
    sig = (0.4 * np.sin(2 * np.pi * 55 * t)
           + 0.2 * np.sin(2 * np.pi * 880 * t)
           + 0.1 * np.sin(2 * np.pi * 4200 * t)
           + 0.05 * rng.standard_normal(t.shape[0]))
    env = 0.4 + 0.6 * (0.5 + 0.5 * np.sin(2 * np.pi * 0.5 * t)) ** 2
    sig = sig * env
    return np.stack([sig, np.roll(sig, 29)], axis=1).astype(np.float32)


def _sync(out):
    """Force completion.  On the tunneled TPU platform block_until_ready
    can return before execution finishes; a tiny host readback is the
    reliable barrier (and costs ~1 ms, unlike a full-buffer transfer)."""
    import jax

    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[tuple(slice(0, 1) for _ in leaf.shape)])


def _time_fn(fn, *args, reps=3):
    out = fn(*args)  # compile
    _sync(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    from python_audio_mastering_tpu import ChainConfig, MasteringParams, master

    fs = 44100
    cfg = ChainConfig.tpu_default(sample_rate=fs)
    details = {"device": str(jax.devices()[0]), "configs": {}}

    # ---- headline: full chain incl. multiband, 3-min stereo, one chip ----
    seconds = 180.0
    audio = jnp.asarray(_mk_audio(seconds))
    params = MasteringParams.from_settings(
        {"saturation": 20, "preset": "techno", "width": 1.3, "lufs": -14.0,
         "multiband": True})
    fn = jax.jit(lambda a, p: master(a, p, cfg))
    wall, _ = _time_fn(fn, audio, params)
    rtf = seconds / wall
    details["configs"]["full_chain_3min"] = {"wall_s": wall, "rtf": rtf}

    headline = {
        "metric": "realtime_factor_full_chain_3min_1chip",
        "value": round(rtf, 1),
        "unit": "audio_sec/wall_sec",
        "vs_baseline": round(rtf / 360.0, 3),
    }

    if os.environ.get("BENCH_FULL") == "1":
        from python_audio_mastering_tpu.ops import loudness as loud
        from python_audio_mastering_tpu.parallel import batch as pbatch
        from python_audio_mastering_tpu.parallel import mesh as pmesh

        # (1) LUFS-normalize 30 s — meter parity + speed.  `meter_err` is
        # the BASELINE metric (our gated measurement vs the independent
        # BS.1770 oracle on identical audio); `target_hit_err` reflects the
        # reference's own single-pass-gain algorithm (gain shifts the
        # gating selection slightly; no re-measure, engine:219-222).
        a30 = jnp.asarray(_mk_audio(30.0)) * 0.5
        nfn = jax.jit(lambda a: loud.normalize_to_lufs(a, fs, -14.0)[0])
        wall, out = _time_fn(nfn, a30)
        mfn = jax.jit(lambda a: loud.integrated_loudness(
            a, fs, downmix="reference_mono_mean"))
        ours = float(mfn(a30))
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
        try:
            from oracles.bs1770_ref import integrated_loudness as oracle_lufs
            meter_err = abs(ours - oracle_lufs(
                np.asarray(a30).mean(axis=1), fs))
            target_hit_err = abs(oracle_lufs(
                np.asarray(out).mean(axis=1), fs) - (-14.0))
        except Exception:
            meter_err = target_hit_err = None
        details["configs"]["lufs_normalize_30s"] = {
            "wall_s": wall, "rtf": 30.0 / wall,
            "meter_err_LU_vs_oracle": meter_err,
            "target_hit_err_LU_single_pass_gain": target_hit_err}

        # (2) 4-band EQ, four presets, 3-min
        eq_walls = {}
        for preset in ("techno", "pop", "dubstep", "rock"):
            p = MasteringParams.from_settings({"preset": preset, "lufs": None})
            wall, _ = _time_fn(fn, audio, p)  # same compiled chain, MB off? use chain w/o mb
            eq_walls[preset] = wall
        details["configs"]["eq_presets_3min"] = {
            "wall_s": eq_walls, "rtf": seconds / max(eq_walls.values())}

        # (3) exciter + width + EQ + LUFS (no multiband), 3-min
        p3 = MasteringParams.from_settings(
            {"saturation": 20, "preset": "techno", "width": 1.3, "lufs": -14.0})
        fn3 = jax.jit(lambda a, p: master(a, p, cfg))
        wall, _ = _time_fn(fn3, audio, p3)
        details["configs"]["fused_chain_no_mb_3min"] = {
            "wall_s": wall, "rtf": seconds / wall}

        # (4) full chain incl. multiband, 5-min
        a5 = jnp.asarray(_mk_audio(300.0, seed=1))
        wall, _ = _time_fn(fn, a5, params)
        details["configs"]["full_chain_5min"] = {"wall_s": wall,
                                                 "rtf": 300.0 / wall}

        # (5) batched album: 12 tracks × 5 min (60 min total), chunked
        # double-buffered streaming with progress callbacks, one chip
        tracks = [_mk_audio(300.0, seed=10 + i) for i in range(12)]
        mesh1 = pmesh.make_mesh(devices=jax.devices()[:1])
        t0 = time.perf_counter()
        outs, _ = pbatch.master_album_streamed(tracks, params, cfg, mesh=mesh1)
        compile_and_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs, _ = pbatch.master_album_streamed(tracks, params, cfg, mesh=mesh1)
        wall = time.perf_counter() - t0
        # host↔device link calibration: this environment tunnels the TPU, so
        # album jobs are transfer-bound; report the link so compute time is
        # separable (on a real TPU host PCIe makes the transfer negligible)
        blob = np.zeros((64 << 20) // 4, np.float32)
        t0 = time.perf_counter()
        _sync(jax.device_put(blob))
        put_gbps = (64 / 1024) / (time.perf_counter() - t0)
        album_bytes = sum(t.nbytes for t in tracks)
        est_transfer = 2 * album_bytes / (put_gbps * (1 << 30))
        entry = {
            "wall_s": wall, "first_call_s": compile_and_run,
            "rtf": 12 * 300.0 / wall,
            "host_device_link_GBps": round(put_gbps, 4),
        }
        if est_transfer < 0.8 * wall:
            entry["est_compute_rtf"] = round(
                12 * 300.0 / (wall - est_transfer), 1)
        else:
            # the link estimate exceeds the measured wall (transfers overlap
            # with compute and the single-blob probe overstates per-byte
            # cost): the run is transfer-bound end to end on this link
            entry["transfer_bound"] = True
        details["configs"]["album_12x5min_streamed"] = entry

        with open(os.path.join(os.path.dirname(__file__), "BENCH_DETAILS.json"),
                  "w") as f:
            json.dump(details, f, indent=2)

    print(json.dumps(headline))


if __name__ == "__main__":
    main()
