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

# The test-suite state these configs were last validated against (full
# `python -m pytest tests/ -q` on the 8-virtual-device CPU mesh) — kept in
# the artifact so a bench number is never quoted against an unknown suite.
_SUITE = "260 passed, 2 skipped (tests/, 8-device CPU mesh)"


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


def _time_fn_pipelined(fn, *args, k1=10, k2=40):
    """Steady-state per-call wall with the dispatch queue kept full.

    Single-call timing on this platform pays a full host↔device RPC round
    trip (~65 ms measured via an identity jit — larger than the device
    time of most configs); a mastering service keeps the dispatch queue
    full, so per-call time with the pipeline warm is the capacity number.

    Measured as the MARGINAL cost between k2 and k1 back-to-back
    dispatches: T(k) = fixed + k·per_call, so per_call =
    (T(k2) − T(k1)) / (k2 − k1).  The differencing cancels the fixed
    tail — the single sync readback costs ~46-65 ms through the tunnel,
    which a plain T(k)/k at k=10 spreads as ~5 ms/call of inflation
    (round-5 finding: an identity jit measured 6.4 ms/call that way; the
    slope says ~35 µs).  Reported alongside single-call latency, never
    instead of it.
    """
    import jax

    out = fn(*args)  # compile
    _sync(out)

    def total(k):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(k)]
        jax.block_until_ready(outs)
        _sync(outs[-1])
        return time.perf_counter() - t0

    total(3)  # warm the pipeline
    t1 = min(total(k1), total(k1))
    t2 = min(total(k2), total(k2))
    if t2 > t1:
        return (t2 - t1) / (k2 - k1)
    return t2 / k2  # noise degenerate → conservative per-call mean


def _time_fn_device(step, x0, k=32):
    """True on-device per-application wall via in-graph chaining.

    Scans ``k`` DEPENDENT applications of ``step`` (output feeds the next
    input) inside ONE executable, times one dispatch, divides by ``k``.
    No per-call launch or sync cost can hide in the number; it carries
    only the device wall plus ~0.4 ms/iteration of measured lax.scan
    bookkeeping, so it slightly over-reports — an upper bound.  Used as a
    cross-check on the slope-pipelined numbers for the headline configs.
    """
    import jax
    import jax.lax as lax

    fn = jax.jit(lambda a: lax.scan(lambda c, _: (step(c), None),
                                    a, None, length=k)[0])
    wall, _ = _time_fn(fn, x0)
    return wall / k


# Peak-rate assumptions for the roofline (TPU v5e / "v5 lite": 197 TFLOP/s
# bf16 MXU, 819 GB/s HBM).  The chain runs float32, so mfu is reported
# against the bf16 MXU peak — a deliberately conservative denominator; the
# JSON records the assumption so the number is auditable.
_PEAKS = {"v5 lite": (197.0, 819.0), "v5e": (197.0, 819.0),
          "v4": (275.0, 1228.0), "v5p": (459.0, 2765.0)}


def _peaks_for(device_str):
    for key, peaks in _PEAKS.items():
        if key in device_str.lower():
            return peaks
    return _PEAKS["v5 lite"]


def _pallas_extra_bytes(n, c, hop, L=512, multiband=True, front=True,
                        ballistics=True, bal_iters=3):
    """Closed-form HBM bytes of the chain's Pallas custom calls.

    XLA's ``cost_analysis`` cannot see inside custom calls, so the raw
    ``hbm_bytes`` under-reports exactly on the kernel paths this framework
    built (VERDICT r4 #3).  The kernels' traffic is closed-form per config
    (ops/pallas_multiband.py:34-35 docstring; float32 = 4 B/sample):

      front_chain      read C·N signal + C·(N/L)·8 EQ states + write C·N
      band_energies    read C·N + 2× C·(N/L)·4 crossover states
                       + write 3·(N/hop) control-rate energies
      band_gain_apply  read C·N + states + 3·(N/hop) gain cols
                       + write C·N + write N mono (emit_mono epilogue)
      ballistics       (bal_iters+1) lane-parallel replays each reading the
                       (8, T_pad) block-layout targets + one (8, T_pad)
                       full attenuation write; T_pad = N/hop rounded up to
                       128² (collapse mode certifies in ~3 iterations on
                       the bench signal — ops/pallas_kernels._run_collapse)

    Operand matrices (T (L,L), W, bucket) have grid-invariant index maps,
    so the Pallas pipeline fetches them once — negligible.
    """
    nb = -(-n // L)
    t = -(-n // hop)
    b = 0
    if front:
        b += 2 * c * n + c * nb * 8
    if multiband:
        b += c * n + 2 * c * nb * 4 + 3 * t          # band_energies
        b += 2 * c * n + n + 2 * c * nb * 4 + 3 * t  # band_gain_apply
    if ballistics:
        t_pad = -(-t // (128 * 128)) * (128 * 128)
        b += (bal_iters + 2) * 8 * t_pad
    return b * 4


def _roofline(jitted, args, wall_s, device_str, extra_bytes=0):
    """FLOPs/HBM-bytes from XLA's own cost model + achieved rates.

    SURVEY.md §6 metric discipline: quantify "fast" as a fraction of the
    hardware roof rather than asserting it.  ``bound`` labels which roof
    XLA's estimate says the program sits under at these shapes.

    ``extra_bytes``: analytic byte count of the Pallas custom calls XLA's
    model cannot see (``_pallas_extra_bytes``) — emitted as the corrected
    ``hbm_bytes_incl_kernels`` / ``hbm_util_incl_kernels`` fields next to
    the raw-XLA numbers, so kernel configs carry an honest roofline.
    """
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if not isinstance(ca, dict):  # older jax: list of per-computation dicts
            ca = ca[0]
        flops, bytes_ = float(ca["flops"]), float(ca["bytes accessed"])
    except Exception:
        return {}
    peak_tf, peak_gb = _peaks_for(device_str)
    ach_tf = flops / wall_s / 1e12
    ach_gb = bytes_ / wall_s / (1 << 30)
    intensity = flops / max(bytes_, 1.0)
    ridge = peak_tf * 1e12 / (peak_gb * (1 << 30))
    out = {
        "flops": flops, "hbm_bytes": bytes_,
        "achieved_tflops": round(ach_tf, 3),
        "achieved_hbm_GBps": round(ach_gb, 1),
        "mfu_vs_bf16_peak": round(ach_tf / peak_tf, 4),
        "hbm_util": round(ach_gb / peak_gb, 4),
        "arithmetic_intensity": round(intensity, 2),
        "bound": "hbm" if intensity < ridge else "mxu",
    }
    if extra_bytes:
        tot = bytes_ + extra_bytes
        out["hbm_bytes_incl_kernels"] = tot
        out["achieved_hbm_GBps_incl_kernels"] = round(
            tot / wall_s / (1 << 30), 1)
        out["hbm_util_incl_kernels"] = round(
            tot / wall_s / (1 << 30) / peak_gb, 4)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from python_audio_mastering_tpu import ChainConfig, MasteringParams, master

    fs = 44100
    cfg = ChainConfig.tpu_default(sample_rate=fs)
    details = {"device": str(jax.devices()[0]),
               "validated_against_suite": _SUITE,
               "configs": {}}
    print(f"bench configs validated against: {_SUITE}", file=sys.stderr)

    # ---- headline: full chain incl. multiband, 3-min stereo, one chip ----
    seconds = 180.0
    audio = jnp.asarray(_mk_audio(seconds))
    params = MasteringParams.from_settings(
        {"saturation": 20, "preset": "techno", "width": 1.3, "lufs": -14.0,
         "multiband": True})
    fn = jax.jit(lambda a, p: master(a, p, cfg))
    wall, _ = _time_fn(fn, audio, params)
    rtf = seconds / wall
    dev = details["device"]
    # context: the single-call wall includes one host↔device RPC round trip
    # on this tunneled chip; the identity-jit floor quantifies it, and the
    # pipelined number is the steady-state per-track capacity of the chip
    floor, _ = _time_fn(jax.jit(lambda a: a * 1.0000001), audio)
    wall_pipe = _time_fn_pipelined(fn, audio, params)
    # in-graph device wall (upper bound incl. scan bookkeeping) as an
    # independent cross-check on the slope-pipelined number
    wall_dev = _time_fn_device(lambda a: master(a, params, cfg), audio)
    details["dispatch_floor_s"] = round(floor, 4)
    n3 = audio.shape[0]
    xb_full = _pallas_extra_bytes(n3, 2, cfg.comp_hop, cfg.block_size)
    details["configs"]["full_chain_3min"] = {
        "wall_s": wall, "rtf": rtf,
        "wall_s_pipelined": round(wall_pipe, 4),
        "rtf_throughput_pipelined": round(seconds / wall_pipe, 1),
        "wall_s_device_ingraph": round(wall_dev, 4),
        "rtf_device_ingraph": round(seconds / wall_dev, 1),
        **_roofline(fn, (audio, params), wall_pipe, dev,
                    extra_bytes=xb_full)}

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

        # BENCH_SKIP_ALBUM=1: refresh only the fast configs (seconds each)
        # and carry the album / worker-path entries forward from the
        # previous BENCH_DETAILS.json — those two configs alone take
        # 30-90 min on this tunneled link.
        skip_album = os.environ.get("BENCH_SKIP_ALBUM") == "1"
        prev_configs = {}
        prev_device = None
        details_path = os.path.join(os.path.dirname(__file__),
                                    "BENCH_DETAILS.json")
        if skip_album and os.path.exists(details_path):
            try:
                with open(details_path) as f:
                    prev = json.load(f)
                prev_configs = prev.get("configs", {})
                prev_device = prev.get("device")
            except (ValueError, OSError) as e:
                # a corrupt/truncated previous artifact must not abort the
                # whole refresh — degrade to fresh-only configs
                print(f"WARNING: could not read previous {details_path}: "
                      f"{e}; album configs will be absent", file=sys.stderr)

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
            "target_hit_err_LU_single_pass_gain": target_hit_err,
            **_roofline(nfn, (a30,), wall, dev)}

        # (1b) layout A/B: the same full chain forced onto the row-major
        # (N, C) body — quantifies the channel-major path's HBM win
        import dataclasses as _dc

        cfg_nc = _dc.replace(cfg, layout="nc")
        fn_nc = jax.jit(lambda a, p: master(a, p, cfg_nc))
        wall_nc, _ = _time_fn(fn_nc, audio, params)
        wall_nc_pipe = _time_fn_pipelined(fn_nc, audio, params)
        details["configs"]["full_chain_3min_rowmajor"] = {
            "wall_s": wall_nc, "rtf": seconds / wall_nc,
            "wall_s_pipelined": round(wall_nc_pipe, 4),
            "rtf_throughput_pipelined": round(seconds / wall_nc_pipe, 1),
            # nc layout: no rows body → no front/mb kernels; ballistics
            # still runs the Pallas kernel (comp_ballistics="auto" on TPU)
            **_roofline(fn_nc, (audio, params), wall_nc_pipe, dev,
                        extra_bytes=_pallas_extra_bytes(
                            n3, 2, cfg.comp_hop, cfg.block_size,
                            multiband=False, front=False))}

        # (1c) kernel A/B: the same rows chain with the XLA multiband body
        # instead of the fused Pallas kernels — quantifies the kernel win
        cfg_xmb = _dc.replace(cfg, mb_kernel="xla")
        fn_xmb = jax.jit(lambda a, p: master(a, p, cfg_xmb))
        wall_xmb, _ = _time_fn(fn_xmb, audio, params)
        wall_xmb_pipe = _time_fn_pipelined(fn_xmb, audio, params)
        details["configs"]["full_chain_3min_xla_multiband"] = {
            "wall_s": wall_xmb, "rtf": seconds / wall_xmb,
            "wall_s_pipelined": round(wall_xmb_pipe, 4),
            "rtf_throughput_pipelined": round(seconds / wall_xmb_pipe, 1),
            # mb_kernel="xla" disables front + band kernels; the Pallas
            # ballistics kernel still runs
            **_roofline(fn_xmb, (audio, params), wall_xmb_pipe, dev,
                        extra_bytes=_pallas_extra_bytes(
                            n3, 2, cfg.comp_hop, cfg.block_size,
                            multiband=False, front=False))}

        # (1d) the documented maximum-throughput profile (tpu_fast: hop-16
        # detector decimation, ~0.06 dB rms vs the bit-exact contract —
        # ChainConfig docstring) — labeled clearly as the FAST profile;
        # the headline stays tpu_default.  The exact Pallas ballistics
        # walks every control step serially (irreducible for exactness),
        # so halving the control rate halves the one serial wall left.
        cfg_fast = ChainConfig.tpu_fast(sample_rate=fs)
        fn_fast = jax.jit(lambda a, p: master(a, p, cfg_fast))
        wall_f, _ = _time_fn(fn_fast, audio, params)
        wall_f_pipe = _time_fn_pipelined(fn_fast, audio, params)
        details["configs"]["full_chain_3min_fast_profile"] = {
            "profile": "tpu_fast (hop-16; ~0.06 dB rms budget)",
            "wall_s": wall_f, "rtf": seconds / wall_f,
            "wall_s_pipelined": round(wall_f_pipe, 4),
            "rtf_throughput_pipelined": round(seconds / wall_f_pipe, 1),
            **_roofline(fn_fast, (audio, params), wall_f_pipe, dev,
                        extra_bytes=_pallas_extra_bytes(
                            n3, 2, cfg_fast.comp_hop, cfg_fast.block_size))}

        # (2) 4-band EQ, four presets, 3-min
        eq_walls = {}
        for preset in ("techno", "pop", "dubstep", "rock"):
            p = MasteringParams.from_settings({"preset": preset, "lufs": None})
            wall, _ = _time_fn(fn, audio, p)
            eq_walls[preset] = wall
        xb_front = _pallas_extra_bytes(n3, 2, cfg.comp_hop, cfg.block_size,
                                       multiband=False, ballistics=False)
        details["configs"]["eq_presets_3min"] = {
            "wall_s": eq_walls, "rtf": seconds / max(eq_walls.values()),
            **_roofline(fn, (audio, p), max(eq_walls.values()), dev,
                        extra_bytes=xb_front)}

        # (3) exciter + width + EQ + LUFS (no multiband), 3-min — single
        # call AND pipelined (VERDICT r4 #2: the quoted no-mb pipelined
        # number previously existed only in prose)
        p3 = MasteringParams.from_settings(
            {"saturation": 20, "preset": "techno", "width": 1.3, "lufs": -14.0})
        fn3 = jax.jit(lambda a, p: master(a, p, cfg))
        wall, _ = _time_fn(fn3, audio, p3)
        wall3_pipe = _time_fn_pipelined(fn3, audio, p3)
        wall3_dev = _time_fn_device(lambda a: master(a, p3, cfg), audio)
        details["configs"]["fused_chain_no_mb_3min"] = {
            "wall_s": wall, "rtf": seconds / wall,
            "wall_s_pipelined": round(wall3_pipe, 5),
            "rtf_throughput_pipelined": round(seconds / wall3_pipe, 1),
            "wall_s_device_ingraph": round(wall3_dev, 5),
            "rtf_device_ingraph": round(seconds / wall3_dev, 1),
            **_roofline(fn3, (audio, p3), wall3_pipe, dev,
                        extra_bytes=xb_front)}

        # (3b) ballistics standalone — the chain's one serial op, measured
        # in isolation so the "serial wall" roadmap number is an artifact
        # field, not prose (VERDICT r4 #2).  Stats are built by the CHAIN'S
        # OWN fused detector path (front → crossover states → Pallas band
        # energies → shared gain computer) so the measurement matches what
        # production runs; both boundary algorithms are timed: "collapse"
        # (block-parallel composite-map fixed point — the default; measured
        # certifying in 3 iterations on these stats) and "serial" (the
        # round-4 full-timeline boundary walk).  A second entry measures
        # the same ballistics on SCAN-formulated stats of the same signal
        # (ops.compressor.detector_stats) — material whose fixed point does
        # NOT certify within the iteration budget, exercising the exact
        # in-graph serial fallback: collapse there costs iterations + the
        # serial walk, and bitwise_equal certifies the fallback's
        # exactness.  Both behaviors belong in the artifact.
        from python_audio_mastering_tpu.models.chain import _front
        from python_audio_mastering_tpu.ops import compressor as comp
        from python_audio_mastering_tpu.ops import iir as iirops
        from python_audio_mastering_tpu.ops import multiband as mbnd
        from python_audio_mastering_tpu.ops import pallas_kernels as pk
        from python_audio_mastering_tpu.ops import pallas_multiband as pmb

        hop = cfg.comp_hop
        L = cfg.block_size

        @jax.jit
        def _fused_maxatt(a):
            n, c = a.shape
            nb = -(-n // L)
            xr = jnp.pad(a.T, ((0, 0), (0, nb * L - n))).reshape(c, nb, L)
            xr = _front(xr, params, cfg)
            lp, hp = mbnd._crossover_sos(fs, 250.0, 4000.0)
            (slp, shp), _ = iirops.sosfilt_states_multi_rows(
                (lp, hp), xr, return_state=False)
            xb = pmb.band_energies(xr, slp, shp, lp, hp, hop=hop)
            look_ctrl = mbnd.detector_lookpad(fs, hop) // hop
            st, _ = mbnd._fused_stats_from_ctrl(
                xb, xb.shape[1], fs, (-25.0, -20.0, -15.0), (6.0, 3.0, 4.0),
                hop, None, look_ctrl, xr.dtype, band_major=True)
            return st["max_att"]

        @jax.jit
        def _scan_maxatt(a):
            bands = mbnd.crossover_split(a, fs,
                                         filter_method=cfg.filter_method)[0]
            th, ra = (-25.0, -20.0, -15.0), (6.0, 3.0, 4.0)
            st = [comp.detector_stats(
                bands[i], fs, th[i], ra[i],
                mbnd.BAND_BALLISTICS_MS[i][0], mbnd.BAND_BALLISTICS_MS[i][1],
                hop=hop) for i in range(3)]
            return jnp.stack([s["max_att"] for s in st])  # (3, T)

        ca_r = jnp.asarray([hop / max(a * fs / 1000.0, 1.0)
                            for a, _ in mbnd.BAND_BALLISTICS_MS], jnp.float32)
        cr_r = jnp.asarray([hop / max(r * fs / 1000.0, 1.0)
                            for _, r in mbnd.BAND_BALLISTICS_MS], jnp.float32)
        fn_bc = jax.jit(lambda m: pk.ballistics_pallas_rates_bt(
            m, ca_r, cr_r, mode="collapse")[0])
        fn_bs = jax.jit(lambda m: pk.ballistics_pallas_rates_bt(
            m, ca_r, cr_r, mode="serial")[0])
        for name, statfn in (("ballistics_standalone_3min", _fused_maxatt),
                             ("ballistics_standalone_scanstats_3min",
                              _scan_maxatt)):
            m_bt = statfn(audio)
            _sync(m_bt)
            wall_bc, out_bc = _time_fn(fn_bc, m_bt)
            wall_bc_pipe = _time_fn_pipelined(fn_bc, m_bt)
            wall_bs, out_bs = _time_fn(fn_bs, m_bt)
            wall_bs_pipe = _time_fn_pipelined(fn_bs, m_bt)
            details["configs"][name] = {
                "hop": hop, "T_ctrl": int(m_bt.shape[1]),
                "wall_s_collapse": round(wall_bc, 5),
                "wall_s_collapse_pipelined": round(wall_bc_pipe, 5),
                "wall_s_serial": round(wall_bs, 5),
                "wall_s_serial_pipelined": round(wall_bs_pipe, 5),
                "speedup_collapse_vs_serial_pipelined": round(
                    wall_bs_pipe / wall_bc_pipe, 2),
                "bitwise_equal": bool(
                    np.array_equal(np.asarray(out_bc), np.asarray(out_bs))),
            }

        # (4) full chain incl. multiband, 5-min
        a5 = jnp.asarray(_mk_audio(300.0, seed=1))
        wall, _ = _time_fn(fn, a5, params)
        wall_pipe5 = _time_fn_pipelined(fn, a5, params)
        details["configs"]["full_chain_5min"] = {
            "wall_s": wall, "rtf": 300.0 / wall,
            "wall_s_pipelined": round(wall_pipe5, 4),
            "rtf_throughput_pipelined": round(300.0 / wall_pipe5, 1),
            **_roofline(fn, (a5, params), wall_pipe5, dev,
                        extra_bytes=_pallas_extra_bytes(
                            a5.shape[0], 2, cfg.comp_hop, cfg.block_size))}

        # (5) batched album: 12 tracks × 5 min (60 min total), chunked
        # double-buffered streaming with progress callbacks, one chip.
        # Production transfer mode is pcm16: int16 PCM over the host↔device
        # link with on-device de/requantize — half the float32 bytes each
        # way, which matters on this tunneled link (and costs nothing on a
        # real PCIe host).  A second run with the timings dict inserts sync
        # barriers so h2d/compute/d2h separate and compute-only rtf is a
        # measured number, not a link-probe estimate.
        def _link_probe():
            # host↔device link calibration: this environment tunnels the
            # TPU, so album jobs are link-bound end to end; on a real TPU
            # host PCIe makes the transfer negligible.  Probed immediately
            # before AND after each link-bound config so cross-round swings
            # of the shared tunnel (~10x observed) are attributable.
            blob = np.zeros((64 << 20) // 4, np.float32)
            t0 = time.perf_counter()
            _sync(jax.device_put(blob))
            return round((64 / 1024) / (time.perf_counter() - t0), 4)

        if not skip_album:
            tracks = [_mk_audio(300.0, seed=10 + i) for i in range(12)]
            album_sec = 12 * 300.0
            mesh1 = pmesh.make_mesh(devices=jax.devices()[:1])
            link_before = _link_probe()
            t0 = time.perf_counter()
            outs, _ = pbatch.master_album_streamed(
                tracks, params, cfg, mesh=mesh1, transfer="pcm16")
            compile_and_run = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs, _ = pbatch.master_album_streamed(
                tracks, params, cfg, mesh=mesh1, transfer="pcm16")
            wall_run2 = time.perf_counter() - t0
            tm = {}
            t0 = time.perf_counter()
            pbatch.master_album_streamed(
                tracks, params, cfg, mesh=mesh1, transfer="pcm16", timings=tm)
            wall_run3 = time.perf_counter() - t0
            link_after = _link_probe()
            # The bench chip sits behind a shared RPC tunnel whose throughput
            # swings ~10x between runs (run 1, compile included, has been
            # observed FASTER than run 2).  Steady-state wall = min over the
            # three runs; the per-run walls are kept for honesty.
            runs = [compile_and_run, wall_run2, wall_run3]
            wall = min(runs)
            entry = {
                "wall_s": wall, "first_call_s": compile_and_run,
                "wall_runs_s": [round(r, 2) for r in runs],
                "rtf": album_sec / wall,
                "transfer": "pcm16",
                "link_before_GBps": link_before,
                "link_after_GBps": link_after,
            }
            if tm:
                entry["h2d_s"] = round(tm.get("h2d_s", 0.0), 3)
                entry["compute_s"] = round(tm.get("compute_s", 0.0), 3)
                entry["d2h_s"] = round(tm.get("d2h_s", 0.0), 3)
                entry["wire_bytes_in"] = tm.get("wire_bytes_in")
                entry["wire_bytes_out"] = tm.get("wire_bytes_out")
                if tm.get("compute_s"):
                    entry["compute_only_rtf"] = round(album_sec / tm["compute_s"], 1)
                # the wall with the measured link legs subtracted — the
                # cross-round-comparable number on a swinging tunnel
                entry["wall_minus_link_s"] = round(
                    wall_run3 - tm.get("h2d_s", 0.0) - tm.get("d2h_s", 0.0), 2)
                entry["transfer_bound"] = (
                    tm.get("h2d_s", 0) + tm.get("d2h_s", 0) > tm.get("compute_s", 0))
            details["configs"]["album_12x5min_streamed"] = entry

        # (6) sharded SP path on the REAL chip: shard_map + its collectives
        # (boundary-state all_gathers, detector ppermutes, psum) must lower
        # and execute through this platform (VERDICT r2 #3).  1-device
        # mesh: the collectives are trivial but still compiled by the axon
        # backend.  End-to-end AND chain-only walls are both recorded: the
        # public API does host->device->host each call, which on this
        # tunneled link costs ~1.5 s for 2x21 MB — the round-3 "SP is ~50x
        # slower" number was that link, not the chain (VERDICT r3 #4).
        from jax.sharding import NamedSharding, PartitionSpec as _P

        from python_audio_mastering_tpu.parallel import sequence as pseq

        a60_h = _mk_audio(60.0, seed=2)
        a60 = jnp.asarray(a60_h)
        seq_mesh = pmesh.make_mesh(axis_name="seq",
                                   devices=jax.devices()[:1])
        t0 = time.perf_counter()
        out_sh, m_sh, _ = pseq.master_track_sharded(a60, params, cfg,
                                                    mesh=seq_mesh)
        first_sh = time.perf_counter() - t0
        t0 = time.perf_counter()
        out_sh, m_sh, _ = pseq.master_track_sharded(a60, params, cfg,
                                                    mesh=seq_mesh)
        wall_e2e = time.perf_counter() - t0
        # chain-only: device-resident rows input, tiny-sync completion —
        # the same measurement discipline as the unsharded chain configs
        n, c = a60_h.shape
        cell = int(round(0.1 * fs))
        L = cfg.block_size
        align = int(np.lcm(np.lcm(cell, max(cfg.comp_hop, 1)), L))
        n_pad = -(-n // align) * align
        xp = np.concatenate([a60_h, np.zeros((n_pad - n, c), np.float32)])
        xw = np.ascontiguousarray(xp.T).reshape(c, n_pad // L, L)
        t0 = time.perf_counter()
        x_dev = jax.device_put(jnp.asarray(xw),
                               NamedSharding(seq_mesh, _P(None, "seq", None)))
        _sync(x_dev)
        h2d_s = time.perf_counter() - t0
        fn_sp = pseq._track_sharded_fn(seq_mesh, "seq", cfg, "approx", False,
                                       rows=True)
        nv = jnp.asarray(n)
        wall_chain, res_sp = _time_fn(fn_sp, x_dev, params, nv)
        wall_chain_pipe = _time_fn_pipelined(fn_sp, x_dev, params, nv)
        details["configs"]["sharded_sp_1dev_60s"] = {
            "wall_e2e_s": round(wall_e2e, 4),
            "rtf_e2e": round(60.0 / wall_e2e, 1),
            "wall_chain_s": round(wall_chain, 4),
            "wall_chain_pipelined_s": round(wall_chain_pipe, 4),
            "rtf_chain": round(60.0 / wall_chain, 1),
            "rtf_chain_pipelined": round(60.0 / wall_chain_pipe, 1),
            "h2d_s": round(h2d_s, 3), "wire_mb": round(xw.nbytes / 1e6, 1),
            "first_call_s": round(first_sh, 2),
            "measured_lufs": round(float(m_sh), 3),
            "finite": bool(np.isfinite(out_sh).all()),
        }

        # (7) 2-D (tracks x seq) mesh album on the real chip: first call
        # (compile) AND steady-state wall (VERDICT r3 #4)
        mesh2d = pmesh.make_mesh_2d(tracks=1, devices=jax.devices()[:1])
        tracks2d = [_mk_audio(30.0, seed=3), _mk_audio(30.0, seed=4)]
        t0 = time.perf_counter()
        outs2d, lufs2d = pseq.master_album_sharded(tracks2d, params, cfg,
                                                   mesh=mesh2d)
        first2d = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs2d, lufs2d = pseq.master_album_sharded(tracks2d, params, cfg,
                                                   mesh=mesh2d)
        wall2d = time.perf_counter() - t0
        details["configs"]["sharded_2d_album"] = {
            "first_call_s": round(first2d, 2),
            "wall_e2e_s": round(wall2d, 4),
            "rtf_e2e": round(60.0 / wall2d, 1),
            "ok": bool(all(np.isfinite(o).all() for o in outs2d)
                       and np.isfinite(np.asarray(lufs2d)).all()),
        }

        # (7b) 2-D mesh, chain-only: the same measurement discipline as
        # config 6 (device-resident rows input, tiny-sync completion) at
        # realistic scale — 4×60 s tracks — so the composed-parallelism
        # axis has a per-audio-second number that is not the tunnel
        # (VERDICT r4 #6).  The vmapped rows body pins the XLA kernel
        # mirrors (the Pallas kernels have no batching rule), so this also
        # quantifies that overhead vs the 1-D SP chain.
        from python_audio_mastering_tpu.parallel.batch import (
            pad_tracks as _pad_tracks, stack_params as _stack_params)

        tracks2 = [_mk_audio(60.0, seed=20 + i) for i in range(4)]
        batch2d, lengths2d = _pad_tracks(tracks2)
        stacked2d = _stack_params([params] * 4)
        taxis, saxis = mesh2d.axis_names
        n2, c2 = batch2d.shape[1], batch2d.shape[2]
        align2 = int(np.lcm(np.lcm(cell, max(cfg.comp_hop, 1)), L))
        n2_pad = -(-n2 // align2) * align2
        if n2_pad != n2:
            batch2d = np.concatenate(
                [batch2d, np.zeros((4, n2_pad - n2, c2), batch2d.dtype)],
                axis=1)
        w2d = np.ascontiguousarray(batch2d.transpose(0, 2, 1)).reshape(
            4, c2, n2_pad // L, L)
        x2_dev = jax.device_put(
            jnp.asarray(w2d),
            NamedSharding(mesh2d, _P(taxis, None, saxis, None)))
        _sync(x2_dev)
        fn2d = pseq._album_sharded_fn(mesh2d, taxis, saxis, cfg, "approx",
                                      rows=True)
        nv2 = jnp.asarray(lengths2d)
        wall2d_chain, _ = _time_fn(fn2d, x2_dev, stacked2d, nv2)
        wall2d_chain_pipe = _time_fn_pipelined(fn2d, x2_dev, stacked2d, nv2)
        sp_cfg = details["configs"].get("sharded_sp_1dev_60s", {})
        details["configs"]["sharded_2d_album_chain_only"] = {
            "tracks": 4, "track_seconds": 60.0,
            "wall_chain_s": round(wall2d_chain, 4),
            "wall_chain_pipelined_s": round(wall2d_chain_pipe, 4),
            "rtf_chain": round(240.0 / wall2d_chain, 1),
            "rtf_chain_pipelined": round(240.0 / wall2d_chain_pipe, 1),
            # per-audio-second comparison vs the 1-D SP chain (both run
            # the Pallas kernels since round 5 — pallas_call's batching
            # rule folds the local-tracks vmap into the grid)
            "per_audio_sec_vs_sp_1d": round(
                (wall2d_chain_pipe / 240.0)
                / (sp_cfg["wall_chain_pipelined_s"] / 60.0), 2)
            if sp_cfg.get("wall_chain_pipelined_s") else None,
        }

        # (8) the DEPLOYED path: the same 12x5-min album driven through
        # worker.run_job (upload -> decode -> batched chunked master ->
        # encode -> .complete flags) with the DEFAULT env knobs — proves
        # the production path runs the benchmarked configuration
        # (VERDICT r2 #1: done = within ~1.2x of the config-5 wall).
        if not skip_album:
            import io as _io
            import shutil as _shutil
            import tempfile as _tempfile

            from python_audio_mastering_tpu.io import wavio
            from python_audio_mastering_tpu.serving import worker as pworker
            from python_audio_mastering_tpu.serving.store import LocalFSBlobStore

            root = _tempfile.mkdtemp(prefix="pam_bench_store")
            store = LocalFSBlobStore(root, bucket="bench")
            uris = []
            for i, tr in enumerate(tracks):
                buf = _io.BytesIO()
                wavio.write_wav(buf, tr, fs)
                store.upload(f"up/t{i:02d}.wav", buf.getvalue())
                uris.append(f"local://bench/up/t{i:02d}.wav")
            settings = {"saturation": 20, "preset": "techno", "width": 1.3,
                        "lufs": -14.0, "multiband": True}
            # two runs, min recorded: the link's ~10x swing would otherwise
            # decide this config (compute is ~2 s of a 150-700 s wall).
            # Runs in the SAME session as config 5 so the two share link
            # weather, with link probes before/after for attribution.
            worker_link_before = _link_probe()
            worker_runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                pworker.run_job({"gcs_uris": uris, "settings": settings}, store)
                worker_runs.append(time.perf_counter() - t0)
            worker_wall = min(worker_runs)
            details["configs"]["album_via_worker_runjob"] = {
                "wall_s": worker_wall,
                "wall_runs_s": [round(r, 2) for r in worker_runs],
                "rtf": round(album_sec / worker_wall, 1),
                "vs_config5_wall": round(
                    worker_wall
                    / details["configs"]["album_12x5min_streamed"]["wall_s"], 2),
                "link_before_GBps": worker_link_before,
                "link_after_GBps": _link_probe(),
                "env": pworker.job_options(),
            }
            _shutil.rmtree(root, ignore_errors=True)

        if skip_album:
            carried = []
            for _k in ("album_12x5min_streamed", "album_via_worker_runjob"):
                if _k in prev_configs:
                    # stamp provenance IN the artifact: these numbers are
                    # from a previous run (possibly a different device) —
                    # they must not read as measurements of this run
                    details["configs"][_k] = {
                        **prev_configs[_k], "carried_forward": True,
                        "carried_from_device": prev_device}
                    carried.append(_k)
                else:
                    print(f"WARNING: BENCH_SKIP_ALBUM=1 but {_k!r} was not "
                          "in the previous BENCH_DETAILS.json — it is "
                          "absent from this artifact", file=sys.stderr)
            if carried:
                print("BENCH_SKIP_ALBUM=1: carried forward from the "
                      f"previous BENCH_DETAILS.json: {', '.join(carried)}",
                      file=sys.stderr)

        with open(os.path.join(os.path.dirname(__file__), "BENCH_DETAILS.json"),
                  "w") as f:
            json.dump(details, f, indent=2)

    print(json.dumps(headline))


if __name__ == "__main__":
    main()
