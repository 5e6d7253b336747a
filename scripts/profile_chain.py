"""Component-level wall-time profile of the mastering chain on the TPU.

Times each stage of the tpu_default full chain separately (one process —
the tunneled chip is single-claim) and prints a JSON breakdown.  Used to
target kernel optimization at the stages that actually dominate.

``--out PATH`` additionally writes the breakdown to a JSON file — the
checked-in ``PROFILE_rNN.json`` artifacts are produced this way, so every
stage wall quoted in DESIGN.md/README.md traces to a tracked file
(VERDICT r4 #2).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# self-locating: the repo root must NOT be injected via PYTHONPATH (the
# image's sitecustomize registers the TPU plugin at interpreter start,
# and an early /root/repo on sys.path breaks that registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    import jax

    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[tuple(slice(0, 1) for _ in leaf.shape)])


def time_fn(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def time_fn_pipelined(fn, *args, k1=10, k2=40):
    """Per-call wall with the dispatch queue kept full (bench.py's
    methodology) — single-call walls on the tunneled chip are ~46 ms of
    RPC round trip, which swamps every stage at these shapes.

    Slope form: per_call = (T(k2) − T(k1)) / (k2 − k1).  A plain T(k)/k
    at k=10 spreads the one sync readback (~46-65 ms on this tunnel) as
    ~5 ms/call of inflation — an identity jit measured 6.4 ms/call that
    way, 35 µs by the slope (round-5 finding).  The pipelined numbers
    are the ones DESIGN.md's stage-breakdown claims use."""
    import jax

    out = fn(*args)
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
    return t2 / k2


def time_fn_device(step, x0, k=32):
    """True on-device per-application wall: scan ``k`` DEPENDENT
    applications inside ONE executable (output feeds the next input —
    nothing for CSE to collapse), one dispatch, divide.  Upper bound:
    carries ~0.4 ms/iteration of measured lax.scan bookkeeping."""
    import jax
    import jax.lax as lax

    fn = jax.jit(lambda a: lax.scan(lambda c, _: (step(c), None),
                                    a, None, length=k)[0])
    return time_fn(fn, x0) / k


def time_fn_device_const(op, x0, k=32):
    """In-graph device wall for an op whose output cannot feed back as
    its input: re-apply ``op`` to the SAME operand, threading a tiny
    data-dependent perturbation (max(out)·1e-30) through the carry so no
    iteration is CSE'd or dead-code-eliminated."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    def body(c, _):
        s, x = c
        y = op(x + s)
        return (jnp.max(jax.tree.leaves(y)[0]) * 1e-30, x), None

    fn = jax.jit(lambda a: lax.scan(
        body, (jnp.zeros((), a.dtype), a), None, length=k)[0][0])
    return time_fn(fn, x0) / k


def main():
    import jax
    import jax.numpy as jnp

    from python_audio_mastering_tpu import ChainConfig, MasteringParams, master
    from python_audio_mastering_tpu.models.chain import apply_eq
    from python_audio_mastering_tpu.ops import compressor as comp
    from python_audio_mastering_tpu.ops import loudness as loud
    from python_audio_mastering_tpu.ops import multiband
    from python_audio_mastering_tpu.ops import pallas_kernels as pk
    from python_audio_mastering_tpu.ops.waveshaper import saturate

    fs = 44100
    seconds = 180.0
    n = int(fs * seconds)
    rng = np.random.default_rng(0)
    t = np.arange(n) / fs
    sig = (0.4 * np.sin(2 * np.pi * 55 * t) + 0.2 * np.sin(2 * np.pi * 880 * t)
           + 0.05 * rng.standard_normal(n))
    x = jnp.asarray(np.stack([sig, np.roll(sig, 29)], axis=1), jnp.float32)

    cfg = ChainConfig.tpu_default(sample_rate=fs)
    params = MasteringParams.from_settings(
        {"saturation": 20, "preset": "techno", "width": 1.3, "lufs": -14.0,
         "multiband": True})
    res = {"device": str(jax.devices()[0]), "n": n}

    # full chain
    fn_full = jax.jit(lambda a, p: master(a, p, cfg))
    res["full_chain"] = time_fn(fn_full, x, params)
    res["full_chain_pipelined"] = time_fn_pipelined(fn_full, x, params)
    res["full_chain_device"] = time_fn_device(
        lambda a: master(a, params, cfg), x)

    # chain without multiband
    p_nomb = MasteringParams.from_settings(
        {"saturation": 20, "preset": "techno", "width": 1.3, "lufs": -14.0})
    res["chain_no_mb"] = time_fn(fn_full, x, p_nomb)
    res["chain_no_mb_pipelined"] = time_fn_pipelined(fn_full, x, p_nomb)
    res["chain_no_mb_device"] = time_fn_device(
        lambda a: master(a, p_nomb, cfg), x)

    # multiband alone
    def mb(a, p):
        return multiband.multiband_compress(
            a, fs, thresholds_db=(p.low_thresh, p.mid_thresh, p.high_thresh),
            ratios=(p.low_ratio, p.mid_ratio, p.high_ratio),
            variant="worker", filter_method=cfg.filter_method,
            hop=cfg.comp_hop, block_ctrl=cfg.comp_block_ctrl,
            ballistics=cfg.comp_ballistics)
    fn_mb = jax.jit(mb)
    res["multiband_alone"] = time_fn(fn_mb, x, params)
    res["multiband_alone_pipelined"] = time_fn_pipelined(fn_mb, x, params)

    # crossover alone
    fn_xo = jax.jit(lambda a: multiband.crossover_split(
        a, fs, filter_method=cfg.filter_method)[0])
    bands = fn_xo(x)
    res["crossover_alone"] = time_fn(fn_xo, x)
    res["crossover_alone_pipelined"] = time_fn_pipelined(fn_xo, x)

    # detectors alone (3 bands)
    def dets(b, p):
        th = (p.low_thresh, p.mid_thresh, p.high_thresh)
        ra = (p.low_ratio, p.mid_ratio, p.high_ratio)
        st = [comp.detector_stats(b[i], fs, th[i], ra[i],
                                  multiband.BAND_BALLISTICS_MS[i][0],
                                  multiband.BAND_BALLISTICS_MS[i][1],
                                  hop=cfg.comp_hop) for i in range(3)]
        return {k: jnp.stack([s[k] for s in st], axis=-1) for k in st[0]}
    fn_det = jax.jit(dets)
    stacked = fn_det(bands, params)
    res["detectors_alone"] = time_fn(fn_det, bands, params)
    res["detectors_alone_pipelined"] = time_fn_pipelined(fn_det, bands, params)

    # pallas ballistics alone — both boundary algorithms: "collapse" (the
    # default block-parallel composite-map fixed point) and "serial" (the
    # round-4 full-timeline boundary walk), band-major so no transpose
    # legs pollute the stage wall
    dt = stacked["max_att"].dtype
    ca = jnp.asarray([cfg.comp_hop / max(a * fs / 1000.0, 1.0)
                      for a, _ in multiband.BAND_BALLISTICS_MS], dt)
    cr = jnp.asarray([cfg.comp_hop / max(r * fs / 1000.0, 1.0)
                      for _, r in multiband.BAND_BALLISTICS_MS], dt)
    fn_bal = jax.jit(lambda m: pk.ballistics_pallas_rates(m, ca, cr)[0])
    res["ballistics_alone"] = time_fn(fn_bal, stacked["max_att"])
    res["ballistics_alone_pipelined"] = time_fn_pipelined(fn_bal, stacked["max_att"])
    m_bt = jnp.asarray(stacked["max_att"].T)
    fn_bal_c = jax.jit(lambda m: pk.ballistics_pallas_rates_bt(
        m, ca, cr, mode="collapse")[0])
    fn_bal_s = jax.jit(lambda m: pk.ballistics_pallas_rates_bt(
        m, ca, cr, mode="serial")[0])
    res["ballistics_bt_collapse"] = time_fn(fn_bal_c, m_bt)
    res["ballistics_bt_collapse_pipelined"] = time_fn_pipelined(fn_bal_c, m_bt)
    res["ballistics_bt_collapse_device"] = time_fn_device_const(
        lambda m: pk.ballistics_pallas_rates_bt(m, ca, cr,
                                                mode="collapse")[0], m_bt)
    res["ballistics_bt_serial"] = time_fn(fn_bal_s, m_bt)
    res["ballistics_bt_serial_pipelined"] = time_fn_pipelined(fn_bal_s, m_bt)
    res["ballistics_bt_serial_device"] = time_fn_device_const(
        lambda m: pk.ballistics_pallas_rates_bt(m, ca, cr,
                                                mode="serial")[0], m_bt)

    # recombine einsum alone
    att = fn_bal(stacked["max_att"])
    def recombine(b, a):
        a_full = jnp.repeat(a, cfg.comp_hop, axis=0)[:n]
        g = 10.0 ** (-a_full / 20.0)
        return jnp.einsum("bnc,nb->nc", b, g)
    fn_rec = jax.jit(recombine)
    res["recombine_alone"] = time_fn(fn_rec, bands, att)
    res["recombine_alone_pipelined"] = time_fn_pipelined(fn_rec, bands, att)

    # EQ alone; saturate alone; loudness alone
    fn_eq = jax.jit(lambda a, p: apply_eq(a, p, cfg)[0])
    res["eq_alone"] = time_fn(fn_eq, x, params)
    res["eq_alone_pipelined"] = time_fn_pipelined(fn_eq, x, params)
    fn_sat = jax.jit(lambda a: saturate(a, 20.0))
    res["saturate_alone"] = time_fn(fn_sat, x)
    res["saturate_alone_pipelined"] = time_fn_pipelined(fn_sat, x)
    fn_lufs = jax.jit(lambda a: loud.normalize_to_lufs(
        a, fs, -14.0, downmix=cfg.measure_downmix,
        filter_method=cfg.filter_method)[0])
    res["lufs_alone"] = time_fn(fn_lufs, x)
    res["lufs_alone_pipelined"] = time_fn_pipelined(fn_lufs, x)

    # rows-form loudness alone (the no-mb chain's meter path: K-filter
    # states + bucket dots over (C, nb, L) rows — chain.py's actual body)
    L = cfg.block_size
    nbk = x.shape[0] // L
    xr = jnp.asarray(np.ascontiguousarray(
        np.asarray(x[: nbk * L]).T).reshape(2, nbk, L))
    fn_lufs_rows = jax.jit(lambda a: loud.integrated_loudness_rows(
        a, fs, downmix=cfg.measure_downmix))
    res["lufs_rows_alone"] = time_fn(fn_lufs_rows, xr)
    res["lufs_rows_alone_pipelined"] = time_fn_pipelined(fn_lufs_rows, xr)

    out = json.dumps(res, indent=2)
    print(out)
    args = _parse_args()
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


def _parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the JSON breakdown to this path")
    return ap.parse_args()


if __name__ == "__main__":
    main()
