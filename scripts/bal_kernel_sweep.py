"""Empirical sweep of ballistics-kernel formulations on the TPU.

Diagnoses where the per-control-step cycles go: copy-only loop structure,
lane extraction, update math, or output collection.  One process (single
chip claim); prints JSON.
"""

import functools
import json
import time

import numpy as np


def _sync(out):
    import jax

    jax.block_until_ready(out)
    np.asarray(out[tuple(slice(0, 1) for _ in out.shape)])


def bench(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SUB, LANES = 8, 128
    T = 992256  # ~1M control steps (hop-8 on a 3-min track), 128-aligned
    rng = np.random.default_rng(0)
    m_host = np.abs(rng.standard_normal((SUB, T))).astype(np.float32) * 3
    m = jnp.asarray(m_host)
    ca = jnp.asarray(np.full((SUB, 1), 0.0181, np.float32))
    cr = jnp.asarray(np.full((SUB, 1), 0.0009, np.float32))
    att0 = jnp.zeros((SUB, 1), jnp.float32)

    results = {}

    def run_variant(name, kernel_body, tile=8192):
        grid = (T // tile,)
        spec = pl.BlockSpec((SUB, tile), lambda i: (0, i))
        one = pl.BlockSpec((SUB, 1), lambda i: (0, 0))

        def kern(m_ref, ca_ref, cr_ref, att0_ref, out_ref, final_ref,
                 carry_ref):
            step = pl.program_id(0)

            @pl.when(step == 0)
            def _():
                carry_ref[:, :] = att0_ref[:, :]

            att = kernel_body(m_ref, ca_ref[:, :], cr_ref[:, :], out_ref,
                              carry_ref[:, :], tile)
            carry_ref[:, :] = att

            @pl.when(step == pl.num_programs(0) - 1)
            def _():
                final_ref[:, :] = att

        @jax.jit
        def go(m, ca, cr, att0):
            out, final = pl.pallas_call(
                kern, grid=grid,
                in_specs=[spec, one, one, one], out_specs=[spec, one],
                out_shape=[jax.ShapeDtypeStruct((SUB, T), m.dtype),
                           jax.ShapeDtypeStruct((SUB, 1), m.dtype)],
                scratch_shapes=[pltpu.VMEM((SUB, 1), m.dtype)],
            )(m, ca, cr, att0)
            return out

        try:
            results[name] = bench(go, m, ca, cr, att0)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {type(e).__name__}: {e}"[:200]

    lanes_iota = None

    # V0: copy-only (loop structure + collection cost floor)
    def v0(m_ref, ca, cr, out_ref, att, tile):
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            out_ref[:, pl.ds(base, LANES)] = m_ref[:, pl.ds(base, LANES)]
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V1: current library version (extract + select collection)
    def v1(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + m0 * ca, m0)
                release = jnp.maximum(att - m0 * cr, 0.0)
                att = jnp.where((m0 > 0.0) & (att <= m0), attack, release)
                outs = jnp.where(lanes == j, att, outs)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V2: drop redundant m0>0 test; precompute inc/dec vectors per macro
    def v2(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            iv = mv * ca
            dv = mv * cr
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + iv[:, j:j + 1], m0)
                release = jnp.maximum(att - dv[:, j:j + 1], 0.0)
                att = jnp.where(att <= m0, attack, release)
                outs = jnp.where(lanes == j, att, outs)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V3: replicated-att full-register update, static extract re-broadcast
    def v3(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        def macro(k, att_n):  # att_n: (SUB,1)
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            iv = mv * ca
            dv = mv * cr
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            att_b = jnp.broadcast_to(att_n, (SUB, LANES))
            for j in range(LANES):
                cand = jnp.where(att_b <= mv,
                                 jnp.minimum(att_b + iv, mv),
                                 jnp.maximum(att_b - dv, 0.0))
                cj = cand[:, j:j + 1]
                outs = jnp.where(lanes == j, cj, outs)
                att_b = jnp.broadcast_to(cj, (SUB, LANES))
            out_ref[:, pl.ds(base, LANES)] = outs
            return att_b[:, 0:1]
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V4: V2 with per-step dynamic store instead of select collection
    def v4(m_ref, ca, cr, out_ref, att, tile):
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            iv = mv * ca
            dv = mv * cr
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + iv[:, j:j + 1], m0)
                release = jnp.maximum(att - dv[:, j:j + 1], 0.0)
                att = jnp.where(att <= m0, attack, release)
                out_ref[:, pl.ds(base + j, 1)] = att
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V5: single extract per step + clip-form update with the hi = max(m0,
    # att) identity (exact: attack needs hi=m0 and att<=m0 there; release
    # needs any hi >= att-d and max(m0, att) >= att there) — 9 ops/step.
    def v5(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        ncr = -cr
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                r = jnp.where(att <= m0, ca, ncr)
                att = jnp.minimum(jnp.maximum(att + m0 * r, 0.0),
                                  jnp.maximum(m0, att))
                outs = jnp.where(lanes == j, att, outs)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V6: v2 extracts + hi-trick (drop one where)
    def v6(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            iv = mv * ca
            ndv = mv * (-cr)
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                delta = jnp.where(att <= m0, iv[:, j:j + 1], ndv[:, j:j + 1])
                att = jnp.minimum(jnp.maximum(att + delta, 0.0),
                                  jnp.maximum(m0, att))
                outs = jnp.where(lanes == j, att, outs)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V7: pure dependency chain with constants — measures the latency floor
    # (no extracts, no output collection; result written once per macro so
    # nothing is dead-code-eliminated)
    def v7(m_ref, ca, cr, out_ref, att, tile):
        c1 = ca * 100.0
        c2 = ca
        c3 = cr
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            for _ in range(LANES):
                attack = jnp.minimum(att + c2, c1)
                release = att - c3
                att = jnp.where(att <= c1, attack, release)
            out_ref[:, pl.ds(base, LANES)] = jnp.broadcast_to(att, (SUB, LANES))
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V8: v2 minus the release floor max(.,0) — provably dead when cr <= 1
    # (release branch implies att > m0 >= 0, so att - m0*cr > m0*(1-cr) >= 0)
    def v8(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            iv = mv * ca
            dv = mv * cr
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + iv[:, j:j + 1], m0)
                release = att - dv[:, j:j + 1]
                att = jnp.where(att <= m0, attack, release)
                outs = jnp.where(lanes == j, att, outs)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V9: ONE extract per step (inc/dec via muls — ALU is ~free next to
    # shuffles), select collection
    def v9(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + m0 * ca, m0)
                release = jnp.maximum(att - m0 * cr, 0.0)
                att = jnp.where(att <= m0, attack, release)
                outs = jnp.where(lanes == j, att, outs)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V10: v9 with additive one-hot collection (mul+add vs broadcast+select)
    def v10(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + m0 * ca, m0)
                release = jnp.maximum(att - m0 * cr, 0.0)
                att = jnp.where(att <= m0, attack, release)
                onehot = (lanes == j).astype(m_ref.dtype)
                outs = outs + att * onehot
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V11: v7 math + ONLY the per-step mv extract (isolates extraction cost)
    def v11(m_ref, ca, cr, out_ref, att, tile):
        c1 = ca * 100.0
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + m0, c1)
                release = att - m0
                att = jnp.where(att <= c1, attack, release)
            out_ref[:, pl.ds(base, LANES)] = jnp.broadcast_to(att, (SUB, LANES))
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V12: v7 math + ONLY the per-step collection (isolates collection cost)
    def v12(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        c1 = ca * 100.0
        c2 = ca
        c3 = cr
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            for j in range(LANES):
                attack = jnp.minimum(att + c2, c1)
                release = att - c3
                att = jnp.where(att <= c1, attack, release)
                outs = jnp.where(lanes == j, att, outs)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V13: extract + full math, NO per-step collection
    def v13(m_ref, ca, cr, out_ref, att, tile):
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + m0 * ca, m0)
                release = jnp.maximum(att - m0 * cr, 0.0)
                att = jnp.where(att <= m0, attack, release)
            out_ref[:, pl.ds(base, LANES)] = jnp.broadcast_to(att, (SUB, LANES))
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V14: extract feeds ONLY the compare; math otherwise constant; collect on
    def v14(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        c1 = ca * 100.0
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + ca, c1)
                release = att - cr
                att = jnp.where(att <= m0, attack, release)
                outs = jnp.where(lanes == j, att, outs)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V16: v14 + ONE mul with the extracted value
    def v16(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        c1 = ca * 100.0
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + m0 * ca, c1)
                release = att - cr
                att = jnp.where(att <= m0, attack, release)
                outs = jnp.where(lanes == j, att, outs)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V17: v14 + extracted value in MIN (no mul)
    def v17(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + ca, m0)
                release = att - cr
                att = jnp.where(att <= m0, attack, release)
                outs = jnp.where(lanes == j, att, outs)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V20: TWO dynamic-sliced sources (mv + precomputed iv), no muls in loop
    def v20(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            iv = mv * ca
            outs = jnp.zeros((SUB, LANES), m_ref.dtype)
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + iv[:, j:j + 1], m0)
                release = att - cr
                att = jnp.where(att <= m0, attack, release)
                outs = jnp.where(lanes == j, att, outs)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V21: THREE dynamic-sliced sources, exact math, NO collection
    def v21(m_ref, ca, cr, out_ref, att, tile):
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            iv = mv * ca
            dv = mv * cr
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + iv[:, j:j + 1], m0)
                release = jnp.maximum(att - dv[:, j:j + 1], 0.0)
                att = jnp.where(att <= m0, attack, release)
            out_ref[:, pl.ds(base, LANES)] = jnp.broadcast_to(att, (SUB, LANES))
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V22: exact math (3 sliced sources) + shift-concat collection — no
    # persistent iota/zeros registers; outs shifts left, att lands at 127
    def v22(m_ref, ca, cr, out_ref, att, tile):
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            iv = mv * ca
            dv = mv * cr
            outs = mv
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + iv[:, j:j + 1], m0)
                release = jnp.maximum(att - dv[:, j:j + 1], 0.0)
                att = jnp.where(att <= m0, attack, release)
                outs = jnp.concatenate([outs[:, 1:], att], axis=1)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    # V23: exact math + select collection (lanes iota) but dv eliminated
    # via release computed from iv and a per-band constant ratio... kept
    # simple: v2 with the zeros-init replaced by mv (one fewer constant)
    def v23(m_ref, ca, cr, out_ref, att, tile):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        def macro(k, att):
            base = pl.multiple_of(k * LANES, LANES)
            mv = m_ref[:, pl.ds(base, LANES)]
            iv = mv * ca
            dv = mv * cr
            outs = mv
            for j in range(LANES):
                m0 = mv[:, j:j + 1]
                attack = jnp.minimum(att + iv[:, j:j + 1], m0)
                release = jnp.maximum(att - dv[:, j:j + 1], 0.0)
                att = jnp.where(att <= m0, attack, release)
                outs = jnp.where(lanes == j, att, outs)
            out_ref[:, pl.ds(base, LANES)] = outs
            return att
        return jax.lax.fori_loop(0, tile // LANES, macro, att)

    run_variant("v22_shift_collect", v22)
    run_variant("v23_five_regs_again", v23)

    # RPC baseline
    f2 = jax.jit(lambda m: m * 2.0)
    results["rpc_baseline"] = bench(f2, m)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
