"""Parity tests for the fused Pallas multiband pipeline (interpret mode).

The kernels (ops/pallas_multiband.py) must reproduce the XLA fused rows
path (ops/multiband.multiband_compress_rows, kernel="xla") — same
contract, same state dict — because models/chain and parallel/streaming
switch between them by backend.  Reference multiband behavior:
engine:196-210 (crossovers engine:197-198, band ballistics engine:207-209).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from python_audio_mastering_tpu.ops import iir, multiband

from .conftest import make_signal

FS = 44100
KW = dict(thresholds_db=(-25.0, -20.0, -15.0), ratios=(6.0, 3.0, 4.0))


def _rows(n, channels=2, L=512, seed=0, scale=0.5):
    x = make_signal(n, channels=channels, seed=seed) * scale
    xT = jnp.asarray(x.T, jnp.float32)
    return xT.reshape(channels, n // L, L)


def test_states_multi_rows_matches_blocked():
    """sosfilt_states_multi_rows' per-block states must recompute the
    blocked filter outputs exactly: y_blk = x_blk @ T + s_in @ W.T."""
    L, nb, c = 512, 20, 2
    xrows = _rows(nb * L, channels=c, L=L)
    lp, hp = multiband._crossover_sos(FS, 250.0, 4000.0)
    (ys_ref, zf_ref) = iir.sosfilt_blocked_multi_rows((lp, hp), xrows)
    (s_ins, zfs) = iir.sosfilt_states_multi_rows((lp, hp), xrows)
    rows = np.asarray(xrows).reshape(c * nb, L)
    for f, sos in enumerate((lp, hp)):
        t_mat, g, w, al = iir._blocked_operators_static(
            np.asarray(sos, np.float64).tobytes(), sos.shape[0], L)
        s_in = np.asarray(s_ins[f], np.float64).reshape(c * nb, -1)
        y = rows.astype(np.float64) @ t_mat + s_in @ w.T
        np.testing.assert_allclose(y.reshape(c, nb, L),
                                   np.asarray(ys_ref[f]), rtol=2e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(zfs[f]),
                                   np.asarray(zf_ref[f]), rtol=1e-6,
                                   atol=1e-8)


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("hop,block_ctrl,ballistics", [
    (1, None, "scan"), (8, 2048, "blocked")])
def test_rows_kernel_matches_xla(channels, hop, block_ctrl, ballistics):
    L, nb = 512, 24
    xrows = _rows(nb * L, channels=channels, L=L)
    common = dict(hop=hop, block_ctrl=block_ctrl, ballistics=ballistics,
                  **KW)
    ref = np.asarray(multiband.multiband_compress_rows(
        xrows, FS, kernel="xla", **common))
    got = np.asarray(multiband.multiband_compress_rows(
        xrows, FS, kernel="pallas_interpret", **common))
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-6)


def test_rows_kernel_nondivisible_superblock():
    """nb not a multiple of the 128-block superblock: the grid tail's
    garbage rows must never leak into valid output rows."""
    from python_audio_mastering_tpu.ops import pallas_multiband as pmb

    L = 512
    for nb in (130, 129):
        xrows = _rows(nb * L, L=L, seed=nb)
        old_sup = pmb._SUP
        try:
            pmb._SUP = 128
            got = np.asarray(multiband.multiband_compress_rows(
                xrows, FS, kernel="pallas_interpret", hop=8,
                block_ctrl=2048, ballistics="blocked", **KW))
        finally:
            pmb._SUP = old_sup
        ref = np.asarray(multiband.multiband_compress_rows(
            xrows, FS, kernel="xla", hop=8, block_ctrl=2048,
            ballistics="blocked", **KW))
        np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-6)
        assert np.isfinite(got).all()


def test_rows_kernel_streamed_state_carry():
    """Two kernel-path chunks with carried state == one-shot kernel path,
    and the state dict interchanges with the XLA path's (cross-backend
    checkpoint resume)."""
    L, nb = 512, 32
    xrows = _rows(nb * L, L=L)
    # exact scan ballistics: the blocked approximation's warm-start block
    # grid shifts between one-shot and chunked runs (~1e-4, inherent to the
    # approximation, not the kernel) and would mask a real kernel bug here
    common = dict(hop=8, ballistics="scan", **KW)

    one = np.asarray(multiband.multiband_compress_rows(
        xrows, FS, kernel="pallas_interpret", **common))

    half = nb // 2
    y1, st = multiband.multiband_compress_rows(
        xrows[:, :half], FS, kernel="pallas_interpret",
        return_state=True, **common)
    assert st.get("ctrl_tail") is not None
    # resume the second chunk on the XLA path from the kernel path's state
    y2x = multiband.multiband_compress_rows(
        xrows[:, half:], FS, kernel="xla", state=st, **common)
    y2p = multiband.multiband_compress_rows(
        xrows[:, half:], FS, kernel="pallas_interpret", state=st, **common)
    streamed = np.concatenate([np.asarray(y1), np.asarray(y2p)], axis=1)
    # chunked-vs-oneshot f32 detector-cumsum reassociation is ~6e-5 on the
    # XLA path too (measured identical) — the budget here is that drift,
    # not kernel error
    np.testing.assert_allclose(streamed, one, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y2x), np.asarray(y2p),
                               rtol=5e-5, atol=5e-6)


def test_emit_mono_matches_channel_mean():
    """emit_mono's folded loudness downmix must equal y.mean(axis=0) on
    both backends (and thread through return_state)."""
    L, nb = 512, 24
    xrows = _rows(nb * L, L=L)
    common = dict(hop=8, ballistics="scan", **KW)
    for k in ("xla", "pallas_interpret"):
        y, ym, st = multiband.multiband_compress_rows(
            xrows, FS, kernel=k, emit_mono=True, return_state=True,
            **common)
        y2 = multiband.multiband_compress_rows(xrows, FS, kernel=k, **common)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(ym),
                                   np.asarray(y).mean(axis=0),
                                   rtol=1e-6, atol=1e-8)
        assert st.get("ctrl_tail") is not None


def test_front_kernel_matches_ops_path():
    """The fused front (saturate -> EQ-from-states -> width) must equal the
    plain ops path on both backends, including carried-zi streaming."""
    import dataclasses

    from python_audio_mastering_tpu import ChainConfig, MasteringParams
    from python_audio_mastering_tpu.models.chain import _front

    L, nb = 512, 24
    params = MasteringParams.from_settings(
        {"saturation": 25, "preset": "dubstep", "width": 1.4})
    base = ChainConfig(sample_rate=FS, filter_method="blocked")
    for channels in (1, 2):
        xrows = _rows(nb * L, channels=channels, L=L, seed=channels)
        ref = np.asarray(_front(xrows, params,
                                dataclasses.replace(base, mb_kernel="xla")))
        got = np.asarray(_front(
            xrows, params,
            dataclasses.replace(base, mb_kernel="pallas_interpret")))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)

    # streaming: two chunks with carried zi == one-shot
    xrows = _rows(nb * L, channels=2, L=L)
    cfgk = dataclasses.replace(base, mb_kernel="pallas_interpret")
    one = np.asarray(_front(xrows, params, cfgk))
    half = nb // 2
    y1, zf = _front(xrows[:, :half], params, cfgk, return_state=True)
    y2 = _front(xrows[:, half:], params, cfgk, state=zf)
    streamed = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
    np.testing.assert_allclose(streamed, one, rtol=2e-5, atol=1e-6)


def test_front_emit_mono_matches_channel_mean():
    """The front kernel's emit_mono epilogue (the no-multiband chain's
    loudness downmix) must equal y.mean(axis=0) on both backends, thread
    through return_state, and pass the signal through unchanged on mono."""
    import dataclasses

    from python_audio_mastering_tpu import ChainConfig, MasteringParams
    from python_audio_mastering_tpu.models.chain import _front

    L, nb = 512, 24
    params = MasteringParams.from_settings(
        {"saturation": 15, "preset": "pop", "width": 1.2})
    base = ChainConfig(sample_rate=FS, filter_method="blocked")
    xrows = _rows(nb * L, channels=2, L=L)
    for k in ("xla", "pallas_interpret"):
        cfg = dataclasses.replace(base, mb_kernel=k)
        y, ym = _front(xrows, params, cfg, emit_mono=True)
        y2 = _front(xrows, params, cfg)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(ym),
                                   np.asarray(y).mean(axis=0),
                                   rtol=1e-6, atol=1e-8)
        y3, ym3, zf = _front(xrows, params, cfg, emit_mono=True,
                             return_state=True)
        np.testing.assert_allclose(np.asarray(y3), np.asarray(y),
                                   rtol=0, atol=0)
        assert zf is not None
    # mono input: the downmix IS the signal
    xm = _rows(nb * L, channels=1, L=L, seed=3)
    cfg = dataclasses.replace(base, mb_kernel="pallas_interpret")
    y, ym = _front(xm, params, cfg, emit_mono=True)
    np.testing.assert_allclose(np.asarray(ym), np.asarray(y)[0],
                               rtol=0, atol=0)


def test_kweight_cells_kernel_matches_xla():
    """The fused loudness-cells kernel (K-filter recompute + square +
    bucket dot in VMEM) must reproduce the XLA rows path's 100 ms cell
    energies, including carried-zi streaming."""
    from python_audio_mastering_tpu.ops import loudness as loud

    L, nb = 512, 90  # > 1 s so several complete cells exist
    for channels in (1, 2):
        xrows = _rows(nb * L, channels=channels, L=L, seed=channels)
        ref, _, _ = loud.block_cell_energies_rows(xrows, FS, kernel="xla")
        got, _, _ = loud.block_cell_energies_rows(xrows, FS,
                                                  kernel="pallas_interpret")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=1e-10)
    # streaming: two chunks with carried K state == one-shot
    xrows = _rows(nb * L, channels=1, L=L, seed=7)
    one, _, _ = loud.block_cell_energies_rows(xrows, FS,
                                              kernel="pallas_interpret")
    half = nb // 2
    c1, _, zf = loud.block_cell_energies_rows(
        xrows[:, :half], FS, kernel="pallas_interpret", return_state=True)
    c2, _, _ = loud.block_cell_energies_rows(
        xrows[:, half:], FS, zi=zf, kernel="pallas_interpret")
    streamed = np.concatenate([np.asarray(c1), np.asarray(c2)], axis=0)
    # chunk boundary (half*L) is not a cell multiple here, so compare the
    # cells wholly inside each chunk against the one-shot grid
    cell = int(round(0.1 * FS))
    n1 = (half * L) // cell
    np.testing.assert_allclose(np.asarray(c1), np.asarray(one)[:n1],
                               rtol=2e-5, atol=1e-10)
    # integrated loudness through both paths agrees to well under 0.001 LU
    li_x = float(loud.integrated_loudness_rows(xrows, FS, kernel="xla"))
    li_p = float(loud.integrated_loudness_rows(xrows, FS,
                                               kernel="pallas_interpret"))
    assert abs(li_x - li_p) < 1e-3


def test_full_chain_interpret_kernels_match_xla():
    """master() with every Pallas kernel forced (interpret) must match the
    XLA body — multiband on and off (the off case drives the front
    kernel's emit_mono downmix + the fused loudness-cells kernel)."""
    import dataclasses

    import jax

    from python_audio_mastering_tpu import ChainConfig, MasteringParams
    from python_audio_mastering_tpu.models.chain import master

    x = make_signal(int(FS * 1.2), channels=2, seed=5) * 0.5
    base = ChainConfig(sample_rate=FS, filter_method="blocked",
                       comp_hop=8, comp_block_ctrl=2048)
    for mb in (False, True):
        params = MasteringParams.from_settings(
            {"saturation": 20, "preset": "techno", "width": 1.3,
             "lufs": -14.0, "multiband": mb})
        ref = np.asarray(master(jnp.asarray(x, jnp.float32), params,
                                dataclasses.replace(base, mb_kernel="xla")))
        got = np.asarray(master(
            jnp.asarray(x, jnp.float32), params,
            dataclasses.replace(base, mb_kernel="pallas_interpret")))
        assert np.max(np.abs(got - ref)) < 2e-4, (mb, np.max(np.abs(got - ref)))
