"""IIR (SOS cascade) execution — the sequential heart of the mastering chain.

The reference leans on ``scipy.signal.sosfilt`` (a sequential C loop over
samples, reference engine:183/194/200-203).  On TPU we provide two
executions of the *same* filter:

* :func:`sosfilt_scan` — direct-form II transposed as a ``lax.scan`` with an
  explicit carried state ``zi``/``zf``.  Bit-matches scipy's arithmetic
  (same op order per sample) and is the parity oracle + streaming-state
  reference.  O(N) sequential — fine for short signals and tests.

* :func:`sosfilt_blocked` — the TPU-native formulation.  A biquad cascade is
  a *linear* recurrence ``s[n] = A s[n-1] + B x[n]``, ``y[n] = C s[n-1] +
  D x[n]`` (A is 2K×2K for K sections).  Split the signal into blocks of L
  samples; within a block, the zero-state response is an exact causal FIR
  convolution with the cascade's impulse response (exact because only L
  samples of history matter inside a block — no truncation error), which we
  evaluate as a dense (L, L) lower-triangular Toeplitz **matmul on the MXU**.
  Block-boundary states are propagated by a tiny ``associative_scan`` over
  2K-vectors, and each block's output is corrected by its incoming state via
  a second small matmul.  Total: two MXU matmuls + an O(log B) scan — the
  sequential dependency of the IIR is reduced from N samples to log(blocks).

Both support multichannel input ``(N,)`` or ``(N, C)`` and carried state for
overlap-free chunked streaming (this fixes the reference's per-chunk filter
state reset defect, engine:48-77 — see SURVEY.md §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sosfilt_scan",
    "sosfilt_blocked",
    "sosfilt_blocked_cm",
    "sosfilt_blocked_multi_cm",
    "sosfilt_blocked_rows",
    "sosfilt_blocked_multi_rows",
    "sosfilt_states_multi_rows",
    "sosfilt_states_rows",
    "sosfilt",
    "cascade_state_space",
    "zi_to_state",
    "state_to_zi",
]

_HIGHEST = jax.lax.Precision.HIGHEST


def _as_sos(sos, dtype):
    sos = jnp.asarray(sos, dtype=dtype)
    if sos.ndim != 2 or sos.shape[1] != 6:
        raise ValueError(f"sos must have shape (K, 6), got {sos.shape}")
    return sos


# ---------------------------------------------------------------------------
# Exact scan execution (scipy sosfilt parity)
# ---------------------------------------------------------------------------


def sosfilt_scan(sos, x, zi=None):
    """Direct-form II transposed SOS filter as a ``lax.scan``.

    Args:
      sos: ``(K, 6)`` sections ``[b0, b1, b2, 1, a1, a2]``.
      x: ``(N,)`` or ``(N, C)`` signal.
      zi: optional initial state ``(K, 2)`` (1-D x) or ``(K, 2, C)``.

    Returns:
      ``(y, zf)`` with ``y`` shaped like ``x`` and ``zf`` like ``zi``.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, c = x.shape
    sos = _as_sos(sos, x.dtype)
    k = sos.shape[0]
    if zi is None:
        zi = jnp.zeros((k, 2, c), dtype=x.dtype)
    else:
        zi = jnp.asarray(zi, dtype=x.dtype)
        if squeeze and zi.ndim == 2:
            zi = zi[:, :, None]

    b0 = sos[:, 0][:, None]
    b1 = sos[:, 1][:, None]
    b2 = sos[:, 2][:, None]
    a1 = sos[:, 4][:, None]
    a2 = sos[:, 5][:, None]

    def step(z, x_t):
        # z: (K, 2, C); x_t: (C,)
        new_z = []
        cur = x_t
        for j in range(k):
            y = b0[j] * cur + z[j, 0]
            z1 = b1[j] * cur - a1[j] * y + z[j, 1]
            z2 = b2[j] * cur - a2[j] * y
            new_z.append(jnp.stack([z1, z2]))
            cur = y
        return jnp.stack(new_z), cur

    zf, y = jax.lax.scan(step, zi, x)
    if squeeze:
        y = y[:, 0]
        zf = zf[:, :, 0]
    return y, zf


# ---------------------------------------------------------------------------
# Cascade state-space
# ---------------------------------------------------------------------------


def cascade_state_space(sos):
    """State-space (A, B, C, D) of an SOS cascade in DF2T coordinates.

    Per section (DF2T): ``y = b0 x + z1``; ``z1' = (b1 - a1 b0) x - a1 z1 +
    z2``; ``z2' = (b2 - a2 b0) x - a2 z1``.  States of consecutive sections
    are stacked, so the full state is exactly ``zi.reshape(2K)`` in scipy's
    ``(K, 2)`` layout (see :func:`zi_to_state`).
    """
    sos = jnp.asarray(sos)
    k = sos.shape[0]
    dt = sos.dtype
    a_full = jnp.zeros((2 * k, 2 * k), dtype=dt)
    b_full = jnp.zeros((2 * k,), dtype=dt)
    c_full = jnp.zeros((2 * k,), dtype=dt)
    d_full = jnp.ones((), dtype=dt)
    for j in range(k):
        b0, b1, b2, _, a1, a2 = [sos[j, i] for i in range(6)]
        a_j = jnp.array([[0.0, 0.0], [0.0, 0.0]], dtype=dt)
        a_j = a_j.at[0, 0].set(-a1).at[0, 1].set(1.0).at[1, 0].set(-a2)
        b_j = jnp.stack([b1 - a1 * b0, b2 - a2 * b0])
        c_j = jnp.array([1.0, 0.0], dtype=dt)
        if j == 0:
            a_full = a_full.at[:2, :2].set(a_j)
            b_full = b_full.at[:2].set(b_j)
            c_full = c_full.at[:2].set(c_j)
            d_full = b0
        else:
            s = 2 * j
            # cascade: new section's input is previous cascade's output
            a_full = a_full.at[s:s + 2, s:s + 2].set(a_j)
            a_full = a_full.at[s:s + 2, :s].set(jnp.outer(b_j, c_full[:s]))
            b_full = b_full.at[s:s + 2].set(b_j * d_full)
            c_full = jnp.concatenate([c_full[:s] * b0, c_j])
            c_full = jnp.pad(c_full, (0, 2 * k - s - 2))
            d_full = d_full * b0
    return a_full, b_full, c_full, d_full


def zi_to_state(zi):
    """scipy-layout ``(K, 2[, C])`` state → cascade state ``(2K[, C])``."""
    return zi.reshape((zi.shape[0] * 2,) + zi.shape[2:])


def state_to_zi(s, k):
    """Cascade state ``(2K[, C])`` → scipy-layout ``(K, 2[, C])``."""
    return s.reshape((k, 2) + s.shape[1:])


# ---------------------------------------------------------------------------
# Blocked (MXU) execution
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _state_space_static(sos_bytes, k):
    """Float64 numpy ``(A, B, C, D)`` for a static SOS cascade.

    Pure-numpy build (no jax) so float64 survives even when jax x64 is
    disabled — the production default.
    """
    import numpy as onp

    sos = onp.frombuffer(sos_bytes, dtype=onp.float64).reshape(k, 6)
    a = onp.zeros((2 * k, 2 * k))
    b = onp.zeros(2 * k)
    c = onp.zeros(2 * k)
    d = 1.0
    for j in range(k):
        b0, b1, b2, _, a1, a2 = sos[j]
        a_j = onp.array([[-a1, 1.0], [-a2, 0.0]])
        b_j = onp.array([b1 - a1 * b0, b2 - a2 * b0])
        s = 2 * j
        a[s:s + 2, s:s + 2] = a_j
        if j == 0:
            b[:2] = b_j
            c[:2] = [1.0, 0.0]
            d = b0
        else:
            a[s:s + 2, :s] = onp.outer(b_j, c[:s])
            b[s:s + 2] = b_j * d
            c = onp.concatenate([c[:s] * b0, [1.0, 0.0],
                                 onp.zeros(2 * k - s - 2)])
            d = d * b0
    return a, b, c, d


@functools.lru_cache(maxsize=64)
def _blocked_operators_static(sos_bytes, k, block_size):
    """Float64 host-side operator precompute for *static* coefficients.

    The in-graph float32 operator chain (L-step associative matrix-power
    scan) loses ~1e-2 relative energy accuracy for near-unit-circle poles
    (the 38 Hz K-weighting high-pass); building the operators in float64
    numpy once and casting brings the blocked filter's energy error down to
    ~3e-7 — essential for ≤0.1 LU loudness in float32 (see
    tests/test_loudness.py::test_float32_accuracy_within_baseline).
    """
    import numpy as onp

    a, b, c, d = _state_space_static(sos_bytes, k)
    s_dim = a.shape[0]
    L = block_size
    powers = onp.empty((L, s_dim, s_dim))
    powers[0] = onp.eye(s_dim)
    for t in range(1, L):
        powers[t] = a @ powers[t - 1]
    al = a @ powers[L - 1]
    v = powers @ b
    h = onp.concatenate([[d], v[: L - 1] @ c])
    ii = onp.arange(L)
    idx = ii[None, :] - ii[:, None]
    t_mat = onp.where(idx >= 0, h[onp.clip(idx, 0, L - 1)], 0.0)
    g = v[::-1].copy()
    w = onp.einsum("i,tij->tj", c, powers)
    return t_mat, g, w, al


@functools.lru_cache(maxsize=256)
def _rem_operators_static(sos_bytes, k, rem):
    """Final-state operators for a partial last block (static coefficients).

    The state after only ``rem`` valid samples of a block is the affine map
    ``s_final = A^rem s_in + Σ_{j<rem} A^{rem-1-j} B x[j]`` — i.e. one tiny
    matvec plus one ``(rem,)·(rem, S)`` contraction, replacing the
    ``rem``-step ``lax.scan`` tail that used to dominate streamed-chunk
    state finalization (~500 sequential steps per filter per chunk).
    Returns ``(a_rem (S, S), g_rem (rem, S))`` in float64.

    Built directly from the cached state space rather than through
    ``_blocked_operators_static``: the full block-operator build makes an
    unneeded ``(rem, rem)`` Toeplitz, and inserting one entry per distinct
    remainder length into that small shared LRU would evict the hot
    block-size operators in a long-running worker.
    """
    import numpy as onp

    a, b, _, _ = _state_space_static(sos_bytes, k)
    s_dim = a.shape[0]
    r = max(rem, 1)
    powers = onp.empty((r, s_dim, s_dim))
    powers[0] = onp.eye(s_dim)
    for t in range(1, r):
        powers[t] = a @ powers[t - 1]
    al = a @ powers[r - 1]             # A^rem
    g = (powers @ b)[::-1].copy()      # g[j] = A^{rem-1-j} B
    return al, g


def _final_state_static(s_in_last, x_last, static_sos, rem, dtype):
    """Affine final-state update through ``rem`` valid samples (static).

    ``s_in_last``: ``(S,)`` or ``(S, C)``; ``x_last``: ``(rem,)`` or
    ``(C, rem)`` — the valid samples of the partial last block.
    """
    a_rem, g_rem = _rem_operators_static(
        static_sos.astype("float64").tobytes(), static_sos.shape[0], rem)
    a_rem = jnp.asarray(a_rem, dtype)
    g_rem = jnp.asarray(g_rem, dtype)
    drive = jnp.einsum("...t,ti->i..." if x_last.ndim == 2 else "t,ti->i",
                       x_last, g_rem, precision=_HIGHEST)
    return jnp.einsum("ij,j...->i...", a_rem, s_in_last,
                      precision=_HIGHEST) + drive


@functools.lru_cache(maxsize=256)
def _boundary_operators_from_a(a_bytes, s_dim, group):
    """Superblock operators for a constant affine recurrence matrix ``A``.

    For ``s[i+1] = A s[i] + t[i]``, grouping steps into superblocks of
    ``M = group``:

      * ``tbig_t`` ((M·S, M·S), block-lower-triangular of A powers):
        ``cum[m] = Σ_{j≤m} A^{m-j} t[j]`` for a whole superblock as ONE
        MXU matmul;
      * ``powers_m`` ((M, S, S)): ``A^m`` — scatters each superblock's
        incoming state to its steps;
      * ``a_m`` (S, S): ``A^M`` — the next recursion level's transition.

    All built in float64 on the host (near-unit-circle poles survive) and
    cast at use.  The recurrence applies RECURSIVELY (the superblock
    totals follow the same affine form with matrix ``A^M``), so
    :func:`_affine_prefix_static` needs NO sequential scan at any level —
    the round-3 code ran a ``lax.scan`` over the ~122 superblocks, four of
    which (EQ/crossovers/K) accounted for a large share of the compiled
    chain's serialized op count.
    """
    import numpy as onp

    a = onp.frombuffer(a_bytes, dtype=onp.float64).reshape(s_dim, s_dim)
    m_grp = group
    powers = onp.empty((m_grp + 1, s_dim, s_dim))
    powers[0] = onp.eye(s_dim)
    for t in range(1, m_grp + 1):
        powers[t] = a @ powers[t - 1]
    tbig_t = onp.zeros((m_grp * s_dim, m_grp * s_dim))
    for j in range(m_grp):
        for m in range(j, m_grp):
            # cum_flat = t_flat @ tbig_t ⇒ tbig_t[j·S+sj, m·S+sm] = A^{m-j}[sm, sj]
            tbig_t[j * s_dim:(j + 1) * s_dim, m * s_dim:(m + 1) * s_dim] = \
                powers[m - j].T
    return powers[:m_grp], tbig_t, powers[m_grp]


def _affine_prefix_static(t_vec, s0, a_np, dtype, m_grp=128):
    """Prefix states of ``s[i+1] = a s[i] + t[i]`` (``s_in[0] = s0``) for a
    constant float64 numpy ``a`` — scan-free at every level (see
    :func:`_boundary_operators_from_a`).  Returns ``s_in (n, S)``."""
    n, s_dim = t_vec.shape
    m = min(n, m_grp)
    ops = _boundary_operators_from_a(a_np.tobytes(), s_dim, m)
    powers_m, tbig_t, a_m_np64 = ops
    powers_m = jnp.asarray(powers_m, dtype)
    tbig_t = jnp.asarray(tbig_t, dtype)
    ng = -(-n // m)
    t_pad = jnp.pad(t_vec, ((0, ng * m - n), (0, 0)))
    cum = jnp.dot(t_pad.reshape(ng, m * s_dim), tbig_t,
                  precision=_HIGHEST).reshape(ng, m, s_dim)
    if ng == 1:
        sg_in = s0[None]
    else:
        import numpy as onp

        sg_in = _affine_prefix_static(cum[:, m - 1, :], s0,
                                      onp.ascontiguousarray(a_m_np64),
                                      dtype, m_grp=m_grp)
    s_in = (jnp.einsum("mij,gj->gmi", powers_m, sg_in, precision=_HIGHEST)
            + jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]],
                              axis=1)).reshape(ng * m, s_dim)
    return s_in[:n]


def _affine_prefix_traced(t_vec, s0, a, m_grp=128):
    """Traced-matrix twin of :func:`_affine_prefix_static`: operators built
    in-graph (powers by log-depth associative scan over M ≤ 128 mats, the
    block-Toeplitz by the stride-(2M−1) tile trick), recursion on the
    superblock totals with ``A^M`` — no sequential scan at any level."""
    n, s_dim = t_vec.shape
    m = min(n, m_grp)
    eye = jnp.eye(s_dim, dtype=a.dtype)
    reps = jnp.broadcast_to(a, (m, s_dim, s_dim))
    pow_tail = jax.lax.associative_scan(
        lambda u, v: jnp.einsum("...ij,...jk->...ik", v, u,
                                precision=_HIGHEST), reps)
    powers = jnp.concatenate([eye[None], pow_tail])  # (M+1, S, S)
    powers_m, a_m = powers[:m], powers[m]

    pc = jnp.concatenate([powers[:m],
                          jnp.zeros((m,) + powers.shape[1:], a.dtype)])
    blocks = jnp.tile(pc, (m, 1, 1))[: m * (2 * m - 1)]
    blocks = blocks.reshape(m, 2 * m - 1, s_dim, s_dim)[:, :m]
    tbig_t = blocks.transpose(0, 3, 1, 2).reshape(m * s_dim, m * s_dim)

    ng = -(-n // m)
    t_pad = jnp.pad(t_vec, ((0, ng * m - n), (0, 0)))
    cum = jnp.dot(t_pad.reshape(ng, m * s_dim), tbig_t,
                  precision=_HIGHEST).reshape(ng, m, s_dim)
    if ng == 1:
        sg_in = s0[None]
    else:
        sg_in = _affine_prefix_traced(cum[:, m - 1, :], s0, a_m,
                                      m_grp=m_grp)
    s_in = (jnp.einsum("mij,gj->gmi", powers_m, sg_in, precision=_HIGHEST)
            + jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]],
                              axis=1)).reshape(ng * m, s_dim)
    return s_in[:n]


def _blocked_operators(sos, block_size):
    """Precompute the dense operators for blocked execution.

    Returns (T, G, W, AL) where, for blocks ``xb`` of shape (B, L):
      * zero-state block output  ``y0 = xb @ T``          (T: (L, L))
      * block end-state          ``t  = xb @ G``          (G: (L, S))
      * state-correction output  ``yc = s_in @ W.T``      (W: (L, S))
      * state propagation        ``s_end = AL @ s_in + t``  (AL: (S, S))
    All derived from powers of the cascade transition matrix, computed with
    an O(log L) associative scan (powers of one matrix commute, so scan
    order is irrelevant).
    """
    a, b, c, d = cascade_state_space(sos)
    s_dim = a.shape[0]
    L = block_size
    eye = jnp.eye(s_dim, dtype=a.dtype)
    reps = jnp.broadcast_to(a, (L - 1, s_dim, s_dim))
    pow_tail = jax.lax.associative_scan(
        lambda u, v: jnp.einsum("...ij,...jk->...ik", v, u, precision=_HIGHEST),
        reps,
    )
    powers = jnp.concatenate([eye[None], pow_tail], axis=0)  # (L, S, S); powers[t] = A^t
    al = jnp.einsum("ij,jk->ik", a, powers[L - 1], precision=_HIGHEST)  # A^L
    v = jnp.einsum("tij,j->ti", powers, b, precision=_HIGHEST)  # v[t] = A^t B
    h = jnp.concatenate([d[None], jnp.einsum("ti,i->t", v[: L - 1], c,
                                             precision=_HIGHEST)])  # impulse response
    # T[j, i] = h[i - j] for i >= j (causal Toeplitz, applied as xb @ T).
    # Rows are built with the stride-(2L-1) tile trick instead of a gather:
    # with c = [h | 0_L], tile(c, L)[: L·(2L-1)] reshaped (L, 2L-1) puts
    # roll(c, j) in row j (offset −j mod 2L), whose first L entries are
    # exactly h[i−j]·[i ≥ j].  A (L, L) gather from h measured 2.1 ms per
    # chain call on the bench chip; this is pure tile/reshape/slice and
    # fuses to noise.
    hc = jnp.concatenate([h, jnp.zeros((L,), h.dtype)])
    t_mat = jnp.tile(hc, L)[: L * (2 * L - 1)].reshape(L, 2 * L - 1)[:, :L]
    g = v[::-1]  # G[j] = A^{L-1-j} B
    w = jnp.einsum("i,tij->tj", c, powers, precision=_HIGHEST)  # W[t] = C A^t
    return t_mat, g, w, al


def _boundary_states_static(t_vec, s0, static_sos, L, nb, al, dtype):
    """Scan-free boundary-state recurrence for static coefficients.

    AL is constant, so within superblocks of M blocks the cumulative state
    contributions are one MXU matmul with a precomputed operator — and the
    superblock handoffs follow the SAME affine recurrence with ``AL^M``,
    so they recurse through the same machinery instead of a ``lax.scan``
    (:func:`_affine_prefix_static`; the ~122-iteration handoff scans were
    a large share of the compiled chain's serialized op count, measured
    round 4).  Returns ``(s_in (nb, S), s_last (S,))``.
    """
    import numpy as onp

    _, _, _, al_np = _blocked_operators_static(
        static_sos.astype("float64").tobytes(), static_sos.shape[0], L)
    s_in = _affine_prefix_static(t_vec, s0, onp.ascontiguousarray(al_np),
                                 dtype)
    s_last = jnp.einsum("ij,j->i", al, s_in[-1], precision=_HIGHEST) \
        + t_vec[-1]
    return s_in, s_last


def _boundary_states_traced(t_vec, s0, al):
    """Boundary-state recurrence for traced coefficients.

    Same scan-free recursive superblock scheme as
    :func:`_boundary_states_static` (see :func:`_affine_prefix_traced`)
    with the operators built *in-graph* from the traced ``al``: AL powers
    by a length-M associative scan (M ≤ 128, vs nb ≈ 15k for a 3-min
    track), the block-Toeplitz by the stride-(2M−1) tile trick (no
    gather).  Returns ``(s_in (nb, S), s_last (S,))``.
    """
    s_in = _affine_prefix_traced(t_vec, s0, al)
    s_last = jnp.einsum("ij,j->i", al, s_in[-1], precision=_HIGHEST) \
        + t_vec[-1]
    return s_in, s_last


def _matpow_traced(a, p: int):
    """``A^p`` for a traced square matrix, ``p`` static: binary
    exponentiation — ~2·log2(p) tiny matmuls, fully unrolled at trace time
    (vs a p-step scan; used for partial-last-block state finalization)."""
    result = jnp.eye(a.shape[0], dtype=a.dtype)
    base = a
    while p:
        if p & 1:
            result = jnp.einsum("ij,jk->ik", base, result,
                                precision=_HIGHEST)
        p >>= 1
        if p:
            base = jnp.einsum("ij,jk->ik", base, base, precision=_HIGHEST)
    return result


def _final_state_traced(s_in_last, x_last, sos, g, L, rem):
    """Affine final-state update through ``rem`` valid samples (traced
    coefficients, operators built in-graph).

    Same contract as :func:`_final_state_static`: ``s_final = A^rem s_in +
    Σ_{j<rem} A^{rem-1-j} B x[j]``.  ``A^rem`` comes from binary
    exponentiation and the drive coefficients are a SLICE of the already-
    built block operator ``G`` (``G[j] = A^{L-1-j} B ⇒ G_rem = G[L-rem:]``)
    — no rem-step scan, no extra operator build.
    """
    a, _, _, _ = cascade_state_space(sos)
    a_rem = _matpow_traced(a, rem)
    g_rem = g[L - rem:]  # (rem, S)
    drive = jnp.einsum("...t,ti->i..." if x_last.ndim == 2 else "t,ti->i",
                       x_last, g_rem, precision=_HIGHEST)
    return jnp.einsum("ij,j...->i...", a_rem, s_in_last,
                      precision=_HIGHEST) + drive


def _sosfilt_blocked_1ch(sos, x, s0, block_size, return_state, static_sos=None):
    n = x.shape[0]
    L = block_size
    nb = -(-n // L)
    pad = nb * L - n
    xp = jnp.pad(x, (0, pad))
    xb = xp.reshape(nb, L)

    if static_sos is not None:
        ops = _blocked_operators_static(
            static_sos.astype("float64").tobytes(), static_sos.shape[0], L)
        t_mat, g, w, al = [jnp.asarray(o, x.dtype) for o in ops]
    else:
        t_mat, g, w, al = _blocked_operators(sos, L)

    # ONE dot against [T | G]: zero-state outputs and end-state summaries in
    # a single MXU pass, so the blocks are read from HBM once, not twice
    # (per-column contractions are unchanged — numerically identical).
    ytg = jnp.dot(xb, jnp.concatenate([t_mat, g], axis=1),
                  precision=_HIGHEST)  # (B, L+S)
    y0 = ytg[:, :L]
    t_vec = ytg[:, L:]

    # Boundary-state recurrence s_end[b] = AL @ s_in[b] + t[b].
    if static_sos is not None:
        s_in, s_last = _boundary_states_static(
            t_vec, s0, static_sos, L, nb, al, x.dtype)
    else:
        s_in, s_last = _boundary_states_traced(t_vec, s0, al)

    y = y0 + jnp.dot(s_in, w.T, precision=_HIGHEST)
    y = y.reshape(nb * L)[:n]

    if not return_state:
        return y, s0  # placeholder state (unused)

    if pad == 0:
        s_final = s_last
    else:
        # Evolve the last block's incoming state through its valid samples
        # only (padded zeros must not advance the state).  rem is static.
        rem = n - (nb - 1) * L
        if static_sos is not None:
            s_final = _final_state_static(s_in[-1], xb[-1, :rem],
                                          static_sos, rem, x.dtype)
        else:
            s_final = _final_state_traced(s_in[-1], xb[-1, :rem], sos, g,
                                          L, rem)
    return y, s_final


def _sosfilt_blocked_1ch_multi(static_sos_list, x, s0_list, block_size,
                               return_state):
    """F independent static cascades over the SAME 1-ch input, one block dot.

    The block view ``xb`` is contracted against the horizontal concat of
    every filter's ``[T | G]`` operator — the input signal is read from HBM
    once for all filters instead of once per filter, and the F+F dots
    collapse into one MXU kernel.  Per-filter boundary recurrences and
    state-correction outputs are unchanged (numerically identical to F
    separate :func:`_sosfilt_blocked_1ch` calls).
    """
    n = x.shape[0]
    L = block_size
    nb = -(-n // L)
    pad = nb * L - n
    xb = jnp.pad(x, (0, pad)).reshape(nb, L)

    ops = [_blocked_operators_static(
        s.astype("float64").tobytes(), s.shape[0], L)
        for s in static_sos_list]
    tg_all = jnp.concatenate(
        [jnp.asarray(np.concatenate([t, g], axis=1), x.dtype)
         for t, g, _, _ in ops], axis=1)  # (L, Σ_f (L+S_f))
    ytg = jnp.dot(xb, tg_all, precision=_HIGHEST)

    ys, s_finals = [], []
    col = 0
    for f, (sos_np, (t_mat, g, w, al)) in enumerate(zip(static_sos_list, ops)):
        s_dim = al.shape[1]
        y0 = ytg[:, col: col + L]
        t_vec = ytg[:, col + L: col + L + s_dim]
        col += L + s_dim
        al_j = jnp.asarray(al, x.dtype)
        w_j = jnp.asarray(w, x.dtype)
        s_in, s_last = _boundary_states_static(
            t_vec, s0_list[f], sos_np, L, nb, al_j, x.dtype)
        y = y0 + jnp.dot(s_in, w_j.T, precision=_HIGHEST)
        ys.append(y.reshape(nb * L)[:n])
        if not return_state:
            s_finals.append(s0_list[f])
        elif pad == 0:
            s_finals.append(s_last)
        else:
            rem = n - (nb - 1) * L
            a, b, _, _ = cascade_state_space(
                jnp.asarray(sos_np, x.dtype))

            def step(s, x_t, a=a, b=b):
                return jnp.einsum("ij,j->i", a, s,
                                  precision=_HIGHEST) + b * x_t, None

            s_f, _ = jax.lax.scan(step, s_in[-1], xb[-1, :rem])
            s_finals.append(s_f)
    return tuple(ys), tuple(s_finals)


def sosfilt_blocked_multi(sos_list, x, zi_list=None, block_size=512,
                          return_state=True):
    """Run F static SOS cascades over the same ``(N, C)`` input in one
    shared-block MXU pass (see :func:`_sosfilt_blocked_1ch_multi`).

    Coefficients must be concrete (host) arrays — the crossover/K-weighting
    case.  Returns ``(ys, zfs)``: tuples of per-filter ``(N, C)`` outputs
    and scipy-layout final states.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, c = x.shape
    statics = [np.asarray(s, np.float64) for s in sos_list]
    dt = x.dtype
    s0s = []
    for f, s in enumerate(statics):
        k = s.shape[0]
        if zi_list is None or zi_list[f] is None:
            s0s.append(jnp.zeros((2 * k, c), dtype=dt))
        else:
            zi = jnp.asarray(zi_list[f], dtype=dt)
            if zi.ndim == 2:
                zi = zi[:, :, None]
            s0s.append(zi_to_state(zi))

    run = functools.partial(
        _sosfilt_blocked_1ch_multi, statics,
        block_size=min(block_size, max(8, n)), return_state=return_state)
    ys, s_ts = jax.vmap(lambda ch, s0c: run(ch, s0c),
                        in_axes=(1, 1), out_axes=1)(x, s0s)
    outs, zfs = [], []
    for f, s in enumerate(statics):
        y = ys[f]
        zf = state_to_zi(s_ts[f], s.shape[0])
        if squeeze:
            y = y[:, 0]
            zf = zf[:, :, 0]
        outs.append(y)
        zfs.append(zf)
    return tuple(outs), tuple(zfs)


# ---------------------------------------------------------------------------
# Channel-major (folded-rows) execution — the layout the MXU wants
# ---------------------------------------------------------------------------
#
# The (N, C) vmap-over-channels formulation above lowers to *batched* 3-D
# dots whose batch dimension XLA places in a layout the MXU cannot feed
# directly: the compiled HLO carries ~128 MB physical-transpose copies of
# every (C, nb, L+S) dot result, and the combined [T | G] operand forces the
# full (nb, L+S) product to be materialized and re-sliced.  Measured on the
# bench chip, one crossover pass costs ~12 full-signal HBM passes this way.
#
# The channel-major form eliminates both: with ``xT`` laid out ``(C, N)``,
# the block view ``(C·nb, L)`` is a FREE reshape, every dot is a plain 2-D
# matmul in canonical layout, and the two dots are split so nothing wider
# than the signal is ever materialized:
#
#   t_vec = rows @ G                     (read x once;  write (C·nb, S) — tiny)
#   s_in  = boundary recurrence(t_vec)   (control-rate, tiny)
#   y     = rows @ T + s_in @ W.T        (read x once;  write y once — the
#                                         add fuses into the dot epilogue)
#
# → 3 full-signal HBM passes per filter pass, independent of C and F (multi-
# filter runs share the reads).  Numerically identical to the vmap form:
# the per-row contractions are the same sums in the same order.


def _blocked_rows_states(ops, statics, xrows, s0s, L, return_state,
                         sos_list=None, n_valid=None):
    """Per-block incoming states for F filters over a ROWS-form signal.

    The state-summary half of a blocked filter pass: ONE shared ``rows @
    G_cat`` read of the signal plus the (control-rate) boundary-state
    recurrence per filter — no zero-state output dots.  This is the
    building block both of :func:`_blocked_rows_run` (which adds the output
    dots) and of the fused Pallas multiband pipeline
    (``ops.pallas_multiband``), where the band outputs are *recomputed
    block-locally in VMEM* from these states instead of ever being
    materialized in HBM.

    Returns ``(s_ins, s_finals)``: per-filter block incoming states
    ``(C, nb, S_f)`` and final cascade states ``(S_f, C)`` (placeholders
    when ``return_state`` is False).
    """
    c, nb, _ = xrows.shape
    rows = xrows.reshape(c * nb, L)
    pad = 0 if n_valid is None else nb * L - n_valid

    # one shared read of the signal for every filter's state summaries
    g_cat = jnp.concatenate([g for (_, g, _, _) in ops], axis=1)
    tv_cat = jnp.dot(rows, g_cat, precision=_HIGHEST)  # (C·nb, ΣS_f)

    s_ins, s_finals = [], []
    col = 0
    for f, (t_mat, g, w, al) in enumerate(ops):
        s_dim = al.shape[0]
        tv = tv_cat[:, col: col + s_dim].reshape(c, nb, s_dim)
        col += s_dim
        if statics[f] is not None:
            s_in, s_last = jax.vmap(
                lambda tvc, s0c, _st=statics[f], _al=al: _boundary_states_static(
                    tvc, s0c, _st, L, nb, _al, rows.dtype),
                in_axes=(0, 1), out_axes=(0, 1))(tv, s0s[f])
        else:
            s_in, s_last = jax.vmap(
                lambda tvc, s0c, _al=al: _boundary_states_traced(
                    tvc, s0c, _al),
                in_axes=(0, 1), out_axes=(0, 1))(tv, s0s[f])
        # s_in: (C, nb, S); s_last: (S, C)
        s_ins.append(s_in)

        if not return_state:
            s_finals.append(s0s[f])
        elif pad == 0:
            s_finals.append(s_last)
        else:
            # evolve the last block's incoming state through its valid
            # samples only (padded zeros must not advance the state):
            # one affine update, not a rem-step scan
            rem = n_valid - (nb - 1) * L
            x_last = xrows[:, -1, :rem]                   # (C, rem)
            s_in_last = s_in[:, -1].T                     # (S, C)
            if statics[f] is not None:
                s_f = _final_state_static(s_in_last, x_last, statics[f],
                                          rem, rows.dtype)
            else:
                s_f = _final_state_traced(s_in_last, x_last, sos_list[f],
                                          g, L, rem)
            s_finals.append(s_f)
    return s_ins, s_finals


def _blocked_rows_run(ops, statics, xrows, s0s, L, return_state,
                      sos_list=None, n_valid=None):
    """Core blocked runner over a ROWS-form signal: F filters, no relayouts.

    The rows form ``(C, nb, L)`` is the chain's TPU-resident layout: the
    ``(C·nb, L)`` flatten feeding each MXU dot is a pure dimension merge
    (same physical tiling), so a filter pass reads the signal and writes its
    output with ZERO layout-change copies.  (The ``(C, N)`` channel-major
    form, by contrast, pays a full-signal relayout into and out of every
    blocked pass — measured 60.6 MB per copy on a 3-min stereo track, ~40 %
    of the whole chain's HBM writes before this refactor.)

    Args:
      ops: per-filter ``(t_mat, g, w, al)`` operator tuples (jnp, dtype).
      statics: per-filter float64 numpy sos, or None for traced coefficients.
      xrows: ``(C, nb, L)`` rows-form signal (zero-padded past ``n_valid``).
      s0s: per-filter ``(S_f, C)`` cascade states.
      sos_list: per-filter ``(K, 6)`` coefficient arrays (traced OK) — used
        only to evolve the final state through a partial last block.
      n_valid: real sample count (static).  ``None`` means all ``nb·L``
        samples are valid.

    Returns ``(yrows, s_finals)``: per-filter ``(C, nb, L)`` outputs and
    final cascade states ``(S_f, C)``.
    """
    c, nb, _ = xrows.shape
    rows = xrows.reshape(c * nb, L)
    s_ins, s_finals = _blocked_rows_states(
        ops, statics, xrows, s0s, L, return_state, sos_list=sos_list,
        n_valid=n_valid)
    yrows = []
    for f, (t_mat, g, w, al) in enumerate(ops):
        s_dim = al.shape[0]
        y = jnp.dot(rows, t_mat, precision=_HIGHEST) + \
            jnp.dot(s_ins[f].reshape(c * nb, s_dim), w.T,
                    precision=_HIGHEST)
        yrows.append(y.reshape(c, nb, L))
    return yrows, s_finals


def sosfilt_states_rows(sos, xrows, zi=None, n_valid=None,
                        return_state=True):
    """Single-cascade per-block incoming states over ROWS form (traced
    coefficients supported — the EQ case).

    Returns ``(s_in (C, nb, S), zf scipy-layout, ops)`` where ``ops`` is
    the ``(t_mat, g, w, al)`` operator tuple (jnp arrays) so a downstream
    kernel can reuse the same operators without rebuilding them.
    """
    c, nb, L = xrows.shape
    static_sos = None
    if isinstance(sos, np.ndarray):
        static_sos = np.asarray(sos, np.float64)
    elif isinstance(sos, jax.Array) and not isinstance(sos, jax.core.Tracer):
        static_sos = np.asarray(sos, np.float64)
    if static_sos is not None:
        o = _blocked_operators_static(static_sos.tobytes(),
                                      static_sos.shape[0], L)
        ops = tuple(jnp.asarray(m, xrows.dtype) for m in o)
        k = static_sos.shape[0]
    else:
        sos = _as_sos(sos, xrows.dtype)
        ops = _blocked_operators(sos, L)
        k = sos.shape[0]
    s0s = _cm_states([k], None if zi is None else [zi], c, xrows.dtype)
    s_ins, s_ts = _blocked_rows_states([ops], [static_sos], xrows, s0s, L,
                                       return_state, sos_list=[sos],
                                       n_valid=n_valid)
    return s_ins[0], state_to_zi(s_ts[0], k), ops


def sosfilt_states_multi_rows(sos_list, xrows, zi_list=None, n_valid=None,
                              return_state=True):
    """Per-block incoming states (no outputs) for F static cascades over a
    ROWS-form ``(C, nb, L)`` signal.

    Feeds the fused Pallas multiband pipeline (``ops.pallas_multiband``):
    the kernels recompute band samples block-locally in VMEM from these
    tiny ``(C, nb, S)`` states, so the full-length band signals never touch
    HBM.  Coefficients must be concrete host arrays.

    Returns ``(s_ins, zfs)``: per-filter ``(C, nb, S_f)`` block incoming
    cascade states and scipy-layout ``(K, 2, C)`` final states.
    """
    c, nb, L = xrows.shape
    statics = [np.asarray(s, np.float64) for s in sos_list]
    ops = []
    for s in statics:
        o = _blocked_operators_static(s.tobytes(), s.shape[0], L)
        ops.append(tuple(jnp.asarray(m, xrows.dtype) for m in o))
    s0s = _cm_states([s.shape[0] for s in statics], zi_list, c, xrows.dtype)
    s_ins, s_ts = _blocked_rows_states(ops, statics, xrows, s0s, L,
                                       return_state, n_valid=n_valid)
    zfs = [state_to_zi(s_t, statics[f].shape[0])
           for f, s_t in enumerate(s_ts)]
    return tuple(s_ins), tuple(zfs)


def _blocked_cm_run(ops, statics, xT, s0s, L, return_state, sos_list=None):
    """Channel-major wrapper over :func:`_blocked_rows_run`.

    Pads ``(C, N)`` to a block multiple, runs the rows core, and flattens
    each output back to ``(C, N)``.  Kept for callers that hold the signal
    channel-major between ops (streaming chunks); the one-shot chain body
    stays in rows form end-to-end instead (models/chain._master_cm).
    """
    c, n = xT.shape
    nb = -(-n // L)
    pad = nb * L - n
    xrows = jnp.pad(xT, ((0, 0), (0, pad))).reshape(c, nb, L)
    yrows, s_finals = _blocked_rows_run(ops, statics, xrows, s0s, L,
                                        return_state, sos_list=sos_list,
                                        n_valid=n)
    ysT = [y.reshape(c, nb * L)[:, :n] for y in yrows]
    return ysT, s_finals


def sosfilt_blocked_rows(sos, xrows, zi=None, n_valid=None,
                         return_state=True):
    """Single-cascade blocked filter over a ROWS-form ``(C, nb, L)`` signal.

    The rows form is the chain's TPU-resident layout (see
    :func:`_blocked_rows_run`): input and output stay ``(C, nb, L)``, so a
    chain of filter/elementwise ops pays zero layout-change copies between
    stages.  ``n_valid`` (static) marks the real sample count when the
    signal is zero-padded past it — used only to stop the returned state
    from advancing through padding.  Traced coefficients are supported (the
    EQ path).  Returns ``(yrows, zf)`` with ``zf`` in scipy layout.
    """
    c, nb, L = xrows.shape
    static_sos = None
    if isinstance(sos, np.ndarray):
        static_sos = np.asarray(sos, np.float64)
    elif isinstance(sos, jax.Array) and not isinstance(sos, jax.core.Tracer):
        static_sos = np.asarray(sos, np.float64)
    if static_sos is not None:
        o = _blocked_operators_static(static_sos.tobytes(),
                                      static_sos.shape[0], L)
        ops = [tuple(jnp.asarray(m, xrows.dtype) for m in o)]
        k = static_sos.shape[0]
    else:
        sos = _as_sos(sos, xrows.dtype)
        ops = [_blocked_operators(sos, L)]
        k = sos.shape[0]
    s0s = _cm_states([k], None if zi is None else [zi], c, xrows.dtype)
    yrows, s_ts = _blocked_rows_run(ops, [static_sos], xrows, s0s, L,
                                    return_state, sos_list=[sos],
                                    n_valid=n_valid)
    return yrows[0], state_to_zi(s_ts[0], k)


def sosfilt_blocked_multi_rows(sos_list, xrows, zi_list=None, n_valid=None,
                               return_state=True):
    """F static SOS cascades over one ROWS-form ``(C, nb, L)`` signal.

    Rows-form counterpart of :func:`sosfilt_blocked_multi_cm` — the
    crossover/K-weighting fast path inside the rows-resident chain body.
    Coefficients must be concrete host arrays.  Returns tuples of
    per-filter ``(C, nb, L)`` outputs and scipy-layout states.
    """
    c, nb, L = xrows.shape
    statics = [np.asarray(s, np.float64) for s in sos_list]
    ops = []
    for s in statics:
        o = _blocked_operators_static(s.tobytes(), s.shape[0], L)
        ops.append(tuple(jnp.asarray(m, xrows.dtype) for m in o))
    s0s = _cm_states([s.shape[0] for s in statics], zi_list, c, xrows.dtype)
    yrows, s_ts = _blocked_rows_run(ops, statics, xrows, s0s, L,
                                    return_state, n_valid=n_valid)
    zfs = [state_to_zi(s_t, statics[f].shape[0])
           for f, s_t in enumerate(s_ts)]
    return tuple(yrows), tuple(zfs)


def _cm_states(sos_shapes, zi_list, c, dtype):
    s0s = []
    for f, k in enumerate(sos_shapes):
        if zi_list is None or zi_list[f] is None:
            s0s.append(jnp.zeros((2 * k, c), dtype=dtype))
        else:
            zi = jnp.asarray(zi_list[f], dtype=dtype)
            if zi.ndim == 2:
                zi = zi[:, :, None]
            s0s.append(zi_to_state(zi))
    return s0s


def sosfilt_blocked_multi_cm(sos_list, xT, zi_list=None, block_size=512,
                             return_state=True):
    """F static SOS cascades over one ``(C, N)`` channel-major signal.

    The channel-major counterpart of :func:`sosfilt_blocked_multi` — same
    contract (scipy-layout ``(K, 2, C)`` states), but inputs/outputs are
    ``(C, N)`` and the execution is the 3-pass folded-rows form (see the
    section comment above).  Coefficients must be concrete host arrays.
    """
    c, n = xT.shape
    statics = [np.asarray(s, np.float64) for s in sos_list]
    L = min(block_size, max(8, n))
    ops = []
    for s in statics:
        o = _blocked_operators_static(s.tobytes(), s.shape[0], L)
        ops.append(tuple(jnp.asarray(m, xT.dtype) for m in o))
    s0s = _cm_states([s.shape[0] for s in statics], zi_list, c, xT.dtype)
    ysT, s_ts = _blocked_cm_run(ops, statics, xT, s0s, L, return_state)
    zfs = [state_to_zi(s_t, statics[f].shape[0])
           for f, s_t in enumerate(s_ts)]
    return tuple(ysT), tuple(zfs)


def sosfilt_blocked_cm(sos, xT, zi=None, block_size=512, return_state=True):
    """Single-cascade channel-major blocked filter (``(C, N)`` in and out).

    Supports traced coefficients (the EQ path): the operators are then built
    in-graph with the float32 associative matrix-power scan, exactly like
    :func:`sosfilt_blocked`.
    """
    c, n = xT.shape
    static_sos = None
    if isinstance(sos, np.ndarray):
        static_sos = np.asarray(sos, np.float64)
    elif isinstance(sos, jax.Array) and not isinstance(sos, jax.core.Tracer):
        static_sos = np.asarray(sos, np.float64)
    L = min(block_size, max(8, n))
    if static_sos is not None:
        o = _blocked_operators_static(static_sos.tobytes(),
                                      static_sos.shape[0], L)
        ops = [tuple(jnp.asarray(m, xT.dtype) for m in o)]
        k = static_sos.shape[0]
    else:
        sos = _as_sos(sos, xT.dtype)
        ops = [_blocked_operators(sos, L)]
        k = sos.shape[0]
    s0s = _cm_states([k], None if zi is None else [zi], c, xT.dtype)
    ysT, s_ts = _blocked_cm_run(ops, [static_sos], xT, s0s, L, return_state,
                                sos_list=[sos])
    return ysT[0], state_to_zi(s_ts[0], k)


def sosfilt_blocked(sos, x, zi=None, block_size=512, return_state=True):
    """Blocked MXU execution of an SOS cascade (see module docstring).

    Same contract as :func:`sosfilt_scan`; outputs agree with the scan to
    floating-point accuracy (tested).  ``block_size`` trades MXU matmul size
    against total FLOPs (cost ~ 2·N·L per channel).
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, c = x.shape
    # static (non-traced) coefficients → float64 host operator precompute
    static_sos = None
    if isinstance(sos, np.ndarray):
        static_sos = np.asarray(sos, np.float64)
    elif isinstance(sos, jax.Array) and not isinstance(sos, jax.core.Tracer):
        static_sos = np.asarray(sos, np.float64)
    sos = _as_sos(sos, x.dtype)
    k = sos.shape[0]
    if zi is None:
        s0 = jnp.zeros((2 * k, c), dtype=x.dtype)
    else:
        zi = jnp.asarray(zi, dtype=x.dtype)
        if zi.ndim == 2:
            zi = zi[:, :, None]
        s0 = zi_to_state(zi)

    run = functools.partial(_sosfilt_blocked_1ch, sos,
                            block_size=min(block_size, max(8, n)),
                            return_state=return_state,
                            static_sos=static_sos)
    y_t, s_t = jax.vmap(run, in_axes=(1, 1), out_axes=(1, 1))(x, s0)
    zf = state_to_zi(s_t, k)
    if squeeze:
        y_t = y_t[:, 0]
        zf = zf[:, :, 0]
    return y_t, zf


@functools.lru_cache(maxsize=128)
def _sharded_operators_static(sos_bytes, k, L, nb, n):
    """Host-side float64 operators for the static sharded correction pass.

    Returns ``(A^n, A^{bL} for b < nb, W)``: the shard transition matrix,
    the per-block powers of the block transition matrix, and the
    state-correction rows ``W[t] = C A^t``.
    """
    import numpy as onp

    a, _, _, _ = _state_space_static(sos_bytes, k)
    _, _, w, al = _blocked_operators_static(sos_bytes, k, L)
    a_shard = onp.linalg.matrix_power(a, n)
    s_dim = a.shape[0]
    al_pows = onp.empty((nb, s_dim, s_dim))
    al_pows[0] = onp.eye(s_dim)
    for bi in range(1, nb):
        al_pows[bi] = al @ al_pows[bi - 1]
    return a_shard, al_pows, w


def _sosfilt_sharded_static(static_sos, x_shard, axis_name, zi, block_size):
    """Static-coefficient body of :func:`sosfilt_sharded` (``(n, C)`` in)."""
    n, c = x_shard.shape
    k = static_sos.shape[0]
    s_dim = 2 * k
    dt = x_shard.dtype
    L = min(block_size, max(8, n))
    nb = -(-n // L)
    a_shard_np, al_pows_np, w_np = _sharded_operators_static(
        static_sos.tobytes(), k, L, nb, n)
    a_shard = jnp.asarray(a_shard_np, dt)
    al_pows = jnp.asarray(al_pows_np, dt)
    w = jnp.asarray(w_np, dt)

    # local zero-state pass (per channel): static blocked operators; the
    # final state is evolved through the valid samples only
    run = functools.partial(_sosfilt_blocked_1ch, None, block_size=L,
                            return_state=True, static_sos=static_sos)
    s0_zero = jnp.zeros((s_dim, c), dtype=dt)
    y0, t_local = jax.vmap(run, in_axes=(1, 1), out_axes=(1, 1))(
        x_shard, s0_zero)

    d = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    t_all = jax.lax.all_gather(t_local, axis_name)  # (D, S, C)

    if zi is not None:
        zi = jnp.asarray(zi, dtype=dt)
        if zi.ndim == 2:
            zi = zi[:, :, None]
        s_acc = jnp.broadcast_to(zi_to_state(zi), (s_dim, c))
    else:
        s_acc = jnp.zeros((s_dim, c), dtype=dt)
    s_in = s_acc
    for j in range(d):
        s_in = jnp.where(idx == j, s_acc, s_in)
        s_acc = jnp.einsum("ij,jc->ic", a_shard, s_acc,
                           precision=_HIGHEST) + t_all[j]

    s_in_blocks = jnp.einsum("bij,jc->bic", al_pows, s_in,
                             precision=_HIGHEST)  # (nb, S, C)
    y_corr = jnp.einsum("ts,bsc->btc", w, s_in_blocks, precision=_HIGHEST)
    y_corr = y_corr.reshape(nb * L, c)[:n]
    return y0 + y_corr, state_to_zi(s_acc, k)


def sosfilt_sharded(sos, x_shard, axis_name, zi=None, block_size=512):
    """Blocked SOS filtering of a frames-sharded signal inside ``shard_map``.

    The same zero-state + boundary-state decomposition as
    :func:`sosfilt_blocked`, lifted one level: each device filters its shard
    from a zero state, shard *transition summaries* — the end state ``t_d``
    of the zero-state pass and the (statically known) shard transition
    matrix ``A^n`` — are ``all_gather``-ed (a few hundred bytes over ICI),
    every device computes its true incoming state with a tiny unrolled
    prefix, and corrects its local output with one small matmul chain.
    Exact: equals the unsharded filter to float roundoff (tested on an
    8-device mesh).

    Args:
      x_shard: this device's ``(n_local,)`` or ``(n_local, C)`` slice.
      axis_name: the mesh axis the frames are sharded over.
      zi: optional global initial state (scipy layout), applied on device 0.

    Returns ``(y_shard, zf_global)`` where ``zf_global`` is the filter state
    after the LAST device's shard (replicated).

    Concrete (non-traced) coefficients — the crossovers and the K-filter —
    take a fully static path: every operator (``A^n``, the per-block
    ``A^{bL}`` powers, ``W``) is built host-side in float64 numpy and enters
    the graph as a plain constant.  Building them *in-graph* from constants
    makes XLA constant-fold L-step matrix scans at compile time, which took
    minutes per filter on the real TPU backend (measured: 183 s compile for
    the K-weighting cascade on a 60 s shard).
    """
    squeeze = x_shard.ndim == 1
    if squeeze:
        x_shard = x_shard[:, None]
    n, c = x_shard.shape

    static_sos = None
    if isinstance(sos, np.ndarray):
        static_sos = np.asarray(sos, np.float64)
    elif isinstance(sos, jax.Array) and not isinstance(sos, jax.core.Tracer):
        static_sos = np.asarray(sos, np.float64)
    if static_sos is not None:
        y, zf = _sosfilt_sharded_static(static_sos, x_shard, axis_name, zi,
                                        block_size)
        if squeeze:
            y = y[:, 0]
            zf = zf[:, :, 0]
        return y, zf

    sos = _as_sos(sos, x_shard.dtype)
    k = sos.shape[0]
    s_dim = 2 * k

    a, b_vec, c_vec, _ = cascade_state_space(sos)

    # A^n_local via log-depth squaring (decays to ~0 for long shards — fine).
    a_shard = _matpow_traced(a, n)

    # local zero-state pass (per channel)
    run = functools.partial(_sosfilt_blocked_1ch, sos,
                            block_size=min(block_size, max(8, n)),
                            return_state=True)
    s0_zero = jnp.zeros((s_dim, c), dtype=x_shard.dtype)
    y0, t_local = jax.vmap(run, in_axes=(1, 1), out_axes=(1, 1))(x_shard, s0_zero)

    d = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    t_all = jax.lax.all_gather(t_local, axis_name)  # (D, S, C)

    # incoming state for this device: fold earlier shards through A^n
    # (D is small and static — an unrolled prefix; each device selects the
    # prefix value just before its own shard).
    if zi is not None:
        zi = jnp.asarray(zi, dtype=x_shard.dtype)
        if zi.ndim == 2:
            zi = zi[:, :, None]
        s_acc = jnp.broadcast_to(zi_to_state(zi), (s_dim, c))
    else:
        s_acc = jnp.zeros((s_dim, c), dtype=x_shard.dtype)
    s_in = s_acc
    for j in range(d):
        s_in = jnp.where(idx == j, s_acc, s_in)
        s_acc = jnp.einsum("ij,jc->ic", a_shard, s_acc,
                           precision=_HIGHEST) + t_all[j]

    # correct local output: y += C A^{i} s_in for every local position i —
    # evaluated blockwise: rows W = C A^{i<L}, shifted by A^{bL} per block.
    L = min(block_size, max(8, n))
    nb = -(-n // L)
    eye = jnp.eye(s_dim, dtype=a.dtype)
    reps = jnp.broadcast_to(a, (L - 1, s_dim, s_dim))
    powers = jnp.concatenate([
        eye[None],
        jax.lax.associative_scan(
            lambda u, v: jnp.einsum("...ij,...jk->...ik", v, u,
                                    precision=_HIGHEST), reps)], axis=0)
    w = jnp.einsum("i,tij->tj", c_vec, powers, precision=_HIGHEST)  # (L, S)
    al = jnp.einsum("ij,jk->ik", a, powers[L - 1], precision=_HIGHEST)
    al_reps = jnp.broadcast_to(al, (nb - 1, s_dim, s_dim)) if nb > 1 else \
        jnp.zeros((0, s_dim, s_dim), a.dtype)
    al_pows = jnp.concatenate([
        eye[None],
        jax.lax.associative_scan(
            lambda u, v: jnp.einsum("...ij,...jk->...ik", v, u,
                                    precision=_HIGHEST), al_reps)]
        if nb > 1 else [eye[None]], axis=0)  # (nb, S, S): A^{bL}
    s_in_blocks = jnp.einsum("bij,jc->bic", al_pows, s_in,
                             precision=_HIGHEST)  # (nb, S, C)
    y_corr = jnp.einsum("ts,bsc->btc", w, s_in_blocks, precision=_HIGHEST)
    y_corr = y_corr.reshape(nb * L, c)[:n]
    y = y0 + y_corr

    # global final state (replicated): fold ALL shards.
    zf = state_to_zi(s_acc, k)
    if squeeze:
        y = y[:, 0]
        zf = zf[:, :, 0]
    return y, zf


def sosfilt(sos, x, zi=None, method="auto", block_size=512, return_state=True):
    """Dispatch between scan and blocked execution.

    ``auto`` uses the scan for short signals (where blocked setup cost
    dominates) and the blocked MXU path otherwise.
    """
    if method == "auto":
        method = "scan" if x.shape[0] < 4 * block_size else "blocked"
    if method == "scan":
        return sosfilt_scan(sos, x, zi)
    if method == "blocked":
        return sosfilt_blocked(sos, x, zi, block_size=block_size,
                               return_state=return_state)
    raise ValueError(f"unknown method {method!r}")
