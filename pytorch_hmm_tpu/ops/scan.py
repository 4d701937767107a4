"""Pallas TPU kernels for the HMM time scans.

Why: the XLA ``lax.scan`` path costs ~0.7 µs per time step on TPU (loop
dispatch overhead; measured on-chip v5e). The DP step itself is tiny (a
``(B, K)`` logsumexp-matvec), so the loop overhead dominates. These
kernels run the whole T loop **inside one Pallas program**: observation
frames stream HBM→VMEM in double-buffered chunks, the ``(B_tile, K)``
state vector lives in VMEM, and the frame loop is **fully unrolled** per
chunk (Mosaic supports full-unroll ``fori_loop`` only), which removes the
per-iteration loop latency — measured 2.4× on the max-product trellis.

Forward/backward use the MXU via the scaling identity::

    logsumexp_i(alpha_i + log_a[i, j])
      = c + log( (exp(alpha - c) @ exp(log_a))[j] ),   c = max_i alpha_i

``exp(log_a)`` is the probability-space transition matrix, precomputed
once per kernel launch; the per-frame work is one exp, one
``(B_tile, K) @ (K, K)`` matmul (MXU), one log — the same float32
precision envelope as a max-shifted logsumexp.

The Viterbi trellis has no MXU form (max-plus is not a matmul); its
frame body is a hand-balanced maximum tree over predecessor sublanes with
the transition add fused into the first level (measured 1.5× over
Mosaic's default axis-reduce lowering at K=12).

Layout: K is padded to a multiple of the 128-lane width (K > 128 tiles
across lane registers — no state-count cap), batch is tiled to fit the
double buffers in VMEM. Grid is over batch tiles only — time must stay
sequential inside the kernel; batch tiles are embarrassingly parallel.

Ragged batches: every kernel takes an optional per-sequence ``lengths``
vector and freezes each row's carry at its true end, matching
``core.fb``/``core.viterbi`` padding semantics bit-for-bit (alpha frozen
past the end, beta zero from ``length-1`` on, Viterbi states repeating
the final valid state).

All kernels run in ``interpret`` mode off-TPU, so the same tests cover
CPU and TPU (with the frame loop left rolled to keep tracing cheap).

Replaces (performance-wise) the hot loops of reference ``hmm.py:95-117``
and ``hmm.py:162-178``; numerics match ``core.fb``/``core.viterbi``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pallas_forward", "pallas_forward_prob", "pallas_backward",
    "pallas_backward_prob", "pallas_fb_prob", "pallas_viterbi",
]

LANES = 128
SUBLANES = 8
_NEG = -1e30
# Double-buffer VMEM budget (obs + stage, 2 slots each) used to pick the
# batch tile. ~10 MB leaves headroom under the ~16 MB/core VMEM.
_VMEM_BUDGET = 10 * 1024 * 1024


def _pad_to(x, size, axis, value):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _ceil_to(n, m):
    return -(-n // m) * m


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_b_tile(B: int, Kp: int, t_chunk: int) -> int:
    """Largest batch tile whose double buffers fit the VMEM budget."""
    for bt in (32, 16, 8):
        if 2 * 2 * bt * t_chunk * Kp * 4 <= _VMEM_BUDGET:
            return bt
    return 8


def _unroll(t_chunk: int) -> int:
    # Mosaic fori_loop supports only unroll=1 or full unroll; full unroll
    # removes the per-frame loop latency on hardware. In interpret mode
    # (CPU tests) keep the loop rolled so tracing stays cheap.
    return t_chunk if not _use_interpret() else 1


def _lengths_vec(lengths, B, T, Bp, b_tile):
    """(Bp, 1) int32 per-row true length (T when lengths is None)."""
    if lengths is None:
        tt = jnp.full((B,), T, jnp.int32)
    else:
        tt = lengths.astype(jnp.int32)
    # Padded batch rows get length T (their outputs are sliced away).
    tt = _pad_to(tt[:, None], Bp, 0, T)
    return tt


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _forward_kernel(
    lo_hbm,      # (B, T, K) HBM — full array; batch offset from program_id
    pa_ref,      # (K, K) VMEM — exp(log_a), rows padded with 0
    lpi_ref,     # (1, K) VMEM
    tt_ref,      # (Bt, 1) VMEM int32 — per-row true length
    alpha_out,   # (B, T, K) HBM
    *,
    t_chunk: int,
    T: int,
    b_tile: int,
    ragged: bool,
):
    Bt = b_tile
    K = pa_ref.shape[1]
    n_chunks = T // t_chunk
    b0 = pl.program_id(0) * Bt

    def body(obs_buf, stage_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :],
                obs_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                stage_buf.at[slot],
                alpha_out.at[
                    pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :
                ],
                out_sems.at[slot],
            )

        in_dma(0, 0).start()
        # Without lengths the per-frame freeze is skipped entirely —
        # T-padded frames compute garbage the caller slices away, exactly
        # like the r1 kernel (measured: the vector compare costs real
        # time in the unrolled frame loop).
        t_true = tt_ref[:, :] if ragged else None  # (Bt, 1)

        def chunk_body(c, alpha):
            slot = c % 2
            # Prefetch the next chunk while this one computes.
            @pl.when(c + 1 < n_chunks)
            def _():
                in_dma((c + 1) % 2, c + 1).start()

            in_dma(slot, c).wait()
            # The staging buffer for this slot must have drained from the
            # previous round before we overwrite it.
            @pl.when(c >= 2)
            def _():
                out_dma(slot, c - 2).wait()

            def frame(tf, alpha):
                lo_t = obs_buf[slot, :, tf, :]  # (Bt, K)
                t = c * t_chunk + tf

                cmax = jnp.max(alpha, axis=-1, keepdims=True)
                p = jnp.exp(alpha - cmax)
                # HIGHEST precision: full-f32 MXU passes; default would
                # truncate inputs to bf16 and cost ~2e-2 absolute error.
                s = jnp.dot(
                    p, pa_ref[:, :],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                from_prev = lo_t + cmax + jnp.log(s)
                first = lpi_ref[0, :][None, :] + lo_t
                new_alpha = jnp.where(t == 0, first, from_prev)
                if ragged:
                    # Freeze rows past their true end (matches core.fb's
                    # masked step exactly: alpha_t = alpha_{len-1}).
                    new_alpha = jnp.where(t >= t_true, alpha, new_alpha)
                alpha = new_alpha
                stage_buf[slot, :, tf, :] = alpha
                return alpha

            alpha = jax.lax.fori_loop(
                0, t_chunk, frame, alpha, unroll=_unroll(t_chunk)
            )
            out_dma(slot, c).start()
            return alpha

        alpha0 = jnp.full((Bt, K), _NEG, jnp.float32)
        alpha = jax.lax.fori_loop(0, n_chunks, chunk_body, alpha0)

        # Drain outstanding stores.
        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    pl.run_scoped(
        body,
        obs_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        stage_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("t_chunk", "b_tile"))
def pallas_forward(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    lengths: Optional[jax.Array] = None,
    t_chunk: int = 128,
    b_tile: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Forward algorithm on the Pallas scan kernel.

    Args/returns match ``core.forward_log``: ``(log_alpha (B, T, K),
    log_z (B,))``. Any K (the state axis tiles across lane registers);
    optional ``lengths (B,)`` freezes each row at its true end.
    """
    B, T, K = log_obs.shape
    Kp = _ceil_to(K, LANES)
    if b_tile is None:
        bt = _pick_b_tile(B, Kp, t_chunk)
        # One grid program when the batch fills the tile (grid programs
        # run serially on the core); otherwise the minimal 8-row tile.
        b_tile = bt if B % bt == 0 else SUBLANES

    Tp = _ceil_to(T, t_chunk)
    Bp = _ceil_to(B, b_tile)

    lo = _pad_to(log_obs.astype(jnp.float32), Kp, 2, _NEG)
    # T-padding with zero-obs frames is exact for every returned value:
    # the freeze-carry keeps padded frames at the final valid alpha, and
    # log_z reads the (frozen) final frame.
    lo = _pad_to(lo, Tp, 1, 0.0)
    lo = _pad_to(lo, Bp, 0, 0.0)

    la = _pad_to(log_a.astype(jnp.float32), Kp, 0, _NEG)
    la = _pad_to(la, Kp, 1, _NEG)
    pa = jnp.exp(la)  # padded rows/cols become 0 — absorbing nothing
    lpi = _pad_to(log_pi.astype(jnp.float32), Kp, 0, _NEG)[None, :]
    tt = _lengths_vec(lengths, B, T, Bp, b_tile)

    nb = Bp // b_tile
    grid = (nb,)
    alpha_p = pl.pallas_call(
        functools.partial(
            _forward_kernel, t_chunk=t_chunk, T=Tp, b_tile=b_tile,
            ragged=lengths is not None,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp, Kp), jnp.float32),
        interpret=_use_interpret(),
    )(lo, pa, lpi, tt)

    log_alpha = alpha_p[:B, :T, :K]
    if lengths is None:
        last = log_alpha[:, -1, :]
    else:
        # The freeze keeps rows constant past their end, so the final
        # frame already holds each row's true final alpha.
        last = log_alpha[:, -1, :]
    lz = jax.scipy.special.logsumexp(last, axis=-1)
    return log_alpha, lz


# ---------------------------------------------------------------------------
# Long-sequence forward: minimal-latency prob-space chain
# ---------------------------------------------------------------------------
#
# The log-space kernel above spends ~310 ns/frame at B=32 K=64; scaling
# diagnostics (experiments/fwd_floor.py) show the cost is set by the
# dependent per-frame chain, with a hard floor of ~190-200 ns/frame for
# even a bare ``dot + multiply`` carry (the MXU dot's dependent-issue
# latency — batch rows are nearly free, K is lane-parallel). This kernel
# gets within ~12% of that floor by stripping the serial body to
#
#     q_t = (q_{t-1} @ A) * e_t                (dot, mul, store)
#
# and moving everything else into vectorized per-chunk passes:
# ``e_t = exp(lo_t - m_t)`` (pre-pass), the m-cumsum log-shift
# (triangular matmul), rescaling (every ``rs`` frames, off the chain),
# and ``alpha = log(q) + shifts`` (post-pass at VPU throughput).
# Measured at B=32 T=131072 K=64 on v5e-1: 42 ms (log-space kernel) →
# 33.7 ms (HIGHEST) / 29.4 ms (DEFAULT multiplies) vs the ~25 ms
# latency-roofline floor.
#
# Underflow: q's max entry shrinks per step by at most
# ``exp(min_reachable(lo_t - m_t))``; rs=8 tolerates a per-step shrink
# of e^-10 before f32 underflow (~e^-87), ample for speech log-probs.


def _forward_prob_kernel(
    lo_hbm, pa_ref, pi_ref, tri_ref, exp_ref, alpha_out, *,
    t_chunk, T, b_tile, precision, rs,
):
    Bt = b_tile
    K = pa_ref.shape[1]
    n_chunks = T // t_chunk
    n_rs = t_chunk // rs
    b0 = pl.program_id(0) * Bt

    def body(obs_buf, q_buf, m_buf, c_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :],
                obs_buf.at[slot], in_sems.at[slot])

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                q_buf.at[slot],
                alpha_out.at[
                    pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :
                ],
                out_sems.at[slot])

        in_dma(0, 0).start()
        pi = pi_ref[:, :]  # (1, K) exp(log_pi), 0 padded

        def chunk_body(c, carry):
            # q: (Bt, K) scaled probs; C: (Bt, 1) accumulated log-scale
            # (rescale logs of past rs-blocks + m-sums of past chunks).
            q, C = carry
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                in_dma((c + 1) % 2, c + 1).start()

            in_dma(slot, c).wait()

            @pl.when(c >= 2)
            def _():
                out_dma(slot, c - 2).wait()

            # ---- vectorized pre-pass: shift + exp the whole chunk ----
            lo_chunk = obs_buf[slot]                       # (Bt, tc, K)
            m = jnp.maximum(
                jnp.max(lo_chunk, axis=-1, keepdims=True), _NEG
            )                                              # (Bt, tc, 1)
            obs_buf[slot] = jnp.exp(lo_chunk - m)
            # Per-chunk prefix sum of m via triangular matmul
            # (tri[t, u] = 1 for u <= t).
            mcum = jax.lax.dot_general(
                m[:, :, 0], tri_ref[:, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                              # (Bt, tc)
            m_buf[slot] = mcum

            # ---- serial chain: rs-blocked, minimal per-frame body ----
            def rs_block(rb, carry):
                q, C = carry
                # This block's entry scale, for the post-pass.
                c_buf[slot, :, pl.ds(rb, 1)] = C

                def frame(i, q):
                    tf = rb * rs + i
                    e_t = obs_buf[slot, :, tf, :]          # (Bt, K)
                    t = c * t_chunk + tf
                    s = jax.lax.dot_general(
                        q, pa_ref[:, :], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    qn = s * e_t
                    qn = jnp.where(t == 0, pi * e_t, qn)
                    q_buf[slot, :, tf, :] = qn
                    return qn

                q = jax.lax.fori_loop(0, rs, frame, q, unroll=rs)
                # Rescale once per rs block — off the per-frame chain.
                r = jnp.maximum(
                    jnp.max(q, axis=-1, keepdims=True), 1e-37)
                return q * (1.0 / r), C + jnp.log(r)

            q, C = jax.lax.fori_loop(
                0, n_rs, rs_block, (q, C),
                unroll=n_rs if not _use_interpret() else 1)

            # ---- vectorized post-pass: staged q -> log-alpha ----
            # alpha[t] = log(q_staged[t]) + C(entry of t's rs block)
            #            + mcum[t].
            qs = q_buf[slot]                               # (Bt, tc, K)
            # Expand per-rs-block scales to per-frame with a 0/1 matmul
            # (exp_ref[rb, t] = 1 iff t // rs == rb) — lane-safe.
            crep = jax.lax.dot_general(
                c_buf[slot], exp_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                              # (Bt, tc)
            shift = crep + m_buf[slot]
            q_buf[slot] = jnp.log(jnp.maximum(qs, 1e-37)) + shift[:, :, None]
            out_dma(slot, c).start()
            # Re-base so the next chunk's mcum starts from zero.
            C = C + m_buf[slot, :, pl.ds(t_chunk - 1, 1)]
            return q, C

        q0 = jnp.zeros((Bt, K), jnp.float32)
        C0 = jnp.zeros((Bt, 1), jnp.float32)
        jax.lax.fori_loop(0, n_chunks, chunk_body, (q0, C0))

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    pl.run_scoped(
        body,
        obs_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        q_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        m_buf=pltpu.VMEM((2, Bt, t_chunk), jnp.float32),
        c_buf=pltpu.VMEM((2, Bt, t_chunk // rs), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(
    jax.jit, static_argnames=("t_chunk", "b_tile", "rs", "precision")
)
def pallas_forward_prob(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    t_chunk: int = 128,
    b_tile: Optional[int] = None,
    rs: int = 8,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array]:
    """Long-sequence forward on the minimal-latency prob-space kernel.

    Same contract as ``pallas_forward`` minus ``lengths`` (callers with
    ragged batches use the log-space kernel). ``precision`` sets the
    per-frame dot's multiply precision: HIGHEST is within the log-space
    kernel's error envelope (max |Δalpha| ~8e-3 at T=1024 vs its 4e-3);
    DEFAULT (bf16 MXU passes, selected by the mixed-precision policy)
    costs ~9e-2 on alpha — fine for likelihoods/decoding, not for
    posterior-grade work.
    """
    B, T, K = log_obs.shape
    Kp = _ceil_to(K, LANES)
    if b_tile is None:
        bt = _pick_b_tile(B, Kp, t_chunk)
        b_tile = bt if B % bt == 0 else SUBLANES
    Tp = _ceil_to(T, t_chunk)
    Bp = _ceil_to(B, b_tile)

    lo = _pad_to(log_obs.astype(jnp.float32), Kp, 2, _NEG)
    lo = _pad_to(lo, Tp, 1, 0.0)
    lo = _pad_to(lo, Bp, 0, 0.0)
    la = _pad_to(log_a.astype(jnp.float32), Kp, 0, _NEG)
    la = _pad_to(la, Kp, 1, _NEG)
    pa = jnp.exp(la)
    pi = jnp.exp(_pad_to(log_pi.astype(jnp.float32), Kp, 0, _NEG))[None, :]
    tri = jnp.tril(jnp.ones((t_chunk, t_chunk), jnp.float32))
    n_rs = t_chunk // rs
    expand = (
        jnp.arange(t_chunk)[None, :] // rs
        == jnp.arange(n_rs)[:, None]
    ).astype(jnp.float32)

    nb = Bp // b_tile
    alpha_p = pl.pallas_call(
        functools.partial(
            _forward_prob_kernel, t_chunk=t_chunk, T=Tp, b_tile=b_tile,
            precision=precision, rs=rs,
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, t_chunk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rs, t_chunk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp, Kp), jnp.float32),
        interpret=_use_interpret(),
    )(lo, pa, pi, tri, expand)

    log_alpha = alpha_p[:B, :T, :K]
    lz = jax.scipy.special.logsumexp(log_alpha[:, -1, :], axis=-1)
    return log_alpha, lz


# ---------------------------------------------------------------------------
# Long-sequence backward: minimal-latency prob-space chain
# ---------------------------------------------------------------------------
#
# Mirror of ``pallas_forward_prob`` for the reverse recursion. The
# carried quantity is ``u_t = e_t ⊙ beta_t`` (scaled), whose recursion
#
#     u_t = e_t ⊙ (u_{t+1} @ Aᵀ)
#
# has exactly the forward kernel's ``dot → multiply → store`` chain
# shape (carrying beta directly gives ``multiply → dot``, measured
# slower). exp/suffix-cumsum/rescale/log all run as vectorized
# per-chunk passes; the post-pass recovers
# ``log beta_t = log u_t + shifts − lo_t``. The all-ones carry is an
# exact fixed point under zero-padded frames (1 @ Aᵀ = 1 for
# row-stochastic A), so T-padding needs no masking at all.


def _backward_prob_kernel(
    lo_hbm, pa_t_ref, tri_ref, exp_ref, beta_out, *,
    t_chunk, T, b_tile, precision, rs,
):
    Bt = b_tile
    K = pa_t_ref.shape[1]
    n_chunks = T // t_chunk
    n_rs = t_chunk // rs
    b0 = pl.program_id(0) * Bt

    def body(obs_buf, q_buf, m_buf, m_col, c_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :],
                obs_buf.at[slot], in_sems.at[slot])

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                q_buf.at[slot],
                beta_out.at[
                    pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :
                ],
                out_sems.at[slot])

        in_dma(0, n_chunks - 1).start()

        def chunk_body(r, carry):
            # q: scaled u_{t+1} = e_{t+1} ⊙ beta_{t+1}; C: log-scale
            # (rescale logs + m totals of later chunks). Rows hold the
            # UNSHIFTED lo (the u-recursion consumes its own frame's e).
            q, C = carry
            c = n_chunks - 1 - r
            slot = r % 2

            @pl.when(r + 1 < n_chunks)
            def _():
                in_dma((r + 1) % 2, c - 1).start()

            in_dma(slot, c).wait()

            @pl.when(r >= 2)
            def _():
                out_dma(slot, n_chunks - 1 - (r - 2)).wait()

            # ---- pre-pass: shift + exp the whole chunk ----
            lo_chunk = obs_buf[slot]                      # (Bt, tc, K)
            m = jnp.maximum(
                jnp.max(lo_chunk, axis=-1, keepdims=True), _NEG
            )
            obs_buf[slot] = jnp.exp(lo_chunk - m)
            # INCLUSIVE suffix sum: mrev[t] = sum_{u >= t} m[u]
            # (tri_ref[u, t] = 1 for u >= t) — u_t's scale includes its
            # own frame's m.
            mrev = jax.lax.dot_general(
                m[:, :, 0], tri_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                             # (Bt, tc)
            m_buf[slot] = mrev
            m_col[slot] = m[:, :, 0]
            msum = mrev[:, 0:1]                           # Σ m over chunk

            # ---- serial chain: reverse rs blocks, minimal body ----
            def rs_block(rbi, carry):
                q, C = carry
                rb = n_rs - 1 - rbi
                c_buf[slot, :, pl.ds(rb, 1)] = C

                def frame(i, q):
                    tf = rb * rs + (rs - 1 - i)
                    s = jax.lax.dot_general(
                        q, pa_t_ref[:, :], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    # s IS scaled beta_t (before its own e); store it
                    # and carry u_t = s ⊙ e_t.
                    q_buf[slot, :, tf, :] = s
                    return s * obs_buf[slot, :, tf, :]

                q = jax.lax.fori_loop(0, rs, frame, q, unroll=rs)
                r_ = jnp.maximum(
                    jnp.max(q, axis=-1, keepdims=True), 1e-37)
                return q * (1.0 / r_), C + jnp.log(r_)

            q, C = jax.lax.fori_loop(
                0, n_rs, rs_block, (q, C),
                unroll=n_rs if not _use_interpret() else 1)

            # ---- post-pass: staged s -> log-beta ----
            # The staged value is beta_t scaled by everything EXCEPT
            # its own frame's m, so the shift is the exclusive suffix
            # sum mrev[t] - m[t] plus the block-entry rescale log.
            qs = q_buf[slot]
            crep = jax.lax.dot_general(
                c_buf[slot], exp_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            shift = crep + (m_buf[slot] - m_col[slot])
            q_buf[slot] = jnp.log(jnp.maximum(qs, 1e-37)) + shift[:, :, None]
            out_dma(slot, c).start()
            return q, C + msum

        q0 = jnp.ones((Bt, K), jnp.float32)
        C0 = jnp.zeros((Bt, 1), jnp.float32)
        jax.lax.fori_loop(0, n_chunks, chunk_body, (q0, C0))

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, 1).wait()

        out_dma((n_chunks - 1) % 2, 0).wait()

    pl.run_scoped(
        body,
        obs_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        q_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        m_buf=pltpu.VMEM((2, Bt, t_chunk), jnp.float32),
        m_col=pltpu.VMEM((2, Bt, t_chunk), jnp.float32),
        c_buf=pltpu.VMEM((2, Bt, t_chunk // rs), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(
    jax.jit, static_argnames=("t_chunk", "b_tile", "rs", "precision")
)
def pallas_backward_prob(
    log_obs: jax.Array,
    log_a: jax.Array,
    t_chunk: int = 128,
    b_tile: Optional[int] = None,
    rs: int = 8,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Long-sequence ``log_beta (B, T, K)`` on the minimal-latency
    prob-space kernel (no ``lengths``; ragged batches use the log-space
    kernel). Same precision semantics as ``pallas_forward_prob``."""
    B, T, K = log_obs.shape
    Kp = _ceil_to(K, LANES)
    if b_tile is None:
        bt = _pick_b_tile(B, Kp, t_chunk)
        b_tile = bt if B % bt == 0 else SUBLANES
    Tp = _ceil_to(T, t_chunk)
    Bp = _ceil_to(B, b_tile)

    # Stream UNSHIFTED lo (the u-recursion consumes its own frame's
    # emission); T-padding rows are zeros, whose exp-shifted value is
    # ones — the fixed point of the padded recursion.
    lo = _pad_to(log_obs.astype(jnp.float32), Kp, 2, _NEG)
    lo = _pad_to(lo, Tp, 1, 0.0)
    lo = _pad_to(lo, Bp, 0, 0.0)
    la = _pad_to(log_a.astype(jnp.float32), Kp, 0, _NEG)
    la = _pad_to(la, Kp, 1, _NEG)
    pa_t = jnp.exp(la).T
    # tri[u, t] = 1 for u >= t: INCLUSIVE suffix sum over shifted rows.
    tri_u = jnp.tril(jnp.ones((t_chunk, t_chunk), jnp.float32))
    n_rs = t_chunk // rs
    expand = (
        jnp.arange(t_chunk)[None, :] // rs
        == jnp.arange(n_rs)[:, None]
    ).astype(jnp.float32)

    nb = Bp // b_tile
    beta_p = pl.pallas_call(
        functools.partial(
            _backward_prob_kernel, t_chunk=t_chunk, T=Tp, b_tile=b_tile,
            precision=precision, rs=rs,
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, t_chunk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rs, t_chunk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp, Kp), jnp.float32),
        interpret=_use_interpret(),
    )(lo, pa_t, tri_u, expand)

    return beta_p[:B, :T, :K]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _backward_kernel(
    lo_hbm,      # (B, Tp, K) HBM
    pa_t_ref,    # (K, K) VMEM — exp(log_a) TRANSPOSED
    tt_ref,      # (Bt, 1) VMEM int32 — per-row true length
    beta_out,    # (B, Tp, K) HBM
    *,
    t_chunk: int,
    t_total: int,
    t_true_static: int,
    b_tile: int,
    ragged: bool,
):
    Bt = b_tile
    K = pa_t_ref.shape[1]
    n_chunks = t_total // t_chunk
    b0 = pl.program_id(0) * Bt

    def body(obs_buf, stage_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :],
                obs_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                stage_buf.at[slot],
                beta_out.at[
                    pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :
                ],
                out_sems.at[slot],
            )

        # Chunks processed in reverse order: chunk index r goes 0..n-1
        # over actual chunk (n_chunks - 1 - r).
        in_dma(0, n_chunks - 1).start()
        t_true = tt_ref[:, :] if ragged else t_true_static

        def chunk_body(r, carry):
            beta, lo_next = carry
            c = n_chunks - 1 - r
            slot = r % 2

            @pl.when(r + 1 < n_chunks)
            def _():
                in_dma((r + 1) % 2, c - 1).start()

            in_dma(slot, c).wait()

            @pl.when(r >= 2)
            def _():
                out_dma(slot, n_chunks - 1 - (r - 2)).wait()

            def frame(i, carry):
                beta, lo_next = carry
                tf = t_chunk - 1 - i
                t = c * t_chunk + tf
                lo_t = obs_buf[slot, :, tf, :]
                # beta_t = log( P @ exp(lo_{t+1} + beta_{t+1}) ) (shifted)
                v = lo_next + beta
                cmax = jnp.max(v, axis=-1, keepdims=True)
                cmax = jnp.maximum(cmax, _NEG)  # guard all -inf rows
                p = jnp.exp(v - cmax)
                s = jnp.dot(
                    p, pa_t_ref[:, :],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                prev = cmax + jnp.log(s)
                # Zero beta from each row's TRUE final frame on (matches
                # core.fb: beta_t = 0 for t >= length-1); padded frames
                # beyond it produce zeros that the caller slices away.
                # Scalar compare when not ragged (cheap select).
                beta_t = jnp.where(
                    t >= t_true - 1, jnp.zeros_like(prev), prev
                )
                stage_buf[slot, :, tf, :] = beta_t
                return beta_t, lo_t

            carry = jax.lax.fori_loop(
                0, t_chunk, frame, (beta, lo_next),
                unroll=_unroll(t_chunk),
            )
            out_dma(slot, c).start()
            return carry

        beta0 = jnp.zeros((Bt, K), jnp.float32)
        lo0 = jnp.zeros((Bt, K), jnp.float32)
        jax.lax.fori_loop(0, n_chunks, chunk_body, (beta0, lo0))

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, 1).wait()

        out_dma((n_chunks - 1) % 2, 0).wait()

    pl.run_scoped(
        body,
        obs_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        stage_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("t_chunk", "b_tile"))
def pallas_backward(
    log_obs: jax.Array,
    log_a: jax.Array,
    lengths: Optional[jax.Array] = None,
    t_chunk: int = 128,
    b_tile: Optional[int] = None,
) -> jax.Array:
    """Backward algorithm: ``log_beta (B, T, K)`` (cf. ``core.backward_log``).

    T-padding is exact: the kernel zeroes ``beta`` from each row's *true*
    final frame (``length - 1``) on; padded frames past it are computed
    first in the reverse sweep, produce zeros, and cannot influence
    earlier frames because the anchor resets the carry.
    """
    B, T, K = log_obs.shape
    Kp = _ceil_to(K, LANES)
    if b_tile is None:
        bt = _pick_b_tile(B, Kp, t_chunk)
        b_tile = bt if B % bt == 0 else SUBLANES

    Tp = _ceil_to(T, t_chunk)
    Bp = _ceil_to(B, b_tile)

    lo = _pad_to(log_obs.astype(jnp.float32), Kp, 2, _NEG)
    lo = _pad_to(lo, Tp, 1, 0.0)
    lo = _pad_to(lo, Bp, 0, 0.0)

    la = _pad_to(log_a.astype(jnp.float32), Kp, 0, _NEG)
    la = _pad_to(la, Kp, 1, _NEG)
    pa_t = jnp.exp(la).T
    tt = _lengths_vec(lengths, B, T, Bp, b_tile)

    nb = Bp // b_tile
    beta_p = pl.pallas_call(
        functools.partial(
            _backward_kernel, t_chunk=t_chunk, t_total=Tp, t_true_static=T,
            b_tile=b_tile, ragged=lengths is not None,
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp, Kp), jnp.float32),
        interpret=_use_interpret(),
    )(lo, pa_t, tt)
    return beta_p[:B, :T, :K]


# ---------------------------------------------------------------------------
# Viterbi (max-product + on-chip backtrace)
# ---------------------------------------------------------------------------

def _vit_trellis_kernel(
    lo_hbm,      # (B, Tp, K) HBM
    la_ref,      # (Ks, K) VMEM log transitions (sublane-packed rows)
    lpi_ref,     # (1, K) VMEM
    tt_ref,      # (Bt, 1) VMEM int32 — per-row true length
    delta_out,   # (B, Tp, K) HBM — per-frame trellis values
    dfin_ref,    # (Bt, K) VMEM — final delta
    *,
    t_chunk: int,
    t_total: int,
    t_true_static: int,
    k_sub: int,
    ragged: bool,
):
    """Phase 1: max-product trellis, streaming delta frames to HBM.

    Identical DMA protocol to ``_forward_kernel`` (proven on hardware);
    the per-frame compute is a balanced maximum tree over the ``k_sub``
    packed predecessor sublanes with the transition add fused into the
    first level (no argmax in the hot loop — the backtrace kernel
    recomputes predecessors from delta).
    """
    Bt = dfin_ref.shape[0]
    K = la_ref.shape[1]
    n_chunks = t_total // t_chunk
    b0 = pl.program_id(0) * Bt

    def body(obs_buf, stage_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :],
                obs_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                stage_buf.at[slot],
                delta_out.at[
                    pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :
                ],
                out_sems.at[slot],
            )

        in_dma(0, 0).start()
        t_true = tt_ref[:, :] if ragged else t_true_static

        def chunk_body(c, delta):
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                in_dma((c + 1) % 2, c + 1).start()

            in_dma(slot, c).wait()

            @pl.when(c >= 2)
            def _():
                out_dma(slot, c - 2).wait()

            def frame(tf, delta):
                lo_t = obs_buf[slot, :, tf, :]
                t = c * t_chunk + tf
                d_sub = jax.lax.slice_in_dim(delta, 0, k_sub, axis=1)
                # Balanced max tree with the transition add fused into
                # the first level; k_sub is a power of two.
                la = la_ref[:, :]
                half = k_sub // 2
                d_lo = d_sub[:, :half]
                d_hi = d_sub[:, half:]
                s = jnp.maximum(
                    d_lo[:, :, None] + la[:half][None],
                    d_hi[:, :, None] + la[half:][None],
                )
                w = half
                while w > 1:
                    half = w // 2
                    s = jnp.maximum(s[:, :half], s[:, half:w])
                    w = half
                best = s[:, 0] + lo_t
                first = lpi_ref[0, :][None, :] + lo_t
                new_delta = jnp.where(t == 0, first, best)
                delta = jnp.where(t >= t_true, delta, new_delta)
                stage_buf[slot, :, tf, :] = delta
                return delta

            delta = jax.lax.fori_loop(
                0, t_chunk, frame, delta, unroll=_unroll(t_chunk)
            )
            out_dma(slot, c).start()
            return delta

        delta0 = jnp.full((Bt, K), _NEG, jnp.float32)
        delta = jax.lax.fori_loop(0, n_chunks, chunk_body, delta0)

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()
        dfin_ref[:, :] = delta

    pl.run_scoped(
        body,
        obs_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        stage_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _vit_backtrace_kernel(
    delta_hbm,   # (B, Tp, K) HBM — trellis values from the first kernel
    la_t_ref,    # (K, K) VMEM log transitions TRANSPOSED
    dfin_ref,    # (Bt, K) VMEM — final delta
    tt_ref,      # (Bt, 1) VMEM int32 — per-row true length
    states_out,  # (B, Tp) HBM f32 state values
    score_ref,   # (Bt, 1) VMEM
    *,
    t_chunk: int,
    t_total: int,
    t_true_static: int,
    ragged: bool,
):
    """Phase 2: boundary-deferred backtrace over delta chunks in reverse.

    Runs as a separate ``pallas_call`` so this kernel only ever *reads*
    ``delta_hbm`` (same-kernel DMA write-then-read-back of an output
    buffer hangs on real hardware even though interpret mode allows it).

    Score ties break toward the LOWEST state index, matching
    ``jnp.argmax`` semantics in ``core.viterbi`` exactly.
    """
    Bt = dfin_ref.shape[0]
    K = la_t_ref.shape[1]
    n_chunks = t_total // t_chunk
    b0 = pl.program_id(0) * Bt
    lane_iota = jax.lax.broadcasted_iota(
        jnp.int32, (Bt, K), 1
    ).astype(jnp.float32)

    def body(dback_buf, st_buf, din_sems, st_sems):
        def delta_in_dma(slot, chunk):
            return pltpu.make_async_copy(
                delta_hbm.at[
                    pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :
                ],
                dback_buf.at[slot],
                din_sems.at[slot],
            )

        def st_out_dma(slot, chunk):
            return pltpu.make_async_copy(
                st_buf.at[slot],
                states_out.at[
                    pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk)
                ],
                st_sems.at[slot],
            )

        def argmax_low(scores, best):
            # Lowest-index argmax over lanes (ties -> smallest state).
            return jnp.min(
                jnp.where(scores == best, lane_iota, float(K)), axis=-1
            )

        def pred_step(state, d_prev):
            onehot = (lane_iota == state[:, None]).astype(jnp.float32)
            col = jnp.dot(
                onehot, la_t_ref[:, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            scores = d_prev + col
            best = jnp.max(scores, axis=-1, keepdims=True)
            return argmax_low(scores, best)

        t_true = tt_ref[:, :] if ragged else None
        delta = dfin_ref[:, :]
        best_final = jnp.max(delta, axis=-1, keepdims=True)
        score_ref[:, 0] = best_final[:, 0]
        last_state = argmax_low(delta, best_final)

        delta_in_dma(0, n_chunks - 1).start()

        def bt_chunk(r, state):
            c = n_chunks - 1 - r
            slot = r % 2

            @pl.when(r + 1 < n_chunks)
            def _():
                delta_in_dma((r + 1) % 2, c - 1).start()

            delta_in_dma(slot, c).wait()

            @pl.when(r >= 2)
            def _():
                st_out_dma(slot, n_chunks - 1 - (r - 2)).wait()

            # Deferred boundary: transition into frame (c+1)*t_chunk.
            t_b = (c + 1) * t_chunk
            pred_b = pred_step(state, dback_buf[slot, :, t_chunk - 1, :])
            if ragged:
                move_b = (r > 0) & (t_b < t_true[:, 0])
            else:
                move_b = (r > 0) & (t_b < t_true_static)
            state = jnp.where(move_b, pred_b, state)

            def frame(i, state):
                tf = t_chunk - 1 - i
                t = c * t_chunk + tf
                st_buf[slot, :, pl.ds(tf, 1)] = state[:, None]
                d_prev = dback_buf[
                    slot, :, pl.ds(jnp.maximum(tf - 1, 0), 1), :
                ][:, 0, :]
                pred_f = pred_step(state, d_prev)
                if ragged:
                    move = (tf > 0) & (t < t_true[:, 0])
                else:
                    move = (tf > 0) & (t < t_true_static)
                return jnp.where(move, pred_f, state)

            state = jax.lax.fori_loop(
                0, t_chunk, frame, state, unroll=_unroll(t_chunk)
            )
            st_out_dma(slot, c).start()
            return state

        jax.lax.fori_loop(0, n_chunks, bt_chunk, last_state)

        @pl.when(n_chunks >= 2)
        def _():
            st_out_dma((n_chunks - 2) % 2, 1).wait()

        st_out_dma((n_chunks - 1) % 2, 0).wait()

    pl.run_scoped(
        body,
        dback_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        st_buf=pltpu.VMEM((2, Bt, t_chunk), jnp.float32),
        din_sems=pltpu.SemaphoreType.DMA((2,)),
        st_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("t_chunk", "b_tile"))
def pallas_viterbi(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    lengths: Optional[jax.Array] = None,
    t_chunk: int = 128,
    b_tile: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Viterbi decode: ``(states (B, T), score (B,))``.

    Two Pallas kernels: a streamed max-product trellis writing per-frame
    delta vectors, then a boundary-deferred backtrace reading them in
    reverse. T-padding is exact (padded frames freeze the trellis, and
    the decoded path repeats each row's final valid state — the
    ``core.viterbi`` lengths convention).
    """
    B, T, K = log_obs.shape
    Kp = _ceil_to(K, LANES)
    if b_tile is None:
        bt = _pick_b_tile(B, Kp, t_chunk)
        b_tile = bt if B % bt == 0 else SUBLANES

    k_sub = _next_pow2(max(_ceil_to(K, SUBLANES), SUBLANES))
    Tp = _ceil_to(T, t_chunk)
    Bp = _ceil_to(B, b_tile)

    lo = _pad_to(log_obs.astype(jnp.float32), Kp, 2, _NEG)
    lo = _pad_to(lo, Tp, 1, 0.0)
    lo = _pad_to(lo, Bp, 0, 0.0)

    la_full = _pad_to(log_a.astype(jnp.float32), Kp, 0, _NEG)
    la_full = _pad_to(la_full, Kp, 1, _NEG)
    la_rows = _pad_to(la_full, k_sub, 0, _NEG)[:k_sub]   # (k_sub, Kp)
    la_t = la_full.T                                     # (Kp, Kp)
    lpi = _pad_to(log_pi.astype(jnp.float32), Kp, 0, _NEG)[None, :]
    tt = _lengths_vec(lengths, B, T, Bp, b_tile)

    nb = Bp // b_tile
    delta_hbm, dfin = pl.pallas_call(
        functools.partial(
            _vit_trellis_kernel, t_chunk=t_chunk, t_total=Tp,
            t_true_static=T, k_sub=k_sub, ragged=lengths is not None,
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k_sub, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((b_tile, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Tp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Kp), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(lo, la_rows, lpi, tt)

    st_vals, score_p = pl.pallas_call(
        functools.partial(
            _vit_backtrace_kernel, t_chunk=t_chunk, t_total=Tp,
            t_true_static=T, ragged=lengths is not None,
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((b_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Tp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(delta_hbm, la_t, dfin, tt)

    states = st_vals[:B, :T].astype(jnp.int32)
    return states, score_p[:B, 0]


# ---------------------------------------------------------------------------
# Long-sequence fused forward+backward: both prob-space chains, one pass
# ---------------------------------------------------------------------------
#
# The forward and backward recursions are independent dependency chains
# (alpha runs t=0→T−1, beta runs T−1→0), and each prob-space step is
# latency-bound (one dependent MXU dot + multiply ≈ 190-220 ns while
# the issued work is ~µs-scale) — so one kernel interleaves them per
# frame and the second chain largely rides the first's stalls (the same
# trick as the small-K ``ops/fbsum.py``, here at the T ≥ 1024 regime).
# Two input DMA streams walk the observations from both ends; alpha and
# beta stream out behind the compute.
#
# VMEM: the separate kernels each stage outputs in their own q buffer;
# doubling that for two directions would break the 32-row batch tile
# (4 × 2 × 32·128·128·4 ≈ 17 MB > VMEM). Instead each direction stages
# IN PLACE: after frame tf's dot consumes e_tf, that row of the obs
# buffer is dead, so the staged output overwrites it and the out-DMA
# drains the obs buffer itself. Slot-reuse hazard (in-DMA of chunk j+1
# vs out-DMA of chunk j−1 on the same slot) is handled by prefetching
# LATE — after the serial chain, by which point the previous out-DMA
# (~2.4 µs for 2 MB) has long drained behind the ~25 µs chain.

def _fb_prob_kernel(
    lo_hbm, pa_ref, pa_t_ref, pi_ref, tri_ref, exp_ref,
    alpha_out, beta_out, *,
    t_chunk, T, b_tile, precision, rs,
):
    Bt = b_tile
    K = pa_ref.shape[1]
    n_chunks = T // t_chunk
    n_rs = t_chunk // rs
    b0 = pl.program_id(0) * Bt

    def body(of_buf, ob_buf, mf_buf, mb_buf, mc_buf, cf_buf, cb_buf,
             inf_sems, inb_sems, outf_sems, outb_sems):
        def in_f(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :],
                of_buf.at[slot], inf_sems.at[slot])

        def in_b(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :],
                ob_buf.at[slot], inb_sems.at[slot])

        def out_f(slot, chunk):
            return pltpu.make_async_copy(
                of_buf.at[slot],
                alpha_out.at[
                    pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :
                ],
                outf_sems.at[slot])

        def out_b(slot, chunk):
            return pltpu.make_async_copy(
                ob_buf.at[slot],
                beta_out.at[
                    pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :
                ],
                outb_sems.at[slot])

        in_f(0, 0).start()
        in_b(0, n_chunks - 1).start()
        pi = pi_ref[:, :]

        def chunk_body(j, carry):
            qf, Cf, qb, Cb = carry
            cf = j
            cb = n_chunks - 1 - j
            slot = j % 2

            in_f(slot, cf).wait()
            in_b(slot, cb).wait()

            # ---- pre-passes: shift + exp both chunks ----
            lof = of_buf[slot]
            mf = jnp.maximum(jnp.max(lof, axis=-1, keepdims=True), _NEG)
            of_buf[slot] = jnp.exp(lof - mf)
            mcum = jax.lax.dot_general(
                mf[:, :, 0], tri_ref[:, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            mf_buf[slot] = mcum

            lob = ob_buf[slot]
            mb = jnp.maximum(jnp.max(lob, axis=-1, keepdims=True), _NEG)
            ob_buf[slot] = jnp.exp(lob - mb)
            mrev = jax.lax.dot_general(
                mb[:, :, 0], tri_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            mb_buf[slot] = mrev
            mc_buf[slot] = mb[:, :, 0]
            msum_b = mrev[:, 0:1]

            # ---- fused serial chains: rs-blocked, both directions ----
            def rs_block(rb, carry):
                qf, Cf, qb, Cb = carry
                rbb = n_rs - 1 - rb
                cf_buf[slot, :, pl.ds(rb, 1)] = Cf
                cb_buf[slot, :, pl.ds(rbb, 1)] = Cb

                def frame(i, qq):
                    qf, qb = qq
                    # forward frame rb·rs + i
                    tff = rb * rs + i
                    ef = of_buf[slot, :, tff, :]
                    sf = jax.lax.dot_general(
                        qf, pa_ref[:, :], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    qnf = sf * ef
                    qnf = jnp.where(cf * t_chunk + tff == 0, pi * ef, qnf)
                    of_buf[slot, :, tff, :] = qnf
                    # backward frame rbb·rs + (rs−1−i)
                    tfb = rbb * rs + (rs - 1 - i)
                    eb = ob_buf[slot, :, tfb, :]
                    sb = jax.lax.dot_general(
                        qb, pa_t_ref[:, :], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    ob_buf[slot, :, tfb, :] = sb
                    return qnf, sb * eb

                qf, qb = jax.lax.fori_loop(
                    0, rs, frame, (qf, qb), unroll=rs)
                rf = jnp.maximum(
                    jnp.max(qf, axis=-1, keepdims=True), 1e-37)
                rb_ = jnp.maximum(
                    jnp.max(qb, axis=-1, keepdims=True), 1e-37)
                return (qf * (1.0 / rf), Cf + jnp.log(rf),
                        qb * (1.0 / rb_), Cb + jnp.log(rb_))

            qf, Cf, qb, Cb = jax.lax.fori_loop(
                0, n_rs, rs_block, (qf, Cf, qb, Cb),
                unroll=n_rs if not _use_interpret() else 1)

            # ---- late prefetch: the previous slot's out-DMAs drained
            # behind the chain; reuse it for the next chunks ----
            @pl.when(j + 1 < n_chunks)
            def _():
                nslot = (j + 1) % 2

                @pl.when(j >= 1)
                def _():
                    out_f(nslot, cf - 1).wait()
                    out_b(nslot, cb + 1).wait()

                in_f(nslot, cf + 1).start()
                in_b(nslot, cb - 1).start()

            # ---- post-passes: staged values -> log alpha / log beta --
            crepf = jax.lax.dot_general(
                cf_buf[slot], exp_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            shf = crepf + mf_buf[slot]
            of_buf[slot] = jnp.log(
                jnp.maximum(of_buf[slot], 1e-37)
            ) + shf[:, :, None]
            out_f(slot, cf).start()

            crepb = jax.lax.dot_general(
                cb_buf[slot], exp_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            shb = crepb + (mb_buf[slot] - mc_buf[slot])
            ob_buf[slot] = jnp.log(
                jnp.maximum(ob_buf[slot], 1e-37)
            ) + shb[:, :, None]
            out_b(slot, cb).start()

            Cf = Cf + mf_buf[slot, :, pl.ds(t_chunk - 1, 1)]
            return qf, Cf, qb, Cb + msum_b

        qf0 = jnp.zeros((Bt, K), jnp.float32)
        qb0 = jnp.ones((Bt, K), jnp.float32)
        C0 = jnp.zeros((Bt, 1), jnp.float32)
        jax.lax.fori_loop(0, n_chunks, chunk_body, (qf0, C0, qb0, C0))

        @pl.when(n_chunks >= 2)
        def _():
            out_f((n_chunks - 2) % 2, n_chunks - 2).wait()
            out_b((n_chunks - 2) % 2, 1).wait()

        out_f((n_chunks - 1) % 2, n_chunks - 1).wait()
        out_b((n_chunks - 1) % 2, 0).wait()

    pl.run_scoped(
        body,
        of_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        ob_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        mf_buf=pltpu.VMEM((2, Bt, t_chunk), jnp.float32),
        mb_buf=pltpu.VMEM((2, Bt, t_chunk), jnp.float32),
        mc_buf=pltpu.VMEM((2, Bt, t_chunk), jnp.float32),
        cf_buf=pltpu.VMEM((2, Bt, t_chunk // rs), jnp.float32),
        cb_buf=pltpu.VMEM((2, Bt, t_chunk // rs), jnp.float32),
        inf_sems=pltpu.SemaphoreType.DMA((2,)),
        inb_sems=pltpu.SemaphoreType.DMA((2,)),
        outf_sems=pltpu.SemaphoreType.DMA((2,)),
        outb_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(
    jax.jit, static_argnames=("t_chunk", "b_tile", "rs", "precision")
)
def pallas_fb_prob(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    t_chunk: int = 128,
    b_tile: Optional[int] = None,
    rs: int = 8,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused long-sequence ``(log_alpha, log_beta, log_z)`` — both
    prob-space chains in ONE kernel pass (see the section comment).
    Unragged only; same precision semantics as ``pallas_forward_prob``.
    Used by the likelihood VJP (alpha AND beta are always both needed
    there) and by ``auto_forward_backward`` at T ≥ 1024."""
    B, T, K = log_obs.shape
    Kp = _ceil_to(K, LANES)
    if b_tile is None:
        bt = _pick_b_tile(B, Kp, t_chunk)
        b_tile = bt if B % bt == 0 else SUBLANES
    Tp = _ceil_to(T, t_chunk)
    Bp = _ceil_to(B, b_tile)

    lo = _pad_to(log_obs.astype(jnp.float32), Kp, 2, _NEG)
    lo = _pad_to(lo, Tp, 1, 0.0)
    lo = _pad_to(lo, Bp, 0, 0.0)
    la = _pad_to(log_a.astype(jnp.float32), Kp, 0, _NEG)
    la = _pad_to(la, Kp, 1, _NEG)
    pa = jnp.exp(la)
    pi = jnp.exp(_pad_to(log_pi.astype(jnp.float32), Kp, 0, _NEG))[None, :]
    tri = jnp.tril(jnp.ones((t_chunk, t_chunk), jnp.float32))
    n_rs = t_chunk // rs
    expand = (
        jnp.arange(t_chunk)[None, :] // rs
        == jnp.arange(n_rs)[:, None]
    ).astype(jnp.float32)

    nb = Bp // b_tile
    alpha_p, beta_p = pl.pallas_call(
        functools.partial(
            _fb_prob_kernel, t_chunk=t_chunk, T=Tp, b_tile=b_tile,
            precision=precision, rs=rs,
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, t_chunk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rs, t_chunk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Tp, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Tp, Kp), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(lo, pa, jnp.swapaxes(pa, 0, 1), pi, tri, expand)

    log_alpha = alpha_p[:B, :T, :K]
    log_beta = beta_p[:B, :T, :K]
    lz = jax.scipy.special.logsumexp(log_alpha[:, -1, :], axis=-1)
    return log_alpha, log_beta, lz
