"""Small-K transposed-layout Viterbi decode (the flagship fast path).

The general kernels in ``scan.py`` keep the state axis on the 128 VPU
lanes, which forces a lane→sublane relayout of the predecessor vector on
the *critical serial chain* of every trellis frame. For small state
counts (K ≤ 32 — the reference's GMM-HMM/ASR regime, 5–50 states,
``SURVEY.md`` §6) this module flips the layout:

* **states ride SUBLANES, batch rides LANES.** The per-frame trellis
  step is ``tmp[k, j, b] = log_a[k, j] + delta[k, b]`` — predecessor
  ``k`` on the OUTER vreg axis — so the max over k is a log₂(Ks)-level
  tree of whole-vreg maxes with zero shuffles; chain depth ≈ 6.
* **backpointers (psi) are computed VECTORIZED per chunk**, off the
  serial chain, with an index-tracking max tree (ties break toward the
  lowest predecessor index, matching ``jnp.argmax``/``core.viterbi``
  exactly). The trellis kernel streams psi to HBM instead of delta —
  half the DMA traffic of the general two-kernel decode.
* **the backtrace is a pure gather chain**: ``state ← psi[t][state]``
  as one compare + select + sublane-reduce (~6 dependent ops/frame) —
  no MXU dot, no per-frame argmax.
* frame loops are **statically unrolled Python loops**; the ``t == 0``
  seed and the ``t ≥ T`` padding tail live in peeled first/last chunk
  bodies, so the common non-ragged case runs zero runtime selects.
  Ragged batches add one compare+select per frame against a per-lane
  length vector.

Replaces (performance-wise) the hot loops of reference ``hmm.py:162-178``
and ``mixture_gaussian.py:290-338``; numerics match ``core.viterbi``
bit-for-bit including tie-breaks and padding semantics.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import (
    LANES,
    SUBLANES,
    _NEG,
    _ceil_to,
    _next_pow2,
    _pad_to,
    _use_interpret,
)

__all__ = ["smallk_viterbi", "smallk_supported", "MAX_SMALLK"]

# Above this the (Ks, Ks, B) broadcast tree stops being cheap per frame;
# the general lane-layout kernels take over.
MAX_SMALLK = 32
# Lane budget: B > this would blow the VMEM chunk buffers.
_MAX_B = 256


def smallk_supported(num_states: int, batch: int) -> bool:
    return num_states <= MAX_SMALLK and batch <= _MAX_B


def _k_pad(K: int) -> int:
    """State padding: power of two ≥ K (for the halving trees), ≥ 8."""
    return max(_next_pow2(_ceil_to(K, SUBLANES)), SUBLANES)


def _tree_max(tmp):
    """Max over axis 0 as an explicit halving tree of whole-vreg ops."""
    w = tmp.shape[0]
    while w > 1:
        h = w // 2
        tmp = jnp.maximum(tmp[:h], tmp[h:w])
        w = h
    return tmp[0]


def _frame_loop(start, n, step, init):
    """Run ``step(tf, carry)`` for tf in [start, n).

    On hardware the loop is a statically-unrolled Python loop (constant
    frame indices → zero-cost branch peeling, best Mosaic schedule); in
    interpret mode (CPU tests) it stays a rolled ``fori_loop`` so
    tracing cost is O(1) in T.
    """
    if _use_interpret():
        return jax.lax.fori_loop(start, n, step, init)
    carry = init
    for tf in range(start, n):
        carry = step(tf, carry)
    return carry


def _frame_loop_blocked(start, n, step, init, unroll):
    """``_frame_loop`` with BOUNDED unroll: a rolled outer loop over
    ``unroll``-frame fully-unrolled bodies.

    Mosaic's scoped-VMEM stack counts live intermediates across a fully
    unrolled frame loop, so kernels with large per-frame temporaries
    (the multi-stream beam update's (N, Sp, Sl) masks) blow the budget
    at high N even though their declared buffers are small. Bounding
    the unroll bounds that live window; the rolled outer loop adds only
    per-block index arithmetic, amortized over ``unroll`` frames.
    ``n - start`` must be divisible by ``unroll``.
    """
    if _use_interpret():
        return jax.lax.fori_loop(start, n, step, init)
    assert (n - start) % unroll == 0, (start, n, unroll)

    def body(b, carry):
        t0 = start + b * unroll
        for i in range(unroll):
            carry = step(t0 + i, carry)
        return carry

    return jax.lax.fori_loop(0, (n - start) // unroll, body, init)


def _trellis_psi_kernel(
    lo_hbm,     # (Tp, Ks, Bp) HBM — transposed log-obs
    la_ref,     # (Ks, Ks) VMEM — log_a[k, j], _NEG padded
    lpi_ref,    # (Ks, Bp) VMEM — log prior broadcast over lanes
    tt_ref,     # (1, Bp) VMEM int32 — per-lane true length
    psi_hbm,    # (Tp, Ks, Bp) HBM out — f32 backpointer indices
    dfin_ref,   # (Ks, Bp) VMEM out — delta at each lane's final frame
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
    ragged: bool,
):
    Ks, Bp = lpi_ref.shape
    tc = t_chunk
    n_chunks = t_total // tc
    tail = t_true - (n_chunks - 1) * tc   # true frames in the last chunk
    # psi vectorization group: the pass materializes (G, Ks, Ks, Bp)
    # value+index temporaries; scale G down with the state tile so the
    # kernel's scoped-VMEM stack stays under the 16 MB core limit
    # (G=16 at Ks=32 allocated 19 MB and failed to compile).
    G = 16 if Ks <= 16 else 4

    def body(lo_buf, psi_buf, delta_buf, in_sems, out_sems):
        # delta_buf row tf+1 holds delta[tf] of the current chunk; row 0
        # holds the previous chunk's final delta (the psi pass for frame
        # tf needs delta[tf-1]).
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(chunk * tc, tc)], lo_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                psi_buf.at[slot], psi_hbm.at[pl.ds(chunk * tc, tc)],
                out_sems.at[slot],
            )

        in_dma(0, 0).start()
        la = la_ref[:, :]
        ttf = tt_ref[:, :].astype(jnp.float32) if ragged else None

        def frames(c, slot, delta, seeded: bool, n_frames: int):
            """Trellis frames of one chunk. ``c`` may be traced; it is
            only used for the ragged length compare."""
            start = 0
            if seeded:
                delta = lpi_ref[:, :] + lo_buf[slot, 0]
                delta_buf[pl.ds(1, 1)] = delta[None]
                start = 1

            def step(tf, delta):
                stepped = (
                    _tree_max(la[:, :, None] + delta[:, None, :])
                    + lo_buf[slot, tf]
                )
                if ragged:
                    t = c * tc + tf
                    stepped = jnp.where(t < ttf, stepped, delta)
                delta_buf[pl.ds(tf + 1, 1)] = stepped[None]
                return stepped

            return _frame_loop(start, n_frames, step, delta)

        def psi_pass(slot, n_frames: int):
            """Vectorized backpointers for the chunk (off the chain)."""
            for g0 in range(0, n_frames, G):
                g = min(G, n_frames - g0)
                dprev = delta_buf[pl.ds(g0, g)]          # (g, Ks, Bp)
                # vals[t, k, j, b] = la[k, j] + delta[t-1][k, b]
                vals = la[None, :, :, None] + dprev[:, :, None, :]
                # Mosaic has no 4D/float iota; broadcast a 2D int one.
                iota_k = jax.lax.broadcasted_iota(
                    jnp.int32, (Ks, Bp), 0
                ).astype(jnp.float32)
                idxs = jnp.broadcast_to(
                    iota_k[None, :, None, :], vals.shape
                )
                w = Ks
                while w > 1:
                    h = w // 2
                    lv, rv = vals[:, :h], vals[:, h:w]
                    li, ri = idxs[:, :h], idxs[:, h:w]
                    # Lexicographic on (value, -index): a plain >= only
                    # keeps the lowest index within a bracket, not
                    # globally (ties among {1,2,3} with a -inf entry at
                    # 0 pair (0,2) first and wrongly return 2).
                    take = (lv > rv) | ((lv == rv) & (li <= ri))
                    vals = jnp.where(take, lv, rv)
                    idxs = jnp.where(take, li, ri)
                    w = h
                psi_buf[slot, pl.ds(g0, g)] = idxs[:, 0]

        def run_chunk(c, r_slot, delta, seeded: bool, n_frames: int):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, r_slot + 1).start()

            slot = r_slot % 2
            in_dma(slot, r_slot).wait()

            @pl.when(r_slot >= 2)
            def _():
                out_dma(slot, r_slot - 2).wait()

            delta = frames(c, slot, delta, seeded, n_frames)
            psi_pass(slot, n_frames)
            out_dma(slot, r_slot).start()
            # Stage this chunk's final delta for the next psi pass.
            delta_buf[0] = delta_buf[n_frames]
            return delta

        # First chunk (seeded) is peeled with a static index; middle
        # chunks loop; the last chunk (padding tail) is peeled again.
        if n_chunks == 1:
            delta = run_chunk(0, 0, lpi_ref[:, :], True, tail)
        else:
            delta = run_chunk(0, 0, lpi_ref[:, :], True, tc)
            if n_chunks > 2:
                def chunk_body(c, delta):
                    return run_chunk(c, c, delta, False, tc)

                delta = jax.lax.fori_loop(
                    1, n_chunks - 1, chunk_body, delta,
                )
            delta = run_chunk(n_chunks - 1, n_chunks - 1, delta, False,
                              tail)
        dfin_ref[:, :] = delta

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    pl.run_scoped(
        body,
        lo_buf=pltpu.VMEM((2, t_chunk, Ks, Bp), jnp.float32),
        psi_buf=pltpu.VMEM((2, t_chunk, Ks, Bp), jnp.float32),
        delta_buf=pltpu.VMEM((t_chunk + 1, Ks, Bp), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _gather_backtrace_kernel(
    psi_hbm,    # (Tp, Ks, Bp) HBM — f32 backpointers
    dfin_ref,   # (Ks, Bp) VMEM — final delta
    tt_ref,     # (1, Bp) VMEM int32
    st_hbm,     # (Tp, Bp) HBM out — f32 state values
    score_ref,  # (1, Bp) VMEM out
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
    ragged: bool,
):
    Ks, Bp = dfin_ref.shape
    tc = t_chunk
    n_chunks = t_total // tc
    last_c = n_chunks - 1
    tail = t_true - last_c * tc
    iota = jax.lax.broadcasted_iota(jnp.int32, (Ks, Bp), 0).astype(
        jnp.float32
    )

    def body(psi_buf, st_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                psi_hbm.at[pl.ds(chunk * tc, tc)], psi_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                st_buf.at[slot], st_hbm.at[pl.ds(chunk * tc, tc)],
                out_sems.at[slot],
            )

        dfin = dfin_ref[:, :]
        best = _tree_max(dfin)[None, :]                    # (1, Bp)
        score_ref[:, :] = best
        # Lowest-index argmax (ties -> smallest state), like jnp.argmax.
        state = _tree_max(
            jnp.where(dfin == best, -iota, float(-Ks))
        )[None, :] * -1.0                                  # (1, Bp)
        ttf = tt_ref[:, :].astype(jnp.float32) if ragged else None

        in_dma(0, last_c).start()

        def frames(c, slot, state, n_frames: int, has_t0: bool):
            """Reverse frames of one chunk; ``c`` may be traced (then
            ``has_t0`` must be False — frame 0 of the whole sequence is
            only in the statically peeled chunk 0)."""
            def step(i, state):
                tf = n_frames - 1 - i
                onehot = (iota == state).astype(jnp.float32)
                st_buf[slot, pl.ds(tf, 1)] = state
                if has_t0 and isinstance(tf, int) and tf == 0:
                    return state           # t == 0: nothing to gather
                picked = _tree_max(onehot * psi_buf[slot, tf])[None, :]
                if has_t0 and not isinstance(tf, int):
                    picked = jnp.where(tf > 0, picked, state)
                if ragged:
                    t = c * tc + tf
                    state = jnp.where(t < ttf, picked, state)
                else:
                    state = picked
                return state

            return _frame_loop(0, n_frames, step, state)

        def run_chunk(c, r_slot, state, n_frames: int, has_t0: bool):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, last_c - r_slot - 1).start()

            slot = r_slot % 2
            in_dma(slot, last_c - r_slot).wait()

            @pl.when(r_slot >= 2)
            def _():
                out_dma(slot, last_c - r_slot + 2).wait()

            state = frames(c, slot, state, n_frames, has_t0)
            out_dma(slot, last_c - r_slot).start()
            return state

        if n_chunks == 1:
            run_chunk(0, 0, state, tail, True)
        else:
            state = run_chunk(last_c, 0, state, tail, False)
            if n_chunks > 2:
                def chunk_body(r, state):
                    return run_chunk(last_c - r, r, state, tc, False)

                state = jax.lax.fori_loop(
                    1, n_chunks - 1, chunk_body, state,
                )
            run_chunk(0, last_c, state, tc, True)

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((last_c - 1) % 2, 1).wait()

        out_dma(last_c % 2, 0).wait()

    pl.run_scoped(
        body,
        psi_buf=pltpu.VMEM((2, t_chunk, Ks, Bp), jnp.float32),
        st_buf=pltpu.VMEM((2, t_chunk, Bp), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("t_chunk",))
def smallk_viterbi(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    lengths: Optional[jax.Array] = None,
    t_chunk: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Exact batched Viterbi for K ≤ 32 states (transposed layout).

    Args/returns match ``scan.pallas_viterbi``: ``(B, T, K)`` log-obs,
    static ``(K, K)`` / ``(K,)`` transitions and prior, optional
    ``(B,)`` lengths; returns ``(states (B, T) int32, score (B,))``.
    Paths and scores are identical to ``core.viterbi`` (tie-breaks
    toward the lowest state index; padded frames repeat each row's
    final valid state).
    """
    B, T, K = log_obs.shape
    if not smallk_supported(K, B):
        raise ValueError(
            f"smallk_viterbi requires K <= {MAX_SMALLK}, B <= {_MAX_B}"
        )
    Ks = _k_pad(K)
    Bp = _ceil_to(B, LANES)
    Tp = _ceil_to(T, t_chunk)

    # (B, T, K) -> (T, K, B), padded. Real data is tiny (K, B small);
    # XLA fuses the pad+transpose into one cheap relayout.
    lo_t = jnp.transpose(log_obs.astype(jnp.float32), (1, 2, 0))
    lo_t = _pad_to(lo_t, Ks, 1, _NEG)
    lo_t = _pad_to(lo_t, Bp, 2, 0.0)
    lo_t = _pad_to(lo_t, Tp, 0, 0.0)

    la = _pad_to(
        _pad_to(log_a.astype(jnp.float32), Ks, 0, _NEG), Ks, 1, _NEG
    )
    lpi = jnp.broadcast_to(
        _pad_to(log_pi.astype(jnp.float32), Ks, 0, _NEG)[:, None],
        (Ks, Bp),
    )
    if lengths is None:
        tt = jnp.full((1, Bp), T, jnp.int32)
    else:
        tt = _pad_to(lengths.astype(jnp.int32)[None, :], Bp, 1, T)

    psi, dfin = pl.pallas_call(
        functools.partial(
            _trellis_psi_kernel,
            t_chunk=t_chunk,
            t_total=Tp,
            t_true=T,
            ragged=lengths is not None,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Ks, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Ks, Bp), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(lo_t, la, lpi, tt)

    st_vals, score = pl.pallas_call(
        functools.partial(
            _gather_backtrace_kernel,
            t_chunk=t_chunk,
            t_total=Tp,
            t_true=T,
            ragged=lengths is not None,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(psi, dfin, tt)

    return st_vals[:T, :B].T.astype(jnp.int32), score[0, :B]
