"""Transposed-layout Pallas HSMM (explicit-duration) Viterbi decode.

The XLA segment-DP scan (``core/hsmm.py``) is latency-bound at the
reference's benchmark shape (B=32, T=1000, S=10, D=20): each of the 1000
sequential steps does only ~6K elements of work, so while-loop dispatch
and carry round-trips dominate. This kernel runs the whole recursion
inside one Pallas program with the same layout tricks as
``smallk.py``:

* **states ride SUBLANES, batch rides LANES** — every per-frame tensor is
  a handful of vregs; reductions over durations and predecessor states
  are halving trees of whole-vreg ops with zero shuffles;
* the (D, S)-slot **ring buffers live in VMEM** for the whole sequence
  (the scan carry never round-trips through HBM);
* observation frames stream HBM→VMEM double-buffered; the per-frame
  duration/predecessor **argmax tables (dstar, phi) stream VMEM→HBM**
  behind the compute;
* frame loops are **statically unrolled** per 128-frame chunk; the
  early frames that need the ``duration ≤ t+1`` mask are statically
  peeled into the first chunk, so steady-state frames run zero masks.

Numerics match ``core.hsmm_viterbi`` bit-for-bit: identical operand
grouping in the score accumulation (max-reductions are exactly
associative, running sums are kept in the same order), identical
``_NEG`` clipping, and all argmax ties break toward the lowest index.

Replaces (performance-wise) the hot loops of reference
``hsmm.py:245-354`` and ``semi_markov.py:455-570``.
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
    _NEG,
    _ceil_to,
    _next_pow2,
    _pad_to,
    _use_interpret,
)
from .smallk import _frame_loop, _k_pad, _tree_max

__all__ = [
    "hsmm_smallk_viterbi",
    "hsmm_smallk_forward",
    "hsmm_smallk_backward",
    "hsmm_smallk_fb",
    "hsmm_smallk_supported",
    "hsmm_smallk_fb_supported",
]

# The (Ss, Ss, Bp) predecessor tree stops being cheap beyond this.
_MAX_S = 32
# Durations must fit the statically-peeled first chunk (masked frames
# are exactly t < D-1) and the VMEM ring buffers.
_MAX_D = 128
_MAX_B = 256
_T_CHUNK = 128
# lo/dstar/phi double buffers (3 × 2 × tc) + 2 ring buffers.
_VMEM_BUDGET = 13 * 1024 * 1024


def _d_pad(D: int) -> int:
    """Duration-slot padding: power of two ≥ D (for the halving trees)."""
    return max(_next_pow2(D), 8)


def hsmm_smallk_supported(
    num_states: int, max_duration: int, batch: int
) -> bool:
    if (
        num_states > _MAX_S
        or max_duration > _MAX_D
        or batch > _MAX_B
    ):
        return False
    Ss, Ds = _k_pad(num_states), _d_pad(max_duration)
    Bp = _ceil_to(batch, LANES)
    vmem = (3 * 2 * _T_CHUNK + 2 * Ds) * Ss * Bp * 4
    return vmem <= _VMEM_BUDGET


def hsmm_smallk_fb_supported(
    num_states: int, max_duration: int, batch: int
) -> bool:
    """VMEM gate for the FUSED forward+backward kernel
    (:func:`hsmm_smallk_fb`). It allocates three double-buffered
    T-chunk streams (lof/lob/bt) plus THREE (Ds, Ss, Bp) duration rings
    (mu, cf, w) — one ring more than the separate kernels counted by
    :func:`hsmm_smallk_supported` — so shapes near the budget boundary
    can pass the generic gate yet exceed the fused kernel's envelope
    (ADVICE r4). Callers should fall back to the separate
    forward/backward kernels when this returns False."""
    if not hsmm_smallk_supported(num_states, max_duration, batch):
        return False
    Ss, Ds = _k_pad(num_states), _d_pad(max_duration)
    Bp = _ceil_to(batch, LANES)
    vmem = (3 * 2 * _T_CHUNK + 3 * Ds) * Ss * Bp * 4
    return vmem <= _VMEM_BUDGET


def _max_idx_tree(vals, idxs):
    """(max, argmax) over axis 0; ties break toward the lowest index
    (matching ``jnp.argmax``). The compare is lexicographic on
    ``(value, -index)`` — a plain ``>=`` keeps the lowest index only
    within a bracket, not globally (e.g. ties among {1, 2, 3} with a
    -inf diagonal at 0 pair (0, 2) first and wrongly return 2)."""
    w = vals.shape[0]
    while w > 1:
        h = w // 2
        lv, rv = vals[:h], vals[h:w]
        li, ri = idxs[:h], idxs[h:w]
        take = (lv > rv) | ((lv == rv) & (li <= ri))
        vals = jnp.where(take, lv, rv)
        idxs = jnp.where(take, li, ri)
        w = h
    return vals[0], idxs[0]


def _hsmm_trellis_kernel(
    lo_hbm,     # (Tp, Ss, Bp) HBM — transposed log-obs
    la_ref,     # (Ss, Ss) VMEM — log_a[s', s], _NEG padded
    lpi_ref,    # (Ss, Bp) VMEM — log prior broadcast over lanes
    ld_ref,     # (Ds, Ss) VMEM — log_dur[j, s] (duration j+1), _NEG padded
    tt_ref,     # (1, Bp) VMEM int32 — per-lane true length
    ds_hbm,     # (Tp, Ss, Bp) HBM out — f32 best-duration indices
    phi_hbm,    # (Tp, Ss, Bp) HBM out — f32 best-predecessor indices
    dfin_ref,   # (Ss, Bp) VMEM out — delta at each lane's final frame
    dsfin_ref,  # (Ss, Bp) VMEM out — dstar at each lane's final frame
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
    D: int,
    ragged: bool,
):
    Ss, Bp = lpi_ref.shape
    Ds = ld_ref.shape[0]
    tc = t_chunk
    n_chunks = t_total // tc
    tail = t_true - (n_chunks - 1) * tc

    def body(lo_buf, ds_buf, phi_buf, mu_ref, c_ref,
             in_sems, ds_sems, phi_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(chunk * tc, tc)], lo_buf.at[slot],
                in_sems.at[slot],
            )

        def ds_dma(slot, chunk):
            return pltpu.make_async_copy(
                ds_buf.at[slot], ds_hbm.at[pl.ds(chunk * tc, tc)],
                ds_sems.at[slot],
            )

        def phi_dma(slot, chunk):
            return pltpu.make_async_copy(
                phi_buf.at[slot], phi_hbm.at[pl.ds(chunk * tc, tc)],
                phi_sems.at[slot],
            )

        in_dma(0, 0).start()

        # Ring init — slot j will hold mu(t-1-j) / C(t-1-j) when frame t
        # runs: mu(-1) = log_pi (a segment starting at frame 0), all
        # other slots -inf (durations that would start before frame 0).
        # Rows ≥ D are permanent -inf padding (never shifted into).
        mu_ref[pl.ds(0, 1)] = lpi_ref[:, :][None]
        mu_ref[pl.ds(1, Ds - 1)] = jnp.full((Ds - 1, Ss, Bp), _NEG,
                                            jnp.float32)
        c_ref[:, :, :] = jnp.zeros((Ds, Ss, Bp), jnp.float32)

        la = la_ref[:, :]
        ld3 = ld_ref[:, :][:, :, None]  # (Ds, Ss, 1)
        iota_j2 = jax.lax.broadcasted_iota(jnp.int32, (Ds, Ss), 0)
        iota_jf = iota_j2.astype(jnp.float32)[:, :, None]   # (Ds, Ss, 1)
        iota_sf = jax.lax.broadcasted_iota(
            jnp.int32, (Ss, Ss), 0
        ).astype(jnp.float32)[:, :, None]                   # (Ss, Ss, 1)
        ttf = tt_ref[:, :].astype(jnp.float32) if ragged else None

        def frames(c, slot, carry, chunk0: bool, n_frames: int):
            """Trellis frames of one chunk. ``c`` may be traced (middle
            chunks); it is only used for the ragged length compare."""

            def step(tf, carry):
                c_run, dfin, dsfin = carry
                lo_t = lo_buf[slot, tf]          # (Ss, Bp)
                c_t = c_run + lo_t               # running cumsum C(t)

                # Same operand grouping as core: (ld + (C(t) - C(t-d)))
                # + mu(t-d); max-trees are exactly associative so the
                # reduction order is free.
                g1 = c_t[None] - c_ref[:, :, :]
                scores = (ld3 + g1) + mu_ref[:, :, :]
                if chunk0:
                    if isinstance(tf, int):
                        if tf < D - 1:
                            scores = jnp.where(
                                iota_j2[:, :, None] <= tf, scores, _NEG
                            )
                    else:  # interpret mode: rolled loop, traced tf
                        scores = jnp.where(
                            iota_j2[:, :, None] <= tf, scores, _NEG
                        )

                idx0 = jnp.broadcast_to(iota_jf, scores.shape)
                val, dstar = _max_idx_tree(scores, idx0)     # (Ss, Bp)

                trans = la[:, :, None] + val[:, None, :]     # (s', s, b)
                sidx = jnp.broadcast_to(iota_sf, trans.shape)
                mu_t, phi = _max_idx_tree(trans, sidx)       # (Ss, Bp)

                ds_buf[slot, pl.ds(tf, 1)] = dstar[None]
                phi_buf[slot, pl.ds(tf, 1)] = phi[None]

                if ragged:
                    alive = (c * tc + tf) < ttf              # (1, Bp)
                    dfin = jnp.where(alive, val, dfin)
                    dsfin = jnp.where(alive, dstar, dsfin)
                else:
                    dfin, dsfin = val, dstar

                # Shift the rings: slot j ← slot j-1, slot 0 ← frame t.
                if D > 1:
                    mu_keep = mu_ref[pl.ds(0, D - 1)]
                    c_keep = c_ref[pl.ds(0, D - 1)]
                    mu_ref[pl.ds(1, D - 1)] = mu_keep
                    c_ref[pl.ds(1, D - 1)] = c_keep
                mu_ref[pl.ds(0, 1)] = mu_t[None]
                c_ref[pl.ds(0, 1)] = c_t[None]
                return (c_t, dfin, dsfin)

            return _frame_loop(0, n_frames, step, carry)

        def run_chunk(c, r_slot, carry, chunk0: bool, n_frames: int):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, r_slot + 1).start()

            slot = r_slot % 2
            in_dma(slot, r_slot).wait()

            @pl.when(r_slot >= 2)
            def _():
                ds_dma(slot, r_slot - 2).wait()
                phi_dma(slot, r_slot - 2).wait()

            carry = frames(c, slot, carry, chunk0, n_frames)
            ds_dma(slot, r_slot).start()
            phi_dma(slot, r_slot).start()
            return carry

        zero = jnp.zeros((Ss, Bp), jnp.float32)
        carry0 = (zero, jnp.full((Ss, Bp), _NEG, jnp.float32), zero)
        if n_chunks == 1:
            carry = run_chunk(0, 0, carry0, True, tail)
        else:
            carry = run_chunk(0, 0, carry0, True, tc)
            if n_chunks > 2:
                def chunk_body(c, carry):
                    return run_chunk(c, c, carry, False, tc)

                carry = jax.lax.fori_loop(
                    1, n_chunks - 1, chunk_body, carry
                )
            carry = run_chunk(
                n_chunks - 1, n_chunks - 1, carry, False, tail
            )
        _, dfin, dsfin = carry
        dfin_ref[:, :] = dfin
        dsfin_ref[:, :] = dsfin

        @pl.when(n_chunks >= 2)
        def _():
            ds_dma((n_chunks - 2) % 2, n_chunks - 2).wait()
            phi_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        ds_dma((n_chunks - 1) % 2, n_chunks - 1).wait()
        phi_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    pl.run_scoped(
        body,
        lo_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        ds_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        phi_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        mu_ref=pltpu.VMEM((Ds, Ss, Bp), jnp.float32),
        c_ref=pltpu.VMEM((Ds, Ss, Bp), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        ds_sems=pltpu.SemaphoreType.DMA((2,)),
        phi_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _hsmm_backtrace_kernel(
    dss_hbm,    # (Tp, Ss, Bp) HBM — dstar SHIFTED (row t holds frame t-1)
    phs_hbm,    # (Tp, Ss, Bp) HBM — phi SHIFTED
    dfin_ref,   # (Ss, Bp) VMEM — delta at each lane's final frame
    dsfin_ref,  # (Ss, Bp) VMEM — dstar at each lane's final frame
    tt_ref,     # (1, Bp) VMEM int32
    st_hbm,     # (Tp, Bp) HBM out — f32 state per frame
    score_ref,  # (1, Bp) VMEM out
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
    ragged: bool,
):
    Ss, Bp = dfin_ref.shape
    tc = t_chunk
    n_chunks = t_total // tc
    last_c = n_chunks - 1
    tail = t_true - last_c * tc
    iota = jax.lax.broadcasted_iota(jnp.int32, (Ss, Bp), 0).astype(
        jnp.float32
    )

    def body(ds_buf, phi_buf, st_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                dss_hbm.at[pl.ds(chunk * tc, tc)], ds_buf.at[slot],
                in_sems.at[2 * slot],
            )

        def in_dma_phi(slot, chunk):
            return pltpu.make_async_copy(
                phs_hbm.at[pl.ds(chunk * tc, tc)], phi_buf.at[slot],
                in_sems.at[2 * slot + 1],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                st_buf.at[slot], st_hbm.at[pl.ds(chunk * tc, tc)],
                out_sems.at[slot],
            )

        dfin = dfin_ref[:, :]
        best = _tree_max(dfin)[None, :]                    # (1, Bp)
        score_ref[:, :] = best
        # Lowest-index argmax (ties → smallest state), like jnp.argmax.
        state = _tree_max(
            jnp.where(dfin == best, -iota, float(-Ss))
        )[None, :] * -1.0                                  # (1, Bp)
        oh = (iota == state).astype(jnp.float32)           # (Ss, Bp)
        # Frames of the final segment at/below the final frame. dstar
        # values are ≥ 0 and oh is one-hot, so max == the selected value.
        left = _tree_max(dsfin_ref[:, :] * oh)[None, :] + 1.0
        ttf = tt_ref[:, :].astype(jnp.float32) if ragged else None

        in_dma(0, last_c).start()
        in_dma_phi(0, last_c).start()

        def frames(c, slot, carry, n_frames: int):
            def step(i, carry):
                oh, sval, left = carry
                tf = n_frames - 1 - i
                st_buf[slot, pl.ds(tf, 1)] = sval
                # Shifted tables: row tf holds frame (c*tc + tf - 1).
                phi_prev = phi_buf[slot, tf]               # (Ss, Bp)
                ds_prev = ds_buf[slot, tf]
                left_m1 = left - 1.0
                switch = left_m1 == 0.0                    # (1, Bp)
                s_prev = _tree_max(phi_prev * oh)[None, :]
                oh_prev = (iota == s_prev).astype(jnp.float32)
                d_prev = _tree_max(ds_prev * oh_prev)[None, :] + 1.0
                oh_new = jnp.where(switch, oh_prev, oh)
                s_new = jnp.where(switch, s_prev, sval)
                left_new = jnp.where(switch, d_prev, left_m1)
                if ragged:
                    pad = (c * tc + tf) >= ttf
                    oh_new = jnp.where(pad, oh, oh_new)
                    s_new = jnp.where(pad, sval, s_new)
                    left_new = jnp.where(pad, left, left_new)
                return (oh_new, s_new, left_new)

            return _frame_loop(0, n_frames, step, carry)

        def run_chunk(c, r_slot, carry, n_frames: int):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, last_c - r_slot - 1).start()
                in_dma_phi((r_slot + 1) % 2, last_c - r_slot - 1).start()

            slot = r_slot % 2
            in_dma(slot, last_c - r_slot).wait()
            in_dma_phi(slot, last_c - r_slot).wait()

            @pl.when(r_slot >= 2)
            def _():
                out_dma(slot, last_c - r_slot + 2).wait()

            carry = frames(c, slot, carry, n_frames)
            out_dma(slot, last_c - r_slot).start()
            return carry

        carry = (oh, state, left)
        if n_chunks == 1:
            run_chunk(0, 0, carry, tail)
        else:
            carry = run_chunk(last_c, 0, carry, tail)
            if n_chunks > 2:
                def chunk_body(r, carry):
                    return run_chunk(last_c - r, r, carry, tc)

                carry = jax.lax.fori_loop(1, n_chunks - 1, chunk_body,
                                          carry)
            run_chunk(0, last_c, carry, tc)

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((last_c - 1) % 2, 1).wait()

        out_dma(last_c % 2, 0).wait()

    pl.run_scoped(
        body,
        ds_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        phi_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        st_buf=pltpu.VMEM((2, t_chunk, Bp), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((4,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("t_chunk",))
def hsmm_smallk_viterbi(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    log_dur: jax.Array,
    lengths: Optional[jax.Array] = None,
    t_chunk: int = _T_CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """Exact batched HSMM Viterbi segmentation on the Pallas path.

    Args/returns match ``core.hsmm_viterbi``: ``(B, T, S)`` log-obs,
    ``(S, S)`` no-self-loop transitions, ``(S,)`` prior, ``(S, D)``
    duration log-pmf, optional ``(B,)`` lengths; returns
    ``(states (B, T) int32, score (B,))``. Paths and scores are
    identical to ``core.hsmm_viterbi`` (tie-breaks toward the lowest
    duration/state index; padded frames repeat each row's final valid
    state).
    """
    B, T, S = log_obs.shape
    D = log_dur.shape[-1]
    if not hsmm_smallk_supported(S, D, B):
        raise ValueError(
            f"hsmm_smallk_viterbi requires S <= {_MAX_S}, D <= {_MAX_D},"
            f" B <= {_MAX_B} (got S={S}, D={D}, B={B})"
        )
    Ss = _k_pad(S)
    Ds = _d_pad(D)
    Bp = _ceil_to(B, LANES)
    Tp = _ceil_to(T, t_chunk)

    # (B, T, S) -> (T, S, B). State padding is 0 (the per-state cumsum
    # must stay finite); padded states are suppressed through the -inf
    # padding of log_dur / log_a / log_pi instead.
    lo_t = jnp.transpose(log_obs.astype(jnp.float32), (1, 2, 0))
    lo_t = _pad_to(lo_t, Ss, 1, 0.0)
    lo_t = _pad_to(lo_t, Bp, 2, 0.0)
    lo_t = _pad_to(lo_t, Tp, 0, 0.0)

    la = jnp.maximum(log_a.astype(jnp.float32), _NEG)
    la = _pad_to(_pad_to(la, Ss, 0, _NEG), Ss, 1, _NEG)
    lpi = jnp.broadcast_to(
        _pad_to(log_pi.astype(jnp.float32), Ss, 0, _NEG)[:, None],
        (Ss, Bp),
    )
    ld = jnp.maximum(log_dur.astype(jnp.float32).T, _NEG)  # (D, S)
    ld = _pad_to(_pad_to(ld, Ds, 0, _NEG), Ss, 1, _NEG)
    if lengths is None:
        tt = jnp.full((1, Bp), T, jnp.int32)
    else:
        tt = _pad_to(lengths.astype(jnp.int32)[None, :], Bp, 1, T)

    dstar, phi, dfin, dsfin = pl.pallas_call(
        functools.partial(
            _hsmm_trellis_kernel,
            t_chunk=t_chunk,
            t_total=Tp,
            t_true=T,
            D=D,
            ragged=lengths is not None,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Ss, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Ss, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Ss, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Ss, Bp), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(lo_t, la, lpi, ld, tt)

    # The backtrace at frame t consumes the tables at frame t-1; shift
    # by one so the kernel reads aligned rows (row 0's duplicate is a
    # dummy — the t=0 update result is discarded, as in core).
    dss = jnp.concatenate([dstar[:1], dstar[:-1]], axis=0)
    phs = jnp.concatenate([phi[:1], phi[:-1]], axis=0)

    st, score = pl.pallas_call(
        functools.partial(
            _hsmm_backtrace_kernel,
            t_chunk=t_chunk,
            t_total=Tp,
            t_true=T,
            ragged=lengths is not None,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
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
            jax.ShapeDtypeStruct((Tp, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(dss, phs, dfin, dsfin, tt)

    states = st[:T, :B].T.astype(jnp.int32)
    return states, score[0, :B]


def _tree_sum(x):
    """Sum over axis 0 as a halving tree of whole-vreg adds."""
    w = x.shape[0]
    while w > 1:
        h = w // 2
        x = x[:h] + x[h:w]
        w = h
    return x[0]


def _lse0(x):
    """logsumexp over axis 0 (max-shifted; inputs are > -inf by _NEG
    clipping, so the shift never produces NaN)."""
    m = _tree_max(x)
    return m + jnp.log(_tree_sum(jnp.exp(x - m[None])))


def _hsmm_fsum_kernel(
    lo_hbm,     # (Tp, Ss, Bp) HBM — transposed log-obs
    la_ref,     # (Ss, Ss) VMEM — log_a[s', s], _NEG padded
    lpi_ref,    # (Ss, Bp) VMEM
    ld_ref,     # (Ds, Ss) VMEM — log_dur[j, s], _NEG padded
    al_hbm,     # (Tp, Ss, Bp) HBM out — log alpha* table
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
    D: int,
):
    """Sum-semiring twin of the Viterbi trellis: same VMEM ring
    buffers, logsumexp trees instead of max/argmax, alpha streaming out
    instead of backpointers."""
    Ss, Bp = lpi_ref.shape
    Ds = ld_ref.shape[0]
    tc = t_chunk
    n_chunks = t_total // tc
    tail = t_true - (n_chunks - 1) * tc

    def body(lo_buf, al_buf, mu_ref, c_ref, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(chunk * tc, tc)], lo_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                al_buf.at[slot], al_hbm.at[pl.ds(chunk * tc, tc)],
                out_sems.at[slot],
            )

        in_dma(0, 0).start()
        mu_ref[pl.ds(0, 1)] = lpi_ref[:, :][None]
        mu_ref[pl.ds(1, Ds - 1)] = jnp.full((Ds - 1, Ss, Bp), _NEG,
                                            jnp.float32)
        c_ref[:, :, :] = jnp.zeros((Ds, Ss, Bp), jnp.float32)
        la = la_ref[:, :]
        ld3 = ld_ref[:, :][:, :, None]

        def frames(slot, c_run, n_frames: int):
            def step(tf, c_run):
                lo_t = lo_buf[slot, tf]
                c_t = c_run + lo_t
                scores = (ld3 + (c_t[None] - c_ref[:, :, :])) \
                    + mu_ref[:, :, :]
                val = _lse0(scores)                       # (Ss, Bp)
                trans = la[:, :, None] + val[:, None, :]
                mu_t = _lse0(trans)
                al_buf[slot, pl.ds(tf, 1)] = val[None]
                if D > 1:
                    mu_ref[pl.ds(1, D - 1)] = mu_ref[pl.ds(0, D - 1)]
                    c_ref[pl.ds(1, D - 1)] = c_ref[pl.ds(0, D - 1)]
                mu_ref[pl.ds(0, 1)] = mu_t[None]
                c_ref[pl.ds(0, 1)] = c_t[None]
                return c_t

            return _frame_loop(0, n_frames, step, c_run)

        def run_chunk(r_slot, c_run, n_frames: int):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, r_slot + 1).start()

            slot = r_slot % 2
            in_dma(slot, r_slot).wait()

            @pl.when(r_slot >= 2)
            def _():
                out_dma(slot, r_slot - 2).wait()

            c_run = frames(slot, c_run, n_frames)
            out_dma(slot, r_slot).start()
            return c_run

        c0 = jnp.zeros((Ss, Bp), jnp.float32)
        if n_chunks == 1:
            run_chunk(0, c0, tail)
        else:
            c_run = run_chunk(0, c0, tc)
            if n_chunks > 2:
                c_run = jax.lax.fori_loop(
                    1, n_chunks - 1, lambda c, cr: run_chunk(c, cr, tc),
                    c_run,
                )
            run_chunk(n_chunks - 1, c_run, tail)

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    Ds = ld_ref.shape[0]
    pl.run_scoped(
        body,
        lo_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        al_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        mu_ref=pltpu.VMEM((Ds, Ss, Bp), jnp.float32),
        c_ref=pltpu.VMEM((Ds, Ss, Bp), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("t_chunk",))
def hsmm_smallk_forward(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    log_dur: jax.Array,
    lengths: Optional[jax.Array] = None,
    t_chunk: int = _T_CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """HSMM forward algorithm on the Pallas path: returns
    ``(log_alpha_star (B, T, S), log_z (B,))`` like
    ``core.hsmm_forward`` (values within lse-reassociation tolerance,
    ~1e-4). Alpha is causal, so ragged rows are exact in-range with no
    masking; ``log_z`` gathers each row's final valid frame."""
    B, T, S = log_obs.shape
    D = log_dur.shape[-1]
    if not hsmm_smallk_supported(S, D, B):
        raise ValueError(
            f"hsmm_smallk_forward requires S <= {_MAX_S}, D <= {_MAX_D},"
            f" B <= {_MAX_B} (got S={S}, D={D}, B={B})"
        )
    Ss = _k_pad(S)
    Ds = _d_pad(D)
    Bp = _ceil_to(B, LANES)
    Tp = _ceil_to(T, t_chunk)

    lo_t = jnp.transpose(log_obs.astype(jnp.float32), (1, 2, 0))
    lo_t = _pad_to(lo_t, Ss, 1, 0.0)
    lo_t = _pad_to(lo_t, Bp, 2, 0.0)
    lo_t = _pad_to(lo_t, Tp, 0, 0.0)
    la = jnp.maximum(log_a.astype(jnp.float32), _NEG)
    la = _pad_to(_pad_to(la, Ss, 0, _NEG), Ss, 1, _NEG)
    lpi = jnp.broadcast_to(
        _pad_to(log_pi.astype(jnp.float32), Ss, 0, _NEG)[:, None],
        (Ss, Bp),
    )
    ld = jnp.maximum(log_dur.astype(jnp.float32).T, _NEG)
    ld = _pad_to(_pad_to(ld, Ds, 0, _NEG), Ss, 1, _NEG)

    al = pl.pallas_call(
        functools.partial(
            _hsmm_fsum_kernel, t_chunk=t_chunk, t_total=Tp, t_true=T, D=D,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Tp, Ss, Bp), jnp.float32),
        interpret=_use_interpret(),
    )(lo_t, la, lpi, ld)

    log_alpha = jnp.transpose(al[:T, :S, :B], (2, 0, 1))  # (B, T, S)
    from ..core.semiring import logsumexp

    if lengths is None:
        fin = log_alpha[:, -1]
    else:
        idx = (lengths - 1).astype(jnp.int32)[:, None, None]
        fin = jnp.take_along_axis(
            log_alpha, jnp.broadcast_to(idx, (B, 1, S)), axis=1
        )[:, 0]
    return log_alpha, logsumexp(fin, axis=-1)


def _hsmm_bsum_kernel(
    lo_hbm,     # (Tp, Ss, Bp) HBM
    lat_ref,    # (Ss, Ss) VMEM — log_a TRANSPOSED: lat[s', s] = la[s, s']
    ld_ref,     # (Ds, Ss) VMEM
    tt_ref,     # (1, Bp) VMEM int32 — per-lane true length
    bs_hbm,     # (Tp, Ss, Bp) HBM out — log beta*
    bt_hbm,     # (Tp, Ss, Bp) HBM out — log beta_start
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
    D: int,
    ragged: bool,
):
    """Sum-semiring reverse scan (mirrors ``core.hsmm_backward``): the
    ``w(t) = beta*(t) − C(t+1)`` ring rides VMEM; beta*/beta_start
    stream out behind the compute."""
    Ss, Bp = lat_ref.shape[0], lo_hbm.shape[2]
    Ds = ld_ref.shape[0]
    tc = t_chunk
    n_chunks = t_total // tc
    last_c = n_chunks - 1
    tail = t_true - last_c * tc

    def body(lo_buf, bs_buf, bt_buf, w_ref, in_sems, bs_sems, bt_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(chunk * tc, tc)], lo_buf.at[slot],
                in_sems.at[slot],
            )

        def bs_dma(slot, chunk):
            return pltpu.make_async_copy(
                bs_buf.at[slot], bs_hbm.at[pl.ds(chunk * tc, tc)],
                bs_sems.at[slot],
            )

        def bt_dma(slot, chunk):
            return pltpu.make_async_copy(
                bt_buf.at[slot], bt_hbm.at[pl.ds(chunk * tc, tc)],
                bt_sems.at[slot],
            )

        in_dma(0, last_c).start()
        w_ref[:, :, :] = jnp.full((Ds, Ss, Bp), _NEG, jnp.float32)
        lat = lat_ref[:, :]
        ld3 = ld_ref[:, :][:, :, None]
        iota_j2 = jax.lax.broadcasted_iota(jnp.int32, (Ds, Ss), 0)
        ttf = tt_ref[:, :] if ragged else None

        def frames(c, slot, carry, n_frames: int):
            def step(i, carry):
                bn, c_next = carry
                tf = n_frames - 1 - i
                t = c * tc + tf
                lo_t = lo_buf[slot, tf]
                c_t = c_next + lo_t                     # suffix sum C(t)
                tmp = lat[:, :, None] + bn[:, None, :]  # (s', s, b)
                bs_next = _lse0(tmp)
                if ragged:
                    is_fin = (t == (ttf - 1))           # (1, Bp)
                    beta_star = jnp.where(is_fin, 0.0, bs_next)
                elif isinstance(t, int) and t == t_true - 1:
                    beta_star = jnp.zeros((Ss, Bp), jnp.float32)
                elif isinstance(t, int):
                    beta_star = bs_next
                else:  # interpret mode: traced frame index
                    beta_star = jnp.where(t == t_true - 1, 0.0, bs_next)
                w_t = beta_star - c_next
                if D > 1:
                    w_ref[pl.ds(1, D - 1)] = w_ref[pl.ds(0, D - 1)]
                w_ref[pl.ds(0, 1)] = w_t[None]

                scores = ld3 + w_ref[:, :, :]
                # Segments must end by each row's final frame:
                # j <= t_fin - t. Non-ragged: static skip when every
                # duration fits (t + D <= t_true).
                if ragged:
                    scores = jnp.where(
                        iota_j2[:, :, None]
                        <= ((ttf - 1) - t)[None, :, :],
                        scores, _NEG,
                    )
                elif isinstance(t, int):
                    if t > t_true - D:
                        scores = jnp.where(
                            iota_j2[:, :, None] <= (t_true - 1 - t),
                            scores, _NEG,
                        )
                else:
                    scores = jnp.where(
                        iota_j2[:, :, None] <= (t_true - 1 - t),
                        scores, _NEG,
                    )
                bstart = c_t + _lse0(scores)
                bs_buf[slot, pl.ds(tf, 1)] = beta_star[None]
                bt_buf[slot, pl.ds(tf, 1)] = bstart[None]
                return (bstart, c_t)

            return _frame_loop(0, n_frames, step, carry)

        def run_chunk(c, r_slot, carry, n_frames: int):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, last_c - r_slot - 1).start()

            slot = r_slot % 2
            in_dma(slot, last_c - r_slot).wait()

            @pl.when(r_slot >= 2)
            def _():
                bs_dma(slot, last_c - r_slot + 2).wait()
                bt_dma(slot, last_c - r_slot + 2).wait()

            carry = frames(c, slot, carry, n_frames)
            bs_dma(slot, last_c - r_slot).start()
            bt_dma(slot, last_c - r_slot).start()
            return carry

        carry0 = (
            jnp.full((Ss, Bp), _NEG, jnp.float32),   # bstart(T) = -inf
            jnp.zeros((Ss, Bp), jnp.float32),        # C(T) = 0
        )
        if n_chunks == 1:
            run_chunk(0, 0, carry0, tail)
        else:
            carry = run_chunk(last_c, 0, carry0, tail)
            if n_chunks > 2:
                carry = jax.lax.fori_loop(
                    1, n_chunks - 1,
                    lambda r, cr: run_chunk(last_c - r, r, cr, tc),
                    carry,
                )
            run_chunk(0, last_c, carry, tc)

        @pl.when(n_chunks >= 2)
        def _():
            bs_dma((last_c - 1) % 2, 1).wait()
            bt_dma((last_c - 1) % 2, 1).wait()

        bs_dma(last_c % 2, 0).wait()
        bt_dma(last_c % 2, 0).wait()

    Ds = ld_ref.shape[0]
    Ss = lat_ref.shape[0]
    Bp = lo_hbm.shape[2]
    pl.run_scoped(
        body,
        lo_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        bs_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        bt_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        w_ref=pltpu.VMEM((Ds, Ss, Bp), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        bs_sems=pltpu.SemaphoreType.DMA((2,)),
        bt_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("t_chunk",))
def hsmm_smallk_backward(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_dur: jax.Array,
    lengths: Optional[jax.Array] = None,
    t_chunk: int = _T_CHUNK,
) -> Tuple[jax.Array, jax.Array]:
    """HSMM backward pass on the Pallas path: returns
    ``(log_beta_star, log_beta_start)`` like ``core.hsmm_backward``
    (within lse-reassociation tolerance). Padded frames of ragged rows
    are zeroed before the suffix sums, matching core's bitwise
    pad-invariance."""
    B, T, S = log_obs.shape
    D = log_dur.shape[-1]
    if not hsmm_smallk_supported(S, D, B):
        raise ValueError(
            f"hsmm_smallk_backward requires S <= {_MAX_S}, D <= {_MAX_D},"
            f" B <= {_MAX_B} (got S={S}, D={D}, B={B})"
        )
    Ss = _k_pad(S)
    Ds = _d_pad(D)
    Bp = _ceil_to(B, LANES)
    Tp = _ceil_to(T, t_chunk)

    lo = log_obs.astype(jnp.float32)
    if lengths is not None:
        lo = jnp.where(
            jnp.arange(T)[None, :, None] < lengths[:, None, None], lo, 0.0
        )
    lo_t = jnp.transpose(lo, (1, 2, 0))
    lo_t = _pad_to(lo_t, Ss, 1, 0.0)
    lo_t = _pad_to(lo_t, Bp, 2, 0.0)
    lo_t = _pad_to(lo_t, Tp, 0, 0.0)
    la = jnp.maximum(log_a.astype(jnp.float32), _NEG)
    lat = _pad_to(_pad_to(la.T, Ss, 0, _NEG), Ss, 1, _NEG)
    ld = jnp.maximum(log_dur.astype(jnp.float32).T, _NEG)
    ld = _pad_to(_pad_to(ld, Ds, 0, _NEG), Ss, 1, _NEG)
    if lengths is None:
        tt = jnp.full((1, Bp), T, jnp.int32)
    else:
        tt = _pad_to(lengths.astype(jnp.int32)[None, :], Bp, 1, T)

    bs, bt = pl.pallas_call(
        functools.partial(
            _hsmm_bsum_kernel, t_chunk=t_chunk, t_total=Tp, t_true=T,
            D=D, ragged=lengths is not None,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Ss, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Ss, Bp), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(lo_t, lat, ld, tt)

    log_bstar = jnp.transpose(bs[:T, :S, :B], (2, 0, 1))
    log_bstart = jnp.transpose(bt[:T, :S, :B], (2, 0, 1))
    return log_bstar, log_bstart


# ---------------------------------------------------------------------------
# Fused HSMM forward+backward (sum semiring): both chains, one program
# ---------------------------------------------------------------------------
#
# The posterior path (``auto_hsmm_posteriors`` → HSMMLayer training, EM)
# runs the forward and backward sum kernels sequentially: 0.271 +
# 0.200 ms at (B=32, T=1000, S=10, D=20). The chains are independent,
# so this kernel interleaves them per frame exactly like ``ops/fbsum.py``
# — forward walks chunk j ascending while backward walks chunk
# n−1−j descending; each unrolled frame step advances BOTH recursions
# (each with its own VMEM duration ring). In-place staging bounds VMEM:
# alpha* overwrites the forward stream's dead lo rows, beta* the
# backward's; only beta_start needs its own double buffer.
#
# Measured: 0.471 → 0.432 ms (1.09×) — unlike the plain-HMM chains
# (which fused for free), the HSMM per-step body is THROUGHPUT-bound
# on its (Ds, Ss, Bp) duration-ring vreg ops, so interleaving buys the
# dispatch gap and little more; kept because the parity is exact, the
# posterior path drops 0.563 → 0.521 ms, and one launch replaces two.
# Unragged only — ragged batches keep the separate kernels.

def _hsmm_fbsum_kernel(
    lo_hbm,     # (Tp, Ss, Bp) HBM — transposed log-obs
    la_ref,     # (Ss, Ss) VMEM — log_a[s', s]
    lat_ref,    # (Ss, Ss) VMEM — log_a transposed
    lpi_ref,    # (Ss, Bp) VMEM
    ld_ref,     # (Ds, Ss) VMEM
    al_hbm,     # (Tp, Ss, Bp) HBM out — log alpha*
    bs_hbm,     # (Tp, Ss, Bp) HBM out — log beta*
    bt_hbm,     # (Tp, Ss, Bp) HBM out — log beta_start
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
    D: int,
):
    Ss, Bp = lpi_ref.shape
    Ds = ld_ref.shape[0]
    tc = t_chunk
    n_chunks = t_total // tc
    last_c = n_chunks - 1

    def body(lof_buf, lob_buf, bt_buf, mu_ref, cf_ref, w_ref,
             inf_sems, inb_sems, alo_sems, bso_sems, bto_sems):
        def in_f(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(chunk * tc, tc)], lof_buf.at[slot],
                inf_sems.at[slot])

        def in_b(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[pl.ds(chunk * tc, tc)], lob_buf.at[slot],
                inb_sems.at[slot])

        def out_a(slot, chunk):
            return pltpu.make_async_copy(
                lof_buf.at[slot], al_hbm.at[pl.ds(chunk * tc, tc)],
                alo_sems.at[slot])

        def out_bs(slot, chunk):
            return pltpu.make_async_copy(
                lob_buf.at[slot], bs_hbm.at[pl.ds(chunk * tc, tc)],
                bso_sems.at[slot])

        def out_bt(slot, chunk):
            return pltpu.make_async_copy(
                bt_buf.at[slot], bt_hbm.at[pl.ds(chunk * tc, tc)],
                bto_sems.at[slot])

        in_f(0, 0).start()
        in_b(0, last_c).start()
        mu_ref[pl.ds(0, 1)] = lpi_ref[:, :][None]
        mu_ref[pl.ds(1, Ds - 1)] = jnp.full((Ds - 1, Ss, Bp), _NEG,
                                            jnp.float32)
        cf_ref[:, :, :] = jnp.zeros((Ds, Ss, Bp), jnp.float32)
        w_ref[:, :, :] = jnp.full((Ds, Ss, Bp), _NEG, jnp.float32)
        la = la_ref[:, :]
        lat = lat_ref[:, :]
        ld3 = ld_ref[:, :][:, :, None]
        iota_j2 = jax.lax.broadcasted_iota(jnp.int32, (Ds, Ss), 0)

        def frames(j, slot, carry, n_frames: int):
            cb = last_c - j

            def step(tf, carry):
                cf_run, b_carry = carry
                # ---- forward frame j·tc + tf (fsum body) -----------
                lo_f = lof_buf[slot, tf]
                c_t = cf_run + lo_f
                scores_f = (ld3 + (c_t[None] - cf_ref[:, :, :])) \
                    + mu_ref[:, :, :]
                val = _lse0(scores_f)
                trans = la[:, :, None] + val[:, None, :]
                mu_t = _lse0(trans)
                lof_buf[slot, pl.ds(tf, 1)] = val[None]
                if D > 1:
                    mu_ref[pl.ds(1, D - 1)] = mu_ref[pl.ds(0, D - 1)]
                    cf_ref[pl.ds(1, D - 1)] = cf_ref[pl.ds(0, D - 1)]
                mu_ref[pl.ds(0, 1)] = mu_t[None]
                cf_ref[pl.ds(0, 1)] = c_t[None]

                # ---- backward frame cb·tc + (tc−1−tf) (bsum body) --
                bn, c_next = b_carry
                tb = n_frames - 1 - tf
                t_g = cb * tc + tb
                lo_b = lob_buf[slot, tb]
                c_tb = c_next + lo_b
                tmp = lat[:, :, None] + bn[:, None, :]
                bs_next = _lse0(tmp)
                if isinstance(t_g, int):
                    if t_g == t_true - 1:
                        beta_star = jnp.zeros((Ss, Bp), jnp.float32)
                    else:
                        beta_star = bs_next
                else:
                    beta_star = jnp.where(t_g == t_true - 1, 0.0, bs_next)
                w_t = beta_star - c_next
                if D > 1:
                    w_ref[pl.ds(1, D - 1)] = w_ref[pl.ds(0, D - 1)]
                w_ref[pl.ds(0, 1)] = w_t[None]
                scores_b = ld3 + w_ref[:, :, :]
                if isinstance(t_g, int):
                    if t_g > t_true - D:
                        scores_b = jnp.where(
                            iota_j2[:, :, None] <= (t_true - 1 - t_g),
                            scores_b, _NEG,
                        )
                else:
                    scores_b = jnp.where(
                        iota_j2[:, :, None] <= (t_true - 1 - t_g),
                        scores_b, _NEG,
                    )
                bstart = c_tb + _lse0(scores_b)
                lob_buf[slot, pl.ds(tb, 1)] = beta_star[None]
                bt_buf[slot, pl.ds(tb, 1)] = bstart[None]
                return c_t, (bstart, c_tb)

            return _frame_loop(0, n_frames, step, carry)

        def run_chunk(j, r_slot, carry, n_frames: int):
            slot = r_slot % 2
            in_f(slot, j).wait()
            in_b(slot, last_c - j).wait()

            carry = frames(j, slot, carry, n_frames)

            # Late prefetch: previous slot's out-DMAs drained behind the
            # serial chain (same discipline as pallas_fb_prob).
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                nslot = (r_slot + 1) % 2

                @pl.when(r_slot >= 1)
                def _():
                    out_a(nslot, j - 1).wait()
                    out_bs(nslot, last_c - j + 1).wait()
                    out_bt(nslot, last_c - j + 1).wait()

                in_f(nslot, j + 1).start()
                in_b(nslot, last_c - j - 1).start()

            out_a(slot, j).start()
            out_bs(slot, last_c - j).start()
            out_bt(slot, last_c - j).start()
            return carry

        carry0 = (
            jnp.zeros((Ss, Bp), jnp.float32),          # fwd c_run
            (jnp.full((Ss, Bp), _NEG, jnp.float32),    # bwd bstart(T)
             jnp.zeros((Ss, Bp), jnp.float32)),        # bwd C(T)
        )
        if n_chunks == 1:
            run_chunk(0, 0, carry0, tc)
        else:
            carry = run_chunk(0, 0, carry0, tc)
            if n_chunks > 2:
                carry = jax.lax.fori_loop(
                    1, n_chunks - 1,
                    lambda r, cr: run_chunk(r, r, cr, tc),
                    carry,
                )
            run_chunk(last_c, last_c, carry, tc)

        @pl.when(n_chunks >= 2)
        def _():
            out_a((last_c - 1) % 2, last_c - 1).wait()
            out_bs((last_c - 1) % 2, 1).wait()
            out_bt((last_c - 1) % 2, 1).wait()

        out_a(last_c % 2, last_c).wait()
        out_bs(last_c % 2, 0).wait()
        out_bt(last_c % 2, 0).wait()

    pl.run_scoped(
        body,
        lof_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        lob_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        bt_buf=pltpu.VMEM((2, t_chunk, Ss, Bp), jnp.float32),
        mu_ref=pltpu.VMEM((Ds, Ss, Bp), jnp.float32),
        cf_ref=pltpu.VMEM((Ds, Ss, Bp), jnp.float32),
        w_ref=pltpu.VMEM((Ds, Ss, Bp), jnp.float32),
        inf_sems=pltpu.SemaphoreType.DMA((2,)),
        inb_sems=pltpu.SemaphoreType.DMA((2,)),
        alo_sems=pltpu.SemaphoreType.DMA((2,)),
        bso_sems=pltpu.SemaphoreType.DMA((2,)),
        bto_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("t_chunk",))
def hsmm_smallk_fb(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    log_dur: jax.Array,
    t_chunk: int = _T_CHUNK,
):
    """Fused HSMM forward+backward: ``(log_alpha_star, log_z,
    log_beta_star, log_beta_start)`` in one kernel pass (values within
    lse-reassociation tolerance of the separate kernels). Unragged
    only."""
    B, T, S = log_obs.shape
    D = log_dur.shape[-1]
    if not hsmm_smallk_fb_supported(S, D, B):
        raise ValueError(
            f"hsmm_smallk_fb requires S <= {_MAX_S}, D <= {_MAX_D},"
            f" B <= {_MAX_B} and the fused kernel's 3-ring VMEM "
            f"envelope (got S={S}, D={D}, B={B}); use the separate "
            f"hsmm_smallk_forward/backward kernels instead"
        )
    Ss = _k_pad(S)
    Ds = _d_pad(D)
    Bp = _ceil_to(B, LANES)
    Tp = _ceil_to(T, t_chunk)

    lo_t = jnp.transpose(log_obs.astype(jnp.float32), (1, 2, 0))
    lo_t = _pad_to(lo_t, Ss, 1, 0.0)
    lo_t = _pad_to(lo_t, Bp, 2, 0.0)
    lo_t = _pad_to(lo_t, Tp, 0, 0.0)
    la = jnp.maximum(log_a.astype(jnp.float32), _NEG)
    la = _pad_to(_pad_to(la, Ss, 0, _NEG), Ss, 1, _NEG)
    lat = jnp.swapaxes(la, 0, 1)
    lpi = jnp.broadcast_to(
        _pad_to(log_pi.astype(jnp.float32), Ss, 0, _NEG)[:, None],
        (Ss, Bp),
    )
    ld = jnp.maximum(log_dur.astype(jnp.float32).T, _NEG)
    ld = _pad_to(_pad_to(ld, Ds, 0, _NEG), Ss, 1, _NEG)

    al, bs, bt = pl.pallas_call(
        functools.partial(
            _hsmm_fbsum_kernel, t_chunk=t_chunk, t_total=Tp, t_true=T,
            D=D,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Ss, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Ss, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Ss, Bp), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(lo_t, la, lat, lpi, ld)

    from ..core.semiring import logsumexp

    log_alpha = jnp.transpose(al[:T, :S, :B], (2, 0, 1))
    log_bstar = jnp.transpose(bs[:T, :S, :B], (2, 0, 1))
    log_bstart = jnp.transpose(bt[:T, :S, :B], (2, 0, 1))
    return (
        log_alpha, logsumexp(log_alpha[:, -1], axis=-1),
        log_bstar, log_bstart,
    )
