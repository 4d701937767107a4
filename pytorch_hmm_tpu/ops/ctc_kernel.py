"""Pallas banded-lattice scans for CTC.

The CTC forward/backward recursions run on the expanded 2U+1 label
lattice whose transition structure is a fixed 3-diagonal band
(stay / advance / skip). The XLA scan costs ~21 µs per frame at
(B=16, U=50): each step is a dozen tiny ops plus a dynamic HBM slice
of the gathered emission table. These kernels run the whole lattice
recursion in one Pallas program:

* **batch rides SUBLANES, lattice positions ride LANES** — the band
  shifts are single cyclic lane rolls with a static edge mask, the
  3-term logsumexp is a handful of whole-vreg ops;
* gathered emissions ``lp[b, t, s] = log_probs[t, b, label[s]]`` stream
  HBM→VMEM double-buffered; the alpha/beta tables stream back out
  behind the compute;
* per-row input lengths freeze each batch row at its end (forward) or
  pin the terminal betas (backward), matching the XLA scans exactly.

The kernels are label-agnostic: the wrapper (``alignment/ctc.py``)
prepares the expanded targets, skip masks, and boundary rows, so the
same kernels serve loss, posteriors, and the gradient's custom VJP.

Replaces (performance-wise) the reference's delegation to
``nn.CTCLoss`` (``ctc.py:283``) — here the lattice runs on our own
TPU kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import LANES, SUBLANES, _NEG, _ceil_to, _pad_to, _use_interpret
from .smallk import _frame_loop

__all__ = [
    "ctc_lattice_forward",
    "ctc_lattice_backward",
    "ctc_lattice_supported",
    "ctc_lattice_viterbi",
    "ctc_viterbi_kernel_supported",
    "ctc_lattice_viterbi_wide",
    "ctc_viterbi_wide_supported",
]

_MAX_S = 512   # lattice lanes (multi-tile rolls verified exact on hw)
_MAX_S_WIDE = 2048  # 2-D lattice layout (sublanes x lanes), 1 row/program
_MAX_B = 256
_T_CHUNK = 128
# 2 double-buffered (tc, Bs, Sp) streams must fit VMEM with headroom.
_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_ctc_b_tile(batch: int, Sp: int) -> Optional[int]:
    """Largest batch tile whose double buffers fit the VMEM budget.
    Large lattices ride a smaller batch tile (grid over batch groups),
    so S up to _MAX_S works at any batch — at S=512 the tile is 8."""
    for bt in (32, 16, 8):
        if 2 * 2 * _T_CHUNK * bt * Sp * 4 <= _VMEM_BUDGET:
            return bt
    return None


def ctc_lattice_supported(lattice_size: int, batch: int) -> bool:
    if batch > _MAX_B:
        return False
    if lattice_size > _MAX_S:
        # Wide path: 2-D lattice layout, one batch row per program.
        return lattice_size <= _MAX_S_WIDE
    Sp = _ceil_to(lattice_size, LANES)
    return _pick_ctc_b_tile(batch, Sp) is not None


def _use_wide(lattice_size: int, batch: int) -> bool:
    return (
        lattice_size > _MAX_S
        or _pick_ctc_b_tile(batch, _ceil_to(lattice_size, LANES)) is None
    )


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(
        jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m)
    )


def _ctc_fwd_kernel(
    lp_hbm,     # (Tp, Bs, Sp) HBM — gathered emissions
    skip_ref,   # (Bs, Sp) VMEM — 0 where skip allowed, _NEG where not
    vmask_ref,  # (Bs, Sp) VMEM — 0 at valid lattice positions, _NEG past
    a0_ref,     # (Bs, Sp) VMEM — alpha at frame 0
    tt_ref,     # (Bs, 1) VMEM int32 — per-row input length
    al_hbm,     # (Tp, Bs, Sp) HBM out — alpha table
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
):
    Bs, Sp = a0_ref.shape
    tc = t_chunk
    n_chunks = t_total // tc
    tail = t_true - (n_chunks - 1) * tc
    b0 = pl.program_id(0) * Bs
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (Bs, Sp), 1)
    edge1 = iota_l >= 1
    edge2 = iota_l >= 2

    def body(lp_buf, al_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lp_hbm.at[pl.ds(chunk * tc, tc), pl.ds(b0, Bs)],
                lp_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                al_buf.at[slot],
                al_hbm.at[pl.ds(chunk * tc, tc), pl.ds(b0, Bs)],
                out_sems.at[slot],
            )

        in_dma(0, 0).start()
        skip_add = skip_ref[:, :]
        vmask = vmask_ref[:, :]
        tt = tt_ref[:, :]

        def frames(c, slot, a, first: bool, n_frames: int):
            def step(tf, a):
                if first and isinstance(tf, int) and tf == 0:
                    # t < tt freeze at frame 0 (zero-length rows keep
                    # the _NEG init), matching interpret mode.
                    a = jnp.where(0 < tt, a0_ref[:, :], a)
                    al_buf[slot, pl.ds(0, 1)] = a[None]
                    return a
                lp_t = lp_buf[slot, tf]
                adv = jnp.where(
                    edge1, pltpu.roll(a, 1, axis=1), _NEG
                )
                skip = jnp.where(
                    edge2, pltpu.roll(a, 2, axis=1), _NEG
                ) + skip_add
                nxt = (lp_t + _lse3(a, adv, skip)) + vmask
                t = c * tc + tf
                if first and not isinstance(tf, int):
                    # interpret mode: the rolled loop visits tf == 0 too
                    nxt = jnp.where(t == 0, a0_ref[:, :], nxt)
                nxt = jnp.where(t < tt, nxt, a)
                al_buf[slot, pl.ds(tf, 1)] = nxt[None]
                return nxt

            return _frame_loop(0, n_frames, step, a)

        def run_chunk(c, r_slot, a, first: bool, n_frames: int):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, r_slot + 1).start()

            slot = r_slot % 2
            in_dma(slot, r_slot).wait()

            @pl.when(r_slot >= 2)
            def _():
                out_dma(slot, r_slot - 2).wait()

            a = frames(c, slot, a, first, n_frames)
            out_dma(slot, r_slot).start()
            return a

        a = jnp.full((Bs, Sp), _NEG, jnp.float32)
        if n_chunks == 1:
            run_chunk(0, 0, a, True, tail)
        else:
            a = run_chunk(0, 0, a, True, tc)
            if n_chunks > 2:
                a = jax.lax.fori_loop(
                    1, n_chunks - 1,
                    lambda c, a: run_chunk(c, c, a, False, tc), a,
                )
            run_chunk(n_chunks - 1, n_chunks - 1, a, False, tail)

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    pl.run_scoped(
        body,
        lp_buf=pltpu.VMEM((2, t_chunk, Bs, Sp), jnp.float32),
        al_buf=pltpu.VMEM((2, t_chunk, Bs, Sp), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _ctc_bwd_kernel(
    lpn_hbm,    # (Tp, Bs, Sp) HBM — emissions SHIFTED: row t holds lp[t+1]
    skipf_ref,  # (Bs, Sp) VMEM — 0 where a skip may LEAVE s, _NEG where not
    vmask_ref,  # (Bs, Sp) VMEM
    bT_ref,     # (Bs, Sp) VMEM — terminal beta rows
    tt_ref,     # (Bs, 1) VMEM int32
    be_hbm,     # (Tp, Bs, Sp) HBM out — beta table
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
):
    Bs, Sp = bT_ref.shape
    tc = t_chunk
    n_chunks = t_total // tc
    last_c = n_chunks - 1
    tail = t_true - last_c * tc
    b0 = pl.program_id(0) * Bs
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (Bs, Sp), 1)
    edgeb1 = iota_l < Sp - 1
    edgeb2 = iota_l < Sp - 2

    def body(lp_buf, be_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lpn_hbm.at[pl.ds(chunk * tc, tc), pl.ds(b0, Bs)],
                lp_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                be_buf.at[slot],
                be_hbm.at[pl.ds(chunk * tc, tc), pl.ds(b0, Bs)],
                out_sems.at[slot],
            )

        in_dma(0, last_c).start()
        skipf = skipf_ref[:, :]
        vmask = vmask_ref[:, :]
        bT = bT_ref[:, :]
        tt = tt_ref[:, :]

        def frames(c, slot, b, n_frames: int):
            def step(i, b):
                tf = n_frames - 1 - i
                t = c * tc + tf
                msg = b + lp_buf[slot, tf]        # beta(t+1) + lp(t+1)
                adv = jnp.where(
                    edgeb1, pltpu.roll(msg, Sp - 1, axis=1), _NEG
                )
                skip = jnp.where(
                    edgeb2, pltpu.roll(msg, Sp - 2, axis=1), _NEG
                ) + skipf
                nxt = _lse3(msg, adv, skip) + vmask
                # Frames whose successor is at/after the row's end keep
                # the terminal beta (core convention).
                nxt = jnp.where(t + 1 < tt, nxt, bT)
                be_buf[slot, pl.ds(tf, 1)] = nxt[None]
                return nxt

            return _frame_loop(0, n_frames, step, b)

        def run_chunk(c, r_slot, b, n_frames: int):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, last_c - r_slot - 1).start()

            slot = r_slot % 2
            in_dma(slot, last_c - r_slot).wait()

            @pl.when(r_slot >= 2)
            def _():
                out_dma(slot, last_c - r_slot + 2).wait()

            b = frames(c, slot, b, n_frames)
            out_dma(slot, last_c - r_slot).start()
            return b

        b = bT
        if n_chunks == 1:
            run_chunk(0, 0, b, tail)
        else:
            b = run_chunk(last_c, 0, b, tail)
            if n_chunks > 2:
                b = jax.lax.fori_loop(
                    1, n_chunks - 1,
                    lambda r, b: run_chunk(last_c - r, r, b, tc), b,
                )
            run_chunk(0, last_c, b, tc)

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((last_c - 1) % 2, 1).wait()

        out_dma(last_c % 2, 0).wait()

    pl.run_scoped(
        body,
        lp_buf=pltpu.VMEM((2, t_chunk, Bs, Sp), jnp.float32),
        be_buf=pltpu.VMEM((2, t_chunk, Bs, Sp), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _prep(x, Bs, Sp, fill):
    return _pad_to(_pad_to(x.astype(jnp.float32), Bs, 0, fill), Sp, 1, fill)


# ---------------------------------------------------------------------------
# Wide lattices (S up to 2048): 2-D lattice layout, one row per program
# ---------------------------------------------------------------------------
#
# The lane layout above needs tc×8×Sp×4-byte double buffers (batch tile
# minimum 8 sublanes), capping Sp at ~640 under the VMEM budget. For
# larger label counts the lattice itself becomes the 2-D vreg tile —
# positions p = r·128 + l ride (sublanes r, lanes l), one batch row per
# grid program — so the buffers are tc×(Sp/128)×128×4 bytes and S=2048
# costs ~4 MB. Band shifts cross sublane boundaries with one extra
# sublane roll selected on the lane edge.


def _wide_shift_fwd(a, riota, liota, k):
    """a[p] -> a[p-k] over the 2-D layout (k in {1, 2}); _NEG below p=k."""
    al = pltpu.roll(a, k, axis=1)                # [r, l] = a[r, l-k]
    wrap = pltpu.roll(al, 1, axis=0)             # [r, l] = a[r-1, 128+l-k]
    out = jnp.where(liota < k, wrap, al)
    return jnp.where(riota * LANES + liota >= k, out, _NEG)


def _wide_shift_bwd(m, riota, liota, k, Sp):
    """m[p] -> m[p+k] (k in {1, 2}); _NEG at p >= Sp-k."""
    ml = pltpu.roll(m, LANES - k, axis=1)        # [r, l] = m[r, l+k]
    R = m.shape[0]
    wrap = pltpu.roll(ml, R - 1, axis=0)         # [r, l] = m[r+1, l+k-128]
    out = jnp.where(liota >= LANES - k, wrap, ml)
    return jnp.where(riota * LANES + liota < Sp - k, out, _NEG)


def _ctc_fwd_wide_kernel(
    lp_hbm,     # (B, Tp, R, 128) HBM — gathered emissions
    skip_ref,   # (1, R, 128) VMEM
    vmask_ref,  # (1, R, 128) VMEM
    a0_ref,     # (1, R, 128) VMEM
    tt_ref,     # (B, 1) SMEM int32 — full array, indexed by program
    al_hbm,     # (B, Tp, R, 128) HBM out
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
):
    _, R, L = skip_ref.shape
    tc = t_chunk
    n_chunks = t_total // tc
    tail = t_true - (n_chunks - 1) * tc
    b = pl.program_id(0)
    riota = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)

    def body(lp_buf, al_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lp_hbm.at[b, pl.ds(chunk * tc, tc)], lp_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                al_buf.at[slot], al_hbm.at[b, pl.ds(chunk * tc, tc)],
                out_sems.at[slot],
            )

        in_dma(0, 0).start()
        skip_add = skip_ref[0]
        vmask = vmask_ref[0]
        tt = tt_ref[b, 0]  # scalar from SMEM

        def frames(c, slot, a, first: bool, n_frames: int):
            def step(tf, a):
                if first and isinstance(tf, int) and tf == 0:
                    # Same t < tt freeze as the traced branch below, so
                    # zero-length rows keep the _NEG init on hardware
                    # exactly as they do in interpret mode.
                    a = jnp.where(0 < tt, a0_ref[0], a)
                    al_buf[slot, pl.ds(0, 1)] = a[None]
                    return a
                lp_t = lp_buf[slot, tf]
                adv = _wide_shift_fwd(a, riota, liota, 1)
                skip = _wide_shift_fwd(a, riota, liota, 2) + skip_add
                nxt = (lp_t + _lse3(a, adv, skip)) + vmask
                t = c * tc + tf
                if first and not isinstance(tf, int):
                    nxt = jnp.where(t == 0, a0_ref[0], nxt)
                nxt = jnp.where(t < tt, nxt, a)
                al_buf[slot, pl.ds(tf, 1)] = nxt[None]
                return nxt

            return _frame_loop(0, n_frames, step, a)

        def run_chunk(c, r_slot, a, first: bool, n_frames: int):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, r_slot + 1).start()

            slot = r_slot % 2
            in_dma(slot, r_slot).wait()

            @pl.when(r_slot >= 2)
            def _():
                out_dma(slot, r_slot - 2).wait()

            a = frames(c, slot, a, first, n_frames)
            out_dma(slot, r_slot).start()
            return a

        a = jnp.full((R, L), _NEG, jnp.float32)
        if n_chunks == 1:
            run_chunk(0, 0, a, True, tail)
        else:
            a = run_chunk(0, 0, a, True, tc)
            if n_chunks > 2:
                a = jax.lax.fori_loop(
                    1, n_chunks - 1,
                    lambda c, a: run_chunk(c, c, a, False, tc), a,
                )
            run_chunk(n_chunks - 1, n_chunks - 1, a, False, tail)

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    pl.run_scoped(
        body,
        lp_buf=pltpu.VMEM((2, t_chunk, R, L), jnp.float32),
        al_buf=pltpu.VMEM((2, t_chunk, R, L), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _ctc_bwd_wide_kernel(
    lpn_hbm,    # (B, Tp, R, 128) HBM — emissions shifted one frame
    skipf_ref,  # (1, R, 128) VMEM
    vmask_ref,  # (1, R, 128) VMEM
    bT_ref,     # (1, R, 128) VMEM
    tt_ref,     # (B, 1) SMEM int32 — full array, indexed by program
    be_hbm,     # (B, Tp, R, 128) HBM out
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
    Sp: int,
):
    _, R, L = bT_ref.shape
    tc = t_chunk
    n_chunks = t_total // tc
    last_c = n_chunks - 1
    tail = t_true - last_c * tc
    b = pl.program_id(0)
    riota = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)

    def body(lp_buf, be_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lpn_hbm.at[b, pl.ds(chunk * tc, tc)], lp_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                be_buf.at[slot], be_hbm.at[b, pl.ds(chunk * tc, tc)],
                out_sems.at[slot],
            )

        in_dma(0, last_c).start()
        skipf = skipf_ref[0]
        vmask = vmask_ref[0]
        bT = bT_ref[0]
        tt = tt_ref[b, 0]  # scalar from SMEM

        def frames(c, slot, bb, n_frames: int):
            def step(i, bb):
                tf = n_frames - 1 - i
                t = c * tc + tf
                msg = bb + lp_buf[slot, tf]
                adv = _wide_shift_bwd(msg, riota, liota, 1, Sp)
                skip = _wide_shift_bwd(msg, riota, liota, 2, Sp) + skipf
                nxt = _lse3(msg, adv, skip) + vmask
                nxt = jnp.where(t + 1 < tt, nxt, bT)
                be_buf[slot, pl.ds(tf, 1)] = nxt[None]
                return nxt

            return _frame_loop(0, n_frames, step, bb)

        def run_chunk(c, r_slot, bb, n_frames: int):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, last_c - r_slot - 1).start()

            slot = r_slot % 2
            in_dma(slot, last_c - r_slot).wait()

            @pl.when(r_slot >= 2)
            def _():
                out_dma(slot, last_c - r_slot + 2).wait()

            bb = frames(c, slot, bb, n_frames)
            out_dma(slot, last_c - r_slot).start()
            return bb

        bb = bT
        if n_chunks == 1:
            run_chunk(0, 0, bb, tail)
        else:
            bb = run_chunk(last_c, 0, bb, tail)
            if n_chunks > 2:
                bb = jax.lax.fori_loop(
                    1, n_chunks - 1,
                    lambda r, bb: run_chunk(last_c - r, r, bb, tc), bb,
                )
            run_chunk(0, last_c, bb, tc)

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((last_c - 1) % 2, 1).wait()

        out_dma(last_c % 2, 0).wait()

    pl.run_scoped(
        body,
        lp_buf=pltpu.VMEM((2, t_chunk, R, L), jnp.float32),
        be_buf=pltpu.VMEM((2, t_chunk, R, L), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _prep_wide(x, B, Sp, fill):
    """(B, S) -> (B, R, 128) with padding."""
    xp = _pad_to(_pad_to(x.astype(jnp.float32), B, 0, fill), Sp, 1, fill)
    return xp.reshape(xp.shape[0], Sp // LANES, LANES)


def _lp_wide(lp, B, Sp, Tp):
    """(B, T, S) -> (B, Tp, R, 128)."""
    lpp = _pad_to(_pad_to(lp.astype(jnp.float32), Sp, 2, 0.0), Tp, 1, 0.0)
    Bq, T2, _ = lpp.shape
    return lpp.reshape(Bq, T2, Sp // LANES, LANES)


# ---------------------------------------------------------------------------
# ASR-scale forced alignment: streaming wide trellis + choice-chase pair
# ---------------------------------------------------------------------------
#
# Beyond the whole-problem-resident kernel's envelope (the (Tp, Bs, Sp)
# choice table stops fitting VMEM around T·S ≈ 3e5), the S=2001 bench
# shape was falling back to the XLA scan pair at ~1.5 µs/frame-pair.
# This pair streams instead:
#
# * forward: the 2-D lattice layout of the wide loss kernels, but with
#   ALL batch rows packed on the sublane axis — (B·R, 128) tiles where
#   R = Sp/128 — so one program advances every row per frame (the loss
#   kernels' one-row-per-grid-program design serializes B chains).
#   Per-frame 3-way max + choice selection; choices stream to HBM
#   behind the compute (a (tc, B·R, 128) f32 chunk every 128 frames).
# * backtrace: streams the choice table BACKWARDS, carrying a one-hot
#   position per batch block; per-frame positions accumulate into a
#   lane-per-frame register column, so the output is a tiny
#   (n_chunks, B·R, 128) table — no second streaming pass.
#
# Block-local sublane masks keep the cross-row rolls from leaking
# between batch blocks (a roll across the block edge always lands on a
# position the band mask writes to _NEG).


def _vit_wide_rows(batch: int, lattice: int):
    Sp = _ceil_to(lattice, LANES)
    return batch * (Sp // LANES), Sp


def ctc_viterbi_wide_supported(T: int, batch: int, lattice: int) -> bool:
    if lattice > _MAX_S_WIDE or batch > _MAX_B:
        return False
    BR, _ = _vit_wide_rows(batch, lattice)
    # fwd: double-buffered lp in + single choice out; bt: double
    # choices in + resident position columns.
    vmem = 3 * _T_CHUNK * BR * LANES * 4
    return vmem <= _VMEM_BUDGET


def _vit_wide_shift_fwd(a, rblk, liota, k, R):
    """a[p] -> a[p-k] within each batch block of R sublane rows."""
    al = pltpu.roll(a, k, axis=1)
    wrap = pltpu.roll(al, 1, axis=0)
    out = jnp.where(liota < k, wrap, al)
    return jnp.where(rblk * LANES + liota >= k, out, _NEG)


def _pack_wide_shift_bwd(m, rblk, liota, k, R, fill):
    """m[p] -> m[p+k] within each batch block, ``fill`` past the end."""
    rows = m.shape[0]
    ml = pltpu.roll(m, LANES - k, axis=1)
    wrap = pltpu.roll(ml, rows - 1, axis=0)
    out = jnp.where(liota >= LANES - k, wrap, ml)
    return jnp.where(rblk * LANES + liota < R * LANES - k, out, fill)


def _vit_wide_shift_bwd(m, rblk, liota, k, R):
    """One-hot mass moved down by k (zero fill)."""
    return _pack_wide_shift_bwd(m, rblk, liota, k, R, 0.0)


def ctc_wide_packed_supported(batch: int, lattice: int) -> bool:
    """Batch-packed wide LOSS kernels: lp double buffer + single
    alpha/beta out buffer must fit VMEM. Larger fleets fall back to the
    one-row-per-grid-program kernels (correct, B× slower chains)."""
    BR, _ = _vit_wide_rows(batch, lattice)
    return 3 * _T_CHUNK * BR * LANES * 4 <= _VMEM_BUDGET


def _ctc_fwd_wide_packed_kernel(
    lp_hbm,     # (Tp, BR, 128) HBM — gathered emissions, batch-packed
    skip_ref,   # (BR, 128) VMEM
    vmask_ref,  # (BR, 128) VMEM
    a0_ref,     # (BR, 128) VMEM
    tt_ref,     # (BR, 128) VMEM f32 — per-row length broadcast
    al_hbm,     # (Tp, BR, 128) HBM out
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
    R: int,
):
    """All batch rows advance in ONE per-frame chain (the original wide
    loss kernel ran one row per serial grid program — B× the chain
    latency; same fix as ``ctc_lattice_viterbi_wide``)."""
    BR, L = a0_ref.shape
    tc = t_chunk
    n_chunks = t_total // tc
    riota = jax.lax.broadcasted_iota(jnp.int32, (BR, L), 0)
    rblk = riota % R
    liota = jax.lax.broadcasted_iota(jnp.int32, (BR, L), 1)

    def body(lp_buf, al_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lp_hbm.at[pl.ds(chunk * tc, tc)], lp_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(chunk):
            return pltpu.make_async_copy(
                al_buf, al_hbm.at[pl.ds(chunk * tc, tc)], out_sems.at[0],
            )

        in_dma(0, 0).start()
        skip_add = skip_ref[:, :]
        vmask = vmask_ref[:, :]
        tt = tt_ref[:, :]

        def frames(c, slot, a):
            def step(tf, a):
                t = c * tc + tf
                lp_t = lp_buf[slot, tf]
                adv = _vit_wide_shift_fwd(a, rblk, liota, 1, R)
                skip = (
                    _vit_wide_shift_fwd(a, rblk, liota, 2, R) + skip_add
                )
                nxt = (lp_t + _lse3(a, adv, skip)) + vmask
                if isinstance(t, int) and t == 0:
                    nxt = a0_ref[:, :]
                else:
                    nxt = jnp.where(t == 0, a0_ref[:, :], nxt)
                nxt = jnp.where(t < tt, nxt, a)
                al_buf[pl.ds(tf, 1)] = nxt[None]
                return nxt

            return _frame_loop(0, tc, step, a)

        def run_chunk(c, r_slot, a):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, r_slot + 1).start()

            slot = r_slot % 2
            in_dma(slot, r_slot).wait()

            @pl.when(r_slot >= 1)
            def _():
                out_dma(r_slot - 1).wait()

            a = frames(c, slot, a)
            out_dma(r_slot).start()
            return a

        a0 = jnp.full((BR, L), _NEG, jnp.float32)
        if n_chunks == 1:
            run_chunk(0, 0, a0)
        else:
            a = run_chunk(0, 0, a0)
            jax.lax.fori_loop(
                1, n_chunks, lambda c, aa: run_chunk(c, c, aa), a
            )
        out_dma(n_chunks - 1).wait()

    pl.run_scoped(
        body,
        lp_buf=pltpu.VMEM((2, t_chunk, BR, LANES), jnp.float32),
        al_buf=pltpu.VMEM((t_chunk, BR, LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((1,)),
    )


def _ctc_bwd_wide_packed_kernel(
    lpn_hbm,    # (Tp, BR, 128) HBM — emissions shifted one frame
    skipf_ref,  # (BR, 128) VMEM
    vmask_ref,  # (BR, 128) VMEM
    bT_ref,     # (BR, 128) VMEM
    tt_ref,     # (BR, 128) VMEM f32
    be_hbm,     # (Tp, BR, 128) HBM out
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
    R: int,
):
    BR, L = bT_ref.shape
    tc = t_chunk
    n_chunks = t_total // tc
    last_c = n_chunks - 1
    riota = jax.lax.broadcasted_iota(jnp.int32, (BR, L), 0)
    rblk = riota % R
    liota = jax.lax.broadcasted_iota(jnp.int32, (BR, L), 1)

    def body(lp_buf, be_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lpn_hbm.at[pl.ds(chunk * tc, tc)], lp_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(chunk):
            return pltpu.make_async_copy(
                be_buf, be_hbm.at[pl.ds(chunk * tc, tc)], out_sems.at[0],
            )

        in_dma(0, last_c).start()
        skipf = skipf_ref[:, :]
        vmask = vmask_ref[:, :]
        bT = bT_ref[:, :]
        tt = tt_ref[:, :]

        def frames(c, slot, bb):
            def step(i, bb):
                tf = tc - 1 - i
                t = c * tc + tf
                msg = bb + lp_buf[slot, tf]
                adv = _pack_wide_shift_bwd(msg, rblk, liota, 1, R, _NEG)
                skip = (
                    _pack_wide_shift_bwd(msg, rblk, liota, 2, R, _NEG)
                    + skipf
                )
                nxt = _lse3(msg, adv, skip) + vmask
                nxt = jnp.where(t + 1 < tt, nxt, bT)
                be_buf[pl.ds(tf, 1)] = nxt[None]
                return nxt

            return _frame_loop(0, tc, step, bb)

        def run_chunk(c, r_slot, bb):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, last_c - r_slot - 1).start()

            slot = r_slot % 2
            in_dma(slot, last_c - r_slot).wait()

            @pl.when(r_slot >= 1)
            def _():
                out_dma(last_c - r_slot + 1).wait()

            bb = frames(c, slot, bb)
            out_dma(last_c - r_slot).start()
            return bb

        bb = bT
        if n_chunks == 1:
            run_chunk(last_c, 0, bb)
        else:
            bb = run_chunk(last_c, 0, bb)
            jax.lax.fori_loop(
                1, n_chunks,
                lambda r, b2: run_chunk(last_c - r, r, b2), bb,
            )
        out_dma(0).wait()

    pl.run_scoped(
        body,
        lp_buf=pltpu.VMEM((2, t_chunk, BR, LANES), jnp.float32),
        be_buf=pltpu.VMEM((t_chunk, BR, LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((1,)),
    )


def _ctc_vit_wide_fwd_kernel(
    lp_hbm,     # (Tp, BR, 128) HBM — gathered emissions, batch-packed
    skip_ref,   # (BR, 128) VMEM — 0 / _NEG skip mask
    vmask_ref,  # (BR, 128) VMEM — 0 / _NEG valid-position mask
    a0_ref,     # (BR, 128) VMEM — frame-0 delta
    tt_ref,     # (BR, 128) VMEM f32 — per-row input length broadcast
    ch_hbm,     # (Tp, BR, 128) HBM out — 3-way choices (0/1/2)
    dfin_ref,   # (BR, 128) VMEM out — delta at the final frame
    *,
    t_chunk: int,
    t_total: int,
    t_true: int,
    R: int,
):
    BR, L = a0_ref.shape
    tc = t_chunk
    n_chunks = t_total // tc
    riota = jax.lax.broadcasted_iota(jnp.int32, (BR, L), 0)
    rblk = riota % R
    liota = jax.lax.broadcasted_iota(jnp.int32, (BR, L), 1)

    def body(lp_buf, ch_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lp_hbm.at[pl.ds(chunk * tc, tc)], lp_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(chunk):
            return pltpu.make_async_copy(
                ch_buf, ch_hbm.at[pl.ds(chunk * tc, tc)], out_sems.at[0],
            )

        in_dma(0, 0).start()
        skip_add = skip_ref[:, :]
        vmask = vmask_ref[:, :]
        tt = tt_ref[:, :]

        def frames(c, slot, d):
            def step(tf, d):
                t = c * tc + tf
                lp_t = lp_buf[slot, tf]
                adv = _vit_wide_shift_fwd(d, rblk, liota, 1, R)
                skip = _vit_wide_shift_fwd(d, rblk, liota, 2, R) + skip_add
                b1 = jnp.maximum(d, adv)
                best = jnp.maximum(b1, skip)
                choice = jnp.where(
                    best == d, 0.0, jnp.where(best == adv, 1.0, 2.0)
                )
                nxt = (lp_t + best) + vmask
                if isinstance(t, int) and t == 0:
                    nxt, choice = a0_ref[:, :], jnp.zeros_like(choice)
                else:
                    first = t == 0
                    nxt = jnp.where(first, a0_ref[:, :], nxt)
                    choice = jnp.where(first, 0.0, choice)
                frozen = t >= tt
                nxt = jnp.where(frozen, d, nxt)
                choice = jnp.where(frozen, 0.0, choice)
                ch_buf[pl.ds(tf, 1)] = choice[None]
                return nxt

            return _frame_loop(0, tc, step, d)

        def run_chunk(c, r_slot, d):
            @pl.when(r_slot + 1 < n_chunks)
            def _():
                in_dma((r_slot + 1) % 2, r_slot + 1).start()

            slot = r_slot % 2
            in_dma(slot, r_slot).wait()
            # The single choice buffer must have drained before this
            # chunk's stores (compute >> the 5 µs DMA, so no stall).
            @pl.when(r_slot >= 1)
            def _():
                out_dma(r_slot - 1).wait()

            d = frames(c, slot, d)
            out_dma(r_slot).start()
            return d

        d0 = jnp.full((BR, L), _NEG, jnp.float32)
        if n_chunks == 1:
            d = run_chunk(0, 0, d0)
        else:
            d = run_chunk(0, 0, d0)
            d = jax.lax.fori_loop(
                1, n_chunks, lambda c, dd: run_chunk(c, c, dd), d
            )
        dfin_ref[:, :] = d
        out_dma(n_chunks - 1).wait()

    pl.run_scoped(
        body,
        lp_buf=pltpu.VMEM((2, t_chunk, BR, LANES), jnp.float32),
        ch_buf=pltpu.VMEM((t_chunk, BR, LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((1,)),
    )


def _ctc_vit_wide_bt_kernel(
    ch_hbm,     # (Tp, BR, 128) HBM — choices from the forward pass
    oh_ref,     # (BR, 128) VMEM — one-hot end positions
    pos_ref,    # (n_chunks, BR, 128) VMEM out — per-frame positions,
                # frame-within-chunk on lanes
    *,
    t_chunk: int,
    t_total: int,
    R: int,
):
    BR, L = oh_ref.shape
    tc = t_chunk
    n_chunks = t_total // tc
    riota = jax.lax.broadcasted_iota(jnp.int32, (BR, L), 0)
    rblk = riota % R
    liota = jax.lax.broadcasted_iota(jnp.int32, (BR, L), 1)
    pidx = (rblk * LANES + liota).astype(jnp.float32)
    fidx = liota.astype(jnp.float32)

    def body(ch_buf, in_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                ch_hbm.at[pl.ds(chunk * tc, tc)], ch_buf.at[slot],
                in_sems.at[slot],
            )

        in_dma(0, n_chunks - 1).start()

        def chunk_body(ci, oh):
            c = n_chunks - 1 - ci
            slot = ci % 2

            @pl.when(ci + 1 < n_chunks)
            def _():
                in_dma((ci + 1) % 2, c - 1).start()

            in_dma(slot, c).wait()

            def step(i, carry):
                oh, cols = carry
                tf = tc - 1 - i
                ch_t = ch_buf[slot, tf]
                # Per-sublane partial position (the one-hot occupies a
                # single row per block); pack into lane column tf.
                pp = jnp.sum(pidx * oh, axis=1, keepdims=True)
                cols = jnp.where(fidx == tf, pp, cols)
                # Gate by the choice AT THE SOURCE (where the mass is),
                # THEN shift — a per-row gate after the shift would
                # zero any back-step that crosses a sublane boundary
                # (the destination row's gate is 0; caught by the
                # ragged interpret parity test).
                oh = (
                    oh * (ch_t == 0.0).astype(jnp.float32)
                    + _vit_wide_shift_bwd(
                        oh * (ch_t == 1.0).astype(jnp.float32),
                        rblk, liota, 1, R,
                    )
                    + _vit_wide_shift_bwd(
                        oh * (ch_t == 2.0).astype(jnp.float32),
                        rblk, liota, 2, R,
                    )
                )
                return oh, cols

            oh, cols = _frame_loop(
                0, tc, step, (oh, jnp.zeros((BR, L), jnp.float32))
            )
            pos_ref[pl.ds(c, 1)] = cols[None]
            return oh

        jax.lax.fori_loop(0, n_chunks, chunk_body, oh_ref[:, :])

    pl.run_scoped(
        body,
        ch_buf=pltpu.VMEM((2, t_chunk, BR, LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@jax.jit
def ctc_lattice_viterbi_wide(
    lp: jax.Array,          # (B, T, S) gathered emissions
    skip_add: jax.Array,    # (B, S)
    vmask: jax.Array,       # (B, S)
    a0: jax.Array,          # (B, S)
    input_lengths: jax.Array,
    end1: jax.Array,
    end2: jax.Array,
):
    """ASR-scale twin of :func:`ctc_lattice_viterbi` (S up to 2048,
    T bounded only by HBM): same conventions, same tie-breaks."""
    B, T, S = lp.shape
    BR, Sp = _vit_wide_rows(B, S)
    R = Sp // LANES
    Tp = _ceil_to(T, _T_CHUNK)

    def pack(x, fill):
        return _prep_wide(x, B, Sp, fill).reshape(BR, LANES)

    lp_w = _lp_wide(lp, B, Sp, Tp)                      # (B, Tp, R, 128)
    lp_w = jnp.transpose(lp_w, (1, 0, 2, 3)).reshape(Tp, BR, LANES)
    tt = jnp.broadcast_to(
        jnp.repeat(
            _pad_to(input_lengths.astype(jnp.float32), B, 0, 0.0), R
        )[:, None],
        (BR, LANES),
    )

    ch, dfin = pl.pallas_call(
        functools.partial(
            _ctc_vit_wide_fwd_kernel, t_chunk=_T_CHUNK, t_total=Tp,
            t_true=T, R=R,
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
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, BR, LANES), jnp.float32),
            jax.ShapeDtypeStruct((BR, LANES), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(
        lp_w,
        pack(jnp.where(skip_add >= 0.0, 0.0, _NEG), _NEG),
        pack(vmask, _NEG),
        pack(a0, _NEG),
        tt,
    )

    # End selection + score in XLA (tiny).
    dflat = dfin.reshape(B, R, LANES).reshape(B, Sp)[:, :S]
    v1 = jnp.take_along_axis(dflat, end1.astype(jnp.int32)[:, None],
                             axis=1)[:, 0]
    v2 = jnp.take_along_axis(dflat, end2.astype(jnp.int32)[:, None],
                             axis=1)[:, 0]
    last_pos = jnp.where(v1 >= v2, end1, end2).astype(jnp.int32)
    score = jnp.maximum(v1, v2)
    oh0 = (
        jnp.arange(Sp)[None, :] == last_pos[:, None]
    ).astype(jnp.float32).reshape(B, R, LANES).reshape(BR, LANES)

    pos_cols = pl.pallas_call(
        functools.partial(
            _ctc_vit_wide_bt_kernel, t_chunk=_T_CHUNK, t_total=Tp, R=R,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (Tp // _T_CHUNK, BR, LANES), jnp.float32
        ),
        interpret=_use_interpret(),
    )(ch, oh0)

    # (n_chunks, B, R, 128) --sum over R--> (n_chunks, B, 128) -> (B, T)
    pos = jnp.sum(
        pos_cols.reshape(Tp // _T_CHUNK, B, R, LANES), axis=2
    )
    positions = jnp.transpose(pos, (1, 0, 2)).reshape(B, Tp)[:, :T]
    return positions.astype(jnp.int32), score


# ---------------------------------------------------------------------------
# Forced alignment: single-program max-semiring trellis + backtrace
# ---------------------------------------------------------------------------
#
# The XLA scan pair (forward argmax trellis + backtrace gathers,
# alignment/ctc.py ctc_viterbi_alignment) pays XLA's per-step loop
# dispatch twice over T — measured 1.18 ms at B=16 T=500 U=50, 9x its
# serial-latency roofline. This kernel runs both chains inside ONE
# Pallas program with everything VMEM-resident (the ops/dtw.py
# wavefront+backtrace pattern): the forward pass stores the 3-way
# choice per (frame, row, position); the backtrace carries each row's
# path position as a one-hot lane vector and overwrites the choice
# buffer in place with position indices — no extra VMEM, no HBM round
# trip, no second kernel.


def ctc_viterbi_kernel_supported(T: int, batch: int, lattice: int) -> bool:
    """Whole-problem-resident bound: lp + choice tables in VMEM."""
    Bs = _ceil_to(batch, SUBLANES)
    Sp = _ceil_to(lattice, LANES)
    Tp = _ceil_to(T, SUBLANES)
    if lattice > _MAX_S or batch > _MAX_B:
        return False
    return 2 * Tp * Bs * Sp * 4 <= 10 * 1024 * 1024


def _ctc_vit_kernel(
    lp_ref,     # (Tp, Bs, Sp) VMEM — gathered emissions
    skip_ref,   # (Bs, Sp) VMEM — 0 where skip allowed, _NEG where not
    vmask_ref,  # (Bs, Sp) VMEM — 0 at valid lattice positions, _NEG past
    a0_ref,     # (Bs, Sp) VMEM — delta at frame 0
    tt_ref,     # (Bs, 1) VMEM int32 — per-row input length
    e1_ref,     # (Bs, Sp) VMEM — one-hot end position 2U
    e2_ref,     # (Bs, Sp) VMEM — one-hot end position 2U-1
    pos_ref,    # (Tp, Bs, Sp) VMEM out — choices, then position indices
    score_ref,  # (Bs, LANES) VMEM out — best path score
    *,
    T: int,
):
    Bs, Sp = a0_ref.shape
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (Bs, Sp), 1)
    fiota = iota_l.astype(jnp.float32)
    edge1 = iota_l >= 1
    edge2 = iota_l >= 2
    skip_add = skip_ref[:, :]
    vmask = vmask_ref[:, :]
    tt = tt_ref[:, :]

    # ---- phase 1: max-product trellis, choices into pos_ref ----
    pos_ref[pl.ds(0, 1)] = jnp.zeros((1, Bs, Sp), jnp.float32)

    def fwd_step(t, d):
        lp_t = lp_ref[t]
        adv = jnp.where(edge1, pltpu.roll(d, 1, axis=1), _NEG)
        skip = jnp.where(edge2, pltpu.roll(d, 2, axis=1), _NEG) + skip_add
        b1 = jnp.maximum(d, adv)
        best = jnp.maximum(b1, skip)
        # First-of-ties priority stay > advance > skip (jnp.argmax
        # convention of the XLA path).
        choice = jnp.where(
            best == d, 0.0, jnp.where(best == adv, 1.0, 2.0)
        )
        nxt = (lp_t + best) + vmask
        frozen = t >= tt
        nxt = jnp.where(frozen, d, nxt)
        choice = jnp.where(frozen, 0.0, choice)
        pos_ref[pl.ds(t, 1)] = choice[None]
        return nxt

    d = _frame_loop(1, T, fwd_step, a0_ref[:, :])

    # ---- end selection ----
    v1 = jnp.max(jnp.where(e1_ref[:, :] > 0, d, _NEG), axis=1,
                 keepdims=True)
    v2 = jnp.max(jnp.where(e2_ref[:, :] > 0, d, _NEG), axis=1,
                 keepdims=True)
    take1 = v1 >= v2
    oh = jnp.where(take1, e1_ref[:, :], e2_ref[:, :])
    score_ref[:, :] = jnp.broadcast_to(
        jnp.maximum(v1, v2), (Bs, LANES)
    )

    # ---- phase 2: backtrace, positions overwrite choices in place ----
    def bt_step(i, oh):
        t = T - 1 - i
        choice_t = pos_ref[t]  # (Bs, Sp) — read BEFORE overwrite
        posidx = jnp.sum(fiota * oh, axis=1, keepdims=True)  # (Bs, 1)
        pos_ref[pl.ds(t, 1)] = jnp.broadcast_to(posidx, (Bs, Sp))[None]
        sb = jnp.sum(choice_t * oh, axis=1, keepdims=True)   # (Bs, 1)
        oh = (
            oh * (sb == 0.0).astype(jnp.float32)
            + pltpu.roll(oh, Sp - 1, axis=1) * (sb == 1.0).astype(jnp.float32)
            + pltpu.roll(oh, Sp - 2, axis=1) * (sb == 2.0).astype(jnp.float32)
        )
        return oh

    _frame_loop(0, T, bt_step, oh)


@jax.jit
def ctc_lattice_viterbi(
    lp: jax.Array,          # (B, T, S) gathered emissions
    skip_add: jax.Array,    # (B, S) 0 / _NEG additive skip mask
    vmask: jax.Array,       # (B, S) 0 / _NEG valid-position mask
    a0: jax.Array,          # (B, S) frame-0 delta
    input_lengths: jax.Array,
    end1: jax.Array,        # (B,) int — lattice end position 2U
    end2: jax.Array,        # (B,) int — lattice end position max(2U-1, 0)
):
    """Most-likely lattice positions ``(B, T) int32`` + score ``(B,)``.

    Same conventions as the XLA ``ctc_viterbi_alignment`` internals:
    positions frozen past each row's length (path repeats the final
    position), stay>advance>skip tie priority, end position chosen as
    ``end1`` iff its score >= ``end2``'s.
    """
    B, T, S = lp.shape
    Bs = _ceil_to(B, SUBLANES)
    Sp = _ceil_to(S, LANES)
    Tp = _ceil_to(T, SUBLANES)
    lp_t = _pad_to(
        jnp.transpose(
            _pad_to(_pad_to(lp.astype(jnp.float32), Bs, 0, 0.0),
                    Sp, 2, 0.0),
            (1, 0, 2),
        ),
        Tp, 0, 0.0,
    )
    s_iota = jnp.arange(Sp)[None, :]
    e1 = (_pad_to(end1.astype(jnp.int32)[:, None], Bs, 0, 0)
          == s_iota).astype(jnp.float32)
    e2 = (_pad_to(end2.astype(jnp.int32)[:, None], Bs, 0, 0)
          == s_iota).astype(jnp.float32)

    pos, score = pl.pallas_call(
        functools.partial(_ctc_vit_kernel, T=T),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bs, Sp), jnp.float32),
            jax.ShapeDtypeStruct((Bs, LANES), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(
        lp_t,
        _prep(skip_add, Bs, Sp, _NEG),
        _prep(vmask, Bs, Sp, _NEG),
        _prep(a0, Bs, Sp, _NEG),
        _pad_to(input_lengths.astype(jnp.int32)[:, None], Bs, 0, T),
        e1,
        e2,
    )
    positions = pos[:T, :B, 0].astype(jnp.int32).T  # (B, T)
    return positions, score[:B, 0]


@jax.jit
def ctc_lattice_forward(
    lp: jax.Array,          # (B, T, S) gathered emissions
    skip_add: jax.Array,    # (B, S) 0 / _NEG additive skip mask
    vmask: jax.Array,       # (B, S) 0 / _NEG valid-position mask
    a0: jax.Array,          # (B, S) frame-0 alpha
    input_lengths: jax.Array,
) -> jax.Array:
    """Alpha table ``(B, T, S)`` for the banded CTC lattice (values
    match the XLA scan within lse-reassociation tolerance; frozen past
    each row's length, like the XLA scan)."""
    B, T, S = lp.shape
    Sp = _ceil_to(S, LANES)
    Tp = _ceil_to(T, _T_CHUNK)
    if _use_wide(S, B) and ctc_wide_packed_supported(B, S):
        # Batch-packed wide kernel: every row on one per-frame chain.
        BR = B * (Sp // LANES)
        R = Sp // LANES

        def pack2(x, fill):
            return _prep_wide(x, B, Sp, fill).reshape(BR, LANES)

        lp_w = _lp_wide(lp, B, Sp, Tp)
        lp_w = jnp.transpose(lp_w, (1, 0, 2, 3)).reshape(Tp, BR, LANES)
        tt = jnp.broadcast_to(
            jnp.repeat(
                _pad_to(input_lengths.astype(jnp.float32), B, 0, 0.0), R
            )[:, None],
            (BR, LANES),
        )
        al = pl.pallas_call(
            functools.partial(
                _ctc_fwd_wide_packed_kernel, t_chunk=_T_CHUNK,
                t_total=Tp, t_true=T, R=R,
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((Tp, BR, LANES), jnp.float32),
            interpret=_use_interpret(),
        )(
            lp_w,
            pack2(skip_add, _NEG),
            pack2(vmask, _NEG),
            pack2(a0, _NEG),
            tt,
        )
        return (
            al.reshape(Tp, B, Sp).transpose(1, 0, 2)[:, :T, :S]
        )
    if _use_wide(S, B):
        R = Sp // LANES
        al = pl.pallas_call(
            functools.partial(
                _ctc_fwd_wide_kernel, t_chunk=_T_CHUNK, t_total=Tp,
                t_true=T,
            ),
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, Tp, R, LANES), jnp.float32),
            interpret=_use_interpret(),
        )(
            _lp_wide(lp, B, Sp, Tp),
            _prep_wide(skip_add, B, Sp, _NEG),
            _prep_wide(vmask, B, Sp, _NEG),
            _prep_wide(a0, B, Sp, _NEG),
            input_lengths.astype(jnp.int32)[:, None],
        )
        return al.reshape(B, Tp, Sp)[:, :T, :S]
    bt = _pick_ctc_b_tile(B, Sp) or SUBLANES
    Bs = _ceil_to(B, bt)
    lp_t = _pad_to(
        jnp.transpose(
            _pad_to(_pad_to(lp.astype(jnp.float32), Bs, 0, 0.0),
                    Sp, 2, 0.0),
            (1, 0, 2),
        ),
        Tp, 0, 0.0,
    )
    nb = Bs // bt
    al = pl.pallas_call(
        functools.partial(
            _ctc_fwd_kernel, t_chunk=_T_CHUNK, t_total=Tp, t_true=T
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bt, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Tp, Bs, Sp), jnp.float32),
        interpret=_use_interpret(),
    )(
        lp_t,
        _prep(skip_add, Bs, Sp, _NEG),
        _prep(vmask, Bs, Sp, _NEG),
        _prep(a0, Bs, Sp, _NEG),
        _pad_to(input_lengths.astype(jnp.int32)[:, None], Bs, 0, T),
    )
    return jnp.transpose(al[:T, :B, :S], (1, 0, 2))


@jax.jit
def ctc_lattice_backward(
    lp: jax.Array,          # (B, T, S)
    skip_fwd: jax.Array,    # (B, S) 0 / _NEG: skip may LEAVE position s
    vmask: jax.Array,       # (B, S)
    bT: jax.Array,          # (B, S) terminal beta rows
    input_lengths: jax.Array,
) -> jax.Array:
    """Beta table ``(B, T, S)`` (the XLA scan's conventions)."""
    B, T, S = lp.shape
    Sp = _ceil_to(S, LANES)
    Tp = _ceil_to(T, _T_CHUNK)
    if _use_wide(S, B) and ctc_wide_packed_supported(B, S):
        BR = B * (Sp // LANES)
        R = Sp // LANES
        lp_next_w = jnp.concatenate([lp[:, 1:], lp[:, -1:]], axis=1)

        def pack2(x, fill):
            return _prep_wide(x, B, Sp, fill).reshape(BR, LANES)

        lp_w = _lp_wide(lp_next_w, B, Sp, Tp)
        lp_w = jnp.transpose(lp_w, (1, 0, 2, 3)).reshape(Tp, BR, LANES)
        tt = jnp.broadcast_to(
            jnp.repeat(
                _pad_to(input_lengths.astype(jnp.float32), B, 0, 0.0), R
            )[:, None],
            (BR, LANES),
        )
        be = pl.pallas_call(
            functools.partial(
                _ctc_bwd_wide_packed_kernel, t_chunk=_T_CHUNK,
                t_total=Tp, t_true=T, R=R,
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((Tp, BR, LANES), jnp.float32),
            interpret=_use_interpret(),
        )(
            lp_w,
            pack2(skip_fwd, _NEG),
            pack2(vmask, _NEG),
            pack2(bT, _NEG),
            tt,
        )
        return (
            be.reshape(Tp, B, Sp).transpose(1, 0, 2)[:, :T, :S]
        )
    if _use_wide(S, B):
        R = Sp // LANES
        lp_next_w = jnp.concatenate([lp[:, 1:], lp[:, -1:]], axis=1)
        be = pl.pallas_call(
            functools.partial(
                _ctc_bwd_wide_kernel, t_chunk=_T_CHUNK, t_total=Tp,
                t_true=T, Sp=Sp,
            ),
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((B, Tp, R, LANES), jnp.float32),
            interpret=_use_interpret(),
        )(
            _lp_wide(lp_next_w, B, Sp, Tp),
            _prep_wide(skip_fwd, B, Sp, _NEG),
            _prep_wide(vmask, B, Sp, _NEG),
            _prep_wide(bT, B, Sp, _NEG),
            input_lengths.astype(jnp.int32)[:, None],
        )
        return be.reshape(B, Tp, Sp)[:, :T, :S]
    bt = _pick_ctc_b_tile(B, Sp) or SUBLANES
    Bs = _ceil_to(B, bt)
    # Row t of the streamed buffer holds lp[t+1] (the recursion at t
    # consumes the successor frame); the final row is a dummy.
    lp_next = jnp.concatenate([lp[:, 1:], lp[:, -1:]], axis=1)
    lp_t = _pad_to(
        jnp.transpose(
            _pad_to(_pad_to(lp_next.astype(jnp.float32), Bs, 0, 0.0),
                    Sp, 2, 0.0),
            (1, 0, 2),
        ),
        Tp, 0, 0.0,
    )
    nb = Bs // bt
    be = pl.pallas_call(
        functools.partial(
            _ctc_bwd_kernel, t_chunk=_T_CHUNK, t_total=Tp, t_true=T
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bt, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Tp, Bs, Sp), jnp.float32),
        interpret=_use_interpret(),
    )(
        lp_t,
        _prep(skip_fwd, Bs, Sp, _NEG),
        _prep(vmask, Bs, Sp, _NEG),
        _prep(bT, Bs, Sp, _NEG),
        _pad_to(input_lengths.astype(jnp.int32)[:, None], Bs, 0, T),
    )
    return jnp.transpose(be[:T, :B, :S], (1, 0, 2))
