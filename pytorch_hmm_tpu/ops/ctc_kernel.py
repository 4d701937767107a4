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
]

_MAX_S = 512   # lattice lanes (multi-tile rolls verified exact on hw)
_MAX_B = 256
_T_CHUNK = 128
# 2 double-buffered (tc, Bs, Sp) streams must fit VMEM with headroom.
_VMEM_BUDGET = 12 * 1024 * 1024


def ctc_lattice_supported(lattice_size: int, batch: int) -> bool:
    if lattice_size > _MAX_S or batch > _MAX_B:
        return False
    Bs = _ceil_to(batch, SUBLANES)
    Sp = _ceil_to(lattice_size, LANES)
    return 2 * 2 * _T_CHUNK * Bs * Sp * 4 <= _VMEM_BUDGET


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
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (Bs, Sp), 1)
    edge1 = iota_l >= 1
    edge2 = iota_l >= 2

    def body(lp_buf, al_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lp_hbm.at[pl.ds(chunk * tc, tc)], lp_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                al_buf.at[slot], al_hbm.at[pl.ds(chunk * tc, tc)],
                out_sems.at[slot],
            )

        in_dma(0, 0).start()
        skip_add = skip_ref[:, :]
        vmask = vmask_ref[:, :]
        tt = tt_ref[:, :]

        def frames(c, slot, a, first: bool, n_frames: int):
            def step(tf, a):
                if first and isinstance(tf, int) and tf == 0:
                    a = a0_ref[:, :]
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
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (Bs, Sp), 1)
    edgeb1 = iota_l < Sp - 1
    edgeb2 = iota_l < Sp - 2

    def body(lp_buf, be_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lpn_hbm.at[pl.ds(chunk * tc, tc)], lp_buf.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                be_buf.at[slot], be_hbm.at[pl.ds(chunk * tc, tc)],
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
    Bs = _ceil_to(B, SUBLANES)
    Sp = _ceil_to(S, LANES)
    Tp = _ceil_to(T, _T_CHUNK)
    lp_t = _pad_to(
        jnp.transpose(
            _pad_to(_pad_to(lp.astype(jnp.float32), Bs, 0, 0.0),
                    Sp, 2, 0.0),
            (1, 0, 2),
        ),
        Tp, 0, 0.0,
    )
    al = pl.pallas_call(
        functools.partial(
            _ctc_fwd_kernel, t_chunk=_T_CHUNK, t_total=Tp, t_true=T
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
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
    Bs = _ceil_to(B, SUBLANES)
    Sp = _ceil_to(S, LANES)
    Tp = _ceil_to(T, _T_CHUNK)
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
    be = pl.pallas_call(
        functools.partial(
            _ctc_bwd_kernel, t_chunk=_T_CHUNK, t_total=Tp, t_true=T
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
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
