"""Pallas streaming-chunk decoder (greedy; the beam lives in
``stream_multi.py``).

The streaming processor's chunk step is a ``lax.scan`` over ~160 frames
whose per-frame body is a handful of *tiny* ops (a row gather from the
transition matrix, an argmax over S states, a top-k over a width-8
beam). On TPU each tiny XLA op costs ~100 ns of issue latency on the
serial chain, so the chunk step measured ~2.7 µs/frame (~0.43 ms per
chunk) regardless of ``unroll`` — the chain is latency-bound, not
loop-bound. These kernels run the whole chunk inside one Pallas
program where the same steps are register-level vector ops:

* hypotheses ride SUBLANES, states ride LANES; the carried hypothesis
  states are lane one-hots, so the per-frame transition-row "gather"
  is one exact ``(W, S) @ (S, S)`` one-hot matmul on the MXU;
* the scalar ``has_prev`` carry never enters the kernel: it evolves
  deterministically, so only the statically-peeled first frame
  consults it.

The fixed-width BEAM decoder lives in ``stream_multi.py`` — it decodes
N concurrent streams per launch and, at N=1, supersedes the
single-stream beam kernel that used to live here (its mask-reduce rank
block measured 0.069 vs 0.084 ms per 160-frame chunk).

Numerics and tie-breaks match the XLA reference steps in
``streaming.py`` bit-for-bit (one-hot matmuls sum exactly one term;
max/select trees are exactly associative; operand grouping is kept).

Replaces (performance-wise) the hot loops of reference
``streaming.py:267-377``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import LANES, SUBLANES, _NEG, _ceil_to, _pad_to, _use_interpret
from .smallk import _frame_loop

__all__ = [
    "pallas_greedy_chunk",
    "stream_chunk_supported",
]

_MAX_T = 1024   # frames per chunk (fully unrolled on hardware)
_MAX_W = 8      # beam hypotheses (one sublane tile)
_MAX_H = 1024   # path-history length (lane tiles)


def stream_chunk_supported(
    num_states: int, t: int, beam_width: int = 1, history: int = 1
) -> bool:
    return (
        num_states <= LANES
        and _ceil_to(t, SUBLANES) <= _MAX_T
        and beam_width <= _MAX_W
        # W > S has no W distinct states to fill the beam — the kernel's
        # top-k accumulator would produce NaN (0 · -inf) where the XLA
        # path raises from lax.top_k.
        and beam_width <= num_states
        and history <= _MAX_H
    )


def _dot_rows(oh, la):
    """``rows[w, s] = la[state_w, s]`` — exact: the one-hot picks a
    single term, so the MXU sum has no rounding."""
    return jax.lax.dot_general(
        oh, la, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# Greedy
# ---------------------------------------------------------------------------

def _greedy_kernel(
    la_ref,     # (Sl, Sl) VMEM — log transitions, _NEG padded
    lo_ref,     # (Tp, Sl) VMEM — chunk log-obs, _NEG padded states
    nv_ref,     # (1, 1) SMEM int32 — valid frames
    has_ref,    # (1, 1) SMEM int32 — carried has_prev flag
    prev_ref,   # (1, Sl) VMEM — carried state one-hot
    st_ref,     # (Tp, LANES) VMEM out — f32 state per frame
    sc_ref,     # (Tp, LANES) VMEM out — f32 score per frame
    oh_out,     # (1, Sl) VMEM out — updated carry one-hot
    *,
    t_pad: int,
    num_states: int,
):
    Sl = la_ref.shape[1]
    la = la_ref[:, :]
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, Sl), 1).astype(
        jnp.float32
    )
    nv = nv_ref[0, 0]
    log_s = jnp.log(jnp.asarray(float(num_states), jnp.float32))
    has0 = has_ref[0, 0] > 0
    # After the first valid frame a previous state always exists.
    has_rest = jnp.logical_or(has0, nv > 0)

    def step(tf, oh):
        lo_t = lo_ref[pl.ds(tf, 1), :]        # (1, Sl)
        rows = _dot_rows(oh, la)              # la[prev] (exact)
        cont = rows + lo_t
        first = lo_t - log_s
        if isinstance(tf, int):
            has = has0 if tf == 0 else has_rest
        else:  # interpret mode: rolled loop, traced tf
            has = jnp.logical_or(
                has0, jnp.logical_and(tf > 0, nv > 0)
            )
        scores = jnp.where(has, cont, first)
        m = jnp.max(scores, axis=1, keepdims=True)
        sval = jnp.min(
            jnp.where(scores == m, iota_l, float(Sl)), axis=1,
            keepdims=True,
        )
        st_ref[pl.ds(tf, 1), :] = jnp.broadcast_to(sval, (1, LANES))
        sc_ref[pl.ds(tf, 1), :] = jnp.broadcast_to(m, (1, LANES))
        valid = tf < nv
        return jnp.where(valid, (iota_l == sval).astype(jnp.float32), oh)

    oh = _frame_loop(0, t_pad, step, prev_ref[:, :])
    oh_out[:, :] = oh


@jax.jit
def pallas_greedy_chunk(
    log_a: jax.Array,
    log_obs: jax.Array,
    n_valid: jax.Array,
    carry: Tuple[jax.Array, jax.Array],
):
    """Drop-in replacement for the XLA ``streaming._greedy_step`` scan
    (same signature, bit-identical outputs)."""
    T, S = log_obs.shape
    prev_state, has_prev = carry
    Sl = _ceil_to(S, LANES)
    Tp = _ceil_to(T, SUBLANES)

    la = _pad_to(_pad_to(log_a.astype(jnp.float32), Sl, 0, _NEG), Sl, 1, _NEG)
    lo = _pad_to(
        _pad_to(log_obs.astype(jnp.float32), Sl, 1, _NEG), Tp, 0, 0.0
    )
    oh0 = jax.nn.one_hot(prev_state, Sl, dtype=jnp.float32)[None]
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)
    hp = jnp.asarray(has_prev, jnp.int32).reshape(1, 1)

    st, sc, oh = pl.pallas_call(
        functools.partial(_greedy_kernel, t_pad=Tp, num_states=S),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Tp, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, Sl), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(la, lo, nv, hp, oh0)

    states = st[:T, 0].astype(jnp.int32)
    scores = sc[:T, 0]
    new_prev = jnp.argmax(oh[0]).astype(jnp.int32)
    new_has = jnp.logical_or(has_prev, n_valid > 0)
    return (new_prev, new_has), states, jnp.exp(scores)
