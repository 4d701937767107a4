"""Pallas DTW kernel: anti-diagonal wavefront + in-kernel backtrace.

The XLA wavefront (``alignment/dtw.py:_dtw_wavefront``) is a
``lax.scan`` over N+M-1 anti-diagonals whose per-step body includes an
N-element gather (``dist[i, k-i]``) and whose backtrace is ~N+M scalar
gathers — measured ~16.5 ms for a 500x500 alignment on v5e, nearly all
of it dispatch/gather latency. This kernel runs both phases inside ONE
Pallas program:

* the distance matrix is pre-SKEWED on the XLA side with a pad+reshape
  trick (no gather): ``skewT[i, k] = dist[i, k-i]`` comes from
  flattening an INF-padded ``(N, M+N)`` and reshaping to
  ``(N, N+M-1)``; its transpose ``S[k, i]`` makes every wavefront step
  a contiguous ``(1, Np)`` VMEM row read;
* per anti-diagonal the three candidates are two lane rolls and adds,
  the min tree and the choice selects are whole-vreg ops — no gathers;
* choices stay in VMEM and the backtrace walks them in the same
  program (VMEM write-then-read is safe; the hardware hazard is only
  same-kernel HBM DMA round-trips).

Outputs are BIT-IDENTICAL to ``_dtw_wavefront`` + ``_backtrace``:
same candidate grouping (exact min/adds), same argmin tie priority
(diag > up > left), same origin-freeze convention.

Replaces (performance-wise) reference ``dtw.py:47-152``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import LANES, SUBLANES, _ceil_to, _pad_to, _use_interpret

__all__ = ["pallas_dtw", "pallas_dtw_supported"]

_INF = jnp.inf
# VMEM: skewed distances + choices (each (W2p, Np) f32) must fit.
_VMEM_CAP = 10 * 1024 * 1024


def pallas_dtw_supported(n: int, m: int) -> bool:
    np_ = _ceil_to(n, LANES)
    w2p = _ceil_to(n + m - 1, SUBLANES)
    vmem = 2 * w2p * np_ * 4 + 2 * w2p * LANES * 4
    return vmem <= _VMEM_CAP


def _skew(dist: jax.Array) -> jax.Array:
    """``S[k, i] = dist[i, k - i]`` (INF outside) without gathers."""
    N, M = dist.shape
    W2 = N + M - 1
    padded = jnp.pad(dist, ((0, 0), (0, N)), constant_values=_INF)
    skew_t = padded.reshape(-1)[: N * W2].reshape(N, W2)
    return skew_t.T  # (W2, N)


def _dtw_kernel(
    s_ref,      # (W2p, Np) VMEM — skewed distances, INF outside
    pi_ref,     # (W2p, LANES) VMEM out — path i per backtrace step
    pj_ref,     # (W2p, LANES) VMEM out — path j per backtrace step
    cfin_ref,   # (1, LANES) VMEM out — final cost
    ch_ref,     # (W2p, Np) VMEM scratch — choices (0 diag, 1 up, 2 left)
    *,
    n: int,
    m: int,
    rj: bool,
):
    W2 = n + m - 1
    Np = s_ref.shape[1]
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    lane0 = iota_l == 0
    inf_row = jnp.full((1, Np), _INF, jnp.float32)

    def shift(v):  # v[i] -> v[i-1], INF shifted into lane 0
        return jnp.where(lane0, _INF, pltpu.roll(v, 1, axis=1))

    # ---- phase 1: wavefront ----
    d1_0 = s_ref[0:1, :]  # k=0: only (0, 0) is finite
    ch_ref[0:1, :] = jnp.zeros((1, Np), jnp.float32)

    def wave_step(k, carry):
        d1, d2 = carry
        dk = s_ref[pl.ds(k, 1), :]
        diag, up, left = shift(d2), shift(d1), d1
        if rj:
            c0, c1, c2 = diag + 2.0 * dk, up + dk, left + dk
        else:
            c0, c1, c2 = diag + dk, up + dk, left + dk
        best = jnp.minimum(jnp.minimum(c0, c1), c2)
        # argmin-first tie priority: diag > up > left.
        choice = jnp.where(
            best == c0, 0.0, jnp.where(best == c1, 1.0, 2.0)
        )
        ch_ref[pl.ds(k, 1), :] = choice
        return best, d1

    def wave_loop(start, end, carry):
        if _use_interpret():
            return jax.lax.fori_loop(start, end, wave_step, carry)
        for k in range(start, end):
            carry = wave_step(k, carry)
        return carry

    d1, _ = wave_loop(1, W2, (d1_0, inf_row))
    cfin = jnp.max(jnp.where(iota_l == n - 1, d1, -_INF), axis=1,
                   keepdims=True)
    cfin_ref[:, :] = jnp.broadcast_to(cfin, (1, LANES))

    # ---- phase 2: backtrace (emits end -> origin, frozen at origin) ----
    def bt_step(t, carry):
        i, j = carry
        pi_ref[pl.ds(t, 1), :] = jnp.full(
            (1, LANES), 1.0, jnp.float32) * i.astype(jnp.float32)
        pj_ref[pl.ds(t, 1), :] = jnp.full(
            (1, LANES), 1.0, jnp.float32) * j.astype(jnp.float32)
        row = ch_ref[pl.ds(i + j, 1), :]
        c = jnp.max(jnp.where(iota_l == i, row, -1.0))
        at_origin = (i == 0) & (j == 0)
        di = jnp.where(c == 2.0, 0, 1)
        dj = jnp.where(c == 1.0, 0, 1)
        ni = jnp.where(at_origin, 0, i - di)
        nj = jnp.where(at_origin, 0, j - dj)
        return jnp.maximum(ni, 0), jnp.maximum(nj, 0)

    def bt_loop(carry):
        if _use_interpret():
            return jax.lax.fori_loop(0, W2, bt_step, carry)
        for t in range(W2):
            carry = bt_step(t, carry)
        return carry

    bt_loop((jnp.int32(n - 1), jnp.int32(m - 1)))


@functools.partial(jax.jit, static_argnames=("step_pattern",))
def pallas_dtw(
    dist: jax.Array, step_pattern: str = "symmetric"
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """DTW path + cost on the wavefront kernel.

    Returns ``(path_i, path_j, length, final_cost)`` with the path in
    ``_backtrace`` convention: fixed length N+M-1, origin-first after
    the internal reversal, entries before ``N+M-1-length`` frozen at
    (0, 0). Bit-identical to the XLA ``_dtw_wavefront`` + ``_backtrace``
    pair.
    """
    N, M = dist.shape
    W2 = N + M - 1
    Np = _ceil_to(N, LANES)
    W2p = _ceil_to(W2, SUBLANES)

    s = _skew(dist.astype(jnp.float32))               # (W2, N)
    s = _pad_to(_pad_to(s, Np, 1, _INF), W2p, 0, _INF)

    pi, pj, cfin = pl.pallas_call(
        functools.partial(
            _dtw_kernel, n=N, m=M, rj=step_pattern == "rabiner_juang"
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((W2p, LANES), jnp.float32),
            jax.ShapeDtypeStruct((W2p, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((W2p, Np), jnp.float32)],
        interpret=_use_interpret(),
    )(s)

    path_i = pi[:W2, 0].astype(jnp.int32)[::-1]
    path_j = pj[:W2, 0].astype(jnp.int32)[::-1]
    length = jnp.sum((path_i + path_j) > 0) + 1
    return path_i, path_j, length, cfin[0, 0]
