"""Fused GMM-emission + Viterbi-trellis Pallas kernel.

The flagship GMM-HMM decode (reference ``mixture_gaussian.py:340-365``,
hot spots at ``mixture_gaussian.py:157-198`` + ``:290-338``) is
emission scoring followed by a max-product trellis. The XLA path runs
them as two dispatches with a ``(B, T, S)`` log-obs round trip through
HBM; here both run in ONE Pallas program: observation features stream
HBM→VMEM in double-buffered chunks, each chunk is scored on the MXU
(diag-GMM in matmul form), and the trellis frames consume the scores
straight from VMEM. Because the trellis chain is latency-bound (tiny
dependent VPU ops), Mosaic's static scheduler can hide much of the
chunk-level emission matmul in the chain's issue bubbles.

Diag-GMM scoring in matmul form (cf. ``emissions.py``)::

    log N(x; mu_sc, diag(var_sc)) + log w_sc
      = const[s,c] + (x*x) @ A[:, s,c] + x @ Bm[:, s,c]
    A = -1/(2 var),  Bm = mu/var,
    const = log w - (D log 2pi + sum log var + sum mu^2/var) / 2

Lane layout is c-major: lane ``c*Sg + s`` (``Sg`` = states padded to a
multiple of 8), so the logsumexp over components is a pair of
``pltpu.roll`` max/sum sweeps with stride ``Sg`` — no strided lane
reductions.

The backtrace phase reuses ``scan._vit_backtrace_kernel`` unchanged
(reads the streamed delta frames in reverse; ties break toward the
lowest state index like ``jnp.argmax``).

Constraints for this fast path: diagonal covariance, ``S <= 128``,
``C * ceil8(S) <= 128``; anything else falls back to the unfused
emission + ``pallas_viterbi``/XLA path at the dispatch layer.
"""

from __future__ import annotations

import functools
import math
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
    _lengths_vec,
    _next_pow2,
    _pad_to,
    _unroll,
    _use_interpret,
    _vit_backtrace_kernel,
)

__all__ = ["fused_gmm_viterbi", "fused_gmm_supported"]

_LOG_2PI = math.log(2.0 * math.pi)


def fused_gmm_supported(
    num_states: int, num_components: int, covariance_type: str
) -> bool:
    """Shapes the single-kernel fused decode handles."""
    sg = _ceil_to(num_states, SUBLANES)
    return (
        covariance_type == "diag"
        and num_states <= LANES
        # The roll-sweep logsumexp doubles its shift up to the next
        # power of two of C; that whole span must fit one lane register.
        and _next_pow2(num_components) * sg <= LANES
    )


def _emission_tables(means, log_vars, log_w, Sg: int):
    """Pack (S, C, D) diag-GMM params into matmul tables.

    Returns ``w2 (Dp, 128)``, ``w1 (Dp, 128)``, ``const (1, 128)`` with
    lane layout ``c*Sg + s``; unused lanes get zero weights and _NEG
    const so they never win the trellis max.
    """
    S, C, D = means.shape
    inv_var = jnp.exp(-log_vars)                      # (S, C, D)
    a = -0.5 * inv_var                                # x^2 coefficient
    bm = means * inv_var                              # x coefficient
    const = (
        log_w
        - 0.5 * (D * _LOG_2PI + jnp.sum(log_vars, axis=-1))
        - 0.5 * jnp.sum(means * means * inv_var, axis=-1)
    )                                                 # (S, C)

    def scatter(tbl_sc_d):
        # (S, C, D) -> (D, 128) at lane c*Sg + s.
        out = jnp.zeros((D, LANES), jnp.float32)
        lane = (jnp.arange(C)[None, :] * Sg + jnp.arange(S)[:, None])  # (S, C)
        return out.at[:, lane.reshape(-1)].set(
            tbl_sc_d.reshape(S * C, D).T
        )

    w2 = scatter(a)
    w1 = scatter(bm)
    cvec = jnp.full((LANES,), _NEG, jnp.float32)
    lane = (jnp.arange(C)[None, :] * Sg + jnp.arange(S)[:, None])
    cvec = cvec.at[lane.reshape(-1)].set(const.reshape(-1))
    return w2, w1, cvec[None, :]


def _fused_trellis_kernel(
    obs_hbm,     # (Bp, Tp, D) HBM features
    w2_ref,      # (Dp, 128) VMEM — x^2 table
    w1_ref,      # (Dp, 128) VMEM — x table
    cn_ref,      # (1, 128) VMEM — const + log mixture weight
    la_ref,      # (k_sub, K) VMEM log transitions
    lpi_ref,     # (1, K) VMEM
    tt_ref,      # (Bt, 1) VMEM int32 per-row true length
    delta_out,   # (Bp, Tp, K) HBM
    dfin_ref,    # (Bt, K) VMEM
    *,
    t_chunk: int,
    t_total: int,
    t_true_static: int,
    k_sub: int,
    n_components: int,
    s_group: int,
    n_states: int,
    d_dim: int,
    ragged: bool,
):
    Bt = dfin_ref.shape[0]
    K = la_ref.shape[1]
    n_chunks = t_total // t_chunk
    b0 = pl.program_id(0) * Bt
    lane_lt_s = (
        jax.lax.broadcasted_iota(jnp.int32, (Bt * t_chunk, K), 1) < n_states
    )

    def body(obs_buf, stage_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                obs_hbm.at[pl.ds(b0, Bt), pl.ds(chunk * t_chunk, t_chunk), :],
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

            # --- Emission scoring for the whole chunk (MXU) ---
            x = obs_buf[slot].reshape(Bt * t_chunk, d_dim)
            scores = (
                jnp.dot(
                    x * x, w2_ref[:, :],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                + jnp.dot(
                    x, w1_ref[:, :],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                + cn_ref[0, :][None, :]
            )  # (R, 128), lane = comp*Sg + state, _NEG elsewhere
            # logsumexp over components via stride-Sg roll sweeps. The max
            # sweep is BIDIRECTIONAL so every component group's lanes hold
            # the same group max (a one-direction sweep would normalize
            # each lane by a different max and corrupt the sum); the sum
            # sweep is one-directional — each group counted exactly once
            # for the group-0 lanes we read (out-of-range groups carry
            # exp(_NEG)=0).
            m = scores
            sh = s_group
            while sh < n_components * s_group:
                m = jnp.maximum(m, pltpu.roll(m, LANES - sh, 1))
                m = jnp.maximum(m, pltpu.roll(m, sh, 1))
                sh *= 2
            e = jnp.exp(scores - m)
            ssum = e
            sh = s_group
            while sh < n_components * s_group:
                ssum = ssum + pltpu.roll(ssum, LANES - sh, 1)
                sh *= 2
            lo_flat = jnp.where(lane_lt_s, m + jnp.log(ssum), _NEG)
            # Scores land in the staging buffer and are overwritten in
            # place by the trellis deltas frame-by-frame (saves a whole
            # (Bt, t_chunk, K) VMEM buffer; the slot's previous contents
            # were already flushed by the out_dma wait above).
            stage_buf[slot, :, :, :] = lo_flat.reshape(Bt, t_chunk, K)

            # --- Max-product trellis over the chunk ---
            def frame(tf, delta):
                lo_t = stage_buf[slot, :, tf, :]
                t = c * t_chunk + tf
                d_sub = jax.lax.slice_in_dim(delta, 0, k_sub, axis=1)
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
        obs_buf=pltpu.VMEM((2, Bt, t_chunk, d_dim), jnp.float32),
        stage_buf=pltpu.VMEM((2, Bt, t_chunk, LANES), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("t_chunk", "b_tile"))
def fused_gmm_viterbi(
    obs: jax.Array,
    means: jax.Array,
    log_vars: jax.Array,
    log_w: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    lengths: Optional[jax.Array] = None,
    t_chunk: int = 128,
    b_tile: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Single-kernel diag-GMM-HMM Viterbi decode.

    Args:
        obs: ``(B, T, D)`` features.
        means/log_vars: ``(S, C, D)`` diag-Gaussian component params.
        log_w: ``(S, C)`` log mixture weights (normalized).
        log_a/log_pi: ``(S, S)`` / ``(S,)`` log transitions and prior.
        lengths: optional ``(B,)`` true lengths (ragged batches).

    Returns ``(states (B, T) int32, score (B,))`` — identical to
    ``auto_viterbi`` over ``gmm_log_probs`` up to fp-associativity in
    the emission matmul.
    """
    B, T, D = obs.shape
    S, C, _ = means.shape
    Sg = _ceil_to(S, SUBLANES)
    if not fused_gmm_supported(S, C, "diag"):
        raise ValueError("shape outside the fused fast path")

    Kp = LANES
    k_sub = _next_pow2(max(_ceil_to(S, SUBLANES), SUBLANES))
    Tp = _ceil_to(T, t_chunk)
    if b_tile is None:
        b_tile = 32 if B % 32 == 0 else SUBLANES
    Bp = _ceil_to(B, b_tile)
    # Mosaic requires DMA slice shapes lane-aligned on the minor dim, so
    # the feature axis pads to the 128-lane width; the padded obs columns
    # multiply zero table rows, contributing exactly 0 to the scores.
    Dp = _ceil_to(D, LANES)

    ob = _pad_to(obs.astype(jnp.float32), Tp, 1, 0.0)
    ob = _pad_to(ob, Bp, 0, 0.0)
    ob = _pad_to(ob, Dp, 2, 0.0)

    w2, w1, cn = _emission_tables(
        means.astype(jnp.float32),
        log_vars.astype(jnp.float32),
        log_w.astype(jnp.float32),
        Sg,
    )
    w2 = _pad_to(w2, Dp, 0, 0.0)
    w1 = _pad_to(w1, Dp, 0, 0.0)

    la_full = _pad_to(log_a.astype(jnp.float32), Kp, 0, _NEG)
    la_full = _pad_to(la_full, Kp, 1, _NEG)
    la_rows = _pad_to(la_full, k_sub, 0, _NEG)[:k_sub]
    la_t = la_full.T
    lpi = _pad_to(log_pi.astype(jnp.float32), Kp, 0, _NEG)[None, :]
    tt = _lengths_vec(lengths, B, T, Bp, b_tile)

    nb = Bp // b_tile
    delta_hbm, dfin = pl.pallas_call(
        functools.partial(
            _fused_trellis_kernel,
            t_chunk=t_chunk,
            t_total=Tp,
            t_true_static=T,
            k_sub=k_sub,
            n_components=C,
            s_group=Sg,
            n_states=S,
            d_dim=Dp,
            ragged=lengths is not None,
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Dp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    )(ob, w2, w1, cn, la_rows, lpi, tt)

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
