"""Minimal-chain prob-space forward kernel experiment, round 3.

Round-2 finding (fwd_prob.py): prob-space carry with stale rescaling
did NOT beat the shipping log-space kernel — both sit at ~320 ns/frame
(B=32, K=64). Scaling diagnostics show cost is linear in B, flat in K,
and insensitive to the op mix — i.e. Mosaic issues the per-frame body
serially with full latency exposure; every op left in the body costs
its latency on the chain.

Hypothesis: strip the per-frame body to the bare minimum —

    q_t = (q_{t-1} @ A) * e_t          (dot + one multiply + store)

and move EVERYTHING else into vectorized per-chunk passes:

  * e_t = exp(lo_t - m_t): pre-pass over the whole chunk (existing);
  * m-cumsum for the log-shift: triangular-matmul prefix per chunk;
  * rescaling: only every RS frames (max-reduce + reciprocal + log),
    accumulated into a per-rescale-block scale table;
  * alpha = log(q) + shifts: post-pass over the whole chunk staged
    q buffer (log at VPU throughput instead of on the chain).

Underflow analysis for RS: q's max entry shrinks per step by at most
exp(min_j(lo_t - m_t) over reachable j); with RS=8 the tolerated
per-step shrink before f32 underflow (~e^-87) is e^-10 — fine for
speech log-probs; RS=4 tolerates e^-21. Both variants measured.
"""

import functools
import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_hmm_tpu.core.fb import forward_log
from pytorch_hmm_tpu.ops.scan import (
    LANES, _NEG, _ceil_to, _pad_to, _unroll, _use_interpret,
    pallas_forward,
)
from pytorch_hmm_tpu.profiling import device_time


def _kernel(
    lo_hbm, pa_ref, pi_ref, tri_ref, exp_ref, alpha_out, *,
    t_chunk, T, b_tile, precision, rs,
):
    Bt = b_tile
    K = pa_ref.shape[1]
    n_chunks = T // t_chunk
    n_rs = t_chunk // rs

    def body(obs_buf, q_buf, m_buf, c_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[:, pl.ds(chunk * t_chunk, t_chunk), :],
                obs_buf.at[slot], in_sems.at[slot])

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                q_buf.at[slot],
                alpha_out.at[:, pl.ds(chunk * t_chunk, t_chunk), :],
                out_sems.at[slot])

        in_dma(0, 0).start()
        pi = pi_ref[:, :]  # (1, K) exp(log_pi), 0 padded

        def chunk_body(c, carry):
            q, C = carry  # q: (Bt, K) scaled probs; C: (Bt, 1) log-scale
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
            # Prefix-sum of m over the chunk via triangular matmul
            # (tri[t, u] = 1 for u <= t): mcum[t] = sum_{u<=t} m[u].
            mcum = jax.lax.dot_general(
                m[:, :, 0], tri_ref[:, :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                              # (Bt, tc)
            m_buf[slot] = mcum

            # ---- serial scan: rs-blocked, minimal per-frame body ----
            def rs_block(rb, carry):
                q, C = carry
                # Record this rescale-block's entry scale for the
                # post-pass (alpha needs C as of each frame; C is
                # constant within an rs block by construction).
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
                # Rescale once per rs block (off the per-frame chain).
                r = jnp.maximum(
                    jnp.max(q, axis=-1, keepdims=True), 1e-37)
                return q * (1.0 / r), C + jnp.log(r)

            q, C = jax.lax.fori_loop(
                0, n_rs, rs_block, (q, C), unroll=n_rs)

            # ---- vectorized post-pass: q -> alpha in place ----
            # alpha[t] = log(q_staged[t]) + C(rs block of t) + mcum[t]
            # (+ carry-in handled because C accumulates across chunks
            #  and mcum is re-based per chunk via C's chunk carry).
            qs = q_buf[slot]                               # (Bt, tc, K)
            cvals = c_buf[slot]                            # (Bt, n_rs)
            # Expand rs-block scales to per-frame via a 0/1 matmul
            # (exp_ref[rb, t] = 1 iff t's block is rb) — lane-safe.
            crep = jax.lax.dot_general(
                cvals, exp_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                              # (Bt, tc)
            shift = crep + m_buf[slot]                     # (Bt, tc)
            q_buf[slot] = jnp.log(qs) + shift[:, :, None]
            out_dma(slot, c).start()
            # Re-base C so next chunk's mcum starts from zero:
            # C_next = C_after_rescales + total m of this chunk.
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


@functools.partial(jax.jit, static_argnames=("t_chunk", "precision", "rs"))
def prob2_forward(log_obs, log_a, log_pi, t_chunk=128,
                  precision=jax.lax.Precision.HIGHEST, rs=8):
    B, T, K = log_obs.shape
    Kp = _ceil_to(K, LANES)
    Tp = _ceil_to(T, t_chunk)

    lo = _pad_to(log_obs.astype(jnp.float32), Kp, 2, _NEG)
    lo = _pad_to(lo, Tp, 1, 0.0)
    la = _pad_to(log_a.astype(jnp.float32), Kp, 0, _NEG)
    la = _pad_to(la, Kp, 1, _NEG)
    pa = jnp.exp(la)
    pi = jnp.exp(_pad_to(log_pi.astype(jnp.float32), Kp, 0, _NEG))[None, :]
    tri = jnp.tril(jnp.ones((t_chunk, t_chunk), jnp.float32))
    n_rs = t_chunk // rs
    expand = (
        jnp.arange(t_chunk)[None, :] // rs
        == jnp.arange(n_rs)[:, None]
    ).astype(jnp.float32)  # (n_rs, tc)

    alpha_p = pl.pallas_call(
        functools.partial(_kernel, t_chunk=t_chunk, T=Tp,
                          b_tile=B, precision=precision, rs=rs),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Kp), jnp.float32),
        interpret=_use_interpret(),
    )(lo, pa, pi, tri, expand)

    log_alpha = alpha_p[:, :T, :K]
    lz = jax.scipy.special.logsumexp(log_alpha[:, -1, :], axis=-1)
    return log_alpha, lz


def main():
    key = jax.random.PRNGKey(0)
    B, K = 32, 64
    la = jax.nn.log_softmax(
        jax.random.normal(key, (K, K), jnp.float32), axis=-1)
    lpi = jnp.full((K,), -jnp.log(float(K)))

    # correctness at T=1024 (tc=128 -> 8 chunks)
    lo = jax.random.normal(jax.random.PRNGKey(1), (B, 1024, K)) * 3.0
    ref_a, ref_z = forward_log(lo, la, lpi)
    for prec in ("HIGHEST", "DEFAULT"):
        for rs in (4, 8):
            a, z = prob2_forward(
                lo, la, lpi, rs=rs,
                precision=getattr(jax.lax.Precision, prec))
            da = float(jnp.max(jnp.abs(a - ref_a)))
            dz = float(jnp.max(jnp.abs(z - ref_z)))
            print(f"prob2 {prec:8s} rs={rs}: max|dalpha|={da:.2e} "
                  f"max|dlz|={dz:.2e}", flush=True)

    # timing
    for T, reps in ((8192, 16), (131072, 2)):
        lo = jax.random.normal(key, (B, T, K), jnp.float32)
        rows = []
        for name, fn in (
            ("ship", lambda x: pallas_forward(x, la, lpi)[1].sum()),
            ("p2HI8", lambda x: prob2_forward(
                x, la, lpi, rs=8,
                precision=jax.lax.Precision.HIGHEST)[1].sum()),
            ("p2D8", lambda x: prob2_forward(
                x, la, lpi, rs=8,
                precision=jax.lax.Precision.DEFAULT)[1].sum()),
            ("p2HI4", lambda x: prob2_forward(
                x, la, lpi, rs=4,
                precision=jax.lax.Precision.HIGHEST)[1].sum()),
        ):
            ts = sorted(device_time(fn, lo, reps=reps) for _ in range(3))
            rows.append((name, ts[1] * 1e3))
        print(f"T={T}: " + "  ".join(f"{n}={t:.2f}ms" for n, t in rows),
              flush=True)


if __name__ == "__main__":
    main()
