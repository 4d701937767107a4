"""Prob-space forward kernel experiment.

Hypothesis: the current forward kernel's per-frame critical chain is
max -> exp -> matmul -> log -> add (~320 ns/frame at K=64).  Carrying a
*scaled probability* vector instead of log-alpha moves everything but
the matmul off the chain:

    q_t = (q_{t-1} @ A) * e_t * inv_{t-1}
    e_t   = exp(lo_t - m_t)          (whole chunk, vectorized pre-pass)
    inv_t = 1 / max(q_t)             (stale: applied one frame late,
                                      computed in parallel with the
                                      next frame's matmul)
    alpha_t = log(q_t) + C_t,  C_t = C_{t-1} + m_t + log r_{t-1}
                                      (output-only, off the chain)

Variants: HIGHEST / HIGH / DEFAULT matmul precision, plus the shipping
kernel at HIGHEST for reference.  Checks max|alpha - core| first.
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
    LANES, _NEG, _ceil_to, _pad_to, _pick_b_tile, _unroll, pallas_forward,
)
from pytorch_hmm_tpu.profiling import device_time


def _prob_kernel(
    lo_hbm, pa_ref, pi_ref, alpha_out, *, t_chunk, T, b_tile, precision,
):
    Bt = b_tile
    K = pa_ref.shape[1]
    n_chunks = T // t_chunk

    def body(obs_buf, stage_buf, m_buf, in_sems, out_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[:, pl.ds(chunk * t_chunk, t_chunk), :],
                obs_buf.at[slot], in_sems.at[slot])

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                stage_buf.at[slot],
                alpha_out.at[:, pl.ds(chunk * t_chunk, t_chunk), :],
                out_sems.at[slot])

        in_dma(0, 0).start()
        pi = pi_ref[:, :]  # (1, K) exp(log_pi), 0 padded

        def chunk_body(c, carry):
            q, inv_prev, lr_prev, C = carry
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                in_dma((c + 1) % 2, c + 1).start()

            in_dma(slot, c).wait()

            @pl.when(c >= 2)
            def _():
                out_dma(slot, c - 2).wait()

            # Vectorized pre-pass: shift + exponentiate the whole chunk.
            lo_chunk = obs_buf[slot]                      # (Bt, tc, K)
            m = jnp.max(lo_chunk, axis=-1, keepdims=True)  # (Bt, tc, 1)
            m = jnp.maximum(m, _NEG)
            obs_buf[slot] = jnp.exp(lo_chunk - m)
            m_buf[slot] = m[:, :, 0]                       # (Bt, tc)

            def frame(tf, carry):
                q, inv_prev, lr_prev, C = carry
                e_t = obs_buf[slot, :, tf, :]              # (Bt, K)
                m_t = m_buf[slot, :, pl.ds(tf, 1)]         # (Bt, 1)
                t = c * t_chunk + tf
                # ---- critical chain: matmul + 2 vector ops ----
                s = jnp.dot(q, pa_ref[:, :],
                            preferred_element_type=jnp.float32,
                            precision=precision)
                q_new = (s * inv_prev) * e_t
                q_new = jnp.where(t == 0, pi * e_t, q_new)
                # ---- off-chain bookkeeping ----
                C_new = jnp.where(t == 0, m_t, C + m_t + lr_prev)
                r = jnp.maximum(
                    jnp.max(q_new, axis=-1, keepdims=True), 1e-37)
                stage_buf[slot, :, tf, :] = jnp.log(q_new) + C_new
                return q_new, 1.0 / r, jnp.log(r), C_new

            carry = jax.lax.fori_loop(
                0, t_chunk, frame, carry, unroll=_unroll(t_chunk))
            out_dma(slot, c).start()
            return carry

        q0 = jnp.zeros((Bt, K), jnp.float32)
        one = jnp.ones((Bt, 1), jnp.float32)
        zero = jnp.zeros((Bt, 1), jnp.float32)
        jax.lax.fori_loop(0, n_chunks, chunk_body, (q0, one, zero, zero))

        @pl.when(n_chunks >= 2)
        def _():
            out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    pl.run_scoped(
        body,
        obs_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        stage_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        m_buf=pltpu.VMEM((2, Bt, t_chunk), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("t_chunk", "precision"))
def prob_forward(log_obs, log_a, log_pi, t_chunk=128,
                 precision=jax.lax.Precision.HIGHEST):
    B, T, K = log_obs.shape
    Kp = _ceil_to(K, LANES)
    b_tile = B
    Tp = _ceil_to(T, t_chunk)

    lo = _pad_to(log_obs.astype(jnp.float32), Kp, 2, _NEG)
    lo = _pad_to(lo, Tp, 1, 0.0)
    la = _pad_to(log_a.astype(jnp.float32), Kp, 0, _NEG)
    la = _pad_to(la, Kp, 1, _NEG)
    pa = jnp.exp(la)
    pi = jnp.exp(_pad_to(log_pi.astype(jnp.float32), Kp, 0, _NEG))[None, :]

    alpha_p = pl.pallas_call(
        functools.partial(_prob_kernel, t_chunk=t_chunk, T=Tp,
                          b_tile=b_tile, precision=precision),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Kp), jnp.float32),
    )(lo, pa, pi)

    log_alpha = alpha_p[:, :T, :K]
    lz = jax.scipy.special.logsumexp(log_alpha[:, -1, :], axis=-1)
    return log_alpha, lz


def main():
    key = jax.random.PRNGKey(0)
    B, K = 32, 64
    la = jax.nn.log_softmax(
        jax.random.normal(key, (K, K), jnp.float32), axis=-1)
    lpi = jnp.full((K,), -jnp.log(float(K)))

    # correctness at T=1000
    lo = jax.random.normal(jax.random.PRNGKey(1), (B, 1000, K)) * 3.0
    ref_a, ref_z = forward_log(lo, la, lpi)
    for prec in ("HIGHEST", "DEFAULT"):
        a, z = prob_forward(lo, la, lpi,
                            precision=getattr(jax.lax.Precision, prec))
        da = float(jnp.max(jnp.abs(a - ref_a)))
        dz = float(jnp.max(jnp.abs(z - ref_z)))
        print(f"prob {prec:8s} max|dalpha|={da:.2e} max|dlz|={dz:.2e}", flush=True)
    pa, pz = pallas_forward(lo, la, lpi)
    print(f"ship HIGHEST  max|dalpha|={float(jnp.max(jnp.abs(pa - ref_a))):.2e}"
          f" max|dlz|={float(jnp.max(jnp.abs(pz - ref_z))):.2e}")

    # timing
    for T, reps in ((8192, 16), (131072, 2)):
        lo = jax.random.normal(key, (B, T, K), jnp.float32)
        rows = []
        for name, fn in (
            ("ship", lambda x: pallas_forward(x, la, lpi)[1].sum()),
            ("probHI", lambda x: prob_forward(
                x, la, lpi, precision=jax.lax.Precision.HIGHEST)[1].sum()),
            ("probD", lambda x: prob_forward(
                x, la, lpi, precision=jax.lax.Precision.DEFAULT)[1].sum()),
        ):
            ts = sorted(device_time(fn, lo, reps=reps) for _ in range(3))
            rows.append((name, ts[1] * 1e3))
        print(f"T={T}: " + "  ".join(f"{n}={t:.2f}ms" for n, t in rows))


if __name__ == "__main__":
    main()
