"""Find the per-frame latency floor of the serial forward chain.

Variants, all computing only the final carry (no alpha table, no
per-frame stores, no post-pass):

  A. dot(HIGHEST) + mul, rescale every 8
  B. dot(DEFAULT) + mul, rescale every 8
  C. B + two frames per unrolled body instance (same ops, fewer loop
     boundaries)
  D. B with rescale every 16

If these still sit at ~200 ns/frame the floor is the dependent-dot
latency itself; if they drop well below, the per-frame VMEM store /
post-pass of the full kernel is the cost and the alpha-producing path
should restructure around it.
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
    LANES, _NEG, _ceil_to, _pad_to, _use_interpret,
)
from pytorch_hmm_tpu.profiling import device_time


def _kernel(lo_hbm, pa_ref, pi_ref, out_ref, *,
            t_chunk, T, b_tile, precision, rs):
    Bt = b_tile
    K = pa_ref.shape[1]
    n_chunks = T // t_chunk
    n_rs = t_chunk // rs

    def body(obs_buf, in_sems):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                lo_hbm.at[:, pl.ds(chunk * t_chunk, t_chunk), :],
                obs_buf.at[slot], in_sems.at[slot])

        in_dma(0, 0).start()
        pi = pi_ref[:, :]

        def chunk_body(c, carry):
            q, C = carry
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                in_dma((c + 1) % 2, c + 1).start()

            in_dma(slot, c).wait()

            lo_chunk = obs_buf[slot]
            m = jnp.maximum(
                jnp.max(lo_chunk, axis=-1, keepdims=True), _NEG)
            obs_buf[slot] = jnp.exp(lo_chunk - m)
            msum = jnp.sum(m[:, :, 0], axis=-1, keepdims=True)  # (Bt,1)

            def rs_block(rb, carry):
                q, C = carry

                def frame(i, q):
                    tf = rb * rs + i
                    e_t = obs_buf[slot, :, tf, :]
                    s = jax.lax.dot_general(
                        q, pa_ref[:, :], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision)
                    return s * e_t

                q = jax.lax.fori_loop(0, rs, frame, q, unroll=rs)
                r = jnp.maximum(
                    jnp.max(q, axis=-1, keepdims=True), 1e-37)
                return q * (1.0 / r), C + jnp.log(r)

            q, C = jax.lax.fori_loop(
                0, n_rs, rs_block, (q, C), unroll=n_rs)
            return q, C + msum

        # Seed: q = pi (frame 0's emission applied inside the loop needs
        # special casing; here we fold frame 0 by seeding with pi and
        # treating every frame uniformly — q0 @ A would be wrong for
        # frame 0, so pre-divide: q0 = pi @ A^{-1}... instead simply
        # seed q0 = pi and accept the extra A: corrected outside by
        # comparing against a reference computed the same way. For the
        # FLOOR measurement only timing matters; the accuracy check
        # uses the t==0 branch variant in fwd_prob2.
        q0 = pi + jnp.zeros((Bt, K), jnp.float32)
        C0 = jnp.zeros((Bt, 1), jnp.float32)
        q, C = jax.lax.fori_loop(0, n_chunks, chunk_body, (q0, C0))
        out_ref[:, :] = jnp.log(jnp.maximum(q, 1e-37)) + C

    pl.run_scoped(
        body,
        obs_buf=pltpu.VMEM((2, Bt, t_chunk, K), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("t_chunk", "precision", "rs"))
def floor_forward(log_obs, log_a, log_pi, t_chunk=128,
                  precision=jax.lax.Precision.DEFAULT, rs=8):
    B, T, K = log_obs.shape
    Kp = _ceil_to(K, LANES)
    Tp = _ceil_to(T, t_chunk)
    lo = _pad_to(log_obs.astype(jnp.float32), Kp, 2, _NEG)
    lo = _pad_to(lo, Tp, 1, 0.0)
    la = _pad_to(log_a.astype(jnp.float32), Kp, 0, _NEG)
    la = _pad_to(la, Kp, 1, _NEG)
    pa = jnp.exp(la)
    pi = jnp.exp(_pad_to(log_pi.astype(jnp.float32), Kp, 0, _NEG))[None, :]

    out = pl.pallas_call(
        functools.partial(_kernel, t_chunk=t_chunk, T=Tp,
                          b_tile=B, precision=precision, rs=rs),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Kp), jnp.float32),
        interpret=_use_interpret(),
    )(lo, pa, pi)
    return out


def main():
    key = jax.random.PRNGKey(0)
    B, K, T = 32, 64, 131072
    la = jax.nn.log_softmax(
        jax.random.normal(key, (K, K), jnp.float32), axis=-1)
    lpi = jnp.full((K,), -jnp.log(float(K)))
    lo = jax.random.normal(key, (B, T, K), jnp.float32)

    for name, prec, rs in (
        ("A HI rs8", jax.lax.Precision.HIGHEST, 8),
        ("B D  rs8", jax.lax.Precision.DEFAULT, 8),
        ("D D  rs16", jax.lax.Precision.DEFAULT, 16),
        ("E D  rs32", jax.lax.Precision.DEFAULT, 32),
    ):
        fn = lambda x, prec=prec, rs=rs: floor_forward(
            x, la, lpi, precision=prec, rs=rs).sum()
        ts = sorted(device_time(fn, lo, reps=2) for _ in range(3))
        print(f"{name}: {ts[1]*1e3:6.2f} ms "
              f"({ts[1]/T*1e9:6.1f} ns/frame)", flush=True)


if __name__ == "__main__":
    main()
