"""Test trellis frame-body variants: Mosaic axis-reduce vs explicit tree."""
import sys
import time
import functools

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_hmm_tpu.ops import scan as S

B, T, K = 32, 1000, 12
REPS = 10

key = jax.random.PRNGKey(0)
log_obs = jax.random.normal(key, (B, T, K), jnp.float32)
log_a = jax.nn.log_softmax(jax.random.normal(key, (K, K)), axis=-1)
log_pi = jnp.full((K,), -jnp.log(K * 1.0))


def make_trellis(body_kind):
    def kernel(lo_hbm, la_ref, lpi_ref, delta_out, dfin_ref, *,
               t_chunk, t_total, t_true, k_sub):
        Bt = dfin_ref.shape[0]
        Kp = la_ref.shape[1]
        n_chunks = t_total // t_chunk
        b0 = pl.program_id(0) * Bt

        def body(obs_buf, stage_buf, in_sems, out_sems):
            def in_dma(slot, chunk):
                return pltpu.make_async_copy(
                    lo_hbm.at[pl.ds(b0, Bt),
                              pl.ds(chunk * t_chunk, t_chunk), :],
                    obs_buf.at[slot], in_sems.at[slot])

            def out_dma(slot, chunk):
                return pltpu.make_async_copy(
                    stage_buf.at[slot],
                    delta_out.at[pl.ds(b0, Bt),
                                 pl.ds(chunk * t_chunk, t_chunk), :],
                    out_sems.at[slot])

            in_dma(0, 0).start()

            def chunk_body(c, delta):
                slot = c % 2

                @pl.when(c + 1 < n_chunks)
                def _():
                    in_dma((c + 1) % 2, c + 1).start()

                in_dma(slot, c).wait()

                @pl.when(c >= 2)
                def _():
                    out_dma(slot, c - 2).wait()

                def frame(tf, delta):
                    lo_t = obs_buf[slot, :, tf, :]
                    t = c * t_chunk + tf
                    d_sub = jax.lax.slice_in_dim(delta, 0, k_sub, axis=1)
                    if body_kind == "reduce":
                        scores = d_sub[:, :, None] + la_ref[:, :][None]
                        best = jnp.max(scores, axis=1) + lo_t
                    elif body_kind == "tree":
                        s = d_sub[:, :, None] + la_ref[:, :][None]
                        w = k_sub
                        while w > 1:
                            half = w // 2
                            s = jnp.maximum(s[:, :half], s[:, half:w])
                            w = half
                        best = s[:, 0] + lo_t
                    elif body_kind == "tree_fused":
                        half = k_sub // 2
                        la = la_ref[:, :]
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

                delta = jax.lax.fori_loop(0, t_chunk, frame, delta)
                out_dma(slot, c).start()
                return delta

            delta0 = jnp.full((Bt, Kp), S._NEG, jnp.float32)
            delta = jax.lax.fori_loop(0, n_chunks, chunk_body, delta0)

            @pl.when(n_chunks >= 2)
            def _():
                out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()

            out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()
            dfin_ref[:, :] = delta

        pl.run_scoped(
            body,
            obs_buf=pltpu.VMEM((2, Bt, t_chunk, Kp), jnp.float32),
            stage_buf=pltpu.VMEM((2, Bt, t_chunk, Kp), jnp.float32),
            in_sems=pltpu.SemaphoreType.DMA((2,)),
            out_sems=pltpu.SemaphoreType.DMA((2,)),
        )

    def run(lo_in):
        Bv, Tv, Kv = lo_in.shape
        b_tile = 32
        Kp = S.LANES
        k_sub = 16  # pow2 >= ceil(K, 8)
        t_chunk = 128
        Tp = S._ceil_to(Tv, t_chunk)
        Bp = S._ceil_to(Bv, b_tile)
        lo = S._pad_to(lo_in.astype(jnp.float32), Kp, 2, S._NEG)
        lo = S._pad_to(lo, Tp, 1, 0.0)
        lo = S._pad_to(lo, Bp, 0, 0.0)
        la_full = S._pad_to(log_a.astype(jnp.float32), Kp, 0, S._NEG)
        la_full = S._pad_to(la_full, Kp, 1, S._NEG)
        la_rows = la_full[:k_sub]
        lpi = S._pad_to(log_pi.astype(jnp.float32), Kp, 0, S._NEG)[None, :]
        nb = Bp // b_tile
        delta_hbm, dfin = pl.pallas_call(
            functools.partial(kernel, t_chunk=t_chunk, t_total=Tp,
                              t_true=Tv, k_sub=k_sub),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((k_sub, Kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Kp), lambda i: (0, 0),
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
            interpret=S._use_interpret(),
        )(lo, la_rows, lpi)
        return jnp.sum(dfin) + jnp.sum(delta_hbm[:, -1])

    return run


def chain(fn):
    @jax.jit
    def run(x, n):
        def body(i, acc):
            return acc + fn(x + 0.0 * acc)
        return jax.lax.fori_loop(0, n, body, 0.0)
    return run


def timed(run, x, n):
    n = jnp.int32(n)
    np.asarray(run(x, n))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(x, n))
        best = min(best, time.perf_counter() - t0)
    return best


def measure(name, fn, x):
    run = chain(fn)
    lat = max(timed(run, x, 2 * REPS) - timed(run, x, REPS), 1e-9) / REPS
    print(f"{name:40s} {lat*1e3:8.3f} ms", flush=True)


for kind in ("tree", "tree_fused"):
    measure(f"trellis_{kind}", make_trellis(kind), log_obs)

# Sanity: same final delta
from pytorch_hmm_tpu.ops import pallas_viterbi as _pv
import pytorch_hmm_tpu.core as _core
def trellis_ref(lo):
    st, sc = _core.viterbi(lo, log_a, log_pi)
    return None

st_ref, sc_ref = _core.viterbi(log_obs, log_a, log_pi)
st_p, sc_p = _pv(log_obs, log_a, log_pi)
print("pallas path match:", bool((np.asarray(st_ref) == np.asarray(st_p)).all()))
