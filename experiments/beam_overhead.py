"""Break down the 0.26 ms streaming beam chunk: kernel vs host-side XLA ops."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from flax import nnx

# The single-stream beam kernel was superseded by the multi-stream
# kernel at N=1 (ops/stream_multi.py, r4); this shim keeps the probe
# runnable against the shipping dispatch path.
import jax.numpy as _jnp
from pytorch_hmm_tpu.ops.stream_multi import pallas_beam_chunk_multi as _pbm


def pallas_beam_chunk(la, lo, nv, carry):
    sc, ls, pt, pl_ = carry
    out = _pbm(la, lo[None], nv,
               (sc[None], ls[None], pt[None],
                _jnp.asarray(pl_, _jnp.int32)[None]))
    return tuple(x[0] for x in out)
from pytorch_hmm_tpu.profiling import device_time
from pytorch_hmm_tpu.streaming import (
    StreamingHMMProcessor, _beam_finalize, _beam_step, _emit,
)


def main():
    key = jax.random.PRNGKey(0)
    proc = StreamingHMMProcessor(
        num_states=12, feature_dim=80, chunk_size=160,
        use_beam_search=True, rngs=nnx.Rngs(0))
    log_a = jnp.log(proc.get_transition_matrix() + 1e-8)
    carry0 = (proc._beam_scores, proc._beam_states, proc._beam_paths,
              proc._beam_len)
    chunk = jax.random.normal(key, (192, 80), jnp.float32)
    w = (proc.emission_hidden.kernel[...], proc.emission_hidden.bias[...],
         proc.emission_out.kernel[...], proc.emission_out.bias[...])
    lo = _emit(chunk, *w)
    nv = jnp.int32(160)

    def t(name, fn, x, reps=96):
        ms = device_time(fn, x, reps=reps) * 1e3
        print(f"{name:22s} {ms:.4f} ms")

    t("emit", lambda x: jnp.sum(_emit(x, *w)), chunk)
    t("kernel", lambda x: jnp.sum(pallas_beam_chunk(log_a, x, nv, carry0)[0]), lo)
    t("kernel(all outs)", lambda x: sum(jnp.sum(o) for o in pallas_beam_chunk(log_a, x, nv, carry0)), lo)

    def kf(x):
        nc = pallas_beam_chunk(log_a, x, nv, carry0)
        carry, states, confs = _beam_finalize(nc, carry0[0], 192, nv)
        return jnp.sum(confs) + jnp.sum(states)
    t("kernel+finalize", kf, lo)

    def full(x):
        lo2 = _emit(x, *w)
        carry, states, confs = _beam_step(log_a, lo2, nv, carry0)
        return jnp.sum(confs) + jnp.sum(states)
    t("emit+step (bench)", full, chunk)

    # finalize alone (feeding precomputed kernel outputs)
    nc0 = jax.block_until_ready(pallas_beam_chunk(log_a, lo, nv, carry0))
    def fin(x):
        nc = (nc0[0] + 0.0 * x[0, 0], nc0[1], nc0[2], nc0[3])
        carry, states, confs = _beam_finalize(nc, carry0[0], 192, nv)
        return jnp.sum(confs) + jnp.sum(states)
    t("finalize alone", fin, lo)


if __name__ == "__main__":
    main()
