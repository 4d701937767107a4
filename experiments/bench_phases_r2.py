"""Phase breakdown of the flagship decode on the real chip (round 2)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from pytorch_hmm_tpu import core
from pytorch_hmm_tpu.models import MixtureGaussianHMMLayer
from pytorch_hmm_tpu.ops import pallas_viterbi, pallas_forward
from pytorch_hmm_tpu.ops.fused import fused_gmm_viterbi

B, T, S, C, D = 32, 1000, 12, 4, 80
REPS = 25

model = MixtureGaussianHMMLayer(S, D, C, "diag", rngs=nnx.Rngs(0))
graphdef, state = nnx.split(model)
key = jax.random.PRNGKey(0)
obs = jax.random.normal(key, (B, T, D), jnp.float32)
m = nnx.merge(graphdef, state)
log_a = m._log_a()
log_pi = m._log_pi()
means = m.means[...]
log_vars = m.cov_params[...]
log_w = jax.nn.log_softmax(m.mixture_weights_logits[...], axis=-1)
lo_pre = m.get_observation_log_probs(obs)


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
    print(f"{name:32s} {lat*1e3:8.3f} ms", flush=True)
    return lat


def emis(o):
    mm = nnx.merge(graphdef, state)
    return jnp.sum(mm.get_observation_log_probs(o)[:, -1])

def xla_vit(lo):
    st, sc = core.viterbi(lo, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])

def pal_vit(lo):
    st, sc = pallas_viterbi(lo, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])

def pal_fwd(lo):
    a, lz = pallas_forward(lo, log_a, log_pi)
    return jnp.sum(lz)

def fused(o):
    st, sc = fused_gmm_viterbi(o, means, log_vars, log_w, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])

measure("emission_only(xla)", emis, obs)
measure("xla_viterbi(on lo)", xla_vit, lo_pre)
measure("pallas_viterbi(on lo)", pal_vit, lo_pre)
measure("pallas_forward(on lo)", pal_fwd, lo_pre)
measure("fused_full", fused, obs)

from functools import partial
from pytorch_hmm_tpu.core.viterbi import viterbi_associative, viterbi_blocked

def assoc(lo):
    st, sc = viterbi_associative(lo, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])
measure("assoc_viterbi(on lo)", assoc, lo_pre)

for P in (8, 16, 32, 64):
    def blk(lo, P=P):
        st, sc = viterbi_blocked(lo, log_a, log_pi, blocks=P, unroll=16)
        return jnp.sum(sc) + jnp.sum(st[:, -1])
    measure(f"blocked_viterbi P={P}", blk, lo_pre)

from pytorch_hmm_tpu.ops.smallk import smallk_viterbi

def smk(lo):
    st, sc = smallk_viterbi(lo, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])
measure("smallk_viterbi(on lo)", smk, lo_pre)

def smk_full(o):
    mm = nnx.merge(graphdef, state)
    lo = mm.get_observation_log_probs(o)
    st, sc = smallk_viterbi(lo, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])
measure("smallk_full(emis+decode)", smk_full, obs)
