"""Measure candidate flagship decode paths on the real chip.

Chained-timing methodology from bench.py: R-rep data-dependent fori_loop,
latency = (time(2R) - time(R)) / R.
"""
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
from pytorch_hmm_tpu.core.viterbi import viterbi_blocked, viterbi_associative

B, T, S, C, D = 32, 1000, 12, 4, 80
REPS = 10

model = MixtureGaussianHMMLayer(S, D, C, "diag", rngs=nnx.Rngs(0))
graphdef, state = nnx.split(model)
key = jax.random.PRNGKey(0)
obs = jax.random.normal(key, (B, T, D), jnp.float32)

m = nnx.merge(graphdef, state)
log_obs_const = m.get_observation_log_probs(obs)
log_a = m._log_a()
log_pi = m._log_pi()


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
    return lat


# Emission-only
def emis(o):
    mm = nnx.merge(graphdef, state)
    return jnp.sum(mm.get_observation_log_probs(o))
measure("emission_only", emis, obs)

# Full model decode (current default path)
def full(o):
    mm = nnx.merge(graphdef, state)
    st, sc = mm(o, return_log_probs=True)
    return jnp.sum(sc) + jnp.sum(st[:, -1])
measure("full_decode_default", full, obs)

# Viterbi-only on precomputed log_obs, each variant
def v_scan(lo):
    st, sc = core.viterbi(lo, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])
measure("viterbi_scan", v_scan, log_obs_const)

for P in (8, 16, 25, 40):
    def v_blk(lo, P=P):
        st, sc = viterbi_blocked(lo, log_a, log_pi, blocks=P)
        return jnp.sum(sc) + jnp.sum(st[:, -1])
    measure(f"viterbi_blocked_P{P}", v_blk, log_obs_const)

def v_assoc(lo):
    st, sc = viterbi_associative(lo, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])
measure("viterbi_assoc", v_assoc, log_obs_const)

def v_pallas(lo):
    st, sc = pallas_viterbi(lo, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])
measure("viterbi_pallas", v_pallas, log_obs_const)

def f_pallas(lo):
    la, lz = pallas_forward(lo, log_a, log_pi)
    return jnp.sum(lz)
measure("forward_pallas", f_pallas, log_obs_const)

def f_scan(lo):
    la, lz = core.forward_log(lo, log_a, log_pi)
    return jnp.sum(lz)
measure("forward_scan", f_scan, log_obs_const)
