"""Robust interleaved benchmark: round-robin trials, min + median stats.

The tunneled v5e's effective clock varies run to run (~2x), so
candidates are interleaved and compared on their MINIMUM chained
latency (closest to peak clock, same treatment for all candidates).
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

B, T, S, C, D = 32, 1000, 12, 4, 80
REPS = 25
TRIALS = 6

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


candidates = {}


def add(name, fn, x):
    candidates[name] = (chain(fn), x)


def v_scan(lo):
    st, sc = core.viterbi(lo, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])
add("viterbi_scan", v_scan, log_obs_const)


def v_pallas(lo):
    st, sc = pallas_viterbi(lo, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])
add("viterbi_pallas", v_pallas, log_obs_const)


def f_scan(lo):
    la, lz = core.forward_log(lo, log_a, log_pi)
    return jnp.sum(lz)
add("forward_scan", f_scan, log_obs_const)


def f_pallas(lo):
    la, lz = pallas_forward(lo, log_a, log_pi)
    return jnp.sum(lz)
add("forward_pallas", f_pallas, log_obs_const)


def full(o):
    mm = nnx.merge(graphdef, state)
    st, sc = mm(o, return_log_probs=True)
    return jnp.sum(sc) + jnp.sum(st[:, -1])
add("full_decode_default", full, obs)

# Warm/compile all
for name, (run, x) in candidates.items():
    np.asarray(run(x, jnp.int32(REPS)))
    np.asarray(run(x, jnp.int32(2 * REPS)))
    print(f"compiled {name}", flush=True)

lat = {name: [] for name in candidates}
for trial in range(TRIALS):
    for name, (run, x) in candidates.items():
        t0 = time.perf_counter()
        np.asarray(run(x, jnp.int32(REPS)))
        t_r = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(x, jnp.int32(2 * REPS)))
        t_2r = time.perf_counter() - t0
        lat[name].append(max(t_2r - t_r, 1e-9) / REPS)

for name, ls in lat.items():
    ls = sorted(ls)
    print(f"{name:28s} min={ls[0]*1e3:7.3f} med={ls[len(ls)//2]*1e3:7.3f} "
          f"max={ls[-1]*1e3:7.3f} ms", flush=True)
