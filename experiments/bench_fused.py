"""Decide the flagship decode default: fused vs pallas vs XLA."""
import sys
import time
import os

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from pytorch_hmm_tpu import core
from pytorch_hmm_tpu.models import MixtureGaussianHMMLayer
from pytorch_hmm_tpu.ops import pallas_viterbi
from pytorch_hmm_tpu.ops.fused import fused_gmm_viterbi

B, T, S, C, D = 32, 1000, 12, 4, 80
REPS = 25
TRIALS = 6

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


def chain(fn):
    @jax.jit
    def run(x, n):
        def body(i, acc):
            return acc + fn(x + 0.0 * acc)
        return jax.lax.fori_loop(0, n, body, 0.0)
    return run


candidates = {}


def emis(o):
    mm = nnx.merge(graphdef, state)
    return mm.get_observation_log_probs(o)


def xla_full(o):
    lo = emis(o)
    st, sc = core.viterbi(lo, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])
candidates["xla_full"] = (chain(xla_full), obs)


def pallas_full(o):
    lo = emis(o)
    st, sc = pallas_viterbi(lo, log_a, log_pi)
    return jnp.sum(sc) + jnp.sum(st[:, -1])
candidates["pallas2k_full"] = (chain(pallas_full), obs)


def fused_full(o):
    st, sc = fused_gmm_viterbi(
        o, means, log_vars, log_w, log_a, log_pi
    )
    return jnp.sum(sc) + jnp.sum(st[:, -1])
candidates["fused_full"] = (chain(fused_full), obs)

for name, (run, x) in candidates.items():
    t0 = time.perf_counter()
    np.asarray(run(x, jnp.int32(REPS)))
    np.asarray(run(x, jnp.int32(2 * REPS)))
    print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

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
    print(f"{name:20s} min={ls[0]*1e3:7.3f} med={ls[len(ls)//2]*1e3:7.3f} "
          f"max={ls[-1]*1e3:7.3f} ms", flush=True)

# correctness on-chip
lo = emis(obs)
s0, sc0 = core.viterbi(lo, log_a, log_pi)
s_f, sc_f = fused_gmm_viterbi(obs, means, log_vars, log_w, log_a, log_pi)
print("fused states match on TPU:",
      float(np.mean(np.asarray(s0) == np.asarray(s_f))))
print("fused scores max diff:",
      float(np.max(np.abs(np.asarray(sc0 - sc_f)))))
