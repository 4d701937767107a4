"""Piecewise profile of the NeuralHMM forward chain (VERDICT r4 item 3).

The bench row (B=16, T=1000, S=12, H=256) measured 0.213 ms vs an
additive 0.133 ms ceiling (emission hbm + fused-FB serial + posterior
hbm) — 0.08 ms unexplained. This script times each sequential piece of
the real path in isolation so the gap is attributed, not guessed:

  1. emission      — observation_model.log_probs (trunk + gaussian head)
  2. fbsum kernel  — fbsum_smallk on precomputed log_obs (incl. its
                     transpose/pad prologue + readback epilogue)
  3. auto FB       — auto_forward_backward (2 + conditioning epilogue:
                     shift, csh cumsum, gamma lse, alpha/beta rebuild)
  4. exp outputs   — the three jnp.exp materializations of __call__
  5. full forward  — the whole m(o) (should ≈ 1 + 3 + 4)

MEASUREMENT WARNING (r5): consume the FULL output of each piece
(``jnp.sum(out)``) — a sliced consume like ``out[:, -1]`` lets XLA
push the slice into frame-local producers or dead-code whole unrolled
chunks, silently timing a fraction of the work (an unrolled-chunk
emission variant "measured" 0.03 ms for 20 GFLOP this way — 3x the
chip's peak). Pallas-call pieces resist this (opaque), XLA chains do
not, so sliced consumes BIAS comparisons toward XLA. Validate any
surprising number with a chain-length linearity sweep.

Run on the real chip:  python experiments/neural_profile.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import nnx

from pytorch_hmm_tpu.models import NeuralHMM
from pytorch_hmm_tpu.ops import auto_forward_backward
from pytorch_hmm_tpu.ops.fbsum import fbsum_smallk
from pytorch_hmm_tpu.profiling import device_time


def t_ms(fn, x, reps=24):
    return sorted(device_time(fn, x, reps=reps) for _ in range(3))[1] * 1e3


def main():
    key = jax.random.PRNGKey(0)
    B, T, S, H, D = 16, 1000, 12, 256, 80
    nh = NeuralHMM(
        num_states=S, observation_dim=D, hidden_dim=H, rngs=nnx.Rngs(0)
    )
    nh.eval()
    gd, st = nnx.split(nh)
    obs = jax.random.normal(key, (B, T, D), jnp.float32)

    def emission(o):
        m = nnx.merge(gd, st)
        return jnp.sum(m.observation_model.log_probs(o))

    lo = nnx.merge(gd, st).observation_model.log_probs(obs)
    la = jax.nn.log_softmax(
        nnx.merge(gd, st).transition_matrix[...], axis=-1
    )
    lpi = nnx.merge(gd, st)._log_pi()

    def kernel_only(x):
        a, b, z = fbsum_smallk(x, la, lpi)
        return jnp.sum(a) + jnp.sum(b) + jnp.sum(z)

    def auto_fb(x):
        lg, a, b, z = auto_forward_backward(x, la, lpi)
        return jnp.sum(lg) + jnp.sum(a) + jnp.sum(z)

    def exp_outputs(x):
        return (jnp.sum(jnp.exp(x)) + jnp.sum(jnp.exp(x - 1.0))
                + jnp.sum(jnp.exp(x + 1.0)))

    def full(o):
        m = nnx.merge(gd, st)
        gamma, alpha, beta = m(o)
        return jnp.sum(gamma) + jnp.sum(alpha)

    print(f"NeuralHMM piece profile (B={B} T={T} S={S} H={H}) on "
          f"{jax.devices()[0]}", flush=True)
    e = t_ms(emission, obs)
    print(f"  1 emission            : {e:7.3f} ms", flush=True)
    k = t_ms(kernel_only, lo, reps=48)
    print(f"  2 fbsum kernel        : {k:7.3f} ms", flush=True)
    f = t_ms(auto_fb, lo, reps=48)
    print(f"  3 auto_forward_backward: {f:7.3f} ms "
          f"(epilogue = {f-k:6.3f})", flush=True)
    x = t_ms(exp_outputs, lo, reps=48)
    print(f"  4 three exp outputs   : {x:7.3f} ms", flush=True)
    tot = t_ms(full, obs)
    print(f"  5 full forward        : {tot:7.3f} ms "
          f"(sum of pieces 1+3+4 = {e+f+x:6.3f})", flush=True)


if __name__ == "__main__":
    main()
