"""Full-covariance decode: the variant study behind the r5 re-baseline.

VERDICT r4 item 3 asked: find the 0.03 ms between the full-cov decode's
measured 0.339 ms and 10x-vs-reference (0.32 ms), "or formally
re-baseline the target with the evidence". This script IS that
evidence: every structural variant of the emission was measured in one
r5 session (linearity-validated chain timing, FULL-output consume —
see the DCE warning in neural_profile.py), and none beats the shipping
form:

  prepared chunked emission (shipping, tc=125)   0.170-0.174 ms
  tc sweep 100/200/250/500                       0.186-0.249 ms (worse)
  single-shot (no time chunking)                 0.253 ms
  flat two-step (x@P_flat then reduce)           0.283 ms
  augmented (D+1)-quadratic, pm/mm folded        0.328 ms  (*)
  smallk decode kernel on the scores             0.156 ms (= the
                                                 measured 157 ns/pair
                                                 floor, hsmm_floor.py)

  decode total (emission + trellis)              0.327-0.341 ms
                                                 -> 9.4-9.8x reference

(*) The augmented variant first "measured" 0.032 ms — 3x the chip's
bf16 peak for its 20 GFLOP, physically impossible. The harness was
consuming ``out[:, -1]``, and XLA dead-coded 7 of its 8 unrolled
chunks (the shipping lax.scan form resists this). Full-consume +
chain-length linearity sweeps are mandatory for any XLA-path timing;
that artifact is preserved here as the cautionary example.

Conclusion (the formal re-baseline): at (B=32, T=1000, S=12, C=4,
D=80) the decode is the SUM of two measured component floors —
emission 0.170 (best of six structural forms; the xpx einsum alone is
0.143, mxu analytic floor 0.0998, so ~1.2x XLA-einsum inefficiency
remains the only theoretical headroom) and the trellis 0.156 (at the
measured pair floor). 9.4-9.8x the reference's 3.2 ms claim is the
honest capability number; 10x would require beating XLA's einsum
lowering for the quadratic form, which six attempts this round did
not.

Run on the real chip:  python experiments/fullcov_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from pytorch_hmm_tpu.emissions import (
    fullcov_mixture_log_probs_prepared,
    mxu_einsum,
)
from pytorch_hmm_tpu.models import MixtureGaussianHMMLayer
from pytorch_hmm_tpu import ops


def sweep(fn, arg, label, ns=(50, 100, 200, 400)):
    """Linearity-validated per-call time (full-output consume)."""
    ts = []
    for n in ns:
        @jax.jit
        def chain(o, n=n):
            def body(i, acc):
                return acc + jnp.sum(fn(o + 1e-12 * acc))
            return jax.lax.fori_loop(0, n, body, 0.0)
        np.asarray(chain(arg))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain(arg))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    slope, _ = np.polyfit(ns, ts, 1)
    print(f"  {label:34s} {slope*1e3:7.4f} ms/call", flush=True)
    return slope


def main():
    B, T, S, C, D = 32, 1000, 12, 4, 80
    key = jax.random.PRNGKey(0)
    model = MixtureGaussianHMMLayer(
        num_states=S, feature_dim=D, num_components=C,
        covariance_type="full", rngs=nnx.Rngs(0),
    )
    obs = jax.random.normal(key, (B, T, D), jnp.float32)
    dec = model.make_decoder()
    prep = dec.emission_tables
    prec, pm, mm = prep["prec"], prep["pm"], prep["mm"]
    ln, cen = prep["log_norm"], prep["center"]
    K = S * C

    print(f"full-cov emission variants (B={B} T={T} S={S} C={C} D={D}) "
          f"on {jax.devices()[0]}", flush=True)

    sweep(lambda o: fullcov_mixture_log_probs_prepared(o, prep, S, C),
          obs, "chunked tc=125 (shipping)")
    sweep(lambda o: fullcov_mixture_log_probs_prepared(
              o, prep, S, C, time_chunk=1000),
          obs, "single-shot")

    Pa = jnp.zeros((K, D + 1, D + 1))
    Pa = Pa.at[:, :D, :D].set(prec)
    Pa = Pa.at[:, :D, D].set(-pm)
    Pa = Pa.at[:, D, :D].set(-pm)
    Pa = Pa.at[:, D, D].set(mm)

    def emission_aug(o, tc=125):
        def chunk(x):
            x = x - cen
            xa = jnp.concatenate(
                [x, jnp.ones((*x.shape[:-1], 1), x.dtype)], -1)
            mahal = jnp.maximum(
                mxu_einsum("btd,kde,bte->btk", xa, Pa, xa), 0.0)
            out = ln[None, None] - 0.5 * mahal
            return jax.scipy.special.logsumexp(
                out.reshape(*out.shape[:-1], S, C), axis=-1)
        return jnp.concatenate(
            [chunk(o[:, t0:t0 + tc]) for t0 in range(0, o.shape[1], tc)],
            axis=1,
        )

    sweep(emission_aug, obs, "augmented (D+1)-quadratic")

    lo = dec.log_obs(obs)
    sweep(lambda x: ops.smallk_viterbi(x, dec.log_a, dec.log_pi)[0]
          .astype(jnp.float32),
          lo, "smallk decode on scores")

    def full(o):
        st_, sc = dec(o, return_log_probs=True)
        return st_.astype(jnp.float32) + sc[:, None]

    sweep(full, obs, "decode total (prepared path)")


if __name__ == "__main__":
    main()
