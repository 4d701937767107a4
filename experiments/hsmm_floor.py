"""Measure the HSMM segment-DP kernel's intrinsic per-frame floor.

VERDICT r4 item 4: the bench rows score the HSMM/SemiMarkov decodes
against the GENERIC transposed small-K floor (100 ns per chain step,
``roofline.V5E['serial_step_smallk']``), which reads as "30% on the
table" — while the r4 T-sweep argued the duration ring is intrinsically
more expensive per step (the (Ds, S, B) ring shift + Ds-slot max/lse
trees are ~4 sublane tiles of dependent VPU work per frame vs the plain
trellis's one). This script makes that claim a committed measurement:

1. T-sweep of the FULL decode kernel (``hsmm_smallk_viterbi`` on
   precomputed (B, T, S) scores) at the bench family shape
   S=10, D=20, B=32 → slope = ns per frame-PAIR (segment-DP step +
   backtrace step share the sweep since the kernel runs both chains).
2. The same sweep for the plain trellis (``smallk_viterbi``, D=1
   semantics) — the generic floor the roofline currently charges.
3. The ratio = the ring's intrinsic multiplier; the slope/2 is the
   measured per-chain-step floor to promote into
   ``roofline.V5E['serial_step_hsmm_ring']``.

Run on the real chip:  python experiments/hsmm_floor.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_hmm_tpu.ops import hsmm_smallk_viterbi, smallk_viterbi
from pytorch_hmm_tpu.profiling import device_time


def main():
    key = jax.random.PRNGKey(0)
    B, S, D = 32, 10, 20
    Ts = (500, 1000, 2000, 4000)

    la_h = jax.nn.log_softmax(
        jnp.where(jnp.eye(S, dtype=bool), -1e9, 0.0), axis=-1
    )
    la = jax.nn.log_softmax(jax.random.normal(key, (S, S)), axis=-1)
    lpi = jnp.full((S,), -jnp.log(float(S)))
    ld = jax.nn.log_softmax(jnp.zeros((S, D)), axis=-1)

    print(f"HSMM segment-DP kernel floor sweep  "
          f"(B={B}, S={S}, D={D}) on {jax.devices()[0]}", flush=True)

    hs_rows = []
    for T in Ts:
        lo = jax.random.normal(key, (B, T, S), jnp.float32)
        fn = lambda x: hsmm_smallk_viterbi(x, la_h, lpi, ld)[0]
        # ONE device_time call per shape (it min-filters 3 fetches per
        # chain internally; a fresh call would re-jit its chain).
        t = device_time(fn, lo, reps=16)
        hs_rows.append((T, t))
        print(f"  hsmm  T={T:5d}: {t*1e3:7.3f} ms "
              f"({t/T*1e9:6.1f} ns/frame-pair)", flush=True)
    slope_h, int_h = np.polyfit(
        [r[0] for r in hs_rows], [r[1] for r in hs_rows], 1
    )

    pl_rows = []
    for T in Ts:
        lo = jax.random.normal(key, (B, T, S), jnp.float32)
        fn = lambda x: smallk_viterbi(x, la, lpi)[0]
        t = device_time(fn, lo, reps=16)
        pl_rows.append((T, t))
        print(f"  plain T={T:5d}: {t*1e3:7.3f} ms "
              f"({t/T*1e9:6.1f} ns/frame-pair)", flush=True)
    slope_p, int_p = np.polyfit(
        [r[0] for r in pl_rows], [r[1] for r in pl_rows], 1
    )

    print(f"\nhsmm : {slope_h*1e9:6.1f} ns/frame-pair + "
          f"{int_h*1e6:.1f} us intercept")
    print(f"plain: {slope_p*1e9:6.1f} ns/frame-pair + "
          f"{int_p*1e6:.1f} us intercept")
    print(f"ring multiplier: {slope_h/slope_p:.2f}x; per-chain-step "
          f"floor = {slope_h/2*1e9:.0f} ns "
          f"(promote into roofline.V5E['serial_step_hsmm_ring'])")


if __name__ == "__main__":
    main()
