"""Validate the block-parallel cost model against measurements.

docs/performance.md claims the time-sharded DP costs

    t(P, T, K)  ~  a * (T/P) * K^3   (phase-1 operator folds)
                 + b * P * K^2       (phase-2 boundary exchange)
                 + c * (T/P) * K^2   (phase-3 exact rescan)

Two sweeps isolate the terms on the virtual CPU mesh:

1. Block sweep — fixed P, growing per-device block Tl = T/P. The model
   predicts wall time affine in Tl; the fitted slope is the per-frame
   fold+rescan cost and the intercept absorbs the (constant) exchange.
2. P sweep — fixed *tiny* block (the fold/rescan work per device is
   constant), growing P. The model predicts growth linear in P from the
   boundary-exchange term (on one machine this also absorbs scheduler
   contention; it is an upper bound on the exchange cost).

Run:  PYTHONPATH=. XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python experiments/scaling_model_check.py
Output: one JSON report on stdout (consumed by SCALING.md).
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pytorch_hmm_tpu.parallel import make_mesh
    from pytorch_hmm_tpu.parallel.sharded import sharded_forward_backward
    from pytorch_hmm_tpu.profiling import device_time

    rng = np.random.default_rng(0)
    B, K = 8, 16
    la = jnp.asarray(np.log(rng.dirichlet(np.ones(K), size=K)), jnp.float32)
    lp = jnp.asarray(np.log(rng.dirichlet(np.ones(K))), jnp.float32)

    def t_fb(P, Tl, reps=8):
        mesh = make_mesh(data=1, time=P)
        lo = jnp.asarray(rng.normal(size=(B, Tl * P, K)), jnp.float32)
        return device_time(
            lambda o: sharded_forward_backward(o, la, lp, mesh)[3],
            lo, reps=reps,
        )

    report = {"batch": B, "states": K, "devices": jax.device_count()}

    # 1. Block sweep at P=8: time vs per-device block length.
    blocks = [64, 128, 256, 512, 1024]
    ts = [t_fb(8, tl) * 1e3 for tl in blocks]
    slope, intercept = np.polyfit(blocks, ts, 1)
    pred = np.polyval([slope, intercept], blocks)
    r2 = 1 - np.sum((np.array(ts) - pred) ** 2) / np.sum(
        (np.array(ts) - np.mean(ts)) ** 2
    )
    report["block_sweep_P8"] = {
        "block_frames": blocks,
        "fb_ms": [round(t, 3) for t in ts],
        "fit_ms_per_frame": round(float(slope), 5),
        "fit_intercept_ms": round(float(intercept), 3),
        "linear_r2": round(float(r2), 4),
    }
    print("block sweep:", report["block_sweep_P8"], file=sys.stderr)

    # 2. P sweep at Tl=64: exchange/overhead growth with device count.
    ps = [1, 2, 4, 8]
    ts = [t_fb(p, 64) * 1e3 for p in ps]
    report["p_sweep_Tl64"] = {
        "devices": ps,
        "fb_ms": [round(t, 3) for t in ts],
        "note": (
            "single machine, 4 physical cores: growth past P=4 bundles "
            "the O(P*K^2) exchange with core contention — an upper "
            "bound on the exchange term"
        ),
    }
    print("p sweep:", report["p_sweep_Tl64"], file=sys.stderr)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
