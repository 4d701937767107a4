"""Scaling-efficiency measurement for the sharded DP kernels.

The BASELINE north star asks for frames/sec scaling efficiency at
1 chip / 1 host / N hosts. This harness measures weak scaling of the
block-parallel forward-backward and Viterbi over a ``(1, P)`` time mesh:
the per-device time block is held constant while P grows, so perfect
scaling keeps wall time flat (efficiency = t(1)/t(P)).

On real pods run it as-is after ``parallel.initialize_multihost()``; in
development it runs on the virtual CPU platform:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/scaling_bench.py --cpu

Output: one JSON report on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true",
                        help="force the (virtual multi-device) CPU platform")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--block", type=int, default=512,
                        help="time frames per device (weak scaling)")
    parser.add_argument("--states", type=int, default=16)
    parser.add_argument("--reps", type=int, default=10)
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from pytorch_hmm_tpu.parallel import make_mesh
    from pytorch_hmm_tpu.parallel.sharded import (
        sharded_forward_backward,
        sharded_viterbi,
    )
    from pytorch_hmm_tpu.profiling import device_time

    n = jax.device_count()
    sizes = [p for p in (1, 2, 4, 8, 16, 32) if p <= n]
    rng = np.random.default_rng(0)
    K = args.states
    la = jnp.asarray(np.log(rng.dirichlet(np.ones(K), size=K)), jnp.float32)
    lp = jnp.asarray(np.log(rng.dirichlet(np.ones(K))), jnp.float32)

    report = {
        "platform": jax.default_backend(),
        "note": (
            "virtual CPU mesh: all devices share one physical machine, so "
            "weak-scaling efficiency is expected to fall ~1/P; meaningful "
            "efficiencies require real multi-chip hardware"
        ) if jax.default_backend() == "cpu" else
        "weak scaling: per-device block held constant as devices grow",
        "devices": n,
        "batch": args.batch,
        "block_frames_per_device": args.block,
        "states": K,
        "weak_scaling": [],
    }
    base = None
    for p in sizes:
        mesh = make_mesh(data=1, time=p)
        T = args.block * p
        lo = jnp.asarray(
            rng.normal(size=(args.batch, T, K)), jnp.float32
        )
        t_fb = device_time(
            lambda o: sharded_forward_backward(o, la, lp, mesh)[3],
            lo, reps=args.reps,
        )
        t_vit = device_time(
            lambda o: sharded_viterbi(o, la, lp, mesh)[1],
            lo, reps=args.reps,
        )
        if base is None:
            base = (t_fb, t_vit)
        report["weak_scaling"].append({
            "devices": p,
            "total_frames": args.batch * T,
            "fb_ms": round(t_fb * 1e3, 3),
            "viterbi_ms": round(t_vit * 1e3, 3),
            "fb_efficiency": round(base[0] / t_fb, 3),
            "viterbi_efficiency": round(base[1] / t_vit, 3),
            "fb_frames_per_sec": round(args.batch * T / t_fb),
        })
        print(report["weak_scaling"][-1], file=sys.stderr)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
