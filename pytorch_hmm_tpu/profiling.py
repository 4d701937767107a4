"""Tracing and timing utilities.

The reference's only "profiling" is manual wall-clock timing with CUDA
sync in its benchmark script (``examples/benchmark.py:81-143``) and a
latency deque inside the streaming processor (SURVEY.md §5). Here:

* :func:`trace` — context manager around ``jax.profiler`` producing
  Perfetto/XProf traces for TPU kernels;
* :func:`device_time` — honest device-time measurement. On remote-
  attached TPUs, dispatch acknowledgements return before execution (we
  measured a serial T=128000 scan "completing" in 0.16 ms — physically
  impossible), so naive ``block_until_ready`` timing lies. This helper
  chains ``reps`` invocations through a data dependency inside one
  jitted ``fori_loop`` and fetches a scalar once, amortizing the
  round-trip: per-call time = total / reps;
* :func:`benchmark_op` — convenience wrapper returning a stats dict.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["trace", "device_time", "benchmark_op"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a ``jax.profiler`` trace (view with XProf / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_time(
    fn: Callable[..., Any],
    *args,
    reps: int = 20,
    target_chain_sec: float = 0.05,
    max_reps: int = 4096,
) -> float:
    """Pure device time per call, in seconds (round-trip cancelled).

    ``fn(*args)`` must return an array (or pytree); a scalar summary of
    the first leaf is threaded through chained calls so the device
    cannot elide or overlap them. Chains of length ``R`` and ``2R`` are
    each timed as the min of three fetches (tunnel noise is strictly
    additive — RTT min 25.3 / max 39 ms measured on this link — so the
    minimum is the low-noise statistic); their difference removes the
    fixed host↔device round-trip. ``R`` is auto-scaled so the R-chain's
    device time alone is >= ``target_chain_sec``: the RTT is measured
    with a zero-iteration chain of the SAME program, and ``reps`` grows
    until the chain clears the jitter floor. Short chains on a noisy
    link are how r3 got impossible 0.0 ms readings.
    """

    def summarize(out):
        leaf = jax.tree.leaves(out)[0]
        return jnp.sum(leaf).astype(jnp.float32)

    @jax.jit
    def chain(n, *args):
        def body(i, acc):
            shifted = tuple(
                a + jnp.zeros((), a.dtype) * acc.astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.inexact) else a
                for a in args
            )
            return acc + summarize(fn(*shifted))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def timed(n, samples=3):
        n = jnp.int32(n)
        best = float("inf")
        for _ in range(samples):
            t0 = time.perf_counter()
            np.asarray(chain(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    np.asarray(chain(jnp.int32(reps), *args))  # compile once (n runtime)
    rtt = timed(0)
    per_rep = max((timed(reps) - rtt) / reps, 1e-9)
    reps = min(max(reps, int(np.ceil(target_chain_sec / per_rep))), max_reps)

    t1 = timed(reps)
    t2 = timed(2 * reps)
    return max(t2 - t1, 1e-9) / reps


def benchmark_op(
    fn: Callable[..., Any],
    *args,
    reps: int = 20,
    label: str = "op",
) -> Dict[str, float]:
    """Device-time stats for one op configuration."""
    seconds = device_time(fn, *args, reps=reps)
    return {
        "label": label,
        "device_time_ms": seconds * 1e3,
        "reps": reps,
    }
