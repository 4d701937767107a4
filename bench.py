"""Headline benchmark: MixtureGaussianHMM batched decode (GMM emission
scoring + Viterbi) at the reference's benchmark config — batch=32, T=1000,
12 states, 4 components, 80-dim features (PERFORMANCE.md:11, BASELINE.json
configs[1]).

Prints ONE JSON line:
    {"metric": ..., "value": <real-time factor>, "unit": "x_realtime",
     "vs_baseline": <ours / reference RTX-3060 number>}

Real-time factor = total audio seconds decoded per wall-second of device
time, with the standard 10 ms frame hop. The reference reports 3.2 ms
latency for this workload on an RTX 3060 (PERFORMANCE.md:11).

Timing methodology: the remote-TPU runtime acknowledges dispatches
asynchronously (``block_until_ready`` returns before execution — measured
~1 ns/step otherwise, which is physically impossible for a serial scan),
so the decode is chained ``R`` times through a data dependency inside one
jitted ``fori_loop`` and the (tiny) result is fetched once; per-call
device time = total / R, with the host↔device round-trip amortized away.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

BATCH = 32
T = 1000
STATES = 12
COMPONENTS = 4
DIM = 80
FRAME_SEC = 0.01
REF_LATENCY_SEC = 3.2e-3  # RTX 3060, PERFORMANCE.md:11
REPS = 20

# The tunneled TPU worker occasionally needs recovery time after kernel
# faults; probe it in short-lived subprocesses (an in-process hang would
# block forever) and wait up to this long before measuring.
PROBE_WAIT_SEC = 1500
PROBE_INTERVAL_SEC = 60


def wait_for_device() -> bool:
    """Return True once a trivial device op completes; probe from
    subprocesses so a wedged worker can't hang the benchmark itself."""
    probe = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "np.asarray(jnp.ones(2) + 1)"
    )
    deadline = time.time() + PROBE_WAIT_SEC
    first = True
    while time.time() < deadline:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=90, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if first:
            print(
                "device not responding; waiting for recovery...",
                file=sys.stderr, flush=True,
            )
            first = False
        time.sleep(PROBE_INTERVAL_SEC)
    return False


def main():
    wait_for_device()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from pytorch_hmm_tpu.models import MixtureGaussianHMMLayer

    model = MixtureGaussianHMMLayer(
        num_states=STATES,
        feature_dim=DIM,
        num_components=COMPONENTS,
        covariance_type="diag",
        rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(model)

    def decode_once(state, obs):
        m = nnx.merge(graphdef, state)
        states, scores = m(obs, return_log_probs=True)
        # Tiny summary: forces full execution, costs ~nothing to fetch.
        return jnp.sum(scores) + jnp.sum(states[:, -1])

    @jax.jit
    def decode_chain(state, obs, n):
        # Runtime trip count: ONE compiled program serves both chain
        # lengths (halves remote-compile load on the flaky tunnel).
        def body(i, acc):
            return acc + decode_once(state, obs + 0.0 * acc)
        return jax.lax.fori_loop(0, n, body, 0.0)

    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (BATCH, T, DIM), jnp.float32)

    def timed(n):
        n = jnp.int32(n)
        np.asarray(decode_chain(state, obs, n))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(decode_chain(state, obs, n))
            best = min(best, time.perf_counter() - t0)
        return best

    latency = max(timed(2 * REPS) - timed(REPS), 1e-9) / REPS

    audio_sec = BATCH * T * FRAME_SEC
    rtf = audio_sec / latency
    ref_rtf = audio_sec / REF_LATENCY_SEC
    result = {
        "metric": "mixture_gaussian_hmm_decode_rtf_b32_T1000_s12_c4_d80",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / ref_rtf, 3),
    }
    print(
        f"device={jax.devices()[0].platform} latency={latency*1e3:.3f}ms "
        f"reps={REPS} (chained on-device)",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
