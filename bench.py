"""Headline benchmark: MixtureGaussianHMM batched decode (GMM emission
scoring + Viterbi) at the reference's benchmark config — batch=32, T=1000,
12 states, 4 components, 80-dim features (PERFORMANCE.md:11, BASELINE.json
configs[1]).

Prints ONE JSON line:
    {"metric": ..., "value": <real-time factor>, "unit": "x_realtime",
     "vs_baseline": <ours / reference RTX-3060 number>}

Real-time factor = total audio seconds decoded per wall-second, with the
standard 10 ms frame hop. The reference reports 3.2 ms latency for this
workload on an RTX 3060 (PERFORMANCE.md:11) → RTF_ref = 32·1000·0.01 /
0.0032 = 100000. vs_baseline is our RTF divided by that.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

BATCH = 32
T = 1000
STATES = 12
COMPONENTS = 4
DIM = 80
FRAME_SEC = 0.01
REF_LATENCY_SEC = 3.2e-3  # RTX 3060, PERFORMANCE.md:11


def main():
    from pytorch_hmm_tpu.models import MixtureGaussianHMMLayer

    model = MixtureGaussianHMMLayer(
        num_states=STATES,
        feature_dim=DIM,
        num_components=COMPONENTS,
        covariance_type="diag",
        rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(model)

    @jax.jit
    def decode(state, obs):
        m = nnx.merge(graphdef, state)
        return m(obs, return_log_probs=True)

    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (BATCH, T, DIM), jnp.float32)

    # Warmup/compile.
    states, scores = decode(state, obs)
    jax.block_until_ready((states, scores))

    reps = 20
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = decode(state, obs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    latency = sorted(times)[len(times) // 2]  # median

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
        f"reps={reps}",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
