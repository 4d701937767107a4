"""Comprehensive benchmark harness (reference: ``examples/benchmark.py``).

Measures device time for the main model families across batch size,
sequence length and state count sweeps, and writes a JSON report.

Unlike the reference harness (wall clock + ``torch.cuda.synchronize``,
``benchmark.py:81-143``), timings here chain each op through a data
dependency inside a jitted loop (see ``pytorch_hmm_tpu.profiling``),
which stays honest on asynchronously-dispatched remote TPU backends.

Usage:
    python examples/benchmark.py [--quick] [--output report.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

import pytorch_hmm_tpu as ph
from pytorch_hmm_tpu.profiling import device_time


@dataclasses.dataclass
class BenchmarkConfig:
    """Sweep configuration (reference ``benchmark.py:36-57``)."""

    batch_sizes: tuple = (1, 4, 8, 16, 32)
    seq_lengths: tuple = (50, 100, 200, 500)
    num_states: tuple = (5, 10, 20, 50)
    feature_dim: int = 80
    reps: int = 10


def bench_basic_hmm(cfg: BenchmarkConfig) -> List[Dict]:
    """Forward-backward + Viterbi over the sweep (``benchmark.py:144-220``)."""
    rng = np.random.default_rng(0)
    results = []
    for K in cfg.num_states:
        P = ph.create_left_to_right_matrix(K)
        hmm = ph.HMM(P)
        for B in cfg.batch_sizes[-2:]:
            for T in cfg.seq_lengths[-2:]:
                obs = jnp.asarray(rng.random((B, T, K)), jnp.float32)
                t_fb = device_time(
                    lambda o: hmm.forward_backward(o)[0], obs, reps=cfg.reps
                )
                t_vit = device_time(
                    lambda o: hmm.viterbi_decode(o)[0], obs, reps=cfg.reps
                )
                results.append({
                    "suite": "basic_hmm", "B": B, "T": T, "K": K,
                    "forward_backward_ms": t_fb * 1e3,
                    "viterbi_ms": t_vit * 1e3,
                    "frames_per_sec": B * T / min(t_fb, t_vit),
                })
    return results


def bench_mixture_gaussian(cfg: BenchmarkConfig) -> List[Dict]:
    """GMM-HMM decode (the headline config, ``benchmark.py:222-300``)."""
    results = []
    for K, C in [(12, 4), (20, 8)]:
        model = ph.MixtureGaussianHMMLayer(
            K, cfg.feature_dim, C, rngs=nnx.Rngs(0)
        )
        graphdef, state = nnx.split(model)

        def decode(obs, _state=state, _graphdef=graphdef):
            m = nnx.merge(_graphdef, _state)
            st, sc = m(obs, return_log_probs=True)
            return sc

        for B, T in [(32, 1000), (8, 500)]:
            obs = jax.random.normal(
                jax.random.PRNGKey(0), (B, T, cfg.feature_dim)
            )
            t = device_time(decode, obs, reps=cfg.reps)
            results.append({
                "suite": "mixture_gaussian", "B": B, "T": T, "K": K,
                "components": C, "decode_ms": t * 1e3,
                "frames_per_sec": B * T / t,
                "x_realtime": B * T * 0.01 / t,
            })
    return results


def bench_hsmm(cfg: BenchmarkConfig) -> List[Dict]:
    """Explicit-duration decode (``benchmark.py:360-420``)."""
    results = []
    model = ph.HSMMLayer(10, cfg.feature_dim, max_duration=20,
                         rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(model)

    def decode(obs, _s=state, _g=graphdef):
        m = nnx.merge(_g, _s)
        return m(obs)[1]

    for B, T in [(8, 500), (4, 2000)]:
        obs = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.feature_dim))
        t = device_time(decode, obs, reps=max(cfg.reps // 2, 3))
        results.append({
            "suite": "hsmm", "B": B, "T": T, "states": 10,
            "max_duration": 20, "decode_ms": t * 1e3,
            "frames_per_sec": B * T / t,
        })
    return results


def bench_alignment(cfg: BenchmarkConfig) -> List[Dict]:
    """DTW + CTC (``benchmark.py:302-358``)."""
    rng = np.random.default_rng(2)
    results = []
    x = jnp.asarray(rng.normal(size=(100, 40)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(400, 40)), jnp.float32)
    t_dtw = device_time(
        lambda a, b: ph.alignment.dtw.dtw_distance(a, b), x, y,
        reps=cfg.reps,
    )
    results.append({"suite": "dtw", "N": 100, "M": 400,
                    "distance_ms": t_dtw * 1e3})

    T, B, Cc, U = 500, 8, 40, 30
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(T, B, Cc)), jnp.float32), axis=-1
    )
    targets = jnp.asarray(rng.integers(1, Cc, size=(B, U)))
    il = jnp.full((B,), T)
    tl = jnp.full((B,), U)
    t_ctc = device_time(
        lambda l: ph.alignment.ctc_loss(l, targets, il, tl), lp,
        reps=cfg.reps,
    )
    results.append({"suite": "ctc", "T": T, "B": B, "C": Cc, "U": U,
                    "loss_ms": t_ctc * 1e3})
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--output", default="benchmark_report.json")
    args = parser.parse_args()

    cfg = BenchmarkConfig()
    if args.quick:
        cfg = BenchmarkConfig(
            batch_sizes=(4, 8), seq_lengths=(50, 100),
            num_states=(5, 10), reps=3,
        )

    report = {
        "device": jax.devices()[0].platform,
        "jax_version": jax.__version__,
        "timestamp": time.time(),
        "results": [],
    }
    for suite in (bench_basic_hmm, bench_mixture_gaussian, bench_hsmm,
                  bench_alignment):
        print(f"Running {suite.__name__}...")
        report["results"].extend(suite(cfg))

    with open(args.output, "w") as f:
        json.dump(report, f, indent=2)
    print(f"Wrote {len(report['results'])} results to {args.output}")
    for r in report["results"]:
        print(r)


if __name__ == "__main__":
    main()
