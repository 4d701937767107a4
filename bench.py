"""Driver benchmark: all five BASELINE configs on the real chip.

Prints ONE JSON line per config (headline LAST), each:
    {"metric": ..., "value": <real-time factor>, "unit": "x_realtime",
     "vs_baseline": <ours / reference RTX-3060 number>,
     "spread": {"min_ms": .., "p50_ms": .., "max_ms": ..}}

Configs (BASELINE.json / VERDICT round-1 item 2; 6-8 close the
remaining BASELINE.md rows):
  1. MixtureGaussianHMM decode  B=32 T=1000 S=12 C=4 D=80  (ref 3.2 ms)
  2. HSMM decode                B=32 T=1000 S=10 D=20      (ref 3.5 ms)
  3. Streaming chunk step p50   chunk=160 S=12 D=80 beam   (ref 1.1 ms)
  4. NeuralHMM forward          B=16 T=1000 S=12 H=256     (ref 5.1 ms)
  5. Long-context forward       B=32 T=131072 K=64         (ref: cannot)
  6. SemiMarkovHMM decode       B=24 T=800 S=10 D=20       (ref 4.2 ms)
  7. CTC forced alignment       B=16 T=500 C=40 U=50       (ref 180x RT)
  8. DTW alignment              500x500 frames, D=80       (ref 150x RT)
  9. Streaming e2e              PCM -> framer -> beam      (ref 445x RT,
     audio-in-to-states-out per 160-frame chunk             decode only)

Timing methodology: the remote-TPU runtime acknowledges dispatches
asynchronously (``block_until_ready`` returns before execution), so each
workload is chained ``R`` times through a data dependency inside one
jitted ``fori_loop`` and the (tiny) result is fetched once; per-call
device time = (time(2R) - time(R)) / R, which also cancels the fixed
host↔device round-trip. The chain program takes the trip count at
RUNTIME so one compilation serves both chain lengths. Each config runs
TRIALS such differences; the reported value uses the median (the spread
field records min/p50/max so cross-round comparisons are meaningful —
VERDICT round-1 item 10).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

FRAME_SEC = 0.01
TRIALS = 7
TARGET_CHAIN_SEC = 0.05   # R-chain device time floor (see measure())
MAX_REPS = 4096

# Session drift calibration (VERDICT r4 item 5): the long-context row
# drifted 29 -> 33.7 ms across sessions with "chip drift" as the only
# explanation on record. Every bench run now times a PINNED kernel — a
# fixed-shape pallas_forward_prob call that bypasses the auto dispatch,
# so dispatch/kernel changes in later rounds cannot alter it — and
# reports session_scale = measured / reference on every row. A row that
# moved with session_scale is chip/session drift; a row that moved
# against it is a code change. Reference value measured on v5e-1 in the
# r5 session (p50 of 7 device_time trials: 4.224, min 4.198, max 4.309).
_CAL_REF_MS = 4.224
_CAL_SHAPE = (32, 16384, 64)   # (B, T, K) — never change (see above)

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

    def chain(fn):
        @jax.jit
        def run(x, n):
            def body(i, acc):
                return acc + fn(x + 0.0 * acc)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return run

    def measure(fn, x, reps):
        run = chain(fn)

        def timed(n, samples=3):
            # Min of several fetches: tunnel noise is strictly additive
            # (measured RTT min 25.3 / p50 27.8 / max 39 ms on this
            # link), so the minimum is the low-noise statistic and a
            # min-vs-min difference is far stabler than single samples.
            n = jnp.int32(n)
            best = float("inf")
            for _ in range(samples):
                t0 = time.perf_counter()
                np.asarray(run(x, n))
                best = min(best, time.perf_counter() - t0)
            return best

        np.asarray(run(x, jnp.int32(reps)))  # compile once (n is runtime)

        # Estimator hygiene (VERDICT r2 item 7 / r3 item 3): the chained
        # difference time(2R) - time(R) only resolves the workload when
        # R*per_rep is well above the residual host/tunnel jitter
        # (~1 ms after min-filtering, on a ~25 ms RTT link). Calibrate:
        # measure the RTT with an empty chain (n=0 runs the same program
        # with zero body iterations) and scale R so the R-chain's device
        # time alone is >= TARGET_CHAIN_SEC. r3's DTW row (0.3 ms/call,
        # R=16 -> 4.6 ms chain vs 14 ms jitter) rejected 6/7 trials.
        rtt = timed(0)
        per_rep = max((timed(reps) - rtt) / reps, 1e-7)
        reps = max(reps, int(np.ceil(TARGET_CHAIN_SEC / per_rep)))
        reps = min(reps, MAX_REPS)

        # Reject any trial whose difference is < 25% of the per-rep cost
        # implied by the 2R run alone (non-monotone / near-zero samples
        # are physically impossible readings, not data).
        lats = []
        rejected = 0
        attempts = 0
        while len(lats) < TRIALS and attempts < 4 * TRIALS:
            attempts += 1
            t_r = timed(reps)
            t_2r = timed(2 * reps)
            diff = (t_2r - t_r) / reps
            if diff < 0.25 * ((t_2r - rtt) / (2 * reps)):
                rejected += 1
                continue
            lats.append(diff)
        if not lats:  # pathological host: fall back to raw 2R estimate
            lats = [
                (timed(2 * reps) - rtt) / (2 * reps) for _ in range(TRIALS)
            ]
        lats.sort()
        return {
            "min": lats[0],
            "p50": lats[len(lats) // 2],
            "max": lats[-1],
            "trials": len(lats),
            "rejected": rejected,
        }

    # ---- session calibration (pinned kernel; see _CAL_REF_MS) ----
    session_scale = None
    try:
        from pytorch_hmm_tpu.ops import pallas_forward_prob

        Bc, Tc, Kc = _CAL_SHAPE
        cal_obs = jax.random.normal(
            jax.random.PRNGKey(42), (Bc, Tc, Kc), jnp.float32
        )
        cal_la = jax.nn.log_softmax(
            jax.random.normal(jax.random.PRNGKey(43), (Kc, Kc)), axis=-1
        )
        cal_pi = jnp.full((Kc,), -jnp.log(float(Kc)))

        def cal_fn(x):
            _, lz = pallas_forward_prob(
                x, cal_la, cal_pi, precision=jax.lax.Precision.HIGHEST
            )
            return jnp.sum(lz)

        cal = measure(cal_fn, cal_obs, 8)
        session_scale = round(cal["p50"] * 1e3 / _CAL_REF_MS, 3)
        print(
            f"session calibration: pinned kernel p50="
            f"{cal['p50']*1e3:.3f} ms vs reference {_CAL_REF_MS} ms -> "
            f"session_scale={session_scale} (rows are annotated; a row "
            f"moving WITH this factor is chip/session drift)",
            file=sys.stderr, flush=True,
        )
    except Exception as e:  # pragma: no cover
        print(f"session calibration failed: {e!r}", file=sys.stderr,
              flush=True)

    def emit(name, lat, audio_sec, ref_latency_sec, ref_rtf_base=None):
        rtf = audio_sec / lat["p50"]
        if ref_rtf_base is None:
            vs = (ref_latency_sec / lat["p50"])
        else:
            vs = rtf / ref_rtf_base
        line = {
            "metric": name,
            "value": round(rtf, 1),
            "unit": "x_realtime",
            "vs_baseline": round(vs, 3),
            "spread": {
                "min_ms": round(lat["min"] * 1e3, 4),
                "p50_ms": round(lat["p50"] * 1e3, 4),
                "max_ms": round(lat["max"] * 1e3, 4),
                "trials": lat.get("trials", TRIALS),
                "rejected": lat.get("rejected", 0),
            },
        }
        if session_scale is not None:
            line["session_scale"] = session_scale
        try:
            from pytorch_hmm_tpu.roofline import audit

            roof = audit(name, lat["p50"])
            if roof is not None:
                line["roofline"] = roof
        except Exception:  # pragma: no cover - accounting must not kill bench
            pass
        print(
            f"{name}: p50={lat['p50']*1e3:.3f}ms "
            f"[{lat['min']*1e3:.3f}, {lat['max']*1e3:.3f}] "
            f"vs_baseline={line['vs_baseline']}",
            file=sys.stderr, flush=True,
        )
        return json.dumps(line)

    lines = []
    key = jax.random.PRNGKey(0)

    # ---- 2. HSMM decode (B=32, T=1000, S=10, D=20; ref 3.5 ms) ----
    try:
        from pytorch_hmm_tpu.models import HSMMLayer

        hsmm = HSMMLayer(
            num_states=10, feature_dim=80, max_duration=20,
            rngs=nnx.Rngs(0),
        )
        gd, st = nnx.split(hsmm)
        obs = jax.random.normal(key, (32, 1000, 80), jnp.float32)

        def hsmm_decode(o):
            m = nnx.merge(gd, st)
            states, score = m.viterbi_decode_hsmm(o)
            return jnp.sum(score) + jnp.sum(states[:, -1])

        # The Pallas segment-DP decode is ~0.25 ms/call; 64 reps keep
        # the chained total well above tunnel jitter (~1 ms).
        lat = measure(hsmm_decode, obs, 64)
        lines.append(emit(
            "hsmm_decode_rtf_b32_T1000_s10_d20", lat, 32 * 1000 * FRAME_SEC,
            3.5e-3,
        ))
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"hsmm bench failed: {e!r}", file=sys.stderr, flush=True)

    # ---- 3. Streaming chunk step p50 (chunk=160, S=12, D=80; ref 1.1 ms) --
    try:
        from pytorch_hmm_tpu.streaming import (
            StreamingHMMProcessor, _beam_step, _emit,
        )

        proc = StreamingHMMProcessor(
            num_states=12, feature_dim=80, chunk_size=160,
            use_beam_search=True, rngs=nnx.Rngs(0),
        )
        w = (
            proc.emission_hidden.kernel[...], proc.emission_hidden.bias[...],
            proc.emission_out.kernel[...], proc.emission_out.bias[...],
        )
        log_a = jnp.log(proc.get_transition_matrix() + 1e-8)
        carry0 = (proc._beam_scores, proc._beam_states,
                  proc._beam_paths, proc._beam_len)
        # 160 frames sit exactly on the 32-frame pad granule; the old
        # (192, 80) chunk ran 32 frozen pad frames (measured ~free —
        # +1 µs — but the exact shape matches the row's semantics and
        # the e2e row's workload).
        chunk = jax.random.normal(key, (160, 80), jnp.float32)
        n_valid = jnp.int32(160)

        def stream_step(x):
            lo = _emit(x, *w)
            carry, states, conf = _beam_step(log_a, lo, n_valid, carry0)
            return jnp.sum(conf) + jnp.sum(states)

        lat = measure(stream_step, chunk, 96)
        stream_p50 = lat["p50"]
        lines.append(emit(
            "streaming_chunk_p50_s12_d80_beam", lat, 160 * FRAME_SEC,
            1.1e-3,
        ))

        # ---- 3b. Multi-stream serving: 8 concurrent streams, ONE
        # kernel launch per chunk cadence (MultiStreamDecoder — no
        # reference analogue; its streaming is one stream per call).
        from pytorch_hmm_tpu.streaming import MultiStreamDecoder

        N_s = 8
        dec8 = MultiStreamDecoder(proc, n_streams=N_s, chunk_frames=160)
        carry8 = dec8.init_carry()
        feats8 = jax.random.normal(key, (N_s, 160, 80), jnp.float32)

        def multi_step(f):
            _, states, conf = dec8.step(carry8, f)
            return jnp.sum(conf) + jnp.sum(states)

        lat = measure(multi_step, feats8, 96)
        # Audio seconds per chunk = N streams x 160 frames; baseline:
        # the reference serves N streams with N sequential 1.1 ms calls.
        lines.append(emit(
            "multi_stream_8x_chunk_p50_s12_d80_beam", lat,
            N_s * 160 * FRAME_SEC, N_s * 1.1e-3,
        ))

        # 16-stream fleet (r5: bounded-unroll frame loops lifted the
        # N=8 VMEM cap — VERDICT r4 item 8).
        N16 = 16
        dec16 = MultiStreamDecoder(proc, n_streams=N16, chunk_frames=160)
        carry16 = dec16.init_carry()
        feats16 = jax.random.normal(key, (N16, 160, 80), jnp.float32)

        def multi_step16(f):
            _, states, conf = dec16.step(carry16, f)
            return jnp.sum(conf) + jnp.sum(states)

        lat = measure(multi_step16, feats16, 96)
        lines.append(emit(
            "multi_stream_16x_chunk_p50_s12_d80_beam", lat,
            N16 * 160 * FRAME_SEC, N16 * 1.1e-3,
        ))

        # ---- 9. End-to-end: raw PCM -> ON-DEVICE framing -> beam decode
        # in ONE jitted dispatch (VERDICT r3 item 4: the r3 path spent
        # 0.84 ms/chunk in the host C++ framer vs 0.095 ms of device
        # decode). Matmul-DFT framing + emission + beam step fuse into a
        # single TPU program (pytorch_hmm_tpu/frontend.py).
        from pytorch_hmm_tpu.frontend import make_pcm_decode_step

        pcm_step, pcm_carry = make_pcm_decode_step(proc, chunk_frames=160)
        rng_audio = np.random.default_rng(0)
        pcm_chunk = jnp.asarray(
            rng_audio.standard_normal(160 * 160).astype(np.float32)
        )

        def e2e_step(x):
            _, states, conf, _nv = pcm_step(pcm_carry, x)
            return jnp.sum(conf) + jnp.sum(states)

        lat_e2e = measure(e2e_step, pcm_chunk, 96)
        # Reference claims 445x RT for streaming DECODE ONLY
        # (PERFORMANCE.md:13); this row includes framing from raw PCM.
        lines.append(emit(
            "streaming_e2e_audio_to_states_p50_chunk160", lat_e2e,
            160 * FRAME_SEC, None, ref_rtf_base=445.0,
        ))

        # Host-framer comparison (the no-JAX-on-host option): one line to
        # keep the breakdown visible in the bench log.
        from pytorch_hmm_tpu.native import NativeFramer

        framer = NativeFramer(n_mels=80)
        hop_samples = framer.hop * 160
        pcm_np = np.asarray(pcm_chunk)
        framer.push(np.concatenate([pcm_np, pcm_np])); framer.pop()  # warm
        fr_ms = []
        for _ in range(50):
            t0 = time.perf_counter()
            framer.push(pcm_np[:hop_samples])
            framer.pop()
            fr_ms.append((time.perf_counter() - t0) * 1e3)
        fr_ms.sort()
        print(
            f"host framer ({'native' if framer.is_native else 'numpy'}) "
            f"alternative: p50={fr_ms[len(fr_ms)//2]:.3f}ms per 160 frames "
            f"(+ {stream_p50*1e3:.3f}ms device decode); fused on-device "
            f"path above is the default",
            file=sys.stderr, flush=True,
        )
    except Exception as e:  # pragma: no cover
        print(f"streaming bench failed: {e!r}", file=sys.stderr, flush=True)

    # ---- 6. SemiMarkovHMM decode (B=24, T=800, S=10, D=20; ref 4.2 ms) ----
    try:
        from pytorch_hmm_tpu.models import SemiMarkovHMM

        smm = SemiMarkovHMM(
            num_states=10, observation_dim=80, max_duration=20,
            rngs=nnx.Rngs(0),
        )
        gd_s, st_s = nnx.split(smm)
        obs = jax.random.normal(key, (24, 800, 80), jnp.float32)

        def smm_decode(o):
            m = nnx.merge(gd_s, st_s)
            path, _, score = m.viterbi_decode(o)
            return jnp.sum(score) + jnp.sum(path[:, -1])

        lat = measure(smm_decode, obs, 64)
        lines.append(emit(
            "semi_markov_decode_rtf_b24_T800_s10_d20", lat,
            24 * 800 * FRAME_SEC, 4.2e-3,
        ))
    except Exception as e:  # pragma: no cover
        print(f"semi-markov bench failed: {e!r}", file=sys.stderr, flush=True)

    # ---- 7. CTC forced alignment (B=16, T=500, C=40, U=50; ref 180x RT) --
    try:
        from pytorch_hmm_tpu.alignment import ctc_viterbi_alignment

        B_c, T_c, C_c, U_c = 16, 500, 40, 50
        lp = jax.nn.log_softmax(
            jax.random.normal(key, (T_c, B_c, C_c), jnp.float32), axis=-1
        )
        targets = (
            jax.random.randint(key, (B_c, U_c), 1, C_c)
        ).astype(jnp.int32)
        in_lens = jnp.full((B_c,), T_c, jnp.int32)
        tgt_lens = jnp.full((B_c,), U_c, jnp.int32)

        def ctc_align(x):
            ali, score = ctc_viterbi_alignment(
                x, targets, in_lens, tgt_lens
            )
            return jnp.sum(score) + jnp.sum(ali[:, -1])

        lat = measure(ctc_align, lp, 64)
        # Reference: 180x real time on RTX 3060 (PERFORMANCE.md:22).
        lines.append(emit(
            "ctc_forced_alignment_rtf_b16_T500_c40_u50", lat,
            B_c * T_c * FRAME_SEC, None, ref_rtf_base=180.0,
        ))
    except Exception as e:  # pragma: no cover
        print(f"ctc bench failed: {e!r}", file=sys.stderr, flush=True)

    # ---- 8. DTW alignment (500x500 frames, D=80; ref 150x RT) ----
    try:
        from pytorch_hmm_tpu.alignment import compute_distance_matrix
        from pytorch_hmm_tpu.alignment.dtw import dtw_path_padded

        x_d = jax.random.normal(key, (500, 80), jnp.float32)
        y_d = jax.random.normal(jax.random.PRNGKey(7), (500, 80), jnp.float32)

        # Full alignment (cost + path) via the jit-composable fast path
        # (Pallas wavefront kernel on TPU) — ``dtw_alignment`` itself
        # trims the path host-side.
        def dtw_fn(x):
            dist = compute_distance_matrix(x, y_d)
            pi, pj, length, cost = dtw_path_padded(dist)
            return (cost + jnp.sum(pi[-1] + pj[-1])
                    + length.astype(jnp.float32))

        lat = measure(dtw_fn, x_d, 16)
        # Reference: 150x real time on RTX 3060 (PERFORMANCE.md:21).
        lines.append(emit(
            "dtw_alignment_rtf_T500x500_d80", lat,
            500 * FRAME_SEC, None, ref_rtf_base=150.0,
        ))
    except Exception as e:  # pragma: no cover
        print(f"dtw bench failed: {e!r}", file=sys.stderr, flush=True)

    # ---- 4. NeuralHMM forward (B=16, T=1000, S=12, H=256; ref 5.1 ms) ----
    try:
        from pytorch_hmm_tpu.models import NeuralHMM

        nh = NeuralHMM(
            num_states=12, observation_dim=80, hidden_dim=256,
            rngs=nnx.Rngs(0),
        )
        nh.eval()  # inference benchmark: dropout off (no RNG mutation)
        gd_n, st_n = nnx.split(nh)
        obs = jax.random.normal(key, (16, 1000, 80), jnp.float32)

        def neural_fwd(o):
            m = nnx.merge(gd_n, st_n)
            gamma, alpha, beta = m(o)
            return jnp.sum(gamma[:, -1]) + jnp.sum(alpha[:, -1])

        lat = measure(neural_fwd, obs, 24)
        lines.append(emit(
            "neural_hmm_forward_rtf_b16_T1000_s12_h256", lat,
            16 * 1000 * FRAME_SEC, 5.1e-3,
        ))
    except Exception as e:  # pragma: no cover
        print(f"neural bench failed: {e!r}", file=sys.stderr, flush=True)

    # ---- 5. Long-context forward (B=32, T=131072, K=64) ----
    try:
        from pytorch_hmm_tpu import ops

        B, T, K = 32, 131072, 64
        lo = jax.random.normal(key, (B, T, K), jnp.float32)
        la = jax.nn.log_softmax(
            jax.random.normal(key, (K, K), jnp.float32), axis=-1
        )
        lpi = jnp.full((K,), -jnp.log(float(K)))

        def long_fwd(x):
            # auto dispatch: minimal-latency prob-space kernel at this
            # shape (precision from the mixed-precision policy).
            _, lz = ops.auto_forward(x, la, lpi)
            return jnp.sum(lz)

        lat = measure(long_fwd, lo, 2)
        # Reference cannot enter this regime; baseline = its best implied
        # frame rate (GMM decode: 32k frames / 3.2 ms = 10M frames/s).
        frames_per_sec = B * T / lat["p50"]
        lines.append(emit(
            "long_context_forward_rtf_b32_T131072_k64", lat,
            B * T * FRAME_SEC, None, ref_rtf_base=10e6 * FRAME_SEC,
        ))
        print(
            f"long-context: {frames_per_sec/1e6:.0f}M frames/s",
            file=sys.stderr, flush=True,
        )

        # Training at the same scale: d log Z / d log_obs (posteriors).
        # The VJP runs BOTH chains in one fused prob-space kernel pass
        # (ops/scan.py pallas_fb_prob; r3 measured 60 ms on separate
        # fwd+bwd kernels).
        def long_grad(x):
            g = jax.grad(
                lambda y: jnp.sum(ops.auto_log_likelihood(y, la, lpi))
            )(x)
            return jnp.sum(g[:, -1])

        lat = measure(long_grad, lo, 2)
        lines.append(emit(
            "long_context_grad_rtf_b32_T131072_k64", lat,
            B * T * FRAME_SEC, None, ref_rtf_base=10e6 * FRAME_SEC,
        ))
    except Exception as e:  # pragma: no cover
        print(f"long-context bench failed: {e!r}", file=sys.stderr,
              flush=True)

    # ---- 11. MXU-bound large-state likelihood (B=48, T=2048, K=512) --
    # VERDICT r4 item 1: every other row is a latency-bound small-K
    # chain; this row is REAL matrix work (one (48,512)x(512,512)
    # DEFAULT-precision dot per frame, ops/bigk.py) and reports MFU via
    # the roofline audit. The reference's benchmarks stop at 50 states
    # in Python loops (examples/benchmark.py:36-57).
    try:
        from pytorch_hmm_tpu.ops.bigk import bigk_log_likelihood

        Bk, Tk, Kk = 48, 2048, 512
        lo_k = jax.random.normal(key, (Bk, Tk, Kk), jnp.float32)
        la_k = jax.nn.log_softmax(
            jax.random.normal(key, (Kk, Kk), jnp.float32), axis=-1
        )
        lpi_k = jnp.full((Kk,), -jnp.log(float(Kk)))

        def bigk_fn(x):
            return jnp.sum(bigk_log_likelihood(x, la_k, lpi_k))

        lat = measure(bigk_fn, lo_k, 8)
        # Baseline convention matches the long-context rows: the
        # reference's best implied frame rate (10M frames/s at K=12) —
        # at K=512 its Python loops would be ~1800x slower still.
        lines.append(emit(
            "bigk_forward_ll_b48_T2048_k512", lat, Bk * Tk * FRAME_SEC,
            None, ref_rtf_base=10e6 * FRAME_SEC,
        ))
    except Exception as e:  # pragma: no cover
        print(f"bigk bench failed: {e!r}", file=sys.stderr, flush=True)

    # ---- 12. CTC forced alignment at ASR scale (S=2048 lattice) ------
    # The small row (7.) covers the reference shape; this one exercises
    # the 2-D lattice layout at the kernel's S cap (U=1000 labels,
    # S = 2U+1 = 2001 lattice states per frame).
    try:
        from pytorch_hmm_tpu.alignment import ctc_viterbi_alignment

        B_c2, T_c2, C_c2, U_c2 = 4, 2048, 100, 1000
        lp2 = jax.nn.log_softmax(
            jax.random.normal(key, (T_c2, B_c2, C_c2), jnp.float32),
            axis=-1,
        )
        targets2 = jax.random.randint(
            key, (B_c2, U_c2), 1, C_c2
        ).astype(jnp.int32)
        in2 = jnp.full((B_c2,), T_c2, jnp.int32)
        tg2 = jnp.full((B_c2,), U_c2, jnp.int32)

        def ctc_big(x):
            ali, score = ctc_viterbi_alignment(x, targets2, in2, tg2)
            return jnp.sum(score) + jnp.sum(ali[:, -1])

        lat = measure(ctc_big, lp2, 4)
        lines.append(emit(
            "ctc_forced_alignment_rtf_b4_T2048_c100_u1000", lat,
            B_c2 * T_c2 * FRAME_SEC, None, ref_rtf_base=180.0,
        ))
    except Exception as e:  # pragma: no cover
        print(f"ctc big bench failed: {e!r}", file=sys.stderr, flush=True)

    # ---- 10. Full-covariance GMM decode (same shape as headline) ----
    # VERDICT r2 item 3: every covariance family on a TPU fast path.
    try:
        from pytorch_hmm_tpu.models import MixtureGaussianHMMLayer as _MG

        model_f = _MG(
            num_states=12, feature_dim=80, num_components=4,
            covariance_type="full", rngs=nnx.Rngs(0),
        )
        obs_f = jax.random.normal(key, (32, 1000, 80), jnp.float32)
        # Serving path: parameters frozen into derived tables
        # (make_decoder hoists the ~0.07 ms Cholesky-inverse prologue —
        # the standard weight-preprocessing step of a serving engine).
        # Decodes are verified identical to the live-parameter path.
        dec_f = model_f.make_decoder()

        def decode_full(o):
            states, scores = dec_f(o, return_log_probs=True)
            return jnp.sum(scores) + jnp.sum(states[:, -1])

        lat = measure(decode_full, obs_f, 32)
        # Reference "full" covariance silently falls back to diagonal
        # (hmm_layer.py:311-319); its honest baseline is the same
        # 3.2 ms decode claim.
        lines.append(emit(
            "mixture_gaussian_full_cov_decode_rtf_b32_T1000_s12_c4_d80",
            lat, 32 * 1000 * FRAME_SEC, 3.2e-3,
        ))
    except Exception as e:  # pragma: no cover
        print(f"full-cov bench failed: {e!r}", file=sys.stderr, flush=True)

    # ---- 1. HEADLINE: GMM-HMM decode (B=32 T=1000 S=12 C=4 D=80) ----
    # Printed last so a last-line-only parser still records the headline.
    from pytorch_hmm_tpu.models import MixtureGaussianHMMLayer

    model = MixtureGaussianHMMLayer(
        num_states=12, feature_dim=80, num_components=4,
        covariance_type="diag", rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(model)
    obs = jax.random.normal(key, (32, 1000, 80), jnp.float32)

    def decode_once(o):
        m = nnx.merge(graphdef, state)
        states, scores = m(o, return_log_probs=True)
        return jnp.sum(scores) + jnp.sum(states[:, -1])

    lat = measure(decode_once, obs, 64)
    lines.append(emit(
        "mixture_gaussian_hmm_decode_rtf_b32_T1000_s12_c4_d80", lat,
        32 * 1000 * FRAME_SEC, 3.2e-3,
    ))

    print(
        f"device={jax.devices()[0].platform} trials={TRIALS} "
        f"(runtime-rep chained, RTT-cancelled)",
        file=sys.stderr, flush=True,
    )
    for line in lines:
        print(line, flush=True)


if __name__ == "__main__":
    main()
