"""Advanced features demo (reference: ``examples/advanced_features_demo.py``):
DTW, CTC, neural HMMs, semi-Markov models, streaming, metrics, factories,
and an end-to-end integration workflow.

Run: python examples/advanced_features_demo.py [--quick]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

import pytorch_hmm_tpu as ph


def demo_dtw():
    print("\n=== DTW alignment ===")
    rng = np.random.default_rng(0)
    text_feats = jnp.asarray(rng.normal(size=(12, 32)), jnp.float32)
    audio_feats = jnp.asarray(rng.normal(size=(80, 32)), jnp.float32)
    pi, pj, cost = ph.dtw_alignment(text_feats, audio_feats)
    print(f"path length {len(np.asarray(pi))}, cost {float(cost):.2f}")
    align, cost = ph.alignment.soft_dtw_alignment(text_feats, audio_feats, gamma=0.1)
    print(f"soft-DTW expected alignment {align.shape}, cost {float(cost):.2f}")


def demo_ctc():
    print("\n=== CTC alignment ===")
    rng = np.random.default_rng(1)
    T, B, C, U = 60, 2, 10, 8
    lp = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(T, B, C)), jnp.float32), -1)
    targets = jnp.asarray(rng.integers(1, C, size=(B, U)))
    il, tl = jnp.full((B,), T), jnp.full((B,), U)
    aligner = ph.CTCAligner(num_classes=C)
    loss = aligner(lp, targets, il, tl)
    aligns = aligner.align(lp, targets, il, tl)
    decoded = aligner.decode(lp, il, beam_width=4)
    print(f"ctc loss {float(loss):.3f}; forced alignment head "
          f"{np.asarray(aligns[0])[:12]}; beam decode {np.asarray(decoded[0])[:8]}")


def demo_neural_hmm():
    print("\n=== Neural / Contextual HMM ===")
    rng = np.random.default_rng(2)
    model = ph.ContextualNeuralHMM(
        num_states=6, observation_dim=20, phoneme_vocab_size=30,
        linguistic_context_dim=16, prosody_dim=4, hidden_dim=64,
        rngs=nnx.Rngs(0),
    ).eval()
    obs = jnp.asarray(rng.normal(size=(2, 50, 20)), jnp.float32)
    phonemes = jnp.asarray(rng.integers(0, 30, size=(2, 50)))
    prosody = jnp.asarray(rng.normal(size=(2, 50, 4)), jnp.float32)
    post, fwd, bwd = model.forward_with_context(obs, phonemes, prosody)
    ctx = model.encode_context(phonemes, prosody)
    states, score = model.viterbi_decode(obs, ctx)
    print(f"posteriors {post.shape}, dynamic-transition Viterbi {states.shape}")


def demo_semi_markov():
    print("\n=== Semi-Markov HMM ===")
    rng = np.random.default_rng(3)
    sm = ph.SemiMarkovHMM(4, 12, max_duration=15, rngs=nnx.Rngs(0))
    obs = jnp.asarray(rng.normal(size=(100, 12)), jnp.float32)
    states, durations, lp = sm.viterbi_decode(obs)
    print(f"segments: states {np.asarray(states)}, durations "
          f"{np.asarray(durations)}, logp {float(lp):.1f}")
    s, d, o = sm.sample(5, max_length=60, key=jax.random.PRNGKey(0))
    print(f"sampled {len(np.asarray(s))} segments, {o.shape[0]} frames")


def demo_streaming():
    print("\n=== Streaming decode ===")
    proc = ph.ModelFactory.create_realtime_model(6, 24)
    rng = np.random.default_rng(4)
    for i in range(6):
        result = proc.process_chunk(rng.normal(size=(160, 24)).astype(np.float32))
        print(f"  chunk {i}: {result.status}, "
              f"{result.processing_time_ms:.1f} ms")
    stats = proc.get_performance_stats()
    print(f"RTF {stats['real_time_factor']:.1f}, "
          f"mode {stats['processing_mode']}")


def demo_metrics():
    print("\n=== Evaluation metrics ===")
    rng = np.random.default_rng(5)
    gt_mfcc = jnp.asarray(rng.normal(size=(100, 13)), jnp.float32)
    pred_mfcc = gt_mfcc + 0.1 * jnp.asarray(rng.normal(size=(100, 13)), jnp.float32)
    out = ph.comprehensive_speech_evaluation(
        {"mfcc": pred_mfcc, "durations": jnp.asarray([10.0, 20, 30])},
        {"mfcc": gt_mfcc, "durations": jnp.asarray([11.0, 19, 33])},
    )
    ph.print_evaluation_summary(out)


def demo_factories():
    print("\n=== Factories ===")
    korean = ph.create_korean_tts_hmm()
    print(f"korean TTS model: {korean.num_states} states")
    asr = ph.ModelFactory.create_asr_model(20, 40)
    print(f"ASR model: {asr.get_model_info()['total_parameters']} params")
    for style in ("normal", "fast", "slow", "emotional"):
        P = ph.get_speech_transitions(6, style)
        print(f"  {style}: self-loop {float(P[0, 0]):.2f}")


def demo_integration_workflow(quick: bool):
    """End-to-end TTS evaluation workflow (reference
    ``advanced_features_demo.py:428-514``): align synthetic speech to a
    phoneme model, extract durations, compare acoustics with DTW, and
    score everything with the metrics module."""
    print("\n=== Integration workflow ===")
    num_phones, D = 6, 16
    key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)

    # 1. Ground truth: a phone sequence with known durations + acoustics.
    true_dur = np.array([8, 14, 6, 18, 10, 12])
    true_path = np.repeat(np.arange(num_phones), true_dur)
    T = int(true_dur.sum())
    phone_means = 2.5 * jax.random.normal(k1, (num_phones, D))
    ref_mel = phone_means[true_path] + 0.4 * jax.random.normal(k2, (T, D))

    # 2. Forced alignment against an L2R phoneme HMM.
    model = ph.GaussianHMMLayer(num_phones, D, rngs=nnx.Rngs(0))
    model.means[...] = phone_means
    log_obs = model._compute_gaussian_log_probs(ref_mel[None])[0]
    hmm = ph.HMM(ph.create_left_to_right_matrix(num_phones,
                                                self_loop_prob=0.85))
    path, _ = hmm.viterbi_decode(jnp.exp(jax.nn.log_softmax(log_obs, -1)))
    pred_dur = np.asarray(ph.compute_state_durations(path))
    print(f"alignment recovered {pred_dur.size}/{true_dur.size} segments")

    # 3. "Synthesized" audio at a different speaking rate -> DTW maps it
    #    back onto the reference timeline.
    rate = 1.3
    synth_T = int(T * rate)
    idx = np.clip((np.arange(synth_T) / rate).astype(int), 0, T - 1)
    synth_mel = ref_mel[idx] + 0.2 * jax.random.normal(k3, (synth_T, D))
    pi, pj, cost = ph.dtw_alignment(synth_mel, ref_mel)
    print(f"DTW path: {len(np.asarray(pi))} steps, "
          f"normalized cost {float(cost) / synth_T:.3f}")

    # 4. Metrics roll-up.
    out = ph.comprehensive_speech_evaluation(
        {"mfcc": synth_mel[np.asarray(pi)],
         "durations": jnp.asarray(pred_dur, jnp.float32),
         "alignment": path},
        {"mfcc": ref_mel[np.asarray(pj)],
         "durations": jnp.asarray(true_dur, jnp.float32),
         "alignment": jnp.asarray(true_path)},
    )
    ph.print_evaluation_summary(out)


def main(quick: bool = False):
    demo_dtw()
    demo_ctc()
    demo_neural_hmm()
    demo_semi_markov()
    demo_streaming()
    demo_metrics()
    demo_factories()
    demo_integration_workflow(quick)
    print("\nAll demos finished.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    main(parser.parse_args().quick)
