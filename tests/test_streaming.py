"""Streaming processor tests (reference coverage: tests/test_streaming.py —
buffering state machine, greedy vs beam, perf stats, flush, async
round-trip, controller adaptation)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from pytorch_hmm_tpu.streaming import (
    AdaptiveLatencyController,
    StreamingHMMProcessor,
    StreamingResult,
)


def _proc(**kw):
    defaults = dict(
        num_states=5, feature_dim=8, chunk_size=20, lookahead_frames=5,
        max_delay_frames=60, use_beam_search=False, beam_width=4,
        rngs=nnx.Rngs(0),
    )
    defaults.update(kw)
    return StreamingHMMProcessor(**defaults)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_buffering_state_machine(rng):
    p = _proc()
    r1 = p.process_chunk(rng.normal(size=(10, 8)).astype(np.float32))
    assert r1.status == "buffering"
    assert r1.decoded_states is None
    assert r1.metadata["frames_needed"] > 0
    r2 = p.process_chunk(rng.normal(size=(10, 8)).astype(np.float32))
    assert r2.status == "buffering"
    r3 = p.process_chunk(rng.normal(size=(10, 8)).astype(np.float32))
    assert r3.status == "decoded"
    assert r3.decoded_states is not None
    assert (np.asarray(r3.decoded_states) < 5).all()


@pytest.mark.parametrize("use_beam", [False, True])
def test_stream_decodes_all_frames(rng, use_beam):
    p = _proc(use_beam_search=use_beam, lookahead_frames=0,
              max_delay_frames=100, chunk_size=16)
    total = 0
    for _ in range(4):
        r = p.process_chunk(rng.normal(size=(16, 8)).astype(np.float32))
        if r.decoded_states is not None:
            total += len(np.asarray(r.decoded_states))
            assert 0.0 <= r.confidence <= 1.0 + 1e-6
    assert total == 64, "every pushed frame must be decoded exactly once"


def test_greedy_matches_offline_greedy(rng):
    """The chunked greedy decode must equal one offline greedy pass over
    the concatenated stream (the carry is exact)."""
    p = _proc(use_beam_search=False, lookahead_frames=0,
              max_delay_frames=200, chunk_size=8)
    chunks = [rng.normal(size=(8, 8)).astype(np.float32) for _ in range(5)]
    streamed = []
    for c in chunks:
        r = p.process_chunk(c)
        if r.decoded_states is not None:
            streamed.extend(np.asarray(r.decoded_states).tolist())

    # Offline greedy with the same parameters.
    feats = jnp.asarray(np.concatenate(chunks))
    log_obs = np.asarray(p._emission_log_probs(feats))
    log_a = np.log(np.asarray(p.get_transition_matrix()) + 1e-8)
    prev = None
    offline = []
    for t in range(log_obs.shape[0]):
        if prev is None:
            scores = log_obs[t] - np.log(p.num_states)
        else:
            scores = log_a[prev] + log_obs[t]
        prev = int(np.argmax(scores))
        offline.append(prev)
    assert streamed == offline


def test_flush_buffer(rng):
    p = _proc(lookahead_frames=5)
    for _ in range(3):
        p.process_chunk(rng.normal(size=(10, 8)).astype(np.float32))
    r = p.flush_buffer()
    assert r is not None and r.status == "flushed"
    assert r.metadata["final_chunk"]
    assert p.flush_buffer() is None, "second flush has nothing to decode"


def test_performance_stats_and_breakdown(rng):
    p = _proc()
    assert "message" in p.get_performance_stats()
    for _ in range(4):
        p.process_chunk(rng.normal(size=(20, 8)).astype(np.float32))
    stats = p.get_performance_stats()
    assert stats["total_chunks_processed"] >= 1
    assert stats["avg_processing_time_ms"] > 0
    assert stats["processing_mode"] == "greedy"
    bd = p.get_latency_breakdown()
    assert bd["total"] > 0
    assert bd["emission_computation"] >= 0
    assert bd["viterbi_decoding"] >= 0


def test_optimize_for_latency_reduces_complexity(rng):
    p = _proc(use_beam_search=True, beam_width=4)
    for _ in range(4):
        p.process_chunk(rng.normal(size=(20, 8)).astype(np.float32))
    # Impossible target → must shed beam width (or drop beam search).
    before = p.beam_width
    p.optimize_for_latency(target_latency_ms=1e-6)
    assert (not p.use_beam_search) or p.beam_width < before
    # Very loose target → may re-enable / widen.
    p.optimize_for_latency(target_latency_ms=1e9)
    assert p.use_beam_search


def test_reset_streaming_state(rng):
    p = _proc(lookahead_frames=0, chunk_size=8)
    p.process_chunk(rng.normal(size=(8, 8)).astype(np.float32))
    assert p.total_frames_processed > 0
    p.reset_streaming_state()
    assert p.total_frames_processed == 0
    assert p.last_output_frame == -1
    assert len(p._buffer) == 0


def test_async_round_trip(rng):
    p = _proc(chunk_size=8, lookahead_frames=0, use_beam_search=True,
              beam_width=3)
    p.start_async_processing()
    for _ in range(5):
        assert p.add_audio_chunk_async(
            rng.normal(size=(8, 8)).astype(np.float32)
        )
    deadline = time.time() + 20.0
    results = []
    while len(results) < 5 and time.time() < deadline:
        r = p.get_result_async()
        if r is not None:
            results.append(r)
        else:
            time.sleep(0.05)
    p.stop_async_processing()
    assert len(results) == 5
    assert all(isinstance(r, StreamingResult) for r in results)


def test_controller_shrinks_on_high_latency():
    ctrl = AdaptiveLatencyController(target_latency_ms=50.0)
    recs = []
    ctrl.last_adjustment_time = -10.0
    for t in [100.0] * 15:
        recs.append(ctrl.update(t, 200))
    fired = [r for r in recs if r]
    assert fired, "controller must adjust at least once"
    assert fired[0]["chunk_size"] < 160


def test_controller_grows_on_low_latency():
    ctrl = AdaptiveLatencyController(target_latency_ms=50.0)
    ctrl.last_adjustment_time = -10.0
    recs = [ctrl.update(10.0, 200) for _ in range(15)]
    fired = [r for r in recs if r]
    assert fired and fired[0]["chunk_size"] > 160
    assert fired[0]["use_beam_search"] is True


def test_controller_cooldown():
    ctrl = AdaptiveLatencyController(target_latency_ms=50.0)
    ctrl.last_adjustment_time = -10.0
    for t in [100.0] * 15:
        ctrl.update(t, 200)
    # Immediately after an adjustment: cooldown silences further ones.
    assert ctrl.update(100.0, 200) == {}


def test_multiple_processors_coexist(rng):
    p1 = _proc(lookahead_frames=0, chunk_size=8)
    p2 = _proc(lookahead_frames=0, chunk_size=8, use_beam_search=True)
    r1 = p1.process_chunk(rng.normal(size=(8, 8)).astype(np.float32))
    r2 = p2.process_chunk(rng.normal(size=(8, 8)).astype(np.float32))
    assert r1.status == r2.status == "decoded"
