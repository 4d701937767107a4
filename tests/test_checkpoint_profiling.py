"""Checkpoint / resume and profiling utility tests (SURVEY.md §5 —
subsystems the reference lacks entirely)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import pytorch_hmm_tpu as ph


def test_model_checkpoint_roundtrip(tmp_path):
    m = ph.MixtureGaussianHMMLayer(4, 8, 2, rngs=nnx.Rngs(0))
    obs = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 8))
    before = np.asarray(m.log_likelihood(obs))

    path = ph.save_checkpoint(str(tmp_path / "ckpt"), m, extras={"step": 7})

    fresh = ph.MixtureGaussianHMMLayer(4, 8, 2, rngs=nnx.Rngs(99))
    assert not np.allclose(np.asarray(fresh.log_likelihood(obs)), before)
    fresh, extras = ph.load_checkpoint(path, fresh, with_extras=True)
    np.testing.assert_allclose(
        np.asarray(fresh.log_likelihood(obs)), before, atol=1e-5
    )
    assert extras["step"] == 7


def test_checkpoint_covers_buffers(tmp_path):
    # Non-trainable transition buffer must persist too.
    m = ph.HMMLayer(num_states=3, learnable_transitions=False,
                    rngs=nnx.Rngs(0))
    m.transition_matrix[...] = ph.create_left_to_right_matrix(3, 0.9)
    path = ph.save_checkpoint(str(tmp_path / "ckpt"), m)
    fresh = ph.HMMLayer(num_states=3, learnable_transitions=False,
                        rngs=nnx.Rngs(0))
    ph.load_checkpoint(path, fresh)
    np.testing.assert_allclose(
        np.asarray(fresh.transition_matrix[...]),
        np.asarray(m.transition_matrix[...]),
    )


def test_streaming_session_resume():
    rng = np.random.default_rng(0)
    p = ph.StreamingHMMProcessor(
        4, 6, chunk_size=8, lookahead_frames=0, use_beam_search=True,
        beam_width=3, rngs=nnx.Rngs(0),
    )
    chunks = [rng.normal(size=(8, 6)).astype(np.float32) for _ in range(4)]
    p.process_chunk(chunks[0])
    p.process_chunk(chunks[1])
    snap = ph.streaming_session_state(p)

    # Continue on the original; replay the rest on a restored clone.
    r_orig = [p.process_chunk(c) for c in chunks[2:]]

    q = ph.StreamingHMMProcessor(
        4, 6, chunk_size=8, lookahead_frames=0, use_beam_search=True,
        beam_width=3, rngs=nnx.Rngs(0),
    )
    ph.restore_streaming_session(q, snap)
    r_rest = [q.process_chunk(c) for c in chunks[2:]]

    for a, b in zip(r_orig, r_rest):
        assert a.status == b.status
        if a.decoded_states is not None:
            np.testing.assert_array_equal(
                np.asarray(a.decoded_states), np.asarray(b.decoded_states)
            )


def test_device_time_sane():
    t = ph.device_time(lambda x: jnp.sum(x * x), jnp.ones((128, 128)),
                       reps=3)
    assert 0 < t < 5.0


def test_benchmark_op_dict():
    out = ph.benchmark_op(lambda x: x + 1, jnp.ones((8, 8)), reps=2,
                          label="add")
    assert out["label"] == "add" and out["device_time_ms"] > 0


def test_trace_context(tmp_path):
    with ph.trace(str(tmp_path / "trace")):
        np.asarray(jnp.sum(jnp.ones((16, 16))))
    # The trace directory should exist with content.
    assert any((tmp_path / "trace").rglob("*"))


def test_metrics_logger(tmp_path):
    import json as _json

    path = tmp_path / "metrics.jsonl"
    with ph.MetricsLogger(str(path), echo=False) as m:
        m.log(step=1, loss=jnp.float32(1.5))
        m.log(step=2, loss=0.75, note="ok")
    lines = [_json.loads(l) for l in path.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["loss"] == 1.5 and lines[1]["note"] == "ok"


def test_get_logger_singleton():
    a = ph.get_logger()
    b = ph.get_logger()
    assert a is b and a.handlers
