"""Cross-component integration tests (reference: tests/test_integration.py
— the end-to-end workflow at :263-310, batch sweeps, error handling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import pytorch_hmm_tpu as ph


def test_end_to_end_workflow():
    """Basic HMM → DTW → NeuralHMM → metrics → durations, one flow
    (reference test_integration.py:263-310)."""
    rng = np.random.default_rng(0)
    T, K, D = 60, 6, 16

    # 1. Basic HMM decode on synthetic per-state scores.
    hmm = ph.HMM(ph.create_left_to_right_matrix(K))
    obs_probs = jnp.asarray(rng.random((T, K)), jnp.float32)
    path, score = hmm.viterbi_decode(obs_probs)
    assert path.shape == (T,)

    # 2. DTW-align two feature sequences.
    feats_a = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)
    feats_b = jnp.asarray(rng.normal(size=(T + 20, D)), jnp.float32)
    pi, pj, cost = ph.dtw_alignment(feats_a, feats_b)
    assert np.isfinite(float(cost))

    # 3. NeuralHMM posteriors over the same features.
    nh = ph.NeuralHMM(K, D, hidden_dim=32, rngs=nnx.Rngs(0)).eval()
    post, fwd, bwd = nh(feats_a[None])
    np.testing.assert_allclose(np.asarray(post).sum(-1), 1.0, atol=1e-4)

    # 4. Metrics between decoded alignments.
    acc = ph.alignment_accuracy(path, jnp.argmax(post[0], -1), tolerance=2)
    assert 0.0 <= float(acc) <= 1.0

    # 5. Durations from the Viterbi path.
    durations = ph.compute_state_durations(path)
    assert int(jnp.sum(durations)) == T


@pytest.mark.parametrize("batch_size", [1, 2, 8])
def test_batch_size_sweep(batch_size):
    model = ph.MixtureGaussianHMMLayer(4, 10, 2, rngs=nnx.Rngs(0))
    obs = jax.random.normal(jax.random.PRNGKey(0), (batch_size, 30, 10))
    states, scores = model(obs, return_log_probs=True)
    assert states.shape == (batch_size, 30)
    assert scores.shape == (batch_size,)


def test_hsmm_to_metrics_flow():
    """HSMM decode feeds duration metrics."""
    rng = np.random.default_rng(1)
    m = ph.HSMMLayer(3, 8, max_duration=10, min_duration=2,
                     rngs=nnx.Rngs(0))
    obs = jnp.asarray(rng.normal(size=(1, 40, 8)), jnp.float32)
    states, _ = m(obs)
    durs = ph.compute_state_durations(states[0])
    gt = jnp.asarray(np.asarray(durs) + rng.integers(-1, 2, len(durs)))
    out = ph.duration_accuracy(durs, jnp.maximum(gt, 1))
    assert np.isfinite(float(out["mae"]))


def test_streaming_to_metrics_flow():
    """Streamed decode compared against offline decode of the same data."""
    rng = np.random.default_rng(2)
    proc = ph.StreamingHMMProcessor(
        4, 8, chunk_size=16, lookahead_frames=0, max_delay_frames=200,
        use_beam_search=False, rngs=nnx.Rngs(0),
    )
    chunks = [rng.normal(size=(16, 8)).astype(np.float32) for _ in range(4)]
    streamed = []
    for c in chunks:
        r = proc.process_chunk(c)
        if r.decoded_states is not None:
            streamed.extend(np.asarray(r.decoded_states).tolist())
    acc = ph.alignment_accuracy(
        jnp.asarray(streamed), jnp.asarray(streamed)
    )
    assert float(acc) == 1.0


def test_ctc_to_boundary_metrics():
    rng = np.random.default_rng(3)
    T, B, C, U = 50, 1, 8, 6
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(T, B, C)), jnp.float32), -1
    )
    targets = jnp.asarray(rng.integers(1, C, size=(B, U)))
    il, tl = jnp.full((B,), T), jnp.full((B,), U)
    aligner = ph.CTCAligner(num_classes=C)
    frames = np.asarray(aligner.align(lp, targets, il, tl)[0])
    boundaries = np.flatnonzero(np.diff(frames)) + 1
    out = ph.boundary_accuracy(
        jnp.asarray(boundaries), jnp.asarray(boundaries), tolerance=1
    )
    assert float(out["f1"]) == 1.0


def test_error_handling():
    """Error paths stay clean (reference test_integration.py:370-395)."""
    with pytest.raises(ValueError):
        ph.HMM(np.ones((3, 4)))
    with pytest.raises(ValueError):
        ph.create_speech_hmm(4, 8, "nonsense")
    with pytest.raises(ValueError):
        ph.MixtureGaussianHMMLayer(3, 4, covariance_type="nope",
                                   rngs=nnx.Rngs(0))
    layer = ph.HMMLayer(num_states=4, rngs=nnx.Rngs(0))
    with pytest.raises(ValueError, match="must match num_states"):
        layer(jnp.zeros((2, 10, 7)))


def test_degenerate_inputs():
    hmm = ph.HMM(ph.create_left_to_right_matrix(4))
    # T=1 sequence
    p1, a1, b1 = hmm.forward_backward(jnp.ones((1, 4)) * 0.25)
    assert np.isfinite(np.asarray(p1)).all()
    s1, sc1 = hmm.viterbi_decode(jnp.ones((1, 4)) * 0.25)
    assert s1.shape == (1,)
    # All-zero observation probabilities stay finite via safe_log.
    pz, _, _ = hmm.forward_backward(jnp.zeros((6, 4)))
    assert np.isfinite(np.asarray(pz)).all()
