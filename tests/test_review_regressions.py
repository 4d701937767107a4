"""Regression tests for code-review findings (round 1 review)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import pytorch_hmm_tpu as ph
from pytorch_hmm_tpu import core


def test_fb_associative_with_lengths_matches_scan():
    """Padded batches must be correct regardless of method (the
    associative path used to silently ignore `lengths`)."""
    rng = np.random.default_rng(0)
    B, T, K = 2, 16, 4
    lo = jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32)
    la = jnp.asarray(np.log(rng.dirichlet(np.ones(K), size=K)), jnp.float32)
    lp = jnp.asarray(np.log(rng.dirichlet(np.ones(K))), jnp.float32)
    lengths = jnp.asarray([16, 9])
    out_scan = core.forward_backward(lo, la, lp, lengths=lengths)
    out_assoc = core.forward_backward(
        lo, la, lp, lengths=lengths, method="associative"
    )
    for a, b in zip(out_scan, out_assoc):
        np.testing.assert_allclose(a, b, atol=1e-4)
    # Valid frames of the short sequence must match an unpadded run.
    short = core.forward_backward(lo[1:, :9], la, lp)
    np.testing.assert_allclose(
        out_assoc[0][1, :9], short[0][0], atol=1e-4
    )


def test_contextual_neural_hmm_without_context():
    """A contextual model called without context must fall back to its
    static transitions, not crash (the reference AttributeErrors)."""
    m = ph.NeuralHMM(4, 6, context_dim=5, hidden_dim=16,
                     rngs=nnx.Rngs(0)).eval()
    obs = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 6))
    post, fwd, bwd = m(obs)  # no context
    np.testing.assert_allclose(np.asarray(post).sum(-1), 1.0, atol=1e-4)
    ll = m.compute_likelihood(obs)
    assert np.isfinite(np.asarray(ll)).all()


def test_boundary_accuracy_multi_match():
    """One prediction near several references must not produce negative
    false positives or precision > 1."""
    out = ph.boundary_accuracy(
        jnp.asarray([5]), jnp.asarray([4, 6]), tolerance=2
    )
    assert 0.0 <= float(out["precision"]) <= 1.0
    assert int(out["false_positives"]) >= 0
    assert float(out["precision"]) == pytest.approx(1.0)
    assert float(out["recall"]) == pytest.approx(1.0)


def test_semi_markov_supervised_consistent_with_unsupervised():
    """Supervised scoring uses the same diagonal-masked transitions as
    the segment DP: self-transitions score -inf, and a valid
    segmentation never beats the marginal."""
    sm = ph.SemiMarkovHMM(3, 4, max_duration=6, rngs=nnx.Rngs(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 4))
    bad = sm(obs, jnp.asarray([[0, 0, 1]]), jnp.asarray([[4, 4, 4]]))
    assert float(bad["log_transition"][0]) < -1e20  # self-transition
    good = sm(obs, jnp.asarray([[0, 1, 2]]), jnp.asarray([[4, 4, 4]]))
    marginal = sm(obs)
    assert float(good["log_probability"][0]) <= float(
        marginal["log_probability"][0]
    ) + 1e-3


def test_hmm_loss_parts_rejects_segment_models():
    from pytorch_hmm_tpu.parallel import hmm_loss_parts

    hsmm = ph.HSMMLayer(3, 4, max_duration=5, rngs=nnx.Rngs(0))
    with pytest.raises(TypeError, match="segment"):
        hmm_loss_parts(hsmm, jnp.zeros((1, 8, 4)))


def test_ctc_empty_target_no_double_count():
    from pytorch_hmm_tpu.alignment import ctc_forward_algorithm

    T, B, C = 6, 1, 3
    lp = jax.nn.log_softmax(jnp.zeros((T, B, C)), axis=-1)
    targets = jnp.zeros((B, 2), jnp.int32)
    _, ll = ctc_forward_algorithm(
        lp, targets, jnp.asarray([T]), jnp.asarray([0])
    )
    # All-blank probability: (1/3)^T exactly — no +log 2.
    assert float(ll[0]) == pytest.approx(T * np.log(1 / 3), abs=1e-4)


def test_resize_beam_after_chunk_size_change():
    p = ph.StreamingHMMProcessor(
        5, 6, chunk_size=32, lookahead_frames=0, max_delay_frames=50,
        use_beam_search=True, beam_width=4, rngs=nnx.Rngs(0),
    )
    p.chunk_size = 16  # controller shrank the chunk
    p.beam_width = 5
    p._resize_beam()   # must not raise / mix history lengths
    assert p._beam_paths.shape[0] == 5
    r = p.process_chunk(np.zeros((16, 6), np.float32))
    assert r.status in ("decoded", "buffering")
