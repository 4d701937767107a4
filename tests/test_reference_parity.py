"""Numerical parity against the actual reference implementation.

These tests import `pytorch_hmm` from the read-only reference mount and
compare outputs on identical inputs — posteriors, Viterbi paths,
transition builders and metrics must agree within float tolerance
(Viterbi paths exactly). They are skipped automatically when the
reference is not mounted, so the suite stays standalone.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

_REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not _REF.exists(), reason="reference checkout not mounted"
)

if _REF.exists():
    sys.path.insert(0, str(_REF))
    torch = pytest.importorskip("torch")

import pytorch_hmm_tpu as ph  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    import pytorch_hmm as ref_pkg

    return ref_pkg


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    K, T = 6, 40
    P = rng.dirichlet(np.ones(K), size=K).astype(np.float32)
    p0 = rng.dirichlet(np.ones(K)).astype(np.float32)
    obs = rng.random((T, K)).astype(np.float32)
    return P, p0, obs


def test_forward_backward_parity(ref, problem):
    P, p0, obs = problem
    r = ref.HMMPyTorch(torch.tensor(P), torch.tensor(p0))
    post_r, alpha_r, beta_r = r.forward_backward(torch.tensor(obs))

    ours = ph.HMM(P, p0)
    post_o, alpha_o, beta_o = ours.forward_backward(obs)

    # The reference keeps a leading batch dim even for unbatched input.
    np.testing.assert_allclose(
        np.asarray(post_o), post_r.detach().numpy()[0], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(alpha_o), alpha_r.detach().numpy()[0], atol=2e-4
    )


def test_viterbi_path_parity(ref, problem):
    P, p0, obs = problem
    r = ref.HMMPyTorch(torch.tensor(P), torch.tensor(p0))
    states_r, score_r = r.viterbi_decode(torch.tensor(obs))

    ours = ph.HMM(P, p0)
    states_o, score_o = ours.viterbi_decode(obs)

    np.testing.assert_array_equal(
        np.asarray(states_o), states_r.detach().numpy()
    )


def test_likelihood_divergence_is_the_reference_bug(ref, problem):
    """Our likelihood is the true log Z; the reference's prob-space
    round trip (``hmm.py:203-206``) floors each forward entry at 1e-8
    before re-logging, which destroys the value whenever
    ``alpha_T < log(1e-8)``. Verify both facts exactly: the reference's
    output equals the floored formula applied to the true alpha, and
    ours equals the unfloored logsumexp."""
    P, p0, obs = problem
    r = ref.HMMPyTorch(torch.tensor(P), torch.tensor(p0))
    ll_r = float(r.compute_likelihood(torch.tensor(obs)))

    ours = ph.HMM(P, p0)
    ll_o = float(ours.compute_likelihood(obs))

    # True alpha from our forward pass (verified against the reference's
    # alpha in test_forward_backward_parity).
    import jax.numpy as jnp
    from pytorch_hmm_tpu import core
    from pytorch_hmm_tpu.core.semiring import safe_log

    log_alpha, log_z = core.forward_log(
        safe_log(jnp.asarray(obs))[None], ours.log_P, ours.log_p0
    )
    assert ll_o == pytest.approx(float(log_z[0]), abs=1e-3)

    floored = np.logaddexp.reduce(
        np.log(np.exp(np.asarray(log_alpha[0, -1], np.float64)) + 1e-8)
    )
    assert ll_r == pytest.approx(float(floored), abs=1e-3)


@pytest.mark.parametrize(
    "ttype", ["ergodic", "left_to_right", "left_to_right_skip", "circular"]
)
def test_transition_builder_parity(ref, ttype):
    ref_m = ref.create_transition_matrix(5, ttype).detach().numpy()
    our_m = np.asarray(ph.create_transition_matrix(5, ttype))
    np.testing.assert_allclose(our_m, ref_m, atol=1e-5)


def test_left_to_right_builder_parity(ref):
    ref_m = ref.create_left_to_right_matrix(7, 0.8).detach().numpy()
    our_m = np.asarray(ph.create_left_to_right_matrix(7, 0.8))
    np.testing.assert_allclose(our_m, ref_m, atol=1e-5)


def test_mcd_parity(ref):
    rng = np.random.default_rng(1)
    a = rng.normal(size=(30, 13)).astype(np.float32)
    b = rng.normal(size=(30, 13)).astype(np.float32)
    ref_v = ref.mel_cepstral_distortion(
        torch.tensor(a), torch.tensor(b)
    ).item()
    our_v = float(ph.mel_cepstral_distortion(a, b))
    assert our_v == pytest.approx(ref_v, rel=1e-4)


def test_f0_rmse_parity(ref):
    rng = np.random.default_rng(2)
    f0a = np.abs(rng.normal(size=(50,))).astype(np.float32) * 100
    f0b = np.abs(rng.normal(size=(50,))).astype(np.float32) * 100
    ref_v = ref.f0_root_mean_square_error(
        torch.tensor(f0a), torch.tensor(f0b)
    ).item()
    our_v = float(ph.f0_root_mean_square_error(f0a, f0b))
    assert our_v == pytest.approx(ref_v, rel=1e-4)


def test_duration_metrics_parity(ref):
    pred = np.array([10.0, 20.0, 30.0, 15.0], np.float32)
    gt = np.array([12.0, 19.0, 28.0, 15.0], np.float32)
    ref_out = ref.duration_accuracy(torch.tensor(pred), torch.tensor(gt))
    our_out = ph.duration_accuracy(pred, gt)
    for k in ("mae", "rmse", "correlation"):
        assert float(our_out[k]) == pytest.approx(
            float(ref_out[k]), rel=1e-4
        ), k


def test_dtw_cost_parity(ref):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(10, 6)).astype(np.float32)
    y = rng.normal(size=(12, 6)).astype(np.float32)
    ref_cost = ref.alignment.dtw.dtw_distance(
        torch.tensor(x), torch.tensor(y)
    ).item()
    our_cost = float(
        __import__("pytorch_hmm_tpu").alignment.dtw_distance(x, y)
    )
    assert our_cost == pytest.approx(ref_cost, rel=1e-4)


def test_gmm_hmm_decode_parity(ref):
    """Copy the reference GMM-HMM's weights into ours; Viterbi paths and
    sequence scores must match (diag covariance, learnable transitions)."""
    from flax import nnx
    import jax.numpy as jnp

    torch.manual_seed(0)
    S, D, C, B, T = 5, 8, 3, 2, 30
    r = ref.MixtureGaussianHMMLayer(
        num_states=S, feature_dim=D, num_components=C,
        covariance_type="diag", learnable_transitions=True,
    )
    ours = ph.MixtureGaussianHMMLayer(
        S, D, C, covariance_type="diag", learnable_transitions=True,
        rngs=nnx.Rngs(0),
    )
    ours.transition_logits[...] = jnp.asarray(
        r.transition_logits.detach().numpy()
    )
    ours.mixture_weights_logits[...] = jnp.asarray(
        r.mixture_weights_logits.detach().numpy()
    )
    ours.means[...] = jnp.asarray(r.means.detach().numpy())
    ours.cov_params[...] = jnp.asarray(r.log_vars.detach().numpy())

    rng = np.random.default_rng(4)
    obs = rng.normal(size=(B, T, D)).astype(np.float32)

    states_r, scores_r = r(torch.tensor(obs), return_log_probs=True)
    states_o, scores_o = ours(jnp.asarray(obs), return_log_probs=True)

    np.testing.assert_array_equal(
        np.asarray(states_o), states_r.detach().numpy()
    )


def test_gmm_emission_scores_parity(ref):
    """Per-state GMM log-probs must match the reference's broadcast
    formulation despite our matmul-form evaluation."""
    from flax import nnx
    import jax.numpy as jnp

    torch.manual_seed(1)
    S, D, C = 4, 6, 2
    r = ref.MixtureGaussianHMMLayer(
        num_states=S, feature_dim=D, num_components=C,
        covariance_type="diag",
    )
    ours = ph.MixtureGaussianHMMLayer(S, D, C, rngs=nnx.Rngs(0))
    ours.mixture_weights_logits[...] = jnp.asarray(
        r.mixture_weights_logits.detach().numpy()
    )
    ours.means[...] = jnp.asarray(r.means.detach().numpy())
    ours.cov_params[...] = jnp.asarray(r.log_vars.detach().numpy())

    rng = np.random.default_rng(5)
    obs = rng.normal(size=(2, 20, D)).astype(np.float32)
    lp_r = r.get_observation_log_probs(torch.tensor(obs)).detach().numpy()
    lp_o = np.asarray(ours.get_observation_log_probs(jnp.asarray(obs)))
    np.testing.assert_allclose(lp_o, lp_r, atol=1e-3)


def test_hsmm_decode_parity(ref):
    """Copy reference HSMM weights into ours; decoded segmentations must
    match on a short sequence (the reference's decoder is O(T·S²·D²)
    Python, so keep T small)."""
    from flax import nnx
    import jax.numpy as jnp

    torch.manual_seed(2)
    S, D, Dur, T = 3, 4, 5, 20
    r = ref.HSMMLayer(
        num_states=S, feature_dim=D, duration_distribution="gamma",
        max_duration=Dur, min_duration=1,
    )
    ours = ph.HSMMLayer(
        num_states=S, feature_dim=D, duration_distribution="gamma",
        max_duration=Dur, min_duration=1, rngs=nnx.Rngs(0),
    )
    ours.transition_logits[...] = jnp.asarray(
        r.transition_logits.detach().numpy()
    )
    ours.observation_means[...] = jnp.asarray(
        r.observation_means.detach().numpy()
    )
    ours.observation_log_vars[...] = jnp.asarray(
        r.observation_log_vars.detach().numpy()
    )
    # Reference duration params are raw values fed through softplus at
    # use; ours are raw pre-softplus too — copy directly.
    ours.duration_shape[...] = jnp.asarray(
        r.duration_shape.detach().numpy()
    )
    ours.duration_rate[...] = jnp.asarray(r.duration_rate.detach().numpy())

    # Duration pmfs must agree first.
    dur_r = r.get_duration_probabilities().detach().numpy()
    dur_o = np.asarray(ours.get_duration_probabilities())
    np.testing.assert_allclose(dur_o, dur_r, atol=1e-5)

    rng = np.random.default_rng(6)
    obs = rng.normal(size=(1, T, D)).astype(np.float32)
    states_r, _ = r(torch.tensor(obs))
    states_o, _ = ours(jnp.asarray(obs))
    np.testing.assert_array_equal(
        np.asarray(states_o)[0], states_r.detach().numpy()[0]
    )


def test_streaming_greedy_parity(ref):
    """Copy the reference streaming processor's weights into ours and
    feed identical chunks: greedy decoded states must match frame for
    frame (the carried-state semantics are the same)."""
    from flax import nnx
    import jax.numpy as jnp

    torch.manual_seed(3)
    S, D = 4, 6
    r = ref.StreamingHMMProcessor(
        num_states=S, feature_dim=D, chunk_size=8, lookahead_frames=0,
        max_delay_frames=100, use_beam_search=False,
    )
    ours = ph.StreamingHMMProcessor(
        num_states=S, feature_dim=D, chunk_size=8, lookahead_frames=0,
        max_delay_frames=100, use_beam_search=False, rngs=nnx.Rngs(0),
    )
    ours.transition_logits[...] = jnp.asarray(
        r.transition_logits.detach().numpy()
    )
    # torch Linear stores weight (out, in); nnx kernel is (in, out).
    lin1, lin2 = r.emission_net[0], r.emission_net[3]
    ours.emission_hidden.kernel[...] = jnp.asarray(
        lin1.weight.detach().numpy().T
    )
    ours.emission_hidden.bias[...] = jnp.asarray(lin1.bias.detach().numpy())
    ours.emission_out.kernel[...] = jnp.asarray(
        lin2.weight.detach().numpy().T
    )
    ours.emission_out.bias[...] = jnp.asarray(lin2.bias.detach().numpy())
    r.eval()

    rng = np.random.default_rng(7)
    ours_states, ref_states = [], []
    for _ in range(4):
        chunk = rng.normal(size=(8, D)).astype(np.float32)
        res_r = r.process_chunk(torch.tensor(chunk))
        res_o = ours.process_chunk(chunk)
        if res_r.decoded_states is not None:
            ref_states.extend(res_r.decoded_states.tolist())
        if res_o.decoded_states is not None:
            ours_states.extend(np.asarray(res_o.decoded_states).tolist())
    assert ref_states and ours_states == ref_states


def test_dtw_path_parity(ref):
    """DTW paths (not just costs) must match — both implementations
    tie-break in [diagonal, vertical, horizontal] order."""
    rng = np.random.default_rng(8)
    x = rng.normal(size=(9, 5)).astype(np.float32)
    y = rng.normal(size=(12, 5)).astype(np.float32)
    pi_r, pj_r, cost_r = ref.alignment.dtw.dtw_alignment(
        torch.tensor(x), torch.tensor(y)
    )
    pi_o, pj_o, cost_o = ph.dtw_alignment(x, y)
    np.testing.assert_array_equal(np.asarray(pi_o), pi_r.numpy())
    np.testing.assert_array_equal(np.asarray(pj_o), pj_r.numpy())
    assert float(cost_o) == pytest.approx(float(cost_r), rel=1e-4)


def test_ctc_greedy_decode_parity(ref):
    """Greedy CTC decoding (argmax → collapse → de-blank) must match."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    T, B, C = 30, 2, 6
    lp = np.log(rng.dirichlet(np.ones(C), size=(T, B))).astype(np.float32)
    lens = np.array([30, 25])

    r = ref.CTCAligner(num_classes=C)
    out_r = r.decode(torch.tensor(lp), torch.tensor(lens))
    ours = ph.CTCAligner(num_classes=C)
    out_o = ours.decode(jnp.asarray(lp), jnp.asarray(lens))
    for a, b in zip(out_o, out_r):
        np.testing.assert_array_equal(np.asarray(a), b.numpy())


def test_neural_hmm_parity(ref):
    """Copy a reference NeuralHMM's weights (gaussian observation head,
    static transitions) into ours: per-state scores, posteriors and
    Viterbi paths must match."""
    from flax import nnx
    import jax.numpy as jnp

    torch.manual_seed(4)
    S, D, H = 4, 6, 16
    r = ref.NeuralHMM(num_states=S, observation_dim=D, context_dim=0,
                      hidden_dim=H, observation_type="gaussian")
    r.eval()
    ours = ph.NeuralHMM(S, D, context_dim=0, hidden_dim=H,
                        rngs=nnx.Rngs(0)).eval()

    om_r, om_o = r.observation_model, ours.observation_model
    t = lambda w: jnp.asarray(w.detach().numpy())
    om_o.fe1.kernel[...] = t(om_r.feature_net[0].weight).T
    om_o.fe1.bias[...] = t(om_r.feature_net[0].bias)
    om_o.fe2.kernel[...] = t(om_r.feature_net[3].weight).T
    om_o.fe2.bias[...] = t(om_r.feature_net[3].bias)
    om_o.state_embedding.embedding[...] = t(om_r.state_embedding.weight)
    om_o.mean_net.kernel[...] = t(om_r.mean_net.weight).T
    om_o.mean_net.bias[...] = t(om_r.mean_net.bias)
    om_o.logvar_net.kernel[...] = t(om_r.logvar_net.weight).T
    om_o.logvar_net.bias[...] = t(om_r.logvar_net.bias)
    ours.transition_matrix[...] = t(r.transition_matrix)
    ours.initial_logits[...] = t(r.initial_logits)

    rng = np.random.default_rng(10)
    obs = rng.normal(size=(2, 25, D)).astype(np.float32)

    lp_r = om_r(torch.tensor(obs)).detach().numpy()
    lp_o = np.asarray(om_o.log_probs(jnp.asarray(obs)))
    np.testing.assert_allclose(lp_o, lp_r, atol=1e-3)

    post_r, _, _ = r(torch.tensor(obs))
    post_o, _, _ = ours(jnp.asarray(obs))
    np.testing.assert_allclose(
        np.asarray(post_o), post_r.detach().numpy(), atol=2e-3
    )

    states_r, _ = r.viterbi_decode(torch.tensor(obs))
    states_o, _ = ours.viterbi_decode(jnp.asarray(obs))
    np.testing.assert_array_equal(
        np.asarray(states_o), states_r.detach().numpy()
    )
