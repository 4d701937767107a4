"""Core DP kernel tests: value-exact vs NumPy oracle + structural properties.

Mirrors the property assertions of reference tests/test_hmm.py and adds the
oracle cross-checks and associative-scan equivalence the reference lacks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from pytorch_hmm_tpu import HMM, core, create_left_to_right_matrix
from pytorch_hmm_tpu.core.semiring import safe_log

B, T, K = 3, 17, 5


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    p = rng.random((K, K)) + 0.1
    p = p / p.sum(axis=1, keepdims=True)
    pi = rng.random(K) + 0.1
    pi = pi / pi.sum()
    obs = rng.random((B, T, K)) + 1e-3  # per-state observation probs
    return p, pi, obs


def _logs(p, pi, obs):
    return (
        np.log(obs + 1e-8).astype(np.float32),
        np.log(p).astype(np.float32),
        np.log(pi).astype(np.float32),
    )


class TestForwardBackward:
    @pytest.mark.parametrize("method", ["scan", "associative"])
    def test_matches_oracle(self, problem, method):
        p, pi, obs = problem
        log_obs, log_a, log_pi = _logs(p, pi, obs)
        lg, la, lb, lz = core.forward_backward(
            jnp.asarray(log_obs), jnp.asarray(log_a), jnp.asarray(log_pi),
            method=method,
        )
        for b in range(B):
            post_ref, la_ref, lb_ref, lz_ref = oracle.posteriors(
                log_obs[b].astype(np.float64), log_a.astype(np.float64),
                log_pi.astype(np.float64),
            )
            np.testing.assert_allclose(np.exp(lg[b]), post_ref, atol=1e-4)
            np.testing.assert_allclose(la[b], la_ref, rtol=2e-4, atol=1e-3)
            np.testing.assert_allclose(lb[b], lb_ref, rtol=2e-4, atol=1e-3)
            np.testing.assert_allclose(lz[b], lz_ref, rtol=1e-5)

    def test_posterior_normalized(self, problem):
        p, pi, obs = problem
        log_obs, log_a, log_pi = _logs(p, pi, obs)
        lg, *_ = core.forward_backward(
            jnp.asarray(log_obs), jnp.asarray(log_a), jnp.asarray(log_pi)
        )
        np.testing.assert_allclose(
            np.exp(lg).sum(-1), np.ones((B, T)), atol=1e-5
        )

    def test_time_varying_transitions(self, problem):
        p, pi, obs = problem
        rng = np.random.default_rng(1)
        a_t = rng.random((B, T, K, K)) + 0.1
        a_t = a_t / a_t.sum(-1, keepdims=True)
        log_obs, _, log_pi = _logs(p, pi, obs)
        log_a_t = np.log(a_t).astype(np.float32)
        lg, la, lb, lz = core.forward_backward(
            jnp.asarray(log_obs), jnp.asarray(log_a_t), jnp.asarray(log_pi)
        )
        for b in range(B):
            post_ref, _, _, lz_ref = oracle.posteriors(
                log_obs[b].astype(np.float64),
                log_a_t[b].astype(np.float64),
                log_pi.astype(np.float64),
            )
            np.testing.assert_allclose(np.exp(lg[b]), post_ref, atol=1e-5)
            np.testing.assert_allclose(lz[b], lz_ref, rtol=1e-5)

    def test_lengths_masking(self, problem):
        p, pi, obs = problem
        log_obs, log_a, log_pi = _logs(p, pi, obs)
        lengths = jnp.asarray([T, T - 5, 4])
        _, lz = core.forward_log(
            jnp.asarray(log_obs), jnp.asarray(log_a), jnp.asarray(log_pi),
            lengths=lengths,
        )
        for b, L in enumerate([T, T - 5, 4]):
            _, lz_ref = oracle.forward(
                log_obs[b, :L].astype(np.float64),
                log_a.astype(np.float64), log_pi.astype(np.float64),
            )
            np.testing.assert_allclose(lz[b], lz_ref, rtol=1e-5)

    def test_gradients_flow(self, problem):
        p, pi, obs = problem
        log_obs, log_a, log_pi = _logs(p, pi, obs)

        def loss(la):
            return -core.log_likelihood(
                jnp.asarray(log_obs), la, jnp.asarray(log_pi)
            ).sum()

        g = jax.grad(loss)(jnp.asarray(log_a))
        assert np.all(np.isfinite(g))
        assert np.abs(g).sum() > 0

    @pytest.mark.parametrize("time_varying", [False, True])
    def test_associative_lengths_matches_scan(self, problem, time_varying):
        """Ragged batches on the O(log T) path (VERDICT r2 item 5):
        identity-operator padding must reproduce the sequential masked
        recursion for alpha, beta, gamma, and log_z."""
        p, pi, obs = problem
        log_obs, log_a, log_pi = _logs(p, pi, obs)
        if time_varying:
            rng = np.random.default_rng(5)
            a_t = rng.random((B, T, K, K)) + 0.1
            log_a = np.log(a_t / a_t.sum(-1, keepdims=True)).astype(
                np.float32
            )
        lengths = jnp.asarray([T, T - 5, 4])
        seq = core.forward_backward(
            jnp.asarray(log_obs), jnp.asarray(log_a), jnp.asarray(log_pi),
            lengths=lengths, method="scan",
        )
        par = core.forward_backward(
            jnp.asarray(log_obs), jnp.asarray(log_a), jnp.asarray(log_pi),
            lengths=lengths, method="associative",
        )
        # Compare only valid frames (padded frames carry frozen/garbage
        # posteriors by contract on both paths).
        for b, L in enumerate([T, T - 5, 4]):
            for s, a in zip(seq, par):
                if s.ndim == 3:
                    np.testing.assert_allclose(
                        s[b, :L], a[b, :L], rtol=2e-4, atol=1e-4
                    )
        np.testing.assert_allclose(seq[3], par[3], rtol=1e-5)


class TestViterbi:
    def test_matches_oracle(self, problem):
        p, pi, obs = problem
        log_obs, log_a, log_pi = _logs(p, pi, obs)
        states, score = core.viterbi(
            jnp.asarray(log_obs), jnp.asarray(log_a), jnp.asarray(log_pi)
        )
        for b in range(B):
            path_ref, score_ref = oracle.viterbi(
                log_obs[b].astype(np.float64), log_a.astype(np.float64),
                log_pi.astype(np.float64),
            )
            np.testing.assert_array_equal(states[b], path_ref)
            np.testing.assert_allclose(score[b], score_ref, rtol=1e-5)

    def test_time_varying(self, problem):
        p, pi, obs = problem
        rng = np.random.default_rng(2)
        a_t = rng.random((B, T, K, K)) + 0.1
        a_t = a_t / a_t.sum(-1, keepdims=True)
        log_obs, _, log_pi = _logs(p, pi, obs)
        log_a_t = np.log(a_t).astype(np.float32)
        states, _ = core.viterbi(
            jnp.asarray(log_obs), jnp.asarray(log_a_t), jnp.asarray(log_pi)
        )
        for b in range(B):
            path_ref, _ = oracle.viterbi(
                log_obs[b].astype(np.float64),
                log_a_t[b].astype(np.float64), log_pi.astype(np.float64),
            )
            np.testing.assert_array_equal(states[b], path_ref)

    def test_lengths(self, problem):
        p, pi, obs = problem
        log_obs, log_a, log_pi = _logs(p, pi, obs)
        L = 7
        states, score = core.viterbi(
            jnp.asarray(log_obs), jnp.asarray(log_a), jnp.asarray(log_pi),
            lengths=jnp.asarray([T, L, L]),
        )
        path_ref, score_ref = oracle.viterbi(
            log_obs[1, :L].astype(np.float64), log_a.astype(np.float64),
            log_pi.astype(np.float64),
        )
        np.testing.assert_array_equal(states[1, :L], path_ref)
        np.testing.assert_allclose(score[1], score_ref, rtol=1e-5)
        # Padded region repeats the final valid state.
        assert np.all(np.asarray(states[1, L:]) == path_ref[-1])

    def test_l2r_monotonic(self):
        # Mirrors reference test_hmm.py:79-96: L2R decode is non-decreasing.
        p = create_left_to_right_matrix(K, self_loop_prob=0.6)
        hmm = HMM(p)
        rng = np.random.default_rng(3)
        obs = jnp.asarray(rng.random((T, K)) + 1e-3)
        states, _ = hmm.viterbi_decode(obs)
        s = np.asarray(states)
        assert np.all(np.diff(s) >= 0)


class TestHMMClass:
    def test_wikipedia_example(self):
        # Classic Rainy/Sunny Viterbi example — cross-implementation check
        # (reference test_hmm.py:303-333 uses the same fixture).
        p = jnp.asarray([[0.7, 0.3], [0.4, 0.6]])
        pi = jnp.asarray([0.6, 0.4])
        emit = np.array([[0.1, 0.4, 0.5], [0.6, 0.3, 0.1]])  # walk shop clean
        observed = [0, 1, 2]
        obs_probs = jnp.asarray(emit[:, observed].T)  # (T=3, K=2)
        hmm = HMM(p, pi)
        states, score = hmm.viterbi_decode(obs_probs)
        # Known answer: Sunny, Rainy, Rainy (indices 1, 0, 0 with
        # state 0 = Rainy, 1 = Sunny given this emission layout).
        np.testing.assert_array_equal(np.asarray(states), [1, 0, 0])
        # p(path) = pi_S b_S(walk) A[S,R] b_R(shop) A[R,R] b_R(clean)
        np.testing.assert_allclose(
            np.exp(np.asarray(score)), 0.4 * 0.6 * 0.4 * 0.4 * 0.7 * 0.5,
            rtol=1e-3,
        )

    def test_unbatched_and_batched(self, problem):
        p, pi, obs = problem
        hmm = HMM(p, pi)
        post_b, alpha_b, beta_b = hmm.forward_backward(jnp.asarray(obs))
        post_u, _, _ = hmm.forward_backward(jnp.asarray(obs[0]))
        assert post_b.shape == (B, T, K)
        assert post_u.shape == (T, K)
        np.testing.assert_allclose(post_b[0], post_u, atol=1e-6)

    def test_likelihood_finite(self, problem):
        p, pi, obs = problem
        hmm = HMM(p, pi)
        ll = hmm.compute_likelihood(jnp.asarray(obs))
        assert ll.shape == (B,)
        assert np.all(np.isfinite(ll))

    def test_sample_one_hot(self, problem):
        p, pi, _ = problem
        hmm = HMM(p, pi)
        obs, states = hmm.sample(seq_length=25, batch_size=4,
                                 key=jax.random.PRNGKey(7))
        assert obs.shape == (4, 25, K)
        assert states.shape == (4, 25)
        np.testing.assert_allclose(np.asarray(obs).sum(-1), 1.0)
        np.testing.assert_array_equal(
            np.argmax(np.asarray(obs), -1), np.asarray(states)
        )

    def test_row_normalization(self):
        p = np.abs(np.random.default_rng(0).random((K, K))) + 0.5
        hmm = HMM(p)  # unnormalized input
        np.testing.assert_allclose(np.asarray(hmm.P).sum(-1), 1.0, atol=1e-6)

    def test_sampled_chain_statistics(self):
        # Generative + analysis round trip: heavy self-loop chain should
        # yield mostly self-loops in the decoded statistics.
        from pytorch_hmm_tpu import analyze_transition_patterns

        p = create_left_to_right_matrix(K, self_loop_prob=0.9)
        hmm = HMM(p)
        _, states = hmm.sample(seq_length=200, batch_size=8,
                               key=jax.random.PRNGKey(0))
        stats = analyze_transition_patterns(list(np.asarray(states)))
        assert stats["self_loop_ratio"] > 0.6
        assert stats["backward_ratio"] == 0.0


class TestAssociativeViterbi:
    """Fully parallel (O(log T) depth) Viterbi must match the scan."""

    def test_matches_sequential(self, rng):
        from pytorch_hmm_tpu.core.viterbi import viterbi_associative

        for (B, T, K) in [(4, 100, 7), (2, 33, 12), (3, 257, 24)]:
            lo = jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32)
            la = jnp.asarray(
                np.log(rng.dirichlet(np.ones(K), size=K)), jnp.float32
            )
            lp = jnp.asarray(np.log(rng.dirichlet(np.ones(K))), jnp.float32)
            s0, sc0 = core.viterbi(lo, la, lp)
            s1, sc1 = viterbi_associative(lo, la, lp)
            assert bool(jnp.all(s0 == s1)), (B, T, K)
            np.testing.assert_allclose(sc0, sc1, atol=1e-3)

    def test_rejects_time_varying(self, rng):
        from pytorch_hmm_tpu.core.viterbi import viterbi_associative

        with pytest.raises(ValueError, match="static"):
            viterbi_associative(
                jnp.zeros((1, 4, 3)), jnp.zeros((1, 4, 3, 3)), jnp.zeros(3)
            )

    def test_lengths(self, rng):
        from pytorch_hmm_tpu.core.viterbi import viterbi_associative

        Bl, Tl, Kl = 3, 40, 6
        lo = jnp.asarray(rng.normal(size=(Bl, Tl, Kl)), jnp.float32)
        la = jnp.asarray(
            np.log(rng.dirichlet(np.ones(Kl), size=Kl)), jnp.float32
        )
        lp = jnp.asarray(np.log(rng.dirichlet(np.ones(Kl))), jnp.float32)
        lengths = jnp.asarray([Tl, 23, 7])
        s, sc = viterbi_associative(lo, la, lp, lengths=lengths)
        for b, L in enumerate([Tl, 23, 7]):
            s_ref, sc_ref = core.viterbi(lo[b:b + 1, :L], la, lp)
            assert bool(jnp.all(s[b, :L] == s_ref[0])), b
            # Padding repeats the final valid state.
            assert bool(jnp.all(s[b, L:] == s[b, L - 1])), b
            np.testing.assert_allclose(sc[b], sc_ref[0], atol=1e-3)


class TestBlockedViterbi:
    """Single-chip time-block-parallel Viterbi must match the scan."""

    def test_matches_sequential(self, rng):
        from pytorch_hmm_tpu.core.viterbi import viterbi_blocked

        for (B, T, K, P) in [(4, 100, 7, 4), (2, 97, 12, 8), (2, 8, 3, 4)]:
            lo = jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32)
            la = jnp.asarray(
                np.log(rng.dirichlet(np.ones(K), size=K)), jnp.float32
            )
            lp = jnp.asarray(np.log(rng.dirichlet(np.ones(K))), jnp.float32)
            s0, sc0 = core.viterbi(lo, la, lp)
            s1, sc1 = viterbi_blocked(lo, la, lp, blocks=P)
            assert bool(jnp.all(s0 == s1)), (B, T, K, P)
            np.testing.assert_allclose(sc0, sc1, atol=1e-3)

    def test_lengths(self, rng):
        from pytorch_hmm_tpu.core.viterbi import viterbi_blocked

        Bl, Tl, Kl = 3, 50, 6
        lo = jnp.asarray(rng.normal(size=(Bl, Tl, Kl)), jnp.float32)
        la = jnp.asarray(
            np.log(rng.dirichlet(np.ones(Kl), size=Kl)), jnp.float32
        )
        lp = jnp.asarray(np.log(rng.dirichlet(np.ones(Kl))), jnp.float32)
        lengths = jnp.asarray([Tl, 31, 9])
        s, sc = viterbi_blocked(lo, la, lp, blocks=4, lengths=lengths)
        for b, L in enumerate([Tl, 31, 9]):
            s_ref, sc_ref = core.viterbi(lo[b:b + 1, :L], la, lp)
            assert bool(jnp.all(s[b, :L] == s_ref[0])), b
            assert bool(jnp.all(s[b, L:] == s[b, L - 1])), b
            np.testing.assert_allclose(sc[b], sc_ref[0], atol=1e-3)


class TestHMMFacadeLengths:
    """The user-facing HMM class forwards ``lengths`` on every method."""

    def test_all_methods(self, rng):
        Kl, Tl = 5, 30
        P = rng.random((Kl, Kl)) + 0.1
        hmm = HMM(P / P.sum(1, keepdims=True))
        obs = jnp.asarray(rng.random((3, Tl, Kl)) + 1e-3, jnp.float32)
        lengths = jnp.asarray([Tl, 18, 6])
        post, _, _ = hmm.forward_backward(obs, lengths=lengths)
        ll = hmm.compute_likelihood(obs, lengths=lengths)
        for method in ("scan", "associative", "blocked"):
            states, score = hmm.viterbi_decode(obs, method=method,
                                               lengths=lengths)
            for b, L in enumerate([Tl, 18, 6]):
                s_ref, sc_ref = hmm.viterbi_decode(obs[b, :L])
                assert bool(jnp.all(states[b, :L] == s_ref)), (method, b)
                np.testing.assert_allclose(score[b], sc_ref, atol=1e-3)
        for b, L in enumerate([Tl, 18, 6]):
            p_ref, _, _ = hmm.forward_backward(obs[b, :L])
            np.testing.assert_allclose(post[b, :L], p_ref, atol=1e-5)
            np.testing.assert_allclose(
                ll[b], hmm.compute_likelihood(obs[b, :L]), rtol=1e-5
            )
