"""Dedicated value/property tests for every public `utils` function
(VERDICT r2 item 6 — the L1 toolbox was near-untested; the reference
tests its builders in ``tests/test_hmm.py:251-300``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from pytorch_hmm_tpu import utils
from pytorch_hmm_tpu.hmm import HMM


def _rows_stochastic(p, atol=1e-5):
    np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, atol=atol)


class TestCreateTransitionMatrix:
    @pytest.mark.parametrize(
        "kind", ["ergodic", "left_to_right", "left_to_right_skip", "circular"]
    )
    def test_rows_stochastic(self, kind):
        _rows_stochastic(utils.create_transition_matrix(6, kind))

    def test_ergodic_diagonal_boosted(self):
        p = np.asarray(utils.create_transition_matrix(5, "ergodic",
                                                      self_loop_prob=0.5))
        off = p[~np.eye(5, dtype=bool)]
        assert (np.diag(p) > off.max()).all()

    def test_left_to_right_band(self):
        p = np.asarray(utils.create_transition_matrix(6, "left_to_right"))
        assert np.all(np.tril(p, k=-1) == 0)
        assert np.all(np.triu(p, k=2) == 0)
        assert p[-1, -1] == pytest.approx(1.0)

    def test_skip_topology_has_skip2(self):
        p = np.asarray(
            utils.create_transition_matrix(6, "left_to_right_skip",
                                           skip_prob=0.1)
        )
        assert p[0, 2] > 0
        assert np.all(np.triu(p, k=3) == 0)

    def test_circular_wraps(self):
        p = np.asarray(utils.create_transition_matrix(4, "circular"))
        assert p[3, 0] > 0  # wrap-around edge

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError, match="nope"):
            utils.create_transition_matrix(4, "nope")


class TestLeftToRightAndSkipBuilders:
    def test_l2r_self_loop_value(self):
        p = np.asarray(utils.create_left_to_right_matrix(5, 0.7))
        np.testing.assert_allclose(np.diag(p)[:-1], 0.7, atol=1e-5)
        np.testing.assert_allclose(np.diag(p, k=1), 0.3, atol=1e-5)
        assert p[-1, -1] == pytest.approx(1.0)

    def test_skip_mass_split_inverse_distance(self):
        p = np.asarray(
            utils.create_skip_state_matrix(
                8, self_loop_prob=0.6, forward_prob=0.3, skip_prob=0.1,
                max_skip=3,
            )
        )
        _rows_stochastic(p)
        # Skip weights proportional to 1/2 and 1/3 -> ratio 3:2.
        assert p[0, 2] / p[0, 3] == pytest.approx(1.5, rel=1e-4)
        assert p[-1, -1] == pytest.approx(1.0)


class TestPhonemeAwareTransitions:
    def test_longer_duration_higher_self_loop(self):
        p = np.asarray(
            utils.create_phoneme_aware_transitions(
                [2.0, 20.0, 5.0], duration_variance=0.0
            )
        )
        assert p[1, 1] > p[0, 0]
        assert p[-1, -1] == pytest.approx(1.0)
        _rows_stochastic(p)

    def test_variance_jitters_deterministically(self):
        a = utils.create_phoneme_aware_transitions(
            [3.0, 3.0, 3.0], duration_variance=0.3,
            key=jax.random.PRNGKey(1),
        )
        b = utils.create_phoneme_aware_transitions(
            [3.0, 3.0, 3.0], duration_variance=0.3,
            key=jax.random.PRNGKey(1),
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestHierarchicalTransitions:
    def test_boundary_rows_get_forward_boost(self):
        p = np.asarray(
            utils.create_hierarchical_transitions(
                word_boundaries=[3], syllable_boundaries=[1, 3, 4],
                phoneme_level_prob=0.8, syllable_level_prob=0.15,
                word_level_prob=0.05,
            )
        )
        _rows_stochastic(p)
        # Row 1 (syllable boundary) forwards more than row 0 (plain);
        # row 3 (word + syllable) more than row 1.
        assert p[1, 2] > p[0, 1]
        assert p[3, 4] > p[1, 2]
        assert p[-1, -1] == pytest.approx(1.0)


class TestAdaptiveTransitionMatrix:
    def test_no_context_returns_base(self):
        m = utils.AdaptiveTransitionMatrix(4, context_dim=8,
                                           rngs=nnx.Rngs(0))
        base = m()
        assert base.shape == (1, 4, 4)
        _rows_stochastic(base)

    def test_context_modulates(self):
        m = utils.AdaptiveTransitionMatrix(4, context_dim=8,
                                           rngs=nnx.Rngs(0))
        c = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
        out = m(c)
        assert out.shape == (2, 4, 4)
        _rows_stochastic(out)
        assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
        assert not np.allclose(np.asarray(out[0]), np.asarray(m()[0]))


class TestDurationConstrainedMatrix:
    def test_hand_checked_small_case(self):
        # 2 states, min dwell 2, max dwell 3 -> 6 expanded states:
        # (s, d) rows: (0,0) must advance dwell; (0,1) may stay/hop;
        # (0,2) must hop to (1,0); (1,2) is absorbing-ish (last state).
        p = np.asarray(
            utils.create_duration_constrained_matrix(2, 2, 3)
        )
        assert p.shape == (6, 6)
        assert p[0, 1] == 1.0                      # forced dwell advance
        assert p[1, 2] == pytest.approx(0.7)       # stay (dwell++)
        assert p[1, 3] == pytest.approx(0.3)       # hop to state1 dwell0
        assert p[2, 3] == 1.0                      # forced exit at max
        assert p[5, 5] == 1.0                      # final state stays
        # No exit edge before min duration is reachable.
        assert p[0, 3] == 0.0

    def test_viterbi_on_expanded_space_respects_min_duration(self):
        d = 4
        p = utils.create_duration_constrained_matrix(2, 2, d)
        p0 = np.zeros(2 * d, np.float32)
        p0[0] = 1.0  # start in (state 0, dwell 0)
        hmm = HMM(p, jnp.asarray(p0))
        # Observations that scream "state 1" from frame 0: the decode
        # must still dwell >= 2 frames in state 0's sub-chain.
        obs = np.full((10, 2 * d), 1e-3, np.float32)
        obs[:, d:] = 1.0
        obs[0, :d] = 1.0
        states, _ = hmm.viterbi_decode(jnp.asarray(obs))
        phone = np.asarray(states) // d
        first_hop = int(np.argmax(phone == 1)) if (phone == 1).any() else 10
        assert first_hop >= 2


class TestGaussianUtilities:
    def test_observation_model_defaults(self):
        means, covs = utils.create_gaussian_observation_model(3, 4)
        assert means.shape == (3, 4)
        assert covs.shape == (3, 4, 4)
        np.testing.assert_array_equal(
            np.asarray(covs[0]), np.eye(4, dtype=np.float32)
        )

    def test_log_likelihood_matches_manual(self):
        rng = np.random.default_rng(0)
        K, D, T = 3, 4, 5
        means = rng.normal(size=(K, D)).astype(np.float32)
        a = rng.normal(size=(K, D, D)).astype(np.float32) * 0.3
        covs = np.einsum("kde,kfe->kdf", a, a) + np.eye(D, dtype=np.float32)
        obs = rng.normal(size=(T, D)).astype(np.float32)
        ll = np.asarray(utils.gaussian_log_likelihood(
            jnp.asarray(obs), jnp.asarray(means), jnp.asarray(covs)
        ))
        for k in range(K):
            inv = np.linalg.inv(covs[k])
            _, logdet = np.linalg.slogdet(covs[k])
            diff = obs - means[k]
            manual = -0.5 * (
                D * np.log(2 * np.pi) + logdet
                + np.einsum("td,de,te->t", diff, inv, diff)
            )
            np.testing.assert_allclose(ll[:, k], manual, rtol=1e-4,
                                       atol=1e-4)


class TestSequenceUtilities:
    def test_align_sequences_passthrough(self):
        hmm = HMM(utils.create_left_to_right_matrix(4))
        obs = jax.random.uniform(jax.random.PRNGKey(0), (12, 4))
        direct, _ = hmm.viterbi_decode(obs)
        via = utils.align_sequences(jnp.arange(4), obs, hmm)
        np.testing.assert_array_equal(np.asarray(via), np.asarray(direct))

    def test_compute_state_durations_golden(self):
        out = utils.compute_state_durations(jnp.asarray([0, 0, 1, 1, 1, 2]))
        np.testing.assert_array_equal(np.asarray(out), [2, 3, 1])
        assert utils.compute_state_durations(jnp.asarray([])).size == 0
        np.testing.assert_array_equal(
            np.asarray(utils.compute_state_durations(jnp.asarray([7]))), [1]
        )

    def test_interpolate_features_golden(self):
        feats = jnp.asarray(
            [[0.0], [2.0], [4.0], [6.0]], jnp.float32
        )  # two segments of 2; means 1.0 and 5.0
        out = np.asarray(utils.interpolate_features(
            feats, jnp.asarray([2, 2]), jnp.asarray([1, 3])
        ))
        np.testing.assert_allclose(out[:, 0], [1.0, 5.0, 5.0, 5.0])


class TestAttentionTransition:
    def test_rows_normalize_and_context_matters(self):
        m = utils.create_attention_based_transitions(
            4, attention_dim=8, rngs=nnx.Rngs(0)
        )
        assert isinstance(m, utils.AttentionTransition)
        c1 = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 8))
        c2 = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8))
        p1, p2 = m(c1), m(c2)
        assert p1.shape == (1, 6, 4, 4)
        _rows_stochastic(p1)
        assert not np.allclose(np.asarray(p1), np.asarray(p2))


class TestOptimizeTransitionMatrix:
    def test_dwell_moves_toward_targets(self):
        p = utils.create_left_to_right_matrix(4, self_loop_prob=0.5)
        # Target dwell 10 frames -> target self-loop 0.9.
        out = np.asarray(utils.optimize_transition_matrix(
            p, target_durations=[10.0, 10.0, 10.0, 10.0],
            smoothness_weight=0.5,
        ))
        _rows_stochastic(out)
        # Halfway between 0.5 and 0.9 = 0.7 for non-final states.
        np.testing.assert_allclose(np.diag(out)[:-1], 0.7, atol=1e-4)
        assert out[-1, -1] == pytest.approx(1.0)

    def test_no_targets_only_normalizes(self):
        p = jnp.asarray([[2.0, 2.0], [0.0, 5.0]])
        out = np.asarray(utils.optimize_transition_matrix(p))
        np.testing.assert_allclose(out, [[0.5, 0.5], [0.0, 1.0]], atol=1e-5)


class TestValidateTransitionMatrix:
    def test_valid_l2r_passes_all(self):
        res = utils.validate_transition_matrix(
            utils.create_left_to_right_matrix(5)
        )
        assert all(res.values()), res

    def test_flags_violations(self):
        bad_sum = jnp.asarray([[0.5, 0.1], [0.0, 1.0]])
        assert not utils.validate_transition_matrix(bad_sum)["row_sums_valid"]
        neg = jnp.asarray([[1.5, -0.5], [0.0, 1.0]])
        assert not utils.validate_transition_matrix(neg)["non_negative"]
        skippy = jnp.asarray([
            [0.5, 0.2, 0.3], [0.0, 0.5, 0.5], [0.0, 0.0, 1.0]
        ])
        assert not utils.validate_transition_matrix(skippy)[
            "left_to_right_pattern"
        ]
        trapped = jnp.eye(3)  # no path to the final state
        assert not utils.validate_transition_matrix(trapped)[
            "reachable_to_final"
        ]


class TestBenchmarkTransitionOperations:
    def test_returns_timings(self):
        res = utils.benchmark_transition_operations([4], num_trials=2)
        for key in ("matrix_creation", "matrix_multiplication",
                    "softmax_normalization", "validation"):
            assert res[key][4] > 0.0


class TestProsodyAwareTransitions:
    def test_rising_f0_shifts_mass_off_diagonal(self):
        # A sharp F0 step: the jump frame's normalized derivative
        # crosses the builder's "rising" threshold (0.5 std).
        T, K = 40, 5
        jump = T // 2
        f0 = np.full(T, 100.0, np.float32)
        f0[jump:] = 200.0
        flat = np.full(T, 100.0, np.float32)
        energy = np.zeros(T, np.float32)
        p_rise = np.asarray(utils.create_prosody_aware_transitions(
            jnp.asarray(f0), jnp.asarray(energy), K
        ))
        p_flat = np.asarray(utils.create_prosody_aware_transitions(
            jnp.asarray(flat), jnp.asarray(energy), K
        ))
        assert p_rise.shape == (T, K, K)
        _rows_stochastic(p_rise)
        assert p_rise[jump, 0, 0] < p_flat[jump, 0, 0]   # less dwell
        assert p_rise[jump, 0, 1] > p_flat[jump, 0, 1]   # more forward
        # Frames away from the jump are unaffected.
        np.testing.assert_allclose(p_rise[5], p_flat[5], atol=1e-6)

    def test_high_energy_boosts_dwell(self):
        T, K = 30, 4
        f0 = np.full(T, 100.0, np.float32)
        loud = np.zeros(T, np.float32)
        loud[10] = 50.0  # >> 1 std above mean
        p = np.asarray(utils.create_prosody_aware_transitions(
            jnp.asarray(f0), jnp.asarray(loud), K
        ))
        assert p[10, 0, 0] > p[5, 0, 0]


class TestAnalyzeTransitionPatterns:
    def test_counts_match_hand_built(self):
        seqs = [jnp.asarray([0, 0, 1, 2, 2, 4]),   # 2 self, 2 fwd, 1 skip
                jnp.asarray([3, 2, 2])]            # 1 bwd, 1 self
        stats = utils.analyze_transition_patterns(seqs)
        assert stats["total_transitions"] == 7
        assert stats["self_loop_ratio"] == pytest.approx(3 / 7)
        assert stats["forward_ratio"] == pytest.approx(2 / 7)
        assert stats["backward_ratio"] == pytest.approx(1 / 7)
        assert stats["skip_ratio"] == pytest.approx(1 / 7)
        assert stats["total_sequences"] == 2

    def test_empty_and_degenerate(self):
        stats = utils.analyze_transition_patterns([jnp.asarray([5])])
        assert stats["total_transitions"] == 0
        assert stats["self_loop_ratio"] == 0.0
