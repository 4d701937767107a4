"""HSMM / semi-Markov family tests.

Mirrors the reference's test strategy (``tests/test_hsmm.py`` structural
assertions: pmf validity, no-self-loop invariant, decode shapes, gradient
flow) and adds a brute-force segmentation oracle the reference lacks —
its own DP is the only definition of correctness it has.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from pytorch_hmm_tpu.core.hsmm import hsmm_forward, hsmm_viterbi
from pytorch_hmm_tpu.models import (
    AdaptiveDurationHSMM,
    DurationConstrainedHMM,
    DurationModel,
    HSMMLayer,
    SemiMarkovHMM,
)


# ---------------------------------------------------------------------------
# Core kernel vs brute-force oracle
# ---------------------------------------------------------------------------

def _brute_force(log_obs, log_a, log_pi, log_dur):
    """Enumerate every segmentation of one sequence (exponential; tiny T)."""
    T, S = log_obs.shape
    D = log_dur.shape[1]
    best, best_path, total = -np.inf, None, -np.inf

    def rec(t, s_prev, score, path):
        nonlocal best, best_path, total
        if t == T:
            if score > best:
                best, best_path = score, list(path)
            total = np.logaddexp(total, score)
            return
        for s in range(S):
            if s_prev is not None and (
                s == s_prev or not np.isfinite(log_a[s_prev, s])
            ):
                continue
            trans = log_pi[s] if s_prev is None else log_a[s_prev, s]
            for d in range(1, min(D, T - t) + 1):
                if not np.isfinite(log_dur[s, d - 1]):
                    continue
                e = log_obs[t:t + d, s].sum()
                rec(t + d, s, score + trans + log_dur[s, d - 1] + e,
                    path + [s] * d)

    rec(0, None, 0.0, [])
    return best, best_path, total


@pytest.fixture(scope="module")
def hsmm_problem():
    rng = np.random.default_rng(3)
    B, T, S, D = 2, 10, 3, 4
    log_obs = rng.normal(size=(B, T, S)).astype(np.float32)
    log_a = np.full((S, S), -np.inf, np.float32)
    for i in range(S):
        cols = [j for j in range(S) if j != i]
        log_a[i, cols] = np.log(rng.dirichlet(np.ones(S - 1)))
    log_pi = np.log(rng.dirichlet(np.ones(S))).astype(np.float32)
    log_dur = np.log(rng.dirichlet(np.ones(D), size=S)).astype(np.float32)
    return log_obs, log_a, log_pi, log_dur


def test_hsmm_viterbi_matches_oracle(hsmm_problem):
    log_obs, log_a, log_pi, log_dur = hsmm_problem
    states, score = hsmm_viterbi(
        jnp.asarray(log_obs), jnp.asarray(log_a),
        jnp.asarray(log_pi), jnp.asarray(log_dur),
    )
    for b in range(log_obs.shape[0]):
        best, path, _ = _brute_force(log_obs[b], log_a, log_pi, log_dur)
        assert float(score[b]) == pytest.approx(best, abs=1e-4)
        assert list(np.asarray(states[b])) == path


def test_hsmm_forward_matches_oracle(hsmm_problem):
    log_obs, log_a, log_pi, log_dur = hsmm_problem
    _, log_z = hsmm_forward(
        jnp.asarray(log_obs), jnp.asarray(log_a),
        jnp.asarray(log_pi), jnp.asarray(log_dur),
    )
    for b in range(log_obs.shape[0]):
        _, _, total = _brute_force(log_obs[b], log_a, log_pi, log_dur)
        assert float(log_z[b]) == pytest.approx(total, abs=1e-3)


def test_hsmm_min_duration_respected():
    rng = np.random.default_rng(0)
    log_obs = jnp.asarray(rng.normal(size=(1, 24, 3)), jnp.float32)
    log_a = jnp.log(
        jnp.asarray([[0, .5, .5], [.5, 0, .5], [.5, .5, 0]], jnp.float32)
        + 1e-12
    )
    log_pi = jnp.log(jnp.full((3,), 1 / 3))
    # durations 1..2 forbidden
    log_dur = jnp.where(
        jnp.arange(1, 7)[None, :] >= 3, jnp.log(0.25), -jnp.inf
    ) * jnp.ones((3, 1))
    states, _ = hsmm_viterbi(log_obs, log_a, log_pi, log_dur)
    s = np.asarray(states[0])
    runs = np.diff(np.flatnonzero(np.concatenate(([1], np.diff(s) != 0, [1]))))
    assert (runs >= 3).all(), f"run lengths {runs} violate min_duration=3"


# ---------------------------------------------------------------------------
# HSMMLayer
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dist", ["gamma", "poisson", "weibull"])
def test_hsmm_layer_decode_and_likelihood(dist):
    m = HSMMLayer(
        num_states=4, feature_dim=6, duration_distribution=dist,
        max_duration=8, min_duration=2, rngs=nnx.Rngs(0),
    )
    obs = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 30, 6)), jnp.float32
    )
    states, scores = m(obs)
    assert states.shape == (2, 30)
    assert np.isfinite(np.asarray(scores)).all()
    ll = m.log_likelihood(obs)
    assert np.isfinite(np.asarray(ll)).all()
    assert (ll >= scores - 1e-3).all(), "marginal must dominate best path"


def test_hsmm_layer_no_self_loops():
    m = HSMMLayer(num_states=5, feature_dim=4, rngs=nnx.Rngs(0))
    P = m.get_transition_matrix()
    assert np.allclose(np.diagonal(np.asarray(P)), 0.0)
    assert np.allclose(np.asarray(P).sum(-1), 1.0, atol=1e-5)


def test_hsmm_layer_duration_pmf_and_expectations():
    m = HSMMLayer(
        num_states=3, feature_dim=4, duration_distribution="poisson",
        max_duration=30, normalize_durations=True, rngs=nnx.Rngs(0),
    )
    p = np.asarray(m.get_duration_probabilities())
    assert p.shape == (3, 30)
    assert (p >= 0).all()
    assert np.allclose(p.sum(-1), 1.0, atol=1e-4)
    ed = np.asarray(m.get_expected_durations())
    assert np.allclose(ed, 10.0, atol=1e-3)  # init lambda = 10


def test_hsmm_layer_gradient_flow():
    m = HSMMLayer(num_states=3, feature_dim=4, max_duration=6,
                  rngs=nnx.Rngs(0))
    obs = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 20, 4)), jnp.float32
    )
    grads = nnx.grad(lambda mm: mm.compute_loss(obs))(m)
    leaves = jax.tree.leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_hsmm_generation():
    m = HSMMLayer(num_states=3, feature_dim=4, max_duration=6,
                  min_duration=2, rngs=nnx.Rngs(0))
    states, obs = m.generate_sequence(40, key=jax.random.PRNGKey(0))
    assert states.shape == (40,) and obs.shape == (40, 4)
    s = np.asarray(states)
    assert set(np.unique(s)) <= {0, 1, 2}
    # interior runs obey min_duration
    runs = np.diff(np.flatnonzero(np.concatenate(([1], np.diff(s) != 0, [1]))))
    assert (runs[1:-1] >= 2).all() if len(runs) > 2 else True


def test_duration_constrained_hmm():
    m = DurationConstrainedHMM(
        num_states=3, feature_dim=5, min_duration=2, max_duration=6,
        rngs=nnx.Rngs(0),
    )
    obs = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 25, 5)), jnp.float32
    )
    states = m(obs)
    assert states.shape == (2, 25)
    assert np.asarray(states).max() < 3


# ---------------------------------------------------------------------------
# DurationModel / SemiMarkovHMM / AdaptiveDurationHSMM
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dt", ["gamma", "poisson", "gaussian", "neural"])
def test_duration_model(dt):
    dm = DurationModel(4, max_duration=10, distribution_type=dt,
                       min_duration=2, rngs=nnx.Rngs(0))
    full = dm(jnp.asarray([0, 1, 2]))
    assert full.shape == (3, 10)
    assert np.isneginf(np.asarray(full[:, 0])).all(), "d=1 < min_duration"
    pair = dm(jnp.asarray([0, 1]), jnp.asarray([3, 5]))
    assert pair.shape == (2,) and np.isfinite(np.asarray(pair)).all()
    s = dm.sample(jnp.asarray([0, 1, 2, 3]), key=jax.random.PRNGKey(0))
    assert bool((s >= 2).all()) and bool((s <= 10).all())


def test_duration_model_unknown_type():
    with pytest.raises(ValueError, match="banana"):
        DurationModel(3, distribution_type="banana", rngs=nnx.Rngs(0))


def test_semi_markov_forward_modes():
    sm = SemiMarkovHMM(3, 5, max_duration=8, rngs=nnx.Rngs(0))
    obs = jnp.asarray(
        np.random.default_rng(4).normal(size=(16, 5)), jnp.float32
    )
    unsup = sm(obs)
    assert np.isfinite(float(unsup["log_probability"][0]))
    assert unsup["forward_variables"].shape == (1, 16, 3)

    sup = sm(obs[None], jnp.asarray([[0, 1, 2]]), jnp.asarray([[5, 6, 5]]))
    for k in ("log_probability", "log_observation", "log_duration",
              "log_transition"):
        assert np.isfinite(float(sup[k][0])), k
    # supervised (one alignment) can never beat the marginal
    assert float(sup["log_probability"][0]) <= float(
        unsup["log_probability"][0]) + 1e-3


def test_semi_markov_viterbi_rle():
    sm = SemiMarkovHMM(3, 5, max_duration=8, rngs=nnx.Rngs(0))
    obs = jnp.asarray(
        np.random.default_rng(5).normal(size=(20, 5)), jnp.float32
    )
    states, durations, lp = sm.viterbi_decode(obs)
    assert int(jnp.sum(durations)) == 20
    assert np.isfinite(float(lp))
    assert (np.diff(np.asarray(states)) != 0).all(), "RLE states must alternate"


def test_semi_markov_sample():
    sm = SemiMarkovHMM(3, 5, max_duration=6, rngs=nnx.Rngs(0))
    states, durations, obs = sm.sample(4, max_length=30,
                                       key=jax.random.PRNGKey(1))
    assert states.shape == (4,) and durations.shape == (4,)
    assert obs.shape[0] == int(jnp.sum(durations)) <= 30


def test_adaptive_duration_hsmm():
    ad = AdaptiveDurationHSMM(3, 5, context_dim=7, max_duration=8,
                              rngs=nnx.Rngs(0))
    ctx = jnp.asarray(np.random.default_rng(6).normal(size=(2, 7)), jnp.float32)
    dp = ad.compute_contextual_duration_probs(jnp.asarray([0, 2]), ctx)
    assert dp.shape == (2, 8)
    assert np.allclose(np.exp(np.asarray(dp)).sum(-1), 1.0, atol=1e-5)
    obs = jnp.asarray(np.random.default_rng(7).normal(size=(12, 5)), jnp.float32)
    ll = ad.contextual_log_likelihood(obs, ctx[0])
    assert np.isfinite(float(ll[0]))


def test_hsmm_backward_consistency(hsmm_problem):
    """lse(log_pi + beta_start[0]) must equal log Z for every batch row."""
    from jax.scipy.special import logsumexp
    from pytorch_hmm_tpu.core.hsmm import hsmm_backward

    log_obs, log_a, log_pi, log_dur = hsmm_problem
    _, log_z = hsmm_forward(
        jnp.asarray(log_obs), jnp.asarray(log_a),
        jnp.asarray(log_pi), jnp.asarray(log_dur),
    )
    _, bstart = hsmm_backward(
        jnp.asarray(log_obs), jnp.asarray(log_a), jnp.asarray(log_dur)
    )
    z2 = logsumexp(jnp.asarray(log_pi) + bstart[:, 0], axis=-1)
    np.testing.assert_allclose(z2, log_z, atol=1e-4)


def test_hsmm_posteriors_match_oracle(hsmm_problem):
    from pytorch_hmm_tpu.core.hsmm import hsmm_posteriors

    log_obs, log_a, log_pi, log_dur = hsmm_problem
    B, T, S = log_obs.shape
    D = log_dur.shape[1]
    post = hsmm_posteriors(
        jnp.asarray(log_obs), jnp.asarray(log_a),
        jnp.asarray(log_pi), jnp.asarray(log_dur),
    )
    g = np.asarray(post["gamma"])
    np.testing.assert_allclose(g.sum(-1), 1.0, atol=1e-4)

    # Brute-force occupancy for each row.
    for b in range(B):
        occ = np.zeros((T, S))

        def rec(t, s_prev, score, path):
            if t == T:
                p = np.exp(score)
                for u, st in enumerate(path):
                    occ[u, st] += p
                return
            for s in range(S):
                if s_prev is not None and (
                    s == s_prev or not np.isfinite(log_a[s_prev, s])
                ):
                    continue
                trans = log_pi[s] if s_prev is None else log_a[s_prev, s]
                for d in range(1, min(D, T - t) + 1):
                    e = log_obs[b, t:t + d, s].sum()
                    rec(t + d, s,
                        score + trans + log_dur[s, d - 1] + e,
                        path + [s] * d)

        rec(0, None, 0.0, [])
        oracle = occ / occ.sum(1, keepdims=True)
        np.testing.assert_allclose(g[b], oracle, atol=1e-4)


def test_hsmm_layer_posteriors():
    m = HSMMLayer(num_states=3, feature_dim=4, max_duration=6,
                  rngs=nnx.Rngs(0))
    obs = jnp.asarray(
        np.random.default_rng(8).normal(size=(2, 20, 4)), jnp.float32
    )
    post = m.posteriors(obs)
    assert post["gamma"].shape == (2, 20, 3)
    np.testing.assert_allclose(
        np.asarray(post["gamma"]).sum(-1), 1.0, atol=1e-4
    )
    # argmax-occupancy should broadly agree with Viterbi
    states, _ = m(obs)
    agree = np.mean(
        np.asarray(jnp.argmax(post["gamma"], -1)) == np.asarray(states)
    )
    assert agree > 0.5


@pytest.mark.parametrize("dist", ["gamma", "poisson", "weibull"])
def test_hsmm_em_improves_likelihood(dist):
    """Baum-Welch on segment-structured data: the likelihood must climb
    (a capability the reference lacks entirely)."""
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=4.0, size=(3, 5))
    frames = []
    for _ in range(2):
        seq = []
        for seg in range(6):
            s = seg % 3
            d = rng.integers(4, 9)
            seq.append(centers[s] + 0.5 * rng.normal(size=(d, 5)))
        frames.append(np.concatenate(seq)[:40])
    obs = jnp.asarray(np.stack(frames), jnp.float32)

    m = HSMMLayer(3, 5, duration_distribution=dist, max_duration=12,
                  normalize_durations=True, rngs=nnx.Rngs(0))
    lls = [float(m.em_step(obs)) for _ in range(5)]
    assert lls[-1] > lls[0] + 100, lls
    assert all(np.isfinite(lls)), lls
    # Learned states must separate the clusters: decoded paths use all 3.
    states, _ = m(obs)
    assert len(np.unique(np.asarray(states))) == 3


@pytest.mark.parametrize("dist", ["gamma", "poisson", "gaussian"])
def test_semi_markov_em_improves_likelihood(dist):
    rng = np.random.default_rng(1)
    centers = rng.normal(scale=4.0, size=(3, 5))
    frames = []
    for _ in range(2):
        seq = []
        for seg in range(10):  # enough segments to always cover 40 frames
            s = seg % 3
            d = rng.integers(4, 9)
            seq.append(centers[s] + 0.5 * rng.normal(size=(d, 5)))
        frames.append(np.concatenate(seq)[:40])
    obs = jnp.asarray(np.stack(frames), jnp.float32)

    m = SemiMarkovHMM(3, 5, max_duration=12, duration_distribution=dist,
                      rngs=nnx.Rngs(0))
    lls = [float(m.em_step(obs)) for _ in range(5)]
    assert lls[-1] > lls[0] + 100, lls
    assert all(np.isfinite(lls))


def test_semi_markov_em_rejects_unsupported():
    m = SemiMarkovHMM(3, 5, duration_distribution="neural",
                      rngs=nnx.Rngs(0))
    with pytest.raises(NotImplementedError):
        m.em_step(jnp.zeros((1, 10, 5)))


# ---------------------------------------------------------------------------
# Ragged (lengths) support: padded-batch results == per-row unpadded results
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ragged_hsmm_problem(hsmm_problem):
    log_obs, log_a, log_pi, log_dur = hsmm_problem
    # Tile to 4 rows with assorted valid lengths; fill the padding with
    # garbage so any leakage is loud.
    rng = np.random.default_rng(9)
    lo = np.concatenate([log_obs, log_obs[::-1]], axis=0)  # (4, 10, 3)
    lengths = np.asarray([10, 6, 8, 3], np.int32)
    lo_pad = lo.copy()
    for b, n in enumerate(lengths):
        lo_pad[b, n:] = rng.normal(scale=50.0, size=lo_pad[b, n:].shape)
    return (
        jnp.asarray(lo_pad), jnp.asarray(log_a), jnp.asarray(log_pi),
        jnp.asarray(log_dur), jnp.asarray(lengths),
    )


def test_hsmm_forward_ragged_matches_unpadded(ragged_hsmm_problem):
    lo, la, lp, ld, lengths = ragged_hsmm_problem
    _, lz = hsmm_forward(lo, la, lp, ld, lengths)
    for b, n in enumerate(np.asarray(lengths)):
        _, lz_b = hsmm_forward(lo[b:b + 1, :n], la, lp, ld)
        np.testing.assert_allclose(lz[b], lz_b[0], rtol=1e-5)


def test_hsmm_viterbi_ragged_matches_unpadded(ragged_hsmm_problem):
    lo, la, lp, ld, lengths = ragged_hsmm_problem
    states, score = hsmm_viterbi(lo, la, lp, ld, lengths)
    states, score = np.asarray(states), np.asarray(score)
    for b, n in enumerate(np.asarray(lengths)):
        s_b, sc_b = hsmm_viterbi(lo[b:b + 1, :n], la, lp, ld)
        np.testing.assert_array_equal(states[b, :n], np.asarray(s_b)[0])
        np.testing.assert_allclose(score[b], np.asarray(sc_b)[0], rtol=1e-5)
        # Padded frames repeat the final valid state.
        assert (states[b, n:] == states[b, n - 1]).all()


def test_hsmm_posteriors_ragged_matches_unpadded(ragged_hsmm_problem):
    from pytorch_hmm_tpu.core.hsmm import hsmm_posteriors

    lo, la, lp, ld, lengths = ragged_hsmm_problem
    post = hsmm_posteriors(lo, la, lp, ld, lengths)
    for b, n in enumerate(np.asarray(lengths)):
        ref = hsmm_posteriors(lo[b:b + 1, :n], la, lp, ld)
        for key in ("gamma", "segment_start", "segment_end"):
            np.testing.assert_allclose(
                np.asarray(post[key])[b, :n], np.asarray(ref[key])[0],
                atol=1e-5,
            )
            # Zero past each row's length.
            if n < lo.shape[1]:
                assert np.abs(np.asarray(post[key])[b, n:]).max() == 0.0
        np.testing.assert_allclose(post["log_z"][b], ref["log_z"][0],
                                   rtol=1e-5)


def test_hsmm_em_padding_invariant():
    """Garbage in the padded region must not change EM updates."""
    rng = np.random.default_rng(5)
    obs = rng.normal(size=(3, 20, 4)).astype(np.float32)
    lengths = jnp.asarray([20, 12, 15], jnp.int32)
    obs2 = obs.copy()
    for b, n in enumerate(np.asarray(lengths)):
        obs2[b, n:] = rng.normal(scale=30.0, size=obs2[b, n:].shape)

    def run(o):
        m = HSMMLayer(3, 4, max_duration=6, rngs=nnx.Rngs(0))
        ll = m.em_step(jnp.asarray(o), lengths=lengths)
        return ll, m.observation_means[...], m.transition_logits[...]

    ll1, mean1, tl1 = run(obs)
    ll2, mean2, tl2 = run(obs2)
    np.testing.assert_allclose(ll1, ll2, rtol=1e-6)
    np.testing.assert_allclose(mean1, mean2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(tl1, tl2, rtol=1e-5, atol=1e-6)


def test_hsmm_em_distributed_matches_local():
    """Batch-sharded HSMM EM (shard_map + psum) == single-device EM."""
    from pytorch_hmm_tpu.parallel import make_mesh

    rng = np.random.default_rng(7)
    obs = jnp.asarray(rng.normal(size=(8, 16, 4)), jnp.float32)
    mesh = make_mesh(data=8, time=1)

    m_local = HSMMLayer(3, 4, max_duration=6, rngs=nnx.Rngs(0))
    m_dist = HSMMLayer(3, 4, max_duration=6, rngs=nnx.Rngs(0))
    ll_l = m_local.em_step(obs)
    ll_d = m_dist.em_step(obs, mesh=mesh)
    np.testing.assert_allclose(ll_l, ll_d, rtol=1e-5)
    np.testing.assert_allclose(
        m_local.observation_means[...], m_dist.observation_means[...],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        m_local.transition_logits[...], m_dist.transition_logits[...],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        m_local.duration_shape[...], m_dist.duration_shape[...],
        rtol=1e-4, atol=1e-5,
    )


def test_semi_markov_em_distributed_matches_local():
    """Batch-sharded SemiMarkov EM == single-device EM."""
    from pytorch_hmm_tpu.parallel import make_mesh

    rng = np.random.default_rng(21)
    obs = jnp.asarray(rng.normal(size=(8, 20, 5)), jnp.float32)
    mesh = make_mesh(data=8, time=1)

    m_l = SemiMarkovHMM(3, 5, max_duration=8, rngs=nnx.Rngs(2))
    m_d = SemiMarkovHMM(3, 5, max_duration=8, rngs=nnx.Rngs(2))
    ll_l = m_l.em_step(obs)
    ll_d = m_d.em_step(obs, mesh=mesh)
    np.testing.assert_allclose(ll_l, ll_d, rtol=1e-5)
    np.testing.assert_allclose(
        m_l.observation_means[...], m_d.observation_means[...],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        m_l.initial_logits[...], m_d.initial_logits[...],
        rtol=1e-4, atol=1e-5,
    )


def test_semi_markov_em_padding_invariant():
    rng = np.random.default_rng(23)
    obs = rng.normal(size=(2, 24, 5)).astype(np.float32)
    lengths = jnp.asarray([24, 15], jnp.int32)
    obs2 = obs.copy()
    obs2[1, 15:] = rng.normal(scale=25.0, size=obs2[1, 15:].shape)

    def run(o):
        m = SemiMarkovHMM(3, 5, max_duration=8, rngs=nnx.Rngs(0))
        ll = m.em_step(jnp.asarray(o), lengths=lengths)
        return ll, m.observation_means[...]

    ll1, mean1 = run(obs)
    ll2, mean2 = run(obs2)
    np.testing.assert_allclose(ll1, ll2, rtol=1e-6)
    np.testing.assert_allclose(mean1, mean2, rtol=1e-5, atol=1e-6)
