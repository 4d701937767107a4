"""Layer API tests: HMMLayer / GaussianHMMLayer / MixtureGaussianHMMLayer.

Mirrors reference tests/test_hmm.py:149-248 (layer modes, losses, parameter
learning) and tests/test_mixture_gaussian.py (covariance types, gradient
flow, stability), plus EM monotonicity which the reference lacks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from flax import nnx

from pytorch_hmm_tpu.models import (
    GaussianHMMLayer,
    HMMLayer,
    MixtureGaussianHMMLayer,
)

B, T, K, D = 2, 30, 5, 8


class TestHMMLayer:
    def test_train_mode_soft_posteriors(self):
        layer = HMMLayer(K).train()
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, K))
        post = layer(x)
        assert post.shape == (B, T, K)
        np.testing.assert_allclose(np.asarray(post).sum(-1), 1.0, atol=1e-4)

    def test_eval_mode_one_hot(self):
        layer = HMMLayer(K).eval()
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, K))
        post, align = layer(x, return_alignment=True)
        assert post.shape == (B, T, K)
        assert align.shape == (B, T)
        assert np.all(np.isin(np.asarray(post), [0.0, 1.0]))
        # L2R topology → monotonic alignment
        assert np.all(np.diff(np.asarray(align), axis=1) >= 0)

    def test_unbatched(self):
        layer = HMMLayer(K)
        x = jax.random.normal(jax.random.PRNGKey(0), (T, K))
        assert layer(x).shape == (T, K)

    def test_losses(self):
        layer = HMMLayer(K)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, K))
        tgt = jnp.zeros((B, T), dtype=jnp.int32)
        sup = layer.compute_loss(x, tgt)
        unsup = layer.compute_loss(x)
        assert np.isfinite(sup) and sup > 0
        assert np.isfinite(unsup)

    def test_parameters_learn(self):
        # Parity with reference test_hmm.py:189-208 — transitions change
        # after one optimizer step.
        layer = HMMLayer(K)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, T, K))
        before = np.asarray(layer.get_transition_matrix()).copy()

        optimizer = nnx.Optimizer(layer, optax.adam(1e-2), wrt=nnx.Param)

        def loss_fn(m):
            return m.compute_loss(x)

        loss, grads = nnx.value_and_grad(loss_fn)(layer)
        optimizer.update(layer, grads)
        after = np.asarray(layer.get_transition_matrix())
        assert not np.allclose(before, after)

    def test_fixed_transitions(self):
        layer = HMMLayer(K, learnable_transitions=False)
        p = np.asarray(layer.get_transition_matrix())
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, K))
        assert layer(x).shape == (B, T, K)

    def test_align_and_sample(self):
        layer = HMMLayer(K)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, K))
        states, score = layer.align(x)
        assert states.shape == (B, T) and score.shape == (B,)
        obs, st = layer.sample(seq_length=12, batch_size=3)
        assert obs.shape == (3, 12, K) and st.shape == (3, 12)


class TestGaussianHMMLayer:
    @pytest.mark.parametrize("cov", ["diag", "spherical", "full"])
    def test_forward_shapes(self, cov):
        layer = GaussianHMMLayer(K, D, covariance_type=cov).train()
        obs = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
        post = layer(obs)
        assert post.shape == (B, T, K)
        np.testing.assert_allclose(np.asarray(post).sum(-1), 1.0, atol=1e-4)

    def test_loss_and_grad(self):
        layer = GaussianHMMLayer(K, D)
        obs = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
        loss = layer.compute_loss(obs)
        assert np.isfinite(loss)

        def loss_fn(m):
            return m.compute_loss(obs)

        _, grads = nnx.value_and_grad(loss_fn)(layer)
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(g)) for g in leaves)
        assert sum(float(np.abs(g).sum()) for g in leaves) > 0

    def test_full_cov_differs_from_diag(self):
        # 'full' must be a real full-covariance model, not the reference's
        # silent diagonal fallback (hmm_layer.py:311-319).
        layer = GaussianHMMLayer(K, D, covariance_type="full")
        # introduce off-diagonal structure
        layer.log_scales.value = layer.log_scales.value + 0.5 * jnp.tril(
            jnp.ones((K, D, D)), k=-1
        )
        obs = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
        lp_full = layer._compute_gaussian_log_probs(obs)
        diag_layer = GaussianHMMLayer(K, D, covariance_type="diag")
        diag_layer.means.value = layer.means.value
        lp_diag = diag_layer._compute_gaussian_log_probs(obs)
        assert not np.allclose(np.asarray(lp_full), np.asarray(lp_diag))


class TestMixtureGaussianHMM:
    @pytest.mark.parametrize("cov", ["diag", "full", "tied", "spherical"])
    def test_decode_all_covariances(self, cov):
        m = MixtureGaussianHMMLayer(K, D, num_components=2, covariance_type=cov)
        obs = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
        states, ll = m(obs, return_log_probs=True)
        assert states.shape == (B, T)
        assert ll.shape == (B,)
        assert np.all(np.asarray(states) >= 0) and np.all(np.asarray(states) < K)
        assert np.all(np.isfinite(np.asarray(ll)))

    def test_observation_log_probs_finite_extreme(self):
        # Stability with extreme inputs (reference test_mixture_gaussian.py:138).
        m = MixtureGaussianHMMLayer(K, D, num_components=2)
        obs = jnp.concatenate([
            jnp.full((1, T, D), 100.0), jnp.full((1, T, D), -100.0)
        ])
        lp = m.get_observation_log_probs(obs)
        assert np.all(np.isfinite(np.asarray(lp)))

    def test_gradient_flow(self):
        m = MixtureGaussianHMMLayer(K, D, num_components=2)
        obs = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))

        def loss_fn(mod):
            return mod.compute_loss(obs)

        loss, grads = nnx.value_and_grad(loss_fn)(m)
        assert np.isfinite(loss)
        leaves = jax.tree.leaves(grads)
        assert sum(float(np.abs(g).sum()) for g in leaves) > 0

    @pytest.mark.parametrize("cov", ["diag", "spherical", "tied", "full"])
    def test_em_monotone(self, cov):
        # EM must not decrease the likelihood (new capability vs reference).
        m = MixtureGaussianHMMLayer(
            4, 3, num_components=2, covariance_type=cov
        )
        key = jax.random.PRNGKey(0)
        centers = jax.random.normal(key, (4, 3)) * 3
        noise = jax.random.normal(jax.random.PRNGKey(1), (B, 40, 3)) * 0.5
        labels = jnp.repeat(jnp.arange(4), 10)[None].repeat(B, 0)
        obs = centers[labels] + noise

        lls = [float(m.em_step(obs)) for _ in range(4)]
        # ll returned is pre-update; successive values must be increasing.
        for a, b in zip(lls[:-1], lls[1:]):
            assert b >= a - 1e-3, lls

    @pytest.mark.parametrize("cov", ["diag", "full"])
    def test_prepared_decoder_matches_live_path(self, cov):
        # ADVICE r4: the serving decoder's emission route differs from
        # the live layer's (full covariance folds weights into log_norm
        # via fullcov_mixture_log_probs_prepared), so drift there needs
        # a dedicated parity check — states exact, scores close.
        m = MixtureGaussianHMMLayer(
            K, D, num_components=2, covariance_type=cov
        )
        obs = jax.random.normal(jax.random.PRNGKey(3), (B, T, D))
        live_states, live_ll = m(obs, return_log_probs=True)
        dec = m.make_decoder()
        got_states, got_ll = dec(obs, return_log_probs=True)
        np.testing.assert_array_equal(
            np.asarray(got_states), np.asarray(live_states)
        )
        np.testing.assert_allclose(
            np.asarray(got_ll), np.asarray(live_ll), rtol=2e-4, atol=5e-4
        )
        # Pytree round-trip (checkpoint / jit-argument use) preserves it.
        leaves, treedef = jax.tree_util.tree_flatten(dec)
        dec2 = jax.tree_util.tree_unflatten(treedef, leaves)
        rt_states, rt_ll = dec2(obs, return_log_probs=True)
        np.testing.assert_array_equal(
            np.asarray(rt_states), np.asarray(got_states)
        )
        np.testing.assert_allclose(
            np.asarray(rt_ll), np.asarray(got_ll), rtol=1e-6
        )

    def test_model_info(self):
        m = MixtureGaussianHMMLayer(K, D, num_components=3)
        info = m.get_model_info()
        assert info["num_states"] == K
        assert info["total_parameters"] > 0
