"""HMMLayer / GaussianHMMLayer — trainable HMM modules.

Parity targets: reference ``hmm_layer.py:11-217`` (HMMLayer) and
``hmm_layer.py:220-363`` (GaussianHMMLayer). Differences by design:

* All inference runs through the shared scan kernels in ``core`` — the
  reference rebuilds an ``HMMPyTorch`` object every forward call
  (``hmm_layer.py:73-89``); here the log transition matrix is computed
  directly from the parameters inside the traced function.
* GaussianHMMLayer keeps emissions in log space end-to-end; the reference
  exponentiates then re-logs (``hmm_layer.py:336-340``), which underflows
  for far-from-mean frames.
* 'full' covariance is a real full-covariance model, not the reference's
  silent diagonal fallback (``hmm_layer.py:311-319``).
* Supervised loss is cross-entropy on log-posteriors (proper CE; the
  reference feeds probabilities where logits are expected,
  ``hmm_layer.py:160-165``).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from .. import core
from ..core.semiring import safe_log
from ..ops import (auto_forward_backward, auto_log_likelihood,
                   auto_viterbi)
from ..emissions import gaussian_log_probs
from ..precision import maybe_remat
from ..utils import create_left_to_right_matrix, create_transition_matrix
from .common import Buffer, TrainMode

__all__ = ["HMMLayer", "GaussianHMMLayer"]


class HMMLayer(TrainMode):
    """Trainable-transition HMM layer over per-state observation scores.

    Train mode → soft posteriors via forward-backward; eval mode → hard
    one-hot Viterbi alignment (configurable), matching reference semantics
    (``hmm_layer.py:119-131``).
    """

    def __init__(
        self,
        num_states: int,
        learnable_transitions: bool = True,
        transition_type: str = "left_to_right",
        self_loop_prob: float = 0.7,
        viterbi_inference: bool = True,
        apply_sigmoid: bool = True,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        self.num_states = num_states
        self.learnable_transitions = learnable_transitions
        self.viterbi_inference = viterbi_inference
        self.apply_sigmoid = apply_sigmoid
        self._training = True

        if transition_type == "left_to_right":
            p_init = create_left_to_right_matrix(num_states, self_loop_prob)
        else:
            p_init = create_transition_matrix(
                num_states, transition_type, self_loop_prob
            )

        if learnable_transitions:
            self.transition_logits = nnx.Param(safe_log(p_init))
        else:
            self.transition_matrix = Buffer(p_init)

        p0_init = jnp.full((num_states,), 1.0 / num_states)
        self.initial_logits = nnx.Param(safe_log(p0_init))

    # -- parameter views ------------------------------------------------------
    def get_transition_matrix(self) -> jax.Array:
        if self.learnable_transitions:
            return jax.nn.softmax(self.transition_logits[...], axis=-1)
        return self.transition_matrix[...]

    def get_initial_probabilities(self) -> jax.Array:
        return jax.nn.softmax(self.initial_logits[...])

    def _log_params(self) -> tuple[jax.Array, jax.Array]:
        if self.learnable_transitions:
            log_a = jax.nn.log_softmax(self.transition_logits[...], axis=-1)
        else:
            log_a = safe_log(self.transition_matrix[...])
        log_pi = jax.nn.log_softmax(self.initial_logits[...])
        return log_a, log_pi

    # -- inference -------------------------------------------------------------
    def _prep(self, x: jax.Array) -> tuple[jax.Array, bool]:
        if self.apply_sigmoid:
            x = jax.nn.sigmoid(x)
        batched = x.ndim == 3
        if not batched:
            x = x[None]
        if x.shape[-1] != self.num_states:
            raise ValueError(
                f"Input feature dim {x.shape[-1]} must match num_states "
                f"{self.num_states}"
            )
        return safe_log(x), batched

    def __call__(
        self, x: jax.Array, return_alignment: bool = False
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """Posteriors ``(B, T, K)``; optionally also a hard alignment
        ``(B, T)`` in eval mode (``hmm_layer.py:91-142``)."""
        log_obs, batched = self._prep(x)
        log_a, log_pi = self._log_params()

        if self._training or not self.viterbi_inference:
            log_gamma, *_ = auto_forward_backward(log_obs, log_a, log_pi)
            posteriors = jnp.exp(log_gamma)
            if not batched:
                posteriors = posteriors[0]
            return posteriors

        states, _ = auto_viterbi(log_obs, log_a, log_pi)
        posteriors = jax.nn.one_hot(states, self.num_states)
        if not batched:
            posteriors, states = posteriors[0], states[0]
        if return_alignment:
            return posteriors, states
        return posteriors

    forward = __call__

    def compute_loss(
        self,
        observations: jax.Array,
        target_alignment: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Supervised CE on posteriors / unsupervised NLL
        (``hmm_layer.py:144-173``)."""
        log_obs, _ = self._prep(observations)
        log_a, log_pi = self._log_params()
        if target_alignment is not None:
            log_gamma, *_ = auto_forward_backward(log_obs, log_a, log_pi)
            tgt = target_alignment.reshape(-1)
            lg = log_gamma.reshape(-1, self.num_states)
            return -jnp.mean(
                jnp.take_along_axis(lg, tgt[:, None], axis=-1)
            )
        ll = auto_log_likelihood(log_obs, log_a, log_pi)
        return -jnp.mean(ll)

    def align(self, observations: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Hard Viterbi alignment + score regardless of mode
        (``hmm_layer.py:175-191``)."""
        log_obs, batched = self._prep(observations)
        log_a, log_pi = self._log_params()
        states, score = auto_viterbi(log_obs, log_a, log_pi)
        if not batched:
            return states[0], score[0]
        return states, score

    def sample(
        self, seq_length: int, batch_size: int = 1,
        key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        log_a, log_pi = self._log_params()
        key = key if key is not None else jax.random.PRNGKey(0)
        return core.sample_one_hot(key, log_a, log_pi, seq_length, batch_size)


class GaussianHMMLayer(TrainMode):
    """HMM with learnable per-state Gaussian emissions over continuous
    features (MFCC / mel), reference ``hmm_layer.py:220-363``.

    ``log_scales`` parameterizes the log standard deviation:
    diag → ``(K, D)``, spherical → ``(K, 1)``, full → ``(K, D, D)``
    (strict lower triangle + exp(diagonal) forms the Cholesky factor).
    """

    def __init__(
        self,
        num_states: int,
        feature_dim: int,
        covariance_type: str = "diag",
        learnable_transitions: bool = True,
        transition_type: str = "left_to_right",
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs or nnx.Rngs(0)
        self.num_states = num_states
        self.feature_dim = feature_dim
        self.covariance_type = covariance_type
        self._training = True

        self.hmm_layer = HMMLayer(
            num_states=num_states,
            learnable_transitions=learnable_transitions,
            transition_type=transition_type,
            apply_sigmoid=False,
            rngs=rngs,
        )
        self.means = nnx.Param(
            jax.random.normal(rngs.params(), (num_states, feature_dim))
        )
        if covariance_type == "full":
            shape = (num_states, feature_dim, feature_dim)
        elif covariance_type == "diag":
            shape = (num_states, feature_dim)
        elif covariance_type == "spherical":
            shape = (num_states, 1)
        else:
            raise ValueError(f"Unknown covariance_type: {covariance_type}")
        self.log_scales = nnx.Param(jnp.zeros(shape))

    def _compute_gaussian_log_probs(self, observations: jax.Array) -> jax.Array:
        return gaussian_log_probs(
            observations, self.means[...], self.log_scales[...],
            self.covariance_type,
        )

    def __call__(self, observations: jax.Array) -> jax.Array:
        """Posteriors ``(B, T, K)`` from continuous features ``(B, T, D)``."""
        batched = observations.ndim == 3
        obs = observations if batched else observations[None]
        log_obs = self._compute_gaussian_log_probs(obs)
        log_a, log_pi = self.hmm_layer._log_params()
        if self._training or not self.hmm_layer.viterbi_inference:
            log_gamma, *_ = auto_forward_backward(log_obs, log_a, log_pi)
            posteriors = jnp.exp(log_gamma)
        else:
            states, _ = auto_viterbi(log_obs, log_a, log_pi)
            posteriors = jax.nn.one_hot(states, self.num_states)
        return posteriors if batched else posteriors[0]

    forward = __call__

    def compute_loss(self, observations: jax.Array) -> jax.Array:
        """Negative mean log-likelihood (``hmm_layer.py:342-359``), computed
        in log space without the reference's exp/log round trip.

        With ``Config.USE_CHECKPOINTING`` on, the ``(B, T, K)`` emission
        scores are rematerialized in the backward pass instead of held
        across it (``precision.maybe_remat``)."""
        obs = observations if observations.ndim == 3 else observations[None]

        def _score(o, means, log_scales):
            return gaussian_log_probs(
                o, means, log_scales, self.covariance_type
            )

        log_obs = maybe_remat(_score)(
            obs, self.means[...], self.log_scales[...]
        )
        log_a, log_pi = self.hmm_layer._log_params()
        return -jnp.mean(auto_log_likelihood(log_obs, log_a, log_pi))
