"""Viterbi decoding as JAX scans (max-product semiring).

The reference implements Viterbi at least four times in sequential Python
loops (``hmm.py:132-184``, ``mixture_gaussian.py:290-338``,
``hsmm.py:245-354``, ``streaming.py:267-377``, ``neural.py:463-511``).
Here there is exactly one trellis implementation, parameterized by:

* static ``(K, K)`` or time-varying ``(B, T, K, K)`` log transitions
  (the latter subsumes NeuralHMM);
* optional per-sequence ``lengths`` for padded batches;
* an initial log distribution ``log_pi`` (``(K,)`` or ``(B, K)``).

Forward pass is a ``lax.scan`` carrying the ``(B, K)`` score vector and
emitting ``(B, K)`` int32 backpointers; backtrace is a reverse scan of
O(1)-per-step gathers. Both jit cleanly and run on-device end to end.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["viterbi"]


@partial(jax.jit, static_argnames=("return_score",))
def viterbi(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    lengths: Optional[jax.Array] = None,
    return_score: bool = True,
):
    """Most-likely state path.

    Args:
        log_obs: ``(B, T, K)`` per-state observation log-likelihoods.
        log_a: ``(K, K)`` static or ``(B, T, K, K)`` time-varying log
            transition matrix (entry ``[:, t]`` used for the step into t).
        log_pi: ``(K,)`` or ``(B, K)`` initial log-probabilities.
        lengths: optional ``(B,)`` valid lengths; the path for padded frames
            repeats the final valid state.
        return_score: also return the path log-score.

    Returns:
        ``states (B, T) int32`` and, if requested, ``score (B,)`` — the log
        joint probability of the best path (reference
        ``HMMPyTorch.viterbi_decode``, ``hmm.py:132-184``).
    """
    B, T, K = log_obs.shape
    tv = log_a.ndim >= 3
    delta0 = log_pi + log_obs[:, 0]

    def fwd(carry, xs):
        delta, t = carry
        if tv:
            lo_t, la_t = xs
            scores = delta[:, :, None] + la_t
        else:
            lo_t = xs
            scores = delta[:, :, None] + log_a[None]
        best = jnp.max(scores, axis=-2) + lo_t
        psi = jnp.argmax(scores, axis=-2).astype(jnp.int32)
        if lengths is not None:
            keep = (t < lengths)[:, None]
            best = jnp.where(keep, best, delta)
            # Pad frames point at themselves so the backtrace is a no-op.
            psi = jnp.where(
                keep, psi, jnp.arange(K, dtype=jnp.int32)[None, :]
            )
        return (best, t + 1), psi

    xs = (log_obs[:, 1:].swapaxes(0, 1), log_a[:, 1:].swapaxes(0, 1)) if tv \
        else log_obs[:, 1:].swapaxes(0, 1)
    # unroll amortizes the TPU while-loop overhead (~2.3 us/iter)
    # across several fused steps.
    (delta_T, _), psis = jax.lax.scan(
        fwd, (delta0, jnp.int32(1)), xs, unroll=8
    )
    # psis[t] are the backpointers for step t+1 (into frame t+1), t in [0, T-2].

    last_state = jnp.argmax(delta_T, axis=-1).astype(jnp.int32)
    score = jnp.max(delta_T, axis=-1)

    def back(state, psi_t):
        prev = jnp.take_along_axis(psi_t, state[:, None], axis=1)[:, 0]
        return prev, prev

    _, prev_states = jax.lax.scan(
        back, last_state, psis, reverse=True, unroll=8
    )
    states = jnp.concatenate(
        [prev_states.swapaxes(0, 1), last_state[:, None]], axis=1
    )

    if lengths is not None:
        # Re-anchor: the valid final state lives at index lengths-1; frames
        # past it were identity steps so states[:, lengths-1:] are constant.
        idx = jnp.minimum(
            jnp.arange(T, dtype=jnp.int32)[None, :], (lengths - 1)[:, None]
        )
        states = jnp.take_along_axis(states, idx, axis=1)

    if return_score:
        return states, score
    return states
