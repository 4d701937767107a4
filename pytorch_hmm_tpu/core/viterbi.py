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

__all__ = ["viterbi", "viterbi_associative"]


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
        fwd, (delta0, jnp.int32(1)), xs, unroll=16
    )
    # psis[t] are the backpointers for step t+1 (into frame t+1), t in [0, T-2].

    last_state = jnp.argmax(delta_T, axis=-1).astype(jnp.int32)
    score = jnp.max(delta_T, axis=-1)

    def back(state, psi_t):
        prev = jnp.take_along_axis(psi_t, state[:, None], axis=1)[:, 0]
        return prev, prev

    _, prev_states = jax.lax.scan(
        back, last_state, psis, reverse=True, unroll=16
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


@jax.jit
def viterbi_associative(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
):
    """Fully parallel Viterbi: O(log T) depth, no sequential loop.

    Three associative stages (cf. Särkkä & García-Fernández,
    arXiv:2102.05743, §4, adapted to the tropical semiring):

    1. all-prefix trellis values ``delta_t`` via a (max, +) matrix
       associative scan (O(T·K³) work on big batched contractions);
    2. backpointers for every frame at once (one vectorized
       ``(B, T, K, K)`` argmax — no loop);
    3. backtrace as a *map-composition* associative scan: each frame's
       backpointer row is a function K→K; suffix compositions evaluated
       at the final argmax give the whole path.

    Best for small K and long T where the sequential scan is
    loop-overhead-bound (~2.3 µs/step on TPU). Static transitions only.
    Returns ``(states (B, T) int32, score (B,))``.
    """
    B, T, K = log_obs.shape
    if log_a.ndim != 2:
        raise ValueError("viterbi_associative requires static (K, K) log_a")

    # Stage 1: prefix max-products. Element 0 is rank-1 (rows = delta_0)
    # so row 0 of every prefix equals delta_t (same trick as the
    # sum-semiring associative forward).
    m = log_a[None, None] + log_obs[:, 1:, None, :]       # (B, T-1, K, K)
    d0 = jnp.broadcast_to(
        (log_pi + log_obs[:, 0])[:, None, None, :], (B, 1, K, K)
    )
    chain = jnp.concatenate([d0, m], axis=1)              # (B, T, K, K)

    def max_matmul(x, y):
        return jnp.max(x[..., :, :, None] + y[..., None, :, :], axis=-2)

    prefixes = jax.lax.associative_scan(max_matmul, chain, axis=1)
    delta = prefixes[:, :, 0, :]                          # (B, T, K)

    # Stage 2: all backpointers at once. psi[t, j] = argmax_i
    # (delta[t-1, i] + log_a[i, j]) for t >= 1; psi[0] = identity.
    scores = delta[:, :-1, :, None] + log_a[None, None]   # (B, T-1, K, K)
    psi = jnp.argmax(scores, axis=2).astype(jnp.int32)    # (B, T-1, K)
    ident = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, None, :], (B, 1, K)
    )
    psi = jnp.concatenate([ident, psi], axis=1)           # (B, T, K)

    # Stage 3: suffix compositions of the backpointer maps.
    # s_t = (psi_{t+1} ∘ psi_{t+2} ∘ … ∘ psi_{T-1})(s_{T-1});
    # combine(f, g) = f∘g evaluated as f[g] (gather), associative.
    def compose(acc, new):
        # Under reverse=True the accumulated value covers LATER frames
        # and ``new`` is the next-earlier map; the suffix we need is
        # new ∘ acc, i.e. apply the later composition first:
        # (new ∘ acc)[j] = new[acc[j]].
        return jnp.take_along_axis(new, acc, axis=-1)

    maps = jnp.concatenate([psi[:, 1:], ident], axis=1)   # map INTO frame t
    suffix = jax.lax.associative_scan(
        compose, maps, axis=1, reverse=True
    )                                                     # (B, T, K)

    last_state = jnp.argmax(delta[:, -1], axis=-1).astype(jnp.int32)
    score = jnp.max(delta[:, -1], axis=-1)
    states = jnp.take_along_axis(
        suffix, last_state[:, None, None].repeat(T, 1), axis=2
    )[:, :, 0]
    return states, score
