"""Ancestral sampling from HMM state chains (reference ``hmm.py:213-245``).

Implemented as a ``lax.scan`` over time with ``jax.random.categorical`` at
each step — fully jittable, static shapes, explicit PRNG keys (no hidden
global RNG state, unlike the torch ``Categorical`` draws in the reference).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["sample_states", "sample_one_hot"]


@partial(jax.jit, static_argnames=("seq_length", "batch_size"))
def sample_states(
    key: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    seq_length: int,
    batch_size: int = 1,
) -> jax.Array:
    """Draw ``(B, T)`` int32 state paths from the Markov chain."""
    K = log_a.shape[-1]
    k0, ks = jax.random.split(key)
    s0 = jax.random.categorical(k0, jnp.broadcast_to(log_pi, (batch_size, K)))

    def step(state, k):
        logits = log_a[state]  # (B, K)
        nxt = jax.random.categorical(k, logits)
        return nxt, nxt

    keys = jax.random.split(ks, seq_length - 1)
    _, rest = jax.lax.scan(step, s0, keys)
    return jnp.concatenate(
        [s0[:, None], rest.swapaxes(0, 1)], axis=1
    ).astype(jnp.int32)


@partial(jax.jit, static_argnames=("seq_length", "batch_size"))
def sample_one_hot(
    key: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    seq_length: int,
    batch_size: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Sample state paths and one-hot observations.

    Matches reference ``HMMPyTorch.sample`` (``hmm.py:225-245``), which
    emits the state identity as a one-hot vector. Returns
    ``(observations (B, T, K) float32, states (B, T) int32)``.
    """
    states = sample_states(key, log_a, log_pi, seq_length, batch_size)
    K = log_a.shape[-1]
    obs = jax.nn.one_hot(states, K, dtype=jnp.float32)
    return obs, states
