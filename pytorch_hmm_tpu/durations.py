"""Duration distributions for explicit-duration (semi-Markov) models.

Pure log-pmf functions over an integer duration grid
``d ∈ [min_duration, max_duration]``, matching the reference's
parameterizations (continuous pdfs evaluated at integer durations,
truncated below ``min_duration``; ``hsmm.py:115-179``,
``semi_markov.py:122-153``). All return ``(..., D)`` with
``D = max_duration`` and column ``j`` = duration ``j+1``; entries below
``min_duration`` are ``-inf``.

By default the truncated scores are left **unnormalized**, reproducing
reference behavior; pass ``normalize=True`` for a proper pmf over the
truncated support (recommended for EM / likelihood training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .core.semiring import logsumexp

__all__ = [
    "duration_grid",
    "gamma_duration_log_pmf",
    "poisson_duration_log_pmf",
    "weibull_duration_log_pmf",
    "gaussian_duration_log_pmf",
    "finalize_duration_log_pmf",
]

_EPS = 1e-8


def duration_grid(max_duration: int, dtype=jnp.float32) -> jax.Array:
    """Durations ``[1, 2, ..., max_duration]`` as a float vector."""
    return jnp.arange(1, max_duration + 1, dtype=dtype)


def finalize_duration_log_pmf(
    log_p: jax.Array,
    min_duration: int = 1,
    normalize: bool = False,
) -> jax.Array:
    """Apply the min-duration truncation (and optional normalization)."""
    D = log_p.shape[-1]
    d = jnp.arange(1, D + 1)
    log_p = jnp.where(d >= min_duration, log_p, -jnp.inf)
    if normalize:
        log_p = log_p - logsumexp(log_p, axis=-1, keepdims=True)
    return log_p


def gamma_duration_log_pmf(
    shape: jax.Array,
    rate: jax.Array,
    max_duration: int,
    min_duration: int = 1,
    normalize: bool = False,
) -> jax.Array:
    """Gamma(shape, rate) log-density at integer durations
    (reference ``hsmm.py:124-148``). ``shape``/``rate``: ``(S,)``."""
    d = duration_grid(max_duration)[None, :]
    sh, ra = shape[:, None], rate[:, None]
    log_p = (
        (sh - 1.0) * jnp.log(d + _EPS)
        - ra * d
        - gammaln(sh)
        + sh * jnp.log(ra + _EPS)
    )
    return finalize_duration_log_pmf(log_p, min_duration, normalize)


def poisson_duration_log_pmf(
    lam: jax.Array,
    max_duration: int,
    min_duration: int = 1,
    normalize: bool = False,
) -> jax.Array:
    """Poisson(λ) log-pmf at integer durations (``hsmm.py:150-164``)."""
    d = duration_grid(max_duration)[None, :]
    la = lam[:, None]
    log_p = d * jnp.log(la + _EPS) - la - gammaln(d + 1.0)
    return finalize_duration_log_pmf(log_p, min_duration, normalize)


def weibull_duration_log_pmf(
    scale: jax.Array,
    concentration: jax.Array,
    max_duration: int,
    min_duration: int = 1,
    normalize: bool = False,
) -> jax.Array:
    """Weibull(scale, concentration) log-density at integer durations
    (``hsmm.py:166-179``)."""
    d = duration_grid(max_duration)[None, :]
    sc, co = scale[:, None], concentration[:, None]
    log_p = (
        jnp.log(co + _EPS)
        - co * jnp.log(sc + _EPS)
        + (co - 1.0) * jnp.log(d + _EPS)
        - (d / sc) ** co
    )
    return finalize_duration_log_pmf(log_p, min_duration, normalize)


def gaussian_duration_log_pmf(
    mean: jax.Array,
    std: jax.Array,
    max_duration: int,
    min_duration: int = 1,
    normalize: bool = False,
) -> jax.Array:
    """Discretized Gaussian over durations (``semi_markov.py:143-148``)."""
    d = duration_grid(max_duration)[None, :]
    mu, sd = mean[:, None], std[:, None]
    log_p = (
        -0.5 * ((d - mu) / (sd + _EPS)) ** 2
        - jnp.log(sd + _EPS)
        - 0.5 * jnp.log(2.0 * jnp.pi)
    )
    return finalize_duration_log_pmf(log_p, min_duration, normalize)
