"""Pallas TPU kernels for the hot HMM ops.

``scan`` holds the streamed time-scan kernels (forward/backward/Viterbi).
``pallas_log_likelihood`` adds a custom-VJP wrapper so the Pallas forward
kernel is a drop-in, differentiable replacement for
``core.log_likelihood`` in training losses.

Dispatch guidance: the Pallas kernels require K ≤ 128 and pay off most
on TPU for long sequences (the XLA scan costs ~2.3 µs per step in loop
overhead; the Pallas kernels stream frames through VMEM at
O(100 ns)/step). ``auto_forward``/``auto_viterbi`` pick the right path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .. import core
from .scan import (
    LANES,
    pallas_backward,
    pallas_forward,
    pallas_viterbi,
)

__all__ = [
    "pallas_forward",
    "pallas_backward",
    "pallas_viterbi",
    "pallas_log_likelihood",
    "auto_forward",
    "auto_viterbi",
    "auto_log_likelihood",
    "pallas_available",
]


def pallas_available(num_states: int) -> bool:
    """True when the Pallas path applies: on-TPU and K fits one lane tile."""
    return jax.default_backend() == "tpu" and num_states <= LANES


@jax.custom_vjp
def pallas_log_likelihood(log_obs, log_a, log_pi):
    """Sequence log-likelihood ``(B,)`` on the Pallas forward kernel,
    differentiable via the classic forward-backward identities:

    ``∂ log Z / ∂ log_obs = γ`` (state posteriors),
    ``∂ log Z / ∂ log_a = Σ_t ξ_t`` (pairwise posteriors),
    ``∂ log Z / ∂ log_pi = γ_0``.
    """
    _, lz = pallas_forward(log_obs, log_a, log_pi)
    return lz


def _ll_fwd(log_obs, log_a, log_pi):
    log_alpha, lz = pallas_forward(log_obs, log_a, log_pi)
    return lz, (log_obs, log_a, log_pi, log_alpha, lz)


def _ll_bwd(res, g):
    log_obs, log_a, log_pi, log_alpha, lz = res
    log_beta = pallas_backward(log_obs, log_a)
    log_gamma = log_alpha + log_beta - lz[:, None, None]
    gamma = jnp.exp(log_gamma)
    gw = g[:, None, None] * gamma
    d_log_obs = gw
    d_log_pi = jnp.sum(g[:, None] * jnp.exp(log_gamma[:, 0]), axis=0)
    lxi = core.fb.xi_expectations(
        log_alpha, log_beta, log_obs, log_a, lz
    )  # (B, K, K) log-space summed xi
    d_log_a = jnp.sum(g[:, None, None] * jnp.exp(lxi), axis=0)
    return d_log_obs, d_log_a, d_log_pi


pallas_log_likelihood.defvjp(_ll_fwd, _ll_bwd)


def auto_forward(log_obs, log_a, log_pi):
    """``(log_alpha, log_z)`` via Pallas on TPU (static K), XLA scan
    elsewhere."""
    if pallas_available(log_obs.shape[-1]) and log_a.ndim == 2:
        return pallas_forward(log_obs, log_a, log_pi)
    return core.forward_log(log_obs, log_a, log_pi)


# The two-kernel Viterbi is hardware-validated (exact paths on v5e) but
# measured SLOWER than the unrolled XLA scan (the trellis is latency-
# chain-bound either way, and the XLA path avoids the backtrace's second
# sweep) — so decode defaults to the XLA scan; set
# PYTORCH_HMM_TPU_PALLAS_VITERBI=1 to force the Pallas path.
_VITERBI_OPT_IN = os.environ.get("PYTORCH_HMM_TPU_PALLAS_VITERBI") == "1"


def auto_viterbi(log_obs, log_a, log_pi):
    """``(states, score)`` — unrolled XLA scan (fastest measured), Pallas
    on opt-in."""
    if (
        _VITERBI_OPT_IN
        and pallas_available(log_obs.shape[-1])
        and log_a.ndim == 2
    ):
        return pallas_viterbi(log_obs, log_a, log_pi)
    return core.viterbi(log_obs, log_a, log_pi)


def auto_log_likelihood(log_obs, log_a, log_pi):
    """Differentiable ``log Z (B,)`` via the Pallas forward kernel on TPU
    (hardware-validated; ~1.5-3x the XLA scan at long T). Tile sizes are
    auto-picked inside the kernels (one grid program when the batch fills
    32 sublane rows; t_chunk=128 — t_chunk=64 wedged the chip's DMA
    engine in hardware testing and is avoided everywhere)."""
    if pallas_available(log_obs.shape[-1]) and log_a.ndim == 2:
        return pallas_log_likelihood(log_obs, log_a, log_pi)
    return core.log_likelihood(log_obs, log_a, log_pi)
