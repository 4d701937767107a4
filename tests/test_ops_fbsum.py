"""Bidirectional fused forward-backward kernel (ops/fbsum.py) vs core.

Interpret-mode equality on CPU (SURVEY.md §4 kernel strategy); the
hardware lane re-validates on the chip (alpha/beta/log_z within lse
tolerance, 9.2e-5 measured at the benchmark shape).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_hmm_tpu.core.fb import forward_backward
from pytorch_hmm_tpu.ops import auto_forward_backward
from pytorch_hmm_tpu.ops.fbsum import fbsum_smallk, fbsum_supported


@pytest.mark.parametrize(
    "B,T,S",
    [(3, 257, 5), (16, 250, 12), (2, 128, 4), (1, 50, 3), (4, 129, 16),
     (2, 300, 16)],
)
def test_fbsum_matches_core(rng, B, T, S):
    lo = jnp.asarray(rng.normal(size=(B, T, S)), jnp.float32)
    la = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(S, S)), jnp.float32), axis=-1
    )
    lpi = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(S,)), jnp.float32))
    a1, b1, z1 = fbsum_smallk(lo, la, lpi)
    _, a0, b0, z0 = forward_backward(lo, la, lpi)
    np.testing.assert_allclose(a1, a0, atol=2e-4)
    np.testing.assert_allclose(b1, b0, atol=2e-4)
    np.testing.assert_allclose(z1, z0, atol=2e-4)


@pytest.mark.parametrize(
    "B,T,S,lens",
    [
        (3, 257, 5, (257, 100, 31)),
        (4, 130, 12, (130, 128, 64, 1)),
        (2, 300, 16, (299, 177)),
    ],
)
def test_fbsum_ragged_matches_core(rng, B, T, S, lens):
    """Ragged fused FB (per-lane freezes, VERDICT r4 item 7): valid
    frames and per-lane log_z must match the core masked scan; padded
    frames are garbage by convention and excluded."""
    lo = jnp.asarray(rng.normal(size=(B, T, S)), jnp.float32)
    la = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(S, S)), jnp.float32), axis=-1
    )
    lpi = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(S,)), jnp.float32))
    lengths = jnp.asarray(lens, jnp.int32)
    a1, b1, z1 = fbsum_smallk(lo, la, lpi, lengths)
    _, a0, b0, z0 = forward_backward(lo, la, lpi, lengths)
    np.testing.assert_allclose(z1, z0, atol=2e-4)
    for b in range(B):
        L = int(lengths[b])
        np.testing.assert_allclose(a1[b, :L], a0[b, :L], atol=2e-4)
        np.testing.assert_allclose(b1[b, :L], b0[b, :L], atol=2e-4)


def test_fbsum_ragged_equals_unragged_at_full_length(rng):
    """lengths == T must reproduce the unragged kernel bit-for-bit in
    interpret mode (same recursion, freeze never fires early)."""
    B, T, S = 2, 129, 8
    lo = jnp.asarray(rng.normal(size=(B, T, S)), jnp.float32)
    la = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(S, S)), jnp.float32), axis=-1
    )
    lpi = jnp.full((S,), -jnp.log(float(S)))
    a0, b0, z0 = fbsum_smallk(lo, la, lpi)
    a1, b1, z1 = fbsum_smallk(lo, la, lpi, jnp.full((B,), T, jnp.int32))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
    np.testing.assert_allclose(z0, z1, atol=1e-6)


def test_ragged_ll_grad_matches_core(rng):
    """auto_log_likelihood with lengths (the masked custom VJP, now on
    the fused ragged kernel where supported) must match core grads."""
    from pytorch_hmm_tpu.ops import auto_log_likelihood
    from pytorch_hmm_tpu.core import log_likelihood as core_ll

    B, T, K = 3, 90, 6
    lo = jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32)
    la = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(K, K)), jnp.float32), axis=-1
    )
    lpi = jnp.full((K,), -jnp.log(float(K)))
    lengths = jnp.asarray([90, 60, 17], jnp.int32)
    g1 = jax.grad(
        lambda x: jnp.sum(auto_log_likelihood(x, la, lpi, lengths))
    )(lo)
    g0 = jax.grad(
        lambda x: jnp.sum(core_ll(x, la, lpi, lengths))
    )(lo)
    np.testing.assert_allclose(g1, g0, atol=1e-4)


def test_fbsum_supported_bounds():
    assert fbsum_supported(12, 16)
    assert fbsum_supported(16, 128)
    # Ss=32 double buffers exceed the VMEM budget at the minimum lane
    # tile, so the fused kernel is a S <= 16 specialist.
    assert not fbsum_supported(17, 16)
    assert not fbsum_supported(32, 64)


def test_fbsum_under_outer_jit(rng):
    """The auto path (which may dispatch to fbsum on TPU) must stay
    jit-composable with concrete closed-over transitions."""
    lo = jnp.asarray(rng.normal(size=(2, 64, 4)), jnp.float32)
    la = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(4, 4)), jnp.float32), axis=-1
    )
    lpi = jnp.full((4,), -jnp.log(4.0))

    @jax.jit
    def f(x):
        lg, a, b, z = auto_forward_backward(x, la, lpi)
        return jnp.sum(lg) + jnp.sum(z)

    assert np.isfinite(float(f(lo)))


@pytest.mark.parametrize("B,T,K", [(2, 256, 16), (3, 384, 64), (2, 130, 32)])
def test_fb_prob_matches_core(rng, B, T, K):
    """Fused long-context prob-space forward+backward vs core (within
    the prob kernels' rescale-reassociation envelope)."""
    from pytorch_hmm_tpu.ops.scan import pallas_fb_prob

    lo = jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32)
    la = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(K, K)), jnp.float32), axis=-1
    )
    lpi = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(K,)), jnp.float32))
    a1, b1, z1 = pallas_fb_prob(lo, la, lpi)
    _, a0, b0, z0 = forward_backward(lo, la, lpi)
    np.testing.assert_allclose(a1, a0, atol=2e-2)
    np.testing.assert_allclose(b1, b0, atol=2e-2)
    np.testing.assert_allclose(z1, z0, atol=2e-2)


def test_ll_grad_long_context_matches_short_formula(rng):
    """The fused-VJP long-context gradient must equal the core-path
    gradient (posteriors)."""
    from pytorch_hmm_tpu.ops import auto_log_likelihood
    from pytorch_hmm_tpu.core import log_likelihood as core_ll

    B, T, K = 2, 64, 6
    lo = jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32)
    la = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(K, K)), jnp.float32), axis=-1
    )
    lpi = jnp.full((K,), -jnp.log(float(K)))
    g1 = jax.grad(lambda x: jnp.sum(auto_log_likelihood(x, la, lpi)))(lo)
    g0 = jax.grad(lambda x: jnp.sum(core_ll(x, la, lpi)))(lo)
    np.testing.assert_allclose(g1, g0, atol=1e-4)
