"""Pallas kernel tests (interpret mode on the CPU conftest platform;
the same code path compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_hmm_tpu import core
from pytorch_hmm_tpu.ops import (
    auto_forward,
    auto_viterbi,
    pallas_backward,
    pallas_forward,
    pallas_log_likelihood,
    pallas_viterbi,
)


@pytest.fixture(scope="module", params=[(5, 300, 11), (20, 257, 64), (3, 64, 5)])
def problem(request):
    B, T, K = request.param
    rng = np.random.default_rng(B * T)
    lo = jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32)
    la = jnp.asarray(np.log(rng.dirichlet(np.ones(K), size=K)), jnp.float32)
    lp = jnp.asarray(np.log(rng.dirichlet(np.ones(K))), jnp.float32)
    return lo, la, lp


def test_pallas_forward_matches_core(problem):
    lo, la, lp = problem
    a_p, lz_p = pallas_forward(lo, la, lp, t_chunk=64)
    a0, lz0 = core.forward_log(lo, la, lp)
    np.testing.assert_allclose(a_p, a0, atol=5e-4)
    np.testing.assert_allclose(lz_p, lz0, atol=5e-4)


def test_pallas_backward_matches_core(problem):
    lo, la, lp = problem
    b_p = pallas_backward(lo, la, t_chunk=64)
    b0 = core.backward_log(lo, la)
    np.testing.assert_allclose(b_p, b0, atol=5e-4)


def test_pallas_viterbi_matches_core(problem):
    lo, la, lp = problem
    s_p, sc_p = pallas_viterbi(lo, la, lp, t_chunk=64)
    s0, sc0 = core.viterbi(lo, la, lp)
    assert bool(jnp.all(s_p == s0)), "pallas Viterbi path differs"
    np.testing.assert_allclose(sc_p, sc0, atol=5e-4)


def test_pallas_log_likelihood_grads():
    rng = np.random.default_rng(9)
    B, T, K = 3, 100, 7
    lo = jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32)
    la = jnp.asarray(np.log(rng.dirichlet(np.ones(K), size=K)), jnp.float32)
    lp = jnp.asarray(np.log(rng.dirichlet(np.ones(K))), jnp.float32)

    val_p, grads_p = jax.value_and_grad(
        lambda *a: jnp.sum(pallas_log_likelihood(*a)), argnums=(0, 1, 2)
    )(lo, la, lp)
    val_0, grads_0 = jax.value_and_grad(
        lambda *a: jnp.sum(core.log_likelihood(*a)), argnums=(0, 1, 2)
    )(lo, la, lp)
    np.testing.assert_allclose(val_p, val_0, atol=1e-3)
    for gp, g0 in zip(grads_p, grads_0):
        np.testing.assert_allclose(gp, g0, atol=1e-3)


def test_auto_dispatch_runs(problem):
    lo, la, lp = problem
    a, lz = auto_forward(lo, la, lp)
    s, sc = auto_viterbi(lo, la, lp)
    assert a.shape == lo.shape and s.shape == lo.shape[:2]


def test_pallas_rejects_large_k():
    lo = jnp.zeros((1, 8, 200))
    la = jnp.zeros((200, 200))
    lp = jnp.zeros((200,))
    with pytest.raises(ValueError, match="K <= 128"):
        pallas_forward(lo, la, lp)
