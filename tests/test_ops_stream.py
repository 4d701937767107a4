"""Pallas streaming-chunk kernel parity vs the XLA scan steps
(interpret mode on the CPU conftest platform; the same code path
compiles on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_hmm_tpu.ops.stream import (
    pallas_greedy_chunk,
    stream_chunk_supported,
)
from pytorch_hmm_tpu.streaming import _beam_step_xla, _greedy_step_xla


def pallas_beam_chunk(la, lo, nv, carry):
    """Single-stream beam via the N=1 multi-stream kernel — the
    production dispatch path of ``streaming._beam_step``."""
    from pytorch_hmm_tpu.ops.stream_multi import pallas_beam_chunk_multi

    sc, ls, pt, pl_ = carry
    nsc, nls, npt, npl = pallas_beam_chunk_multi(
        la, lo[None], nv,
        (sc[None], ls[None], pt[None], jnp.asarray(pl_, jnp.int32)[None]),
    )
    return nsc[0], nls[0], npt[0], npl[0]


def _problem(T, S, seed):
    rng = np.random.default_rng(seed)
    la = jnp.asarray(
        np.log(rng.dirichlet(np.ones(S), size=S) + 1e-8), jnp.float32
    )
    lo = jnp.asarray(
        np.log(rng.dirichlet(np.ones(S), size=T) + 1e-8), jnp.float32
    )
    return la, lo


@pytest.mark.parametrize("T,S,nv,seed", [
    (160, 12, 160, 0),
    (192, 12, 160, 1),     # padding tail (invalid frames)
    (40, 5, 40, 2),
    (8, 3, 3, 3),          # mostly-invalid chunk
])
@pytest.mark.parametrize("has_prev", [False, True])
def test_greedy_chunk_matches_xla(T, S, nv, seed, has_prev):
    la, lo = _problem(T, S, seed)
    carry = (jnp.int32(2 % S), jnp.bool_(has_prev))
    n_valid = jnp.int32(nv)
    (p_k, h_k), st_k, cf_k = pallas_greedy_chunk(la, lo, n_valid, carry)
    (p_x, h_x), st_x, cf_x = _greedy_step_xla(la, lo, n_valid, carry)
    np.testing.assert_array_equal(np.asarray(st_k), np.asarray(st_x))
    np.testing.assert_array_equal(np.asarray(cf_k), np.asarray(cf_x))
    assert int(p_k) == int(p_x)
    assert bool(h_k) == bool(h_x)


def _beam_carry(W, H, S, path_len, seed):
    rng = np.random.default_rng(seed)
    if path_len == 0:
        scores = jnp.full((W,), -np.log(float(S)), jnp.float32)
        paths = jnp.zeros((W, H), jnp.int32)
    else:
        scores = jnp.asarray(rng.normal(size=(W,)), jnp.float32)
        scores = scores - scores.max()
        paths = jnp.asarray(
            rng.integers(0, S, size=(W, H)), jnp.int32
        )
    states = jnp.asarray(np.arange(W) % S, jnp.int32)
    return (scores, states, paths, jnp.asarray(path_len, jnp.int32))


@pytest.mark.parametrize("T,S,W,H,nv,plen,seed", [
    (160, 12, 8, 165, 160, 0, 0),     # first chunk (bench shape)
    (160, 12, 8, 165, 160, 165, 1),   # steady state
    (64, 5, 4, 70, 60, 30, 2),        # partial history
    (16, 6, 6, 40, 9, 0, 3),          # invalid tail on first chunk
])
def test_beam_chunk_matches_xla(T, S, W, H, nv, plen, seed):
    la, lo = _problem(T, S, seed)
    carry = _beam_carry(W, H, S, plen, seed + 10)
    n_valid = jnp.int32(nv)
    ck, st_k, cf_k = pallas_beam_chunk(la, lo, n_valid, carry), None, None
    # pallas_beam_chunk returns only the carry; finalize like _beam_step.
    from pytorch_hmm_tpu.streaming import _beam_finalize

    ck, st_k, cf_k = _beam_finalize(ck, carry[0], T, n_valid)
    cx, st_x, cf_x = _beam_step_xla(la, lo, n_valid, carry)
    np.testing.assert_array_equal(np.asarray(st_k), np.asarray(st_x))
    np.testing.assert_array_equal(np.asarray(cf_k), np.asarray(cf_x))
    for a, b, name in zip(ck, cx, ("scores", "states", "paths", "plen")):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_beam_chunk_tie_breaks():
    """Uniform everything: the per-frame top-k and parent argmax run on
    exact ties and must match lax.top_k / jnp.argmax ordering."""
    T, S, W, H = 32, 6, 4, 40
    la = jnp.full((S, S), -np.log(float(S)), jnp.float32)
    lo = jnp.full((T, S), -np.log(float(S)), jnp.float32)
    carry = _beam_carry(W, H, S, 0, 0)
    n_valid = jnp.int32(T)
    from pytorch_hmm_tpu.streaming import _beam_finalize

    ck = pallas_beam_chunk(la, lo, n_valid, carry)
    ck, st_k, cf_k = _beam_finalize(ck, carry[0], T, n_valid)
    cx, st_x, cf_x = _beam_step_xla(la, lo, n_valid, carry)
    np.testing.assert_array_equal(np.asarray(st_k), np.asarray(st_x))
    for a, b in zip(ck, cx):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunk_chaining_matches_xla():
    """Three consecutive chunks: carries round-trip identically."""
    S, W, H = 7, 5, 50
    la, _ = _problem(4, S, 9)
    carry_k = _beam_carry(W, H, S, 0, 9)
    carry_x = carry_k
    from pytorch_hmm_tpu.streaming import _beam_finalize

    for i in range(3):
        _, lo = _problem(40, S, 20 + i)
        nv = jnp.int32(40)
        ck = pallas_beam_chunk(la, lo, nv, carry_k)
        carry_k, st_k, _ = _beam_finalize(ck, carry_k[0], 40, nv)
        carry_x, st_x, _ = _beam_step_xla(la, lo, nv, carry_x)
        np.testing.assert_array_equal(np.asarray(st_k), np.asarray(st_x))
    for a, b in zip(carry_k, carry_x):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_supported_predicate():
    assert stream_chunk_supported(12, 192, 8, 165)
    assert not stream_chunk_supported(200, 192)       # S > 128
    assert not stream_chunk_supported(12, 2000)       # T too long
    assert not stream_chunk_supported(12, 192, 16)    # beam too wide


def test_beam_width_gt_states_unsupported():
    """W > S has no W distinct states — the kernel would emit NaN where
    lax.top_k raises; the predicate must reject it."""
    assert not stream_chunk_supported(3, 16, 5, 20)
    assert stream_chunk_supported(5, 16, 5, 20)
