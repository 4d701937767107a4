"""Pallas CTC banded-lattice kernel parity vs the XLA scans
(interpret mode on the CPU conftest platform; the same code path
compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_hmm_tpu.alignment.ctc import (
    _NEG,
    _lattice_masks,
    ctc_backward_algorithm,
    ctc_forward_algorithm,
    expand_targets_with_blank,
)
from pytorch_hmm_tpu.ops.ctc_kernel import (
    ctc_lattice_backward,
    ctc_lattice_forward,
    ctc_lattice_supported,
)


def _problem(B, T, C, U, seed, ragged=False):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(T, B, C)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    targets = jnp.asarray(rng.integers(1, C, size=(B, U)), jnp.int32)
    if ragged:
        in_lens = jnp.asarray(
            rng.integers(max(2 * U + 1, T // 3), T + 1, size=B), jnp.int32
        )
        tgt_lens = jnp.asarray(rng.integers(1, U + 1, size=B), jnp.int32)
    else:
        in_lens = jnp.full((B,), T, jnp.int32)
        tgt_lens = jnp.full((B,), U, jnp.int32)
    return log_probs, targets, in_lens, tgt_lens


def _tables(log_probs, targets, in_lens, tgt_lens):
    """Build the kernel inputs exactly as ctc.py does."""
    T, B, C = log_probs.shape
    expanded = expand_targets_with_blank(targets, 0)
    S = expanded.shape[1]
    skip_ok = _lattice_masks(expanded, 0)
    s_idx = jnp.arange(S)[None, :]
    valid_pos = s_idx < (2 * tgt_lens[:, None] + 1)
    lp = jnp.take_along_axis(
        log_probs.transpose(1, 0, 2), expanded[:, None, :].repeat(T, 1),
        axis=2,
    )
    a0 = jnp.full((B, S), _NEG)
    a0 = a0.at[:, 0].set(lp[:, 0, 0])
    a0 = a0.at[:, 1].set(jnp.where(tgt_lens > 0, lp[:, 0, 1], _NEG))
    a0 = jnp.where(valid_pos, a0, _NEG)
    exit1 = s_idx == (2 * tgt_lens)[:, None]
    exit2 = s_idx == jnp.maximum(2 * tgt_lens - 1, 0)[:, None]
    bT = jnp.where(exit1 | exit2, 0.0, _NEG)
    skip_fwd = jnp.concatenate(
        [skip_ok[:, 2:], jnp.zeros_like(skip_ok[:, :2])], axis=1
    )
    return lp, skip_ok, skip_fwd, valid_pos, a0, bT


@pytest.mark.parametrize("B,T,C,U,seed,ragged", [
    (4, 200, 20, 30, 0, False),
    (3, 300, 12, 10, 1, True),
    (2, 64, 8, 5, 2, True),       # short T, tiny lattice
    (1, 128, 30, 63, 3, False),   # max supported lattice (127 lanes)
])
def test_ctc_kernels_match_xla(B, T, C, U, seed, ragged):
    log_probs, targets, in_lens, tgt_lens = _problem(B, T, C, U, seed,
                                                     ragged)
    lp, skip_ok, skip_fwd, valid_pos, a0, bT = _tables(
        log_probs, targets, in_lens, tgt_lens
    )
    # XLA references (the dispatch picks XLA on the CPU platform).
    al_x, ll_x = ctc_forward_algorithm(
        log_probs, targets, in_lens, tgt_lens
    )
    be_x = ctc_backward_algorithm(log_probs, targets, in_lens, tgt_lens)
    # Kernels in interpret mode.
    al_k = ctc_lattice_forward(
        lp, jnp.where(skip_ok, 0.0, _NEG),
        jnp.where(valid_pos, 0.0, _NEG), a0, in_lens,
    )
    be_k = ctc_lattice_backward(
        lp, jnp.where(skip_fwd, 0.0, _NEG),
        jnp.where(valid_pos, 0.0, _NEG), bT, in_lens,
    )
    # Compare only at meaningful cells (valid lattice positions within
    # each row's length); masked cells hold ~-1e30 sentinels whose exact
    # accumulation differs between implementations.
    T_ = log_probs.shape[0]
    m = (
        np.asarray(valid_pos)[:, None, :]
        & (np.arange(T_)[None, :, None] < np.asarray(in_lens)[:, None, None])
    )
    for k, x in ((al_k, al_x), (be_k, be_x)):
        k, x = np.asarray(k), np.asarray(x)
        sel = m & (x > -1e29)
        np.testing.assert_allclose(k[sel], x[sel], atol=5e-4)


def test_ctc_loss_grad_matches_autodiff_scan():
    """The closed-form VJP must match differentiating through the XLA
    scan (computed via a local scan-only loss)."""
    from pytorch_hmm_tpu.alignment.ctc import ctc_loss

    log_probs, targets, in_lens, tgt_lens = _problem(3, 120, 10, 8, 7,
                                                     ragged=True)

    def loss_cf(lp):
        return ctc_loss(lp, targets, in_lens, tgt_lens, reduction="sum")

    g_cf = jax.grad(loss_cf)(log_probs)
    # autodiff through the scan path (forward algorithm directly)
    def loss_ad(lp):
        from pytorch_hmm_tpu.alignment.ctc import ctc_forward_algorithm
        _, ll = ctc_forward_algorithm(lp, targets, in_lens, tgt_lens)
        return -jnp.sum(ll)

    g_ad = jax.grad(loss_ad)(log_probs)
    np.testing.assert_allclose(
        np.asarray(g_cf), np.asarray(g_ad), atol=1e-4
    )


def test_supported_predicate():
    assert ctc_lattice_supported(101, 16)
    assert ctc_lattice_supported(201, 16)     # multi-tile lattice
    assert ctc_lattice_supported(512, 128)    # batch grid tiles VMEM
    assert ctc_lattice_supported(512, 256)    # any batch <= _MAX_B
    assert ctc_lattice_supported(600, 16)     # wide 2-D lattice layout
    assert ctc_lattice_supported(2048, 32)    # wide cap
    assert not ctc_lattice_supported(2049, 16)  # beyond the wide cap
    assert not ctc_lattice_supported(101, 512)  # batch > _MAX_B


@pytest.mark.parametrize("B,T,C,U,seed,ragged", [
    (4, 96, 12, 10, 0, False),
    (3, 120, 10, 8, 1, True),
    (2, 64, 30, 20, 2, True),
])
def test_ctc_viterbi_kernel_matches_xla(B, T, C, U, seed, ragged,
                                        monkeypatch):
    """The single-program forced-alignment kernel (interpret mode here;
    hardware-validated) must reproduce the XLA scan path exactly —
    paths bit-identical, scores close."""
    import pytorch_hmm_tpu.alignment.ctc as ctc_mod
    from pytorch_hmm_tpu.alignment.ctc import ctc_viterbi_alignment

    log_probs, targets, in_lens, tgt_lens = _problem(B, T, C, U, seed,
                                                     ragged)
    ali_xla, score_xla = ctc_viterbi_alignment(
        log_probs, targets, in_lens, tgt_lens
    )
    # Force the kernel path (interpret mode runs it on CPU). The
    # dispatch is a static jit arg evaluated at CALL time, so flipping
    # it must take effect WITHOUT jax.clear_caches (the live
    # PYTORCH_HMM_TPU_NO_PALLAS contract).
    monkeypatch.setattr(ctc_mod, "_use_ctc_kernels", lambda s, b: True)
    ali_k, score_k = ctc_viterbi_alignment(
        log_probs, targets, in_lens, tgt_lens
    )
    np.testing.assert_array_equal(np.asarray(ali_k), np.asarray(ali_xla))
    np.testing.assert_allclose(np.asarray(score_k),
                               np.asarray(score_xla), atol=1e-4)


@pytest.mark.slow
def test_ctc_large_lattice_and_vocab(monkeypatch):
    """Real-ASR regime (VERDICT r2 item 4): U=200 labels (lattice
    S=401), C=1000 vocab. Loss kernels and the forced-alignment kernel
    must match the XLA scans at this scale (batch grid tiles the
    lattice into VMEM)."""
    import pytorch_hmm_tpu.alignment.ctc as ctc_mod
    from pytorch_hmm_tpu.alignment.ctc import (
        ctc_forward_algorithm, ctc_viterbi_alignment,
    )
    from pytorch_hmm_tpu.ops.ctc_kernel import ctc_lattice_supported

    B, T, C, U = 12, 448, 1000, 200
    log_probs, targets, in_lens, tgt_lens = _problem(B, T, C, U, 11)
    assert ctc_lattice_supported(2 * U + 1, B)

    a_xla, ll_xla = ctc_forward_algorithm(
        log_probs, targets, in_lens, tgt_lens
    )
    ali_xla, sc_xla = ctc_viterbi_alignment(
        log_probs, targets, in_lens, tgt_lens
    )
    monkeypatch.setattr(ctc_mod, "_use_ctc_kernels", lambda s, b: True)
    jax.clear_caches()
    a_k, ll_k = ctc_forward_algorithm(
        log_probs, targets, in_lens, tgt_lens
    )
    ali_k, sc_k = ctc_viterbi_alignment(
        log_probs, targets, in_lens, tgt_lens
    )
    jax.clear_caches()
    np.testing.assert_allclose(np.asarray(ll_k), np.asarray(ll_xla),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_xla),
                               atol=2e-3)
    np.testing.assert_array_equal(np.asarray(ali_k), np.asarray(ali_xla))
    np.testing.assert_allclose(np.asarray(sc_k), np.asarray(sc_xla),
                               atol=1e-3)


def test_ctc_beam_decode_large_vocab():
    """C=1024 vocabulary beam decode must match the host prefix-beam
    oracle (the reference's nn.CTCLoss has no vocab cap; neither do
    we)."""
    from pytorch_hmm_tpu.alignment import beam_search_decode_batch
    from pytorch_hmm_tpu.alignment.ctc import _prefix_beam_search

    T, B, C = 20, 2, 1024
    rng = np.random.default_rng(3)
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(T, B, C)) * 2.0, jnp.float32), -1
    )
    in_lens = jnp.asarray([T, T - 5], jnp.int32)
    tokens, out_lens = beam_search_decode_batch(
        lp, in_lens, beam_width=4, blank_id=0
    )
    lp_np = np.asarray(lp)
    for b in range(B):
        host = _prefix_beam_search(lp_np[: int(in_lens[b]), b], 4,
                                   blank_id=0)
        got = list(np.asarray(tokens[b, : out_lens[b]]))
        assert got == list(host), (b, got, host)


@pytest.mark.slow
def test_ctc_wide_lattice_2048(monkeypatch):
    """S > 512 rides the 2-D lattice layout (wide kernels): U=900
    labels -> lattice 1801 (padded 1920), checked against the XLA
    scans in interpret mode."""
    import pytorch_hmm_tpu.alignment.ctc as ctc_mod
    from pytorch_hmm_tpu.alignment.ctc import ctc_forward_algorithm
    from pytorch_hmm_tpu.alignment.ctc import ctc_backward_algorithm
    from pytorch_hmm_tpu.ops.ctc_kernel import (
        _use_wide, ctc_lattice_supported,
    )

    B, T, C, U = 2, 1000, 50, 450
    log_probs, targets, in_lens, tgt_lens = _problem(B, T, C, U, 13,
                                                     ragged=True)
    S = 2 * U + 1
    assert ctc_lattice_supported(S, B) and _use_wide(S, B)
    assert ctc_lattice_supported(2048, 4)

    a_xla, ll_xla = ctc_forward_algorithm(
        log_probs, targets, in_lens, tgt_lens
    )
    b_xla = ctc_backward_algorithm(
        log_probs, targets, in_lens, tgt_lens
    )
    monkeypatch.setattr(ctc_mod, "_use_ctc_kernels", lambda s, b: True)
    jax.clear_caches()
    a_k, ll_k = ctc_forward_algorithm(
        log_probs, targets, in_lens, tgt_lens
    )
    b_k = ctc_backward_algorithm(
        log_probs, targets, in_lens, tgt_lens
    )
    jax.clear_caches()
    np.testing.assert_allclose(np.asarray(ll_k), np.asarray(ll_xla),
                               rtol=1e-4, atol=1e-3)
    # Compare meaningful cells only (valid positions within lengths;
    # sentinel accumulation differs between implementations).
    m = (
        (np.arange(2 * U + 1)[None, None, :]
         < (2 * np.asarray(tgt_lens) + 1)[:, None, None])
        & (np.arange(T)[None, :, None]
           < np.asarray(in_lens)[:, None, None])
    )
    for k, x in ((a_k, a_xla), (b_k, b_xla)):
        k, x = np.asarray(k), np.asarray(x)
        sel = m & (x > -1e29)
        np.testing.assert_allclose(k[sel], x[sel], atol=2e-3)


@pytest.mark.parametrize(
    "B,T,C,U,seed",
    [(2, 256, 20, 70, 0), (3, 300, 30, 100, 1), (4, 384, 40, 500, 2),
     (1, 128, 10, 64, 3)],
)
def test_ctc_viterbi_wide_matches_xla(B, T, C, U, seed):
    """The streaming wide Viterbi pair (S > 512 regime; batch packed on
    sublanes, choices streamed to HBM, choice-chase backtrace) must be
    path-exact vs the XLA scan, ragged lengths included. The r5 bug
    this caught: gating the backtrace shift by a per-ROW choice sum
    zeroes any back-step that crosses a sublane boundary."""
    from pytorch_hmm_tpu.alignment.ctc import _ctc_viterbi_impl
    from pytorch_hmm_tpu.ops.ctc_kernel import ctc_viterbi_wide_supported

    assert ctc_viterbi_wide_supported(T, B, 2 * U + 1)
    rng = np.random.default_rng(seed)
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(T, B, C)), jnp.float32), -1
    )
    tls = jnp.asarray(rng.integers(max(1, U // 2), U + 1, B), jnp.int32)
    tg = jnp.asarray(rng.integers(1, C, (B, U)), jnp.int32)
    ils = jnp.asarray(
        [T] + list(rng.integers(T // 2, T + 1, max(B - 1, 0))), jnp.int32
    )[:B]
    a_ref, s_ref = _ctc_viterbi_impl(
        lp, tg, ils, tls, blank_id=0, use_kernel=False, use_wide=False
    )
    a_w, s_w = _ctc_viterbi_impl(
        lp, tg, ils, tls, blank_id=0, use_kernel=False, use_wide=True
    )
    np.testing.assert_array_equal(np.asarray(a_w), np.asarray(a_ref))
    np.testing.assert_allclose(
        np.asarray(s_w), np.asarray(s_ref), atol=1e-4
    )


def test_ctc_wide_packed_loss_mid_lattice(monkeypatch):
    """The batch-packed wide LOSS kernels (r5: all rows on one
    per-frame chain) at a mid lattice size with ragged lengths —
    ll/alpha/beta parity vs the XLA scans."""
    import pytorch_hmm_tpu.alignment.ctc as ctc_mod
    from pytorch_hmm_tpu.ops.ctc_kernel import (
        _use_wide, ctc_wide_packed_supported,
    )

    B, T, C, U = 3, 300, 30, 350   # S = 701 > 512 -> wide path
    S = 2 * U + 1
    assert _use_wide(S, B) and ctc_wide_packed_supported(B, S)
    rng = np.random.default_rng(9)
    log_probs = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(T, B, C)), jnp.float32), -1
    )
    tgt_lens = jnp.asarray([350, 222, 141], jnp.int32)
    targets = jnp.asarray(rng.integers(1, C, (B, U)), jnp.int32)
    in_lens = jnp.asarray([300, 288, 177], jnp.int32)

    monkeypatch.setattr(ctc_mod, "_use_ctc_kernels", lambda s, b: False)
    jax.clear_caches()
    a_x, ll_x = ctc_forward_algorithm(
        log_probs, targets, in_lens, tgt_lens
    )
    monkeypatch.setattr(ctc_mod, "_use_ctc_kernels", lambda s, b: True)
    jax.clear_caches()
    a_k, ll_k = ctc_forward_algorithm(
        log_probs, targets, in_lens, tgt_lens
    )
    jax.clear_caches()
    np.testing.assert_allclose(
        np.asarray(ll_k), np.asarray(ll_x), rtol=1e-4, atol=1e-3
    )
    m = (
        (np.arange(S)[None, None, :]
         < (2 * np.asarray(tgt_lens) + 1)[:, None, None])
        & (np.arange(T)[None, :, None]
           < np.asarray(in_lens)[:, None, None])
    )
    k, x = np.asarray(a_k), np.asarray(a_x)
    sel = m & (x > -1e29)
    np.testing.assert_allclose(k[sel], x[sel], atol=2e-3)
