"""DTW + CTC alignment tests.

Cross-implementation oracles: a per-cell numpy DTW DP, and torch's
``nn.CTCLoss`` (the one kernel the reference delegates to, ``ctc.py:283``)
for CTC values and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_hmm_tpu.alignment import (
    CTCAligner,
    CTCSegmentationAligner,
    ConstrainedDTWAligner,
    DTWAligner,
    collapse_repeated_tokens,
    compute_distance_matrix,
    ctc_alignment_path,
    ctc_backward_algorithm,
    ctc_decode_sequence,
    ctc_forward_algorithm,
    ctc_viterbi_alignment,
    dtw_alignment,
    dtw_distance,
    expand_targets_with_blank,
    extract_phoneme_durations,
    phoneme_audio_alignment,
    remove_ctc_blanks,
    soft_dtw,
    soft_dtw_alignment,
)
from pytorch_hmm_tpu.alignment.dtw import _dtw_wavefront


# ---------------------------------------------------------------------------
# DTW
# ---------------------------------------------------------------------------

def _np_dtw(dist, diag_weight=1.0):
    N, M = dist.shape
    D = np.full((N, M), np.inf)
    D[0, 0] = dist[0, 0] * (1.0 if diag_weight == 1.0 else 1.0)
    for i in range(N):
        for j in range(M):
            if i == 0 and j == 0:
                continue
            cands = []
            if i > 0 and j > 0:
                cands.append(D[i - 1, j - 1] + diag_weight * dist[i, j])
            if i > 0:
                cands.append(D[i - 1, j] + dist[i, j])
            if j > 0:
                cands.append(D[i, j - 1] + dist[i, j])
            D[i, j] = min(cands)
    return D


@pytest.fixture(scope="module")
def xy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(12, 4)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(9, 4)), jnp.float32)
    return x, y


@pytest.mark.parametrize("fn", ["euclidean", "cosine", "manhattan"])
def test_dtw_cost_matches_numpy(xy, fn):
    x, y = xy
    dist = compute_distance_matrix(x, y, fn)
    cost, _ = _dtw_wavefront(dist)
    np.testing.assert_allclose(cost, _np_dtw(np.asarray(dist)), atol=1e-4)


def test_dtw_rabiner_juang(xy):
    x, y = xy
    dist = compute_distance_matrix(x, y)
    cost, _ = _dtw_wavefront(dist, "rabiner_juang")
    np.testing.assert_allclose(
        cost, _np_dtw(np.asarray(dist), diag_weight=2.0), atol=1e-4
    )


def test_dtw_path_valid(xy):
    x, y = xy
    pi, pj, total = dtw_alignment(x, y)
    pi, pj = np.asarray(pi), np.asarray(pj)
    assert (pi[0], pj[0]) == (0, 0)
    assert (pi[-1], pj[-1]) == (x.shape[0] - 1, y.shape[0] - 1)
    steps = np.stack([np.diff(pi), np.diff(pj)], axis=1)
    assert ((steps >= 0) & (steps <= 1)).all()
    assert (steps.sum(1) > 0).all()
    # Path cost consistency: symmetric pattern sums dist along the path.
    dist = np.asarray(compute_distance_matrix(x, y))
    assert float(total) == pytest.approx(dist[pi, pj].sum(), abs=1e-3)


def test_unknown_distance_raises(xy):
    with pytest.raises(ValueError, match="banana"):
        compute_distance_matrix(*xy, "banana")


def test_soft_dtw_limits_and_grad(xy):
    x, y = xy
    hard = dtw_distance(x, y)
    soft = soft_dtw(x, y, gamma=1e-3)
    assert float(soft) == pytest.approx(float(hard), abs=0.05)
    assert float(soft_dtw(x, y, gamma=1.0)) <= float(hard)  # softmin lower
    g = jax.grad(lambda a: soft_dtw(a, y, 0.1))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_soft_dtw_expected_alignment(xy):
    x, y = xy
    align, cost = soft_dtw_alignment(x, y, gamma=0.1)
    a = np.asarray(align)
    assert a.shape == (x.shape[0], y.shape[0])
    assert (a >= -1e-5).all()
    # Endpoint cells are always on the alignment.
    assert a[0, 0] == pytest.approx(1.0, abs=1e-3)
    assert a[-1, -1] == pytest.approx(1.0, abs=1e-3)


def test_dtw_aligner_batched(xy):
    x, y = xy
    aligner = DTWAligner()
    pis, pjs, costs = aligner(jnp.stack([x, x]), jnp.stack([y, y]))
    assert len(pis) == 2 and costs.shape == (2,)
    np.testing.assert_allclose(costs[0], costs[1], atol=1e-5)


def test_constrained_dtw_applies_band(xy):
    x, y = xy
    base = float(dtw_distance(x, y))
    constrained = ConstrainedDTWAligner(bandwidth=2)
    _, _, cost = constrained(x, y)
    assert float(cost) >= base - 1e-5  # band can only restrict
    wide = ConstrainedDTWAligner(bandwidth=100)
    _, _, cost_wide = wide(x, y)
    assert float(cost_wide) == pytest.approx(base, abs=1e-4)


def test_phoneme_alignment_helpers():
    rng = np.random.default_rng(1)
    phon = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
    audio = jnp.asarray(rng.normal(size=(25, 6)), jnp.float32)
    alignment, boundaries = phoneme_audio_alignment(phon, audio)
    assert alignment.shape == (25,)
    assert (np.diff(np.asarray(alignment)) >= 0).all(), "monotone alignment"
    durs = extract_phoneme_durations(alignment, 4)
    assert int(durs.sum()) == 25


# ---------------------------------------------------------------------------
# CTC
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ctc_problem():
    rng = np.random.default_rng(2)
    T, B, C, U = 20, 3, 6, 5
    logits = rng.normal(size=(T, B, C)).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    targets = rng.integers(1, C, size=(B, U)).astype(np.int32)
    in_lens = np.array([20, 15, 18], np.int32)
    tgt_lens = np.array([5, 3, 4], np.int32)
    return (
        jnp.asarray(lp), jnp.asarray(targets),
        jnp.asarray(in_lens), jnp.asarray(tgt_lens),
    )


def test_expand_targets():
    t = jnp.asarray([[1, 2, 3]])
    e = expand_targets_with_blank(t, 0)
    assert list(np.asarray(e[0])) == [0, 1, 0, 2, 0, 3, 0]


def test_ctc_nll_matches_torch(ctc_problem):
    torch = pytest.importorskip("torch")
    lp, targets, in_lens, tgt_lens = ctc_problem
    _, ll = ctc_forward_algorithm(lp, targets, in_lens, tgt_lens)
    ref = torch.nn.CTCLoss(blank=0, reduction="none")(
        torch.tensor(np.asarray(lp)), torch.tensor(np.asarray(targets)),
        torch.tensor(np.asarray(in_lens)), torch.tensor(np.asarray(tgt_lens)),
    )
    np.testing.assert_allclose(-np.asarray(ll), ref.numpy(), atol=1e-3)


def test_ctc_grad_matches_torch_through_logsoftmax(ctc_problem):
    """Torch's CTC backward is the logits-space gradient; ours is the true
    log-prob gradient. They must agree after projecting through the
    log-softmax Jacobian."""
    torch = pytest.importorskip("torch")
    lp, targets, in_lens, tgt_lens = ctc_problem
    g = jax.grad(
        lambda l: jnp.sum(
            -ctc_forward_algorithm(l, targets, in_lens, tgt_lens)[1]
        )
    )(lp)
    lp_t = torch.tensor(np.asarray(lp), requires_grad=True)
    torch.nn.CTCLoss(blank=0, reduction="sum")(
        lp_t, torch.tensor(np.asarray(targets)),
        torch.tensor(np.asarray(in_lens)), torch.tensor(np.asarray(tgt_lens)),
    ).backward()
    p = np.exp(np.asarray(lp))
    g_proj = np.asarray(g) - p * np.asarray(g).sum(-1, keepdims=True)
    np.testing.assert_allclose(g_proj, lp_t.grad.numpy(), atol=1e-4)


def test_ctc_alpha_beta_consistency(ctc_problem):
    lp, targets, in_lens, tgt_lens = ctc_problem
    la, ll = ctc_forward_algorithm(lp, targets, in_lens, tgt_lens)
    lb = ctc_backward_algorithm(lp, targets, in_lens, tgt_lens)
    from jax.scipy.special import logsumexp

    for b in range(3):
        n = int(in_lens[b])
        vals = np.asarray(logsumexp(la[b, :n] + lb[b, :n], axis=-1))
        np.testing.assert_allclose(vals, float(ll[b]), atol=1e-3)


def test_ctc_forced_alignment_decodes_to_target(ctc_problem):
    lp, targets, in_lens, tgt_lens = ctc_problem
    align, score = ctc_viterbi_alignment(lp, targets, in_lens, tgt_lens)
    for b in range(3):
        dec = np.asarray(ctc_decode_sequence(align[b, : int(in_lens[b])]))
        expect = list(np.asarray(targets[b, : int(tgt_lens[b])]))
        assert list(dec) == expect
    assert np.isfinite(np.asarray(score)).all()


def test_ctc_posterior_alignment(ctc_problem):
    lp, targets, in_lens, tgt_lens = ctc_problem
    paths = ctc_alignment_path(lp, targets, in_lens, tgt_lens)
    assert len(paths) == 3
    for b, p in enumerate(paths):
        assert p.shape == (int(in_lens[b]),)


def test_ctc_aligner_module(ctc_problem):
    lp, targets, in_lens, tgt_lens = ctc_problem
    aligner = CTCAligner(num_classes=6)
    loss = aligner(lp, targets, in_lens, tgt_lens)
    assert np.isfinite(float(loss))
    greedy = aligner.decode(lp, in_lens)
    beam = aligner.decode(lp, in_lens, beam_width=4)
    assert len(greedy) == len(beam) == 3
    aligns = aligner.align(lp, targets, in_lens, tgt_lens)
    assert len(aligns) == 3


def test_ctc_decode_utils():
    seq = jnp.asarray([0, 1, 1, 0, 2, 2, 2, 0, 1])
    assert list(np.asarray(collapse_repeated_tokens(seq))) == [0, 1, 0, 2, 0, 1]
    assert list(np.asarray(remove_ctc_blanks(seq))) == [1, 1, 2, 2, 2, 1]
    assert list(np.asarray(ctc_decode_sequence(seq))) == [1, 2, 1]


def test_ctc_segmentation():
    rng = np.random.default_rng(3)
    lp = jnp.asarray(rng.normal(size=(300, 5)), jnp.float32)
    transcript = jnp.asarray(rng.integers(1, 5, size=(30,)))
    seg = CTCSegmentationAligner(
        num_classes=5, min_segment_length=50, max_segment_length=100
    )
    segments = seg.segment_and_align(lp, transcript)
    assert segments, "must produce at least one segment"
    total_text = sum(s[1].shape[0] for s in segments)
    assert total_text == 30, "segments must cover the transcript"
    assert segments[-1][3] == 300, "segments must cover the audio"


# ---------------------------------------------------------------------------
# Device-side batched CTC decode vs host oracles
# ---------------------------------------------------------------------------

def test_ctc_greedy_decode_batch_matches_host():
    from pytorch_hmm_tpu.alignment import greedy_decode_batch

    rng = np.random.default_rng(11)
    T, B, C = 25, 5, 6
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(scale=2.0, size=(T, B, C)), jnp.float32), -1
    )
    in_lens = jnp.asarray([25, 17, 9, 25, 1], jnp.int32)

    tokens, out_lens = greedy_decode_batch(lp, in_lens, blank_id=0)
    best = np.asarray(jnp.argmax(lp, axis=-1))  # (T, B)
    for b in range(B):
        host = np.asarray(
            ctc_decode_sequence(jnp.asarray(best[: int(in_lens[b]), b]))
        )
        n = int(out_lens[b])
        np.testing.assert_array_equal(np.asarray(tokens)[b, :n], host)
        # Padding is blank.
        assert (np.asarray(tokens)[b, n:] == 0).all()


@pytest.mark.parametrize("beam_width", [2, 4, 8])
def test_ctc_beam_decode_batch_matches_host_oracle(beam_width):
    from pytorch_hmm_tpu.alignment import beam_search_decode_batch
    from pytorch_hmm_tpu.alignment.ctc import _prefix_beam_search

    rng = np.random.default_rng(13)
    T, B, C = 12, 4, 5
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(scale=1.5, size=(T, B, C)), jnp.float32), -1
    )
    in_lens = jnp.asarray([12, 8, 5, 12], jnp.int32)

    tokens, out_lens = beam_search_decode_batch(
        lp, in_lens, beam_width=beam_width, blank_id=0
    )
    lp_np = np.asarray(lp, np.float32)
    for b in range(B):
        host = _prefix_beam_search(
            lp_np[: int(in_lens[b]), b], beam_width, blank_id=0
        )
        n = int(out_lens[b])
        np.testing.assert_array_equal(
            np.asarray(tokens)[b, :n], host,
            err_msg=f"row {b} beam_width {beam_width}",
        )


def test_ctc_decode_batch_through_aligner(ctc_problem):
    lp, targets, in_lens, tgt_lens = ctc_problem
    aligner = CTCAligner(num_classes=6)
    tokens, out_lens = aligner.decode_batch(lp, in_lens)
    ragged = aligner.decode(lp, in_lens)
    for b, seq in enumerate(ragged):
        np.testing.assert_array_equal(
            np.asarray(tokens)[b, : int(out_lens[b])], np.asarray(seq)
        )
    tokens_w, out_lens_w = aligner.decode_batch(lp, in_lens, beam_width=4)
    assert tokens_w.shape[0] == out_lens_w.shape[0] == lp.shape[1]
