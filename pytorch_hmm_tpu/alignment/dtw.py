"""Dynamic time warping — anti-diagonal wavefront scans.

Parity target: reference ``alignment/dtw.py`` (distance matrices, DTW
cost/path with three step patterns, ``DTWAligner``/``ConstrainedDTWAligner``
modules, soft-DTW, phoneme-audio alignment helpers).

TPU-first design: the DTW recurrence has a diagonal wavefront — every
cell on anti-diagonal ``k = i + j`` depends only on diagonals ``k-1`` and
``k-2``. The DP is a single ``lax.scan`` over ``N+M-1`` diagonals carrying
two fixed-length diagonal buffers, with all cells of a diagonal updated in
one vector op — no per-cell Python loops (reference ``dtw.py:47-152``
iterates every (i, j) in the interpreter).

Deliberate behavior fixes (SURVEY.md §7 "match behavior, not bugs"):

* ``ConstrainedDTWAligner`` actually applies its Sakoe-Chiba bandwidth
  mask — the reference computes the masked matrix and then discards it
  (``dtw.py:323-340``);
* soft-DTW's alignment path is the gradient of the smoothed cost w.r.t.
  the distance matrix (the exact expected-alignment matrix of Cuturi &
  Blondel), not the reference's linear interpolation stub
  (``dtw.py:297-304``).

Note the reference's 'asymmetric' pattern is computationally identical to
'symmetric' (both add ``dist[i, j]`` once, ``dtw.py:88-103``); we keep
both names for API parity.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

__all__ = [
    "compute_distance_matrix",
    "compute_dtw_path",
    "dtw_path_padded",
    "dtw_distance",
    "dtw_alignment",
    "soft_dtw",
    "soft_dtw_alignment",
    "DTWAligner",
    "ConstrainedDTWAligner",
    "phoneme_audio_alignment",
    "extract_phoneme_durations",
]

_INF = jnp.inf


def compute_distance_matrix(
    x: jax.Array, y: jax.Array, distance_fn: str = "euclidean"
) -> jax.Array:
    """Pairwise distances ``(N, M)`` between ``x (N, D)`` and ``y (M, D)``
    (``dtw.py:8-44``). All three metrics are expressed through MXU matmuls
    where possible."""
    if distance_fn == "euclidean":
        # ||a-b||² = ||a||² + ||b||² - 2ab — one matmul + rank-1 terms.
        x2 = jnp.sum(x * x, axis=-1)[:, None]
        y2 = jnp.sum(y * y, axis=-1)[None, :]
        sq = jnp.maximum(x2 + y2 - 2.0 * (x @ y.T), 0.0)
        return jnp.sqrt(sq + 1e-12)
    if distance_fn == "cosine":
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
        yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-8)
        return 1.0 - xn @ yn.T
    if distance_fn == "manhattan":
        return jnp.sum(jnp.abs(x[:, None] - y[None, :]), axis=-1)
    raise ValueError(f"Unknown distance function: {distance_fn}")


# ---------------------------------------------------------------------------
# Hard DTW (min-plus wavefront)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("step_pattern",))
def _dtw_wavefront(dist: jax.Array, step_pattern: str = "symmetric"):
    """Scan the anti-diagonals. Returns ``(cost_matrix (N, M), choices
    (N, M) int8)`` where choice 0=diagonal, 1=up (i-1, j), 2=left (i, j-1).
    """
    N, M = dist.shape
    i_idx = jnp.arange(N)

    def shift(v):  # v[i] -> v[i-1], +inf shifted in
        return jnp.concatenate([jnp.full((1,), _INF, v.dtype), v[:-1]])

    def step(carry, k):
        d1, d2 = carry  # diagonals k-1, k-2 indexed by i
        j = k - i_idx
        valid = (j >= 0) & (j < M)
        dk = jnp.where(valid, dist[i_idx, jnp.clip(j, 0, M - 1)], _INF)

        diag = shift(d2)  # (i-1, j-1)
        up = shift(d1)    # (i-1, j)
        left = d1         # (i, j-1)
        if step_pattern == "rabiner_juang":
            cands = jnp.stack([diag + 2.0 * dk, up + dk, left + dk])
        else:  # symmetric / asymmetric (identical, see module docstring)
            cands = jnp.stack([diag, up, left]) + dk
        best = jnp.min(cands, axis=0)
        choice = jnp.argmin(cands, axis=0).astype(jnp.int8)
        best = jnp.where((i_idx == 0) & (k == 0), dk, best)
        best = jnp.where(valid, best, _INF)
        return (best, d1), (best, choice)

    inf_row = jnp.full((N,), _INF, dist.dtype)
    _, (diags, choices) = jax.lax.scan(
        step, (inf_row, inf_row), jnp.arange(N + M - 1)
    )
    # Re-fold diagonals into (N, M): cell (i, j) lives at diags[i + j, i].
    jj = jnp.arange(M)
    cost = diags[i_idx[:, None] + jj[None, :], i_idx[:, None]]
    ch = choices[i_idx[:, None] + jj[None, :], i_idx[:, None]]
    return cost, ch


@partial(jax.jit, static_argnames=())
def _backtrace(choices: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Walk choices from (N-1, M-1) to (0, 0). Returns fixed-length
    ``(path_i, path_j, length)`` — entries past ``length`` are frozen at
    (0, 0)."""
    N, M = choices.shape
    L = N + M - 1

    def step(carry, _):
        i, j = carry
        c = choices[i, j]
        at_origin = (i == 0) & (j == 0)
        di = jnp.where(c == 2, 0, 1)
        dj = jnp.where(c == 1, 0, 1)
        ni = jnp.where(at_origin, 0, i - di)
        nj = jnp.where(at_origin, 0, j - dj)
        return (jnp.maximum(ni, 0), jnp.maximum(nj, 0)), (i, j)

    _, (pi, pj) = jax.lax.scan(step, (N - 1, M - 1), None, length=L)
    # True path length: cells emitted before freezing at the origin, plus
    # the origin itself.
    length = jnp.sum((pi + pj) > 0) + 1
    # Emitted first-to-origin; reverse to run origin-to-end.
    return pi[::-1], pj[::-1], length


def compute_dtw_path(
    distance_matrix: jax.Array, step_pattern: str = "symmetric"
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """DTW path + cost matrix (``dtw.py:47-152``).

    Returns ``(path_i, path_j, cost_matrix)`` with the path trimmed to its
    true length (host-side; use :func:`dtw_path_padded` for fully-jitted
    pipelines — it also dispatches to the Pallas kernel on TPU).
    """
    cost, choices = _dtw_wavefront(distance_matrix, step_pattern)
    pi, pj, length = _backtrace(choices)
    n_pad = pi.shape[0] - int(length)
    return pi[n_pad:], pj[n_pad:], cost


def _use_dtw_kernel(n: int, m: int) -> bool:
    import os

    from ..ops.dtw import pallas_dtw_supported

    return (
        os.environ.get("PYTORCH_HMM_TPU_NO_PALLAS") != "1"
        and jax.default_backend() == "tpu"
        and pallas_dtw_supported(n, m)
    )


def dtw_path_padded(
    dist: jax.Array, step_pattern: str = "symmetric"
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Jit-composable DTW: ``(path_i, path_j, length, final_cost)``.

    The paths have fixed length N+M-1 with the leading entries frozen at
    (0, 0); the true path occupies the last ``length`` entries. On TPU
    this runs the single-program Pallas wavefront+backtrace kernel
    (``ops/dtw.py``, ~50x the XLA scan at 500x500); elsewhere the XLA
    anti-diagonal scan. Outputs are bit-identical on both paths.
    """
    if _use_dtw_kernel(*dist.shape):
        from ..ops.dtw import pallas_dtw

        return pallas_dtw(dist, step_pattern)
    cost, choices = _dtw_wavefront(dist, step_pattern)
    pi, pj, length = _backtrace(choices)
    return pi, pj, length, cost[-1, -1]


def dtw_distance(
    x: jax.Array,
    y: jax.Array,
    distance_fn: str = "euclidean",
    step_pattern: str = "symmetric",
) -> jax.Array:
    """Scalar DTW distance (``dtw.py:155-176``)."""
    dist = compute_distance_matrix(x, y, distance_fn)
    if _use_dtw_kernel(*dist.shape):
        from ..ops.dtw import pallas_dtw

        return pallas_dtw(dist, step_pattern)[3]
    cost, _ = _dtw_wavefront(dist, step_pattern)
    return cost[-1, -1]


def dtw_alignment(
    x: jax.Array,
    y: jax.Array,
    distance_fn: str = "euclidean",
    step_pattern: str = "symmetric",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """``(path_i, path_j, total_cost)`` (``dtw.py:179-202``)."""
    dist = compute_distance_matrix(x, y, distance_fn)
    pi, pj, length, cost = dtw_path_padded(dist, step_pattern)
    n_pad = pi.shape[0] - int(length)
    return pi[n_pad:], pj[n_pad:], cost


# ---------------------------------------------------------------------------
# Soft-DTW (Cuturi & Blondel 2017)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def _soft_dtw_from_dist(dist: jax.Array, gamma: float) -> jax.Array:
    """Smoothed DTW cost via the same wavefront with a soft minimum."""
    N, M = dist.shape
    i_idx = jnp.arange(N)
    big = 1e30

    def shift(v):
        return jnp.concatenate([jnp.full((1,), big, v.dtype), v[:-1]])

    def softmin(cands):
        return -gamma * jax.scipy.special.logsumexp(-cands / gamma, axis=0)

    def step(carry, k):
        d1, d2 = carry
        j = k - i_idx
        valid = (j >= 0) & (j < M)
        dk = jnp.where(valid, dist[i_idx, jnp.clip(j, 0, M - 1)], 0.0)
        cands = jnp.stack([shift(d2), shift(d1), d1])
        val = dk + softmin(cands)
        val = jnp.where((i_idx == 0) & (k == 0), dk, val)
        val = jnp.where(valid, val, big)
        return (val, d1), val

    inf_row = jnp.full((N,), big, dist.dtype)
    (last, _), diags = jax.lax.scan(
        step, (inf_row, inf_row), jnp.arange(N + M - 1)
    )
    return diags[-1, -1]


def soft_dtw(
    x: jax.Array,
    y: jax.Array,
    gamma: float = 0.1,
    distance_fn: str = "euclidean",
) -> jax.Array:
    """Differentiable soft-DTW loss (``dtw.py:271-305``)."""
    dist = compute_distance_matrix(x, y, distance_fn)
    return _soft_dtw_from_dist(dist, gamma)


def soft_dtw_alignment(
    x: jax.Array,
    y: jax.Array,
    gamma: float = 0.1,
    distance_fn: str = "euclidean",
) -> Tuple[jax.Array, jax.Array]:
    """``(expected_alignment (N, M), soft_cost)``.

    The expected alignment is ``∂cost/∂dist`` — the exact soft-DTW
    occupation matrix, computed by autodiff through the wavefront scan
    (replaces the reference's linear-path approximation,
    ``dtw.py:297-304``).
    """
    dist = compute_distance_matrix(x, y, distance_fn)
    cost, grad = jax.value_and_grad(
        lambda d: _soft_dtw_from_dist(d, gamma)
    )(dist)
    return grad, cost


# ---------------------------------------------------------------------------
# Aligner modules
# ---------------------------------------------------------------------------

class DTWAligner(nnx.Module):
    """DTW aligner module (``dtw.py:205-305``). Batched inputs are
    vmapped over the batch (the reference loops in Python)."""

    def __init__(
        self,
        distance_fn: str = "euclidean",
        step_pattern: str = "symmetric",
        bandwidth: Optional[int] = None,
        soft_dtw: bool = False,
        gamma: float = 0.1,
    ):
        self.distance_fn = distance_fn
        self.step_pattern = step_pattern
        self.bandwidth = bandwidth
        self.use_soft_dtw = soft_dtw
        self.gamma = gamma

    def _distance(self, x, y):
        dist = compute_distance_matrix(x, y, self.distance_fn)
        if self.bandwidth is not None:
            dist = _bandwidth_mask(dist, self.bandwidth)
        return dist

    def _align_single(self, x, y):
        dist = self._distance(x, y)
        if self.use_soft_dtw:
            align, cost = (
                jax.value_and_grad(
                    lambda d: _soft_dtw_from_dist(d, self.gamma)
                )(dist)[::-1]
            )
            # Hard path from the expected alignment: per-frame argmax.
            pi = jnp.arange(x.shape[0])
            pj = jnp.argmax(align, axis=1)
            return pi, pj, cost
        pi, pj, length, cost = dtw_path_padded(dist, self.step_pattern)
        n_pad = pi.shape[0] - int(length)
        return pi[n_pad:], pj[n_pad:], cost

    def __call__(self, x: jax.Array, y: jax.Array):
        """``(path_i, path_j, cost)``; lists of paths for batched input
        (matching the reference's return convention, ``dtw.py:236-263``)."""
        if x.ndim == 3:
            paths_i, paths_j, costs = [], [], []
            for b in range(x.shape[0]):
                pi, pj, c = self._align_single(x[b], y[b])
                paths_i.append(pi)
                paths_j.append(pj)
                costs.append(c)
            return paths_i, paths_j, jnp.stack(costs)
        return self._align_single(x, y)

    forward = __call__


def _bandwidth_mask(dist: jax.Array, bandwidth: int) -> jax.Array:
    """Sakoe-Chiba band around the stretched diagonal (the reference
    builds this mask and then forgets to use it, ``dtw.py:329-340``)."""
    N, M = dist.shape
    i = jnp.arange(N)[:, None]
    j = jnp.arange(M)[None, :]
    off_band = jnp.abs(i - j * N / M) > bandwidth
    return jnp.where(off_band, _INF, dist)


class ConstrainedDTWAligner(DTWAligner):
    """DTW with an enforced Sakoe-Chiba bandwidth (``dtw.py:308-340``)."""

    def __init__(self, bandwidth: int = 10, monotonic: bool = True, **kwargs):
        kwargs.pop("bandwidth", None)
        super().__init__(bandwidth=bandwidth, **kwargs)
        self.monotonic = monotonic  # standard DTW steps are monotonic


# ---------------------------------------------------------------------------
# Speech-specific helpers
# ---------------------------------------------------------------------------

def phoneme_audio_alignment(
    phoneme_features: jax.Array,
    audio_features: jax.Array,
    phoneme_durations: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Frame-level phoneme alignment + boundaries (``dtw.py:344-379``).

    Returns ``(alignment (num_frames,), boundaries (num_phonemes + 1,))``.
    """
    aligner = DTWAligner(distance_fn="cosine", step_pattern="asymmetric")
    path_i, path_j, _ = aligner(phoneme_features, audio_features)

    num_frames = audio_features.shape[0]
    pi = np.asarray(path_i)
    pj = np.asarray(path_j)
    alignment = np.zeros(num_frames, dtype=np.int32)
    alignment[np.clip(pj, 0, num_frames - 1)] = pi
    # Monotone fill for any frame the path skipped.
    alignment = np.maximum.accumulate(alignment)

    boundaries = [0]
    current = 0
    for frame, ph in zip(pj, pi):
        if ph > current:
            boundaries.append(int(frame))
            current = int(ph)
    boundaries.append(num_frames)
    return jnp.asarray(alignment), jnp.asarray(boundaries)


def extract_phoneme_durations(
    alignment: jax.Array, num_phonemes: int
) -> jax.Array:
    """Per-phoneme frame counts from a frame alignment
    (``dtw.py:382-403``) — a one-hot sum, no Python loop."""
    onehot = jax.nn.one_hot(alignment, num_phonemes, dtype=jnp.int32)
    return jnp.sum(onehot, axis=0)
