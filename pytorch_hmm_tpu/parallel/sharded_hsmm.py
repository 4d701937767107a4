"""Time-block-parallel HSMM recursions over a device mesh.

The reference's HSMM decoder is a per-sequence Python loop with an
O(T·S²·D²) interpreter cliff (``hsmm.py:245-354``) and no multi-device
story at all. ``core/hsmm.py`` already collapses the cost to an
O(T·(DS+S²)) single-device scan; here the *time axis itself* is sharded,
giving the explicit-duration family the same exact block-parallel
treatment as the plain HMM kernels in ``sharded.py``.

The trick is the classic **augmented-chain reduction**: an HSMM with S
states and durations 1..D is an HMM over K' = S·D states
``k = (s, r)`` where ``r`` is the remaining duration of the current
segment:

* ``(s, r) → (s, r-1)``  for ``r > 1``   (deterministic countdown),
* ``(s, 1) → (s', r')``  with ``log_a[s, s'] + log_dur[s', r']``,
* initial ``(s, r)``     with ``log_pi[s] + log_dur[s, r]``,
* emission of ``(s, r)`` is the state emission ``log_obs[t, s]``.

``alpha_aug[t, (s, 1)]`` is exactly ``core.hsmm_forward``'s
``log_alpha_star[t, s]`` (segment of ``s`` ends at ``t``), so reading
the ``r = 1`` lane reproduces the segment DP bit-for-bit semantics.

The three-phase block decomposition of ``sharded.py`` applies verbatim
on the augmented chain — with one crucial efficiency twist: the
augmented transition is *sparse* (each state has one countdown edge; only
the S ``r = 1`` states fan out), and every **row** of a block's transfer
operator evolves under the same recursion as an alpha vector. Folding
the block operator is therefore a batched application of the sparse
one-step update to K' row-vectors — O(Tl · K'·(S² + SD)) — rather than
dense (K')³ semiring matmuls.

Memory note: the boundary exchange still all_gathers (P, B, K', K')
block operators. With K' = S·D this is the price of exact time
parallelism for explicit durations; for very large S·D prefer batch
(data-axis) sharding, which HSMM EM already supports
(``models/hsmm.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.semiring import logsumexp
from .mesh import DATA_AXIS, TIME_AXIS

__all__ = [
    "sharded_hsmm_log_likelihood",
    "sharded_hsmm_forward",
    "sharded_hsmm_viterbi",
]

_NEG = -1e30


def _axis_info(axis_name: str):
    idx = jax.lax.axis_index(axis_name)
    size = jax.lax.psum(1, axis_name)
    return idx, size


def _pvary(x, axis_names):
    return jax.lax.pvary(x, tuple(axis_names))


def _aug_step_sum(v, log_a, log_dur):
    """One augmented-chain transition in the (logsumexp, +) semiring.

    ``v``: (..., S, D) log-mass per augmented state (duration index
    ``j = r-1``). Returns the pre-emission mass at the next frame.
    """
    end = v[..., 0]  # (..., S): segments ending here (r = 1)
    enter = logsumexp(end[..., :, None] + log_a, axis=-2)  # (..., S')
    start = enter[..., None] + log_dur  # (..., S', D)
    cont = jnp.concatenate(
        [v[..., 1:], jnp.full_like(v[..., :1], _NEG)], axis=-1
    )
    return jnp.logaddexp(cont, start)


def _aug_step_max(v, log_a, log_dur):
    """(max, +) version; also returns the best source state for each
    new-segment entry (needed for backpointers)."""
    end = v[..., 0]
    scores = end[..., :, None] + log_a  # (..., S, S')
    enter = jnp.max(scores, axis=-2)
    best_src = jnp.argmax(scores, axis=-2).astype(jnp.int32)  # (..., S')
    start = enter[..., None] + log_dur  # (..., S', D)
    cont = jnp.concatenate(
        [v[..., 1:], jnp.full_like(v[..., :1], _NEG)], axis=-1
    )
    return jnp.maximum(cont, start), (start >= cont), best_src


def _alpha0(log_pi, log_dur, lo_0):
    """Augmented alpha at global frame 0 (includes frame-0 emission)."""
    return (log_pi[:, None] + log_dur) + lo_0[..., :, None]


def _fold_block(log_obs, log_a, log_pi, log_dur, t0, step_fn, vary):
    """Phase 1: fold the local block's transfer operator.

    Returns ``block`` (B, K', K'): row ``i`` is the augmented mass at the
    block's last frame given unit entry mass on augmented state ``i`` at
    the previous block's last frame. If the block contains global frame
    0, every row instead equals the true alpha (rank-1 trick — entry
    state is irrelevant before the chain starts).
    """
    B, Tl, S = log_obs.shape
    D = log_dur.shape[-1]
    K = S * D

    eye = jnp.where(jnp.eye(K, dtype=bool), 0.0, _NEG).astype(log_obs.dtype)
    rows0 = _pvary(
        jnp.broadcast_to(eye.reshape(K, S, D), (B, K, S, D)), vary
    )

    def fold(carry, t_local):
        lo_t = log_obs[:, t_local]  # (B, S)
        nxt = step_fn(carry, log_a, log_dur) + lo_t[:, None, :, None]
        a0 = jnp.broadcast_to(
            _alpha0(log_pi, log_dur, lo_t)[:, None], (B, K, S, D)
        )
        return jnp.where(t0 + t_local == 0, a0, nxt), None

    block, _ = jax.lax.scan(fold, rows0, jnp.arange(Tl))
    return block.reshape(B, K, K)


def _entry_vectors(block, axis_name, idx, vec_apply, vary):
    """Phase 2: all_gather block operators; fold exclusive prefixes as
    (B, K') vectors (every prefix contains the rank-1 frame-0 block, so
    row 0 of the composed operator IS the alpha vector)."""
    B, K, _ = block.shape
    blocks = jax.lax.all_gather(block, axis_name)  # (P, B, K, K)

    def pfold(carry, xs):
        blk, p_i = xs
        nxt = jnp.where(p_i == 0, blk[:, 0, :], vec_apply(carry, blk))
        return nxt, carry  # emit the exclusive prefix

    zero = _pvary(jnp.full((B, K), _NEG, block.dtype), vary)
    _, entries = jax.lax.scan(
        pfold, zero, (blocks, jnp.arange(blocks.shape[0]))
    )
    return entries[idx]  # (B, K'); garbage for idx == 0 (unused)


def _hsmm_forward_block(log_obs, log_a, log_pi, log_dur, axis_name, vary=()):
    """Per-shard body: exact local ``alpha_star`` (B, Tl, S) + log_z (B,)."""
    B, Tl, S = log_obs.shape
    D = log_dur.shape[-1]
    idx, p = _axis_info(axis_name)
    t0 = idx * Tl

    block = _fold_block(
        log_obs, log_a, log_pi, log_dur, t0, _aug_step_sum, vary
    )

    def vec_apply(v, blk):
        return logsumexp(v[:, :, None] + blk, axis=1)

    entry = _entry_vectors(block, axis_name, idx, vec_apply, vary)
    entry = entry.reshape(B, S, D)

    # Phase 3: exact local rescan on the augmented chain.
    def step(carry, t_local):
        lo_t = log_obs[:, t_local]
        nxt = _aug_step_sum(carry, log_a, log_dur) + lo_t[:, :, None]
        a0 = _alpha0(log_pi, log_dur, lo_t)
        alpha_t = jnp.where(t0 + t_local == 0, a0, nxt)
        return alpha_t, alpha_t[:, :, 0]  # emit the r=1 lane (alpha_star)

    alpha_last, stars = jax.lax.scan(step, entry, jnp.arange(Tl))

    lz_local = logsumexp(alpha_last[:, :, 0], axis=-1)
    log_z = jax.lax.psum(
        jnp.where(idx == p - 1, lz_local, jnp.zeros_like(lz_local)),
        axis_name,
    )
    return stars.swapaxes(0, 1), log_z


def _hsmm_viterbi_block(log_obs, log_a, log_pi, log_dur, axis_name, vary=()):
    """Per-shard body: exact local segmentation (B, Tl) + score (B,)."""
    B, Tl, S = log_obs.shape
    D = log_dur.shape[-1]
    K = S * D
    idx, p = _axis_info(axis_name)
    t0 = idx * Tl

    def step_max(v, la, ld):
        out, _, _ = _aug_step_max(v, la, ld)
        return out

    block = _fold_block(log_obs, log_a, log_pi, log_dur, t0, step_max, vary)

    def vec_apply(v, blk):
        return jnp.max(v[:, :, None] + blk, axis=1)

    entry = _entry_vectors(block, axis_name, idx, vec_apply, vary)
    entry = entry.reshape(B, S, D)

    # Phase 3: local augmented trellis with backpointers. psi[t] holds the
    # augmented predecessor index at frame t-? (for the move INTO frame
    # t_local); frame 0's psi points into the previous block.
    j_idx = jnp.arange(D)[None, None, :]
    s_idx = jnp.arange(S)[None, :, None]

    def step(carry, t_local):
        lo_t = log_obs[:, t_local]
        nxt, is_new, best_src = _aug_step_max(carry, log_a, log_dur)
        delta_t = nxt + lo_t[:, :, None]
        # Predecessor of (s', j'): countdown from (s', j'+1), or a new
        # segment entered from (best_src, r=1) = index best_src*D.
        cont_idx = s_idx * D + jnp.minimum(j_idx + 1, D - 1)
        new_idx = best_src[:, :, None] * D
        psi_t = jnp.where(is_new, new_idx, cont_idx).astype(jnp.int32)

        a0 = _alpha0(log_pi, log_dur, lo_t)
        is0 = t0 + t_local == 0
        delta_t = jnp.where(is0, a0, delta_t)
        psi_t = jnp.where(is0, jnp.zeros_like(psi_t), psi_t)
        return delta_t, (delta_t, psi_t)

    delta_last, (_, psis) = jax.lax.scan(step, entry, jnp.arange(Tl))
    psis = psis.reshape(Tl, B, K)
    delta_last = delta_last.reshape(B, K)

    # Phase 4a: local backtrace for every hypothetical exit state.
    all_states = _pvary(
        jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (B, K)),
        vary,
    )

    def back(carry, psi_t):
        prev = jnp.take_along_axis(psi_t, carry, axis=1)
        return prev, carry

    link, states_rev = jax.lax.scan(back, all_states, psis, reverse=True)

    # Phase 4b: stitch. The true exit is on the last shard, restricted to
    # the r=1 lane (the final segment must END at the last frame — the
    # same boundary condition as core.hsmm_viterbi).
    links = jax.lax.all_gather(link, axis_name)  # (P, B, K)
    is_last = idx == p - 1
    r1_mask = (jnp.arange(K) % D) == 0
    masked = jnp.where(r1_mask[None, :], delta_last, _NEG)
    fs_local = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    final_state = jax.lax.psum(
        jnp.where(is_last, fs_local, jnp.zeros_like(fs_local)), axis_name
    )
    score = jax.lax.psum(
        jnp.where(is_last, jnp.max(masked, axis=-1), 0.0), axis_name
    )

    def stitch(carry, lnk):
        prev_exit = jnp.take_along_axis(lnk, carry[:, None], axis=1)[:, 0]
        return prev_exit, carry

    _, exits = jax.lax.scan(
        stitch, _pvary(final_state, (axis_name,)), links, reverse=True
    )
    my_exit = exits[idx]  # (B,)

    aug_path = jnp.take_along_axis(
        states_rev.transpose(1, 0, 2),
        my_exit[:, None, None].repeat(Tl, 1),
        axis=2,
    )[:, :, 0]  # (B, Tl) augmented indices
    return (aug_path // D).astype(jnp.int32), score


# ---------------------------------------------------------------------------
# Public wrappers
# ---------------------------------------------------------------------------

def _specs(mesh: Mesh):
    has_data = DATA_AXIS in mesh.axis_names
    d = DATA_AXIS if has_data else None
    return P(d, TIME_AXIS, None), P(d, TIME_AXIS), P(d)


@partial(jax.jit, static_argnames=("mesh",))
def sharded_hsmm_forward(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    log_dur: jax.Array,
    mesh: Mesh,
):
    """Exact HSMM forward on a ``(data, time)`` mesh.

    Returns ``(log_alpha_star (B, T, S), log_z (B,))`` matching
    ``core.hsmm_forward`` — batch sharded over ``data``, time blocks over
    ``time``. Differentiable (use for sharded HSMM training losses).
    """
    obs_spec, _, b_spec = _specs(mesh)

    def body(lo, la, lp, ld):
        return _hsmm_forward_block(
            lo, la, lp, ld, TIME_AXIS, mesh.axis_names
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(obs_spec, P(None, None), P(None), P(None, None)),
        out_specs=(obs_spec, b_spec),
        check_vma=False,
    )(log_obs, log_a, log_pi, log_dur)


@partial(jax.jit, static_argnames=("mesh",))
def sharded_hsmm_log_likelihood(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    log_dur: jax.Array,
    mesh: Mesh,
) -> jax.Array:
    """Sequence log-likelihood ``(B,)`` under the sharded segment DP."""
    _, log_z = sharded_hsmm_forward(log_obs, log_a, log_pi, log_dur, mesh)
    return log_z


@partial(jax.jit, static_argnames=("mesh",))
def sharded_hsmm_viterbi(
    log_obs: jax.Array,
    log_a: jax.Array,
    log_pi: jax.Array,
    log_dur: jax.Array,
    mesh: Mesh,
):
    """Exact best segmentation ``(states (B, T), score (B,))`` on a
    ``(data, time)`` mesh — the multi-chip path for the component with
    the worst serial cost in the reference (``hsmm.py:245-354``)."""
    obs_spec, t_spec, b_spec = _specs(mesh)

    def body(lo, la, lp, ld):
        return _hsmm_viterbi_block(
            lo, la, lp, ld, TIME_AXIS, mesh.axis_names
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(obs_spec, P(None, None), P(None), P(None, None)),
        out_specs=(t_spec, b_spec),
        check_vma=False,
    )(log_obs, log_a, log_pi, log_dur)
