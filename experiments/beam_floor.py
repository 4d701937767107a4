"""Measure the beam-chunk kernel's per-frame floor (VERDICT r4 item 2).

The streaming rows' roofline fractions (0.22 / 0.39 in r4) were scored
against the GENERIC transposed-decode floor (100 ns/step), annotated
"conservative bound" — nobody could say whether 3-4x was on the table
or the bound was slack. This experiment prices the beam chain piece by
piece at the serving shape (S=12, W=8, N=1 and N=8):

  A. dot-only chain      — oh @ la + elementwise closure; the
                           irreducible dependent-MXU-dot loop, same
                           family as the fwd_floor 190 ns result but on
                           the (W8, Sl) = (8, 128) tile;
  B. + best-parent tree  — 3-level W8 halving max tree;
  C. + rank top-k        — the (Sp, Sl) beats mask + reduce + one-hot
                           reformation (the full beam update, no
                           stores);
  D. full forward        — C + the pv/sv table stores (off the critical
                           path in theory; this prices them);
  E. backtrace chain     — the end-of-chunk parent-chase loop alone.

Each variant is swept over T in {256, 512, 1024}; the SLOPE is the
per-frame cost (launch/carry overhead lands in the intercept). The
defended per-frame floor for the streaming rows is then
slope(C) + slope(E): no beam decode that returns per-frame states and
paths can skip the beam update or the parent chase. Variants A/B
document how much of C is irreducible dot latency vs rank arithmetic.

Committed r5 measurements on v5e-1 (ns per frame):

    N=1 : A 173-178   B 198   C 212-220   D 216   E 86
    N=8 : A 226       B 246   C 266       E ~100
    N=16: C ~300      E ~115

The generic 100 ns "smallk" constant the r4 roofline charged was never
right for this family: the beam body's dependent chain is one (W8, Sl)
MXU dot (173 ns bare — the same latency class as fwd_floor's 190 ns
lane-layout result) plus ~40 ns of tree+rank vreg work, and the
backtrace chain adds ~86 ns/frame. These slopes feed
``roofline.V5E["step_pair_beam*"]`` — the streaming rows' ceilings are
now measured floors, not bounds (VERDICT r4 item 2). The store
variant (D − C ≈ 3 ns) confirms per-frame table writes ride free
behind the chain.

Run on the real chip:  python experiments/beam_floor.py [N ...]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_hmm_tpu.ops.scan import (
    LANES, SUBLANES, _NEG, _ceil_to, _pad_to, _use_interpret,
)
from pytorch_hmm_tpu.ops.smallk import _frame_loop
from pytorch_hmm_tpu.profiling import device_time


def _floor_kernel(
    la_ref, lo_ref, sc_ref, oh_ref, out_ref,
    pv_tab, sv_tab,
    *, t_pad, beam_w, num_states, variant,
):
    N, W8, Sl = oh_ref.shape
    la = la_ref[:, :]
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Sl), 2).astype(
        jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, W8, 1), 1).astype(
        jnp.float32)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, W8, Sl), 1).astype(
        jnp.float32)
    real_rows = iota_w < float(beam_w)
    elig = iota_l < float(num_states)
    Sp = max(_ceil_to(num_states, SUBLANES), SUBLANES)
    iota_sp = jax.lax.broadcasted_iota(jnp.int32, (1, Sp, 1), 1).astype(
        jnp.float32)
    elig_col = iota_sp < float(num_states)
    iota_sp_l = jax.lax.broadcasted_iota(jnp.int32, (1, Sp, Sl), 2).astype(
        jnp.float32)
    i_lt_j = iota_sp < iota_sp_l
    eye_sp = (iota_sp == iota_sp_l).astype(jnp.float32)
    eye_wl = (
        jax.lax.broadcasted_iota(jnp.int32, (1, W8, LANES), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (1, W8, LANES), 2)
    ).astype(jnp.float32)

    def to_lane_row(col):
        return jnp.sum(col * eye_wl, axis=1, keepdims=True)

    def step(tf, carry):
        sc, oh = carry
        lo_t = lo_ref[:, pl.ds(tf, 1), :]
        rows = jax.lax.dot_general(
            oh.reshape(N * W8, Sl), la, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(N, W8, Sl)
        table = (sc + rows) + lo_t

        if variant == "A":
            # Dot-only closure: renormalized table rows feed the next
            # dot directly (no tree, no rank) — prices the dependent
            # dot + add latency alone. BOTH carries must genuinely
            # evolve (sc := running max) or Mosaic dead-codes the loop
            # (variant B's first draft "measured" 0 ns/frame that way).
            m = jnp.max(table, axis=2, keepdims=True)
            oh_n = (table == m).astype(jnp.float32)
            return (m, oh_n)

        vals, pars = table, jnp.broadcast_to(sub_iota, table.shape)
        w = W8
        while w > 1:
            h = w // 2
            lv, rv = vals[:, :h], vals[:, h:w]
            lp_, rp_ = pars[:, :h], pars[:, h:w]
            take = (lv > rv) | ((lv == rv) & (lp_ <= rp_))
            vals = jnp.where(take, lv, rv)
            pars = jnp.where(take, lp_, rp_)
            w = h
        bps = vals[:, 0:1]
        pps = pars[:, 0:1]

        if variant == "B":
            # Tree only: best-per-state feeds next frame as a one-hot of
            # the per-state max (greedy-like closure, no rank).
            m = jnp.max(bps, axis=2, keepdims=True)
            oh_n = jnp.broadcast_to(
                (bps == m).astype(jnp.float32), (N, W8, Sl)
            )
            return (jnp.broadcast_to(m, sc.shape), oh_n)

        beats = elig_col & (
            (~elig)
            | (jnp.sum(eye_sp * bps, axis=2, keepdims=True) > bps)
            | ((jnp.sum(eye_sp * bps, axis=2, keepdims=True) == bps)
               & i_lt_j)
        )
        rank = jnp.sum(beats.astype(jnp.float32), axis=1, keepdims=True)
        oh_n = (
            (rank == iota_w) & elig & real_rows.astype(jnp.bool_)
        ).astype(jnp.float32)
        sc_n = jnp.sum(oh_n * bps, axis=2, keepdims=True)
        sc_n = jnp.where(real_rows, sc_n, jnp.float32(-jnp.inf))

        if variant == "D":
            pv_n = jnp.max(oh_n * pps, axis=2, keepdims=True)
            svals = jnp.max(oh_n * iota_l, axis=2, keepdims=True)
            pv_tab[pl.ds(tf, 1)] = to_lane_row(pv_n).swapaxes(0, 1)
            sv_tab[pl.ds(tf, 1)] = to_lane_row(svals).swapaxes(0, 1)
        return (sc_n, oh_n)

    if variant == "E":
        # Backtrace chain alone: chase a parent table already in VMEM.
        iota_lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, W8, LANES), 2
        ).astype(jnp.float32)

        def back(i, cur):
            t = t_pad - 1 - i
            pv_col = jnp.sum(
                pv_tab[pl.ds(t, 1)].swapaxes(0, 1) * eye_wl,
                axis=2, keepdims=True,
            )
            pmat = (pv_col == iota_lane).astype(jnp.float32)
            cur8 = jax.lax.slice_in_dim(cur, 0, W8, axis=2)
            return jnp.sum(
                jnp.expand_dims(cur8, 3) * jnp.expand_dims(pmat, 1),
                axis=2,
            )

        cur = _frame_loop(
            0, t_pad, back, jnp.broadcast_to(eye_wl, (N, W8, LANES))
        )
        out_ref[:, :, :] = cur
        return

    carry0 = (sc_ref[:, :, 0:1], oh_ref[:, :, :])
    sc, oh = _frame_loop(0, t_pad, step, carry0)
    # Consume BOTH chains so no variant can be dead-coded.
    out_ref[:, :, :] = jnp.broadcast_to(
        sc if sc.shape[-1] == 1 else sc[..., :1], (N, W8, LANES)
    ) + jax.lax.slice_in_dim(oh, 0, LANES, axis=2)


@functools.partial(jax.jit, static_argnames=("variant", "t_pad"))
def floor_chunk(log_a, log_obs, variant, t_pad):
    N, T, S = log_obs.shape
    W = 8
    Sl = _ceil_to(S, LANES)
    W8 = _ceil_to(W, SUBLANES)
    la = _pad_to(_pad_to(log_a.astype(jnp.float32), Sl, 0, _NEG), Sl, 1, _NEG)
    lo = _pad_to(
        _pad_to(log_obs.astype(jnp.float32), Sl, 2, _NEG), t_pad, 1, 0.0
    )
    sc = jnp.zeros((N, W8, LANES), jnp.float32)
    oh = jnp.zeros((N, W8, Sl), jnp.float32).at[:, :, 0].set(1.0)

    out = pl.pallas_call(
        functools.partial(
            _floor_kernel, t_pad=t_pad, beam_w=W, num_states=S,
            variant=variant,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, W8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_pad, N, LANES), jnp.float32),
            pltpu.VMEM((t_pad, N, LANES), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(la, lo, sc, oh)
    return out


def main():
    key = jax.random.PRNGKey(0)
    S = 12
    Ts = (256, 512, 1024)
    ns = tuple(
        int(a) for a in sys.argv[1:] if a.isdigit()
    ) or (1, 8)
    print(f"beam chunk floor sweep (S={S}, W=8) on {jax.devices()[0]}",
          flush=True)
    for N in ns:
        print(f"-- N={N} streams --", flush=True)
        slopes = {}
        for variant in ("A", "B", "C", "D", "E"):
            rows = []
            for T in Ts:
                lo = jax.random.normal(key, (N, T, S), jnp.float32)
                fn = functools.partial(
                    floor_chunk, variant=variant, t_pad=T
                )
                t = sorted(
                    device_time(lambda x: fn(jnp.zeros((S, S)), x), lo,
                                reps=64)
                    for _ in range(3)
                )[1]
                rows.append((T, t))
            slope, intercept = np.polyfit(
                [r[0] for r in rows], [r[1] for r in rows], 1
            )
            slopes[variant] = slope
            times = " ".join(f"T={T}:{t*1e6:7.1f}us" for T, t in rows)
            print(f"  {variant}: {times}  slope {slope*1e9:6.1f} ns/frame "
                  f"+ {intercept*1e6:5.1f} us", flush=True)
        floor = slopes["C"] + slopes["E"]
        print(f"  defended per-frame floor (C fwd + E backtrace): "
              f"{floor*1e9:.0f} ns -> 160-frame chunk floor "
              f"{floor*160*1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
