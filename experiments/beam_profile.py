"""Where does the beam-chunk kernel's time go?  Variants on chip:

  full       — the shipping pallas_beam_chunk
  nopath     — same kernel with the per-frame path-history select removed
  notopk     — also drop the W-round top-k (keep table + best-parent tree)

Run: python experiments/beam_profile.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_hmm_tpu.ops.scan import LANES, SUBLANES, _NEG, _ceil_to, _pad_to
from pytorch_hmm_tpu.ops.smallk import _frame_loop
from pytorch_hmm_tpu.ops import stream as stream_mod
from pytorch_hmm_tpu.profiling import device_time
from pytorch_hmm_tpu.streaming import StreamingHMMProcessor, _beam_step, _emit


def make_variant(drop_path: bool, drop_topk: bool):
    def _kernel(la_ref, lo_ref, nv_ref, pl0_ref, sc_ref, oh_ref, pt_ref,
                sc_out, oh_out, pt_out, *, t_pad, beam_w, num_states):
        W8, Sl = oh_ref.shape
        Hp = pt_ref.shape[1]
        la = la_ref[:, :]
        nv = nv_ref[0, 0]
        first_chunk = pl0_ref[0, 0] == 0
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, Sl), 1).astype(jnp.float32)
        avail0 = (iota_l < float(num_states)).astype(jnp.float32)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W8, 1), 0).astype(jnp.float32)
        iota_w3 = jax.lax.broadcasted_iota(jnp.int32, (W8, W8, 1), 1).astype(jnp.float32)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, Hp), 1)
        last_col = iota_h == Hp - 1
        sub_iota2 = jax.lax.broadcasted_iota(jnp.int32, (W8, Sl), 0).astype(jnp.float32)
        neg_inf = jnp.float32(-jnp.inf)
        real_rows = iota_w < float(beam_w)

        def step(tf, carry):
            sc, oh, pt = carry
            lo_t = lo_ref[pl.ds(tf, 1), :]
            rows = stream_mod._dot_rows(oh, la)
            cont = (sc + rows) + lo_t
            if isinstance(tf, int) and tf > 0:
                table = cont
            else:
                table = jnp.where(first_chunk & (tf == 0), sc + lo_t, cont)

            vals, pars = table, sub_iota2
            w = W8
            while w > 1:
                h = w // 2
                lv, rv = vals[:h], vals[h:w]
                lp_, rp_ = pars[:h], pars[h:w]
                take = (lv > rv) | ((lv == rv) & (lp_ <= rp_))
                vals = jnp.where(take, lv, rv)
                pars = jnp.where(take, lp_, rp_)
                w = h
            bps = vals[0:1]
            pps = pars[0:1]

            if drop_topk:
                sc_n = jnp.broadcast_to(jnp.max(bps, axis=1, keepdims=True), (W8, 1))
                oh_n = jnp.broadcast_to((bps == jnp.max(bps)).astype(jnp.float32), (W8, Sl))
                pv_n = jnp.broadcast_to(jnp.max(pps, axis=1, keepdims=True), (W8, 1))
            else:
                sc_n = jnp.zeros((W8, 1), jnp.float32)
                oh_n = jnp.zeros((W8, Sl), jnp.float32)
                pv_n = jnp.zeros((W8, 1), jnp.float32)
                cur, avail = bps, avail0
                for wi in range(beam_w):
                    m = jnp.max(jnp.where(avail > 0.0, cur, neg_inf), axis=1, keepdims=True)
                    sval = jnp.min(jnp.where((cur == m) & (avail > 0.0), iota_l, float(Sl)),
                                   axis=1, keepdims=True)
                    oh_w = (iota_l == sval).astype(jnp.float32)
                    par_w = jnp.max(pps * oh_w, axis=1, keepdims=True)
                    row = (iota_w == float(wi)).astype(jnp.float32)
                    sc_n = sc_n + row * m
                    oh_n = oh_n + row * oh_w
                    pv_n = pv_n + row * par_w
                    avail = jnp.where(oh_w > 0.0, 0.0, avail)
                sc_n = jnp.where(real_rows, sc_n, neg_inf)

            if drop_path:
                new_pt = pt
            else:
                pmask = (pv_n[:, None] == iota_w3).astype(jnp.float32)
                sel_pt = jnp.max(pmask * pt[None], axis=1)
                new_pt = pltpu.roll(sel_pt, Hp - 1, axis=1)
                svals = jnp.max(oh_n * iota_l, axis=1, keepdims=True)
                new_pt = jnp.where(last_col, jnp.broadcast_to(svals, (W8, Hp)), new_pt)

            valid = tf < nv
            sc = jnp.where(valid, sc_n, sc)
            oh = jnp.where(valid, oh_n, oh)
            pt = jnp.where(valid, new_pt, pt)
            return (sc, oh, pt)

        carry0 = (sc_ref[:, 0:1], oh_ref[:, :], pt_ref[:, :])
        sc, oh, pt = _frame_loop(0, t_pad, step, carry0)
        sc_out[:, :] = jnp.broadcast_to(sc, (W8, LANES))
        oh_out[:, :] = oh
        pt_out[:, :] = pt

    @jax.jit
    def run(log_a, log_obs, n_valid, carry):
        T, S = log_obs.shape
        scores, last_states, paths, path_len = carry
        W, H = paths.shape
        Sl = _ceil_to(S, LANES)
        Tp = _ceil_to(T, SUBLANES)
        Hp = _ceil_to(H, LANES)
        W8 = _ceil_to(W, SUBLANES)
        la = _pad_to(_pad_to(log_a.astype(jnp.float32), Sl, 0, _NEG), Sl, 1, _NEG)
        lo = _pad_to(_pad_to(log_obs.astype(jnp.float32), Sl, 1, _NEG), Tp, 0, 0.0)
        nv = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)
        pl0 = jnp.asarray(path_len, jnp.int32).reshape(1, 1)
        sc_in = jnp.broadcast_to(
            _pad_to(scores.astype(jnp.float32), W8, 0, -jnp.inf)[:, None], (W8, LANES))
        oh_in = jax.nn.one_hot(
            _pad_to(last_states.astype(jnp.int32), W8, 0, 0), Sl, dtype=jnp.float32)
        pt_in = _pad_to(jnp.pad(paths.astype(jnp.float32), ((0, 0), (Hp - H, 0))), W8, 0, 0.0)
        sc, oh, pt = pl.pallas_call(
            functools.partial(_kernel, t_pad=Tp, beam_w=W, num_states=S),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_shape=[
                jax.ShapeDtypeStruct((W8, LANES), jnp.float32),
                jax.ShapeDtypeStruct((W8, Sl), jnp.float32),
                jax.ShapeDtypeStruct((W8, Hp), jnp.float32),
            ],
        )(la, lo, nv, pl0, sc_in, oh_in, pt_in)
        return jnp.sum(sc[:W, 0]) + jnp.sum(pt) + jnp.sum(oh)

    return run


def main():
    key = jax.random.PRNGKey(0)
    proc = StreamingHMMProcessor(
        num_states=12, feature_dim=80, chunk_size=160,
        use_beam_search=True, rngs=nnx.Rngs(0))
    log_a = jnp.log(proc.get_transition_matrix() + 1e-8)
    carry0 = (proc._beam_scores, proc._beam_states, proc._beam_paths, proc._beam_len)
    print("paths shape:", proc._beam_paths.shape)
    chunk = jax.random.normal(key, (192, 80), jnp.float32)
    w = (proc.emission_hidden.kernel[...], proc.emission_hidden.bias[...],
         proc.emission_out.kernel[...], proc.emission_out.bias[...])
    lo = _emit(chunk, *w)
    nvalid = jnp.int32(160)

    # The single-stream beam kernel was superseded by the multi-stream
# kernel at N=1 (ops/stream_multi.py, r4); this shim keeps the probe
# runnable against the shipping dispatch path.
import jax.numpy as _jnp
from pytorch_hmm_tpu.ops.stream_multi import pallas_beam_chunk_multi as _pbm


def pallas_beam_chunk(la, lo, nv, carry):
    sc, ls, pt, pl_ = carry
    out = _pbm(la, lo[None], nv,
               (sc[None], ls[None], pt[None],
                _jnp.asarray(pl_, _jnp.int32)[None]))
    return tuple(x[0] for x in out)

    full = make_variant(False, False)
    nopath = make_variant(True, False)
    notopk = make_variant(True, True)
    variants = [
        ("full", lambda x: full(log_a, x, nvalid, carry0)),
        ("nopath", lambda x: nopath(log_a, x, nvalid, carry0)),
        ("notopk", lambda x: notopk(log_a, x, nvalid, carry0)),
        ("shipping", lambda x: sum(
            jnp.sum(o) for o in pallas_beam_chunk(log_a, x, nvalid, carry0))),
    ]
    # bench.py-style: ONE compiled chain per variant with a runtime rep
    # count; per-call time = (t(2R) - t(R)) / R. Interleaved trials,
    # R=512 puts each chain at ~130 ms >> the ~28 ms RTT noise floor.
    def make_chain(fn):
        @jax.jit
        def run(x, n):
            def body(i, acc):
                return acc + fn(x + 0.0 * acc)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return run

    import numpy as np
    import time as _time

    chains = [(n, make_chain(fn)) for n, fn in variants]
    R = 512

    def timed(run, n):
        n = jnp.int32(n)
        np.asarray(run(lo, n))
        t0 = _time.perf_counter()
        np.asarray(run(lo, n))
        return _time.perf_counter() - t0

    for n, run in chains:  # compile once each
        timed(run, R)
    results = {n: [] for n, _ in variants}
    for trial in range(5):
        for n, run in chains:
            results[n].append(max(timed(run, 2 * R) - timed(run, R), 1e-9) / R)
    for n, ts in results.items():
        ts = sorted(t * 1e3 for t in ts)
        print(f"{n:10s} med={ts[2]:.4f} ms  all={['%.4f' % t for t in ts]}",
              flush=True)


if __name__ == "__main__":
    main()
