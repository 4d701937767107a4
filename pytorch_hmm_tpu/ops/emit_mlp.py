"""Fused neural-emission kernel: MLP trunk + gaussian head, one read.

The NeuralHMM forward's emission stage (``NeuralObservationModel``,
gaussian head) runs as an XLA matmul chain whose 256-wide activations
round-trip HBM between layers. Isolated-emission timings proved
harness-sensitive (0.056-0.094 ms XLA vs 0.069-0.092 ms fused across
consume patterns and sessions — a sliced consume lets XLA dead-code
chunks; see experiments/neural_profile.py's warning), so the decisive
committed evidence is the single-session END-TO-END A/B on the full
NeuralHMM forward at the bench shape (B=16, T=1000, D=80, H=256):
fused ON 0.206 ms vs OFF 0.218 ms (linearity-validated chain walls).
The kernel wins modestly in pipeline context — its pipelined grid
overlaps the FB kernel's layout glue better than the XLA chain does.
Here the whole chain

    h1 = relu(x W1 + b1);  h2 = relu(h1 W2 + b2)
    mo = h2 Wm + bm;       lvo = h2 Wlv + blv
    u  = (x − mo) − center;          wo = exp(−lvo)
    out[s] = −½(D·log2π + Σlvo + Σlvs_s)
             − ½ max(u²wo·A_s − 2·uwo·B_s + wo·C_s, 0)

runs per row tile with every activation VMEM-resident: observations are
read once, the (R, S) scores written once. The per-state tables
A = wsᵀ, B = (msc·ws)ᵀ, C = (msc²·ws)ᵀ and the Σlvs_s constants are
parameter-only and computed XLA-side (tiny); the head dots keep
HIGHEST precision (same conditioning argument as
``models/neural.py:_all_state_log_probs``, whose math this reproduces
exactly); trunk dot precision follows the caller's policy.

Inference-path kernel: the training path (dropout active, autodiff)
stays on XLA. Replaces (performance-wise) reference
``neural.py:170-208``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import LANES, _ceil_to, _pad_to, _use_interpret

__all__ = ["fused_gaussian_emission", "fused_emission_supported"]

_ROW_TILE = 512
_VMEM_BUDGET = 12 * 1024 * 1024
# Head-dot mode (the three (R, Dp) @ (Dp, Sp) expansion dots).
# Logically tiny (S=12, D=80) but lane padding inflates them 16x, so
# six-pass HIGHEST costs ~49 us of the kernel's ~92 at the bench shape
# while single-pass DEFAULT loses 0.33 absolute on log-probs (measured
# A/B). "bf16_3x" is the compensated middle ground: three DEFAULT
# passes reconstruct the f32 product to O(bf16²) error —
# a@b ≈ bf16(a)@bf16(b) + bf16(a−bf16(a))@bf16(b) + bf16(a)@bf16(b−bf16(b)).
# Module-level so the hardware A/B (and future tuning) can flip it to
# jax.lax.Precision.HIGHEST / DEFAULT.
_HEAD_PRECISION = "bf16_3x"


def fused_emission_supported(D: int, H: int, S: int) -> bool:
    Dp = _ceil_to(D, LANES)
    Hp = _ceil_to(H, LANES)
    Sp = _ceil_to(S, LANES)
    weights = Dp * Hp + Hp * Hp + 2 * Hp * Dp + 3 * Dp * Sp
    acts = _ROW_TILE * (Dp + 2 * Hp + 2 * Dp + Sp)
    return (weights + 2 * acts) * 4 <= _VMEM_BUDGET


def _emit_mlp_kernel(
    x_ref,      # (R, Dp)
    w1_ref,     # (Dp, Hp)
    b1_ref,     # (1, Hp)
    w2_ref,     # (Hp, Hp)
    b2_ref,     # (1, Hp)
    wm_ref,     # (Hp, Dp)
    bm_ref,     # (1, Dp)
    wlv_ref,    # (Hp, Dp)
    blv_ref,    # (1, Dp)
    a_ref,      # (Dp, Sp)  ws^T
    bt_ref,     # (Dp, Sp)  (msc*ws)^T
    ct_ref,     # (Dp, Sp)  (msc^2*ws)^T
    cs_ref,     # (1, Sp)   -0.5*(Sum lvs_s + D log 2pi)
    cen_ref,    # (1, Dp)   center
    out_ref,    # (R, Sp)
    *,
    precision,
):
    def dot(a, b, prec):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    if _HEAD_PRECISION == "bf16_3x" and not _use_interpret():
        def hdot(a, b):
            # Compensated product: the MXU's DEFAULT dots truncate
            # operands to bf16 internally, so feeding the residuals
            # reconstructs the two first-order error terms. Only valid
            # where DEFAULT actually truncates — interpret mode (true
            # f32 dots) uses a single HIGHEST dot instead.
            df = jax.lax.Precision.DEFAULT
            ah = a.astype(jnp.bfloat16).astype(jnp.float32)
            bh = b.astype(jnp.bfloat16).astype(jnp.float32)
            return (dot(a, b, df) + dot(a - ah, b, df)
                    + dot(a, b - bh, df))
    else:
        def hdot(a, b):
            prec = (
                jax.lax.Precision.HIGHEST
                if _HEAD_PRECISION == "bf16_3x" else _HEAD_PRECISION
            )
            return dot(a, b, prec)

    x = x_ref[:, :]
    h = jnp.maximum(dot(x, w1_ref[:, :], precision) + b1_ref[:, :], 0.0)
    h = jnp.maximum(dot(h, w2_ref[:, :], precision) + b2_ref[:, :], 0.0)
    mo = dot(h, wm_ref[:, :], precision) + bm_ref[:, :]
    lvo = dot(h, wlv_ref[:, :], precision) + blv_ref[:, :]
    u = (x - mo) - cen_ref[:, :]
    wo = jnp.exp(-lvo)
    uw = u * wo
    t_uu = hdot(u * uw, a_ref[:, :])
    t_um = hdot(uw, bt_ref[:, :])
    t_mm = hdot(wo, ct_ref[:, :])
    mahal = jnp.maximum(t_uu - 2.0 * t_um + t_mm, 0.0)
    row_norm = -0.5 * jnp.sum(lvo, axis=-1, keepdims=True)
    out_ref[:, :] = (cs_ref[:, :] + row_norm) - 0.5 * mahal


@functools.partial(jax.jit, static_argnames=("precision",))
def fused_gaussian_emission(
    obs,                       # (B, T, D)
    w1, b1, w2, b2,            # trunk
    wm, bm, wlv, blv,          # heads
    ws_t, mw_t, mmw_t,         # (D, S) tables: ws^T, (msc ws)^T, (msc² ws)^T
    state_const,               # (S,)  -0.5*Sum lvs_s
    center,                    # (D,)
    precision=None,
):
    """``(B, T, S)`` gaussian head scores — one obs read, VMEM-resident
    trunk. Exactly the centered-expansion math of
    ``NeuralObservationModel._all_state_log_probs``."""
    B, T, D = obs.shape
    H = w1.shape[1]
    S = ws_t.shape[1]
    Dp = _ceil_to(D, LANES)
    Hp = _ceil_to(H, LANES)
    Sp = _ceil_to(S, LANES)
    R = B * T
    Rp = _ceil_to(R, _ROW_TILE)

    f = jnp.float32
    x = _pad_to(obs.reshape(R, D).astype(f), Dp, 1, 0.0)
    x = _pad_to(x, Rp, 0, 0.0)
    pads = dict(
        w1=_pad_to(_pad_to(w1.astype(f), Dp, 0, 0.0), Hp, 1, 0.0),
        b1=_pad_to(b1.astype(f), Hp, 0, 0.0)[None],
        w2=_pad_to(_pad_to(w2.astype(f), Hp, 0, 0.0), Hp, 1, 0.0),
        b2=_pad_to(b2.astype(f), Hp, 0, 0.0)[None],
        wm=_pad_to(_pad_to(wm.astype(f), Hp, 0, 0.0), Dp, 1, 0.0),
        bm=_pad_to(bm.astype(f), Dp, 0, 0.0)[None],
        wlv=_pad_to(_pad_to(wlv.astype(f), Hp, 0, 0.0), Dp, 1, 0.0),
        blv=_pad_to(blv.astype(f), Dp, 0, 0.0)[None],
        a=_pad_to(_pad_to(ws_t.astype(f), Dp, 0, 0.0), Sp, 1, 0.0),
        bt=_pad_to(_pad_to(mw_t.astype(f), Dp, 0, 0.0), Sp, 1, 0.0),
        ct=_pad_to(_pad_to(mmw_t.astype(f), Dp, 0, 0.0), Sp, 1, 0.0),
        cs=_pad_to(
            (state_const.astype(f) - 0.5 * D * jnp.log(2.0 * jnp.pi)),
            Sp, 0, 0.0,
        )[None],
        cen=_pad_to(center.astype(f), Dp, 0, 0.0)[None],
    )

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _emit_mlp_kernel,
            precision=precision or jax.lax.Precision.DEFAULT,
        ),
        grid=(Rp // _ROW_TILE,),
        in_specs=[
            pl.BlockSpec((_ROW_TILE, Dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const_spec((Dp, Hp)), const_spec((1, Hp)),
            const_spec((Hp, Hp)), const_spec((1, Hp)),
            const_spec((Hp, Dp)), const_spec((1, Dp)),
            const_spec((Hp, Dp)), const_spec((1, Dp)),
            const_spec((Dp, Sp)), const_spec((Dp, Sp)),
            const_spec((Dp, Sp)), const_spec((1, Sp)),
            const_spec((1, Dp)),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, Sp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, Sp), jnp.float32),
        interpret=_use_interpret(),
    )(
        x, pads["w1"], pads["b1"], pads["w2"], pads["b2"],
        pads["wm"], pads["bm"], pads["wlv"], pads["blv"],
        pads["a"], pads["bt"], pads["ct"], pads["cs"], pads["cen"],
    )
    return out[:R, :S].reshape(B, T, S)
