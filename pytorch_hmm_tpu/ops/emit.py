"""Diagonal-Gaussian emission scoring without the augmented tensor.

``emissions.diag_gaussian_log_probs`` packs the Mahalanobis expansion
into one ``[x², x, 1] @ W`` matmul — but XLA materializes the
``(B, T, 2D+1)`` augmented operand through HBM (~41 MB of extra traffic
at the flagship shape; measured 0.070 ms where the data floor is
~0.025). This kernel reads the observations ONCE: each row tile is
squared in registers and hit with two resident ``(D, N)`` weight dots,

    out = (x ⊙ x) @ Wq + x @ Wl + bias
        = Σ_d x²·iv − 2x·(μ·iv) + μ²·iv   (per padded state column)

The mixture logsumexp (and any centering) stays in XLA — it runs on
the ``(B, T, S·C)`` output, ~7 MB, and fuses fine. Standard blocked
pallas_call (BlockSpec pipelining, no manual DMA): rows stream through
VMEM in ``row_tile`` blocks while the weights stay resident.

Used by the GMM-HMM decode headline path (reference
``mixture_gaussian.py:192-240``); measured 0.070 → ~0.03 ms at
(B=32, T=1000, S·C=48, D=80) on v5e.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import LANES, _ceil_to, _pad_to, _use_interpret

__all__ = ["diag_quadratic", "diag_quadratic_supported"]

_ROW_TILE = 512
_MAX_N = 2048  # resident (Dp, N) weight pairs must fit VMEM


def diag_quadratic_supported(D: int, N: int) -> bool:
    Dp = _ceil_to(D, LANES)
    Np = _ceil_to(N, LANES)
    # two weight tiles + bias + one row tile in/out, all f32
    vmem = (2 * Dp * Np + Np + _ROW_TILE * (Dp + Np)) * 4 * 2
    return Np <= _MAX_N and vmem <= 13 * 1024 * 1024


def _diag_quad_kernel(x_ref, wq_ref, wl_ref, b_ref, out_ref, *, precision):
    x = x_ref[:, :]
    out_ref[:, :] = (
        jax.lax.dot_general(
            x * x, wq_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + jax.lax.dot_general(
            x, wl_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + b_ref[:, :]
    )


@functools.partial(jax.jit, static_argnames=("precision",))
def diag_quadratic(
    obs: jax.Array,       # (B, T, D)
    wq: jax.Array,        # (D, N)  e.g. inv_var per state column
    wl: jax.Array,        # (D, N)  e.g. -2 μ·inv_var
    bias: jax.Array,      # (N,)    e.g. Σ μ²·inv_var (+ any constants)
    precision=None,
) -> jax.Array:
    """``(B, T, N)`` = ``(obs²) @ wq + obs @ wl + bias`` with one
    observation read. ``precision=None`` uses the backend default
    (bf16 passes — x is squared in f32 first, in registers)."""
    B, T, D = obs.shape
    N = wq.shape[1]
    Dp = _ceil_to(D, LANES)
    Np = _ceil_to(N, LANES)
    R = B * T
    Rp = _ceil_to(R, _ROW_TILE)

    x = _pad_to(obs.reshape(R, D).astype(jnp.float32), Dp, 1, 0.0)
    x = _pad_to(x, Rp, 0, 0.0)
    wq_p = _pad_to(_pad_to(wq.astype(jnp.float32), Dp, 0, 0.0), Np, 1, 0.0)
    wl_p = _pad_to(_pad_to(wl.astype(jnp.float32), Dp, 0, 0.0), Np, 1, 0.0)
    b_p = _pad_to(bias.astype(jnp.float32), Np, 0, 0.0)[None, :]

    out = pl.pallas_call(
        functools.partial(
            _diag_quad_kernel,
            precision=precision or jax.lax.Precision.DEFAULT,
        ),
        grid=(Rp // _ROW_TILE,),
        in_specs=[
            pl.BlockSpec((_ROW_TILE, Dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, Np), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, Np), jnp.float32),
        interpret=_use_interpret(),
    )(x, wq_p, wl_p, b_p)

    return out[:R, :N].reshape(B, T, N)
