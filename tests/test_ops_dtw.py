"""Pallas DTW kernel vs the XLA wavefront/backtrace — bit-exact.

Runs in interpret mode on the CPU test platform; the same kernel code
is hardware-validated on v5e (docs/performance.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_hmm_tpu.alignment.dtw import (
    _backtrace,
    _dtw_wavefront,
    compute_distance_matrix,
    dtw_path_padded,
)
from pytorch_hmm_tpu.ops.dtw import pallas_dtw, pallas_dtw_supported


def _dist(n, m, seed):
    kx, ky = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (n, 7), jnp.float32)
    y = jax.random.normal(ky, (m, 7), jnp.float32)
    return compute_distance_matrix(x, y)


@pytest.mark.parametrize("pattern", ["symmetric", "rabiner_juang"])
@pytest.mark.parametrize(
    "n,m", [(5, 9), (16, 16), (37, 23), (64, 128), (130, 40)]
)
def test_pallas_dtw_matches_xla(n, m, pattern):
    dist = _dist(n, m, n + m)
    cost, choices = _dtw_wavefront(dist, pattern)
    pi, pj, length = _backtrace(choices)

    kpi, kpj, klen, kcost = pallas_dtw(dist, pattern)

    np.testing.assert_array_equal(np.asarray(kpi), np.asarray(pi))
    np.testing.assert_array_equal(np.asarray(kpj), np.asarray(pj))
    assert int(klen) == int(length)
    assert float(kcost) == float(cost[-1, -1])


def test_pallas_dtw_banded_inf():
    # INF-masked cells (Sakoe-Chiba band) must propagate identically.
    from pytorch_hmm_tpu.alignment.dtw import _bandwidth_mask

    dist = _bandwidth_mask(_dist(40, 40, 3), bandwidth=6)
    cost, choices = _dtw_wavefront(dist)
    pi, pj, length = _backtrace(choices)
    kpi, kpj, klen, kcost = pallas_dtw(dist)
    np.testing.assert_array_equal(np.asarray(kpi), np.asarray(pi))
    np.testing.assert_array_equal(np.asarray(kpj), np.asarray(pj))
    assert int(klen) == int(length)
    assert float(kcost) == float(cost[-1, -1])


def test_dtw_path_padded_dispatch_matches():
    # On the CPU test platform the dispatcher takes the XLA path; the
    # shape gate itself must hold for the benchmark shape.
    assert pallas_dtw_supported(500, 500)
    assert not pallas_dtw_supported(4000, 4000)
    dist = _dist(24, 30, 11)
    pi, pj, length, cost = dtw_path_padded(dist)
    rpi, rpj, rlen = _backtrace(_dtw_wavefront(dist)[1])
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(rpi))
    assert int(length) == int(rlen)


def test_dtw_path_padded_inside_jit():
    # The fast path must compose under jit (no host-side trimming).
    dist = _dist(16, 20, 5)

    @jax.jit
    def f(d):
        pi, pj, length, cost = dtw_path_padded(d)
        return pi.sum() + pj.sum() + length + cost

    assert np.isfinite(float(f(dist)))
