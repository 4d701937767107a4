"""Diag-quadratic emission kernel (ops/emit.py) vs the XLA expansion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_hmm_tpu.ops.emit import diag_quadratic, diag_quadratic_supported


@pytest.mark.parametrize("B,T,D,N", [(2, 100, 20, 12), (3, 257, 80, 48),
                                     (1, 33, 7, 5)])
def test_diag_quadratic_matches_xla(rng, B, T, D, N):
    obs = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(D, N)) ** 2, jnp.float32)
    wl = jnp.asarray(rng.normal(size=(D, N)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    got = diag_quadratic(obs, wq, wl, b,
                         precision=jax.lax.Precision.HIGHEST)
    want = (
        jnp.einsum("btd,dn->btn", obs * obs, wq,
                   precision=jax.lax.Precision.HIGHEST)
        + jnp.einsum("btd,dn->btn", obs, wl,
                     precision=jax.lax.Precision.HIGHEST)
        + b[None, None]
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)


def test_diag_quadratic_supported_bounds():
    assert diag_quadratic_supported(80, 48)
    assert not diag_quadratic_supported(80, 4096)  # N cap
