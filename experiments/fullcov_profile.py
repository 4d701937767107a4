"""Where do the ~0.5 ms of full-covariance GMM decode go?

Components at the flagship shape (B=32, T=1000, S=12, C=4, D=80):
  decode          — the full auto_gmm_viterbi path
  emission        — gmm_log_probs(covariance_type='full') alone
  prologue        — tril_inverse + prec/pm/mm einsums alone (K·C=48 tiny mats)
  trellis         — smallk_viterbi on precomputed (B, T, S) log-obs
  xpx             — the 3-operand einsum alone on prepared prec
Run on the real chip:  python experiments/fullcov_profile.py
"""
import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pytorch_hmm_tpu.profiling import device_time
from pytorch_hmm_tpu.models import MixtureGaussianHMMLayer
from pytorch_hmm_tpu import ops
from pytorch_hmm_tpu.emissions import (
    gmm_log_probs, full_gaussian_log_probs, tril_inverse, tril_from_flat,
)

B, T, S, C, D = 32, 1000, 12, 4, 80
key = jax.random.PRNGKey(0)
model = MixtureGaussianHMMLayer(
    num_states=S, feature_dim=D, num_components=C,
    covariance_type="full", rngs=nnx.Rngs(0),
)
gd, st = nnx.split(model)
obs = jax.random.normal(key, (B, T, D), jnp.float32)

means = model.means[...]
cov = model.cov_params[...]
log_w = jax.nn.log_softmax(model.mixture_weights_logits[...], axis=-1)
log_a = model._log_a()
log_pi = model._log_pi()


def decode(o):
    m = nnx.merge(gd, st)
    s_, sc = m(o, return_log_probs=True)
    return sc + s_[:, -1].astype(jnp.float32)

def emission(o):
    return gmm_log_probs(o, means, cov, log_w, "full")

lo = jax.jit(emission)(obs)
lo = jax.block_until_ready(lo)

def trellis(x):
    return ops.smallk_viterbi(x, log_a, log_pi)[1]

# prologue: what runs before the big einsum, per call
chol = tril_from_flat(cov.reshape(S * C, -1), D)

def prologue(ch):
    ic = tril_inverse(ch)
    prec = jnp.einsum("ked,kef->kdf", ic, ic)
    mu = means.reshape(S * C, D)
    pm = jnp.einsum("kde,ke->kd", prec, mu)
    return prec.sum() + pm.sum()

ic0 = tril_inverse(chol)
prec0 = jnp.einsum("ked,kef->kdf", ic0, ic0)
prec0 = jax.block_until_ready(prec0)

def xpx_only(o):
    y = jnp.einsum(
        "btd,kde,bte->btk", o, prec0, o,
        preferred_element_type=jnp.float32,
    )
    return jnp.sum(y, axis=-1)

for name, fn, arg in [
    ("decode", decode, obs),
    ("emission", emission, obs),
    ("trellis", trellis, lo),
    ("prologue", prologue, chol),
    ("xpx", xpx_only, obs),
]:
    ts = [device_time(fn, arg, reps=24) * 1e3 for _ in range(3)]
    print(f"{name:10s} {min(ts):7.4f} ms   (3 runs: {[round(t,4) for t in ts]})")
