"""Basic tutorial (reference: ``examples/basic_tutorial.py`` — 6 parts).

Run: python examples/basic_tutorial.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

import pytorch_hmm_tpu as ph


def tutorial_1_basic_hmm():
    """Build an HMM, decode, inspect posteriors."""
    print("\n=== Tutorial 1: Basic HMM ===")
    P = ph.create_left_to_right_matrix(5, self_loop_prob=0.7)
    hmm = ph.HMM(P)
    obs = jax.random.uniform(jax.random.PRNGKey(0), (50, 5))
    posteriors, alpha, beta = hmm.forward_backward(obs)
    states, score = hmm.viterbi_decode(obs)
    print(f"posterior row sums: {np.asarray(posteriors.sum(-1))[:3]}")
    print(f"viterbi path head: {np.asarray(states)[:10]}  score={score:.2f}")


def tutorial_2_fb_vs_viterbi():
    """Soft posteriors vs hard alignment."""
    print("\n=== Tutorial 2: Forward-backward vs Viterbi ===")
    hmm = ph.HMM(ph.create_left_to_right_matrix(4))
    obs = jax.random.uniform(jax.random.PRNGKey(1), (30, 4))
    post, _, _ = hmm.forward_backward(obs)
    soft = jnp.argmax(post, axis=-1)
    hard, _ = hmm.viterbi_decode(obs)
    agree = float(jnp.mean((soft == hard).astype(jnp.float32)))
    print(f"posterior-argmax vs Viterbi agreement: {agree:.1%}")


def tutorial_3_hmm_layer_training():
    """HMMLayer inside a TTS-like model, trained with optax."""
    print("\n=== Tutorial 3: Training an HMMLayer ===")
    layer = ph.HMMLayer(num_states=6, rngs=nnx.Rngs(0))
    data = jax.random.normal(jax.random.PRNGKey(2), (4, 40, 6))

    graphdef, params, rest = nnx.split(layer, nnx.Param, ...)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            m = nnx.merge(graphdef, p, rest)
            return m.compute_loss(data)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(20):
        params, opt_state, loss = step(params, opt_state)
        if i % 5 == 0:
            print(f"  step {i}: loss {float(loss):.4f}")


def tutorial_4_batch_processing():
    """Batched decode is a single vectorized call."""
    print("\n=== Tutorial 4: Batch processing ===")
    model = ph.MixtureGaussianHMMLayer(8, 40, 3, rngs=nnx.Rngs(0))
    batch = jax.random.normal(jax.random.PRNGKey(3), (16, 100, 40))
    states, scores = model(batch, return_log_probs=True)
    print(f"decoded {states.shape} paths, mean score {float(scores.mean()):.1f}")


def tutorial_5_devices_and_sharding():
    """Device placement is JAX sharding, not .to(device)."""
    print("\n=== Tutorial 5: Devices & sharding ===")
    print(f"backend: {jax.default_backend()}, devices: {jax.device_count()}")
    if jax.device_count() >= 2:
        from pytorch_hmm_tpu.parallel import make_mesh, sharded_viterbi
        mesh = make_mesh(data=1, time=2)
        K = 6
        rng = np.random.default_rng(0)
        lo = jnp.asarray(rng.normal(size=(2, 64, K)), jnp.float32)
        la = jnp.log(jnp.asarray(rng.dirichlet(np.ones(K), size=K), jnp.float32))
        lp = jnp.log(jnp.full((K,), 1 / K))
        states, score = sharded_viterbi(lo, la, lp, mesh)
        print(f"time-sharded Viterbi over 2 devices: {states.shape}")
    else:
        print("single device — see pytorch_hmm_tpu.parallel for meshes")


def tutorial_6_real_world():
    """Forced alignment + duration extraction for a TTS front-end."""
    print("\n=== Tutorial 6: A real-world flow ===")
    num_phonemes, T = 8, 120
    model = ph.GaussianHMMLayer(num_phonemes, 40, rngs=nnx.Rngs(0)).eval()
    mel = jax.random.normal(jax.random.PRNGKey(4), (T, 40))
    path, score = model.hmm_layer.align(
        jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(5), (T, num_phonemes)))
    )
    durations = ph.compute_state_durations(path)
    print(f"alignment score {float(score):.1f}; durations {np.asarray(durations)}")


if __name__ == "__main__":
    tutorial_1_basic_hmm()
    tutorial_2_fb_vs_viterbi()
    tutorial_3_hmm_layer_training()
    tutorial_4_batch_processing()
    tutorial_5_devices_and_sharding()
    tutorial_6_real_world()
    print("\nAll tutorials finished.")
