"""Subprocess worker for the elastic restart-from-checkpoint drill.

Trains a small GaussianHMMLayer on a deterministic synthetic batch
stream. ``--crash-at k`` hard-kills the process (``os._exit(1)``) right
after completing step k — simulating preemption — so the parent test can
relaunch it and check that resume + finish equals an uninterrupted run.

``--hang-at k`` replaces step k with an infinite sleep under a 2-second
step watchdog, checking the fail-fast path (expected exit code 13).

Prints the final loss and a hash of the final params on success.
"""

import argparse
import hashlib
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytorch_hmm_tpu.models import GaussianHMMLayer
from pytorch_hmm_tpu.parallel.elastic import ElasticTrainer, Watchdog


def batches(n_steps: int, B=4, T=20, D=8):
    for i in range(n_steps):
        key = jax.random.PRNGKey(1000 + i)
        yield jax.random.normal(key, (B, T, D), jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--save-every", type=int, default=3)
    ap.add_argument("--crash-at", type=int, default=None)
    ap.add_argument("--hang-at", type=int, default=None)
    args = ap.parse_args()

    model = GaussianHMMLayer(num_states=5, feature_dim=8, rngs=nnx.Rngs(0))
    trainer = ElasticTrainer(
        model,
        optax.adam(1e-2),
        lambda m, batch: m.compute_loss(batch),
        args.ckpt_dir,
        save_every=args.save_every,
        step_timeout_s=2.0 if args.hang_at is not None else None,
    )

    loss = float("nan")
    for i, batch in enumerate(batches(args.steps)):
        if i < trainer.step:
            continue
        if args.hang_at is not None and i == args.hang_at:
            with Watchdog(2.0, label=f"hang step {i}"):
                time.sleep(60)  # watchdog fires -> os._exit(13)
        loss = trainer.train_step(batch)
        if args.crash_at is not None and i + 1 == args.crash_at:
            os._exit(1)  # simulated preemption: no cleanup, no final save

    leaves = jax.tree.leaves(trainer._params)
    digest = hashlib.sha256(
        b"".join(np.asarray(x).tobytes() for x in leaves)
    ).hexdigest()
    print(f"FINAL loss={loss:.10f} params={digest} step={trainer.step}")


if __name__ == "__main__":
    main()
