"""Worker process for the two-process multihost smoke test.

Launched by ``test_parallel.py::test_multihost_two_process_smoke`` with
argv: ``coordinator_address process_id``. Each process owns 2 virtual
CPU devices → a 4-device global mesh across 2 "hosts". Drives
``initialize_multihost`` + ``global_mesh`` + a sharded forward pass on a
globally-sharded array, and prints the resulting likelihoods for the
parent to cross-check against the single-process oracle.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from pytorch_hmm_tpu.parallel import (  # noqa: E402
    DATA_AXIS,
    TIME_AXIS,
    global_mesh,
    initialize_multihost,
    sharded_log_likelihood,
)


def main():
    coordinator, process_id = sys.argv[1], int(sys.argv[2])
    info = initialize_multihost(
        coordinator_address=coordinator,
        num_processes=2,
        process_id=process_id,
    )
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 4, info

    mesh = global_mesh()  # (data=2 hosts, time=2 local devices)
    assert mesh.shape == {DATA_AXIS: 2, TIME_AXIS: 2}, mesh.shape

    # Deterministic problem, identical on both processes.
    rng = np.random.default_rng(0)
    B, T, K = 4, 32, 3
    log_obs = rng.normal(size=(B, T, K)).astype(np.float32)
    log_a = np.log(rng.dirichlet(np.ones(K), size=K)).astype(np.float32)
    log_pi = np.log(rng.dirichlet(np.ones(K))).astype(np.float32)

    sharding = NamedSharding(mesh, P(DATA_AXIS, TIME_AXIS, None))
    global_obs = jax.make_array_from_callback(
        log_obs.shape, sharding, lambda idx: log_obs[idx]
    )
    lz = sharded_log_likelihood(
        global_obs, jnp.asarray(log_a), jnp.asarray(log_pi), mesh
    )
    vals = np.asarray(
        multihost_utils.process_allgather(lz, tiled=True)
    ).reshape(-1)[:B]
    print("MULTIHOST_OK", " ".join(f"{v:.6f}" for v in vals), flush=True)


if __name__ == "__main__":
    main()
