"""Test configuration: force an 8-device virtual CPU platform.

Multi-device sharding tests run on a virtual CPU mesh (no pod needed),
per the framework's test strategy (SURVEY.md §4): sharded results must
match single-device results exactly.

Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The CPU suite verifies semantics, not codegen: skipping XLA's
# expensive optimization passes cuts suite wall-clock ~30% without
# changing any result (the optimized path is exercised on real TPU by
# bench.py / the hardware lane). PYTORCH_HMM_TPU_FULL_OPT=1 restores
# full optimization.
if os.environ.get("PYTORCH_HMM_TPU_FULL_OPT") != "1":
    os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The execution environment's sitecustomize force-registers a TPU backend
# and resets jax_platforms; override it AFTER import so tests run on the
# virtual 8-device CPU platform regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(42)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches():
    """Drop compiled executables between test modules.

    The full suite compiles hundreds of distinct programs; keeping them
    all live has pushed the process past 5 GB and (rarely) segfaulted
    the XLA CPU compiler under memory pressure. Modules don't share
    shapes, so this costs nothing.
    """
    yield
    jax.clear_caches()
