"""Importing the package must not initialize the XLA backend.

``jax.distributed.initialize`` (multi-host setup) demands a pristine
process — any earlier ``jax.devices()`` / ``jax.process_index()`` call
poisons it. The reference runs ``auto_configure()`` at import
(``__init__.py:476-477``); we promise the opposite, and this guards the
promise (a module-level ``get_logger`` call once broke it silently).
"""

import os
import subprocess
import sys


def test_package_import_is_backend_free():
    probe = (
        "import jax\n"
        "import pytorch_hmm_tpu\n"
        "import pytorch_hmm_tpu.parallel\n"
        "assert not jax._src.xla_bridge._backends, "
        "'package import initialized the XLA backend'\n"
        "print('BACKEND_FREE')\n"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "BACKEND_FREE" in r.stdout
