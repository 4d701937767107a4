"""Structured logging for training / serving runs.

The reference logs with ``print`` + emoji and ``warnings.warn``
(SURVEY.md §5 "Metrics / logging"). Here: a standard-library logger with
a compact structured formatter, a metrics emitter that writes JSON-lines
(one record per step — trivially ingestible by any log pipeline), and a
multi-host guard so only process 0 emits by default.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import Any, Dict, Optional

import jax

__all__ = ["get_logger", "MetricsLogger"]

_FORMAT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"


class _MainProcessFilter(logging.Filter):
    """Demote sub-INFO records on non-zero processes — lazily.

    The process check runs at *emit* time, guarded by the public
    ``jax.distributed.is_initialized()`` (which never initializes the
    XLA backend itself): calling ``jax.process_index()`` eagerly would
    initialize the backend, which must not happen at import time
    (``jax.distributed.initialize`` requires a pristine process).
    """

    def filter(self, record: logging.LogRecord) -> bool:
        if record.levelno >= logging.WARNING:
            return True
        try:
            if not jax.distributed.is_initialized():
                return True  # single-process run: always process 0
            return jax.process_index() == 0
        except RuntimeError:  # pragma: no cover - uninitialized distributed
            return True


def get_logger(
    name: str = "pytorch_hmm_tpu",
    level: int = logging.INFO,
    all_processes: bool = False,
) -> logging.Logger:
    """Framework logger. On multi-host runs, non-zero processes log
    WARNING+ only (pass ``all_processes=True`` to override). Safe to
    call at import time: the multi-host check is deferred to emit time
    so it never initializes the XLA backend itself."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, "%H:%M:%S"))
        logger.addHandler(handler)
        logger.propagate = False
    logger.setLevel(level)
    has_filter = any(
        isinstance(f, _MainProcessFilter) for f in logger.filters
    )
    if all_processes:
        for f in list(logger.filters):
            if isinstance(f, _MainProcessFilter):
                logger.removeFilter(f)
    elif not has_filter:
        logger.addFilter(_MainProcessFilter())
    return logger


class MetricsLogger:
    """JSON-lines metrics sink.

    >>> m = MetricsLogger("/tmp/run/metrics.jsonl")
    >>> m.log(step=10, loss=1.23, lr=1e-3)

    Values are coerced to plain floats/ints (device scalars are pulled to
    host); each record carries a wall-clock timestamp.
    """

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._fh = open(path, "a") if path else None
        self._logger = get_logger("pytorch_hmm_tpu.metrics")

    @staticmethod
    def _coerce(v: Any):
        if hasattr(v, "item"):
            try:
                return v.item()
            except Exception:  # pragma: no cover
                return str(v)
        return v

    def log(self, **metrics) -> Dict[str, Any]:
        record = {"time": time.time()}
        record.update({k: self._coerce(v) for k, v in metrics.items()})
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self.echo:
            body = " ".join(
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items() if k != "time"
            )
            self._logger.info(body)
        return record

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
