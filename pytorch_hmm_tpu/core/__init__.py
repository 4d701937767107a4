"""Core semiring DP primitives — the single kernel layer every model uses.

Design note: the reference re-implements Viterbi four times and
forward-backward three times across its model files (SURVEY.md §1). This
package factors all of that into one set of log-space scan primitives,
parameterized by static or time-varying transition tensors.
"""

from .semiring import (
    LOG_ZERO,
    log_matmul,
    log_matvec,
    log_matvec_t,
    logsumexp,
    max_matmul,
    max_matvec,
    normalize_log,
    safe_log,
)
from .fb import (
    backward_log,
    forward_backward,
    forward_log,
    log_likelihood,
    xi_expectations,
)
from .viterbi import viterbi, viterbi_associative
from .sample import sample_one_hot, sample_states

__all__ = [
    "LOG_ZERO",
    "log_matmul",
    "log_matvec",
    "log_matvec_t",
    "logsumexp",
    "max_matmul",
    "max_matvec",
    "normalize_log",
    "safe_log",
    "backward_log",
    "forward_backward",
    "forward_log",
    "log_likelihood",
    "xi_expectations",
    "viterbi",
    "viterbi_associative",
    "sample_one_hot",
    "sample_states",
]
