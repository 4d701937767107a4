"""Pure-NumPy float64 reference implementations (value-exact oracle).

The reference repo's tests are structural only (shapes, normalization,
monotonicity — SURVEY.md §4); we additionally pin values against these
tiny, obviously-correct sequential implementations.
"""

import numpy as np


def logsumexp(x, axis=None):
    m = np.max(x, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    out = np.log(np.sum(np.exp(x - m), axis=axis)) + np.squeeze(m, axis=axis)
    return out


def forward(log_obs, log_a, log_pi):
    """log_obs (T,K); log_a (K,K) or (T,K,K); returns (log_alpha, log_z)."""
    T, K = log_obs.shape
    la = np.zeros((T, K))
    la[0] = log_pi + log_obs[0]
    for t in range(1, T):
        a = log_a[t] if log_a.ndim == 3 else log_a
        la[t] = log_obs[t] + logsumexp(la[t - 1][:, None] + a, axis=0)
    return la, logsumexp(la[-1], axis=0)


def backward(log_obs, log_a):
    T, K = log_obs.shape
    lb = np.zeros((T, K))
    for t in range(T - 2, -1, -1):
        a = log_a[t + 1] if log_a.ndim == 3 else log_a
        lb[t] = logsumexp(a + (log_obs[t + 1] + lb[t + 1])[None, :], axis=1)
    return lb


def posteriors(log_obs, log_a, log_pi):
    la, lz = forward(log_obs, log_a, log_pi)
    lb = backward(log_obs, log_a)
    lg = la + lb
    lg = lg - logsumexp(lg, axis=1)[:, None]
    return np.exp(lg), la, lb, lz


def viterbi(log_obs, log_a, log_pi):
    T, K = log_obs.shape
    delta = np.zeros((T, K))
    psi = np.zeros((T, K), dtype=int)
    delta[0] = log_pi + log_obs[0]
    for t in range(1, T):
        a = log_a[t] if log_a.ndim == 3 else log_a
        scores = delta[t - 1][:, None] + a
        psi[t] = np.argmax(scores, axis=0)
        delta[t] = np.max(scores, axis=0) + log_obs[t]
    path = np.zeros(T, dtype=int)
    path[-1] = np.argmax(delta[-1])
    for t in range(T - 2, -1, -1):
        path[t] = psi[t + 1][path[t + 1]]
    return path, np.max(delta[-1])
