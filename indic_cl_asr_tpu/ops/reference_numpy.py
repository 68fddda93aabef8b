"""Pure-NumPy reference implementations of the transducer lattice.

Test oracles, mirroring the role of the reference's rnnt_numpy
(reference: NeMo parts/numba/rnnt_loss/rnnt_numpy.py, used by
tests/.../test_rnnt_pytorch.py — SURVEY.md §4). Written from the RNN-T
recurrences (Graves 2012), not translated from the reference code.
"""

from __future__ import annotations

import numpy as np


def _logsumexp(vals):
    vals = [v for v in vals if v != -np.inf]
    if not vals:
        return -np.inf
    m = max(vals)
    return m + np.log(sum(np.exp(v - m) for v in vals))


def rnnt_forward_np(log_probs: np.ndarray, labels, blank: int) -> tuple:
    """log_probs: [T, U+1, V] log-softmaxed; labels: [U] ints.
    Returns (nll, alpha [T, U+1])."""
    T, U1, _ = log_probs.shape
    U = U1 - 1
    assert len(labels) == U
    alpha = np.full((T, U1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U1):
            if t == 0 and u == 0:
                continue
            terms = []
            if t > 0:
                terms.append(alpha[t - 1, u] + log_probs[t - 1, u, blank])
            if u > 0:
                terms.append(
                    alpha[t, u - 1] + log_probs[t, u - 1, labels[u - 1]]
                )
            alpha[t, u] = _logsumexp(terms)
    nll = -(alpha[T - 1, U] + log_probs[T - 1, U, blank])
    return nll, alpha


def rnnt_backward_np(log_probs: np.ndarray, labels, blank: int) -> np.ndarray:
    """beta [T, U+1]: log prob of completing from (t, u)."""
    T, U1, _ = log_probs.shape
    U = U1 - 1
    beta = np.full((T, U1), -np.inf)
    beta[T - 1, U] = log_probs[T - 1, U, blank]
    for t in range(T - 1, -1, -1):
        for u in range(U, -1, -1):
            if t == T - 1 and u == U:
                continue
            terms = []
            if t < T - 1:
                terms.append(beta[t + 1, u] + log_probs[t, u, blank])
            if u < U:
                terms.append(beta[t, u + 1] + log_probs[t, u, labels[u]])
            beta[t, u] = _logsumexp(terms)
    return beta


def rnnt_grad_np(log_probs: np.ndarray, labels, blank: int) -> np.ndarray:
    """d(nll)/d(log_probs): occupancy formula."""
    T, U1, V = log_probs.shape
    U = U1 - 1
    _, alpha = rnnt_forward_np(log_probs, labels, blank)
    beta = rnnt_backward_np(log_probs, labels, blank)
    logZ = beta[0, 0]
    grad = np.zeros_like(log_probs)
    for t in range(T):
        for u in range(U1):
            # blank transition (t, u) -> (t+1, u); terminal exits at corner
            if t < T - 1:
                grad[t, u, blank] -= np.exp(
                    alpha[t, u] + log_probs[t, u, blank] + beta[t + 1, u] - logZ
                )
            elif u == U:
                grad[t, u, blank] -= np.exp(
                    alpha[t, u] + log_probs[t, u, blank] - logZ
                )
            # label transition (t, u) -> (t, u+1)
            if u < U:
                grad[t, u, labels[u]] -= np.exp(
                    alpha[t, u]
                    + log_probs[t, u, labels[u]]
                    + beta[t, u + 1]
                    - logZ
                )
    return grad


def rnnt_loss_brute_force(log_probs: np.ndarray, labels, blank: int) -> float:
    """Enumerate every monotonic alignment (tiny cases only)."""
    T, U1, _ = log_probs.shape
    U = U1 - 1

    def walk(t, u):
        if t == T - 1 and u == U:
            return log_probs[t, u, blank]
        branches = []
        if t < T - 1:
            branches.append(log_probs[t, u, blank] + walk(t + 1, u))
        if u < U:
            branches.append(log_probs[t, u, labels[u]] + walk(t, u + 1))
        return _logsumexp(branches)

    return -walk(0, 0)


def ctc_loss_np(log_probs: np.ndarray, labels, blank: int) -> float:
    """Standard CTC forward (per-sample NLL). log_probs: [T, V]."""
    T, _ = log_probs.shape
    ext = []
    for l in labels:
        ext.extend([blank, l])
    ext.append(blank)
    S = len(ext)
    alpha = np.full((T, S), -np.inf)
    alpha[0, 0] = log_probs[0, ext[0]]
    if S > 1:
        alpha[0, 1] = log_probs[0, ext[1]]
    for t in range(1, T):
        for s in range(S):
            terms = [alpha[t - 1, s]]
            if s > 0:
                terms.append(alpha[t - 1, s - 1])
            if s > 1 and ext[s] != blank and ext[s] != ext[s - 2]:
                terms.append(alpha[t - 1, s - 2])
            alpha[t, s] = _logsumexp(terms) + log_probs[t, ext[s]]
    return -_logsumexp([alpha[T - 1, S - 1], alpha[T - 1, S - 2]])
