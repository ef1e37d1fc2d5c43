"""Tiny, deliberately-naive pure-Python oracles transcribing the *behavior*
of the reference pipeline (see SURVEY.md §2.4 for the semantics each one
mirrors). Used to check the vectorized implementations bit-for-bit."""

from __future__ import annotations

import numpy as np


def knapsack_oracle(W, wt, val):
    """Textbook O(n·W) 0/1 knapsack with Python-float table and ascending
    backtracked indices (semantics of knapsack_implementation.py:1-30)."""
    n = len(wt)
    table = [[0.0] * (W + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for w in range(W + 1):
            if wt[i - 1] <= w:
                take = val[i - 1] + table[i - 1][w - wt[i - 1]]
                table[i][w] = take if take >= table[i - 1][w] else table[i - 1][w]
            else:
                table[i][w] = table[i - 1][w]
    chosen = []
    w = W
    for i in range(n, 0, -1):
        if table[i][w] != table[i - 1][w]:
            chosen.append(i - 1)
            w -= wt[i - 1]
    chosen.reverse()
    return chosen


def upsample_oracle(scores, n_frames, positions):
    """Step-function upsample (semantics of compute_metrics.py:19-39)."""
    out = np.zeros(n_frames, dtype=np.float32)
    pos = list(positions.astype(np.int64))
    if pos[-1] != n_frames:
        pos = pos + [n_frames]
    for i in range(len(pos) - 1):
        v = 0.0 if i >= len(scores) else float(scores[i])
        out[pos[i]:pos[i + 1]] = v
    return out


def scatters_oracle(K):
    """O(n²) double-loop scatter matrix (semantics of cpd_nonlin.py:5-24)."""
    n = K.shape[0]
    K1 = np.cumsum([0.0] + list(np.diag(K)))
    K2 = np.zeros((n + 1, n + 1))
    K2[1:, 1:] = np.cumsum(np.cumsum(K, 0), 1)
    out = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            out[i, j] = K1[j + 1] - K1[i] - (
                K2[j + 1, j + 1] + K2[i, i] - K2[j + 1, i] - K2[i, j + 1]
            ) / (j - i + 1)
    return out


def cpd_oracle(K, m, lmin=1, lmax=100000):
    """Triple-loop change-point DP with backtracking (semantics of
    cpd_nonlin.py:27-91). Returns (cps, scores)."""
    n = K.shape[0]
    J = scatters_oracle(K)
    I = 1e101 * np.ones((m + 1, n + 1))
    I[0, lmin:lmax] = J[0, lmin - 1:lmax - 1]
    p = np.zeros((m + 1, n + 1), dtype=int)
    for k in range(1, m + 1):
        for l in range((k + 1) * lmin, n + 1):
            I[k, l] = 1e100
            for t in range(max(k * lmin, l - lmax), l - lmin + 1):
                c = I[k - 1, t] + J[t, l - 1]
                if c < I[k, l]:
                    I[k, l] = c
                    p[k, l] = t
    cps = np.zeros(m, dtype=int)
    cur = n
    for k in range(m, 0, -1):
        cps[k - 1] = p[k, cur]
        cur = cps[k - 1]
    scores = I[:, n].copy()
    scores[scores > 1e99] = np.inf
    return cps, scores
