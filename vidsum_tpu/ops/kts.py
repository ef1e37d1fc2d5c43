"""Kernel Temporal Segmentation (KTS) — change-point detection by DP over a
frame-similarity Gram matrix.

Behavior contract (reference: ``src/data/preprocess/segmentations/kts/``):
- :func:`calc_scatters` — ``cpd_nonlin.py:5-24``: scatter of every [i, j]
  window from cumulative sums of the kernel matrix. The reference runs an
  O(n²) Python double loop; here it is one vectorized float64 expression with
  the identical per-element arithmetic (bit-equal results).
- :func:`cpd_nonlin` — ``cpd_nonlin.py:27-91``: DP
  ``I[k, l] = min_t I[k-1, t] + J[t, l-1]`` with segment-length bounds
  [lmin, lmax], sentinel costs 1e101/1e100 and earliest-t tie-breaking,
  plus backtracking. The reference's triple Python loop becomes one
  vectorized candidate matrix per k.
- :func:`kts_segmentation` — ``cpd_auto.py:5-47``: auto-select the change-point
  count by penalized cost ``scores/N + (vmax·ncp/2N)(log(N/ncp)+1)``.
- :func:`calc_scatters_jax` / :func:`cpd_nonlin_jax` — jittable TPU variants
  (``lax.scan`` over k, masked dense candidate matrices) for the on-device
  preprocess path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:  # optional C++ fast path
    from vidsum_tpu.native import calc_scatters_native as _calc_scatters_native
    from vidsum_tpu.native import cpd_dp_native as _cpd_dp_native
except Exception:  # pragma: no cover
    _calc_scatters_native = None
    _cpd_dp_native = None

_HUGE_INIT = 1e101   # "untouched" sentinel (cpd_nonlin.py:62)
_HUGE = 1e100        # "no valid split" sentinel (cpd_nonlin.py:72)


def calc_scatters(K: np.ndarray, use_native: bool = True) -> np.ndarray:
    """scatters[i, j] = unnormalized variance of frames [i..j] (upper tri)."""
    K = np.asarray(K, dtype=np.float64)
    n = K.shape[0]
    if _calc_scatters_native is not None and use_native:
        return _calc_scatters_native(K)
    K1 = np.concatenate([[0.0], np.cumsum(np.diag(K))])
    K2 = np.zeros((n + 1, n + 1))
    K2[1:, 1:] = np.cumsum(np.cumsum(K, 0), 1)

    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    diag_sum = K1[1:][None, :] - K1[:n][:, None]             # K1[j+1]-K1[i]
    block_sum = (np.diag(K2)[1:][None, :] + np.diag(K2)[:n][:, None]
                 - K2[1:, :n].T - K2[:n, 1:])                # K2[j+1,j+1]+K2[i,i]-K2[j+1,i]-K2[i,j+1]
    with np.errstate(divide="ignore", invalid="ignore"):
        scatters = diag_sum - block_sum / (j - i + 1)
    return np.where(j >= i, scatters, 0.0)


def cpd_nonlin(K: np.ndarray, ncp: int, lmin: int = 1, lmax: int = 100000,
               backtrack: bool = True,
               scatters: Optional[np.ndarray] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Best ``ncp`` change points by DP. Returns (cps, objective values).

    ``scores[k]`` is the optimal objective using k change points (inf when
    infeasible), matching the reference's returned ``I[:, n]`` with >1e99
    mapped to inf.
    """
    m = int(ncp)
    n, n1 = K.shape
    assert n == n1, "Kernel matrix awaited."
    assert n >= (m + 1) * lmin
    assert n <= (m + 1) * lmax
    assert lmax >= lmin >= 1

    J = calc_scatters(K) if scatters is None else scatters

    if _cpd_dp_native is not None:
        cps, scores = _cpd_dp_native(np.asarray(J, np.float64), m,
                                     lmin=lmin, lmax=lmax)
        return (cps if backtrack else np.zeros(m, dtype=int)), scores

    I = _HUGE_INIT * np.ones((m + 1, n + 1))
    I[0, lmin:lmax] = J[0, lmin - 1:lmax - 1]

    p = np.zeros((m + 1, n + 1), dtype=int)

    t_idx = np.arange(n + 1)
    for k in range(1, m + 1):
        # cand[t, l] = I[k-1, t] + J[t, l-1] for l in 1..n, t in 0..n-1
        cand = I[k - 1, :n, None] + J[:, :]  # J[t, l-1] → column l-1
        # valid t range for column l: max(k*lmin, l-lmax) <= t <= l-lmin
        l_vals = np.arange(1, n + 1)[None, :]
        t_vals = t_idx[:n, None]
        valid = (t_vals >= np.maximum(k * lmin, l_vals - lmax)) & \
                (t_vals <= l_vals - lmin)
        cand = np.where(valid, cand, np.inf)
        best = cand.min(axis=0)
        argbest = cand.argmin(axis=0)
        improved = best < _HUGE
        # columns with an empty t-range but l >= (k+1)*lmin get the 1e100
        # sentinel; columns below (k+1)*lmin stay untouched at 1e101.
        touched = l_vals[0] >= (k + 1) * lmin
        I[k, 1:][touched] = np.where(improved[touched], best[touched], _HUGE)
        if backtrack:
            p[k, 1:][touched & improved] = argbest[touched & improved]

    cps = np.zeros(m, dtype=int)
    if backtrack:
        cur = n
        for k in range(m, 0, -1):
            cps[k - 1] = p[k, cur]
            cur = cps[k - 1]

    scores = I[:, n].copy()
    scores[scores > 1e99] = np.inf
    return cps, scores


def kts_segmentation(K: np.ndarray, ncp: int, vmax: float, desc_rate: int = 1,
                     **kwargs) -> Tuple[np.ndarray, np.ndarray]:
    """Auto-select change-point count, then backtrack the best segmentation.

    Reference: ``cpd_auto.py:5-47``. Returns (cps, penalized costs for
    0..ncp change points).
    """
    m = int(ncp)
    J = calc_scatters(np.asarray(K, dtype=np.float64))
    _, scores = cpd_nonlin(K, m, backtrack=False, scatters=J, **kwargs)

    N = K.shape[0]
    N2 = N * desc_rate
    penalties = np.zeros(m + 1)
    ncps = np.arange(1, m + 1)
    penalties[1:] = (vmax * ncps / (2.0 * N2)) * (np.log(float(N2) / ncps) + 1)

    costs = scores / float(N) + penalties
    m_best = int(np.argmin(costs))
    cps, _ = cpd_nonlin(K, m_best, scatters=J, **kwargs)
    return cps, costs


def change_points_from_cps(cps: np.ndarray, n_frames: int) -> np.ndarray:
    """Convert change-point indices to inclusive (start, end) shot bounds, the
    ``change_points`` layout the DSNet h5 files carry (dataset.py:96)."""
    bounds = np.concatenate([[0], np.asarray(cps, dtype=np.int64), [n_frames]])
    return np.stack([bounds[:-1], bounds[1:] - 1], axis=1)


# ---------------------------------------------------------------------------
# Jittable TPU variants
# ---------------------------------------------------------------------------

def calc_scatters_jax(K):
    """Jittable scatter matrix; float32 by default (float64 if x64 enabled)."""
    import jax.numpy as jnp

    K = jnp.asarray(K)
    n = K.shape[0]
    K1 = jnp.concatenate([jnp.zeros((1,), K.dtype), jnp.cumsum(jnp.diag(K))])
    K2 = jnp.pad(jnp.cumsum(jnp.cumsum(K, 0), 1), ((1, 0), (1, 0)))
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    diag_sum = K1[1:][None, :] - K1[:n][:, None]
    block_sum = (jnp.diag(K2)[1:][None, :] + jnp.diag(K2)[:n][:, None]
                 - K2[1:, :n].T - K2[:n, 1:])
    scatters = diag_sum - block_sum / (j - i + 1)
    return jnp.where(j >= i, scatters, 0.0)


def _cpd_scan_jax(K, m: int, lmin: int, lmax: int):
    """Shared jittable DP core: ``lax.scan`` over k = 1..m; each step builds
    the masked candidate matrix and takes a column-wise min/argmin
    (earliest-t ties, like the reference). Returns (I0, rows (m, n+1),
    ptrs (m, n+1))."""
    import jax
    import jax.numpy as jnp

    K = jnp.asarray(K)
    n = K.shape[0]
    J = calc_scatters_jax(K)

    big_init = jnp.asarray(_HUGE_INIT, K.dtype)
    big = jnp.asarray(_HUGE, K.dtype)

    I0 = jnp.full((n + 1,), big_init, K.dtype)
    idx = jnp.arange(n + 1)
    # I[0, lmin:lmax] = J[0, lmin-1:lmax-1]
    fill = (idx >= lmin) & (idx < lmax) & (idx - 1 < n)
    I0 = jnp.where(fill, J[0, jnp.clip(idx - 1, 0, n - 1)], I0)

    l_vals = jnp.arange(1, n + 1)[None, :]
    t_vals = jnp.arange(n)[:, None]

    def step(prev_row, k):
        cand = prev_row[:n, None] + J
        valid = ((t_vals >= jnp.maximum(k * lmin, l_vals - lmax))
                 & (t_vals <= l_vals - lmin))
        cand = jnp.where(valid, cand, jnp.inf)
        best = cand.min(axis=0)
        argbest = cand.argmin(axis=0)
        improved = best < big
        touched = l_vals[0] >= (k + 1) * lmin
        new_tail = jnp.where(touched, jnp.where(improved, best, big),
                             prev_row[1:])
        row = jnp.concatenate([prev_row[:1], new_tail])
        ptr = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.where(touched & improved, argbest, 0).astype(jnp.int32)])
        return row, (row, ptr)

    _, (rows, ptrs) = jax.lax.scan(step, I0, jnp.arange(1, m + 1))
    return I0, rows, ptrs


def cpd_nonlin_jax(K, ncp: int, lmin: int = 1, lmax: int = 100000):
    """Jittable DP over a static change-point count. Returns (cps, scores).

    Production wiring: :func:`kts_segmentation_jax` (the raw-video pipeline's
    ``kts_impl="device"``); the float64 host/C++ path stays the preprocess
    parity oracle.
    """
    import jax
    import jax.numpy as jnp

    m = int(ncp)
    K = jnp.asarray(K)
    n = K.shape[0]

    if m == 0:
        I0, _, _ = _cpd_scan_jax(K, 0, lmin, lmax)
        return jnp.zeros((0,), jnp.int32), I0[n:n + 1]

    I0, rows, ptrs = _cpd_scan_jax(K, m, lmin, lmax)

    def backtrack(cur, k_rev):
        cp = ptrs[k_rev, cur]
        return cp, cp

    _, cps_rev = jax.lax.scan(backtrack, jnp.asarray(n, jnp.int32),
                              jnp.arange(m - 1, -1, -1))
    cps = cps_rev[::-1]
    scores = jnp.concatenate([I0[n:n + 1], rows[:, n]])
    scores = jnp.where(scores > 1e99, jnp.inf, scores)
    return cps, scores


def kts_segmentation_jax(K, ncp: int, vmax: float, desc_rate: int = 1,
                         lmin: int = 1, lmax: int = 100000):
    """Fully on-device auto-KTS: one jitted program runs the DP scan once,
    selects the penalized-cost-optimal change-point count (``cpd_auto.py:
    5-47`` semantics), and backtracks that count from the saved pointer
    table with a masked fixed-length scan (no second DP, no recompile per
    selected count — unlike the host path, which re-runs the DP).

    Returns ``(cps (ncp,), m_best, costs (ncp+1,))``; only ``cps[:m_best]``
    is meaningful. Arithmetic is f32 on device (f64 if x64 is enabled); the
    float64 host/C++ path remains the parity oracle for dataset preprocess.
    """
    import jax.numpy as jnp
    from jax import lax

    m = int(ncp)
    K = jnp.asarray(K)
    n = K.shape[0]
    I0, rows, ptrs = _cpd_scan_jax(K, m, lmin, lmax)

    scores = jnp.concatenate([I0[n:n + 1], rows[:, n]])
    scores = jnp.where(scores > 1e99, jnp.inf, scores)

    N2 = n * desc_rate
    ncps = jnp.arange(1, m + 1, dtype=K.dtype)
    pen = (vmax * ncps / (2.0 * N2)) * (jnp.log(jnp.asarray(float(N2),
                                                            K.dtype) / ncps)
                                        + 1.0)
    costs = scores / float(n) + jnp.concatenate(
        [jnp.zeros((1,), K.dtype), pen])
    m_best = jnp.argmin(costs).astype(jnp.int32)

    def backtrack(cur, k_rev):
        active = k_rev < m_best
        cp = jnp.where(active, ptrs[k_rev, cur], cur)
        return cp, jnp.where(active, cp, 0)

    _, cps_rev = lax.scan(backtrack, jnp.asarray(n, jnp.int32),
                          jnp.arange(m - 1, -1, -1))
    return cps_rev[::-1], m_best, costs
