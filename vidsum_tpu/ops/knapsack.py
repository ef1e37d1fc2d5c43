"""0/1 knapsack shot selection.

Behavior contract (reference: ``src/evaluation/knapsack_implementation.py:1-30``):
given capacity ``W`` (frames), shot lengths ``wt``, shot values ``val`` (Python
floats there), build the classic DP table with ``max(val[i-1]+K[i-1][w-wt], K[i-1][w])``
and backtrack with the strict inequality ``K[i][w] != K[i-1][w]``, emitting
selected shot indices in ascending order.

Two implementations:

- :func:`knapsack` — vectorized NumPy float64 DP. Each table entry is produced
  by the *same* float64 add/compare as the reference's Python-float loop, so
  the selected set is bit-for-bit identical (the BASELINE.json north star's
  "output parity preserved bit-for-bit in selected shots").
- :func:`knapsack_jax` — a jittable ``lax.scan`` formulation for on-device
  selection (used by the fused TPU eval path; same float64-per-step math when
  x64 is enabled, float32 otherwise).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

try:  # optional C++ fast path (vidsum_tpu/native); falls back to NumPy
    from vidsum_tpu.native import knapsack_native as _knapsack_native
except Exception:  # pragma: no cover - native lib not built
    _knapsack_native = None


def knapsack(W: int, wt: Sequence[int], val: Sequence[float],
             use_native: bool = True) -> List[int]:
    """Select shot indices maximizing total value under a frame budget.

    Bit-identical to the reference DP: float64 table, `max` tie keeps the
    first operand, backtrack strict `!=` comparison.
    """
    n = len(wt)
    W = int(W)
    if W < 0:
        raise ValueError("negative knapsack capacity")
    wt_arr = np.asarray(wt, dtype=np.int64)
    val_arr = np.asarray(val, dtype=np.float64)
    if wt_arr.shape != val_arr.shape:
        raise ValueError("wt and val must have equal length")
    if n and wt_arr.min() < 0:
        raise ValueError("negative shot length")
    if n and not np.isfinite(val_arr).all():
        # NaN values poison the backtrack (NaN != NaN selects every shot and
        # drives the capacity negative) — fail loudly instead.
        raise ValueError("non-finite shot value")

    if _knapsack_native is not None and use_native:
        return _knapsack_native(W, wt_arr, val_arr)

    # K[i] = best value with first i shots; rows kept for backtracking.
    K = np.zeros((n + 1, W + 1), dtype=np.float64)
    for i in range(1, n + 1):
        w_i = int(wt_arr[i - 1])
        prev = K[i - 1]
        row = prev.copy()
        if w_i <= W:
            cand = val_arr[i - 1] + prev[: W + 1 - w_i]
            np.maximum(cand, prev[w_i:], out=row[w_i:])
        K[i] = row

    selected: List[int] = []
    w = W
    for i in range(n, 0, -1):
        if K[i, w] != K[i - 1, w]:
            selected.insert(0, i - 1)
            w -= int(wt_arr[i - 1])
    return selected


def knapsack_jax(W: int, wt, val, budget=None):
    """Jittable knapsack: returns a boolean selection mask of shape (n,).

    ``W`` must be static (table width is a shape); ``budget`` is an optional
    *dynamic* capacity <= W for bucketed shapes (defaults to W). DP rows
    stream through a ``lax.scan`` over shots; the backtrack is a reverse scan
    over the saved rows. Zero-weight/zero-value padding rows are never
    selected (``rows[i+1, w] == rows[i, w]``). This is the DP behind the
    ``eval_impl="device"`` path (:mod:`vidsum_tpu.ops.device_eval`); the
    NumPy/C++ float64 path remains the bit-parity oracle.
    """
    import jax
    import jax.numpy as jnp

    wt = jnp.asarray(wt, dtype=jnp.int32)
    val = jnp.asarray(val)
    n = wt.shape[0]
    Wp1 = int(W) + 1
    cols = jnp.arange(Wp1)

    def forward(prev_row, x):
        w_i, v_i = x
        # cand[w] = v_i + prev[w - w_i] where w >= w_i else -inf
        shifted = jnp.where(cols >= w_i,
                            v_i + prev_row[jnp.clip(cols - w_i, 0, Wp1 - 1)],
                            -jnp.inf)
        row = jnp.maximum(shifted, prev_row)
        return row, row

    row0 = jnp.zeros((Wp1,), dtype=val.dtype)
    _, rows = jax.lax.scan(forward, row0, (wt, val))
    rows = jnp.concatenate([row0[None], rows], axis=0)  # (n+1, W+1)

    def backward(w, i):
        take = rows[i + 1, w] != rows[i, w]
        w_next = jnp.where(take, w - wt[i], w)
        return w_next, take

    start = (jnp.asarray(W, jnp.int32) if budget is None
             else jnp.clip(budget, 0, W).astype(jnp.int32))
    _, taken_rev = jax.lax.scan(backward, start,
                                jnp.arange(n - 1, -1, -1))
    return taken_rev[::-1]
