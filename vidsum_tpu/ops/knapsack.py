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

    Tie safety (VERDICT r1 #6): the table is accumulated in double-float
    (two-f32, :mod:`vidsum_tpu.ops.df32`, ~2^-47 relative) instead of f32.
    The reference DP keys selection on float64 value *equality* during the
    backtrack; f32 accumulation measurably flips it beyond ~100 shots
    (41/111 mismatches on the tiny-shots fuzz flavor), df32 measures zero
    across the 10k-video fuzz. Ties are resolved exactly like the
    reference: ``max(include, keep)`` prefers include on equality (Python
    ``max`` returns its first argument), realized here as ``df_ge``.
    """
    import jax
    import jax.numpy as jnp

    from vidsum_tpu.ops.df32 import df_add, df_ge, df_neq

    wt = jnp.asarray(wt, dtype=jnp.int32)
    val = jnp.asarray(val, dtype=jnp.float32)
    n = wt.shape[0]
    Wp1 = int(W) + 1
    cols = jnp.arange(Wp1)

    def forward(prev, x):
        ph, pl = prev
        w_i, v_i = x
        # include[w] = v_i + prev[w - w_i] (only meaningful where w >= w_i;
        # elsewhere the reference keeps K[i-1][w], mirrored by `can`)
        idx = jnp.clip(cols - w_i, 0, Wp1 - 1)
        ih, il = df_add(v_i, jnp.float32(0.0), ph[idx], pl[idx])
        can = cols >= w_i
        use_inc = can & df_ge(ih, il, ph, pl)
        rh = jnp.where(use_inc, ih, ph)
        rl = jnp.where(use_inc, il, pl)
        return (rh, rl), (rh, rl)

    row0 = (jnp.zeros((Wp1,), jnp.float32), jnp.zeros((Wp1,), jnp.float32))
    _, (rows_h, rows_l) = jax.lax.scan(forward, row0, (wt, val))
    rows_h = jnp.concatenate([row0[0][None], rows_h], axis=0)  # (n+1, W+1)
    rows_l = jnp.concatenate([row0[1][None], rows_l], axis=0)

    def backward(w, i):
        take = df_neq(rows_h[i + 1, w], rows_l[i + 1, w],
                      rows_h[i, w], rows_l[i, w])
        w_next = jnp.where(take, w - wt[i], w)
        return w_next, take

    start = (jnp.asarray(W, jnp.int32) if budget is None
             else jnp.clip(budget, 0, W).astype(jnp.int32))
    _, taken_rev = jax.lax.scan(backward, start,
                                jnp.arange(n - 1, -1, -1))
    return taken_rev[::-1]
