"""Opt-in fully on-device summary generation (``eval_impl="device"``).

One jitted XLA program per shape bucket runs the whole summary pipeline of
``src/evaluation/generate_summary.py:6-57`` on the accelerator: score
upsampling (gather via searchsorted — exact, no arithmetic), per-shot mean
importance (f32 cumulative sums), the 0/1-knapsack DP over shots
(:func:`vidsum_tpu.ops.knapsack.knapsack_jax` semantics with a *dynamic*
budget inside a static table width), and the binary frame summary.

Parity contract (honest): the HOST pipeline (``ops/summary.py`` + float64
NumPy/C++ DP) is the bit-parity oracle used for reported metrics. This
device path reproduces its selected shots exactly on every fixture we test
(see tests/test_device_eval.py, including the golden file), but its shot
means are sequential-f32 reductions rather than NumPy's pairwise-f32
``.mean()`` and its DP compares f32 rather than float64 sums, so an
adversarial near-tie (two shot subsets whose values agree to ~2^-24
relative) could in principle select differently. Use it for in-training
monitoring and single-fetch eval loops; final numbers come from the host
path. The budget is computed host-side in float64 (``int((end+1)*ratio)``,
reference generate_summary.py:46) and passed in, so the one genuinely
float64-sensitive rounding matches by construction.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np


def _bucket(n: int, step: int = 128) -> int:
    return max(step, -(-n // step) * step)


@functools.lru_cache(maxsize=None)
def _make_kernel(P: int, F: int, S: int, W: int):
    """Jitted summary program for a (picks, frames, shots, table-width)
    shape bucket. Returns fn(scores, picks, n_picks, cps, n_shots, n_frames,
    budget) -> (summary (F,) int8, taken (S,) bool)."""
    import jax
    import jax.numpy as jnp

    def kernel(scores, picks, n_picks, cps, n_shots, n_frames, budget):
        # --- upsample (compute_metrics.py:19-39): frame f takes scores[j],
        # j = index of the pick segment containing f; 0 past the last pick.
        # Assumes sorted picks (true of every DSNet h5; the host path also
        # handles non-monotonic picks and stays the oracle).
        pos = jnp.where(jnp.arange(P) < n_picks, picks, jnp.iinfo(jnp.int32).max)
        f_idx = jnp.arange(F, dtype=jnp.int32)
        j = jnp.searchsorted(pos, f_idx, side="right") - 1
        valid = (f_idx < n_frames) & (j >= 0) & (j < n_picks)
        frame_scores = jnp.where(valid, scores[jnp.clip(j, 0, P - 1)], 0.0)

        # --- per-shot mean importance (generate_summary.py:37-42)
        csum = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                                jnp.cumsum(frame_scores)])
        starts = jnp.clip(cps[:, 0], 0, F - 1)
        ends = jnp.clip(cps[:, 1], 0, F - 1)
        shot_valid = jnp.arange(S) < n_shots
        lengths = jnp.where(shot_valid, ends - starts + 1, 0)
        sums = csum[ends + 1] - csum[starts]
        values = jnp.where(shot_valid,
                           sums / jnp.maximum(lengths, 1).astype(jnp.float32),
                           0.0)

        # --- 0/1 knapsack DP (knapsack_implementation.py:1-30): static
        # table width W, dynamic capacity `budget`; padded shots have
        # wt=0/val=0 and are never taken.
        from vidsum_tpu.ops.knapsack import knapsack_jax
        taken = knapsack_jax(W, lengths, values, budget=budget) & shot_valid

        # --- binary frame summary (generate_summary.py:50-55)
        in_shot = ((f_idx[None, :] >= starts[:, None])
                   & (f_idx[None, :] <= ends[:, None])
                   & taken[:, None] & shot_valid[:, None])
        summary = in_shot.any(axis=0).astype(jnp.int8)
        return summary, taken

    return jax.jit(kernel)


def device_generate_summary(all_shot_bound: Sequence[np.ndarray],
                            all_scores: Sequence[np.ndarray],
                            all_nframes: Sequence[int],
                            all_positions: Sequence[np.ndarray],
                            budget_ratio: float = 0.15) -> List[np.ndarray]:
    """Drop-in device-side counterpart of
    :func:`vidsum_tpu.ops.summary.generate_summary` (same signature/returns).

    Shapes are padded to multiples of 128 (picks/frames) and 16 (shots) so a
    handful of compiled programs cover a whole dataset.
    """
    import jax.numpy as jnp

    out = []
    for shot_bound, scores, n_frames, positions in zip(
            all_shot_bound, all_scores, all_nframes, all_positions):
        shot_bound = np.asarray(shot_bound, np.int32)
        positions = np.asarray(positions).astype(np.int32).reshape(-1)
        scores = np.asarray(scores, np.float32).reshape(-1)
        n_frames = int(np.asarray(n_frames).reshape(()))
        final_end = int(shot_bound[-1, 1])
        # float64 budget rounding on host, like the reference (":46")
        budget = int((final_end + 1) * budget_ratio)

        P = _bucket(len(positions))
        F = _bucket(max(n_frames, final_end + 1))
        S = _bucket(len(shot_bound), 16)
        W = _bucket(budget, 256)
        kern = _make_kernel(P, F, S, W)

        pos_pad = np.full((P,), np.iinfo(np.int32).max, np.int32)
        pos_pad[: len(positions)] = positions
        sc_pad = np.zeros((P,), np.float32)
        sc_pad[: min(len(scores), P)] = scores[:P]
        cp_pad = np.zeros((S, 2), np.int32)
        cp_pad[: len(shot_bound)] = shot_bound
        # host upsample: segments beyond len(scores) are zero-filled; the
        # device kernel reads scores[j] with zero padding => same semantics.
        n_picks = min(len(positions), P)

        summary, _ = kern(jnp.asarray(sc_pad), jnp.asarray(pos_pad),
                          np.int32(n_picks), jnp.asarray(cp_pad),
                          np.int32(len(shot_bound)), np.int32(n_frames),
                          np.int32(budget))
        out.append(np.asarray(summary)[: final_end + 1])
    return out
