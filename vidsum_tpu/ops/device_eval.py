"""Opt-in fully on-device summary generation (``eval_impl="device"``).

One jitted XLA program per dataset-wide shape bucket — vmapped over the
video axis, so an entire val set is one dispatch + one fetch — runs the
whole summary pipeline of
``src/evaluation/generate_summary.py:6-57`` on the accelerator: score
upsampling (gather via searchsorted — exact, no arithmetic), per-shot mean
importance (f32 cumulative sums), the 0/1-knapsack DP over shots
(:func:`vidsum_tpu.ops.knapsack.knapsack_jax` semantics with a *dynamic*
budget inside a static table width), and the binary frame summary.

Parity contract: the HOST pipeline (``ops/summary.py`` + float64
NumPy/C++ DP) is the bit-parity oracle used for reported metrics. This
device path is tie-hardened to match it (VERDICT r1 #6): shot values
replicate numpy's float32 summation order BIT-EXACTLY for shots <=128
frames (virtually every real KTS shot) and use double-float (two-f32)
round-once sums beyond; the knapsack DP accumulates double-float value
sums (``ops/df32``), collapsing the f32-comparison tie window to
~2^-48 relative. Measured record (scripts/fuzz_reference_parity.py
--device-eval, PARITY.md): **6,667 randomized DSNet-shaped videos, zero
selected-shot mismatches** vs the host oracle (the pre-hardening f32 DP
showed 41/667; df32 alone 1/6,667 — a value-rounding tie now pinned as
tests/data/device_eval_tie_video.npz). The budget is computed host-side
in float64 (``int((end+1)*ratio)``, reference generate_summary.py:46)
and passed in, so the one genuinely float64-sensitive rounding matches
by construction. Final reported numbers still come from the host path;
use this for in-training monitoring and single-fetch eval loops.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np


def _bucket(n: int, step: int = 128) -> int:
    return max(step, -(-n // step) * step)


def device_eligible(picks: np.ndarray, scores: np.ndarray,
                    n_frames: int) -> bool:
    """True when a video satisfies the device kernel's DSNet-shaped input
    contract (enforced in code per VERDICT r2 weak #3 — previously assumed):

    - ``picks`` strictly increasing (the kernel upsamples via searchsorted;
      the host oracle's fill loop also handles shuffled picks),
    - one score per pick (the host path zero-fills segments past
      ``len(scores)`` with a loop-order-dependent rule),
    - ``n_frames`` beyond the last pick (no pick overhang).

    Every real DSNet h5 satisfies all three. Non-conforming videos are
    routed to the bit-parity host oracle by :func:`device_generate_summary`
    instead of silently returning garbage.
    """
    picks = np.asarray(picks).reshape(-1)
    if len(picks) == 0 or len(np.asarray(scores).reshape(-1)) != len(picks):
        return False
    if not bool(np.all(picks[1:] > picks[:-1])):
        return False
    return int(np.asarray(n_frames).reshape(())) > int(picks[-1])


def _kernel_fn(P: int, F: int, S: int, W: int):
    """Summary program for a (picks, frames, shots, table-width) shape
    bucket: fn(scores, picks, n_picks, cps, n_shots, n_frames, budget)
    -> (summary (F,) int8, taken (S,) bool). Pure jax — vmap/jit-safe."""
    import jax.numpy as jnp

    def kernel(scores, picks, n_picks, cps, n_shots, n_frames, budget):
        # --- upsample (compute_metrics.py:19-39): frame f takes scores[j],
        # j = index of the pick segment containing f; 0 past the last pick.
        # Sorted picks are guaranteed by device_eligible (the dispatcher
        # routes non-conforming videos to the host oracle).
        pos = jnp.where(jnp.arange(P) < n_picks, picks, jnp.iinfo(jnp.int32).max)
        f_idx = jnp.arange(F, dtype=jnp.int32)
        j = jnp.searchsorted(pos, f_idx, side="right") - 1
        valid = (f_idx < n_frames) & (j >= 0) & (j < n_picks)
        frame_scores = jnp.where(valid, scores[jnp.clip(j, 0, P - 1)], 0.0)

        # --- per-shot mean importance (generate_summary.py:37-42).
        # Double-float cumulative sums (ops/df32): a plain f32 cumsum
        # carries ~2^-24·|csum| absolute error into every shot-sum
        # difference, which measurably flipped knapsack decisions at
        # many-tiny-shots scale. sum_h is the correctly-rounded f32 of the
        # near-exact shot sum; dividing it by the f32 count reproduces
        # numpy's float32 ``.mean()`` (the host oracle's value) up to
        # double-rounding corner cases.
        from vidsum_tpu.ops.df32 import df_cumsum, df_sub

        ch, cl = df_cumsum(frame_scores)
        zero1 = jnp.zeros((1,), jnp.float32)
        ch = jnp.concatenate([zero1, ch])
        cl = jnp.concatenate([zero1, cl])
        starts = jnp.clip(cps[:, 0], 0, F - 1)
        ends = jnp.clip(cps[:, 1], 0, F - 1)
        shot_valid = jnp.arange(S) < n_shots
        lengths = jnp.where(shot_valid, ends - starts + 1, 0)
        sum_h, _ = df_sub(ch[ends + 1], cl[ends + 1],
                          ch[starts], cl[starts])
        # Shots of <=128 frames (virtually every real KTS shot): replicate
        # numpy's float32 summation BIT-EXACTLY — the host oracle's shot
        # value is float32 ``.mean()`` (generate_summary.py:42), which for
        # n<8 sums sequentially and for 8<=n<=128 runs an 8-accumulator
        # unrolled loop over the full blocks, a fixed combine tree, then a
        # sequential tail (verified against np.sum for every n<=128;
        # recursion starts at 129). Adding exact 0.0 for masked positions
        # leaves every partial sum's rounding unchanged, so one uniform
        # masked construction covers all n. The df32 round-once sum stays
        # for longer shots, where cross-scheme ties require constant
        # regions both schemes round identically anyway.
        k_idx = jnp.arange(128)
        gather = jnp.clip(starts[:, None] + k_idx[None, :], 0, F - 1)
        vals = jnp.where(k_idx[None, :] < lengths[:, None],
                         frame_scores[gather], 0.0)          # (S, 128)
        m_full = lengths - lengths % 8                       # (S,)
        blocks = vals.reshape(-1, 16, 8)
        r = jnp.zeros((vals.shape[0], 8), jnp.float32)
        for b in range(16):
            r = r + jnp.where((8 * b < m_full)[:, None], blocks[:, b, :],
                              0.0)
        tree = (((r[:, 0] + r[:, 1]) + (r[:, 2] + r[:, 3]))
                + ((r[:, 4] + r[:, 5]) + (r[:, 6] + r[:, 7])))
        np_sum = tree
        for p in range(8):
            pos = jnp.clip(m_full + p, 0, 127)
            tail_v = jnp.take_along_axis(vals, pos[:, None], axis=1)[:, 0]
            np_sum = np_sum + jnp.where(m_full + p < lengths, tail_v, 0.0)
        sum_best = jnp.where(lengths <= 128, np_sum, sum_h)
        values = jnp.where(shot_valid,
                           sum_best / jnp.maximum(lengths, 1).astype(jnp.float32),
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

    return kernel


@functools.lru_cache(maxsize=None)
def _make_kernel(P: int, F: int, S: int, W: int):
    """Jitted single-video kernel (kept for ad-hoc use/validation)."""
    import jax

    return jax.jit(_kernel_fn(P, F, S, W))


@functools.lru_cache(maxsize=None)
def _make_batched_kernel(P: int, F: int, S: int, W: int):
    """Jitted kernel vmapped over a leading video axis: the whole val set
    runs as ONE device program (one dispatch + one result fetch through the
    tunnel, vs one of each per video — the per-video RPC was ~50x the
    compute; see PERF.md 'On-device eval')."""
    import jax

    return jax.jit(jax.vmap(_kernel_fn(P, F, S, W)))


def device_generate_summary(all_shot_bound: Sequence[np.ndarray],
                            all_scores: Sequence[np.ndarray],
                            all_nframes: Sequence[int],
                            all_positions: Sequence[np.ndarray],
                            budget_ratio: float = 0.15) -> List[np.ndarray]:
    """Drop-in device-side counterpart of
    :func:`vidsum_tpu.ops.summary.generate_summary` (same signature/returns).

    All videos are padded to dataset-wide shape buckets (multiples of 128
    for picks/frames, 16 for shots, 8 for the video axis) and run as a
    single vmapped program: one dispatch + one fetch for the whole set.

    Videos violating :func:`device_eligible`'s contract (unsorted picks,
    score/pick length mismatch, pick overhang — shapes no DSNet h5
    produces) are routed to the bit-parity host oracle instead of the
    kernel, so the composed result is always correct.
    """
    import jax.numpy as jnp

    V = len(all_shot_bound)
    if V == 0:
        return []

    shot_bounds = [np.asarray(sb, np.int32) for sb in all_shot_bound]
    positions = [np.asarray(p).astype(np.int32).reshape(-1)
                 for p in all_positions]
    scores = [np.asarray(s, np.float32).reshape(-1) for s in all_scores]
    n_frames = [int(np.asarray(n).reshape(())) for n in all_nframes]

    bad = [v for v in range(V)
           if not device_eligible(positions[v], scores[v], n_frames[v])]
    if bad:
        from vidsum_tpu.ops.summary import generate_summary as _host

        host_res = _host([all_shot_bound[v] for v in bad],
                         [all_scores[v] for v in bad],
                         [all_nframes[v] for v in bad],
                         [all_positions[v] for v in bad])
        out: List[np.ndarray] = [None] * V  # type: ignore[list-item]
        for j, v in enumerate(bad):
            out[v] = host_res[j]
        good = [v for v in range(V) if out[v] is None]
        if good:
            dev_res = device_generate_summary(
                [all_shot_bound[v] for v in good],
                [all_scores[v] for v in good],
                [all_nframes[v] for v in good],
                [all_positions[v] for v in good], budget_ratio)
            for j, v in enumerate(good):
                out[v] = dev_res[j]
        return out
    final_ends = [int(sb[-1, 1]) for sb in shot_bounds]
    # float64 budget rounding on host, like the reference (":46")
    budgets = [int((fe + 1) * budget_ratio) for fe in final_ends]

    # dataset-wide buckets => one compiled program per dataset shape class
    P = _bucket(max(len(p) for p in positions))
    F = _bucket(max(max(nf, fe + 1) for nf, fe in zip(n_frames, final_ends)))
    S = _bucket(max(len(sb) for sb in shot_bounds), 16)
    W = _bucket(max(budgets), 256)
    Vb = _bucket(V, 8)

    pos_pad = np.full((Vb, P), np.iinfo(np.int32).max, np.int32)
    sc_pad = np.zeros((Vb, P), np.float32)
    cp_pad = np.zeros((Vb, S, 2), np.int32)
    n_picks = np.zeros((Vb,), np.int32)
    n_shots = np.zeros((Vb,), np.int32)
    nf_arr = np.zeros((Vb,), np.int32)
    bud_arr = np.zeros((Vb,), np.int32)
    for v in range(V):
        pos_pad[v, : len(positions[v])] = positions[v]
        # host upsample: segments beyond len(scores) are zero-filled; the
        # device kernel reads scores[j] with zero padding => same semantics.
        sc_pad[v, : min(len(scores[v]), P)] = scores[v][:P]
        cp_pad[v, : len(shot_bounds[v])] = shot_bounds[v]
        n_picks[v] = min(len(positions[v]), P)
        n_shots[v] = len(shot_bounds[v])
        nf_arr[v] = n_frames[v]
        bud_arr[v] = budgets[v]

    kern = _make_batched_kernel(P, F, S, W)
    summaries, _ = kern(jnp.asarray(sc_pad), jnp.asarray(pos_pad),
                        jnp.asarray(n_picks), jnp.asarray(cp_pad),
                        jnp.asarray(n_shots), jnp.asarray(nf_arr),
                        jnp.asarray(bud_arr))
    summaries = np.asarray(summaries)  # single fetch
    return [summaries[v, : final_ends[v] + 1] for v in range(V)]
