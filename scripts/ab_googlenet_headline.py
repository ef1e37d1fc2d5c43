"""Reconcile the GoogLeNet headline with the driver bench (VERDICT r4 #4).

PERF.md headlined 38,901 f/s @ 0.572 MFU (bench_bn_fold.py, folded +
constants) while two consecutive driver benches recorded 31,906 / 32,573
f/s on the same folded weights-as-constants convention (bench.py:
googlenet stage). Both cancel the relay RPC, but with different
estimators: bn_fold uses chain-LENGTH differencing (K=8 vs K=24,
time_per_iter) and bench.py uses m-call differencing of one K=20 chain
(diff_samples). This script runs BOTH estimators interleaved in ONE
process on identical folded-constant weights — estimator deltas inside a
run are methodology, run-to-run deltas are relay-window drift. Run it a
few windows apart; the union of runs is the reproducible envelope PERF.md
should quote.

Run (real TPU, quiet host): python scripts/ab_googlenet_headline.py
Record: PERF.md "Backbone embedding" headline restatement.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = float(os.environ.get("VIDSUM_TPU_PEAK_TFLOPS", "197")) * 1e12


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vidsum_tpu.preprocess.googlenet import (
        fold_googlenet, googlenet_apply, init_googlenet,
    )
    from vidsum_tpu.utils.chain_timing import chain_scan, time_per_iter

    print("backend:", jax.default_backend(), flush=True)
    trivial = jax.jit(lambda a: a + 1)
    np.asarray(trivial(jnp.zeros((4,))))

    def probe_ms(reps=5):
        out = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(trivial(jnp.zeros((4,))))
            out.append(time.perf_counter() - t0)
        return float(np.median(out)) * 1e3

    rng = np.random.default_rng(0)
    GB = 128
    gx = jnp.asarray(rng.normal(size=(GB, 224, 224, 3)), jnp.bfloat16)
    g_params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        fold_googlenet(init_googlenet(jax.random.PRNGKey(1))))

    # estimator A — bench_bn_fold.py: chain-length differencing K=8 vs 24
    def step(carry, xx):
        out = googlenet_apply(g_params, xx + carry)
        return out.mean().astype(xx.dtype) * 1e-12

    def mk(k):
        chain = chain_scan(step, k)
        return lambda xx: chain(jnp.zeros((), xx.dtype), xx)

    # estimator B — bench.py: m-call differencing of one K=20 chain
    K_G = 20

    @jax.jit
    def google_chain(x):
        def body(carry, _):
            out = googlenet_apply(g_params, x + carry)
            return out.mean().astype(x.dtype) * 1e-12, ()
        c, _ = lax.scan(body, jnp.zeros((), x.dtype), None, length=K_G)
        return c

    np.asarray(google_chain(gx))  # compile B (A compiles in time_per_iter)

    def bench_style(n=5, m2=3):
        def sample(m):
            out = []
            for _ in range(n):
                t0 = time.perf_counter()
                h = None
                for _ in range(m):
                    h = google_chain(gx)
                np.asarray(h)
                out.append(time.perf_counter() - t0)
            return sorted(out)
        t1, tm = sample(1), sample(m2)
        diffs = sorted((b - a) / (m2 - 1) for a, b in zip(t1, tm))
        best = diffs[0] if diffs[0] > 0 else float(np.median(diffs))
        return GB * K_G / best, GB * K_G / float(np.median(diffs))

    mfu_per_fps = None
    try:
        cost = jax.jit(googlenet_apply).lower(g_params, gx).compile(
        ).cost_analysis()
        if cost and cost.get("flops"):
            mfu_per_fps = float(cost["flops"]) / GB / PEAK_FLOPS
    except Exception:
        pass

    rounds = []
    for r in range(3):   # interleave A/B three times in this process
        p0 = probe_ms()
        best_a, med_a = time_per_iter(mk, (gx,), k1=8, k2=24, samples=5)
        fps_a, fps_a_med = GB / best_a, GB / med_a
        fps_b, fps_b_med = bench_style()
        rounds.append(dict(probe_ms=round(p0, 1),
                           bn_fold_fps=round(fps_a),
                           bn_fold_fps_med=round(fps_a_med),
                           bench_fps=round(fps_b),
                           bench_fps_med=round(fps_b_med)))
        print(f"round {r}: probe {p0:.1f} ms | bn_fold-style "
              f"{fps_a:,.0f} (med {fps_a_med:,.0f}) | bench-style "
              f"{fps_b:,.0f} (med {fps_b_med:,.0f}) f/s", flush=True)

    a = [r["bn_fold_fps"] for r in rounds]
    b = [r["bench_fps"] for r in rounds]
    out = {
        "metric": "googlenet_headline_ab",
        "rounds": rounds,
        "bn_fold_style_fps": {"min": min(a), "max": max(a)},
        "bench_style_fps": {"min": min(b), "max": max(b)},
        "estimator_ratio_median": round(float(np.median(
            [x / y for x, y in zip(a, b)])), 3),
        "mfu_at_max": (round(mfu_per_fps * max(a + b), 4)
                       if mfu_per_fps else None),
        "mfu_at_min": (round(mfu_per_fps * min(a + b), 4)
                       if mfu_per_fps else None),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
