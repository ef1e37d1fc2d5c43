"""BN-fold A/B for the backbone extractors (VERDICT r2 #5, round-3 fold).

Measures GoogLeNet-pool5 (B=128, 224²) and R3D-18 (B=32 clips, 16×112²)
forward throughput with the BatchNorm applied at runtime (unfolded) vs
folded into the conv weights at load (``fold_googlenet`` /
``fold_r3d18``), same process so relay drift cancels; chain-LENGTH
differenced per PERF.md methodology. Also reports MFU against the chip's
bf16 peak using XLA's own cost model for the conv FLOPs.

Run on a QUIET host: python scripts/bench_bn_fold.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = float(os.environ.get("VIDSUM_TPU_PEAK_TFLOPS", "197")) * 1e12


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vidsum_tpu.preprocess.googlenet import (
        fold_googlenet, googlenet_apply, init_googlenet,
    )
    from vidsum_tpu.preprocess.r3d import fold_r3d18, init_r3d18, r3d18_apply
    from vidsum_tpu.utils.chain_timing import chain_scan, time_per_iter

    print("backend:", jax.default_backend(), flush=True)
    np.asarray(jax.jit(lambda a: a + 1)(jnp.zeros((4,))))
    print("probe OK", flush=True)

    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            tree)

    rng = np.random.default_rng(0)
    results = {}

    def measure(tag, apply_fn, params, x, frames_per_call, k1=8, k2=24):
        def step(carry, xx):
            out = apply_fn(params, xx + carry)
            return out.mean().astype(xx.dtype) * 1e-12, ()

        def mk(k):
            chain = chain_scan(lambda c, xx: step(c, xx)[0], k)
            return lambda xx: chain(jnp.zeros((), xx.dtype), xx)

        best, med = time_per_iter(mk, (x,), k1=k1, k2=k2, samples=5)
        fps = frames_per_call / best
        mfu = None
        try:
            cost = jax.jit(apply_fn).lower(params, x).compile(
            ).cost_analysis()
            if cost and cost.get("flops"):
                mfu = float(cost["flops"]) / best / PEAK_FLOPS
        except Exception:
            pass
        results[tag] = {"fps": round(fps, 1),
                        "ms_per_call": round(best * 1e3, 3),
                        "mfu": round(mfu, 4) if mfu else None}
        print(f"{tag}: {fps:,.0f} frames/s ({best * 1e3:.2f} ms/call, "
              f"MFU {mfu if mfu is None else round(mfu, 4)})", flush=True)

    # GoogLeNet: B=128 (measured sweet spot), bf16
    GB = 128
    gx = jnp.asarray(rng.normal(size=(GB, 224, 224, 3)), jnp.bfloat16)
    g_raw = init_googlenet(jax.random.PRNGKey(1))
    measure("googlenet_unfolded", googlenet_apply, bf16(g_raw), gx, GB)
    measure("googlenet_folded", googlenet_apply, bf16(fold_googlenet(g_raw)),
            gx, GB)

    # R3D-18: B=32 clips of 16 frames (measured sweet spot), bf16
    RB, T = 32, 16
    rx = jnp.asarray(rng.normal(size=(RB, T, 112, 112, 3)), jnp.bfloat16)
    r_raw = init_r3d18(jax.random.PRNGKey(2))
    measure("r3d18_unfolded", r3d18_apply, bf16(r_raw), rx, RB, k1=4, k2=12)
    measure("r3d18_folded", r3d18_apply, bf16(fold_r3d18(r_raw)), rx, RB,
            k1=4, k2=12)

    for net in ("googlenet", "r3d18"):
        a, b = results[f"{net}_unfolded"], results[f"{net}_folded"]
        results[f"{net}_speedup"] = round(a["ms_per_call"]
                                          / b["ms_per_call"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
