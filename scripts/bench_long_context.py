"""Single-chip long-context envelope: how far N stretches on one v5e.

The fused kernels were designed so memory scales O(N·d) per element
instead of O(N²): the fused block kernel carries whole-sequence K/V in
VMEM (its guard raises past ~N=8k at d=256 and callers fall back to
``attn_impl='pallas'`` — flash attention kernels + XLA block, which
tiles everything). This script measures scoring forward and the full
train step (fwd+bwd+Adam, dropout 0.3) per sequence length with the
winning impl at each N, chain-LENGTH differenced so dispatch/fetch RPC
cancel exactly (PERF.md methodology). Run on a QUIET host.

Usage: python scripts/bench_long_context.py [--lens 2560,5120,10240,20480]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="2560,5120,10240,20480")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet
    from vidsum_tpu.train.steps import (
        make_eval_forward, make_finetune_step, make_optimizer,
    )
    from vidsum_tpu.utils.chain_timing import time_per_iter

    print("backend:", jax.default_backend())
    B = args.batch
    cfg = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.3,
                      compute_dtype="bfloat16")
    params0 = init_simnet(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3, 1e-4)
    rng = np.random.default_rng(0)

    for n_len in [int(s) for s in args.lens.split(",")]:
        x = jnp.asarray(rng.normal(size=(B, n_len, 1024)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(B, n_len)), jnp.float32)
        mask = jnp.zeros((B, n_len), bool)
        key = jax.random.key(0, impl="rbg")

        row = [f"N={n_len:6d} B={B}:"]
        for which in ("fwd", "train"):
            done = None
            for impl in ("pallas_block", "pallas", "xla"):
                try:
                    if which == "fwd":
                        fwd = make_eval_forward(cfg, attn_impl=impl)

                        def make_chain(k, fwd=fwd):
                            @jax.jit
                            def run(params, x, mask):
                                xc = x
                                s = None
                                for _ in range(k):
                                    s = fwd(params, xc, mask)
                                    # thread the dependency
                                    xc = xc + (s.mean() * 1e-12).astype(x.dtype)
                                return s.mean()
                            return run

                        best, med = time_per_iter(
                            make_chain, (params0, x, mask), k1=2, k2=8,
                            samples=3)
                        per = best
                        fps = B * n_len / per
                    else:
                        step_fn = make_finetune_step(cfg, optimizer,
                                                     attn_impl=impl)

                        def make_chain(k, step_fn=step_fn):
                            @jax.jit
                            def run(p, o, x, t, mask, key):
                                loss = jnp.float32(0)
                                for i in range(k):
                                    p, o, loss = step_fn(
                                        p, o, x, t, mask,
                                        jax.random.fold_in(key, i), None)
                                return loss
                            return run

                        p = jax.tree_util.tree_map(jnp.array, params0)
                        o = optimizer.init(p)
                        best, med = time_per_iter(
                            make_chain, (p, o, x, t, mask, key), k1=2, k2=6,
                            samples=3)
                        per = best
                        fps = B * n_len / per
                    done = (impl, per, fps)
                    break
                except Exception as e:  # noqa: BLE001 — walk the fallbacks
                    # full message, so envelope runs distinguish designed
                    # demotion (guard ValueErrors) from real kernel bugs
                    msg = " ".join(str(e).split())
                    last = f"{type(e).__name__}: {msg[:300]}"
                    print(f"    [{which}/{impl} failed: {last}]", flush=True)
            if done:
                impl, per, fps = done
                row.append(f"{which} [{impl}] {per * 1e3:8.2f} ms "
                           f"{fps:12.1f} f/s  ")
            else:
                row.append(f"{which} FAILED ({last})  ")
        print("".join(row), flush=True)


if __name__ == "__main__":
    from vidsum_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    main()
