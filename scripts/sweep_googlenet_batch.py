"""Sweep GoogLeNet pool5 embedding batch size on the real chip.

bench.py's ``googlenet_fps`` row uses B=64 (≈31% MFU by a ~3 GFLOP/frame
estimate); conv stacks usually want larger batches before XLA's layout
choices saturate the MXU. One chain-differenced number per batch size,
same methodology as bench.py (run on a QUIET host).

Usage: python scripts/sweep_googlenet_batch.py [--batches 32,64,128,256]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128,256")
    ap.add_argument("--k", type=int, default=20, help="chain length")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from vidsum_tpu.preprocess.googlenet import googlenet_apply, init_googlenet

    print("backend:", jax.default_backend())
    g_params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        init_googlenet(jax.random.PRNGKey(1)))
    rng = np.random.default_rng(0)

    # RPC estimate (same form as bench.py's diff: m=1 vs m=3 dispatches)
    def diff(run, n=3):
        import time
        np.asarray(run())  # warm
        def sample(m):
            out = []
            for _ in range(n):
                t0 = time.perf_counter()
                for _ in range(m):
                    np.asarray(run())
                out.append(time.perf_counter() - t0)
            return sorted(out)
        t1, t3 = sample(1), sample(3)
        return sorted((b - a) / 2 for a, b in zip(t1, t3))[0]

    for b in [int(s) for s in args.batches.split(",")]:
        gx = jnp.asarray(rng.normal(size=(b, 224, 224, 3)), jnp.bfloat16)
        k = args.k

        @jax.jit
        def chain(p, x):
            def body(carry, _):
                out = googlenet_apply(p, x + carry)
                return out.mean().astype(x.dtype) * 1e-12, ()
            c, _ = lax.scan(body, jnp.zeros((), x.dtype), None, length=k)
            return c

        t = diff(lambda: chain(g_params, gx))
        fps = b * k / t
        print(f"B={b:4d}: {t / k * 1e3:7.2f} ms/batch  {fps:10.1f} frames/s")


if __name__ == "__main__":
    from vidsum_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    main()
