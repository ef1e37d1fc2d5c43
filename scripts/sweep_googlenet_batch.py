"""Sweep GoogLeNet pool5 embedding batch size on the real chip.

Chain-LENGTH differenced (utils/chain_timing.time_per_iter): the same
chained program at two lengths, so dispatch + fetch RPC cancel exactly.
(An earlier revision differenced m sequential synchronous calls, which
does NOT cancel the per-call ~25 ms relay RPC — rankings held, absolute
numbers were biased low.) Run on a QUIET host.

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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vidsum_tpu.preprocess.googlenet import googlenet_apply, init_googlenet
    from vidsum_tpu.utils.chain_timing import chain_scan, time_per_iter

    print("backend:", jax.default_backend())
    g_params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        init_googlenet(jax.random.PRNGKey(1)))
    rng = np.random.default_rng(0)

    for b in [int(s) for s in args.batches.split(",")]:
        gx = jnp.asarray(rng.normal(size=(b, 224, 224, 3)), jnp.bfloat16)

        def step(carry, x):
            out = googlenet_apply(g_params, x + carry)
            return out.mean().astype(x.dtype) * 1e-12

        k1, k2 = (8, 24) if b >= 128 else (16, 48)
        best, med = time_per_iter(lambda k: chain_scan(step, k),
                                  (jnp.zeros((), gx.dtype), gx),
                                  k1=k1, k2=k2, samples=4)
        print(f"B={b:4d}: {best * 1e3:7.2f} ms/batch (med {med * 1e3:.2f})  "
              f"{b / best:10.1f} frames/s")


if __name__ == "__main__":
    from vidsum_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    main()
