"""Single-chip long-context envelope: how far N stretches on one v5e.

The fused kernels were designed so memory scales O(N·d) per element
(inference) / O(N·d + tile·N) (training recompute) instead of O(N²) —
this script measures where that actually lands: scoring forward and full
train step (fwd+bwd+Adam, dropout 0.3) per sequence length, m-call
differenced (constant dispatch/fetch overhead cancels; see PERF.md
methodology). Run on a QUIET host.

Usage: python scripts/bench_long_context.py [--lens 2560,5120,10240,20480]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="2560,5120,10240,20480")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--k", type=int, default=4, help="steps unrolled per chain")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet, simnet_apply
    from vidsum_tpu.train.steps import make_eval_forward, make_finetune_step, make_optimizer

    print("backend:", jax.default_backend())
    B, K = args.batch, args.k
    cfg = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.3,
                      compute_dtype="bfloat16")
    params0 = init_simnet(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3, 1e-4)
    step_fn = make_finetune_step(cfg, optimizer, attn_impl="pallas_block")
    fwd = make_eval_forward(cfg, attn_impl="pallas_block")
    rng = np.random.default_rng(0)

    def diff(run, n=3):
        np.asarray(run())  # warm/compile
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

    for n_len in [int(s) for s in args.lens.split(",")]:
        x = jnp.asarray(rng.normal(size=(B, n_len, 1024)), jnp.float32)
        t = jnp.asarray(rng.normal(size=(B, n_len)), jnp.float32)
        mask = jnp.zeros((B, n_len), bool)
        key = jax.random.key(0, impl="rbg")

        # scoring forward
        try:
            tf = diff(lambda: fwd(params0, x, mask))
            fwd_s = f"{tf * 1e3:8.2f} ms  {B * n_len / tf:12.1f} f/s"
        except Exception as e:  # noqa: BLE001 - report envelope edge
            fwd_s = f"FAILED ({type(e).__name__})"

        # train step chain (donated params thread the dependency)
        @jax.jit
        def train_chain(p, o, x, t, mask, key):
            loss = jnp.float32(0)
            for i in range(K):
                p, o, loss = step_fn(p, o, x, t, mask,
                                     jax.random.fold_in(key, i), None)
            return p, o, loss

        try:
            state = [jax.tree_util.tree_map(jnp.array, params0), None]
            state[1] = optimizer.init(state[0])

            def run():
                p, o, loss = train_chain(state[0], state[1], x, t, mask, key)
                state[0], state[1] = p, o
                return loss

            tt = diff(run) / K
            tr_s = f"{tt * 1e3:8.2f} ms  {B * n_len / tt:12.1f} f/s"
        except Exception as e:  # noqa: BLE001
            tr_s = f"FAILED ({type(e).__name__})"
        print(f"N={n_len:6d} B={B}:  fwd {fwd_s}   train {tr_s}")


if __name__ == "__main__":
    from vidsum_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    main()
