"""Minimal-repro ladder for the N=40,960 TRAIN remote-compile failure
(PERF.md long-context envelope; VERDICT r2 #4).

Observed round 2: at B=1, d256/h4/L4, dropout 0.3, bf16, the full train
step fails in REMOTE COMPILE ("helper crash") at N=40,960 while the
scoring forward at the same length compiles and runs (118.6 ms). This
script isolates the failing layer:

  1. grad of the key-folded flash attention kernel alone (1,4,N,64)
  2. one-layer train step (same kernels inside the full VJP + Adam)
  3. the full 4-layer step (the failing config)

each at a ladder of lengths, timing the compile separately from the run
(a relay-side compile timeout looks like a helper crash but is an infra
bound, not an XLA one). Run on a QUIET host; single TPU process.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="20480,28672,36864,40960")
    ap.add_argument("--stages", default="attn,l1,l4")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet
    from vidsum_tpu.ops.attention_train import (
        flash_attention_dropout, flash_train_supported,
    )
    from vidsum_tpu.train.steps import make_finetune_step, make_optimizer

    print("backend:", jax.default_backend(), flush=True)
    np.asarray(jax.jit(lambda a: a + 1)(jnp.zeros((4,))))  # relay probe
    print("probe OK", flush=True)

    rng = np.random.default_rng(0)
    optimizer = make_optimizer(1e-3, 1e-4)
    stages = args.stages.split(",")

    for n_len in [int(s) for s in args.lens.split(",")]:
        print(f"\n=== N={n_len} (flash_train_supported bf16: "
              f"{flash_train_supported(n_len, 64, 2)}) ===", flush=True)

        if "attn" in stages:
            try:
                q = jnp.asarray(rng.normal(size=(1, 4, n_len, 64)),
                                jnp.bfloat16)
                m0 = jnp.zeros((1, 1, n_len), jnp.int8)
                seed = jnp.zeros((1, 1), jnp.int32)

                def attn_loss(q):
                    # rate/scale are nondiff_argnums of the custom_vjp —
                    # they must bind positionally
                    o = flash_attention_dropout(q, q, q, m0, seed,
                                                0.3, 64 ** -0.5)
                    return o.astype(jnp.float32).sum()

                f = jax.jit(jax.grad(attn_loss))
                t0 = time.time()
                lowered = f.lower(q)
                compiled = lowered.compile()
                t1 = time.time()
                np.asarray(compiled(q))
                t2 = time.time()
                print(f"[attn-grad] compile {t1 - t0:.1f}s run "
                      f"{t2 - t1:.1f}s OK", flush=True)
            except Exception:
                print(f"[attn-grad] FAILED:\n{traceback.format_exc()[-1500:]}",
                      flush=True)

        for tag, n_layers in (("l1", 1), ("l4", 4)):
            if tag not in stages:
                continue
            try:
                cfg = ModelConfig(d_model=256, num_heads=4,
                                  num_layers=n_layers, dropout=0.3,
                                  compute_dtype="bfloat16",
                                  max_len=max(2000, n_len))
                params = init_simnet(jax.random.PRNGKey(0), cfg)
                step = make_finetune_step(cfg, optimizer, attn_impl="pallas")
                opt_state = optimizer.init(params)
                x = jnp.asarray(rng.normal(size=(1, n_len, 1024)),
                                jnp.float32)
                t = jnp.asarray(rng.normal(size=(1, n_len)), jnp.float32)
                m = jnp.zeros((1, n_len), bool)
                key = jax.random.key(0, impl="rbg")
                t0 = time.time()
                lowered = step.lower(params, opt_state, x, t, m, key, None)
                compiled = lowered.compile()
                t1 = time.time()
                _, _, loss = compiled(params, opt_state, x, t, m, key, None)
                loss = float(loss)
                t2 = time.time()
                print(f"[{tag}-step] compile {t1 - t0:.1f}s run "
                      f"{t2 - t1:.1f}s loss {loss:.4f} OK", flush=True)
            except Exception:
                print(f"[{tag}-step] FAILED:\n{traceback.format_exc()[-1500:]}",
                      flush=True)


if __name__ == "__main__":
    main()
