"""Sweep the fused train kernels' backward query tile on the real chip.

Measures the full flagship train step (fwd + bwd + Adam, dropout 0.3,
attn_impl='pallas_block') per candidate bwd tile, using bench.py's
donated-buffer Python-loop chain + rpc subtraction. Run on TPU:

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/sweep_train_tiles.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

B, N, K = 32, 512, 30
TILES = (128, 256, 512)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    import vidsum_tpu.ops.block_train as bt
    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet, simnet_apply
    from vidsum_tpu.ops.losses import mse_with_mask_loss
    from vidsum_tpu.train.steps import make_optimizer

    cfg = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.3,
                      compute_dtype="bfloat16")
    params0 = init_simnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, N, 1024)), jnp.float32)
    pad_mask = jnp.zeros((B, N), bool)
    target = jnp.asarray(rng.random((B, N)), jnp.float32)
    optimizer = make_optimizer(1e-3, 1e-4)
    base_key = jax.random.key(1234, impl="rbg")

    @jax.jit
    def trivial(x):
        return x + 1.0

    np.asarray(trivial(jnp.zeros((4,))))
    t0 = time.perf_counter()
    np.asarray(trivial(jnp.zeros((4,))))
    rpc = time.perf_counter() - t0
    print(f"rpc ~{rpc*1e3:.1f} ms")

    def loss_fn(params, x, rng_key):
        scores, _ = simnet_apply(params, cfg, x, pad_mask, rng=rng_key,
                                 deterministic=False,
                                 attn_impl="pallas_block")
        return mse_with_mask_loss(scores, target, pad_mask)

    results = {}
    ref_loss = {}
    for tile in TILES:
        if N % tile:
            continue
        bt._pick_bwd_tile = lambda n, t=tile: t if n % t == 0 else 128
        bt._backward.clear_cache()
        bt._forward.clear_cache()

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, x, i):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, x, jax.random.fold_in(base_key, i))
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        p = jax.tree_util.tree_map(jnp.array, params0)
        o = optimizer.init(p)

        def chain(p, o, k=K):
            loss = None
            for i in range(k):
                p, o, loss = train_step(p, o, x0, jnp.int32(i))
            return p, o, np.asarray(loss)

        try:
            p, o, l0 = chain(p, o, 3)  # compile + warm
        except Exception as e:
            print(f"tile {tile}: FAILED {type(e).__name__}: {e}")
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            p, o, loss = chain(p, o)
            best = min(best, time.perf_counter() - t0 - rpc)
        per_step = best / K
        results[tile] = per_step
        ref_loss[tile] = float(loss)
        print(f"tile {tile}: {per_step*1e3:.2f} ms/step "
              f"({B*N/per_step/1e6:.2f} M frames/s)  loss@33={loss:.6f}")

    if results:
        fastest = min(results, key=results.get)
        print(f"fastest: tile {fastest} @ {results[fastest]*1e3:.2f} ms/step")
        losses = set(round(v, 5) for v in ref_loss.values())
        print(f"loss agreement across tiles (5 dp): "
              f"{'OK' if len(losses) == 1 else ref_loss}")


if __name__ == "__main__":
    main()
