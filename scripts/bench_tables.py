"""Regenerate PERF.md's kernel-comparison tables (real TPU, ~15 min).

All rows use the chain-length/m-call differenced methodology
(``vidsum_tpu/utils/chain_timing.py``): constant dispatch/fetch/RPC
overhead cancels, so sub-millisecond programs time correctly through the
axon relay. Run on a QUIET host — the box has one CPU and any concurrent
CPU job (e.g. a fuzz run) starves the relay client and inflates spread.

Tables produced:
  [scoring]    forward-path variants at the flagship shape (B=32, N=512)
  [attn-iso]   attention kernel in isolation vs XLA dense (N=512 / 2560)
  [train]      train-step variants (XLA attention vs fused kernels)

Usage: python scripts/bench_tables.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer samples (smoke test)")
    args = ap.parse_args()
    n_samp = 3 if args.quick else 5

    import functools

    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet, simnet_apply
    from vidsum_tpu.ops.attention import flash_attention
    from vidsum_tpu.ops.losses import mse_with_mask_loss
    from vidsum_tpu.train.steps import make_optimizer
    from vidsum_tpu.utils.chain_timing import time_per_iter

    B, N = 32, 512
    cfg = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.3,
                      compute_dtype="bfloat16")
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, N, 1024)), jnp.float32)
    pad_mask = jnp.zeros((B, N), bool)

    def fwd_chain(attn_impl, K):
        @jax.jit
        def run(params, x0):
            def body(carry, _):
                s, _ = simnet_apply(params, cfg, x0 + carry[..., None] * 1e-6,
                                    pad_mask, deterministic=True,
                                    attn_impl=attn_impl)
                return jax.nn.sigmoid(s[..., 0]), ()
            out, _ = lax.scan(body, jnp.zeros((B, N), jnp.float32), None,
                              length=K)
            return out.mean()
        return run

    print(f"[scoring] model forward, B={B} N={N} bf16 "
          f"(ms/fwd best/med, frames/s at best)")
    for impl in ("xla", "pallas", "pallas_block"):
        best, med = time_per_iter(
            functools.partial(fwd_chain, impl), (params, x0),
            k1=64, k2=256, samples=n_samp)
        print(f"  {impl:13s}: {best*1e3:6.3f} / {med*1e3:6.3f} ms  "
              f"{B*N/best/1e6:5.1f} M f/s")

    # --- attention in isolation
    H, Dh = 4, 64

    def dense_attn(q, k, v, mr, scale):
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(mr[:, None, None, :], -jnp.inf, s)
        w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", w, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    print(f"[attn-iso] B={B} H={H} Dh={Dh} bf16 (ms/fwd best/med)")
    for Na, k1, k2 in ((512, 128, 512), (2560, 16, 64)):
        q, k, v = (jnp.asarray(rng.normal(size=(B, H, Na, Dh)), jnp.bfloat16)
                   for _ in range(3))
        mr = jnp.asarray((np.arange(Na)[None, :] >= Na - Na // 16)
                         * np.ones((B, 1), bool))
        for name, fn in (("pallas", lambda qq, kk, vv, m, s:
                          flash_attention(qq, kk, vv, m, scale=s)),
                         ("dense", dense_attn)):
            def make(K, fn=fn, q=q, k=k, v=v, mr=mr):
                @jax.jit
                def run(q, k, v):
                    def body(c, _):
                        out = fn(q + c * 1e-6, k, v, mr, 0.125)
                        return out.astype(q.dtype), ()
                    c, _ = lax.scan(body, jnp.zeros_like(q), None, length=K)
                    return jnp.mean(c).astype(jnp.float32)
                return run
            best, med = time_per_iter(make, (q, k, v), k1=k1, k2=k2,
                                      samples=n_samp)
            print(f"  N={Na:5d} {name:6s}: {best*1e3:6.3f} / {med*1e3:6.3f} ms")

    # --- train-step variants (K steps unrolled, m-call differenced like
    # bench.py; dropout 0.3, rbg RNG, coupled-wd Adam)
    optimizer = make_optimizer(1e-3, 1e-4)
    target = jnp.asarray(rng.random((B, N)), jnp.float32)
    base_key = jax.random.key(1234, impl="rbg")
    K_TRAIN = 20

    def train_variant(attn_impl):
        def loss_fn(p, x, rng_key):
            scores, _ = simnet_apply(p, cfg, x, pad_mask, rng=rng_key,
                                     deterministic=False,
                                     attn_impl=attn_impl)
            return mse_with_mask_loss(scores, target, pad_mask)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def unrolled(p, o, x):
            loss = None
            for i in range(K_TRAIN):
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, x, jax.random.fold_in(base_key, i))
                upd, o = optimizer.update(grads, o, p)
                p = optax.apply_updates(p, upd)
            return p, o, loss

        tp = jax.tree_util.tree_map(jnp.array, params)
        state = [tp, optimizer.init(tp)]

        def dispatch():
            p, o, loss = unrolled(state[0], state[1], x0)
            state[0], state[1] = p, o
            return loss
        return dispatch

    import time

    print(f"[train] fwd+bwd+Adam, dropout 0.3, B={B} N={N} "
          f"(ms/step best/med)")
    for impl in ("xla", "pallas", "pallas_block"):
        dispatch = train_variant(impl)
        np.asarray(dispatch())  # compile

        def sample(m):
            out = []
            for _ in range(n_samp + 1):
                t0 = time.perf_counter()
                h = None
                for _ in range(m):
                    h = dispatch()
                np.asarray(h)
                out.append(time.perf_counter() - t0)
            return sorted(out)

        t1, t3 = sample(1), sample(3)
        diffs = sorted((b - a) / 2 / K_TRAIN for a, b in zip(t1, t3))
        print(f"  {impl:13s}: {diffs[0]*1e3:6.3f} / "
              f"{float(np.median(diffs))*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
