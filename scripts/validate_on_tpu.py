"""On-chip kernel validation battery.

The pytest suite runs on the CPU harness (Pallas in interpret mode); this
script re-validates every kernel against its dense reference on the real
chip, where Mosaic compilation, vector layouts, and fp32-accumulation
behavior can differ. Run serially (the tunnel is single-client):

    python scripts/validate_on_tpu.py

Checks: fused attention fwd, fused encoder block fwd (both tiles), trainable
dropout-attention fwd + exact grads vs the hash-masked dense reference, and
one optimization step sanity.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(name, ok, detail=""):
    print(f"[{'OK' if ok else 'FAIL'}] {name} {detail}")
    if not ok:
        raise SystemExit(f"validation failed: {name}")


def main() -> None:
    assert jax.default_backend() == "tpu", "run on the TPU host"
    rng = np.random.default_rng(0)

    from vidsum_tpu.ops.attention import _xla_attention, flash_attention

    B, H, N, Dh = 4, 4, 256, 64
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, Dh)), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(np.arange(N)[None, :] >= 200) * jnp.ones((B, 1), bool)
    got = np.asarray(flash_attention(q, k, v, mask, 0.0625))
    want = np.asarray(_xla_attention(q, k, v, mask, 0.0625))
    diff = np.abs(got - want).max()
    # TPU fp32 matmuls run multi-pass bf16 on the MXU: ~1e-4-scale rounding
    check("flash_attention fwd", diff < 1e-3, f"max diff {diff:.2e}")

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet, simnet_apply

    cfg = ModelConfig(d_model=256, num_heads=4, num_layers=2, dropout=0.0,
                      max_len=512)
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 256, 1024)), jnp.float32)
    bm = jnp.asarray(np.arange(256)[None, :] >= 230) * jnp.ones((2, 1), bool)
    s_ref, _ = simnet_apply(params, cfg, x, bm, attn_impl="xla")
    for impl in ("pallas", "pallas_block"):
        s, _ = simnet_apply(params, cfg, x, bm, attn_impl=impl)
        diff = float(jnp.abs(s - s_ref).max())
        check(f"model forward {impl}", diff < 1e-3, f"max diff {diff:.2e}")

    from vidsum_tpu.ops.attention_train import (
        dropout_attention_reference, flash_attention_dropout,
        reference_keep_mask,
    )

    B, H, N, Dh = 2, 2, 128, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, Dh)), jnp.float32)
               for _ in range(3))
    bmask = np.zeros((B, N), bool)
    bmask[:, 100:] = True
    mask8 = jnp.asarray(bmask.astype(np.int8))[:, None, :]
    seed = jnp.asarray([[1234]], jnp.int32)
    rate = 0.25
    keep = reference_keep_mask(1234, B, H, N, rate)
    co = jnp.asarray(rng.normal(size=(B, H, N, Dh)).astype(np.float32))

    got = flash_attention_dropout(q, k, v, mask8, seed, rate, 0.1)
    want = dropout_attention_reference(q, k, v, jnp.asarray(bmask), keep,
                                       rate, 0.1)
    diff = float(jnp.abs(got - want).max())
    check("dropout-attention fwd", diff < 1e-3, f"max diff {diff:.2e}")

    def f_fused(q, k, v):
        return jnp.sum(flash_attention_dropout(q, k, v, mask8, seed, rate,
                                               0.1) * co)

    def f_ref(q, k, v):
        return jnp.sum(dropout_attention_reference(
            q, k, v, jnp.asarray(bmask), keep, rate, 0.1) * co)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for name, ga, gb in zip("qkv", g_fused, g_ref):
        rel = float(jnp.abs(ga - gb).max() / jnp.abs(gb).max())
        check(f"dropout-attention d{name}", rel < 1e-2,
              f"max rel err {rel:.2e}")

    from vidsum_tpu.train.steps import make_finetune_step, make_optimizer

    cfg = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.3,
                      compute_dtype="bfloat16")
    opt = make_optimizer(1e-3, 1e-4)
    step = make_finetune_step(cfg, opt, attn_impl="pallas")
    p = init_simnet(jax.random.PRNGKey(0), cfg)
    st = opt.init(p)
    xb = jnp.asarray(rng.normal(size=(8, 256, 1024)), jnp.float32)
    tb = jnp.asarray(rng.random((8, 256)), jnp.float32)
    mb = jnp.zeros((8, 256), bool)
    key = jax.random.key(1, impl="rbg")
    losses = []
    for i in range(8):
        key, sub = jax.random.split(key)
        p, st, loss = step(p, st, xb, tb, mb, sub)
        losses.append(float(loss))
    check("pallas train step optimizes", losses[-1] < losses[0]
          and all(np.isfinite(losses)), f"{losses[0]:.4f}→{losses[-1]:.4f}")

    print("ALL ON-CHIP VALIDATIONS PASSED")


if __name__ == "__main__":
    main()
