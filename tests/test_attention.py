"""Fused-attention kernel vs the dense XLA reference (interpret mode on the
CPU harness; the same kernel compiles via Mosaic on real TPUs)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models import init_simnet, simnet_apply
from vidsum_tpu.ops.attention import _xla_attention, flash_attention


def make_qkv(rng_seed, B=2, H=4, N=128, Dh=32, dtype=jnp.float32):
    rng = np.random.default_rng(rng_seed)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, Dh)), dtype)
               for _ in range(3))
    mask = np.zeros((B, N), bool)
    mask[0, 100:] = True
    mask[1, 64:] = True
    return q, k, v, jnp.asarray(mask)


def test_matches_dense_reference():
    q, k, v, mask = make_qkv(0)
    got = flash_attention(q, k, v, mask, scale=0.125)
    want = _xla_attention(q, k, v, mask, scale=0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_no_mask():
    q, k, v, _ = make_qkv(1)
    got = flash_attention(q, k, v, None, scale=0.1)
    want = _xla_attention(q, k, v, None, scale=0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_multi_tile_sequence():
    q, k, v, mask = make_qkv(2, N=256)
    got = flash_attention(q, k, v, mask, scale=0.2)
    want = _xla_attention(q, k, v, mask, scale=0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bf16_inputs():
    q, k, v, mask = make_qkv(3, dtype=jnp.bfloat16)
    got = flash_attention(q, k, v, mask, scale=0.125)
    want = _xla_attention(q, k, v, mask, scale=0.125)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_unaligned_length_falls_back():
    q, k, v, _ = make_qkv(4, N=100)
    got = flash_attention(q, k, v, None, scale=0.1)
    want = _xla_attention(q, k, v, None, scale=0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_simnet_pallas_path_matches_xla():
    """The model's attn_impl='pallas' inference path must equal 'xla'."""
    cfg = ModelConfig(d_model=64, num_heads=4, num_layers=2, dropout=0.0,
                      max_len=256)
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 128, 1024)), jnp.float32)
    mask = jnp.zeros((2, 128), bool).at[1, 90:].set(True)
    s_xla, _ = simnet_apply(params, cfg, x, mask, attn_impl="xla")
    s_pal, _ = simnet_apply(params, cfg, x, mask, attn_impl="pallas")
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_xla),
                               rtol=1e-4, atol=1e-4)


def test_folded_kernel_matches_dense_with_padding():
    """The key-block-folded kernel (long-context path) must match the dense
    XLA attention on real rows, including a padded tail that leaves some
    key blocks entirely masked."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidsum_tpu.ops.attention import (
        _flash_attention_folded, _xla_attention)

    B, H, N, Dh = 2, 2, 512, 64
    key = jax.random.PRNGKey(3)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, N, Dh),
                                 jnp.float32) for i in range(3))
    n_real = 300  # pads out blocks 3 and 4 at kb=128 entirely
    pad = jnp.arange(N)[None] >= n_real
    pad = jnp.concatenate([pad, (jnp.arange(N) >= 200)[None]], axis=0)
    scale = float(Dh) ** -0.5
    out = _flash_attention_folded(q, k, v, pad, scale, True, 128)
    ref = _xla_attention(q, k, v, pad, scale)
    for b, nr in ((0, 300), (1, 200)):
        np.testing.assert_allclose(np.asarray(out[b, :, :nr]),
                                   np.asarray(ref[b, :, :nr]),
                                   rtol=2e-5, atol=2e-5)


def test_folded_kernel_engages_past_single_pass_budget(monkeypatch):
    """flash_attention must route past-12MB shapes to the folded kernel
    (not XLA dense — the 107 ms/HBM-OOM regression this dispatch fixed).
    Exercised end-to-end: a fat-Dh f32 shape keeps N small enough for
    interpret mode while exceeding the single-pass budget; a delegating
    spy proves the folded branch ran, and the output must equal dense."""
    import jax.numpy as jnp
    import numpy as np

    from vidsum_tpu.ops import attention as A

    B, H, N, Dh = 1, 1, 2816, 256        # 4*N*Dh*4 + 4*128*N = 13.0 MB
    assert 4 * N * Dh * 4 + 4 * A.TILE_Q * N > 12 * 1024 * 1024
    calls = []
    real_folded = A._flash_attention_folded
    monkeypatch.setattr(
        A, "_flash_attention_folded",
        lambda *a, **kw: (calls.append(a[-1]), real_folded(*a, **kw))[1])

    rng = np.random.default_rng(12)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, Dh)), jnp.float32)
               for _ in range(3))
    pad = (jnp.arange(N) >= 2700)[None]
    out = A.flash_attention(q, k, v, pad, scale=float(Dh) ** -0.5)
    assert calls == [A._pick_key_block(N)]   # folded branch, chosen kb
    ref = A._xla_attention(q, k, v, pad, scale=float(Dh) ** -0.5)
    np.testing.assert_allclose(np.asarray(out[:, :, :2700]),
                               np.asarray(ref[:, :, :2700]),
                               rtol=2e-5, atol=2e-5)
    # and the big-N structural facts the envelope relies on (bf16 flagship)
    N, Dh = 20480, 64
    assert 4 * N * Dh * 2 + 4 * A.TILE_Q * N > 12 * 1024 * 1024
    kb = A._pick_key_block(N)
    assert kb == 4096 and N % kb == 0
    assert (4 * N * Dh * 2 + 6 * A.TILE_Q * kb * 4
            + 2 * A.TILE_Q * Dh * 4) <= 80 * 1024 * 1024


def test_flash_attention_raises_past_folded_envelope():
    """ADVICE r2 #3: past the key-folded kernel's VMEM envelope the dense
    fallback cannot fit (B,H,N,N) in HBM — the dispatcher must fail loudly
    with seq-parallel guidance, not dispatch an opaque OOM. eval_shape
    traces the dispatch without allocating the multi-GB operands."""
    import jax

    big = jax.ShapeDtypeStruct((1, 4, 131072, 64), jnp.float32)
    msk = jax.ShapeDtypeStruct((1, 131072), jnp.bool_)
    with pytest.raises(ValueError, match="seq_forward|sequence"):
        jax.eval_shape(lambda q, k, v, m: flash_attention(q, k, v, m, 0.125),
                       big, big, big, msk)
