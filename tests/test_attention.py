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
