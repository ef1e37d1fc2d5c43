"""Fused encoder-block kernel vs the XLA block (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models import init_simnet, simnet_apply
from vidsum_tpu.models.simnet import _init_block
from vidsum_tpu.ops.block_kernel import fused_encoder_block

CFG = ModelConfig(d_model=64, num_heads=4, num_layers=2, dropout=0.0,
                  max_len=256)


def reference_block(block, x, pad_mask, cfg):
    from vidsum_tpu.models.simnet import _attention, _layernorm, _mlp
    sa, _ = _attention(block["attn"], x, pad_mask, cfg, None, True, False,
                       "xla")
    x = _layernorm(block["ln1"], sa + x)
    ff = _mlp(block["mlp"], x, cfg, None, True)
    return _layernorm(block["ln2"], ff + x)


def test_fused_block_matches_xla():
    block = _init_block(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 128, 64)), jnp.float32)
    mask = jnp.zeros((2, 128), bool).at[1, 100:].set(True)
    got = fused_encoder_block(block, x, mask, CFG.num_heads, CFG.attn_scale)
    want = reference_block(block, x, mask, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_block_multi_tile():
    block = _init_block(jax.random.PRNGKey(1), CFG)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 256, 64)), jnp.float32)
    mask = jnp.zeros((1, 256), bool).at[0, 200:].set(True)
    got = fused_encoder_block(block, x, mask, CFG.num_heads, CFG.attn_scale)
    want = reference_block(block, x, mask, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_full_model_pallas_block_path():
    params = init_simnet(jax.random.PRNGKey(2), CFG)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 128, 1024)), jnp.float32)
    mask = jnp.zeros((2, 128), bool).at[0, 90:].set(True)
    want, _ = simnet_apply(params, CFG, x, mask, attn_impl="xla")
    got, _ = simnet_apply(params, CFG, x, mask, attn_impl="pallas_block")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_block_bf16():
    block = _init_block(jax.random.PRNGKey(3), CFG)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 128, 64)), jnp.bfloat16)
    got = fused_encoder_block(block, x, None, CFG.num_heads, CFG.attn_scale)
    want = reference_block(block, x, None, CFG)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)
