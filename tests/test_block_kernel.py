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


# ---- shape-aware impl demotion (long-video dense path) ---------------------

def test_fused_block_support_predicates():
    from vidsum_tpu.ops.block_kernel import fused_block_supported
    from vidsum_tpu.ops.block_train import fused_block_train_supported

    # flagship shapes are inside both envelopes
    assert fused_block_supported(32, 512, 256, 2)
    assert fused_block_train_supported(32, 512, 256, 4)
    # measured edges on v5e (PERF.md long-context envelope): the inference
    # block kernel guards off by ~8k at d=256; the train kernels run at
    # N=5120 and fail at N=10240
    assert not fused_block_supported(1, 10240, 256, 4)
    assert fused_block_train_supported(1, 5120, 256, 4)
    assert not fused_block_train_supported(1, 10240, 256, 4)
    # non-128-multiple sequence lengths are never kernel shapes
    assert not fused_block_supported(4, 130, 256, 4)
    assert not fused_block_train_supported(4, 130, 256, 4)


def test_pallas_block_demotes_past_vmem_envelope():
    """attn_impl='pallas_block' on a shape past the block kernel's VMEM
    guard must NOT raise — it demotes to the flash kernels and matches the
    XLA path (previously: ValueError from fused_encoder_block)."""
    import jax
    import jax.numpy as jnp

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet, simnet_apply
    from vidsum_tpu.ops.block_kernel import fused_block_supported

    cfg = ModelConfig(d_model=512, num_heads=4, num_layers=1, dropout=0.0)
    N = 2560
    assert not fused_block_supported(1, N, cfg.d_model, 4)  # past the guard
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N, 1024), jnp.float32)
    mask = jnp.zeros((1, N), bool)
    s_pb, _ = simnet_apply(params, cfg, x, mask, attn_impl="pallas_block")
    s_xla, _ = simnet_apply(params, cfg, x, mask, attn_impl="xla")
    import numpy as np
    np.testing.assert_allclose(np.asarray(s_pb), np.asarray(s_xla),
                               atol=2e-3)
