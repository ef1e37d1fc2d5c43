"""int8 (W8A8) scoring path: primitives, dense reference, fused kernel.

Contract under test (ops/quant.py + ops/block_kernel_int8.py):
- the quantized matmul is EXACT integer arithmetic (pinned vs an int64
  numpy replica of the same codes);
- the fused kernel implements bit-for-bit the same quantization decisions
  as the dense ``int8_encoder_block_xla`` reference, so the two agree to
  f32 glue round-off;
- the whole quantized scorer stays close to the f32 scorer (the lossy
  budget end-task cost is measured separately in
  scripts/study_int8_compute_accuracy.py);
- the path is inference-only and demotes in the benign direction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models import init_simnet
from vidsum_tpu.models.simnet import simnet_apply
from vidsum_tpu.ops.quant import (int8_encoder_block_xla, int8_linear,
                                  quantize_block, quantize_rows,
                                  quantize_weight)

CFG = ModelConfig(dropout=0.0)  # flagship 1024->256, 4H, 4L


def _x(b, n, rng, d=1024):
    return jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)


def test_quantize_rows_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)) * 10.0, jnp.float32)
    q, s = quantize_rows(x)
    deq = q.astype(jnp.float32) * s
    # symmetric absmax quantizer: error <= scale/2 per element
    assert np.all(np.abs(np.asarray(deq - x)) <= np.asarray(s) / 2 + 1e-6)
    assert int(np.abs(np.asarray(q)).max()) <= 127


def test_quantize_rows_zero_row_guard():
    x = jnp.zeros((4, 32), jnp.float32)
    q, s = quantize_rows(x)
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.asarray(s) == 1.0)


def test_int8_linear_matches_int64_numpy():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(33, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    wq, sw = quantize_weight(w)
    out = np.asarray(int8_linear(x, wq, sw, b))
    xq, sx = quantize_rows(x)
    acc = np.asarray(xq, np.int64) @ np.asarray(wq, np.int64)
    ref = (acc.astype(np.float32) * (np.asarray(sx) * np.asarray(sw))
           + np.asarray(b))
    np.testing.assert_array_equal(out, ref)


def test_int8_scorer_close_to_f32():
    rng = np.random.default_rng(2)
    params = init_simnet(jax.random.PRNGKey(0), CFG)
    x = _x(4, 256, rng)
    mask = jnp.asarray(np.arange(256)[None] >= np.array([256, 200, 130, 64]
                                                        )[:, None])
    s32, _ = simnet_apply(params, CFG, x, mask, deterministic=True,
                          attn_impl="xla")
    s8, _ = simnet_apply(params, CFG, x, mask, deterministic=True,
                         attn_impl="int8_xla")
    p32 = jax.nn.sigmoid(s32[..., 0])
    p8 = jax.nn.sigmoid(s8[..., 0])
    d = np.abs(np.asarray(p8 - p32))[~np.asarray(mask)]
    assert float(np.median(d)) < 2e-2
    assert float(d.max()) < 1.5e-1


@pytest.mark.parametrize("b,n", [(2, 256), (8, 128), (3, 512)])
def test_int8_kernel_matches_dense_reference(b, n):
    """fused kernel (interpret) vs dense int8 reference — covers both the
    per-element (N=512) and grouped (N=128/256) kernels.

    The int8 dots are exact and the quantizer is the identical
    expression, BUT the two run as separately-compiled XLA programs whose
    fusion can round the f32 glue differently (fma vs mul+add), and a
    1-ulp difference at a round-to-nearest boundary flips a code by one
    step — and one early-layer flip perturbs every downstream activation
    by ~one quantization step (~1e-3). The contract is therefore the
    quantization noise floor, not bit-equality: median inside one step,
    max inside a few — far inside the path's lossy budget vs f32."""
    rng = np.random.default_rng(3)
    params = init_simnet(jax.random.PRNGKey(1), CFG)
    x = _x(b, n, rng)
    lens = rng.integers(n // 2, n + 1, size=b)
    mask = jnp.asarray(np.arange(n)[None] >= lens[:, None])
    s_ref, h_ref = simnet_apply(params, CFG, x, mask, deterministic=True,
                                attn_impl="int8_xla")
    s_k, h_k = simnet_apply(params, CFG, x, mask, deterministic=True,
                            attn_impl="int8_block")
    ds = np.abs(np.asarray(s_k - s_ref))
    dh = np.abs(np.asarray(h_k - h_ref))
    assert float(np.median(ds)) < 5e-3 and float(np.median(dh)) < 5e-3
    assert float(ds.max()) < 5e-2 and float(dh.max()) < 5e-2


def test_int8_block_xla_standalone():
    """one quantized block vs its f32 twin: bounded deviation."""
    rng = np.random.default_rng(4)
    params = init_simnet(jax.random.PRNGKey(2), CFG)
    block = params["blocks"][0]
    x = jnp.asarray(rng.normal(size=(2, 128, CFG.d_model)), jnp.float32)
    qb = quantize_block(block)
    out8 = int8_encoder_block_xla(qb, x, None, CFG.num_heads, CFG.attn_scale)
    # f32 twin through the public model at num_layers=1 is awkward; use the
    # bf16 fused block's dense math via simnet's private helpers instead
    from vidsum_tpu.models.simnet import _attention, _layernorm, _mlp
    sa, _ = _attention(block["attn"], x, None, CFG, None, True, False,
                       "xla", None, None)
    h1 = _layernorm(block["ln1"], sa + x)
    ff = _mlp(block["mlp"], h1, CFG, None, True, None)
    ref = _layernorm(block["ln2"], ff + h1)
    d = np.abs(np.asarray(out8 - ref))
    assert float(np.median(d)) < 5e-2
    assert float(d.max()) < 5e-1  # post-LN keeps activations O(1)


def test_int8_odd_length_demotes_to_dense():
    rng = np.random.default_rng(5)
    params = init_simnet(jax.random.PRNGKey(3), CFG)
    x = _x(2, 130, rng)
    s_blk, _ = simnet_apply(params, CFG, x, None, deterministic=True,
                            attn_impl="int8_block")
    s_xla, _ = simnet_apply(params, CFG, x, None, deterministic=True,
                            attn_impl="int8_xla")
    np.testing.assert_array_equal(np.asarray(s_blk), np.asarray(s_xla))


def test_int8_cls_token_path():
    cfg = ModelConfig(dropout=0.0, use_cls=True)
    rng = np.random.default_rng(6)
    params = init_simnet(jax.random.PRNGKey(4), cfg)
    x = _x(2, 128, rng)
    s8, h8 = simnet_apply(params, cfg, x, None, deterministic=True,
                          attn_impl="int8_block")  # 129 -> dense demotion
    assert s8.shape == (2, 129, 1) and h8.shape == (2, 129, cfg.d_model)


def test_int8_envelope_demotes_to_lossless():
    """past the kernel VMEM envelope the path exits quantization for the
    bf16 flash ladder — identical to attn_impl='pallas'."""
    from vidsum_tpu.ops.block_kernel_int8 import fused_block_int8_supported
    n = 128
    while fused_block_int8_supported(1, n, CFG.d_model, 4) and n < 1 << 20:
        n *= 2
    rng = np.random.default_rng(7)
    params = init_simnet(jax.random.PRNGKey(5), CFG)
    x = _x(1, n, rng)
    s_demoted, _ = simnet_apply(params, CFG, x, None, deterministic=True,
                                attn_impl="int8_block")
    s_pallas, _ = simnet_apply(params, CFG, x, None, deterministic=True,
                               attn_impl="pallas")
    np.testing.assert_array_equal(np.asarray(s_demoted),
                                  np.asarray(s_pallas))


def test_int8_rejects_training_and_attn_maps():
    rng = np.random.default_rng(8)
    params = init_simnet(jax.random.PRNGKey(6), CFG)
    x = _x(1, 128, rng)
    with pytest.raises(ValueError, match="inference-only"):
        simnet_apply(params, CFG, x, None, deterministic=False,
                     rng=jax.random.PRNGKey(0), attn_impl="int8_xla")
    with pytest.raises(ValueError, match="attention"):
        simnet_apply(params, CFG, x, None, deterministic=True,
                     return_attn=True, attn_impl="int8_xla")


def test_int8_eval_forward_maker():
    from vidsum_tpu.train.steps import make_eval_forward
    rng = np.random.default_rng(9)
    params = init_simnet(jax.random.PRNGKey(7), CFG)
    fwd = make_eval_forward(CFG, attn_impl="int8_xla")
    x = _x(2, 128, rng)
    mask = jnp.zeros((2, 128), bool)
    out = np.asarray(fwd(params, x, mask))
    assert out.shape == (2, 128)
    assert np.all((out >= 0) & (out <= 1))
