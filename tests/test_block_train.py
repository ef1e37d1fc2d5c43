"""Trainable fused encoder block: fwd + full gradient set vs the dense XLA
reference applying identical hash masks."""

import jax
import jax.numpy as jnp
import numpy as np

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models.simnet import _init_block
from vidsum_tpu.ops.block_train import (
    block_reference_with_masks, fused_block_train,
)

CFG = ModelConfig(d_model=64, num_heads=4, num_layers=1)
B, N, D = 2, 128, 64
RATE = 0.2
SCALE = CFG.attn_scale


def make_inputs(seed_int=7):
    rng = np.random.default_rng(seed_int)
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    bm = np.zeros((B, N), bool)
    bm[1, 100:] = True
    mask8 = jnp.asarray(bm.astype(np.int8))[:, None, :]
    block = _init_block(jax.random.PRNGKey(3), CFG)
    return x, jnp.asarray(bm), mask8, block, jnp.asarray([[99]], jnp.int32)


def test_forward_matches_masked_reference():
    x, bm, mask8, block, seed = make_inputs()
    got = fused_block_train(x, block, mask8, seed, CFG.num_heads, SCALE, RATE)
    want = block_reference_with_masks(x, block, bm, 99, CFG.num_heads, SCALE,
                                      RATE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_rate_zero():
    x, bm, mask8, block, seed = make_inputs(8)
    got = fused_block_train(x, block, mask8, seed, CFG.num_heads, SCALE, 0.0)
    want = block_reference_with_masks(x, block, bm, 99, CFG.num_heads, SCALE,
                                      0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_all_gradients_match_masked_reference():
    x, bm, mask8, block, seed = make_inputs(9)
    co = jnp.asarray(np.random.default_rng(10).normal(size=(B, N, D)),
                     jnp.float32)

    def f_fused(x, block):
        return jnp.sum(fused_block_train(x, block, mask8, seed,
                                         CFG.num_heads, SCALE, RATE) * co)

    def f_ref(x, block):
        return jnp.sum(block_reference_with_masks(
            x, block, bm, 99, CFG.num_heads, SCALE, RATE) * co)

    (gx_f, gp_f) = jax.grad(f_fused, argnums=(0, 1))(x, block)
    (gx_r, gp_r) = jax.grad(f_ref, argnums=(0, 1))(x, block)

    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-4, err_msg="dx")
    flat_f = jax.tree_util.tree_leaves_with_path(gp_f)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(gp_r))
    for path, leaf in flat_f:
        ref = flat_r[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), rtol=2e-3, atol=2e-4,
            err_msg=f"param grad {jax.tree_util.keystr(path)}")


def test_gradients_match_rate_zero():
    """rate=0 must also equal the plain XLA block's gradients."""
    x, bm, mask8, block, seed = make_inputs(11)
    co = jnp.asarray(np.random.default_rng(12).normal(size=(B, N, D)),
                     jnp.float32)

    from tests.test_block_kernel import reference_block

    def f_fused(x, block):
        return jnp.sum(fused_block_train(x, block, mask8, seed,
                                         CFG.num_heads, SCALE, 0.0) * co)

    def f_plain(x, block):
        return jnp.sum(reference_block(block, x, bm, CFG) * co)

    (gx_f, gp_f) = jax.grad(f_fused, argnums=(0, 1))(x, block)
    (gx_r, gp_r) = jax.grad(f_plain, argnums=(1, 0))(block, x)[::-1] \
        if False else jax.grad(f_plain, argnums=(0, 1))(x, block)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-4)
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(gp_f),
            jax.tree_util.tree_leaves_with_path(gp_r)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(pa))


def test_training_step_through_fused_block():
    """Full train step with attn_impl='pallas_block' (whole-block fused
    fwd+bwd): loss decreases, grads flow to every parameter."""
    from vidsum_tpu.models import init_simnet
    from vidsum_tpu.train.steps import make_finetune_step, make_optimizer

    cfg = ModelConfig(d_model=64, num_heads=4, num_layers=2, dropout=0.3,
                      max_len=128)
    opt = make_optimizer(1e-3, 1e-4)
    step = make_finetune_step(cfg, opt, attn_impl="pallas_block")
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    p0 = jax.tree_util.tree_map(np.asarray, params)
    opt_state = opt.init(params)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(2, 128, 1024)), jnp.float32)
    t = jnp.asarray(rng.random((2, 128)), jnp.float32)
    m = jnp.zeros((2, 128), bool).at[1, 100:].set(True)
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(6):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, t, m, sub)
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    # every parameter moved (grads reached the whole tree)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p0),
            jax.tree_util.tree_leaves_with_path(params)):
        assert not np.allclose(a, np.asarray(b)), jax.tree_util.keystr(pa)


def test_bf16_compute_matches_bf16_reference():
    """bf16 inputs are accepted (cast to f32 on load — the kernels pin f32
    matmul operands because bf16 operands measured slower on v5e, see
    ops/block_train._mm). Forward and the full gradient set must match the
    dense reference computing with the identical dtype contract and hash
    masks; only the bf16 I/O rounding separates them."""
    x, bm, mask8, block, seed = make_inputs()
    xb = x.astype(jnp.bfloat16)

    got = fused_block_train(xb, block, mask8, seed, CFG.num_heads, SCALE,
                            RATE)
    want = block_reference_with_masks(xb, block, bm, 99, CFG.num_heads,
                                      SCALE, RATE)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)

    # random cotangent: sum() alone is degenerate through the final LN
    co = jnp.asarray(np.random.default_rng(14).normal(size=(B, N, D)),
                     jnp.float32)

    def f_fused(x, blk):
        return jnp.sum(fused_block_train(x, blk, mask8, seed, CFG.num_heads,
                                         SCALE, RATE).astype(jnp.float32)
                       * co)

    def f_ref(x, blk):
        return jnp.sum(block_reference_with_masks(
            x, blk, bm, 99, CFG.num_heads, SCALE,
            RATE).astype(jnp.float32) * co)

    gx, gw = jax.grad(f_fused, argnums=(0, 1))(xb, block)
    rx, rw = jax.grad(f_ref, argnums=(0, 1))(xb, block)
    np.testing.assert_allclose(np.asarray(gx, np.float32),
                               np.asarray(rx, np.float32),
                               rtol=1e-1, atol=1e-1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-1, atol=2e-1),
        gw, rw)


def test_grouped_kernels_match_reference_and_ungrouped():
    """B=8 × N=128 selects the grouped kernels (8 elements per grid cell,
    row-batched linear ops). The hash-mask coordinates are per-element
    absolute, so fwd + the full gradient set must match the dense reference
    AND stay numerically equivalent to the per-element kernel path."""
    import vidsum_tpu.ops.block_train as bt

    Bg, Ng = 8, 128
    assert bt._pick_train_group(Bg, Ng) == 8
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(Bg, Ng, D)), jnp.float32)
    bm = np.zeros((Bg, Ng), bool)
    for b in range(Bg):            # ragged: each element its own pad run
        bm[b, Ng - 3 * b - 1:] = b % 2 == 1
    mask8 = jnp.asarray(bm.astype(np.int8))[:, None, :]
    block = _init_block(jax.random.PRNGKey(5), CFG)
    seed = jnp.asarray([[123]], jnp.int32)
    co = jnp.asarray(np.random.default_rng(32).normal(size=(Bg, Ng, D)),
                     jnp.float32)

    def f_fused(x, blk):
        return jnp.sum(fused_block_train(x, blk, mask8, seed, CFG.num_heads,
                                         SCALE, RATE) * co)

    def f_ref(x, blk):
        return jnp.sum(block_reference_with_masks(
            x, blk, jnp.asarray(bm), 123, CFG.num_heads, SCALE, RATE) * co)

    got = fused_block_train(x, block, mask8, seed, CFG.num_heads, SCALE, RATE)
    want = block_reference_with_masks(x, block, jnp.asarray(bm), 123,
                                      CFG.num_heads, SCALE, RATE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    gx, gw = jax.grad(f_fused, argnums=(0, 1))(x, block)
    rx, rw = jax.grad(f_ref, argnums=(0, 1))(x, block)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-3, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-3, atol=2e-4),
        gw, rw)

    # dispatch equivalence: force the per-element path on the same inputs
    orig = bt._pick_train_group
    bt._pick_train_group = lambda B_, N_: 1
    bt._forward.clear_cache()
    bt._backward.clear_cache()
    try:
        got1 = fused_block_train(x, block, mask8, seed, CFG.num_heads,
                                 SCALE, RATE)
        gx1, gw1 = jax.grad(f_fused, argnums=(0, 1))(x, block)
    finally:
        bt._pick_train_group = orig
        bt._forward.clear_cache()
        bt._backward.clear_cache()
    np.testing.assert_allclose(np.asarray(got), np.asarray(got1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx1),
                               rtol=1e-3, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-3, atol=2e-4),
        gw, gw1)


def test_forward_large_tile_matches_reference():
    """N=256 selects the 256-wide fwd query tile (bwd stays at 128); the
    fwd/bwd hash masks are absolute-coordinate so mixed tiling must stay
    exact vs the dense reference."""
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(1, 256, D)), jnp.float32)
    bm = np.zeros((1, 256), bool)
    bm[0, 230:] = True
    mask8 = jnp.asarray(bm.astype(np.int8))[:, None, :]
    block = _init_block(jax.random.PRNGKey(4), CFG)
    seed = jnp.asarray([[55]], jnp.int32)

    got = fused_block_train(x, block, mask8, seed, CFG.num_heads, SCALE, RATE)
    want = block_reference_with_masks(x, block, jnp.asarray(bm), 55,
                                      CFG.num_heads, SCALE, RATE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def f_fused(x, blk):
        return jnp.sum(fused_block_train(x, blk, mask8, seed, CFG.num_heads,
                                         SCALE, RATE) ** 2)

    def f_ref(x, blk):
        return jnp.sum(block_reference_with_masks(
            x, blk, jnp.asarray(bm), 55, CFG.num_heads, SCALE, RATE) ** 2)

    gx, gw = jax.grad(f_fused, argnums=(0, 1))(x, block)
    rx, rw = jax.grad(f_ref, argnums=(0, 1))(x, block)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-3, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-3, atol=2e-4),
        gw, rw)
