"""Sequence-parallel TRAINING (ring attention + hash-mask dropout) vs a
dense single-device replay applying the identical masks, on the
8-virtual-device CPU mesh.

The seq-sharded step's dropout is coordinate-absolute (global batch/row/
query/key indices hash to each mask bit), so its loss/gradients must be
invariant to the mesh shape and bit-comparable to a dense step that injects
the same masks via ``simnet_apply(dropout_masks=...)``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models.simnet import init_simnet, simnet_apply
from vidsum_tpu.ops.block_train import S_MLP, S_RES1, S_RES2
from vidsum_tpu.ops.losses import mse_with_mask_loss
from vidsum_tpu.parallel.ring_attention import ring_hash_keep
from vidsum_tpu.parallel.seq_forward import (
    hash_keep3d, make_seq_sharded_finetune_step,
)
from vidsum_tpu.train.steps import make_optimizer

CFG = ModelConfig(d_model=32, num_heads=4, num_layers=2, dropout=0.3,
                  max_len=128)
B, N = 4, 64


def fresh(tree):
    """Deep-copy device buffers: the step donates params/opt_state."""
    return jax.tree_util.tree_map(jnp.array, tree)


def make_mesh(data, seq):
    devices = np.asarray(jax.devices()[: data * seq]).reshape(data, seq)
    return Mesh(devices, ("data", "seq"))


def make_batch(seed=0, pad_from=56):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, 1024)), jnp.float32)
    t = jnp.asarray(rng.random((B, N)), jnp.float32)
    mask = jnp.asarray((np.arange(N)[None, :] >= pad_from)
                       * np.ones((B, 1), bool))
    return x, t, mask


def dense_masks(rng_key, cfg=CFG, b=B, n=N):
    """The same per-layer masks the seq step derives, built densely."""
    seeds = jax.random.randint(rng_key, (cfg.num_layers,), 0, 2 ** 31 - 1,
                               jnp.int32)
    hid = cfg.d_model * cfg.mlp_scale
    return [{
        "attn": ring_hash_keep(seeds[li], 0, 0, 0,
                               (b, cfg.num_heads, n, n), cfg.dropout),
        "res1": hash_keep3d(seeds[li], S_RES1, 0, 0, (b, n, cfg.d_model),
                            cfg.dropout),
        "mlp": hash_keep3d(seeds[li], S_MLP, 0, 0, (b, n, hid), cfg.dropout),
        "res2": hash_keep3d(seeds[li], S_RES2, 0, 0, (b, n, cfg.d_model),
                            cfg.dropout),
    } for li in range(cfg.num_layers)]


def dense_step(params, opt_state, x, t, mask, rng_key, optimizer):
    masks = dense_masks(rng_key)

    def loss_fn(p):
        scores, _ = simnet_apply(p, CFG, x, mask, deterministic=False,
                                 dropout_masks=masks)
        return mse_with_mask_loss(scores, t, mask)

    import optax
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


@pytest.mark.parametrize("data,seq", [(2, 2), (1, 4), (2, 4)])
def test_seq_train_matches_dense_replay(data, seq):
    """Loss AND updated params of the seq-sharded step equal a dense
    single-device step applying the identical hash masks."""
    optimizer = make_optimizer(1e-3, 1e-4)
    params = init_simnet(jax.random.PRNGKey(0), CFG)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(7)
    x, t, mask = make_batch()

    step = make_seq_sharded_finetune_step(CFG, optimizer, make_mesh(data, seq))
    p_seq, _, loss_seq = step(fresh(params), fresh(opt_state), x, t, mask, key)

    p_ref, _, loss_ref = dense_step(fresh(params),
                                    optimizer.init(fresh(params)), x, t,
                                    mask, key, optimizer)
    np.testing.assert_allclose(float(loss_seq), float(loss_ref),
                               rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_seq),
                    jax.tree_util.tree_leaves(p_ref)):
        # f32 reassociation (ring online softmax vs dense softmax) passes
        # through Adam's rsqrt normalizer; observed worst case ~9e-4 rel on
        # isolated elements with near-zero grads
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-6)


def test_seq_train_mesh_shape_invariant():
    """The realized loss is identical across mesh shapes (coordinate-
    absolute masks): (1,4) vs (4,1) vs (2,2)."""
    optimizer = make_optimizer(1e-3, 1e-4)
    params = init_simnet(jax.random.PRNGKey(1), CFG)
    key = jax.random.PRNGKey(11)
    x, t, mask = make_batch(seed=3)
    losses = []
    for data, seq in [(1, 4), (4, 1), (2, 2)]:
        step = make_seq_sharded_finetune_step(CFG, optimizer,
                                              make_mesh(data, seq))
        _, _, loss = step(fresh(params), optimizer.init(fresh(params)), x, t,
                          mask, key)
        losses.append(float(loss))
    np.testing.assert_allclose(losses[1], losses[0], rtol=2e-5)
    np.testing.assert_allclose(losses[2], losses[0], rtol=2e-5)


def test_seq_train_optimizes():
    """Multi-step seq-parallel training reduces the loss."""
    optimizer = make_optimizer(1e-2, 0.0)
    params = init_simnet(jax.random.PRNGKey(2), CFG)
    opt_state = optimizer.init(params)
    step = make_seq_sharded_finetune_step(CFG, optimizer, make_mesh(2, 2))
    x, t, mask = make_batch(seed=5)
    key = jax.random.PRNGKey(3)
    first = last = None
    for i in range(8):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, t, mask, sub)
        loss = float(loss)
        first = loss if first is None else first
        last = loss
    assert last < first * 0.8, (first, last)


def test_fully_padded_row_finite_grads():
    """A batch row that is ALL padding (e.g. batch padded for data-axis
    divisibility) must not poison gradients: the forward's where() guard
    alone leaves a 0/0 in the VJP of o/l. Regression for the safe-
    denominator fix in ring_attention_train."""
    optimizer = make_optimizer(1e-3, 0.0)
    params = init_simnet(jax.random.PRNGKey(0), CFG)
    x, t, _ = make_batch(seed=8)
    mask = np.zeros((B, N), bool)
    mask[1, :] = True  # row 1 entirely padded
    step = make_seq_sharded_finetune_step(CFG, optimizer, make_mesh(1, 2))
    p2, _, loss = step(fresh(params), optimizer.init(fresh(params)), x, t,
                       jnp.asarray(mask), jax.random.PRNGKey(9))
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(p2):
        assert np.isfinite(np.asarray(leaf)).all()


def test_hash_mask_goldens():
    """Pin the hash functions' exact bits: these masks are part of replay
    determinism (a resumed run must regenerate identical dropout), so any
    change to the mixing constants must be deliberate and show up here."""
    k1 = np.asarray(ring_hash_keep(jnp.int32(1234), 3, 5, 7, (2, 2, 4, 4),
                                   0.3))
    assert np.packbits(k1.reshape(-1)).tolist() == [
        133, 241, 218, 246, 251, 242, 176, 111]
    k2 = np.asarray(hash_keep3d(jnp.int32(99), 33, 1, 2, (2, 3, 4), 0.5))
    assert np.packbits(k2.reshape(-1)).tolist() == [144, 240, 38]


def test_hash_keep3d_matches_fused_kernel_hash():
    """Per fixed batch index, hash_keep3d is bit-identical to the fused
    kernels' _hash_keep (same mixing, so dense replays of fused-kernel runs
    can share mask code)."""
    from vidsum_tpu.ops.block_train import _hash_keep

    seed = jnp.int32(4242)
    full = np.asarray(hash_keep3d(seed, S_RES1, 2, 8, (3, 16, 32), 0.3))
    for b in range(3):
        ref = np.asarray(_hash_keep(seed, S_RES1, 2 + b, 8, (16, 32), 0.3))
        np.testing.assert_array_equal(full[b], ref)


def test_seq_train_beyond_pe_table():
    """Training at N=2560 > max_len 2000 over 8 seq shards: the PE table
    must size to the GLOBAL length (the round-2 seq-forward bug class) and
    the step must optimize. Dense replay at this size is ~B*H*N^2 f32 —
    checked against the dense step at dropout 0 instead."""
    cfg = ModelConfig(d_model=32, num_heads=2, num_layers=1, dropout=0.0,
                      max_len=2000)
    optimizer = make_optimizer(1e-3, 0.0)
    params = init_simnet(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(9)
    b, n = 1, 2560
    x = jnp.asarray(rng.normal(size=(b, n, 1024)), jnp.float32)
    t = jnp.asarray(rng.random((b, n)), jnp.float32)
    mask = jnp.asarray((np.arange(n)[None, :] >= 2400) * np.ones((b, 1), bool))

    step = make_seq_sharded_finetune_step(cfg, optimizer, make_mesh(1, 8))
    _, _, loss_seq = step(fresh(params), optimizer.init(fresh(params)),
                          x, t, mask, jax.random.PRNGKey(5))

    def dense_loss(p):
        scores, _ = simnet_apply(p, cfg, x, mask, deterministic=True)
        return mse_with_mask_loss(scores, t, mask)

    loss_ref = float(dense_loss(params))
    np.testing.assert_allclose(float(loss_seq), loss_ref, rtol=2e-4)


def test_ring_dropout_keep_rate():
    """Realized attention keep-rate ~ 1-rate over global coordinates."""
    keep = np.asarray(ring_hash_keep(jnp.int32(1234), 0, 0, 0,
                                     (4, 4, 64, 64), 0.3))
    rate = 1.0 - keep.mean()
    assert abs(rate - 0.3) < 0.01, rate


def _ring_train_both(block_impl, q, k, v, pm, seed, rate, seq=4):
    """Run ring_attention_train under shard_map on a 1x`seq` mesh."""
    from jax.sharding import PartitionSpec as P
    from vidsum_tpu.parallel.ring_attention import ring_attention_train

    devices = np.asarray(jax.devices()[:seq]).reshape(seq)
    mesh = Mesh(devices, ("seq",))

    def local(q, k, v, pm):
        return ring_attention_train(q, k, v, pm, 0.177, "seq", seed, rate,
                                    b0=0, block_impl=block_impl)

    spec = P(None, None, "seq", None)
    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec, P(None, "seq")),
        out_specs=spec, check_vma=False))(q, k, v, pm)


@pytest.mark.parametrize("rate", [0.0, 0.3])
def test_fused_ring_train_forward_matches_xla(rate):
    """The custom-VJP fused ring (per-step Pallas kernels, VERDICT r1 #3)
    must produce the XLA ring's outputs bit-closely — including in-kernel
    hash dropout and fully padded rows."""
    rng = np.random.default_rng(31)
    B, H, Nw, Dh = 2, 4, 512, 32   # Nl = 128 per shard (TILE_Q)
    q = jnp.asarray(rng.normal(size=(B, H, Nw, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, Nw, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, Nw, Dh)), jnp.float32)
    pm = jnp.asarray(np.arange(Nw)[None, :] >= 400) | jnp.zeros((B, 1), bool)
    pm = pm.at[1, :].set(True)     # one fully padded batch row
    seed = jnp.int32(1234)

    out_x = _ring_train_both("xla", q, k, v, pm, seed, rate)
    out_p = _ring_train_both("pallas", q, k, v, pm, seed, rate)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("rate", [0.0, 0.3])
def test_fused_ring_train_grads_match_xla(rate):
    """dq/dk/dv of the fused ring's custom VJP equal the XLA ring's
    autodiff gradients."""
    rng = np.random.default_rng(32)
    B, H, Nw, Dh = 2, 4, 512, 32
    q = jnp.asarray(rng.normal(size=(B, H, Nw, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, Nw, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, Nw, Dh)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, H, Nw, Dh)), jnp.float32)
    pm = jnp.asarray(np.arange(Nw)[None, :] >= 448) | jnp.zeros((B, 1), bool)
    seed = jnp.int32(77)

    def loss(impl):
        def f(q, k, v):
            out = _ring_train_both(impl, q, k, v, pm, seed, rate)
            return jnp.sum(out * w)
        return f

    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6,
                                   err_msg=f"d{name} rate={rate}")


def test_seq_train_step_fused_matches_xla_step():
    """Full sequence-parallel TRAIN step (model + losses + Adam) through
    the fused ring path == the XLA ring path: loss and updated params."""
    cfg = ModelConfig(d_model=32, num_heads=4, num_layers=2, dropout=0.3,
                      max_len=512)
    b, n = 2, 512
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(b, n, 1024)), jnp.float32)
    t = jnp.asarray(rng.random((b, n)), jnp.float32)
    mask = jnp.asarray((np.arange(n)[None, :] >= 460)
                       * np.ones((b, 1), bool))
    key = jax.random.PRNGKey(21)
    optimizer = make_optimizer(1e-3, 1e-4)
    params = init_simnet(jax.random.PRNGKey(5), cfg)

    mesh = make_mesh(2, 4)
    step_x = make_seq_sharded_finetune_step(cfg, optimizer, mesh,
                                            block_impl="xla")
    step_p = make_seq_sharded_finetune_step(cfg, optimizer, mesh,
                                            block_impl="pallas")
    px, _, lx = step_x(fresh(params), optimizer.init(fresh(params)),
                       x, t, mask, key)
    pp, _, lp = step_p(fresh(params), optimizer.init(fresh(params)),
                       x, t, mask, key)
    np.testing.assert_allclose(float(lp), float(lx), rtol=2e-5)
    for a, c in zip(jax.tree_util.tree_leaves(pp),
                    jax.tree_util.tree_leaves(px)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=5e-6)


@pytest.mark.skipif(not os.environ.get("VIDSUM_RUN_40K"),
                    reason="~10 min single-core; set VIDSUM_RUN_40K=1 "
                           "(demonstration recorded in PERF.md round 3)")
def test_ring_train_carries_global_n40960():
    """VERDICT r2 #4: the designed escape for the >35k single-chip train
    regime — the sequence-parallel ring at global N=40,960 (8 seq shards x
    5,120, inside the fused ring's per-shard envelope) runs a real train
    step and learns. One-time demonstration measured 2026-08-18: step 1
    loss 0.6345, step 2 loss 0.3604 (~312 s/step on the single-core CPU
    harness; the TPU path uses block_impl='pallas')."""
    from jax.sharding import Mesh

    from vidsum_tpu.parallel.seq_forward import make_seq_sharded_finetune_step
    from vidsum_tpu.train.steps import make_optimizer

    cfg = ModelConfig(d_model=64, num_heads=4, num_layers=1, dropout=0.0,
                      max_len=40960)
    mesh = Mesh(np.array(jax.devices()).reshape(1, 8), ("data", "seq"))
    optimizer = make_optimizer(1e-3, 0.0)
    step = make_seq_sharded_finetune_step(cfg, optimizer, mesh,
                                          block_impl="xla")
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    N = 40960
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, N, 1024)).astype(np.float32))
    t = jnp.asarray(rng.random((1, N)).astype(np.float32))
    m = jnp.zeros((1, N), bool).at[:, N - 100:].set(True)
    opt_state = jax.jit(optimizer.init)(params)
    p2, o2, l1 = step(params, opt_state, x, t, m, jax.random.PRNGKey(1))
    _, _, l2 = step(p2, o2, x, t, m, jax.random.PRNGKey(2))
    assert np.isfinite(float(l1)) and float(l2) < float(l1)
