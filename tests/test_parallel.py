"""Multi-device sharding tests on the 8-virtual-CPU mesh (conftest.py sets
xla_force_host_platform_device_count=8 — the standard JAX fake-multi-device
harness replacing the reference's nonexistent multi-node story,
SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsum_tpu.config import MeshConfig, ModelConfig, PretrainConfig
from vidsum_tpu.models import init_simnet, simnet_apply
from vidsum_tpu.models.pretrain import init_pretrain_model
from vidsum_tpu.parallel import (
    batch_sharding, make_mesh, make_sharded_finetune_step, param_shardings,
    shard_params,
)
from vidsum_tpu.parallel.train_parallel import make_sharded_pretrain_step
from vidsum_tpu.train.steps import make_finetune_step, make_optimizer

CFG = ModelConfig(d_model=64, num_heads=4, num_layers=2, dropout=0.0,
                  max_len=128)


def make_batch(rng_seed=0, B=8, N=32):
    rng = np.random.default_rng(rng_seed)
    x = rng.normal(size=(B, N, 1024)).astype(np.float32)
    t = rng.random((B, N)).astype(np.float32)
    mask = np.zeros((B, N), bool)
    mask[:, 24:] = True
    return x, t, mask


def test_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=-1, model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(MeshConfig(data=8, model=1))
    assert mesh.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=3, model=2))


def test_tp_sharded_forward_matches_single_device():
    """Tensor-parallel forward must equal the unsharded forward."""
    params = init_simnet(jax.random.PRNGKey(0), CFG)
    x, t, mask = make_batch()
    want, _ = simnet_apply(params, CFG, jnp.asarray(x), jnp.asarray(mask))

    mesh = make_mesh(MeshConfig(data=2, model=4))
    sharded = shard_params(params, mesh)
    got, _ = jax.jit(lambda p, xx, mm: simnet_apply(p, CFG, xx, mm))(
        sharded,
        jax.device_put(jnp.asarray(x), batch_sharding(mesh, 3)),
        jax.device_put(jnp.asarray(mask), batch_sharding(mesh, 2)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_param_shardings_cover_tree():
    params = init_simnet(jax.random.PRNGKey(0), CFG)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    shardings = param_shardings(params, mesh)
    p_leaves = jax.tree_util.tree_leaves(params)
    s_leaves = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: hasattr(x, "spec"))
    assert len(p_leaves) == len(s_leaves)


@pytest.mark.parametrize("mesh_cfg", [MeshConfig(data=8, model=1),
                                      MeshConfig(data=2, model=4)])
def test_sharded_train_step_matches_single_device(mesh_cfg):
    """One dp(/tp) step must produce the same loss and params as one
    single-device step (dropout off; partitionable RNG keeps draws equal)."""
    optimizer = make_optimizer(1e-3, 1e-4)
    params = init_simnet(jax.random.PRNGKey(1), CFG)
    x, t, mask = make_batch(1)
    rng = jax.random.PRNGKey(7)

    ref_step = make_finetune_step(CFG, optimizer)
    ref_params, _, ref_loss = ref_step(
        jax.tree_util.tree_map(jnp.copy, params), optimizer.init(params),
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask), rng)

    mesh = make_mesh(mesh_cfg)
    init_fn, step_fn = make_sharded_finetune_step(CFG, optimizer, mesh)
    sp, so = init_fn(params)
    sp, so, loss = step_fn(sp, so, jnp.asarray(x), jnp.asarray(t),
                           jnp.asarray(mask), rng)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_sharded_pretrain_step_runs():
    mcfg = dataclasses.replace(CFG, dropout=0.1)
    pcfg = PretrainConfig()
    mesh = make_mesh(MeshConfig(data=2, model=4))
    optimizer = make_optimizer(1e-3, 5e-4)
    params = init_pretrain_model(jax.random.PRNGKey(2), mcfg)
    init_fn, step_fn = make_sharded_pretrain_step(mcfg, pcfg, optimizer, mesh)
    sp, so = init_fn(params)
    x, _, mask = make_batch(2)
    v = np.random.default_rng(3).normal(size=(8, 512)).astype(np.float32)
    sp, so, losses = step_fn(sp, so, jnp.asarray(x), jnp.asarray(v),
                             jnp.asarray(mask), jax.random.PRNGKey(0))
    assert all(np.isfinite(float(l)) for l in losses)


def test_grad_sync_across_data_axis():
    """With identical per-shard batches, dp step == single-item step: the
    gradient all-reduce over `data` must average, not sum."""
    optimizer = make_optimizer(1e-2, 0.0)
    params = init_simnet(jax.random.PRNGKey(3), CFG)
    rng = jax.random.PRNGKey(0)
    x1, t1, m1 = make_batch(4, B=1)
    x8 = np.repeat(x1, 8, 0)
    t8 = np.repeat(t1, 8, 0)
    m8 = np.repeat(m1, 8, 0)

    ref_step = make_finetune_step(CFG, optimizer)
    ref_params, _, _ = ref_step(
        jax.tree_util.tree_map(jnp.copy, params), optimizer.init(params),
        jnp.asarray(x1), jnp.asarray(t1), jnp.asarray(m1), rng)

    mesh = make_mesh(MeshConfig(data=8, model=1))
    init_fn, step_fn = make_sharded_finetune_step(CFG, optimizer, mesh)
    sp, so = init_fn(params)
    sp, _, _ = step_fn(sp, so, jnp.asarray(x8), jnp.asarray(t8),
                       jnp.asarray(m8), rng)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_sharded_pretrain_step_matches_single_device():
    """dp×tp pretrain step == single-device step (dropout off)."""
    from vidsum_tpu.models.pretrain import init_pretrain_model
    from vidsum_tpu.train.steps import make_pretrain_step

    mcfg = dataclasses.replace(CFG, dropout=0.0)
    pcfg = PretrainConfig()
    optimizer = make_optimizer(1e-3, 5e-4)
    params = init_pretrain_model(jax.random.PRNGKey(9), mcfg)
    x, _, mask = make_batch(9)
    v = jnp.asarray(np.random.default_rng(10).normal(size=(8, 512)),
                    jnp.float32)
    rng = jax.random.PRNGKey(3)

    ref_step = make_pretrain_step(mcfg, pcfg, optimizer)
    ref_params, _, ref_losses = ref_step(
        jax.tree_util.tree_map(jnp.copy, params), optimizer.init(params),
        jnp.asarray(x), v, jnp.asarray(mask), rng)

    mesh = make_mesh(MeshConfig(data=2, model=4))
    init_fn, step_fn = make_sharded_pretrain_step(mcfg, pcfg, optimizer, mesh)
    sp, so = init_fn(params)
    sp, so, losses = step_fn(sp, so, jnp.asarray(x), v, jnp.asarray(mask),
                             rng)
    for a, b in zip(losses, ref_losses):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=7e-4, atol=7e-4)


def test_dp_shardmap_step_matches_single_device():
    """shard_map dp step (the fused-kernel multi-chip path) == single-device
    step at dropout 0 (identical per-device rng folding is irrelevant then)."""
    from jax.sharding import Mesh
    from vidsum_tpu.parallel.dp_shardmap import make_dp_shardmap_finetune_step

    optimizer = make_optimizer(1e-3, 1e-4)
    params = init_simnet(jax.random.PRNGKey(21), CFG)
    x, t, mask = make_batch(21, B=8, N=128)
    rng = jax.random.PRNGKey(5)

    ref_step = make_finetune_step(CFG, optimizer)
    ref_params, _, ref_loss = ref_step(
        jax.tree_util.tree_map(jnp.copy, params), optimizer.init(params),
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask), rng)

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    step = make_dp_shardmap_finetune_step(CFG, optimizer, mesh,
                                          attn_impl="pallas")
    sp, so, loss = step(jax.tree_util.tree_map(jnp.copy, params),
                        optimizer.init(params), jnp.asarray(x),
                        jnp.asarray(t), jnp.asarray(mask), rng)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_dp_shardmap_step_with_dropout_runs():
    from jax.sharding import Mesh
    from vidsum_tpu.parallel.dp_shardmap import make_dp_shardmap_finetune_step

    cfg = dataclasses.replace(CFG, dropout=0.3)
    optimizer = make_optimizer(1e-3, 1e-4)
    params = init_simnet(jax.random.PRNGKey(22), cfg)
    x, t, mask = make_batch(22, B=8, N=128)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    step = make_dp_shardmap_finetune_step(cfg, optimizer, mesh,
                                          attn_impl="pallas")
    p, s, loss = step(params, optimizer.init(params), jnp.asarray(x),
                      jnp.asarray(t), jnp.asarray(mask),
                      jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_padded_final_batch_matches_smaller_batch():
    """VERDICT #7: with pad_to_batch repeats zero-weighted via item_weight,
    the mesh train step on the padded batch equals the single-device step on
    the reference's smaller final batch — loss AND updated params (10 items,
    batch size 4 → final chunk [8,9,8,9], weights [1,1,0,0])."""
    from jax.sharding import Mesh
    from vidsum_tpu.data.collate import item_weights, make_batches
    from vidsum_tpu.parallel.dp_shardmap import make_dp_shardmap_finetune_step

    chunk = list(make_batches(10, 4, shuffle=False, pad_to_batch=True))[-1]
    assert chunk == [8, 9, 8, 9]
    w = item_weights(chunk)

    rng_data = np.random.default_rng(77)
    feats = [rng_data.normal(size=(n, 1024)).astype(np.float32)
             for n in [30, 20]]  # items 8 and 9
    tgts = [rng_data.random(n).astype(np.float32) for n in [30, 20]]

    from vidsum_tpu.data.collate import pad_batch
    # reference semantics: the smaller final batch, padded to its bucket
    x2, t2, m2 = pad_batch(feats, tgts, bucket=32)
    # mesh semantics: same items cycled to the static batch size
    feats4 = [feats[i - 8] for i in chunk]
    tgts4 = [tgts[i - 8] for i in chunk]
    x4, t4, m4 = pad_batch(feats4, tgts4, bucket=32)
    assert x4.shape[1] == x2.shape[1]  # own-chunk cycling keeps the bucket

    optimizer = make_optimizer(1e-3, 1e-4)
    params = init_simnet(jax.random.PRNGKey(3), CFG)
    rng = jax.random.PRNGKey(11)

    ref_step = make_finetune_step(CFG, optimizer)
    ref_params, _, ref_loss = ref_step(
        jax.tree_util.tree_map(jnp.copy, params), optimizer.init(params),
        jnp.asarray(x2), jnp.asarray(t2), jnp.asarray(m2), rng)

    # dp shard_map path (the fused-kernel multi-chip path)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    step = make_dp_shardmap_finetune_step(CFG, optimizer, mesh,
                                          attn_impl="pallas")
    sp, _, loss = step(jax.tree_util.tree_map(jnp.copy, params),
                       optimizer.init(params), jnp.asarray(x4),
                       jnp.asarray(t4), jnp.asarray(m4), rng,
                       jnp.asarray(w))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)

    # GSPMD dp×tp path
    gmesh = make_mesh(MeshConfig(data=4, model=2))
    init_fn, gstep = make_sharded_finetune_step(CFG, optimizer, gmesh)
    gp, go = init_fn(jax.tree_util.tree_map(jnp.copy, params))
    gp, _, gloss = gstep(gp, go, jnp.asarray(x4), jnp.asarray(t4),
                         jnp.asarray(m4), rng, jnp.asarray(w))
    np.testing.assert_allclose(float(gloss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_composed_3axis_train_step_matches_single_device():
    """VERDICT r2 #3: ONE train step composed over data×seq×model on a
    single 3-axis mesh (batch sharded over data AND sequence, params
    tensor-parallel over model) must equal the single-device step — at
    dropout 0 within GSPMD reduce-order tolerance, and at dropout>0
    bit-for-bit in the drawn masks (partitionable threefry makes the
    dropout draws sharding-invariant)."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                ("data", "seq", "model"))
    optimizer = make_optimizer(1e-3, 1e-4)

    for dropout in (0.0, 0.2):
        cfg = dataclasses.replace(CFG, dropout=dropout)
        params = init_simnet(jax.random.PRNGKey(31), cfg)
        x, t, mask = make_batch(31, B=4, N=64)
        rng = jax.random.PRNGKey(13)

        ref_step = make_finetune_step(cfg, optimizer)
        ref_params, _, ref_loss = ref_step(
            jax.tree_util.tree_map(jnp.copy, params), optimizer.init(params),
            jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask), rng)

        init_fn, step_fn = make_sharded_finetune_step(cfg, optimizer, mesh,
                                                      seq_axis="seq")
        sp, so = init_fn(params)
        sp, so, loss = step_fn(sp, so, jnp.asarray(x), jnp.asarray(t),
                               jnp.asarray(mask), rng)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5,
                                   err_msg=f"dropout={dropout}")
        for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(sp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4,
                                       err_msg=f"dropout={dropout}")
