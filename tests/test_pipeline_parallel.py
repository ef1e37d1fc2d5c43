"""Weight-streaming pipeline parallelism vs single-device forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models import init_simnet, simnet_apply
from vidsum_tpu.parallel.pipeline import make_pp_forward

CFG = ModelConfig(d_model=64, num_heads=4, num_layers=4, dropout=0.0,
                  max_len=128)


def stage_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("stage",))


@pytest.mark.parametrize("stages", [2, 4])
def test_pp_forward_matches_single_device(stages):
    params = init_simnet(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    B = 8
    x = jnp.asarray(rng.normal(size=(B, 64, 1024)), jnp.float32)
    mask = jnp.asarray(np.arange(64)[None, :] >= 50) * jnp.ones((B, 1), bool)

    want, _ = simnet_apply(params, CFG, x, mask)
    fwd = make_pp_forward(CFG, stage_mesh(stages))
    got = fwd(params, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pp_rejects_indivisible_stages():
    with pytest.raises(ValueError):
        make_pp_forward(CFG, stage_mesh(3))


def _unstack_blocks(stacked, n_layers):
    return [jax.tree_util.tree_map(lambda a: a[i], stacked)
            for i in range(n_layers)]


@pytest.mark.parametrize("stages", [2, 4])
def test_pp_train_step_matches_single_device(stages):
    """Weight-streaming pipeline TRAINING (blocks + Adam moments sharded
    over stages, batch dp, layer-grad reduce-scatter via the all_gather
    VJP) must produce the same loss and updated params as the plain
    single-device step (dropout 0)."""
    from vidsum_tpu.parallel.pipeline import make_pp_train_step
    from vidsum_tpu.train.steps import make_finetune_step, make_optimizer

    params = init_simnet(jax.random.PRNGKey(1), CFG)
    rng = np.random.default_rng(3)
    B, N = 8, 64
    x = jnp.asarray(rng.normal(size=(B, N, 1024)), jnp.float32)
    t = jnp.asarray(rng.random((B, N)), jnp.float32)
    mask = jnp.asarray(np.arange(N)[None, :] >= 50) * jnp.ones((B, 1), bool)
    key = jax.random.PRNGKey(0)

    optimizer = make_optimizer(1e-3, 1e-4)
    ref_step = make_finetune_step(CFG, optimizer)
    ref_params, ref_opt = jax.device_get(params), optimizer.init(params)
    want_params, _, want_loss = ref_step(params, ref_opt, x, t, mask, key)

    init_fn, step_fn = make_pp_train_step(CFG, optimizer, stage_mesh(stages))
    pp_params, pp_opt = init_fn(jax.device_get(ref_params))
    pp_params, pp_opt, loss = step_fn(pp_params, pp_opt, x, t, mask, key)

    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    got_blocks = _unstack_blocks(jax.device_get(pp_params["blocks"]),
                                 CFG.num_layers)
    want = jax.device_get(want_params)
    for i in range(CFG.num_layers):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4,
                                                    atol=1e-5),
            got_blocks[i], want["blocks"][i])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5),
        jax.device_get(pp_params["embed"]), want["embed"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5),
        jax.device_get(pp_params["head"]), want["head"])


def test_pp_train_step_dropout_smoke():
    """Dropout-on pp training: per-device rng decorrelation, finite loss,
    params move, blocks moments stay stage-sharded."""
    from vidsum_tpu.parallel.pipeline import make_pp_train_step
    from vidsum_tpu.train.steps import make_optimizer

    cfg = ModelConfig(d_model=64, num_heads=4, num_layers=4, dropout=0.3,
                      max_len=128)
    params = init_simnet(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(8, 64, 1024)), jnp.float32)
    t = jnp.asarray(rng.random((8, 64)), jnp.float32)
    mask = jnp.zeros((8, 64), bool)

    optimizer = make_optimizer(1e-3, 1e-4)
    init_fn, step_fn = make_pp_train_step(cfg, optimizer, stage_mesh(4))
    pp_params, pp_opt = init_fn(params)
    before = jax.device_get(pp_params["blocks"])
    pp_params, pp_opt, loss = step_fn(pp_params, pp_opt, x, t, mask,
                                      jax.random.PRNGKey(9))
    assert np.isfinite(float(loss))
    after = jax.device_get(pp_params["blocks"])
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), before, after)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
