import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models.simnet import (
    count_params, init_simnet, positional_encoding_table, simnet_apply,
)

CFG = ModelConfig(d_model=64, num_heads=4, num_layers=2, dropout=0.1,
                  max_len=128)


@pytest.fixture(scope="module")
def params():
    return init_simnet(jax.random.PRNGKey(0), CFG)


def test_output_shapes(params):
    x = jnp.ones((2, 10, CFG.in_features))
    scores, hidden = simnet_apply(params, CFG, x)
    assert scores.shape == (2, 10, 1)
    assert hidden.shape == (2, 10, CFG.d_model)


def test_param_count_matches_reference_formula(params):
    d, s, L = CFG.d_model, CFG.mlp_scale, CFG.num_layers
    embed = CFG.in_features * d + d
    block = 4 * (d * d + d) + (d * s * d + s * d) + (s * d * d + d) + 4 * d
    head = d * 1 + 1
    assert count_params(params) == embed + L * block + head


def test_padding_mask_invariance(params):
    """Padded frames must not change the scores of real frames."""
    rng = np.random.default_rng(20)
    x_real = jnp.asarray(rng.normal(size=(1, 12, CFG.in_features)),
                         dtype=jnp.float32)
    pad = jnp.full((1, 6, CFG.in_features), 1000.0)
    x_padded = jnp.concatenate([x_real, pad], axis=1)
    mask = jnp.concatenate([jnp.zeros((1, 12), bool), jnp.ones((1, 6), bool)],
                           axis=1)
    s_real, _ = simnet_apply(params, CFG, x_real,
                             jnp.zeros((1, 12), bool))
    s_padded, _ = simnet_apply(params, CFG, x_padded, mask)
    np.testing.assert_allclose(np.asarray(s_padded[:, :12]),
                               np.asarray(s_real), rtol=1e-5, atol=1e-5)


def test_no_mask_equals_false_mask(params):
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(2, 8, CFG.in_features)), jnp.float32)
    s1, _ = simnet_apply(params, CFG, x)
    s2, _ = simnet_apply(params, CFG, x, jnp.zeros((2, 8), bool))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_positional_encoding_closed_form():
    d, L = 8, 16
    pe = np.asarray(positional_encoding_table(L, d))
    for pos in (0, 3, 15):
        for i in range(0, d, 2):
            angle = pos * np.exp(-i * np.log(10000.0) / d)
            assert abs(pe[pos, i] - np.sin(angle)) < 1e-5
            assert abs(pe[pos, i + 1] - np.cos(angle)) < 1e-5


def test_position_sensitivity(params):
    """With PE on, permuting frames must change the scores."""
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.normal(size=(1, 10, CFG.in_features)), jnp.float32)
    s1, _ = simnet_apply(params, CFG, x)
    s2, _ = simnet_apply(params, CFG, x[:, ::-1])
    assert not np.allclose(np.asarray(s1[:, ::-1]), np.asarray(s2), atol=1e-4)


def test_dropout_determinism_and_variation(params):
    x = jnp.ones((1, 6, CFG.in_features))
    k = jax.random.PRNGKey(3)
    a, _ = simnet_apply(params, CFG, x, rng=k, deterministic=False)
    b, _ = simnet_apply(params, CFG, x, rng=k, deterministic=False)
    c, _ = simnet_apply(params, CFG, x, rng=jax.random.PRNGKey(4),
                        deterministic=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_cls_token_prepended():
    cfg = dataclasses.replace(CFG, use_cls=True)
    p = init_simnet(jax.random.PRNGKey(1), cfg)
    x = jnp.ones((2, 5, cfg.in_features))
    scores, hidden = simnet_apply(p, cfg, x, jnp.zeros((2, 5), bool))
    assert scores.shape == (2, 6, 1)
    assert hidden.shape == (2, 6, cfg.d_model)


def test_bfloat16_compute_path(params):
    cfg = dataclasses.replace(CFG, compute_dtype="bfloat16")
    x = jnp.ones((1, 8, cfg.in_features))
    s32, _ = simnet_apply(params, CFG, x)
    s16, _ = simnet_apply(params, cfg, x)
    assert s16.dtype == jnp.float32  # logits are cast back to fp32
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32),
                               rtol=0.1, atol=0.1)


def test_model_score_flag_mirrors_reference_dead_branch(params):
    x = jnp.ones((1, 4, CFG.in_features))
    s1, h1 = simnet_apply(params, CFG, x, model_score=True)
    s2, h2 = simnet_apply(params, CFG, x, model_score=False)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_return_attn(params):
    x = jnp.ones((1, 4, CFG.in_features))
    scores, hidden, maps = simnet_apply(params, CFG, x, return_attn=True)
    assert len(maps) == CFG.num_layers
    assert maps[0].shape == (1, CFG.num_heads, 4, 4)
    # rows of attention maps sum to 1
    np.testing.assert_allclose(np.asarray(maps[0].sum(-1)), 1.0, rtol=1e-5)


def test_jit_compiles(params):
    fn = jax.jit(lambda p, x: simnet_apply(p, CFG, x)[0])
    x = jnp.ones((2, 16, CFG.in_features))
    out = fn(params, x)
    assert out.shape == (2, 16, 1)


def test_rng_required_when_training(params):
    with pytest.raises(ValueError):
        simnet_apply(params, CFG, jnp.ones((1, 4, CFG.in_features)),
                     deterministic=False)


def test_torch_checkpoint_conversion():
    """A reference-format torch state dict converts into a pytree whose
    forward matches the torch forward (eval mode) numerically."""
    import torch
    from tests.torch_mirrors import ScorerMirror
    from vidsum_tpu.models.torch_convert import simnet_from_torch_state

    torch.manual_seed(0)
    mirror = ScorerMirror(d_model=64, num_heads=4, num_layers=2).eval()
    state = {k: v.numpy() for k, v in mirror.state_dict().items()
             if not k.endswith("pe")}
    params = simnet_from_torch_state(state)

    rng = np.random.default_rng(50)
    x = torch.tensor(rng.normal(size=(2, 20, 1024)), dtype=torch.float32)
    mask = torch.zeros(2, 20, dtype=torch.bool)
    mask[1, 15:] = True
    with torch.no_grad():
        want_scores, want_hidden = mirror(x, mask)

    got_scores, got_hidden = simnet_apply(
        params, CFG, jnp.asarray(x.numpy()), jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(got_scores), want_scores.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_hidden), want_hidden.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_pretrain_checkpoint_conversion():
    from vidsum_tpu.models.pretrain import init_pretrain_model
    from vidsum_tpu.models.torch_convert import pretrain_model_from_torch_state
    import torch
    from tests.torch_mirrors import ScorerMirror

    torch.manual_seed(1)
    mirror = ScorerMirror(d_model=64, num_heads=4, num_layers=2).eval()
    vt = __import__("torch").nn.Linear(64, 512)
    state = {f"encoder.{k}": v.numpy() for k, v in mirror.state_dict().items()
             if not k.endswith("pe")}
    state.update({f"video_transform.{k}": v.numpy()
                  for k, v in vt.state_dict().items()})
    params = pretrain_model_from_torch_state(state)
    like = init_pretrain_model(jax.random.PRNGKey(0), CFG)
    got = jax.tree_util.tree_structure(params)
    want = jax.tree_util.tree_structure(like)
    assert got == want


def test_torch_checkpoint_roundtrip_export():
    """pytree → reference-keyed state dict → pytree is the identity."""
    from vidsum_tpu.models.torch_convert import (
        simnet_from_torch_state, simnet_to_torch_state,
    )
    params = init_simnet(jax.random.PRNGKey(5), CFG)
    state = simnet_to_torch_state(params)
    assert "encoder.module_list.1.sa.q.weight" in state
    restored = simnet_from_torch_state(state)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_head_dim_scale_variant():
    """scale_by_d_model=False uses head_dim**-0.5 (the standard transformer
    scale, offered as the corrected alternative to the reference quirk)."""
    cfg = dataclasses.replace(CFG, scale_by_d_model=False)
    assert abs(cfg.attn_scale - (CFG.d_model // CFG.num_heads) ** -0.5) < 1e-12
    p = init_simnet(jax.random.PRNGKey(6), cfg)
    x = jnp.ones((1, 8, cfg.in_features))
    s_a, _ = simnet_apply(p, cfg, x)
    s_b, _ = simnet_apply(p, CFG, x)  # d_model scale
    assert not np.allclose(np.asarray(s_a), np.asarray(s_b))


def test_pre_ln_variant():
    """norm_first=True: pre-LN blocks run, differ from post-LN, and keep
    mask invariance."""
    cfg = dataclasses.replace(CFG, norm_first=True, dropout=0.0)
    p = init_simnet(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(70)
    x = jnp.asarray(rng.normal(size=(1, 12, cfg.in_features)), jnp.float32)
    s_pre, _ = simnet_apply(p, cfg, x)
    s_post, _ = simnet_apply(p, dataclasses.replace(CFG, dropout=0.0), x)
    assert not np.allclose(np.asarray(s_pre), np.asarray(s_post))

    pad = jnp.full((1, 4, cfg.in_features), 1000.0)
    x_p = jnp.concatenate([x, pad], axis=1)
    mask = jnp.concatenate([jnp.zeros((1, 12), bool), jnp.ones((1, 4), bool)],
                           axis=1)
    s_real, _ = simnet_apply(p, cfg, x, jnp.zeros((1, 12), bool))
    s_padded, _ = simnet_apply(p, cfg, x_p, mask)
    np.testing.assert_allclose(np.asarray(s_padded[:, :12]),
                               np.asarray(s_real), rtol=1e-5, atol=1e-5)
