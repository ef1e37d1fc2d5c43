"""Flagship-scale lockstep training parity vs torch (VERDICT r1 item 2).

The round-1 lockstep test ran 4 steps on a toy model; these run the actual
``run_finetune.sh`` / ``run_pretrain.sh`` architecture (d_model 256, 4 heads,
4 layers) with the recipe hyperparameters for >=50 one-to-one optimization
steps, plus:

- a dropout-ON lockstep variant where bit-identical externally generated
  keep masks are injected into both frameworks (the only way to compare
  stochastic training step-for-step across RNG families);
- the pretrain 3-loss objective (encoder-only Adam, frozen video_transform,
  reference ``src/pretrain.py:35-63``) in lockstep;
- the pretrain -> finetune warm-start handoff (``src/train.py:40-44``):
  pretrained encoder weights flow through the torch-state converter into the
  mirror and both frameworks continue finetuning in lockstep.

Reference semantics: ``src/train.py:21-131``, ``run_finetune.sh:1``,
``run_pretrain.sh:1``, ``src/model/simnet_pretrain.py:12-100``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vidsum_tpu.config import ModelConfig, PretrainConfig
from vidsum_tpu.models import init_simnet
from vidsum_tpu.models.pretrain import init_pretrain_model
from vidsum_tpu.models.simnet import simnet_apply
from vidsum_tpu.models.torch_convert import simnet_to_torch_state
from vidsum_tpu.ops.losses import mse_with_mask_loss
from vidsum_tpu.train.steps import (
    make_finetune_step, make_optimizer, make_pretrain_step,
)
from tests.torch_mirrors import PretrainMirror, ScorerMirror

# run_finetune.sh: d_model 256, heads 4, layers 4, lr 1e-3, wd 1e-4, bs 4
CFG = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.0,
                  max_len=256)
LR, WD = 1e-3, 1e-4
B, N = 4, 128


def _mirror_from(params, dropout=0.0):
    mirror = ScorerMirror(d_model=CFG.d_model, num_heads=CFG.num_heads,
                          num_layers=CFG.num_layers, dropout=dropout,
                          max_len=CFG.max_len)
    state = {k: torch.tensor(np.ascontiguousarray(v))
             for k, v in simnet_to_torch_state(params).items()}
    missing, unexpected = mirror.load_state_dict(state, strict=False)
    assert not unexpected
    assert all(k == "pe" for k in missing)
    mirror.train()
    return mirror


def _torch_masked_mse(pred, target, mask):
    pred = pred.squeeze(2)
    keep = (~mask).float()
    diff = pred * keep - target * keep
    return (diff * diff).mean()


def _batch(seed=77, b=B, n=N):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, n, 1024)).astype(np.float32)
    t = rng.random((b, n)).astype(np.float32)
    m = np.zeros((b, n), bool)
    m[-1, n - n // 4:] = True
    return x, t, m


def test_flagship_lockstep_50_steps():
    """50 Adam steps at the run_finetune.sh recipe, dropout off: loss
    trajectories must track step for step."""
    params = init_simnet(jax.random.PRNGKey(0), CFG)
    mirror = _mirror_from(params)
    x_np, t_np, m_np = _batch()

    opt = torch.optim.Adam(mirror.parameters(), lr=LR, weight_decay=WD)
    xt, tt, mt = (torch.tensor(a) for a in (x_np, t_np, m_np))
    torch_losses = []
    for _ in range(50):
        opt.zero_grad()
        pred, _ = mirror(xt, mt)
        loss = _torch_masked_mse(pred, tt, mt)
        loss.backward()
        opt.step()
        torch_losses.append(loss.item())

    optimizer = make_optimizer(LR, WD)
    step = make_finetune_step(CFG, optimizer)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(0)  # dropout=0 -> unused
    jax_losses = []
    for _ in range(50):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x_np),
                                       jnp.asarray(t_np), jnp.asarray(m_np),
                                       key)
        jax_losses.append(float(loss))

    # early steps tight; the full trajectory tracks within accumulated fp32
    # reassociation drift
    np.testing.assert_allclose(jax_losses[:10], torch_losses[:10],
                               rtol=3e-4, atol=3e-6)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=3e-3, atol=1e-5)
    assert jax_losses[-1] < jax_losses[0]


def test_flagship_lockstep_dropout_on_injected_masks():
    """Dropout 0.3 (the reference training rate) with identical externally
    generated keep masks injected into both frameworks: losses must match
    step for step, proving every dropout *site and placement* (attention
    weights, both residual branches, post-ReLU MLP) sits where the
    reference puts it (src/model/simnet.py:107,159,162)."""
    cfg = ModelConfig(d_model=256, num_heads=4, num_layers=4, dropout=0.3,
                      max_len=256)
    params = init_simnet(jax.random.PRNGKey(1), cfg)
    mirror = _mirror_from(params, dropout=0.3)
    x_np, t_np, m_np = _batch(seed=5)
    keep_p = 1.0 - cfg.dropout
    H, D = cfg.num_heads, cfg.d_model

    def draw_masks(rng):
        layers = []
        for _ in range(cfg.num_layers):
            layers.append({
                "attn": rng.random((B, H, N, N)) < keep_p,
                "res1": rng.random((B, N, D)) < keep_p,
                "mlp": rng.random((B, N, 4 * D)) < keep_p,
                "res2": rng.random((B, N, D)) < keep_p,
            })
        return layers

    optimizer = make_optimizer(LR, WD)

    def loss_fn(params, x, target, pad_mask, masks):
        scores, _ = simnet_apply(params, cfg, x, pad_mask,
                                 deterministic=False, dropout_masks=masks)
        return mse_with_mask_loss(scores, target, pad_mask)

    @jax.jit
    def step(params, opt_state, x, target, pad_mask, masks):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, target,
                                                  pad_mask, masks)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    opt_state = optimizer.init(params)
    opt = torch.optim.Adam(mirror.parameters(), lr=LR, weight_decay=WD)
    xt, tt, mt = (torch.tensor(a) for a in (x_np, t_np, m_np))

    mask_rng = np.random.default_rng(123)
    jax_losses, torch_losses = [], []
    for _ in range(12):
        masks = draw_masks(mask_rng)
        jmasks = [
            {k: jnp.asarray(v) for k, v in lm.items()} for lm in masks]
        tmasks = [
            {k: torch.tensor(v) for k, v in lm.items()} for lm in masks]

        params, opt_state, loss = step(params, opt_state, jnp.asarray(x_np),
                                       jnp.asarray(t_np), jnp.asarray(m_np),
                                       tuple(jmasks))
        jax_losses.append(float(loss))

        opt.zero_grad()
        pred, _ = mirror(xt, mt, dropout_masks=tmasks)
        tl = _torch_masked_mse(pred, tt, mt)
        tl.backward()
        opt.step()
        torch_losses.append(tl.item())

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-3, atol=1e-5)


def _pretrain_lockstep(steps=25):
    """Shared driver: flagship pretrain lockstep; returns the final jax
    params so the warm-start test can continue from them."""
    model_cfg = ModelConfig(d_model=256, num_heads=4, num_layers=4,
                            dropout=0.0, max_len=256)
    pre_cfg = PretrainConfig(lr=1e-3, weight_decay=5e-4)
    params = init_pretrain_model(jax.random.PRNGKey(2), model_cfg)

    mirror = PretrainMirror(d_model=256, num_heads=4, num_layers=4,
                            dropout=0.0, max_len=256,
                            sharpening_t=pre_cfg.sharpening_t)
    enc_state = {k: torch.tensor(np.ascontiguousarray(v))
                 for k, v in simnet_to_torch_state(params["encoder"]).items()}
    missing, unexpected = mirror.encoder.load_state_dict(enc_state,
                                                         strict=False)
    assert not unexpected and all(k == "pe" for k in missing)
    with torch.no_grad():
        mirror.video_transform.weight.copy_(
            torch.tensor(np.asarray(params["video_transform"]["w"]).T))
        mirror.video_transform.bias.copy_(
            torch.tensor(np.asarray(params["video_transform"]["b"])))
    mirror.train()

    Bp, Np = 8, 64
    rng = np.random.default_rng(11)
    x_np = rng.normal(size=(Bp, Np, 1024)).astype(np.float32)
    vid_np = rng.normal(size=(Bp, 512)).astype(np.float32)
    m_np = np.zeros((Bp, Np), bool)
    m_np[-2:, Np - 16:] = True

    # reference: Adam over encoder params ONLY (src/pretrain.py:35-36)
    opt = torch.optim.Adam(mirror.encoder.parameters(), lr=pre_cfg.lr,
                           weight_decay=pre_cfg.weight_decay)
    xt, vt, mt = (torch.tensor(a) for a in (x_np, vid_np, m_np))
    torch_losses = []
    for _ in range(steps):
        opt.zero_grad()
        main, center, repel = mirror(xt, vt, mt)
        loss = (main + pre_cfg.center_weight * center
                + pre_cfg.repel_weight * repel)
        loss.backward()
        opt.step()
        torch_losses.append(loss.item())

    optimizer = make_optimizer(pre_cfg.lr, pre_cfg.weight_decay)
    step = make_pretrain_step(model_cfg, pre_cfg, optimizer)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(0)
    jax_losses = []
    for _ in range(steps):
        params, opt_state, (total, *_rest) = step(
            params, opt_state, jnp.asarray(x_np), jnp.asarray(vid_np),
            jnp.asarray(m_np), key)
        jax_losses.append(float(total))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=3e-3, atol=2e-5)
    return model_cfg, params


def test_flagship_pretrain_lockstep_and_warm_start_handoff():
    model_cfg, pre_params = _pretrain_lockstep(steps=25)

    # --- warm start: pretrained encoder -> finetune, both frameworks
    params = jax.device_get(pre_params["encoder"])
    mirror = _mirror_from(params)
    x_np, t_np, m_np = _batch(seed=9)

    opt = torch.optim.Adam(mirror.parameters(), lr=LR, weight_decay=WD)
    xt, tt, mt = (torch.tensor(a) for a in (x_np, t_np, m_np))
    torch_losses = []
    for _ in range(25):
        opt.zero_grad()
        pred, _ = mirror(xt, mt)
        loss = _torch_masked_mse(pred, tt, mt)
        loss.backward()
        opt.step()
        torch_losses.append(loss.item())

    optimizer = make_optimizer(LR, WD)
    step = make_finetune_step(model_cfg, optimizer)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(0)
    jax_losses = []
    for _ in range(25):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x_np),
                                       jnp.asarray(t_np), jnp.asarray(m_np),
                                       key)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=3e-3, atol=2e-5)
    assert jax_losses[-1] < jax_losses[0]
