"""Training-dynamics parity: one-to-one optimization steps against torch.

Same init (exported via the checkpoint converter), same batch, same masked
MSE, same Adam hyperparameters (torch-style coupled weight decay), dropout
off → the loss trajectory of our jitted train step must match a torch
training loop step for step. This is the strongest evidence that a
reference-style finetune run here reproduces reference training dynamics
(BASELINE "match reference F-score within 0.5 points" rests on it).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models import init_simnet
from vidsum_tpu.models.torch_convert import simnet_to_torch_state
from vidsum_tpu.train.steps import make_finetune_step, make_optimizer
from tests.torch_mirrors import ScorerMirror

CFG = ModelConfig(d_model=64, num_heads=4, num_layers=2, dropout=0.0,
                  max_len=128)
LR, WD, STEPS = 1e-3, 1e-4, 4


def torch_masked_mse(pred, target, mask):
    pred = pred.squeeze(2)
    keep = (~mask).float()
    diff = pred * keep - target * keep
    return (diff * diff).mean()


def test_adam_step_losses_match_torch():
    params = init_simnet(jax.random.PRNGKey(0), CFG)

    mirror = ScorerMirror(d_model=64, num_heads=4, num_layers=2,
                          dropout=0.0, max_len=128)
    state = simnet_to_torch_state(params)
    torch_state = {k: torch.tensor(np.ascontiguousarray(v))
                   for k, v in state.items()}
    missing, unexpected = mirror.load_state_dict(torch_state, strict=False)
    assert not unexpected
    assert all(k == "pe" for k in missing)
    mirror.train()

    rng = np.random.default_rng(77)
    x_np = rng.normal(size=(2, 24, 1024)).astype(np.float32)
    t_np = rng.random((2, 24)).astype(np.float32)
    m_np = np.zeros((2, 24), bool)
    m_np[1, 18:] = True

    # torch side
    opt = torch.optim.Adam(mirror.parameters(), lr=LR, weight_decay=WD)
    torch_losses = []
    xt, tt, mt = (torch.tensor(a) for a in (x_np, t_np, m_np))
    for _ in range(STEPS):
        opt.zero_grad()
        pred, _ = mirror(xt, mt)
        loss = torch_masked_mse(pred, tt, mt)
        loss.backward()
        opt.step()
        torch_losses.append(loss.item())

    # jax side
    optimizer = make_optimizer(LR, WD)
    step = make_finetune_step(CFG, optimizer)
    opt_state = optimizer.init(params)
    jax_losses = []
    key = jax.random.PRNGKey(0)  # dropout=0 → unused
    for _ in range(STEPS):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x_np),
                                       jnp.asarray(t_np), jnp.asarray(m_np),
                                       key)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4, atol=2e-6)
    # the trajectory must actually move
    assert jax_losses[-1] < jax_losses[0]
