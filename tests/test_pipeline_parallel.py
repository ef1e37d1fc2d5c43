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
