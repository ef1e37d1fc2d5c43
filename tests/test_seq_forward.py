"""Full sequence-parallel SimNet forward vs single-device, on the 8-device
CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models import init_simnet, simnet_apply
from vidsum_tpu.parallel.seq_forward import make_seq_sharded_forward

CFG = ModelConfig(d_model=64, num_heads=4, num_layers=2, dropout=0.0,
                  max_len=512)


def make_mesh(data, seq):
    devices = np.asarray(jax.devices()[: data * seq]).reshape(data, seq)
    return Mesh(devices, ("data", "seq"))


def test_seq_sharded_forward_matches_dense():
    params = init_simnet(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 256, 1024)), jnp.float32)
    mask = jnp.asarray(np.arange(256)[None, :] >= 230) * jnp.ones((2, 1), bool)

    want_s, want_h = simnet_apply(params, CFG, x, mask)
    fwd = make_seq_sharded_forward(CFG, make_mesh(2, 4))
    got_s, got_h = fwd(params, x, mask)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=2e-4, atol=2e-4)


def test_seq_sharded_long_sequence_runs():
    """A sequence longer than the PE table's 2000-frame reference cap —
    the raw-video config the reference cannot express."""
    cfg = ModelConfig(d_model=64, num_heads=4, num_layers=1, dropout=0.0,
                      max_len=8192)
    params = init_simnet(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4096, 1024)),
                    jnp.float32)
    mask = jnp.zeros((1, 4096), bool)
    fwd = make_seq_sharded_forward(cfg, make_mesh(1, 8))
    scores, _ = fwd(params, x, mask)
    assert scores.shape == (1, 4096, 1)
    assert bool(jnp.isfinite(scores).all())
