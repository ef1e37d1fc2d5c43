"""Ring attention (sequence parallelism) vs the dense reference, on the
8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vidsum_tpu.ops.attention import _xla_attention
from vidsum_tpu.parallel.ring_attention import make_ring_forward


def make_mesh(data, seq):
    devices = np.asarray(jax.devices()[: data * seq]).reshape(data, seq)
    return Mesh(devices, ("data", "seq"))


def make_inputs(seed, B=2, H=4, N=256, Dh=32, pad_from=200):
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, Dh)), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(np.arange(N)[None, :] >= pad_from) * jnp.ones(
        (B, 1), bool)
    return q, k, v, mask


@pytest.mark.parametrize("data,seq", [(1, 8), (2, 4), (4, 2)])
def test_matches_dense(data, seq):
    q, k, v, mask = make_inputs(0, B=4)
    fwd = make_ring_forward(make_mesh(data, seq), scale=0.125)
    got = np.asarray(fwd(q, k, v, mask))
    want = np.asarray(_xla_attention(q, k, v, mask, scale=0.125))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fully_padded_shard():
    """Last ring shard entirely padding: no NaNs, dense-equal real outputs."""
    q, k, v, mask = make_inputs(1, N=256, pad_from=192)  # last 64 = 2 shards
    fwd = make_ring_forward(make_mesh(2, 4), scale=0.1)
    got = np.asarray(fwd(q, k, v, mask))
    assert np.isfinite(got).all()
    want = np.asarray(_xla_attention(q, k, v, mask, scale=0.1))
    np.testing.assert_allclose(got[:, :, :192], want[:, :, :192],
                               rtol=2e-5, atol=2e-5)


def test_no_padding():
    q, k, v, _ = make_inputs(2, pad_from=10**9)
    mask = jnp.zeros((2, 256), bool)
    fwd = make_ring_forward(make_mesh(1, 8), scale=0.2)
    got = np.asarray(fwd(q, k, v, mask))
    want = np.asarray(_xla_attention(q, k, v, mask, scale=0.2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bf16_path():
    q, k, v, mask = make_inputs(3)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    fwd = make_ring_forward(make_mesh(2, 4), scale=0.125)
    got = np.asarray(fwd(q, k, v, mask), dtype=np.float32)
    want = np.asarray(_xla_attention(q, k, v, mask, scale=0.125),
                      dtype=np.float32)
    assert np.isfinite(got[:, :, :200]).all()
    np.testing.assert_allclose(got[:, :, :200], want[:, :, :200],
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("data,seq", [(1, 8), (2, 4)])
def test_pallas_block_matches_dense(data, seq):
    """Fused ring-step kernel (interpret mode) == dense attention."""
    q, k, v, mask = make_inputs(3, B=2, N=256, pad_from=200)
    fwd = make_ring_forward(make_mesh(data, seq), scale=0.125,
                            block_impl="pallas")
    got = np.asarray(fwd(q, k, v, mask))
    want = np.asarray(_xla_attention(q, k, v, mask, scale=0.125))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_block_fully_padded_shard():
    q, k, v, mask = make_inputs(4, B=2, N=256, pad_from=192)
    fwd = make_ring_forward(make_mesh(1, 4), scale=0.1, block_impl="pallas")
    got = np.asarray(fwd(q, k, v, mask))
    assert np.isfinite(got).all()
    want = np.asarray(_xla_attention(q, k, v, mask, scale=0.1))
    np.testing.assert_allclose(got[:, :, :192], want[:, :, :192],
                               rtol=2e-5, atol=2e-5)
