"""Statistical validation of the counter-based hash dropout masks.

The fused train kernels (ops/block_train.py, ops/attention_train.py) draw
dropout masks from a murmur-style fmix hash over (seed, site, batch,
position) instead of torch's PRNG or jax.random.bernoulli. Gradient tests
already prove fwd/bwd mask *identity*; these tests prove the masks are the
right *distribution* — a biased hash would silently change the effective
dropout rate and training dynamics vs the reference
(src/model/simnet.py:107,162 applies plain nn.Dropout at rate 0.3).

Checks: per-site keep-rate within a tight binomial CI of (1-rate);
per-position keep-rate across seeds (positional bias); independence across
sites, spatial lags, batch indices, and seeds (correlation bounds at 5-6
sigma of the null)."""

import numpy as np
import jax
import jax.numpy as jnp

from vidsum_tpu.ops.block_train import (
    S_ATTN, S_MLP, S_RES1, S_RES2, _hash_keep,
)

RATE = 0.3
KEEP = 1.0 - RATE
SHAPE = (128, 512)
N = SHAPE[0] * SHAPE[1]
SIGMA_RATE = (KEEP * RATE / N) ** 0.5          # ~0.0018 at this N
SIGMA_CORR = 1.0 / N ** 0.5                    # ~0.0039

SITES = [S_ATTN * 8 + h for h in range(4)] + [S_RES1, S_MLP, S_RES2]


def _mask(seed=7, site=S_RES1, b=0, row0=0, shape=SHAPE, rate=RATE):
    m = _hash_keep(jnp.asarray(seed, jnp.int32), site, b, row0, shape, rate)
    return np.asarray(m)


def _corr(a, b):
    a = a.ravel().astype(np.float64)
    b = b.ravel().astype(np.float64)
    a -= a.mean()
    b -= b.mean()
    denom = (a @ a) ** 0.5 * (b @ b) ** 0.5
    return float(a @ b / denom)


def test_keep_rate_per_site():
    for site in SITES:
        rate_hat = _mask(site=site).mean()
        assert abs(rate_hat - KEEP) < 5 * SIGMA_RATE, (site, rate_hat)


def test_keep_rate_other_rates():
    for rate in (0.1, 0.2, 0.5):
        rate_hat = _mask(rate=rate).mean()
        sigma = (rate * (1 - rate) / N) ** 0.5
        assert abs(rate_hat - (1 - rate)) < 5 * sigma, (rate, rate_hat)


def test_positionwise_keep_rate_across_seeds():
    """Each individual position must keep with p=(1-rate) across seeds —
    catches a hash that is uniform on average but biased per position."""
    n_seeds = 256
    shape = (128, 128)
    acc = np.zeros(shape, np.float64)
    for seed in range(n_seeds):
        acc += _mask(seed=seed * 2654435761 % (2**31), shape=shape)
    freq = acc / n_seeds
    sigma = (KEEP * RATE / n_seeds) ** 0.5     # ~0.029
    # global mean: very tight (n_seeds * 128 * 128 samples)
    assert abs(freq.mean() - KEEP) < 5 * (KEEP * RATE / (n_seeds * freq.size)) ** 0.5
    # worst position: 6-sigma bound; with 16384 positions the expected max
    # |dev| under the null is ~4.2 sigma
    assert np.abs(freq - KEEP).max() < 6 * sigma


def test_independence_across_sites():
    masks = {s: _mask(site=s) for s in SITES}
    for i, si in enumerate(SITES):
        for sj in SITES[i + 1:]:
            assert abs(_corr(masks[si], masks[sj])) < 5 * SIGMA_CORR, (si, sj)


def test_independence_across_spatial_lags():
    m = _mask().astype(np.float64)
    # adjacent rows, adjacent cols, and the MXU-relevant lag of 128 cols
    for a, b in [(m[1:], m[:-1]), (m[:, 1:], m[:, :-1]),
                 (m[:, 128:], m[:, :-128])]:
        n = a.size
        assert abs(_corr(a, b)) < 5 / n ** 0.5


def test_independence_across_batch_and_row0():
    base = _mask(b=0, row0=0)
    assert abs(_corr(base, _mask(b=1, row0=0))) < 5 * SIGMA_CORR
    assert abs(_corr(base, _mask(b=0, row0=128))) < 5 * SIGMA_CORR


def test_independence_across_seeds():
    base = _mask(seed=7)
    for seed in (8, 9, 12345):
        assert abs(_corr(base, _mask(seed=seed))) < 5 * SIGMA_CORR


def test_row_keep_rates_unbiased():
    """Mean keep per row (the per-query attention-dropout budget) must not
    drift with the row index — a row-correlated hash would down-weight late
    frames during training."""
    m = _mask(shape=(512, 512)).astype(np.float64)
    row_rate = m.mean(axis=1)
    sigma_row = (KEEP * RATE / 512) ** 0.5     # per-row CI
    assert np.abs(row_rate - KEEP).max() < 5.5 * sigma_row
    # no linear trend: regression slope consistent with zero
    x = np.arange(512) - 255.5
    slope = (x @ (row_rate - row_rate.mean())) / (x @ x)
    se = sigma_row / (x @ x) ** 0.5
    assert abs(slope) < 5 * se


# ---- ring attention mask family (parallel/ring_attention.ring_hash_keep) --
# Same mixing constants, but 4-D (B, H, Nq, Nk) with GLOBAL query/key/batch
# offsets; the head index is the hash site. Used by the seq-parallel train
# step, where mask quality directly shapes training dynamics.

def _ring(seed=7, b0=0, q0=0, k0=0, shape=(4, 4, 128, 128), rate=RATE):
    from vidsum_tpu.parallel.ring_attention import ring_hash_keep
    return np.asarray(ring_hash_keep(jnp.asarray(seed, jnp.int32), b0, q0,
                                     k0, shape, rate))


def test_ring_keep_rate_per_head():
    m = _ring()
    for h in range(m.shape[1]):
        n = m[:, h].size
        rate_hat = m[:, h].mean()
        assert abs(rate_hat - KEEP) < 5 * (KEEP * RATE / n) ** 0.5, (h, rate_hat)


def test_ring_independence_across_heads_and_offsets():
    base = _ring()
    # heads are distinct sites
    for h in range(1, 4):
        assert abs(_corr(base[:, 0], base[:, h])) < 5 * SIGMA_CORR
    # shifting the global query/key/batch offsets must decorrelate —
    # this is exactly what ring steps and shard indices vary
    for kw in ({"q0": 128}, {"k0": 128}, {"b0": 4}, {"seed": 8}):
        other = _ring(**kw)
        assert abs(_corr(base, other)) < 5 / base.size ** 0.5, kw


def test_ring_tile_consistency():
    """The mask of a (q0, k0) sub-tile equals the corresponding slice of the
    full mask — coordinate-absoluteness, the property that makes the seq
    step's loss invariant to the mesh shape."""
    full = _ring(shape=(2, 2, 256, 256))
    tile = _ring(q0=128, k0=64, shape=(2, 2, 64, 128))
    np.testing.assert_array_equal(tile, full[:, :, 128:192, 64:192])


# ---- separable-mixing restructure is bit-identical to the legacy form ----
# The hash family was rewritten (round 2) to multiply the row/col iotas on
# (T,1)/(1,C) vectors and assemble the tile with one broadcast XOR. XOR
# associativity makes that exactly the original full-tile arithmetic; these
# tests pin it so a future tweak can't silently fork the mask family (which
# would break exact-replay resume and dense-replay equality).

def _legacy_hash_keep(seed, site, b, row0, shape, rate):
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(row0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    base = (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
            + jnp.uint32(site * 131071 + 17) * jnp.uint32(0x85EBCA77)
            + jnp.uint32(b + 1) * jnp.uint32(0x27220A95))
    x = base ^ (rows * jnp.uint32(0xC2B2AE3D)) ^ (cols * jnp.uint32(0x27D4EB2F))
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    threshold = min(int(rate * (1 << 32)), (1 << 32) - 1)
    return x >= jnp.uint32(threshold)


def test_separable_hash_matches_legacy_bits():
    for seed, site, b, row0, shape, rate in [
        (7, S_RES1, 0, 0, (128, 512), 0.3),
        (1234, S_ATTN * 8 + 3, 17, 384, (256, 128), 0.3),
        (0, S_MLP, 2, 128, (128, 1024), 0.1),
        (2 ** 31 - 1, S_RES2, 255, 896, (128, 256), 0.5),
    ]:
        new = np.asarray(_hash_keep(
            jnp.asarray(seed, jnp.int32), site, b, row0, shape, rate))
        old = np.asarray(_legacy_hash_keep(
            jnp.asarray(seed, jnp.int32), site, b, row0, shape, rate))
        assert np.array_equal(new, old), (seed, site, b, row0, shape, rate)


def test_separable_ring_and_3d_hashes_match_legacy_bits():
    from vidsum_tpu.parallel.ring_attention import (
        ring_hash_keep, hash_keep3d, _fmix_keep)

    def legacy_ring(seed, b0, q0, k0, shape, rate):
        ib = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        ih = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        ir = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
        ic = jax.lax.broadcasted_iota(jnp.uint32, shape, 3)
        seed = jnp.asarray(seed).astype(jnp.uint32)
        base = (seed * jnp.uint32(0x9E3779B1)
                + (ih * jnp.uint32(131071) + jnp.uint32(17))
                * jnp.uint32(0x85EBCA77)
                + (jnp.uint32(b0) + ib + jnp.uint32(1))
                * jnp.uint32(0x27220A95))
        x = (base ^ ((jnp.uint32(q0) + ir) * jnp.uint32(0xC2B2AE3D))
             ^ ((jnp.uint32(k0) + ic) * jnp.uint32(0x27D4EB2F)))
        return _fmix_keep(x, rate)

    def legacy_3d(seed, site, b0, row0, shape, rate):
        ib = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        rows = (jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
                + jnp.uint32(row0))
        cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
        seed = jnp.asarray(seed).astype(jnp.uint32)
        base = (seed * jnp.uint32(0x9E3779B1)
                + jnp.uint32(site * 131071 + 17) * jnp.uint32(0x85EBCA77)
                + (jnp.uint32(b0) + ib + jnp.uint32(1))
                * jnp.uint32(0x27220A95))
        x = (base ^ (rows * jnp.uint32(0xC2B2AE3D))
             ^ (cols * jnp.uint32(0x27D4EB2F)))
        return _fmix_keep(x, rate)

    for seed, b0, q0, k0, shape, rate in [
        (1234, 3, 5, 7, (2, 2, 16, 32), 0.3),
        (9, 0, 2560, 1280, (1, 4, 8, 128), 0.2),
    ]:
        new = np.asarray(ring_hash_keep(jnp.int32(seed), b0, q0, k0, shape,
                                        rate))
        old = np.asarray(legacy_ring(jnp.int32(seed), b0, q0, k0, shape,
                                     rate))
        assert np.array_equal(new, old)

    for seed, site, b0, row0, shape, rate in [
        (1234, 32, 2, 8, (3, 16, 32), 0.3),
        (77, 34, 0, 2048, (2, 8, 256), 0.5),
    ]:
        new = np.asarray(hash_keep3d(jnp.int32(seed), site, b0, row0, shape,
                                     rate))
        old = np.asarray(legacy_3d(jnp.int32(seed), site, b0, row0, shape,
                                   rate))
        assert np.array_equal(new, old)
