"""Trainable fused attention with in-kernel dropout: forward/backward
correctness.

The dropout mask is a counter-based hash (not the hardware PRNG, whose
bit layout differs between kernels), so everything here runs identically in
interpret mode and on hardware; scripts/validate_dropout_kernel.py repeats
the checks on the real chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsum_tpu.ops.attention import _xla_attention
from vidsum_tpu.ops.attention_train import flash_attention_dropout

B, H, N, Dh = 2, 2, 128, 16
SCALE = 0.1


def make_inputs(seed=0, pad_from=100):
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, Dh)), jnp.float32)
               for _ in range(3))
    bool_mask = np.zeros((B, N), bool)
    bool_mask[:, pad_from:] = True
    mask = jnp.asarray(bool_mask.astype(np.int8))[:, None, :]
    seed_arr = jnp.asarray([[1234]], jnp.int32)
    return q, k, v, mask, jnp.asarray(bool_mask), seed_arr


def test_rate_zero_matches_dense_forward():
    q, k, v, mask, bool_mask, seed = make_inputs()
    got = flash_attention_dropout(q, k, v, mask, seed, 0.0, SCALE)
    want = _xla_attention(q, k, v, bool_mask, SCALE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_rate_zero_matches_dense_gradients():
    q, k, v, mask, bool_mask, seed = make_inputs(1)
    gref = np.random.default_rng(2).normal(size=(B, H, N, Dh)).astype(
        np.float32)
    co = jnp.asarray(gref)

    def f_fused(q, k, v):
        return jnp.sum(flash_attention_dropout(q, k, v, mask, seed, 0.0,
                                               SCALE) * co)

    def f_dense(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, bool_mask, SCALE) * co)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_dropout_deterministic_and_varies_with_seed():
    q, k, v, mask, _, seed = make_inputs(3)
    a = flash_attention_dropout(q, k, v, mask, seed, 0.3, SCALE)
    b = flash_attention_dropout(q, k, v, mask, seed, 0.3, SCALE)
    c = flash_attention_dropout(q, k, v, mask,
                                jnp.asarray([[999]], jnp.int32), 0.3, SCALE)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # expectation preserved roughly (inverted dropout)
    base = flash_attention_dropout(q, k, v, mask, seed, 0.0, SCALE)
    assert abs(float(jnp.mean(a)) - float(jnp.mean(base))) < 0.05


def test_dropout_gradient_numerical_check():
    """At a fixed seed the op is smooth in q/k/v — central differences must
    match the custom VJP."""
    q, k, v, mask, _, seed = make_inputs(4)
    co = jnp.asarray(np.random.default_rng(5).normal(
        size=(B, H, N, Dh)).astype(np.float32))

    def f(q, k, v):
        return jnp.sum(flash_attention_dropout(q, k, v, mask, seed, 0.25,
                                               SCALE) * co)

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    rng = np.random.default_rng(6)
    for arg_i, (x, g) in enumerate(zip((q, k, v), grads)):
        u = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
        eps = 1e-2
        args_p = [q, k, v]
        args_m = [q, k, v]
        args_p[arg_i] = x + eps * u
        args_m[arg_i] = x - eps * u
        num = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
        ana = float(jnp.vdot(g, u))
        assert abs(num - ana) < 3e-2 * max(abs(num), abs(ana), 1.0), \
            f"arg {arg_i}: numerical {num} vs vjp {ana}"


def test_dropout_zeroes_fraction():
    """Empirical drop fraction of attention outputs ~ rate (checked via the
    count of exactly-preserved rows being < 1)."""
    q, k, v, mask, _, seed = make_inputs(7)
    rate = 0.5
    out = np.asarray(flash_attention_dropout(q, k, v, mask, seed, rate,
                                             SCALE))
    base = np.asarray(flash_attention_dropout(q, k, v, mask, seed, 0.0,
                                              SCALE))
    # with half the weights dropped the outputs must differ almost everywhere
    frac_same = np.mean(np.isclose(out, base, rtol=1e-4, atol=1e-5))
    assert frac_same < 0.05


def test_dropout_forward_and_grads_match_masked_reference():
    """Kernel fwd AND custom-VJP grads must equal a dense XLA attention that
    applies the identical hash-derived keep mask (no finite differences)."""
    from vidsum_tpu.ops.attention_train import (
        dropout_attention_reference, reference_keep_mask,
    )
    q, k, v, mask, bool_mask, seed = make_inputs(8)
    rate = 0.25
    keep = reference_keep_mask(1234, B, H, N, rate)
    co = jnp.asarray(np.random.default_rng(9).normal(
        size=(B, H, N, Dh)).astype(np.float32))

    got = flash_attention_dropout(q, k, v, mask, seed, rate, SCALE)
    want = dropout_attention_reference(q, k, v, bool_mask, keep, rate, SCALE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    def f_fused(q, k, v):
        return jnp.sum(flash_attention_dropout(q, k, v, mask, seed, rate,
                                               SCALE) * co)

    def f_ref(q, k, v):
        return jnp.sum(dropout_attention_reference(q, k, v, bool_mask, keep,
                                                   rate, SCALE) * co)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"d{name}")


def test_training_step_through_pallas_dropout_attention():
    """Full train step with attn_impl='pallas' (in-kernel dropout): loss
    decreases and stays finite."""
    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet
    from vidsum_tpu.train.steps import make_finetune_step, make_optimizer

    cfg = ModelConfig(d_model=64, num_heads=4, num_layers=2, dropout=0.3,
                      max_len=128)
    opt = make_optimizer(1e-3, 1e-4)
    step = make_finetune_step(cfg, opt, attn_impl="pallas")
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    opt_state = opt.init(params)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 128, 1024)), jnp.float32)
    t = jnp.asarray(rng.random((2, 128)), jnp.float32)
    m = jnp.zeros((2, 128), bool).at[1, 100:].set(True)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(6):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x, t, m, sub)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


# ---- key-block-folded train kernels (long-context path) --------------------

def test_keep_mask_block_matches_full_width():
    """The folded kernels' per-block mask must be bit-identical to the
    single-pass kernels' full-width mask at the same global coordinates."""
    import numpy as np
    import jax.numpy as jnp

    from vidsum_tpu.ops.attention_train import TILE, _keep_mask, _keep_mask_block

    seed = jnp.asarray(77, jnp.int32)
    full = np.asarray(_keep_mask(seed, 3, 2, 5, (TILE, 512), 0.3))
    for j, kb in ((0, 128), (1, 128), (3, 128), (1, 256)):
        blk = np.asarray(_keep_mask_block(seed, 3, 2, 5 * TILE, j * kb,
                                          (TILE, kb), 0.3))
        assert np.array_equal(blk, full[:, j * kb:(j + 1) * kb])


def test_folded_train_kernels_match_dense_reference(monkeypatch, request):
    """Force the folded fwd/bwd dispatch at a small shape (kb=128, several
    blocks, padded tail) and check outputs AND grads against the dense
    reference applying the identical hash mask."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vidsum_tpu.ops import attention_train as AT

    # the patched predicates are read at TRACE time inside the jitted
    # _forward/_backward*: clear jit caches so (a) no earlier compile of the
    # same (shape, statics) key serves the single-pass kernel under our
    # noses, and (b) the folded-forced entries don't leak to later tests
    jax.clear_caches()
    request.addfinalizer(jax.clear_caches)
    monkeypatch.setattr(AT, "_single_pass_ok", lambda *a: False)
    monkeypatch.setattr(AT, "_pick_key_block", lambda n: 128)

    B, H, N, Dh = 2, 2, 512, 64
    key = jax.random.PRNGKey(11)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, N, Dh),
                                 jnp.float32) for i in range(3))
    pad = jnp.stack([jnp.arange(N) >= 300, jnp.arange(N) >= 200])
    mask8 = pad.astype(jnp.int8)[:, None, :]
    seed = jnp.asarray([[9]], jnp.int32)
    rate, scale = 0.3, float(Dh) ** -0.5
    keep = AT.reference_keep_mask(9, B, H, N, rate)

    out = AT.flash_attention_dropout(q, k, v, mask8, seed, rate, scale)
    ref = AT.dropout_attention_reference(q, k, v, pad, keep, rate, scale)
    for b, nr in ((0, 300), (1, 200)):
        np.testing.assert_allclose(np.asarray(out[b, :, :nr]),
                                   np.asarray(ref[b, :, :nr]),
                                   rtol=2e-5, atol=2e-5)

    def loss_f(q, k, v):
        o = AT.flash_attention_dropout(q, k, v, mask8, seed, rate, scale)
        return jnp.sum(jnp.where(~pad[:, None, :, None], o, 0.0) ** 2)

    def loss_r(q, k, v):
        o = AT.dropout_attention_reference(q, k, v, pad, keep, rate, scale)
        return jnp.sum(jnp.where(~pad[:, None, :, None], o, 0.0) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_past_folded_budget_raises_with_guidance():
    """Beyond the key-folded kernels' VMEM budget there is no single-chip
    training path (dense XLA needs the (B, H, N, N) tensor in HBM): the
    dispatch must raise a descriptive error at trace time — not submit a
    kernel the Mosaic allocator cannot place — and the public predicate
    must gate exactly that envelope."""
    import pytest

    from vidsum_tpu.ops.attention_train import (
        flash_attention_dropout, flash_train_supported)

    # measured on-chip edge (scripts/repro_40k_train_compile.py, v5e):
    # bf16 flagship N=20480 compiles and runs (94.9 MB scoped VMEM incl.
    # spills); N=22528 is refused by the Mosaic allocator (99.0 MB vs the
    # 96 MB limit). The guard must sit exactly on that boundary.
    assert flash_train_supported(20480, 64, 2)
    assert not flash_train_supported(22528, 64, 2)
    # f32 halves the window budget (double-buffered lane-padded windows)
    assert flash_train_supported(10240, 64, 4)
    N, Dh = 36864, 64
    assert not flash_train_supported(N, Dh, 4)

    args = (jax.ShapeDtypeStruct((1, 1, N, Dh), jnp.float32),) * 3 + (
        jax.ShapeDtypeStruct((1, 1, N), jnp.int8),
        jax.ShapeDtypeStruct((1, 1), jnp.int32))
    with pytest.raises(ValueError, match="seq_forward"):
        jax.eval_shape(lambda q, k, v, m, s: flash_attention_dropout(
            q, k, v, m, s, 0.3, Dh ** -0.5), *args)
