"""On-chip validation of the trainable dropout-attention kernel.

The CPU test harness cannot exercise the dropout bits (the TPU interpreter's
``prng_random_bits`` is an all-zeros stub), so this script runs the
hardware-only checks from tests/test_attention_train.py on the real chip:

  1. same seed → bit-identical outputs; different seed → different outputs;
  2. inverted-dropout expectation preservation;
  3. numerical gradient check of the custom VJP at a fixed seed;
  4. drop-fraction sanity.

Run: python scripts/validate_dropout_kernel.py   (on the TPU host)

Last recorded run: see VALIDATION block printed at the end / PERF.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vidsum_tpu.ops.attention_train import flash_attention_dropout

B, H, N, Dh = 2, 2, 128, 16
SCALE = 0.1


def main() -> None:
    assert jax.default_backend() == "tpu", "run on the TPU host"
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, Dh)), jnp.float32)
               for _ in range(3))
    bool_mask = np.zeros((B, N), bool)
    bool_mask[:, 100:] = True
    mask = jnp.asarray(bool_mask.astype(np.int8))[:, None, :]
    seed = jnp.asarray([[1234]], jnp.int32)

    a = np.asarray(flash_attention_dropout(q, k, v, mask, seed, 0.3, SCALE))
    b = np.asarray(flash_attention_dropout(q, k, v, mask, seed, 0.3, SCALE))
    c = np.asarray(flash_attention_dropout(
        q, k, v, mask, jnp.asarray([[999]], jnp.int32), 0.3, SCALE))
    base = np.asarray(flash_attention_dropout(q, k, v, mask, seed, 0.0,
                                              SCALE))
    assert (a == b).all(), "same seed must be bit-identical"
    assert not np.allclose(a, c), "different seeds must differ"
    mean_drift = abs(a.mean() - base.mean())
    assert mean_drift < 0.05, f"expectation drift {mean_drift}"
    frac_same = np.mean(np.isclose(a, base, rtol=1e-4, atol=1e-5))
    assert frac_same < 0.05, f"too many unchanged outputs: {frac_same}"

    from vidsum_tpu.ops.attention_train import (
        dropout_attention_reference, reference_keep_mask,
    )
    keep = reference_keep_mask(1234, B, H, N, 0.25)
    co = jnp.asarray(np.random.default_rng(5).normal(
        size=(B, H, N, Dh)).astype(np.float32))

    def f_fused(q, k, v):
        return jnp.sum(flash_attention_dropout(q, k, v, mask, seed, 0.25,
                                               SCALE) * co)

    def f_ref(q, k, v):
        bm = jnp.asarray(np.asarray(mask)[:, 0, :] != 0)
        return jnp.sum(dropout_attention_reference(q, k, v, bm, keep, 0.25,
                                                   SCALE) * co)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    worst = 0.0
    for name, ga, gb in zip("qkv", g_fused, g_ref):
        ga, gb = np.asarray(ga), np.asarray(gb)
        rel = np.abs(ga - gb).max() / max(np.abs(gb).max(), 1e-6)
        worst = max(worst, float(rel))
        assert rel < 1e-2, f"d{name} max rel err {rel}"
    print(f"VALIDATION OK: determinism, seed-variation, expectation drift "
          f"{mean_drift:.4f}, drop-coverage {1-frac_same:.3f}, grad-check "
          f"worst rel err {worst:.4f}")


if __name__ == "__main__":
    main()
