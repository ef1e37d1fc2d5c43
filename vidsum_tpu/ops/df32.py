"""Double-float (two-f32) arithmetic for tie-safe on-device reductions.

TPUs have no f64 units, but the ``eval_impl="device"`` pipeline
(:mod:`vidsum_tpu.ops.device_eval`) must reproduce the host oracle's
float64 knapsack semantics (``src/evaluation/knapsack_implementation.py``
DP + backtrack keyed on exact float equality): plain f32 accumulation
demonstrably flips selections at a few hundred shots
(``scripts/fuzz_reference_parity.py --device-eval`` measured 41/111
mismatches on the many-tiny-shots flavor before this module existed).

Each value is an unevaluated sum ``hi + lo`` of two f32 with
``|lo| <= ulp(hi)/2`` — ~48 effective mantissa bits, between f32 (24) and
f64 (53). All primitives are branch-free elementwise f32 HLOs (Knuth
two-sum / Dekker fast-two-sum), so they vectorize on the VPU and work
under ``vmap``/``scan``/``associative_scan`` on every backend.

Representation invariant: pairs are normalized (``hi = fl(hi + lo)``)
after every operation, so equal values produced by the same operation
sequence compare bitwise equal — which is what the reference's
``K[i][w] != K[i-1][w]`` backtrack needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def two_sum(a, b):
    """Exact rounding-error split: a + b == s + e with s = fl(a + b)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """two_sum requiring |a| >= |b| (3 flops instead of 6)."""
    s = a + b
    return s, b - (s - a)


def df_add(ah, al, bh, bl):
    """Double-float addition (Dekker/Knuth add2, ~2^-47 relative error)."""
    sh, sl = two_sum(ah, bh)
    th, tl = two_sum(al, bl)
    sl = sl + th
    h, l = fast_two_sum(sh, sl)
    l = l + tl
    return fast_two_sum(h, l)


def df_neg(h, l):
    return -h, -l


def df_sub(ah, al, bh, bl):
    return df_add(ah, al, -bh, -bl)


def df_cumsum(x):
    """Inclusive double-float cumulative sum of an f32 vector along its
    last axis via a log-depth associative scan. Returns (hi, lo) arrays.

    df_add is not exactly associative, but every path keeps ~2^-47
    accuracy — 6 orders tighter than the f32 cumsum it replaces."""
    x = jnp.asarray(x, jnp.float32)

    def combine(a, b):
        return df_add(a[0], a[1], b[0], b[1])

    return jax.lax.associative_scan(combine, (x, jnp.zeros_like(x)),
                                    axis=-1)


def df_ge(ah, al, bh, bl):
    """a >= b on normalized pairs (lexicographic: hi, then lo)."""
    return (ah > bh) | ((ah == bh) & (al >= bl))


def df_neq(ah, al, bh, bl):
    """Bitwise inequality of normalized pairs (the backtrack test)."""
    return (ah != bh) | (al != bl)
