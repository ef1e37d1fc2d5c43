"""Probe: does int8 matmul actually run ~2x bf16 on this chip?

v5e's MXU is specced at 394 int8 TOPS vs 197 bf16 TFLOPS. Whether a
quantized inference path is worth building depends on whether that 2x is
reachable (a) through plain XLA ``dot_general`` with int8 operands and
int32 accumulation, and (b) inside a Pallas kernel (Mosaic int8 dot
support through the axon toolchain). This probe measures both against a
bf16 baseline at MXU-friendly shapes, chain-length differenced
(utils/chain_timing — the only timing scheme that survives the relay's
RPC jitter, PERF.md "Dispatch-RPC artifact").

Run ALONE on the chip (single-client tunnel, quiet CPU) — results feed
the decision on an opt-in int8 scoring kernel. Prints one JSON line.
"""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import sys
sys.path.insert(0, "/root/repo")
from vidsum_tpu.utils.chain_timing import time_per_iter  # noqa: E402

_ap = argparse.ArgumentParser()
_ap.add_argument("--m", type=int, default=2048)
_ap.add_argument("--n", type=int, default=2048)
_ap.add_argument("--k", type=int, default=2048)
_ap.add_argument("--tile", type=int, default=512)
_ap.add_argument("--k1", type=int, default=32)
_ap.add_argument("--k2", type=int, default=160)
_args = _ap.parse_args()
M, N, K = _args.m, _args.n, _args.k
FLOPS = 2 * M * N * K


def make_bf16(iters):
    @jax.jit
    def run(x, w):
        def body(c, _):
            c = jax.lax.dot(c, w)
            return (c * 1e-3).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c.sum()
    return run


def make_int8_xla(iters):
    @jax.jit
    def run(x, w):
        def body(c, _):
            o = jax.lax.dot_general(c, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (o >> 8).astype(jnp.int8), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c.sum()
    return run


def _mm_kernel_bf16(x_ref, w_ref, o_ref):
    o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                         preferred_element_type=jnp.float32
                         ).astype(jnp.bfloat16)


def _mm_kernel_int8(x_ref, w_ref, o_ref):
    o = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.int32)
    o_ref[...] = (o >> 8).astype(jnp.int8)


def make_pallas(kernel, out_dtype, iters, tile=512):
    grid = (M // tile, N // tile)
    mm = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile, K), lambda i, j: (i, 0)),
                  pl.BlockSpec((K, tile), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )

    @jax.jit
    def run(x, w):
        def body(c, _):
            return mm(c, w), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c.sum()
    return run


def main():
    kb = jax.random.PRNGKey(0)
    ab = jax.random.normal(kb, (M, K), jnp.bfloat16)
    bb = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
    ai = jax.random.randint(kb, (M, K), -127, 127, jnp.int8)
    bi = jax.random.randint(kb, (K, N), -127, 127, jnp.int8)
    out = {"backend": jax.default_backend(), "shape": f"{M}x{K}x{N}"}
    cases = [
        ("bf16_xla", make_bf16, (ab, bb)),
        ("int8_xla", make_int8_xla, (ai, bi)),
        ("bf16_pallas", lambda it: make_pallas(_mm_kernel_bf16,
                                               jnp.bfloat16, it), (ab, bb)),
        ("int8_pallas", lambda it: make_pallas(_mm_kernel_int8,
                                               jnp.int8, it), (ai, bi)),
    ]
    for name, mk, a in cases:
        try:
            best, med = time_per_iter(mk, a, k1=_args.k1, k2=_args.k2, samples=7)
            out[name] = {"ms": round(best * 1e3, 4),
                         "ms_med": round(med * 1e3, 4),
                         "tops": round(FLOPS / best / 1e12, 1)}
        except Exception as e:  # Mosaic may reject int8 dots outright
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
    if isinstance(out.get("bf16_xla"), dict) and "ms" in out["bf16_xla"]:
        for k in ("int8_xla", "int8_pallas"):
            if "ms" in out.get(k, {}):
                out[k]["speedup_vs_bf16_xla"] = round(
                    out["bf16_xla"]["ms"] / out[k]["ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
