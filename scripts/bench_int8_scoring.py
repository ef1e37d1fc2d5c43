"""On-chip A/B: int8 (W8A8) fused scoring vs the bf16 production scorer.

Decides whether ``attn_impl='int8_block'`` (ops/block_kernel_int8.py)
earns its keep: the int8 MXU measured 1.91x bf16 through XLA dot_general
at 2048^3 (scripts/probe_int8_mxu.py), but the scorer's matmuls are
(B·N, 256/1024)-shaped, the quantizer adds VPU passes, and the bf16
baseline is the fused pallas_block kernel — so the end-to-end ratio is
an empirical question. Cases per shape:

- ``bf16_block``  — production fused bf16 kernel (pallas_block)
- ``int8_block``  — fused int8 kernel, Q·K^T int8 (VIDSUM_TPU_INT8_QK=1)
- ``int8_noqk``   — fused int8 kernel, Q·K^T kept bf16
- ``int8_xla``    — dense XLA int8 path (no Pallas), for attribution

Timing: chained lax.scan forwards, chain-length differenced
(utils/chain_timing — survives the relay's RPC jitter). Run ALONE on the
chip (single-client tunnel, quiet CPU). Prints one JSON line; record in
PERF.md "int8 scoring".
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from vidsum_tpu.config import ModelConfig  # noqa: E402
from vidsum_tpu.models import init_simnet  # noqa: E402
from vidsum_tpu.models.simnet import simnet_apply  # noqa: E402
from vidsum_tpu.utils.chain_timing import time_per_iter  # noqa: E402

_ap = argparse.ArgumentParser()
_ap.add_argument("--d_model", type=int, default=256,
                 help="flagship is 256; larger probes where the int8 MXU "
                      "rate dominates the step (PERF.md 'int8 scoring')")
_ap.add_argument("--shapes", default="32x512,8x128")
_args = _ap.parse_args()

CFG = ModelConfig(d_model=_args.d_model, num_heads=4, num_layers=4,
                  dropout=0.0, compute_dtype="bfloat16")
SHAPES = [tuple(int(v) for v in s.split("x"))
          for s in _args.shapes.split(",")]


def make_case(params, attn_impl, B, N, qk_int8=None):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, N, 1024)), jnp.float32)
    mask = jnp.zeros((B, N), bool)

    if qk_int8 is not None:
        import os
        os.environ["VIDSUM_TPU_INT8_QK"] = "1" if qk_int8 else "0"

    def mk(iters):
        @jax.jit
        def run(p, x):
            def body(c, _):
                s, _ = simnet_apply(p, CFG, x + c[..., None] * 1e-6, mask,
                                    deterministic=True, attn_impl=attn_impl)
                return jax.nn.sigmoid(s[..., 0]).astype(jnp.float32), ()
            out, _ = lax.scan(body, jnp.zeros((B, N), jnp.float32), None,
                              length=iters)
            return out
        return run

    return mk, (params, x0)


def main():
    params = init_simnet(jax.random.PRNGKey(0), CFG)
    out = {"backend": jax.default_backend(), "d_model": _args.d_model}
    for B, N in SHAPES:
        shape_key = f"B{B}xN{N}"
        res = {}
        cases = [
            ("bf16_block", "pallas_block", None),
            ("int8_block", "int8_block", True),
            ("int8_noqk", "int8_block", False),
            ("int8_xla", "int8_xla", None),
        ]
        for name, impl, qk in cases:
            try:
                mk, args = make_case(params, impl, B, N, qk_int8=qk)
                best, med = time_per_iter(mk, args, k1=20, k2=100, samples=5)
                res[name] = {"ms": round(best * 1e3, 4),
                             "ms_med": round(med * 1e3, 4),
                             "mframes_s": round(B * N / best / 1e6, 2)}
            except Exception as e:
                res[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        base = res.get("bf16_block", {}).get("ms")
        if base:
            for k, v in res.items():
                if "ms" in v and k != "bf16_block":
                    v["speedup_vs_bf16"] = round(base / v["ms"], 3)
        out[shape_key] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
