"""End-task accuracy cost of the W8A8 int8 COMPUTE path (ops/quant.py).

Sibling of scripts/study_int8_wire_accuracy.py, one level deeper: the
wire study quantizes only the INPUT features (the serving transport);
this study runs the whole scorer quantized — every linear matmul in int8
with dynamic per-row activation scales (Q·K^T follows the production
default: bf16, VIDSUM_TPU_INT8_QK to override)
(``attn_impl='int8_xla'``, the dense arithmetic reference of the fused
``int8_block`` kernel — the kernel agrees with it to the quantization
noise floor, tests/test_quant.py). Same question: over a corpus of
synthetic videos at the flagship shape, how often does the final
knapsack summary change vs the f32 scorer, and how close is it when it
does?

Method identical to the wire study (same corpus generator, same two
feature flavors, same fixed-KTS composition through the host
``generate_summary``), so the two numbers are directly comparable:
the wire study measured 99.8% bit-identical summaries; full compute
quantization is strictly lossier and this measures by how much.

Weights: random inits by default; ``--ckpt`` loads a trained scorer
(soak-minted) — the trained-weights identical-summary rate near knapsack
ties is the number that counts (VERDICT r4 #1).

Run (CPU, ~15 min):  python scripts/study_int8_compute_accuracy.py --n 2000
Record: PERF.md "int8 scoring" / PARITY.md.
"""

import argparse
import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1"
                           ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from vidsum_tpu.config import ModelConfig  # noqa: E402
from vidsum_tpu.data.collate import bucket_length  # noqa: E402
from vidsum_tpu.models import init_simnet  # noqa: E402
from vidsum_tpu.ops.summary import generate_summary  # noqa: E402
from vidsum_tpu.train.steps import make_eval_forward  # noqa: E402

from study_int8_wire_accuracy import (frame_f1, quantize_row,  # noqa: E402
                                      random_video)

PAD_VALUE = 1000.0
BUCKET = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000,
                    help="videos per (flavor x param-seed) cell / 2")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--param_seeds", type=int, default=3)
    ap.add_argument("--budget", type=float, default=0.15)
    ap.add_argument("--int8_wire_too", action="store_true",
                    help="also quantize the input row (compound: int8 wire "
                         "+ int8 compute, the full-stack lossy config)")
    ap.add_argument("--d_model", type=int, default=256,
                    help="256 = flagship; 512 = the shape where the int8 "
                         "kernel wins on chip (PERF.md 'int8 scoring')")
    ap.add_argument("--ckpt", default=None,
                    help="trained scorer checkpoint (msgpack): replaces "
                         "the random param seeds — the trained-weights "
                         "re-measurement (VERDICT r4 #1). Width must match "
                         "--d_model (soak_protocol.py --d_model mints it)")
    args = ap.parse_args()
    CFG = ModelConfig(dropout=0.0, d_model=args.d_model)

    fwd32 = make_eval_forward(CFG, attn_impl="xla")
    fwd8 = make_eval_forward(CFG, attn_impl="int8_xla")
    if args.ckpt:
        from study_int8_wire_accuracy import load_params
        param_sets = [load_params(args.ckpt, CFG)]
    else:
        param_sets = [init_simnet(jax.random.PRNGKey(100 + ps), CFG)
                      for ps in range(args.param_seeds)]
    rng = np.random.default_rng(args.seed)
    out = {}
    for flavor in ("normal", "pool5like"):
        stats = dict(n=0, identical=0, f1s=[], dmax=[])
        for params in param_sets:
            for _ in range(args.n // (2 * len(param_sets))):
                feats, picks, n_frames, cps = random_video(rng, flavor)
                n = feats.shape[0]
                nb = bucket_length(n, BUCKET)
                row = np.full((nb, CFG.in_features), PAD_VALUE, np.float32)
                row[:n] = feats
                mask = np.ones((1, nb), bool)
                mask[0, :n] = False
                row8 = row
                if args.int8_wire_too:
                    q, scale = quantize_row(row)
                    row8 = q.astype(np.float32) * scale[:, None]
                s32 = np.asarray(fwd32(params, jnp.asarray(row[None]),
                                       jnp.asarray(mask)))[0, :n]
                s8 = np.asarray(fwd8(params, jnp.asarray(row8[None]),
                                     jnp.asarray(mask)))[0, :n]
                [sum32] = generate_summary([cps], [s32], [n_frames], [picks],
                                           budget_ratio=args.budget)
                [sum8] = generate_summary([cps], [s8], [n_frames], [picks],
                                          budget_ratio=args.budget)
                stats["n"] += 1
                stats["dmax"].append(float(np.max(np.abs(s8 - s32))))
                if np.array_equal(sum32, sum8):
                    stats["identical"] += 1
                else:
                    stats["f1s"].append(frame_f1(sum32, sum8))
        d = np.array(stats["dmax"])
        f1s = np.array(stats["f1s"]) if stats["f1s"] else np.array([1.0])
        out[flavor] = dict(
            videos=stats["n"],
            identical_pct=round(100.0 * stats["identical"] / stats["n"], 2),
            diff_f1_mean=round(float(f1s.mean()), 4),
            diff_f1_min=round(float(f1s.min()), 4),
            score_delta_p50=float(np.quantile(d, 0.5)),
            score_delta_p99=float(np.quantile(d, 0.99)),
            score_delta_max=float(d.max()),
        )
    print(json.dumps(dict(config=f"1024x{args.d_model}x4L-int8compute",
                          wire_too=bool(args.int8_wire_too),
                          weights=(args.ckpt or "random-init"),
                          budget=args.budget, seed=args.seed,
                          param_seeds=len(param_sets), **out)))


if __name__ == "__main__":
    main()
