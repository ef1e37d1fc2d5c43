"""End-task accuracy cost of the lossy ``wire_dtype="int8"`` serving wire.

The int8 wire (serve.py "int8 wire": per-frame symmetric quantization,
f32 scale riding along, dequantized on device) buys ~2x request
throughput on relay-attached hosts (PERF.md "Serving transport,
revisited") by halving the host->device bytes vs bf16. It is lossy BY
DESIGN: scores shift by the input-quantization error, so selections are
no longer bit-pinned to the f32-wire service. This study puts a number
on that: over a corpus of synthetic videos at the flagship model shape,
how often does the final knapsack summary change at all, and how close
are the summaries when it does?

Method (function-level, CPU backend): for each video, build the padded
f32 row exactly as the service wire does, run the scorer; then quantize
the same row with the service's own quantizer (serve.py:551-557
replicated here by calling the same arithmetic), dequantize, run the
same scorer; compose both score vectors through the host pipeline
(``generate_summary``: KTS bounds fixed per video, so only the scores
differ) and compare frame-level summaries. The transport itself is
bit-exact (fuzz_serve_transport pins served-int8 == this dequantized
forward); the quantizer is the only lossy step, so this isolates it.

Feature realism: half the corpus is N(0,1) rows (the fuzz distribution),
half is a pool5-like flavor — ReLU(N(0,1)) scaled by a per-frame
lognormal magnitude — since symmetric-absmax quantization error depends
on the per-row distribution (outlier-heavy rows quantize coarser).
Weights: random inits over several seeds by default; ``--ckpt`` loads a
TRAINED scorer instead (scripts/soak_protocol.py --workdir mints a
converged flagship checkpoint on synthetic data in ~15 min) — a trained
scorer's score distribution near knapsack ties is more structured than a
random one's, so the trained-weights number is the one that counts
(VERDICT r4 #1; PERF.md "int8 accuracy on trained checkpoints").

Output: one JSON line -- corpus size, % bit-identical summaries,
frame-level F1 between int8/f32 summaries for the differing ones
(mean/min), and the score-delta distribution (p50/p99/max), per flavor.

Run (CPU, ~10 min):  python scripts/study_int8_wire_accuracy.py --n 2000
Record: PERF.md "Serving transport, revisited" / PARITY fuzz section.
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

from vidsum_tpu.config import ModelConfig  # noqa: E402
from vidsum_tpu.data.collate import bucket_length  # noqa: E402
from vidsum_tpu.models import init_simnet  # noqa: E402
from vidsum_tpu.ops.summary import generate_summary  # noqa: E402
from vidsum_tpu.train.steps import make_eval_forward  # noqa: E402

CFG = ModelConfig(dropout=0.0)          # flagship shape: 1024 -> 256, 4L
PAD_VALUE = 1000.0                      # the wire's pad sentinel
BUCKET = 128


def quantize_row(row: np.ndarray):
    """The service's per-frame symmetric quantizer (serve.py int8 wire)."""
    absmax = np.abs(row).max(axis=1)
    scale = np.where(absmax > 0.0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(row / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale


def random_video(rng, flavor: str):
    n = int(rng.integers(16, 400))
    if flavor == "normal":
        feats = rng.normal(size=(n, CFG.in_features)).astype(np.float32)
    else:  # pool5-like: nonnegative, sparse-ish, per-frame magnitude spread
        feats = np.maximum(rng.normal(size=(n, CFG.in_features)), 0.0)
        feats *= rng.lognormal(mean=0.0, sigma=0.75,
                               size=(n, 1)).astype(np.float32)
        feats = feats.astype(np.float32)
    step = int(rng.integers(1, 20))
    picks = np.arange(n, dtype=np.int64) * step
    n_frames = int(picks[-1] + rng.integers(1, step + 1))
    n_shots = int(rng.integers(2, 16))
    n_cuts = min(n_shots - 1, max(0, n_frames - 1))
    cuts = (np.sort(rng.choice(np.arange(1, n_frames), n_cuts,
                               replace=False))
            if n_cuts else np.array([], np.int64))
    bounds = np.concatenate([[0], cuts, [n_frames]])
    cps = np.stack([bounds[:-1], bounds[1:] - 1], axis=1).astype(np.int64)
    return feats, picks, n_frames, cps


def frame_f1(a: np.ndarray, b: np.ndarray) -> float:
    inter = float(np.sum((a > 0) & (b > 0)))
    tot = float(np.sum(a > 0) + np.sum(b > 0))
    return 1.0 if tot == 0 else 2.0 * inter / tot


def load_params(ckpt_path, cfg):
    """Load a trained scorer checkpoint (the soak-minted model_mae.ckpt —
    VERDICT r4 #1: accuracy claims on trained, not random, weights)."""
    from vidsum_tpu.train.checkpoint import load_checkpoint

    params0 = init_simnet(jax.random.PRNGKey(0), cfg)
    params, _ = load_checkpoint(ckpt_path, params0)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000,
                    help="videos per (flavor x param-seed) cell / 2")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--param_seeds", type=int, default=3)
    ap.add_argument("--budget", type=float, default=0.15)
    ap.add_argument("--ckpt", default=None,
                    help="trained scorer checkpoint (msgpack): replaces "
                        "the random param seeds — the trained-weights "
                        "re-measurement of the lossy-wire accuracy claim")
    ap.add_argument("--d_model", type=int, default=256)
    args = ap.parse_args()

    cfg = ModelConfig(dropout=0.0, d_model=args.d_model)
    fwd = make_eval_forward(cfg, attn_impl="xla")
    if args.ckpt:
        param_sets = [load_params(args.ckpt, cfg)]
    else:
        param_sets = [init_simnet(jax.random.PRNGKey(100 + ps), cfg)
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
                row = np.full((nb, cfg.in_features), PAD_VALUE, np.float32)
                row[:n] = feats
                mask = np.ones((1, nb), bool)
                mask[0, :n] = False
                q, scale = quantize_row(row)
                deq = q.astype(np.float32) * scale[:, None]
                s32 = np.asarray(fwd(params, jnp.asarray(row[None]),
                                     jnp.asarray(mask)))[0, :n]
                s8 = np.asarray(fwd(params, jnp.asarray(deq[None]),
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
    print(json.dumps(dict(config=f"1024x{args.d_model}x4L",
                          weights=(args.ckpt or "random-init"),
                          budget=args.budget, seed=args.seed,
                          param_seeds=len(param_sets), **out)))


if __name__ == "__main__":
    main()
