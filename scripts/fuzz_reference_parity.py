"""Large-scale differential fuzz vs the reference's own code (CPU).

Runs the same generators as ``tests/test_reference_differential.py`` at
soak volume (default 10,000 videos) and prints a one-line JSON record of
mismatches per component. Used to back PARITY.md's zero-mismatch claims;
the pytest module keeps a smaller always-on volume.

Usage:
    python scripts/fuzz_reference_parity.py [--n 10000] [--device-eval]

``--device-eval`` additionally cross-checks ``eval_impl='device'``
(ops/device_eval.py) against the host pipeline per video (VERDICT r1 #6
evidence; runs on whatever backend JAX resolves — use the CPU harness
unless you intend to occupy the TPU tunnel).
"""

import argparse
import json
import sys
import time

if "--tpu" not in sys.argv:
    # keep this CPU-only by default: the axon sitecustomize would otherwise
    # dial the single-client TPU tunnel for the --device-eval path
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

from vidsum_tpu.ops.knapsack import knapsack as our_knapsack
from vidsum_tpu.ops.summary import generate_summary as our_generate_summary
from vidsum_tpu.ops.summary import upsample as our_upsample
from vidsum_tpu.ops import kts as our_kts

from src.evaluation.generate_summary import (          # noqa: E402
    generate_summary as ref_generate_summary,
)
from src.evaluation.compute_metrics import upsample as ref_upsample
from src.evaluation.knapsack_implementation import knapSack as ref_knapsack
from src.data.preprocess.segmentations.kts.cpd_auto import (
    kts_segmentation as ref_kts_segmentation,
)

sys.path.insert(0, "/root/repo/tests")
from test_reference_differential import _FLAVORS, _random_video  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--kts_n", type=int, default=300)
    ap.add_argument("--device-eval", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="let JAX resolve the real backend (occupies the "
                         "single-client tunnel)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    mism = {"summary": 0, "upsample": 0, "knapsack": 0, "kts": 0,
            "device_eval": 0}
    checked = dict(mism)

    dev_summary = None
    if args.device_eval:
        from vidsum_tpu.ops.device_eval import device_generate_summary
        dev_summary = device_generate_summary

    for i in range(args.n):
        picks, n_frames, scores, cp = _random_video(
            rng, _FLAVORS[i % len(_FLAVORS)])
        ours = our_generate_summary([cp], [scores], [n_frames], [picks])[0]
        ref = ref_generate_summary([cp], [scores], [n_frames],
                                   [np.asarray(picks)])[0]
        checked["summary"] += 1
        if not np.array_equal(ours, ref):
            mism["summary"] += 1
        checked["upsample"] += 1
        if not np.array_equal(our_upsample(scores, n_frames, picks),
                              ref_upsample(scores, n_frames,
                                           np.asarray(picks))):
            mism["upsample"] += 1
        if dev_summary is not None:
            # all flavors: DSNet-shaped videos run the kernel; nonmono/
            # overhang/short_scores violate device_eligible's contract and
            # exercise the enforced host-oracle fallback routing
            checked["device_eval"] += 1
            dev = dev_summary([cp], [scores], [n_frames], [picks])[0]
            if not np.array_equal(dev, ref):
                mism["device_eval"] += 1
            if checked["device_eval"] % 400 == 0:
                # one compiled program per (picks, frames, shots, width)
                # bucket: 10k randomized videos hit hundreds of buckets and
                # the caches eventually OOM the LLVM JIT — drop them
                import jax

                from vidsum_tpu.ops import device_eval as _de

                _de._make_kernel.cache_clear()
                _de._make_batched_kernel.cache_clear()
                jax.clear_caches()

    for i in range(args.n // 2):
        n = int(rng.integers(1, 30))
        if i % 3 == 0:
            wt = rng.integers(1, 5, size=n).tolist()
            val = (rng.integers(0, 4, size=n) / 4.0).tolist()
        else:
            wt = rng.integers(1, 30, size=n).tolist()
            val = rng.random(n).astype(np.float32).astype(float).tolist()
        W = int(rng.integers(0, int(np.sum(wt)) + 2))
        checked["knapsack"] += 1
        if our_knapsack(W, wt, val) != ref_knapsack(W, wt, val, n):
            mism["knapsack"] += 1

    for i in range(args.kts_n):
        n = int(rng.integers(10, 80))
        d = int(rng.integers(4, 24))
        x = rng.normal(size=(n, d))
        K = x @ x.T
        ncp = int(rng.integers(1, min(12, n - 1) + 1))
        vmax = float(np.trace(K) / n) + 1e-6
        cps_o, costs_o = our_kts.kts_segmentation(K, ncp, vmax)
        cps_r, costs_r = ref_kts_segmentation(K, ncp, vmax, verbose=False)
        checked["kts"] += 1
        if not (np.array_equal(cps_o, cps_r)
                and np.array_equal(costs_o, costs_r)):
            mism["kts"] += 1

    print(json.dumps({"checked": checked, "mismatches": mism,
                      "seconds": round(time.time() - t0, 1),
                      "seed": args.seed}))
    return 1 if any(mism.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
