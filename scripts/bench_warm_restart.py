"""Serving warm-restart measurement (VERDICT r3 #6).

A fresh process builds the flagship serving service and times
``warmup(lengths=...)`` over the full (bucket x batch) program grid twice:

- with the persistent compile cache ON (the production default): every
  program should be a cache HIT — the restart cost of a redeployed server;
- optionally with ``--cold`` (VIDSUM_TPU_CACHE_DIR=off, one program only):
  the cold remote-compile baseline each hit avoids.

Run on the real TPU (single-client tunnel). Prints one line per program
(the ``warmup()`` return) and a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", default="320,480,512")
    ap.add_argument("--max_batch", type=int, default=32)
    ap.add_argument("--cold", action="store_true",
                    help="disable the persistent cache and time ONE "
                         "program (the cold baseline)")
    args = ap.parse_args()

    if args.cold:
        os.environ["VIDSUM_TPU_CACHE_DIR"] = "off"
    from vidsum_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet
    from vidsum_tpu.serve import ScoringService

    cfg = ModelConfig(d_model=256, compute_dtype="bfloat16")
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    svc = ScoringService(params, cfg, max_batch=args.max_batch,
                         max_delay_ms=3.0)
    lengths = [int(s) for s in args.lengths.split(",")]
    if args.cold:
        lengths, batches = lengths[:1], [1]
    else:
        batches = None
    t0 = time.monotonic()
    warmed = svc.warmup(lengths=lengths, batch_sizes=batches)
    total = time.monotonic() - t0
    for n_b, b, dt in warmed:
        print(f"  (bucket={n_b}, batch={b}): {dt:.2f}s")
    print(json.dumps({
        "metric": "serving_warm_restart",
        "mode": "cold" if args.cold else "cached",
        "programs": len(warmed),
        "total_s": round(total, 2),
        "per_program_s": [round(dt, 2) for *_, dt in warmed],
        "median_program_s": round(float(np.median([dt for *_, dt
                                                   in warmed])), 2),
    }))
    svc.close()


if __name__ == "__main__":
    main()
