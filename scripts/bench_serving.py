"""Serving throughput/latency on the real chip.

Closed-loop load generator against :class:`vidsum_tpu.serve.ScoringService`:
C client threads each keep one request in flight (submit -> wait -> submit),
with video lengths drawn from a fixed mix. Reports completed requests/s,
scored frames/s, and latency quantiles, at several concurrency levels.

Serving wall time *includes* per-batch dispatch+fetch RPCs — on the axon
relay those are ~25-40 ms/batch, a genuine deployment cost of this
tunnel-attached topology (a co-located host pays microseconds). The relay
probe is printed first so slow-window runs are machine-visible (PERF.md
methodology).

Usage: python scripts/bench_serving.py [--requests 64] [--max_batch 32]
       [--lengths 320,480,512] [--concurrency 1,8,32] [--summary]
"""

from __future__ import annotations

import argparse
import threading
import time

import numpy as np


def probe_relay_ms(reps: int = 5) -> float:
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(())
    float(f(x))  # compile
    t0 = time.monotonic()
    for _ in range(reps):
        x = f(x)
        float(x)
    return (time.monotonic() - t0) / reps * 1e3


def run_level(svc, lengths, d, concurrency: int, requests: int,
              want_summary: bool):
    rng = np.random.default_rng(0)
    videos = [rng.normal(size=(int(lengths[i % len(lengths)]), d))
              .astype(np.float32) for i in range(requests)]
    idx = {"i": 0}
    lock = threading.Lock()
    errors = []

    def client():
        while True:
            with lock:
                i = idx["i"]
                if i >= requests:
                    return
                idx["i"] += 1
            try:
                svc.submit(videos[i], want_summary=want_summary).result(
                    timeout=600)
            except Exception as e:  # noqa: BLE001 — report, don't hang
                errors.append(e)
                return

    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    if errors:
        raise errors[0]
    frames = sum(v.shape[0] for v in videos)
    return wall, frames


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--max_batch", type=int, default=32)
    ap.add_argument("--max_delay_ms", type=float, default=3.0)
    ap.add_argument("--lengths", default="320,480,512")
    ap.add_argument("--concurrency", default="1,8,32")
    ap.add_argument("--summary", action="store_true",
                    help="include host shot selection (KTS+knapsack) in the "
                         "served work")
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--compute", default="bfloat16",
                    help="compute_dtype (production scoring is bfloat16; "
                         "wire_dtype='auto' then ships bf16 — bit-identical, "
                         "half the relay bytes)")
    args = ap.parse_args()

    from vidsum_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet
    from vidsum_tpu.serve import ScoringService

    print(f"backend: {jax.default_backend()}  "
          f"relay probe: {probe_relay_ms():.1f} ms/fetch", flush=True)
    cfg = ModelConfig(d_model=args.d_model, compute_dtype=args.compute)
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    lengths = [int(s) for s in args.lengths.split(",")]
    svc = ScoringService(params, cfg, max_batch=args.max_batch,
                         max_delay_ms=args.max_delay_ms,
                         selection_workers=2)
    print(f"compute {cfg.compute_dtype}, wire {svc._wire_dtype}", flush=True)
    print("warmup (compiling the program grid)...", flush=True)
    svc.warmup(lengths=sorted({*lengths}))

    mode = "score+select" if args.summary else "score-only"
    print(f"\n{mode}, lengths {lengths}, {args.requests} requests, "
          f"max_batch {args.max_batch}:")
    print(f"{'conc':>5} {'req/s':>8} {'frames/s':>10} {'p50 ms':>8} "
          f"{'p95 ms':>8} {'p99 ms':>8} {'batches':>8} {'pad rows':>8}")
    for conc in [int(s) for s in args.concurrency.split(",")]:
        svc.reset_stats()
        wall, frames = run_level(svc, lengths, cfg.in_features, conc,
                                 args.requests, args.summary)
        st = svc.stats()
        print(f"{conc:>5} {args.requests / wall:>8.1f} "
              f"{frames / wall:>10.0f} {st.latency_p50_s * 1e3:>8.1f} "
              f"{st.latency_p95_s * 1e3:>8.1f} "
              f"{st.latency_p99_s * 1e3:>8.1f} {st.batches:>8} "
              f"{st.rows_padded:>8}", flush=True)
    svc.close()


if __name__ == "__main__":
    main()
