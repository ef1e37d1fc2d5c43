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

``--overload`` adds an OPEN-loop saturation phase (VERDICT r3 #1): F
flooder threads submit as fast as they can with no pacing against a
bounded ``max_queue_depth``; reports offered rate, accepted/rejected
split, sustained completion throughput, accepted-request latency
quantiles, the admitted-depth high-water mark (the device-memory bound
actually enforced), and a post-flood health check.

``--endurance S`` adds a sustained-load phase: closed-loop clients run for
S seconds against one service instance, sampled in fixed windows
(throughput, window latency quantiles, host RSS). The drift between the
first and last windows is the leak/stability evidence — a service that
accumulates host or device state shows up as monotone RSS growth or
latency creep long before it OOMs.
"""

from __future__ import annotations

import argparse
import threading
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


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


def probe_wire_mb_s(reps: int = 4, mb: float = 4.0) -> float:
    """Host->device throughput of the relay, MB/s.

    The latency probe above cannot see BANDWIDTH windows: serving is
    wire-bound on input features, and the relay's MB/s degrades by
    hours-long windows independently of its ~30 ms RPC latency (observed
    2026-08-19: probe 32 ms both times, closed-loop serving 36 -> 23
    req/s). Reported next to every serving number so slow-bandwidth
    windows are machine-visible; cross-window comparisons are only
    defensible at similar MB/s.

    Measures ``device_put`` of a host buffer followed by a 1-element
    fetch (the fetch pins the transfer's completion; its ~30 ms and the
    put's host-side cost are subtracted via a zero-byte calibration
    round using the same dispatch shape)."""
    import jax
    import jax.numpy as jnp

    n = int(mb * 1e6 / 2)  # bf16 elements
    buf = np.zeros((n,), np.float32).astype(jnp.bfloat16)
    tiny = np.zeros((1,), np.float32).astype(jnp.bfloat16)
    touch = jax.jit(lambda x: x.reshape(-1)[:1].astype(np.float32))

    def once(host_buf):
        t0 = time.monotonic()
        dev = jax.device_put(host_buf)
        float(touch(dev)[0])
        return time.monotonic() - t0

    once(buf)  # compile both shapes + warm the path
    once(tiny)
    big = min(once(buf) for _ in range(reps))
    base = min(once(tiny) for _ in range(reps))
    return mb / max(big - base, 1e-6)


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


def run_overload(svc, lengths, d, flooders: int, requests: int):
    """Open-loop flood: no pacing, no retry; every rejection is counted.
    Returns (wall_s, accepted, rejected, inflight_high_water)."""
    from vidsum_tpu.serve import ServiceOverloaded

    rng = np.random.default_rng(1)
    videos = [rng.normal(size=(int(lengths[i % len(lengths)]), d))
              .astype(np.float32) for i in range(requests)]
    idx = {"i": 0}
    lock = threading.Lock()
    futs, rejected = [], [0]
    high_water = [0]
    stop = threading.Event()

    def watermark():
        while not stop.is_set():
            high_water[0] = max(high_water[0], svc._inflight)
            time.sleep(0.002)

    def flooder():
        while True:
            with lock:
                i = idx["i"]
                if i >= requests:
                    return
                idx["i"] += 1
            try:
                f = svc.submit(videos[i], want_summary=False)
                with lock:
                    futs.append(f)
            except ServiceOverloaded:
                with lock:
                    rejected[0] += 1

    wm = threading.Thread(target=watermark, daemon=True)
    wm.start()
    threads = [threading.Thread(target=flooder) for _ in range(flooders)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    t_offered = time.monotonic() - t0
    for f in futs:
        f.result(timeout=600)
    wall = time.monotonic() - t0
    stop.set()
    return t_offered, wall, len(futs), rejected[0], high_water[0]


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def run_endurance(svc, lengths, d, concurrency: int, seconds: float,
                  window_s: float = 30.0):
    """Closed-loop load for ``seconds``; returns one dict per window.

    Clients cycle a small fixed video pool (constant client-side memory),
    so any RSS growth is the service's own. Window quantiles come from
    ``reset_stats()`` at each window edge."""
    rng = np.random.default_rng(2)
    pool = [rng.normal(size=(int(n), d)).astype(np.float32)
            for n in lengths for _ in range(4)]
    stop = threading.Event()
    done = [0]
    lock = threading.Lock()
    errors = []

    def client(k):
        i = k
        while not stop.is_set():
            try:
                svc.submit(pool[i % len(pool)],
                           want_summary=False).result(timeout=600)
            except Exception as e:  # noqa: BLE001 — record and stop
                errors.append(e)
                return
            i += concurrency
            with lock:
                done[0] += 1

    threads = [threading.Thread(target=client, args=(k,))
               for k in range(concurrency)]
    svc.reset_stats()
    t0 = time.monotonic()
    for t in threads:
        t.start()
    windows = []
    prev_done, prev_t = 0, t0
    while time.monotonic() - t0 < seconds and not errors:
        time.sleep(min(window_s, max(0.0, seconds - (time.monotonic() - t0))))
        now = time.monotonic()
        st = svc.stats()
        with lock:
            d_now = done[0]
        windows.append({
            "t_s": round(now - t0, 1),
            "req_s": round((d_now - prev_done) / (now - prev_t), 1),
            "p50_ms": round(st.latency_p50_s * 1e3, 1),
            "p95_ms": round(st.latency_p95_s * 1e3, 1),
            "rss_mb": round(_rss_mb(), 1),
            "inflight": svc._inflight,
        })
        svc.reset_stats()
        prev_done, prev_t = d_now, now
    stop.set()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return windows


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
    ap.add_argument("--overload", action="store_true",
                    help="add the open-loop saturation phase")
    ap.add_argument("--endurance", type=float, default=0.0, metavar="S",
                    help="add a sustained-load phase of S seconds "
                         "(windowed throughput/latency/RSS drift)")
    ap.add_argument("--endurance_conc", type=int, default=8)
    ap.add_argument("--max_queue_depth", type=int, default=64,
                    help="admission bound for the overload phase")
    ap.add_argument("--flooders", type=int, default=16)
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--wire", default="auto",
                    help="wire_dtype for the main service (auto/float32/"
                         "bfloat16/int8)")
    ap.add_argument("--ab_int8", action="store_true",
                    help="after the main levels, rerun them against an "
                         "int8-wire service IN THE SAME PROCESS (the only "
                         "defensible A/B under relay bandwidth windows)")
    ap.add_argument("--ab_matrix", action="store_true",
                    help="run the full transport matrix in one process: "
                         "{rows,coalesced} x {auto,int8}")
    ap.add_argument("--wire_mode", default="rows",
                    choices=["rows", "coalesced"])
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
          f"relay probe: {probe_relay_ms():.1f} ms/fetch  "
          f"wire: {probe_wire_mb_s():.1f} MB/s", flush=True)
    cfg = ModelConfig(d_model=args.d_model, compute_dtype=args.compute)
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    lengths = [int(s) for s in args.lengths.split(",")]
    def run_levels(svc):
        mode = "score+select" if args.summary else "score-only"
        wm = "coalesced" if svc._wire_coalesced else "rows"
        print(f"\n{mode}, wire {svc._wire_dtype}/{wm}, lengths {lengths}, "
              f"{args.requests} requests, max_batch {args.max_batch}:")
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

    svc = ScoringService(params, cfg, max_batch=args.max_batch,
                         max_delay_ms=args.max_delay_ms,
                         selection_workers=2, wire_dtype=args.wire,
                         wire_mode=args.wire_mode)
    print(f"compute {cfg.compute_dtype}, wire {svc._wire_dtype}", flush=True)
    print("warmup (compiling the program grid)...", flush=True)
    svc.warmup(lengths=sorted({*lengths}))
    run_levels(svc)
    svc.close()

    variants = []
    if args.ab_int8:
        variants.append(("int8", args.wire_mode))
    if args.ab_matrix:
        variants = [(d, m) for m in ("rows", "coalesced")
                    for d in ("auto", "int8")
                    if not (d == args.wire and m == args.wire_mode)]
    for dtype, wmode in variants:
        svc_v = ScoringService(params, cfg, max_batch=args.max_batch,
                               max_delay_ms=args.max_delay_ms,
                               selection_workers=2, wire_dtype=dtype,
                               wire_mode=wmode)
        svc_v.warmup(lengths=sorted({*lengths}))
        run_levels(svc_v)
        svc_v.close()

    if args.overload:
        svc2 = ScoringService(params, cfg, max_batch=args.max_batch,
                              max_delay_ms=args.max_delay_ms,
                              selection_workers=2,
                              max_queue_depth=args.max_queue_depth)
        svc2.warmup(lengths=sorted({*lengths}))
        n = max(args.requests * 4, 4 * args.max_queue_depth)
        print(f"\noverload: open-loop flood, {args.flooders} flooders, "
              f"{n} offered, max_queue_depth {args.max_queue_depth}:")
        t_off, wall, acc, rej, hw = run_overload(
            svc2, lengths, cfg.in_features, args.flooders, n)
        st = svc2.stats()
        print(f"  offered {n / t_off:>8.1f} req/s over {t_off:.2f}s; "
              f"accepted {acc} ({acc / n * 100:.0f}%), rejected {rej}")
        print(f"  sustained completion {acc / wall:>8.1f} req/s; accepted "
              f"p50/p95/p99 {st.latency_p50_s * 1e3:.0f}/"
              f"{st.latency_p95_s * 1e3:.0f}/{st.latency_p99_s * 1e3:.0f} ms")
        print(f"  admitted-depth high-water {hw} (bound "
              f"{args.max_queue_depth}); failed {st.failed}")
        # post-flood health: the service must still serve normally
        r = svc2.summarize(np.zeros((lengths[0], cfg.in_features),
                                    np.float32), want_summary=False)
        print(f"  post-flood health check: scored {r.scores.shape[0]} rows "
              f"in {r.latency_s * 1e3:.0f} ms", flush=True)
        svc2.close()

    if args.endurance > 0:
        svc3 = ScoringService(params, cfg, max_batch=args.max_batch,
                              max_delay_ms=args.max_delay_ms,
                              selection_workers=2, max_queue_depth=256)
        svc3.warmup(lengths=sorted({*lengths}))
        print(f"\nendurance: {args.endurance:.0f}s sustained closed-loop, "
              f"conc {args.endurance_conc}:")
        print(f"{'t (s)':>7} {'req/s':>8} {'p50 ms':>8} {'p95 ms':>8} "
              f"{'RSS MB':>8} {'depth':>6}")
        windows = run_endurance(svc3, lengths, cfg.in_features,
                                args.endurance_conc, args.endurance)
        for w in windows:
            print(f"{w['t_s']:>7} {w['req_s']:>8} {w['p50_ms']:>8} "
                  f"{w['p95_ms']:>8} {w['rss_mb']:>8} {w['inflight']:>6}",
                  flush=True)
        first, last = windows[0], windows[-1]
        import json
        print(json.dumps({
            "metric": "serving_endurance",
            "seconds": args.endurance,
            "windows": len(windows),
            "rss_growth_mb": round(last["rss_mb"] - first["rss_mb"], 1),
            "req_s_first": first["req_s"], "req_s_last": last["req_s"],
            "p50_first_ms": first["p50_ms"], "p50_last_ms": last["p50_ms"],
        }), flush=True)
        svc3.close()


if __name__ == "__main__":
    main()
