"""Sustained-load endurance of the SUPERVISED serving CLI (real TPU).

The in-process endurance bench (bench_serving.py --endurance) measured the
axon relay client leaking ~0.9 MB host RSS per request — +13.7 GB in 600 s
at measured load (PERF.md "Endurance"). The mitigation is worker recycling
(cli.serve --recycle_after_mb / --recycle_after_requests). This harness
proves the mitigation end-to-end on the real chip: it spawns the
supervisor CLI, drives closed-loop HTTP clients for S seconds, and samples
the WORKER process's RSS each window — the leak now shows as a
sawtooth bounded by the recycle threshold instead of a monotone ramp, and
every client request must succeed across the recycles (handoff
connections ride the supervisor-held socket's backlog).

This process never imports jax: the supervised worker must stay the
single-client tunnel's only occupant, so the load generator is pure HTTP.

Usage (real TPU):
    python scripts/bench_recycle_endurance.py --seconds 600 \
        --recycle_after_mb 2500 [--concurrency 8] [--lengths 320,480,512]

Record: PERF.md "Endurance, recycled".
"""

from __future__ import annotations

import argparse
import io
import json
import os
import signal
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_pid(sup_pid: int):
    """The supervisor's current worker subprocess pid (None during a
    handoff)."""
    try:
        with open(f"/proc/{sup_pid}/task/{sup_pid}/children") as f:
            kids = f.read().split()
        return int(kids[0]) if kids else None
    except (OSError, ValueError):
        return None


def _rss_mb(pid) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except (OSError, TypeError):
        pass
    return 0.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=600.0)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--lengths", default="320,480,512")
    ap.add_argument("--window_s", type=float, default=30.0)
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--max_batch", type=int, default=32)
    ap.add_argument("--max_delay_ms", type=float, default=3.0)
    ap.add_argument("--recycle_after_mb", type=float, default=None)
    ap.add_argument("--recycle_after_requests", type=int, default=None)
    ap.add_argument("--startup_timeout", type=float, default=900.0,
                    help="first-generation readiness budget (remote "
                         "compiles on a cold cache)")
    args = ap.parse_args()
    if args.recycle_after_mb is None and args.recycle_after_requests is None:
        ap.error("set --recycle_after_mb and/or --recycle_after_requests "
                 "(this harness exists to measure recycling)")

    lengths = [int(s) for s in args.lengths.split(",")]
    port = _free_port()
    cmd = [sys.executable, "-m", "vidsum_tpu.cli.serve",
           "--host", "127.0.0.1", "--port", str(port),
           "--d_model", str(args.d_model),
           "--max_batch", str(args.max_batch),
           "--max_delay_ms", str(args.max_delay_ms),
           "--warmup", ",".join(str(n) for n in sorted(set(lengths)))]
    if args.recycle_after_mb is not None:
        cmd += ["--recycle_after_mb", str(args.recycle_after_mb)]
    if args.recycle_after_requests is not None:
        cmd += ["--recycle_after_requests", str(args.recycle_after_requests)]
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH", ""), REPO) if p)
    sup = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                           stderr=subprocess.STDOUT, text=True)
    log_lines: list = []

    def _pump():
        for line in sup.stdout:
            log_lines.append(line)

    threading.Thread(target=_pump, daemon=True).start()

    # one payload per length, reused (constant client-side memory — any
    # growth is the serving side's)
    rng = np.random.default_rng(0)
    payloads = []
    for n in lengths:
        buf = io.BytesIO()
        np.savez(buf, features=rng.normal(size=(n, 1024)).astype(np.float32))
        payloads.append(buf.getvalue())

    deadline = time.monotonic() + args.startup_timeout
    while True:
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                   timeout=10)
            break
        except (urllib.error.URLError, OSError):
            if time.monotonic() > deadline:
                sup.terminate()
                print("".join(log_lines[-60:]), file=sys.stderr)
                raise SystemExit("server never came up")
            time.sleep(2.0)

    stop = threading.Event()
    done = [0]
    failed = [0]
    lock = threading.Lock()

    def client(k: int) -> None:
        i = k
        while not stop.is_set():
            body = payloads[i % len(payloads)]
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/summarize?summary=0",
                data=body, method="POST")
            try:
                with urllib.request.urlopen(req, timeout=600) as resp:
                    json.loads(resp.read())
                with lock:
                    done[0] += 1
            except Exception as e:  # noqa: BLE001 — a drop is the result
                if stop.is_set():
                    return
                with lock:
                    failed[0] += 1
                print(f"request failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
            i += args.concurrency

    threads = [threading.Thread(target=client, args=(k,), daemon=True)
               for k in range(args.concurrency)]
    t0 = time.monotonic()
    for t in threads:
        t.start()

    print(f"{'t (s)':>7} {'req/s':>8} {'worker':>8} {'RSS MB':>8} "
          f"{'recycles':>9} {'failed':>7}")
    windows = []
    pids_seen = []
    prev_done, prev_t = 0, t0
    while time.monotonic() - t0 < args.seconds:
        time.sleep(min(args.window_s,
                       max(0.0, args.seconds - (time.monotonic() - t0))))
        now = time.monotonic()
        wpid = _worker_pid(sup.pid)
        if wpid is not None and (not pids_seen or pids_seen[-1] != wpid):
            pids_seen.append(wpid)
        with lock:
            d_now, f_now = done[0], failed[0]
        recycles = sum("recycled after" in l for l in log_lines)
        w = {"t_s": round(now - t0, 1),
             "req_s": round((d_now - prev_done) / (now - prev_t), 1),
             "worker_pid": wpid, "rss_mb": round(_rss_mb(wpid), 1),
             "recycles": recycles, "failed": f_now}
        windows.append(w)
        print(f"{w['t_s']:>7} {w['req_s']:>8} {str(wpid):>8} "
              f"{w['rss_mb']:>8} {recycles:>9} {f_now:>7}", flush=True)
        prev_done, prev_t = d_now, now
    stop.set()
    for t in threads:
        t.join(timeout=630)
    sup.send_signal(signal.SIGINT)
    try:
        sup.wait(timeout=300)
    except subprocess.TimeoutExpired:
        sup.terminate()
        sup.wait(timeout=60)

    recycles = sum("recycled after" in l for l in log_lines)
    rss_vals = [w["rss_mb"] for w in windows if w["rss_mb"] > 0]
    print(json.dumps({
        "metric": "serving_endurance_recycled",
        "seconds": args.seconds,
        "requests_ok": done[0],
        "failed": failed[0],
        "recycles": recycles,
        "worker_generations": len(pids_seen),
        "rss_max_mb": max(rss_vals) if rss_vals else 0.0,
        "rss_last_mb": windows[-1]["rss_mb"] if windows else 0.0,
        "req_s_first": windows[0]["req_s"] if windows else 0.0,
        "req_s_last": windows[-1]["req_s"] if windows else 0.0,
        "recycle_after_mb": args.recycle_after_mb,
        "recycle_after_requests": args.recycle_after_requests,
    }), flush=True)


if __name__ == "__main__":
    main()
