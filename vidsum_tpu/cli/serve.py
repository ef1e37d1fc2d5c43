"""Serving CLI: a micro-batching scoring service behind a local HTTP API.

Usage:
    python -m vidsum_tpu.cli.serve --ckpt model_mae.ckpt --port 8080 \
        [--torch_ckpt model_mae.pth] [--max_batch 8] [--max_delay_ms 3]

Clients POST ``.npz`` feature payloads to ``/summarize`` (see
``vidsum_tpu/serve_http.py`` for the protocol). The reference has no serving
path at all — its closest analogue is re-running ``src/train.py``'s val loop
over h5 files.

**Worker recycling** (``--recycle_after_mb`` / ``--recycle_after_requests``):
on tunnel-attached topologies the axon relay client retains ~0.9 MB of host
memory per request (PERF.md "Endurance": +13.7 GB in 600 s at measured
load — bisected to H2D payload retention, not this framework's state), so a
long-lived serving process OOMs the host. With either flag set, the CLI
runs as a SUPERVISOR that owns the listening socket and spawns the real
serving worker as a subprocess; when the worker crosses a threshold it
drains (stops accepting, finishes every in-flight request, closes the
service so the TPU client releases cleanly — the tunnel is single-client)
and exits; the supervisor immediately spawns a fresh worker on the SAME
inherited socket. Connections arriving during the handoff queue in the TCP
backlog instead of being refused, and the persistent compile cache makes
the new worker's warmup a cache hit (measured 0.66 s/program,
scripts/bench_warm_restart.py) — zero dropped requests across recycles
(tests/test_serve_recycle.py). ``--rss_watermark_mb`` additionally arms
in-process load shedding (503s) as a last line of defense.
"""

from __future__ import annotations

import argparse
import logging
import time

EXIT_RECYCLE = 42   # worker -> supervisor: drained for recycling, respawn me


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("vidsum_tpu serve")
    p.add_argument("--ckpt", default=None,
                   help="vidsum_tpu scorer checkpoint (msgpack)")
    p.add_argument("--torch_ckpt", default=None,
                   help="reference-trained SimNet .pth (converted on load)")
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_delay_ms", type=float, default=3.0)
    p.add_argument("--budget", type=float, default=0.15)
    p.add_argument("--attn", default=None,
                   help="attention impl override (default: fused block "
                        "kernels on TPU, XLA elsewhere)")
    p.add_argument("--devices", type=int, default=1,
                   help="serve over the first N local devices: short "
                        "requests batch replica-parallel across them, "
                        "requests past --long_threshold run the sequence-"
                        "parallel ring over all of them (default 1 = "
                        "single-device service)")
    p.add_argument("--long_threshold", type=int, default=None,
                   help="feature-row count above which a request takes the "
                        "sequence-parallel route (default: the single-chip "
                        "kernel envelope; only meaningful with --devices>1)")
    p.add_argument("--warmup", default="128,256,512",
                   help="comma-separated lengths to pre-compile — the full "
                        "(bucket x batch) program grid is warmed for each "
                        "(empty string to skip); warm restarts hit the "
                        "persistent compile cache")
    p.add_argument("--max_queue_depth", type=int, default=256,
                   help="admission bound on in-flight requests; past it "
                        "submit rejects with 503 (bounds device memory)")
    p.add_argument("--max_request_len", type=int, default=None,
                   help="optional cap on feature rows per request "
                        "(default: the kernel-envelope caps only)")
    p.add_argument("--max_body_bytes", type=int, default=256 * 1024 * 1024,
                   help="HTTP payload cap (413 past it)")
    p.add_argument("--wire_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16", "int8"],
                   help="host->device feature wire. 'auto' (lossless) "
                        "matches compute_dtype; 'int8' (LOSSY) halves the "
                        "bytes again via per-frame quantization for "
                        "wire-bound topologies (composes with --devices>1: "
                        "replica batches dequantize per-replica on device; "
                        "ring-routed long requests stay lossless)")
    p.add_argument("--wire_mode", default="rows",
                   choices=["rows", "coalesced"],
                   help="'rows': async per-request transfers (best when "
                        "wire cost ~ bytes); 'coalesced': one stacked "
                        "transfer per micro-batch (best on high-latency "
                        "relay links; single-chip only). Scores are "
                        "bit-identical either way")
    p.add_argument("--rss_watermark_mb", type=float, default=None,
                   help="in-process load shedding: past this host RSS, "
                        "submits 503 with a loud (rate-limited) log — "
                        "protection against the measured axon-relay "
                        "per-request leak (PERF.md 'Endurance')")
    p.add_argument("--recycle_after_mb", type=float, default=None,
                   help="supervise a serving worker subprocess and recycle "
                        "it (drain in-flight, respawn on the same "
                        "listening socket, warm from the persistent "
                        "compile cache) once its RSS passes this — the "
                        "full mitigation for the relay leak")
    p.add_argument("--recycle_after_requests", type=int, default=None,
                   help="recycle the supervised worker after this many "
                        "admitted requests (composable with "
                        "--recycle_after_mb; first threshold wins)")
    p.add_argument("--_worker_fd", type=int, default=None,
                   help=argparse.SUPPRESS)   # internal: supervised worker
    p.add_argument("--verbose", action="store_true")
    return p


def run_supervisor(args, argv) -> None:
    """Own the listening socket; spawn + respawn serving workers.

    The supervisor never touches jax (no TPU client): the worker is the
    single tunnel client, and it releases the tunnel by exiting before the
    next generation dials — sequential respawn, never two TPU processes.
    The socket fd is inherited by every generation, so the TCP backlog
    carries cross-generation connections with zero refusals."""
    import signal
    import socket
    import subprocess
    import sys

    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind((args.host, args.port))
    sock.listen(128)   # deep backlog: it rides out the recycle handoff
    sock.set_inheritable(True)
    host, port = sock.getsockname()
    logging.info("supervisor: listening on http://%s:%d; recycling after "
                 "%s MB RSS / %s requests", host, port,
                 args.recycle_after_mb, args.recycle_after_requests)
    crashes = 0
    gen = 0
    while True:
        gen += 1
        cmd = ([sys.executable, "-m", "vidsum_tpu.cli.serve"] + list(argv)
               + ["--_worker_fd", str(sock.fileno())])
        t0 = time.monotonic()
        proc = subprocess.Popen(cmd, pass_fds=(sock.fileno(),))
        try:
            rc = proc.wait()
        except KeyboardInterrupt:
            proc.send_signal(signal.SIGINT)   # graceful drain, then exit 0
            try:
                proc.wait(timeout=120)
            except subprocess.TimeoutExpired:
                proc.terminate()
                proc.wait(timeout=30)
            break
        if rc == EXIT_RECYCLE:
            logging.info("supervisor: worker generation %d recycled after "
                         "%.1fs; respawning", gen, time.monotonic() - t0)
            crashes = 0
            continue
        if rc == 0:
            logging.info("supervisor: worker exited cleanly; done")
            break
        crashes += 1
        logging.error("supervisor: worker generation %d died rc=%d "
                      "(crash %d/5)", gen, rc, crashes)
        if crashes >= 5:
            raise SystemExit(rc)
        time.sleep(2.0)   # a killed TPU client wedges the relay briefly


def main(argv=None) -> None:
    import sys

    argv = list(sys.argv[1:]) if argv is None else list(argv)
    args = build_parser().parse_args(argv)
    logging.basicConfig(format="[%(levelname)s] %(module)s - %(message)s",
                        level=logging.INFO)
    if ((args.recycle_after_mb is not None
         or args.recycle_after_requests is not None)
            and args._worker_fd is None):
        # supervisor path: owns the socket, spawns workers, NEVER imports
        # jax (the worker must be the tunnel's only client)
        run_supervisor(args, argv)
        return
    from vidsum_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet
    from vidsum_tpu.serve import ScoringService
    from vidsum_tpu.serve_http import make_server

    cfg = ModelConfig(d_model=args.d_model, num_heads=args.num_heads,
                      num_layers=args.num_layers)
    params = init_simnet(jax.random.PRNGKey(0), cfg)
    if args.torch_ckpt:
        from vidsum_tpu.models.torch_convert import (
            load_torch_checkpoint, simnet_from_torch_state,
        )
        params = simnet_from_torch_state(load_torch_checkpoint(args.torch_ckpt))
    elif args.ckpt:
        from vidsum_tpu.train.checkpoint import load_checkpoint
        params, _ = load_checkpoint(args.ckpt, params)
    else:
        logging.warning("no checkpoint given — serving random weights")

    mesh = None
    if args.devices > 1:
        import numpy as np
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < args.devices:
            raise SystemExit(f"--devices {args.devices} but only "
                             f"{len(devs)} present")
        mesh = Mesh(np.asarray(devs[: args.devices]), ("data",))
    service = ScoringService(params, cfg, attn_impl=args.attn,
                             max_batch=args.max_batch,
                             max_delay_ms=args.max_delay_ms,
                             budget_ratio=args.budget,
                             max_queue_depth=args.max_queue_depth,
                             max_request_len=args.max_request_len,
                             rss_watermark_mb=args.rss_watermark_mb,
                             wire_dtype=args.wire_dtype,
                             wire_mode=args.wire_mode,
                             mesh=mesh, long_threshold=args.long_threshold)
    if args.warmup:
        lengths = [int(s) for s in args.warmup.split(",") if s]
        logging.info("warming up %s x batch grid (compiles or cache-loads "
                     "every serving program)...", lengths)
        t0 = time.monotonic()
        warmed = service.warmup(lengths=lengths)
        for n_b, b, dt in warmed:
            logging.info("  warmed (bucket=%d, batch=%d) in %.2fs%s", n_b, b,
                         dt, " [cache hit]" if dt < 2.0 else "")
        logging.info("warmup: %d programs in %.1fs", len(warmed),
                     time.monotonic() - t0)
    import threading

    bound = None
    if args._worker_fd is not None:
        import socket

        # adopt the supervisor's listening socket; non-daemon handler
        # threads so the drain joins every in-flight request
        bound = socket.socket(fileno=args._worker_fd)
    server = make_server(service, host=args.host, port=args.port,
                         max_body_bytes=args.max_body_bytes,
                         bound_socket=bound,
                         daemon_threads=args._worker_fd is None)
    server.verbose = args.verbose

    recycled = threading.Event()
    if args._worker_fd is not None and (
            args.recycle_after_mb is not None
            or args.recycle_after_requests is not None):
        from vidsum_tpu.serve.admission import process_rss_mb

        def monitor():
            while not recycled.is_set():
                st = service.stats()
                rss = process_rss_mb()
                if ((args.recycle_after_requests is not None
                     and st.requests >= args.recycle_after_requests)
                        or (args.recycle_after_mb is not None
                            and rss >= args.recycle_after_mb)):
                    logging.warning(
                        "worker: draining for recycle (%d requests, RSS "
                        "%.0f MB)", st.requests, rss)
                    recycled.set()
                    server.shutdown()   # stop accepting; handlers finish
                    return
                time.sleep(0.5)

        threading.Thread(target=monitor, daemon=True,
                         name="vidsum-recycle").start()

    logging.info("serving on http://%s:%d (POST /summarize, GET /stats)",
                 *server.server_address)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        server.server_close()   # supervised: joins in-flight handlers
        service.close()         # then release the (single-client) tunnel
    if recycled.is_set():
        raise SystemExit(EXIT_RECYCLE)


if __name__ == "__main__":
    main()
