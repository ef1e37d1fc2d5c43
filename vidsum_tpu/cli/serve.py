"""Serving CLI: a micro-batching scoring service behind a local HTTP API.

Usage:
    python -m vidsum_tpu.cli.serve --ckpt model_mae.ckpt --port 8080 \
        [--torch_ckpt model_mae.pth] [--max_batch 8] [--max_delay_ms 3]

Clients POST ``.npz`` feature payloads to ``/summarize`` (see
``vidsum_tpu/serve_http.py`` for the protocol). The reference has no serving
path at all — its closest analogue is re-running ``src/train.py``'s val loop
over h5 files.
"""

from __future__ import annotations

import argparse
import logging
import time


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
                        "matches compute_dtype; 'int8' (LOSSY, single-chip) "
                        "halves the bytes again via per-frame quantization "
                        "for wire-bound topologies")
    p.add_argument("--wire_mode", default="rows",
                   choices=["rows", "coalesced"],
                   help="'rows': async per-request transfers (best when "
                        "wire cost ~ bytes); 'coalesced': one stacked "
                        "transfer per micro-batch (best on high-latency "
                        "relay links; single-chip only). Scores are "
                        "bit-identical either way")
    p.add_argument("--verbose", action="store_true")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from vidsum_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    logging.basicConfig(format="[%(levelname)s] %(module)s - %(message)s",
                        level=logging.INFO)
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
    server = make_server(service, host=args.host, port=args.port,
                         max_body_bytes=args.max_body_bytes)
    server.verbose = args.verbose
    logging.info("serving on http://%s:%d (POST /summarize, GET /stats)",
                 *server.server_address)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
