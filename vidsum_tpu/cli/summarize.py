"""Raw-video summarization CLI: one command from a video file to selected
frames (the end-to-end pipeline, ``vidsum_tpu.pipeline``).

Usage:
    python -m vidsum_tpu.cli.summarize --video clip.mp4 \
        --ckpt model_mae.ckpt [--torch_ckpt model_mae.pth] \
        --google_weights googlenet.pth --out summary.json
"""

from __future__ import annotations

import argparse
import json
import logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("vidsum_tpu summarize")
    p.add_argument("--video", required=True)
    p.add_argument("--ckpt", default=None,
                   help="vidsum_tpu scorer checkpoint (msgpack)")
    p.add_argument("--torch_ckpt", default=None,
                   help="reference-trained SimNet .pth (converted on load)")
    p.add_argument("--google_weights", default=None,
                   help="torchvision googlenet state dict (.pth/.npz)")
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--fps", type=int, default=2)
    p.add_argument("--size", type=int, default=224,
                   help="shorter-side resize for GoogLeNet input")
    p.add_argument("--budget", type=float, default=0.15)
    p.add_argument("--out", default="summary.json")
    p.add_argument("--seq_shards", type=int, default=1,
                   help="shard the frame sequence over this many devices "
                        "(ring attention) — for videos beyond the dense "
                        "O(N^2) envelope")
    p.add_argument("--kts_impl", choices=("host", "device"), default="host",
                   help="'host' = float64 NumPy/C++ auto-KTS (parity "
                        "oracle), 'device' = one jitted program on the "
                        "accelerator")
    p.add_argument("--stream_chunk", type=int, default=256,
                   help="frames per host->device chunk; each chunk ships "
                        "while later frames still decode (result is "
                        "chunk-invariant)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from vidsum_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # remote compiles are ~10-40 s/shape; cache hits across CLI processes (VIDSUM_TPU_CACHE_DIR=off to disable)
    logging.basicConfig(format="[%(levelname)s] %(module)s - %(message)s",
                        level=logging.INFO)
    import jax
    import numpy as np

    from vidsum_tpu.config import ModelConfig
    from vidsum_tpu.models import init_simnet
    from vidsum_tpu.pipeline import summarize_video
    from vidsum_tpu.preprocess.extract import load_state_dict
    from vidsum_tpu.preprocess.googlenet import (
        fold_googlenet, googlenet_from_torch_state, init_googlenet,
    )

    cfg = ModelConfig(d_model=args.d_model, num_heads=args.num_heads,
                      num_layers=args.num_layers)
    scorer = init_simnet(jax.random.PRNGKey(0), cfg)
    if args.torch_ckpt:
        from vidsum_tpu.models.torch_convert import (
            load_torch_checkpoint, simnet_from_torch_state,
        )
        scorer = simnet_from_torch_state(load_torch_checkpoint(args.torch_ckpt))
    elif args.ckpt:
        from vidsum_tpu.train.checkpoint import load_checkpoint
        scorer, _ = load_checkpoint(args.ckpt, scorer)
    else:
        logging.warning("no checkpoint given — scoring with random weights")

    if args.google_weights:
        google = googlenet_from_torch_state(
            load_state_dict(args.google_weights))
    else:
        logging.warning("no googlenet weights — features are random "
                        "projections")
        google = init_googlenet(jax.random.PRNGKey(1))
    # exact inference transform: one biased conv per block instead of
    # conv + runtime BN (preprocess/nn.fold_batchnorm)
    google = fold_googlenet(google)

    mesh = None
    if args.seq_shards > 1:
        from jax.sharding import Mesh
        if len(jax.devices()) < args.seq_shards:
            raise SystemExit(f"--seq_shards {args.seq_shards} but only "
                             f"{len(jax.devices())} devices visible")
        mesh = Mesh(np.asarray(jax.devices()[: args.seq_shards])
                    .reshape(1, args.seq_shards), ("data", "seq"))
    result = summarize_video(args.video, scorer, cfg, google, fps=args.fps,
                             size=args.size, budget_ratio=args.budget,
                             mesh=mesh, kts_impl=args.kts_impl,
                             stream_chunk=args.stream_chunk)
    selected = np.nonzero(result.summary)[0].tolist()
    with open(args.out, "w") as f:
        json.dump({"video": args.video, "n_frames": int(result.n_frames),
                   "selected_frames": selected}, f)
    logging.info("selected %d / %d frames -> %s", len(selected),
                 result.n_frames, args.out)


if __name__ == "__main__":
    main()
