"""Pretrain CLI — flag-compatible with the reference driver.

Reference: ``src/pretrain.py:90-131`` (argparse at :90-124). The unused
reference flags (``--momentum``) are accepted for drop-in compatibility but
ignored, as there.

Usage:
    python -m vidsum_tpu.cli.pretrain --data data/features --d_model 256 \
        --num_heads 4 --num_layers 4 --dropout 0.2 --lr 1e-3 --epochs 200 \
        --batch_size 256 --sparsity 0.0
"""

from __future__ import annotations

import argparse
import logging

from vidsum_tpu.config import Config, DataConfig, ModelConfig, PretrainConfig
from vidsum_tpu.data.datasets import PreTrainDataset, PreTrainDatasetReady
from vidsum_tpu.train.pretraining import pretrain


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("vidsum_tpu pretrain")
    p.add_argument("--data", required=True, type=str)
    p.add_argument("--datasets", default="tvsum+summe+ovp+youtube", type=str)
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--use_pos", type=bool, default=True)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--sparsity", type=float, default=0.0,
                   help="positional-encoding dropout (the reference wires "
                        "sparsity there, simnet.py:201-203)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--momentum", type=float, default=0.9,
                   help="accepted for reference compatibility; unused there "
                        "too (pretrain.py:111)")
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--save", type=str, default=".")
    p.add_argument("--from_h5", action="store_true",
                   help="read features from DSNet h5 files "
                        "(PreTrainDatasetReady) instead of frames/*.npy")
    p.add_argument("--length_bucket", type=int, default=128)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--resume", action="store_true",
                   help="restart from pretrain_state.ckpt in --save (full "
                        "state; exact replay — no reference analogue, "
                        "pretrain.pth is weight-only)")
    p.add_argument("--save_every", type=int, default=1,
                   help="checkpoint cadence (1 = reference-faithful)")
    p.add_argument("--debug_nans", action="store_true",
                   help="raise on the first NaN the compiler sees "
                        "(jax debug_nans; the jit-purity analogue of "
                        "a sanitizer run)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    # multi-host launch (no-op unless VIDSUM_NUM_PROCESSES>1 is set)
    from vidsum_tpu.parallel.distributed import init_distributed
    init_distributed()
    from vidsum_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # remote compiles are ~10-40 s/shape; cache hits across CLI processes (VIDSUM_TPU_CACHE_DIR=off to disable)
    if getattr(args, 'debug_nans', False):
        import jax

        jax.config.update('jax_debug_nans', True)
    logging.basicConfig(format="[%(levelname)s] %(module)s - %(message)s",
                        level=logging.INFO)
    cfg = Config(
        model=ModelConfig(d_model=args.d_model, num_heads=args.num_heads,
                          num_layers=args.num_layers, dropout=args.dropout,
                          use_pos=args.use_pos, pos_dropout=args.sparsity,
                          compute_dtype=args.compute_dtype),
        data=DataConfig(root=args.data, datasets=args.datasets,
                        length_bucket=args.length_bucket),
        pretrain=PretrainConfig(lr=args.lr, weight_decay=args.weight_decay,
                                batch_size=args.batch_size,
                                epochs=args.epochs,
                                save_every=args.save_every),
    )
    if args.from_h5:
        dataset = PreTrainDatasetReady(args.data, args.datasets)
    else:
        dataset = PreTrainDataset(args.data)
    pretrain(cfg, dataset, workdir=args.save, resume=args.resume)


if __name__ == "__main__":
    main()
