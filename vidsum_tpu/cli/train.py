"""Finetune CLI — flag-compatible with the reference driver.

Reference: ``src/train.py:168-215`` (argparse tree at :168-198). Same flags,
same defaults where sane; the reference's ``--lr`` default of the literal
``1e5`` (train.py:177) is fixed to 1e-3 (the launch recipe's value,
run_finetune.sh), and ``--save`` actually works here.

Usage:
    python -m vidsum_tpu.cli.train --data data --datasets tvsum \
        --ex_dataset tvsum --batch_size 4 --num_heads 4 --d_model 256 \
        --num_layers 4 --lr 1e-3 --weight_decay 1e-4 --max_epoch 100 \
        --dsnet_split --use_model
"""

from __future__ import annotations

import argparse
import json
import logging

from vidsum_tpu.config import (
    Config, DataConfig, EvalConfig, ModelConfig, TrainConfig,
)
from vidsum_tpu.data.splits import builtin_split_path, load_splits
from vidsum_tpu.train.finetune import finetune


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("vidsum_tpu finetune")
    p.add_argument("--num_heads", default=4, type=int)
    p.add_argument("--d_model", default=256, type=int)
    p.add_argument("--num_layers", default=4, type=int)
    p.add_argument("--dropout", default=0.3, type=float)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--data", type=str, required=True,
                   help="path to *.h5 data folder")
    p.add_argument("--ex_dataset", type=str, default="tvsum")
    p.add_argument("--datasets", type=str, default="tvsum")
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--max_epoch", default=200, type=int)
    p.add_argument("--name", default="", type=str)
    p.add_argument("--use_model", action="store_true",
                   help="warm-start from pretrain checkpoint")
    p.add_argument("--save", action="store_true")
    p.add_argument("--dsnet_split", action="store_true")
    p.add_argument("--split_path", type=str, default=None,
                   help="explicit split file (.json/.yaml); overrides "
                        "--dsnet_split resolution")
    p.add_argument("--workdir", type=str, default=".")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--length_bucket", type=int, default=128)
    p.add_argument("--resume", action="store_true",
                   help="continue from train_state.ckpt (full optimizer "
                        "state; the reference cannot resume)")
    p.add_argument("--metrics", type=str, default=None,
                   help="append per-epoch JSONL records here")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="jax.profiler trace of the first epoch")
    p.add_argument("--dp", action="store_true",
                   help="train dp(xtp) over all visible devices")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree within the mesh (with --dp)")
    p.add_argument("--debug_nans", action="store_true",
                   help="raise on the first NaN the compiler sees "
                        "(jax debug_nans; the jit-purity analogue of "
                        "a sanitizer run)")
    p.add_argument("--eval_impl", type=str, default="host",
                   choices=("host", "device"),
                   help="summary pipeline for val epochs: 'host' = "
                        "bit-parity NumPy/C++ (default), 'device' = one "
                        "vmapped XLA program for the whole val set")
    p.add_argument("--state_save_every", type=int, default=1,
                   help="save the full resume state every K epochs; the "
                        "last epoch of a split always saves")
    p.add_argument("--model_save_every", type=int, default=1,
                   help="save the weight-only model checkpoint every K "
                        "epochs (reference saves every epoch, train.py:95); "
                        "the last epoch of a split always saves")
    return p


def config_from_args(args) -> Config:
    return Config(
        model=ModelConfig(d_model=args.d_model, num_heads=args.num_heads,
                          num_layers=args.num_layers, dropout=args.dropout,
                          compute_dtype=args.compute_dtype),
        data=DataConfig(root=args.data, ex_dataset=args.ex_dataset,
                        datasets=args.datasets,
                        length_bucket=args.length_bucket),
        eval=EvalConfig(impl=getattr(args, "eval_impl", "host")),
        train=TrainConfig(lr=args.lr, weight_decay=args.weight_decay,
                          batch_size=args.batch_size,
                          max_epoch=args.max_epoch,
                          use_pretrained=args.use_model,
                          state_save_every=getattr(args, "state_save_every",
                                                   1),
                          model_save_every=getattr(args, "model_save_every",
                                                   1)),
    )


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    # multi-host launch (no-op unless VIDSUM_NUM_PROCESSES>1 is set): join
    # the multi-controller runtime BEFORE any jax use; with --dp the mesh
    # then spans every process's chips (parallel/distributed.py)
    from vidsum_tpu.parallel.distributed import init_distributed
    init_distributed()
    from vidsum_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # remote compiles are ~10-40 s/shape; cache hits across CLI processes (VIDSUM_TPU_CACHE_DIR=off to disable)
    if getattr(args, 'debug_nans', False):
        import jax

        jax.config.update('jax_debug_nans', True)
    logging.basicConfig(format="[%(levelname)s] %(module)s - %(message)s",
                        level=logging.INFO)
    if args.split_path:
        splits = load_splits(args.split_path)
    elif args.dsnet_split:
        # NB: the reference hardcodes splits_dsnet/tvsum.yaml regardless of
        # --ex_dataset (train.py:208) — and that file actually contains SumMe
        # keys. Here the split file follows the experiment dataset.
        splits = load_splits(builtin_split_path(args.ex_dataset))
    else:
        raise SystemExit("provide --dsnet_split or --split_path")
    cfg = config_from_args(args)
    mesh = None
    if args.dp:
        from vidsum_tpu.config import MeshConfig
        from vidsum_tpu.parallel import make_mesh
        mesh = make_mesh(MeshConfig(data=-1, model=args.tp))
    result = finetune(cfg, splits, workdir=args.workdir, resume=args.resume,
                      metrics_path=args.metrics,
                      profile_dir=args.profile_dir, mesh=mesh)
    print(json.dumps({"fscore": result.fscore,
                      "kendall_tau": result.kendall_tau,
                      "spearman_rho": result.spearman_rho}))


if __name__ == "__main__":
    main()
