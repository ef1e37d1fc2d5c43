"""Standalone evaluation CLI: checkpoint + dataset → F-score / τ / ρ.

The reference couples evaluation into the train loop (``src/train.py:134``);
this decouples it so a saved model can be scored on any split without
training.

Usage:
    python -m vidsum_tpu.cli.evaluate --data data --ex_dataset tvsum \
        --ckpt model_mae.ckpt [--torch_ckpt model_mae.pth] \
        [--split_path splits.json --fold 0] [--attn pallas_block]
"""

from __future__ import annotations

import argparse
import json
import logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("vidsum_tpu evaluate")
    p.add_argument("--data", required=True)
    p.add_argument("--ex_dataset", default="tvsum")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--torch_ckpt", default=None)
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--split_path", default=None,
                   help="evaluate only the fold's test_keys")
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--eval_method", default="avg", choices=["avg", "max"])
    p.add_argument("--attn", default="xla",
                   choices=["xla", "pallas", "pallas_block"])
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from vidsum_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # remote compiles are ~10-40 s/shape; cache hits across CLI processes (VIDSUM_TPU_CACHE_DIR=off to disable)
    logging.basicConfig(format="[%(levelname)s] %(module)s - %(message)s",
                        level=logging.INFO)
    import jax

    from vidsum_tpu.config import Config, DataConfig, EvalConfig, ModelConfig
    from vidsum_tpu.data.datasets import TSDataset
    from vidsum_tpu.data.splits import load_splits
    from vidsum_tpu.models import init_simnet
    from vidsum_tpu.train.finetune import _val_epoch
    from vidsum_tpu.train.steps import make_eval_forward

    mcfg = ModelConfig(d_model=args.d_model, num_heads=args.num_heads,
                       num_layers=args.num_layers,
                       compute_dtype=args.compute_dtype)
    cfg = Config(model=mcfg, data=DataConfig(root=args.data,
                                             ex_dataset=args.ex_dataset),
                 eval=EvalConfig(eval_method=args.eval_method))

    params = init_simnet(jax.random.PRNGKey(0), mcfg)
    if args.torch_ckpt:
        from vidsum_tpu.models.torch_convert import (
            load_torch_checkpoint, simnet_from_torch_state,
        )
        params = simnet_from_torch_state(load_torch_checkpoint(args.torch_ckpt))
    elif args.ckpt:
        from vidsum_tpu.train.checkpoint import load_checkpoint
        params, _ = load_checkpoint(args.ckpt, params)
    else:
        raise SystemExit("provide --ckpt or --torch_ckpt")

    keys = None
    if args.split_path:
        keys = load_splits(args.split_path)[args.fold]["test_keys"]
    val_set = TSDataset(args.data, args.ex_dataset, args.ex_dataset,
                        keys=keys, split="val")
    fwd = make_eval_forward(mcfg, attn_impl=args.attn)
    val_loss, f, k, s = _val_epoch(fwd, params, val_set, cfg)
    print(json.dumps({"val_loss": val_loss, "fscore": f, "kendall_tau": k,
                      "spearman_rho": s}))


if __name__ == "__main__":
    main()
