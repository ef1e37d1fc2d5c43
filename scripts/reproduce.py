"""Reference-protocol reproduction harness.

Runs the full ``run_finetune.sh`` protocol (d256/h4/L4, lr 1e-3, wd 1e-4,
bs 4, 100 epochs, 5 DSNet folds, optional pretrained warm start) on the real
DSNet datasets and writes a results JSON. This is the run that produces the
F-score to compare against a reference reproduction within 0.5 points
(BASELINE.md build target).

Requires the datasets from ``scripts/setup_data.sh`` (no egress in this
sandbox — run where the Dropbox archive is reachable, or copy the
``summarizer_dataset_*_google_pool5.h5`` files into --data).

    python scripts/reproduce.py --data data --dataset tvsum \
        [--use_model] [--epochs 100] [--out results_tvsum.json]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser("reproduce the reference finetune protocol")
    p.add_argument("--data", default="data")
    p.add_argument("--dataset", default="tvsum", choices=["tvsum", "summe"])
    p.add_argument("--aug", action="store_true",
                   help="augmented splits (4-dataset training)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--use_model", action="store_true")
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--state_save_every", type=int, default=1,
                   help="resume-state save cadence (bit-identical metrics "
                        "at any value; 5 cut the synthetic protocol 30%%)")
    p.add_argument("--model_save_every", type=int, default=1)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    logging.basicConfig(format="[%(levelname)s] %(module)s - %(message)s",
                        level=logging.INFO)

    from vidsum_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from vidsum_tpu.data.paths import PATH
    from vidsum_tpu.data.splits import builtin_split_path, load_splits
    from vidsum_tpu.train import finetune

    h5 = os.path.join(args.data, PATH[args.dataset])
    if not os.path.exists(h5):
        raise SystemExit(
            f"{h5} not found — fetch datasets via scripts/setup_data.sh")

    split_name = args.dataset + ("_aug" if args.aug else "")
    datasets = ("tvsum+summe+ovp+youtube" if args.aug else args.dataset)
    cfg = Config(
        model=ModelConfig(d_model=256, num_heads=4, num_layers=4,
                          dropout=0.3, compute_dtype=args.compute_dtype),
        data=DataConfig(root=args.data, ex_dataset=args.dataset,
                        datasets=datasets),
        train=TrainConfig(lr=1e-3, weight_decay=1e-4, batch_size=4,
                          max_epoch=args.epochs,
                          use_pretrained=args.use_model,
                          state_save_every=args.state_save_every,
                          model_save_every=args.model_save_every),
    )
    splits = load_splits(builtin_split_path(split_name))
    out_path = args.out or f"results_{split_name}.json"
    result = finetune(cfg, splits, metrics_path=out_path + ".epochs.jsonl")
    payload = {
        "protocol": "DSNet 5-fold, max-over-epochs per fold, fold mean",
        "dataset": split_name,
        "fscore": result.fscore,
        "kendall_tau": result.kendall_tau,
        "spearman_rho": result.spearman_rho,
        "per_split": result.per_split,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
