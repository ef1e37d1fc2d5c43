"""Full-protocol soak on synthetic data: 5 folds x N epochs, flagship model.

Exercises the production finetune driver end-to-end on the real chip
(fused kernels, bucketed batches, per-epoch KTS+knapsack eval, async
checkpointing, resume state) at SumMe/TVSum scale without needing the real
archives (no egress). The real-data run is scripts/reproduce.py.

    python scripts/soak_protocol.py [--epochs 30] [--videos 50] \
        [--state_save_every 1] [--folds 5]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser("synthetic full-protocol soak")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--videos", type=int, default=50)
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--state_save_every", type=int, default=1)
    p.add_argument("--model_save_every", type=int, default=1)
    p.add_argument("--aug", action="store_true",
                   help="augmented protocol: train on a 4-dataset mix "
                        "(tvsum+summe+ovp+youtube synthetic h5s), eval on "
                        "the experiment dataset — the *_aug.yaml recipe")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    logging.basicConfig(format="[%(levelname)s] %(module)s - %(message)s",
                        level=logging.INFO)

    from vidsum_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from vidsum_tpu.data.synthetic import make_synthetic_h5
    from vidsum_tpu.train import finetune

    root = tempfile.mkdtemp(prefix="soak_data_")
    make_synthetic_h5(
        os.path.join(root, "summarizer_dataset_tvsum_google_pool5.h5"),
        n_videos=args.videos, seed=0)
    keys = [f"x.h5/video_{i}" for i in range(args.videos)]
    if args.aug:
        # augmented mix (the *_aug.yaml recipe): the other three datasets
        # contribute ALL their videos to training; split keys restrict only
        # the experiment dataset (data/datasets.py TSDataset)
        from vidsum_tpu.data import PATH as PATH_MAP
        for di, name in enumerate(("summe", "ovp", "youtube")):
            make_synthetic_h5(os.path.join(root, PATH_MAP[name]),
                              n_videos=args.videos // 2, seed=10 + di)

    # DSNet-style rotating folds: each fold holds out a contiguous fifth
    folds = []
    per = args.videos // args.folds
    for f in range(args.folds):
        test = keys[f * per:(f + 1) * per]
        train = [k for k in keys if k not in test]
        folds.append({"train_keys": train, "test_keys": test})

    cfg = Config(
        model=ModelConfig(d_model=256, num_heads=4, num_layers=4,
                          dropout=0.3, compute_dtype="bfloat16"),
        data=DataConfig(root=root, ex_dataset="tvsum",
                        datasets=("tvsum+summe+ovp+youtube" if args.aug
                                  else "tvsum")),
        train=TrainConfig(batch_size=4, max_epoch=args.epochs,
                          state_save_every=args.state_save_every,
                          model_save_every=args.model_save_every),
    )

    workdir = tempfile.mkdtemp(prefix="soak_work_")
    t0 = time.time()
    result = finetune(cfg, folds, workdir=workdir, export_summary=False)
    wall = time.time() - t0
    out = {
        "wall_min": round(wall / 60, 2),
        "folds": args.folds,
        "epochs": args.epochs,
        "fscore": result.fscore,
        "kendall_tau": result.kendall_tau,
        "spearman_rho": result.spearman_rho,
        "per_split": result.per_split,
        "state_save_every": args.state_save_every,
        "model_save_every": args.model_save_every,
        "aug": args.aug,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
