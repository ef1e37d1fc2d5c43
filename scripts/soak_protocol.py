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
    p.add_argument("--two_stage", action="store_true",
                   help="the reference's full workflow at protocol length "
                        "(run_pretrain.sh -> run_finetune.sh --use_model): "
                        "pretrain the encoder, warm-start the 5-fold "
                        "finetune from pretrain.ckpt, AND run a cold-start "
                        "finetune on identical folds for comparison")
    p.add_argument("--pretrain_epochs", type=int, default=200)
    p.add_argument("--pretrain_videos", type=int, default=512)
    p.add_argument("--pretrain_batch", type=int, default=256)
    p.add_argument("--pretrain_save_every", type=int, default=5,
                   help="encoder-checkpoint cadence (protocol-identical at "
                        "any value; the per-epoch fetch dominates synthetic "
                        "epochs through the relay)")
    p.add_argument("--out", default=None)
    p.add_argument("--workdir", default=None,
                   help="keep checkpoints here instead of a throwaway "
                        "tempdir (the trained model_mae.ckpt is the input "
                        "to the int8 accuracy studies)")
    p.add_argument("--d_model", type=int, default=256,
                   help="scorer width (256 = flagship; 512 mints the "
                        "checkpoint for the shape where the fused int8 "
                        "kernel wins on chip, PERF.md 'int8 scoring')")
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
        model=ModelConfig(d_model=args.d_model, num_heads=4, num_layers=4,
                          dropout=0.3, compute_dtype="bfloat16"),
        data=DataConfig(root=root, ex_dataset="tvsum",
                        datasets=("tvsum+summe+ovp+youtube" if args.aug
                                  else "tvsum")),
        train=TrainConfig(batch_size=4, max_epoch=args.epochs,
                          state_save_every=args.state_save_every,
                          model_save_every=args.model_save_every),
    )

    workdir = args.workdir or tempfile.mkdtemp(prefix="soak_work_")
    os.makedirs(workdir, exist_ok=True)
    out = {
        "workdir": workdir,
        "d_model": args.d_model,
        "folds": args.folds,
        "epochs": args.epochs,
        "state_save_every": args.state_save_every,
        "model_save_every": args.model_save_every,
        "aug": args.aug,
        "two_stage": args.two_stage,
    }

    if args.two_stage:
        # stage 1: run_pretrain.sh recipe (d256/h4/L4, dropout .2, bs 256,
        # cosine-warmup with the 13000-sample scheduler quirk) on a
        # synthetic frames/video npy tree; encoder -> workdir/pretrain.ckpt
        from vidsum_tpu.config import PretrainConfig
        from vidsum_tpu.data.datasets import PreTrainDataset
        from vidsum_tpu.data.synthetic import make_synthetic_pretrain_tree
        from vidsum_tpu.train.pretraining import pretrain

        pt_root = tempfile.mkdtemp(prefix="soak_pretrain_")
        make_synthetic_pretrain_tree(pt_root,
                                     n_videos=args.pretrain_videos, seed=1)
        pt_cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, dropout=0.2),
            pretrain=PretrainConfig(epochs=args.pretrain_epochs,
                                    batch_size=args.pretrain_batch,
                                    save_every=args.pretrain_save_every),
        )
        t0 = time.time()
        pt_result = pretrain(pt_cfg, PreTrainDataset(pt_root),
                             workdir=workdir)
        out["pretrain_min"] = round((time.time() - t0) / 60, 2)
        out["pretrain_epochs"] = args.pretrain_epochs
        out["pretrain_videos"] = args.pretrain_videos
        hist = pt_result["history"]
        out["pretrain_loss_first"] = hist[0] if hist else None
        out["pretrain_loss_last"] = hist[-1] if hist else None
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, use_pretrained=True))

    t0 = time.time()
    result = finetune(cfg, folds, workdir=workdir, export_summary=False)
    wall = time.time() - t0
    out.update({
        "wall_min": round(wall / 60, 2),
        "fscore": result.fscore,
        "kendall_tau": result.kendall_tau,
        "spearman_rho": result.spearman_rho,
        "per_split": result.per_split,
    })

    if args.two_stage:
        # cold-start comparison on identical folds/seed (the reference's
        # run_finetune.sh WITHOUT --use_model)
        cold_cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, use_pretrained=False))
        cold_dir = tempfile.mkdtemp(prefix="soak_cold_")
        t0 = time.time()
        cold = finetune(cold_cfg, folds, workdir=cold_dir,
                        export_summary=False)
        out["cold"] = {
            "wall_min": round((time.time() - t0) / 60, 2),
            "fscore": cold.fscore,
            "kendall_tau": cold.kendall_tau,
            "spearman_rho": cold.spearman_rho,
            "per_split": cold.per_split,
        }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
