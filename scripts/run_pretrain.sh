#!/usr/bin/env bash
# Launch recipe mirroring the reference's run_pretrain.sh (d256/h4/L4,
# dropout 0.2, lr 1e-3, bs 256, 200 epochs).
python -m vidsum_tpu.cli.pretrain --data data/features --d_model 256 \
    --num_heads 4 --num_layers 4 --dropout 0.2 --lr 1e-3 --epochs 200 \
    --batch_size 256 --sparsity 0.0 "$@"
