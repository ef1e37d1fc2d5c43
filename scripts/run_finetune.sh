#!/usr/bin/env bash
# Launch recipe mirroring the reference's run_finetune.sh (d256/h4/L4,
# lr 1e-3, wd 1e-4, bs 4, 100 epochs, warm start from pretrain.ckpt).
python -m vidsum_tpu.cli.train --data data --datasets tvsum --ex_dataset tvsum \
    --batch_size 4 --num_heads 4 --d_model 256 --num_layers 4 \
    --lr 1e-3 --weight_decay 1e-4 --max_epoch 100 --dsnet_split --use_model "$@"
