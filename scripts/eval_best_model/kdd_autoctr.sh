#!/bin/bash
# Train the published best autoctr arch on kdd from scratch.
# Hyperparameters mirror the reference launcher
# (ref: nasrec/scripts/eval_best_model/eval_kdd_autoctr_best_1shot_models.sh).
LR=0.1
WD=0

python -u -m nasrec_tpu.cli.main_train \
    --root_dir ./data/kdd_kaggle_autoctr/ \
    --dataset kdd \
    --net supernet-config \
    --arch kdd/autoctr \
    --num_epochs 1 \
    --learning_rate $LR \
    --train_batch_size 512 \
    --wd $WD \
    --test_interval 20000 \
    --logging_dir ./experiments/best_models/kdd_autoctr_lr${LR}_wd${WD}
