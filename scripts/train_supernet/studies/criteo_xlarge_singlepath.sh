#!/bin/bash
# Ablation: single-path supernet training (WWW'23 path-sampling study).
# Ref: nasrec/scripts/train_supernet/studies/train_supernet_xlarge_criteo_singlepath.sh
LR=0.12
WD=0

python -u -m nasrec_tpu.cli.train_supernet \
    --root_dir ./data/criteo_kaggle_autoctr \
    --dataset criteo-kaggle \
    --learning_rate $LR \
    --train_batch_size 512 \
    --strategy single-path \
    --test_batch_size 2048 \
    --use_layernorm 1 \
    --supernet_training_steps 15000 \
    --config xlarge \
    --num_blocks 7 \
    --num_epochs 1 \
    --test_interval 2000 \
    --cap_vocab 1 \
    --wd $WD \
    --logging_dir ./experiments/ablations-paths/criteo_xlarge_singlepath_lr${LR}
