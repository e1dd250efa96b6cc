#!/bin/bash
# One-shot supernet training on criteo-kaggle (NASRec-Full space).
# Hyperparameters mirror the reference launcher
# (ref: nasrec/scripts/train_supernet/train_supernet_xlarge_criteo.sh).
LR=0.12
WD=0

python -u -m nasrec_tpu.cli.train_supernet \
    --root_dir ./data/criteo_kaggle_autoctr \
    --dataset criteo-kaggle \
    --learning_rate $LR \
    --train_batch_size 512 \
    --strategy default \
    --anypath_choice binomial-0.5 \
    --test_batch_size 4096 \
    --use_layernorm 1 \
    --supernet_training_steps 15000 \
    --config xlarge \
    --num_blocks 7 \
    --num_epochs 1 \
    --test_interval 2000 \
    --cap_vocab 1 \
    --wd $WD \
    --logging_dir ./experiments/supernet/criteo_xlarge_lr${LR}
