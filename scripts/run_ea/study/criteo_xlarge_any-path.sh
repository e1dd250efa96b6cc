#!/bin/bash
# Ablation EA: any-path-trained supernet.
# Ref: nasrec/scripts/run_ea/study/criteo_run_ea_from_supernet_xlarge-any-path.sh
CKPT_PATH=./experiments/ablations-paths/criteo_xlarge_anypath_lr0.12/supernet_checkpoint.pkl

python -u -m nasrec_tpu.cli.eval_subnet_from_supernet \
    --root_dir ./data/criteo_kaggle_autoctr/ \
    --dataset criteo-kaggle \
    --ea_top_k 2 \
    --ckpt_path $CKPT_PATH \
    --learning_rate 0.04 \
    --n_childs 8 \
    --n_generations 240 \
    --init_population 128 \
    --sample_size 64 \
    --method regularized-ea \
    --use_layernorm 1 \
    --max_train_steps 500 \
    --train_batch_size 512 \
    --test_batch_size 8192 \
    --max_eval_steps 150 \
    --config xlarge \
    --cap_vocab 1 \
    --group_size 8 \
    --logging_dir ./experiments/ea-study/criteo_xlarge_any-path
