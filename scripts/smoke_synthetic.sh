#!/bin/bash
# End-to-end smoke of all four workloads on synthetic data (no datasets needed).
set -e
python -u -m nasrec_tpu.cli.main_train --net supernet-config \
    --arch criteo-kaggle/xlarge --data_source synthetic \
    --max_train_steps 50 --max_eval_steps 4 --test_interval 50 \
    --train_batch_size 256 --test_batch_size 512
python -u -m nasrec_tpu.cli.train_supernet --config autoctr --num_blocks 3 \
    --data_source synthetic --max_train_steps 50 --max_eval_steps 4 \
    --test_interval 50 --train_batch_size 256 --test_batch_size 512 \
    --supernet_training_steps 10 --logging_dir /tmp/nasrec_tpu_smoke
python -u -m nasrec_tpu.cli.eval_subnet_from_supernet --config autoctr \
    --num_blocks 3 --data_source synthetic --method random --budget 4 \
    --max_train_steps 10 --max_eval_steps 2 --group_size 2 --ea_top_k 2 \
    --train_batch_size 256 --test_batch_size 512 \
    --ckpt_path /tmp/nasrec_tpu_smoke/supernet_checkpoint.pkl
python -u -m nasrec_tpu.cli.eval_subnet_from_scratch --config autoctr \
    --num_blocks 3 --data_source synthetic --num_subnets 2 \
    --train_batch_size 256 --test_batch_size 512 \
    --max_train_steps 10 --max_eval_steps 2 --test_interval 10
python -u -m nasrec_tpu.tools.sweep_device_check
python -u -m nasrec_tpu.tools.body_device_check
# Tiny-scale run of the FULL bench code path (donated sweep step, fresh_state
# rebuilds, AMP/zipf/supernet variants, roofline) — a crashing bench.py can
# never ship again (round-3: official BENCH json was rc=1, unguarded).
python -u bench.py --smoke
echo "smoke OK"
