"""Quality-bearing convergence gate (slow: ~90 s of CPU training).

The reference's de-facto integration test is metric reproduction — Criteo
0.4408±0.0002 LogLoss for a documented script (ref: README.md:79).  Real
datasets are unavailable in CI, so this is the synthetic stand-in: a
2000-step fixed-seed run of the flagship autoctr best arch on the planted
logistic+categorical synthetic signal must land inside a pinned final-loss
band.  An optimizer/kernel/model numerics regression that slows convergence
WITHOUT producing NaNs — which no other test would catch — fails here.

Calibration (2026-08-19, CPU, highest matmul precision, seed 0):
  test_loss trajectory [0.6859, 0.4503, 0.3742], final AUROC 0.9121.
The run is bit-deterministic on one machine; the band below allows for
float-accumulation shifts across jax/XLA versions, not for algorithmic
drift (a 1% LR or eps change moves the final loss by >0.01).
"""

import numpy as np

from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.workloads import DataOptions, TrainOptions, train_fixed_subnet


def test_synthetic_convergence_gate():
    choice = get_best_arch("criteo-kaggle", "autoctr")
    payload = {**choice, "config": "autoctr", "num_blocks": 7}
    data = DataOptions(
        dataset="criteo-kaggle", data_source="synthetic",
        train_batch_size=256, test_batch_size=1024,
        synthetic_train_examples=512_000, synthetic_test_examples=16_384,
    )
    tr = TrainOptions(
        learning_rate=0.05, display_interval=500, test_interval=1000,
        max_train_steps=2000, max_eval_steps=16, seed=0,
    )
    out = train_fixed_subnet(payload, data, tr, log_fn=lambda s: None)
    logs = out["logs"][0]

    final_test = logs["test_loss"][-1]
    final_auroc = logs["test_AUROC"][-1]
    final_train = float(np.mean(logs["train_loss"][-3:]))
    # Pinned bands around the calibrated values (see module docstring).
    assert 0.360 <= final_test <= 0.385, logs["test_loss"]
    assert final_auroc >= 0.905, logs["test_AUROC"]
    assert 0.39 <= final_train <= 0.46, logs["train_loss"][-3:]
    # Convergence must be monotone at this budget (mid-run eval improves).
    assert logs["test_loss"][0] > logs["test_loss"][1] > final_test
