"""End-to-end NAS pipeline on synthetic data: supernet one-shot training ->
weight-shared EA search -> export best arch -> retrain from scratch.

The miniature analogue of the reference's full workflow
(train_supernet.sh -> run_ea.sh -> dump_ea_records -> eval_best_model.sh)."""

import numpy as np
import pytest

from nasrec_tpu.workloads import (
    DataOptions,
    SearchOptions,
    SupernetOptions,
    TrainOptions,
    search_from_supernet,
    train_fixed_subnet,
    train_supernet,
)


def test_full_nas_pipeline(tmp_path):
    data = DataOptions(
        dataset="criteo-kaggle", data_source="synthetic",
        train_batch_size=128, test_batch_size=512,
        synthetic_train_examples=16384, synthetic_test_examples=4096,
    )

    # 1. One-shot supernet training (default strategy, warmup decay).
    # eval_path="full-path": this assertion checks that the supernet LEARNED,
    # so use the deterministic full-path eval (the "sampled" default matches
    # the reference's random-subnet-per-eval-batch, too noisy for a
    # threshold at 300 steps; ref: nasrec/utils/train_utils.py:144-147).
    sn = SupernetOptions(
        config="autoctr", num_blocks=3, strategy="default",
        anypath_choice="binomial-0.5", supernet_training_steps=40,
        eval_path="full-path",
    )
    # 450 steps: at 300 the full-path AUC sits right on the 0.6 line and
    # f32 summation-order changes (e.g. the r4 per-column prep cumsum)
    # flip it across; the margin, not the threshold, was the problem.
    sn_out = train_supernet(
        sn, data,
        TrainOptions(
            learning_rate=0.05, max_train_steps=450, max_eval_steps=8,
            test_interval=450, display_interval=100,
            logging_dir=str(tmp_path),
        ),
        log_fn=lambda s: None,
    )
    supernet_eval_auc = sn_out["logs"][0]["test_AUROC"][-1]
    assert supernet_eval_auc > 0.6, f"supernet failed to learn: {supernet_eval_auc}"

    # 2. EA search against the trained supernet checkpoint.
    results = search_from_supernet(
        SearchOptions(
            method="regularized-ea", config="autoctr", num_blocks=3,
            ckpt_path=str(tmp_path / "supernet_checkpoint.pkl"),
            learning_rate=0.04, max_train_steps=30, max_eval_steps=4,
            n_generations=3, n_childs=4, init_population=8, sample_size=6,
            ea_top_k=1, group_size=4,
        ),
        data, logging_dir=str(tmp_path / "ea"), log_fn=lambda s: None,
    )
    assert len(results) == 3
    best = min(results, key=lambda r: r["test_loss"])
    assert np.isfinite(best["test_loss"])
    assert best["test_auroc"] > 0.6, best

    # 3. Retrain the discovered arch from scratch (best-model reproduction).
    payload = {**best["choice"], "config": "autoctr", "num_blocks": 3}
    out = train_fixed_subnet(
        payload, data,
        TrainOptions(
            learning_rate=0.05, max_train_steps=300, max_eval_steps=8,
            test_interval=300, display_interval=100,
        ),
        log_fn=lambda s: None,
    )
    final_auc = out["logs"][0]["test_AUROC"][-1]
    assert final_auc > 0.70, f"retrained best arch weak: {final_auc}"
