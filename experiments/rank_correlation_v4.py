"""Rank-correlation H5: is the whole-net FT tau=0.28 robust off the train pool?

v3 found the final-only probe is deterministic (replica tau 0.99 across two
DIFFERENT fresh datasets) yet ~uncorrelated with scratch rank (tau 0.0),
while the same probe on the supernet's own 1M-example train pool scored
tau 0.196 — i.e. the probe's apparent signal was a train-pool artifact.
The headline v2 result (whole-net FT on the long supernet, tau 0.28 /
rho 0.42 vs the scratch mean, at the scratch self-reliability ceiling) was
ALSO measured on the train pool.  This script re-ranks with whole-net FT on
two fresh datasets (seeds 101 / 202, same generator spec):

  - if tau vs scratch-mean stays ~0.28, the whole-net evaluator's signal is
    real architecture signal and the headline claim stands;
  - if it collapses toward 0, the one-shot evaluator at this scale ranks
    memorization, not architecture quality, and EXPERIMENTS.md must say so.

Writes experiments/rank_correlation_v4_results.json.
Run: python experiments/rank_correlation_v4.py   (TPU host, ~25 min)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nasrec_tpu.workloads import SearchOptions, evaluate_choices_from_supernet

from rank_correlation import (
    CONFIG,
    NUM_BLOCKS,
    OUT_DIR,
    kendall_tau,
    spearman_rho,
)
from rank_correlation_v2 import regen_archs
from rank_correlation_v3 import patched_iterators_with_seed, data_opts

HERE = os.path.dirname(os.path.abspath(__file__))
LONG_CKPT = os.path.join(OUT_DIR, "supernet_long", "supernet_checkpoint.pkl")
V2_RESULTS = os.path.join(HERE, "rank_correlation_v2_results.json")


def ws_whole_rank(archs, data_seed):
    patched_iterators_with_seed(data_seed)
    t0 = time.time()
    out = evaluate_choices_from_supernet(
        archs,
        SearchOptions(
            config=CONFIG, num_blocks=NUM_BLOCKS, ckpt_path=LONG_CKPT,
            learning_rate=0.04, max_train_steps=500, max_eval_steps=24,
            group_size=2, seed=0, finetune_mode="whole",
        ),
        data_opts(train_batch_size=512, test_batch_size=4096),
        log_fn=lambda s: None,
    )
    losses = [r["test_loss"] for r in out]
    print(f"WS[whole,data_seed={data_seed}]:",
          [round(x, 5) for x in losses],
          f"({time.time() - t0:.0f}s)", flush=True)
    return losses


def main():
    v2 = json.load(open(V2_RESULTS))
    archs = regen_archs()
    scratch_mean = v2["scratch_mean"]
    ws_pool = v2["ws_long_whole_vs_mean"]["ws_loss"]  # train-pool replica

    ws1 = ws_whole_rank(archs, data_seed=101)
    ws2 = ws_whole_rank(archs, data_seed=202)
    ws_fresh_mean = [(a + b) / 2 for a, b in zip(ws1, ws2)]

    results = {
        "ws_whole_pool": ws_pool,
        "ws_whole_seed1": [round(float(x), 6) for x in ws1],
        "ws_whole_seed2": [round(float(x), 6) for x in ws2],
        "tau_whole_self_12": round(kendall_tau(ws1, ws2), 4),
        "rho_whole_self_12": round(spearman_rho(ws1, ws2), 4),
        "tau_whole_pool_vs_fresh": round(kendall_tau(ws_pool, ws1), 4),
        "tau_whole_seed1_vs_scratchmean": round(
            kendall_tau(ws1, scratch_mean), 4),
        "tau_whole_seed2_vs_scratchmean": round(
            kendall_tau(ws2, scratch_mean), 4),
        "tau_whole_freshmean_vs_scratchmean": round(
            kendall_tau(ws_fresh_mean, scratch_mean), 4),
        "rho_whole_freshmean_vs_scratchmean": round(
            spearman_rho(ws_fresh_mean, scratch_mean), 4),
    }

    good = np.array(scratch_mean) < 0.672
    ws = np.array(ws_fresh_mean)
    pairs = [(i, j) for i in range(len(ws)) for j in range(len(ws))
             if good[i] and not good[j]]
    results["interaction_auc_freshmean"] = round(float(np.mean([
        1.0 if ws[i] < ws[j] else (0.5 if ws[i] == ws[j] else 0.0)
        for i, j in pairs
    ])), 4) if pairs else float("nan")

    out_path = os.path.join(HERE, "rank_correlation_v4_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items()
                      if not isinstance(v, list)}, indent=2))


if __name__ == "__main__":
    main()
