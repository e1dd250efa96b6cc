"""Rank-correlation H4: is the WS-vs-scratch gap WS noise or WS bias?

v2 found: scratch self-tau (seed0 vs seed1) = 0.33 — the noise ceiling —
and the 4x-longer supernet's final-only ranking reaches tau = 0.196 against
the 2-seed scratch MEAN.  Two remaining questions this script answers:

  H4a  WS replica noise: re-run the final-only ranking on the long supernet
       with a different fine-tune DATA ORDER (same checkpoint; the fine-tune
       from a fixed checkpoint is otherwise deterministic, so the stream
       seed is the replica axis) and report ws self-tau.  If ws self-tau is
       high (~0.8+), the 0.196 is a BIAS of weight sharing, not noise; if
       ws self-tau ~ 0.3-0.5, the single-replica tau was noise-limited and
       averaging helps.
  H4b  denoised correlation: tau(mean of 3 WS replicas, mean of 2 scratch
       runs), plus the attenuation-corrected estimate
       rho_true ~= rho_obs / sqrt(rho_ws_self * rho_scratch_self).

Reuses the long-supernet checkpoint from rank_correlation_v2.py.
Writes experiments/rank_correlation_v3_results.json.
Run: python experiments/rank_correlation_v3.py   (TPU host, ~10 min)
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
    SPEC,
    data_opts,
    kendall_tau,
    spearman_rho,
)
from rank_correlation_v2 import regen_archs

HERE = os.path.dirname(os.path.abspath(__file__))
LONG_CKPT = os.path.join(OUT_DIR, "supernet_long", "supernet_checkpoint.pkl")
V2_RESULTS = os.path.join(HERE, "rank_correlation_v2_results.json")


def patched_iterators_with_seed(train_seed: int):
    """Same synthetic task as v1/v2 but a replica-specific TRAIN stream
    order; the test stream stays seed=1 (identical eval data across
    replicas)."""
    import nasrec_tpu.workloads as W
    from nasrec_tpu.data.synthetic import synthetic_batches

    def make_iters(data):
        def train_iter():
            return synthetic_batches(
                data.synthetic_train_examples, data.train_batch_size, SPEC,
                seed=train_seed, loop=True,
            )

        def test_iter():
            return synthetic_batches(
                data.synthetic_test_examples, data.test_batch_size, SPEC,
                seed=1,
            )

        return train_iter, test_iter

    W._make_iterators = make_iters


def ws_rank(archs, data_seed):
    patched_iterators_with_seed(data_seed)
    t0 = time.time()
    out = evaluate_choices_from_supernet(
        archs,
        SearchOptions(
            config=CONFIG, num_blocks=NUM_BLOCKS, ckpt_path=LONG_CKPT,
            learning_rate=0.04, max_train_steps=500, max_eval_steps=24,
            group_size=8, seed=0, finetune_mode="final-only",
        ),
        data_opts(train_batch_size=512, test_batch_size=4096),
        log_fn=lambda s: None,
    )
    losses = [r["test_loss"] for r in out]
    print(f"WS[final-only,data_seed={data_seed}]:",
          [round(x, 5) for x in losses],
          f"({time.time() - t0:.0f}s)", flush=True)
    return losses


def main():
    v2 = json.load(open(V2_RESULTS))
    archs = regen_archs()
    scratch_mean = v2["scratch_mean"]
    ws0 = v2["ws_long_vs_mean"]["ws_loss"]  # data-seed-0 replica from v2

    ws1 = ws_rank(archs, data_seed=101)
    ws2 = ws_rank(archs, data_seed=202)

    results = {
        "ws_seed0": ws0,
        "ws_seed1": [round(float(x), 6) for x in ws1],
        "ws_seed2": [round(float(x), 6) for x in ws2],
        "ws_self_tau_01": round(kendall_tau(ws0, ws1), 4),
        "ws_self_tau_02": round(kendall_tau(ws0, ws2), 4),
        "ws_self_tau_12": round(kendall_tau(ws1, ws2), 4),
        "ws_self_rho_01": round(spearman_rho(ws0, ws1), 4),
    }
    ws_mean = [float(np.mean([a, b, c])) for a, b, c in zip(ws0, ws1, ws2)]
    results["ws_mean"] = [round(x, 6) for x in ws_mean]
    results["tau_wsmean_vs_scratchmean"] = round(
        kendall_tau(ws_mean, scratch_mean), 4)
    results["rho_wsmean_vs_scratchmean"] = round(
        spearman_rho(ws_mean, scratch_mean), 4)

    # Attenuation correction (Spearman, classical test-theory):
    # rho(true_ws, true_scratch) ~= rho_obs / sqrt(rel_ws * rel_scratch),
    # reliability of a 3-replica mean via Spearman-Brown from the mean
    # pairwise replica rho.
    rho_ws_pair = float(np.mean([
        spearman_rho(ws0, ws1), spearman_rho(ws0, ws2), spearman_rho(ws1, ws2)
    ]))
    rel_ws3 = 3 * rho_ws_pair / (1 + 2 * rho_ws_pair) if rho_ws_pair > 0 else float("nan")
    rho_scr_pair = spearman_rho(v2["scratch_seed0"], v2["scratch_seed1"])
    rel_scr2 = 2 * rho_scr_pair / (1 + rho_scr_pair) if rho_scr_pair > 0 else float("nan")
    rho_obs = results["rho_wsmean_vs_scratchmean"]
    results["rho_ws_pairwise"] = round(rho_ws_pair, 4)
    results["rho_scratch_pairwise"] = round(rho_scr_pair, 4)
    if rel_ws3 > 0 and rel_scr2 > 0:
        results["rho_attenuation_corrected"] = round(
            rho_obs / np.sqrt(rel_ws3 * rel_scr2), 4)

    out_path = os.path.join(HERE, "rank_correlation_v3_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items()
                      if not isinstance(v, list)}, indent=2))


if __name__ == "__main__":
    main()
