"""Rank-correlation follow-up: WHY was tau weak in rank_correlation.py?

Round-2 result (experiments/rank_correlation_results.json): Kendall tau
0.087 between weight-shared (final-only, 500 steps) and from-scratch test
losses over 24 random xlarge archs; WS-loss AUC for separating archs that
learn the planted interaction (scratch < 0.672, n=15) from those that don't
(n=9) was only 0.615.  Three competing explanations, each isolated here:

  H1  scratch ranking is itself seed noise      -> re-run scratch with a
      different init seed, report tau(scratch_0, scratch_1): the NOISE
      CEILING any predictor can reach.
  H2  final-only fine-tune can't express the gap -> re-rank the SAME
      supernet with whole-net fine-tune (vmapped groups).
  H3  supernet undertrained (6000 x 512)         -> train 4x longer
      (24000 steps) and re-rank final-only.

Reuses experiments/rankcorr/supernet/supernet_checkpoint.pkl and the
scratch losses from rank_correlation_results.json.

Writes experiments/rank_correlation_v2_results.json.
Run: python experiments/rank_correlation_v2.py   (TPU host, ~45-70 min)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nasrec_tpu.config import OPS_CONFIG_LIB
from nasrec_tpu.search import Tokenizer
from nasrec_tpu.workloads import (
    SearchOptions,
    SupernetOptions,
    TrainOptions,
    evaluate_choices_from_supernet,
    train_fixed_subnet,
    train_supernet,
)

from rank_correlation import (
    CONFIG,
    N_ARCHS,
    NUM_BLOCKS,
    OUT_DIR,
    data_opts,
    kendall_tau,
    patched_iterators,
    spearman_rho,
)

HERE = os.path.dirname(os.path.abspath(__file__))
V1_RESULTS = os.path.join(HERE, "rank_correlation_results.json")
CKPT = os.path.join(OUT_DIR, "supernet", "supernet_checkpoint.pkl")
LONG_DIR = os.path.join(OUT_DIR, "supernet_long")


def regen_archs():
    """Same arch list as v1 (same tokenizer seed + dedup walk)."""
    tok = Tokenizer(NUM_BLOCKS, OPS_CONFIG_LIB[CONFIG], seed=7)
    archs, seen = [], set()
    while len(archs) < N_ARCHS:
        c = tok.generate_random_choice()
        key = json.dumps(c, sort_keys=True, default=str)
        if key not in seen:
            seen.add(key)
            archs.append(c)
    return archs


def ws_rank(archs, ckpt, mode, steps, lr):
    t0 = time.time()
    # group_size 2 for whole-net mode: vmapping 8 full per-candidate grad
    # pipelines exceeded HBM (first run OOM'd in the dot_general temps).
    out = evaluate_choices_from_supernet(
        archs,
        SearchOptions(
            config=CONFIG, num_blocks=NUM_BLOCKS, ckpt_path=ckpt,
            learning_rate=lr, max_train_steps=steps, max_eval_steps=24,
            group_size=8 if mode == "final-only" else 2,
            seed=0, finetune_mode=mode,
        ),
        data_opts(train_batch_size=512, test_batch_size=4096),
        log_fn=lambda s: None,
    )
    losses = [r["test_loss"] for r in out]
    print(f"WS[{mode},{steps}]:", [round(x, 5) for x in losses],
          f"({time.time() - t0:.0f}s)", flush=True)
    return losses


def corr_block(name, ws_loss, scratch_loss, results):
    tau = kendall_tau(ws_loss, scratch_loss)
    rho = spearman_rho(ws_loss, scratch_loss)
    good = np.array(scratch_loss) < 0.672
    ws = np.array(ws_loss)
    pairs = [(i, j) for i in range(len(ws)) for j in range(len(ws))
             if good[i] and not good[j]]
    auc = float(np.mean([
        1.0 if ws[i] < ws[j] else (0.5 if ws[i] == ws[j] else 0.0)
        for i, j in pairs
    ])) if pairs and good.any() and (~good).any() else float("nan")
    results[name] = {
        "ws_loss": [round(float(x), 6) for x in ws_loss],
        "kendall_tau": round(tau, 4),
        "spearman_rho": round(rho, 4),
        "interaction_auc": round(auc, 4),
    }
    print(f"{name}: tau={tau:.3f} rho={rho:.3f} auc={auc:.3f}", flush=True)


PARTIAL = os.path.join(HERE, "rank_correlation_v2_partial.json")


def _checkpoint(results):
    with open(PARTIAL, "w") as f:
        json.dump(results, f, indent=1)


def main():
    patched_iterators()
    v1 = json.load(open(V1_RESULTS))
    scratch0 = v1["scratch_loss"]
    archs = regen_archs()
    results = {"n_archs": N_ARCHS, "scratch_seed0": scratch0}
    prior = json.load(open(PARTIAL)) if os.path.exists(PARTIAL) else {}

    # ---- H1: scratch seed-noise ceiling ----------------------------------
    if "scratch_seed1" in prior and len(prior["scratch_seed1"]) == N_ARCHS:
        scratch1 = prior["scratch_seed1"]
        print("H1: reusing scratch_seed1 from partial file", flush=True)
    else:
        scratch1 = []
        t0 = time.time()
        for i, choice in enumerate(archs):
            payload = {"macro": choice["macro"], "micro": choice["micro"],
                       "config": CONFIG, "num_blocks": NUM_BLOCKS}
            out = train_fixed_subnet(
                payload,
                data_opts(train_batch_size=512, test_batch_size=8192),
                TrainOptions(
                    learning_rate=0.12, max_train_steps=3000,
                    test_interval=3000, display_interval=3000,
                    max_eval_steps=24, test_only_at_last_step=True, seed=1,
                ),
                log_fn=lambda s: None,
            )
            scratch1.append(out["logs"][0]["test_loss"][-1])
            print(f"SCRATCH(seed1) {i + 1}/{N_ARCHS}: {scratch1[-1]:.5f}",
                  flush=True)
        results["scratch_seconds"] = round(time.time() - t0, 1)
    results["scratch_seed1"] = [round(float(x), 6) for x in scratch1]
    results["scratch_self_tau"] = round(kendall_tau(scratch0, scratch1), 4)
    results["scratch_self_rho"] = round(spearman_rho(scratch0, scratch1), 4)
    print(f"H1 scratch self-tau = {results['scratch_self_tau']}", flush=True)
    _checkpoint(results)

    # Correlate against the MEAN of both scratch runs (lower-noise target).
    scratch_mean = [(a + b) / 2 for a, b in zip(scratch0, scratch1)]
    results["scratch_mean"] = [round(float(x), 6) for x in scratch_mean]

    # ---- H2: whole-net fine-tune from the SAME supernet -------------------
    ws_whole = ws_rank(archs, CKPT, "whole", 500, 0.04)
    corr_block("ws_whole_vs_seed0", ws_whole, scratch0, results)
    corr_block("ws_whole_vs_mean", ws_whole, scratch_mean, results)
    _checkpoint(results)

    # ---- H3: 4x-longer supernet, canonical final-only ranking -------------
    long_ckpt = os.path.join(LONG_DIR, "supernet_checkpoint.pkl")
    if not os.path.exists(long_ckpt):
        t0 = time.time()
        train_supernet(
            SupernetOptions(
                config=CONFIG, num_blocks=NUM_BLOCKS, use_layernorm=True,
                strategy="default", anypath_choice="binomial-0.5",
                supernet_training_steps=6000,
            ),
            data_opts(train_batch_size=512, test_batch_size=8192),
            TrainOptions(
                learning_rate=0.12, max_train_steps=24000,
                test_interval=24000, display_interval=4000, max_eval_steps=12,
                logging_dir=LONG_DIR,
            ),
        )
        results["supernet_long_seconds"] = round(time.time() - t0, 1)
        print("LONG SUPERNET trained", flush=True)
    ws_long = ws_rank(archs, long_ckpt, "final-only", 500, 0.04)
    corr_block("ws_long_vs_seed0", ws_long, scratch0, results)
    corr_block("ws_long_vs_mean", ws_long, scratch_mean, results)
    _checkpoint(results)

    # Bonus: whole-net fine-tune on the long supernet (H2 x H3).
    ws_long_whole = ws_rank(archs, long_ckpt, "whole", 500, 0.04)
    corr_block("ws_long_whole_vs_mean", ws_long_whole, scratch_mean, results)

    out_path = os.path.join(HERE, "rank_correlation_v2_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items()
                      if not isinstance(v, list)}, indent=2))


if __name__ == "__main__":
    main()
