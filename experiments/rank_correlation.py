"""Rank-correlation validation of the one-shot (weight-sharing) premise.

The framework's central scientific claim (the WWW'23 NasRec premise,
ref: nasrec/eval_subnet_from_supernet.py — candidates are RANKED by cheap
weight-shared evaluation instead of from-scratch training) is only useful if
the weight-shared ranking agrees with the from-scratch ranking.  This
experiment measures that directly on the planted-interaction synthetic task:

  1. train a supernet one-shot (canonical strategy, scaled steps)
  2. sample N distinct random archs from the search space
  3. rank them by weight-shared eval (final-only fine-tune, canonical
     500 steps / lr 0.04, vmapped K-candidate groups)
  4. rank them by from-scratch training (independent init each)
  5. report Kendall tau + Spearman rho between the two test-loss rankings

Writes experiments/rank_correlation_results.json.
Run: python experiments/rank_correlation.py   (TPU host, ~35-45 min)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nasrec_tpu.config import OPS_CONFIG_LIB
from nasrec_tpu.data.synthetic import SyntheticSpec
from nasrec_tpu.search import Tokenizer
from nasrec_tpu.workloads import (
    DataOptions,
    SearchOptions,
    SupernetOptions,
    TrainOptions,
    train_fixed_subnet,
    train_supernet,
)

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "rankcorr")
SPEC = SyntheticSpec(vocab=1000, signal_scale=1.0,
                     interaction_pairs=16, interaction_scale=2.0)
N_ARCHS = 24
NUM_BLOCKS = 7
CONFIG = "xlarge"


def kendall_tau(a, b):
    """Exact Kendall tau-b for small N (ties handled)."""
    a, b = np.asarray(a), np.asarray(b)
    n = len(a)
    conc = disc = ties_a = ties_b = 0
    for i in range(n):
        for j in range(i + 1, n):
            da, db = a[i] - a[j], b[i] - b[j]
            if da == 0 and db == 0:
                continue
            if da == 0:
                ties_a += 1
            elif db == 0:
                ties_b += 1
            elif (da > 0) == (db > 0):
                conc += 1
            else:
                disc += 1
    denom = np.sqrt((conc + disc + ties_a) * (conc + disc + ties_b))
    return float((conc - disc) / denom) if denom else 0.0


def spearman_rho(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))


def patched_iterators():
    import nasrec_tpu.workloads as W
    from nasrec_tpu.data.synthetic import synthetic_batches

    def make_iters(data):
        def train_iter():
            return synthetic_batches(
                data.synthetic_train_examples, data.train_batch_size, SPEC,
                seed=0, loop=True,
            )

        def test_iter():
            return synthetic_batches(
                data.synthetic_test_examples, data.test_batch_size, SPEC, seed=1
            )

        return train_iter, test_iter

    W._make_iterators = make_iters


def data_opts(**kw):
    return DataOptions(
        dataset="criteo-kaggle", data_source="synthetic",
        synthetic_train_examples=1_000_000, synthetic_test_examples=200_000,
        **kw,
    )


def main():
    patched_iterators()
    os.makedirs(OUT_DIR, exist_ok=True)
    results = {"n_archs": N_ARCHS, "spec": {"vocab": SPEC.vocab,
               "interaction_pairs": SPEC.interaction_pairs}}

    # ---- 1. one-shot supernet -------------------------------------------
    ckpt = os.path.join(OUT_DIR, "supernet", "supernet_checkpoint.pkl")
    if not os.path.exists(ckpt):
        t0 = time.time()
        train_supernet(
            SupernetOptions(
                config=CONFIG, num_blocks=NUM_BLOCKS, use_layernorm=True,
                strategy="default", anypath_choice="binomial-0.5",
                supernet_training_steps=1500,
            ),
            data_opts(train_batch_size=512, test_batch_size=8192),
            TrainOptions(
                learning_rate=0.12, max_train_steps=6000, test_interval=6000,
                display_interval=1000, max_eval_steps=12,
                logging_dir=os.path.join(OUT_DIR, "supernet"),
            ),
        )
        results["supernet_seconds"] = round(time.time() - t0, 1)
        print("SUPERNET trained", flush=True)

    # ---- 2. N distinct random archs -------------------------------------
    tok = Tokenizer(NUM_BLOCKS, OPS_CONFIG_LIB[CONFIG], seed=7)
    archs, seen = [], set()
    while len(archs) < N_ARCHS:
        c = tok.generate_random_choice()
        key = json.dumps(c, sort_keys=True, default=str)
        if key not in seen:
            seen.add(key)
            archs.append(c)

    # ---- 3. weight-shared ranking (canonical fine-tune settings) --------
    from nasrec_tpu.workloads import evaluate_choices_from_supernet

    t0 = time.time()
    ws = evaluate_choices_from_supernet(
        archs,
        SearchOptions(
            config=CONFIG, num_blocks=NUM_BLOCKS, ckpt_path=ckpt,
            learning_rate=0.04, max_train_steps=500, max_eval_steps=24,
            group_size=8, seed=0,
        ),
        data_opts(train_batch_size=512, test_batch_size=4096),
    )
    ws_loss = [r["test_loss"] for r in ws]
    results["ws_seconds"] = round(time.time() - t0, 1)
    print("WS losses:", [round(x, 5) for x in ws_loss], flush=True)

    # ---- 4. from-scratch ranking ----------------------------------------
    scratch_loss = []
    t0 = time.time()
    for i, choice in enumerate(archs):
        payload = {"macro": choice["macro"], "micro": choice["micro"],
                   "config": CONFIG, "num_blocks": NUM_BLOCKS}
        out = train_fixed_subnet(
            payload,
            data_opts(train_batch_size=512, test_batch_size=8192),
            TrainOptions(
                learning_rate=0.12, max_train_steps=3000, test_interval=3000,
                display_interval=3000, max_eval_steps=24,
                test_only_at_last_step=True,
            ),
            log_fn=lambda s: None,
        )
        loss = out["logs"][0]["test_loss"][-1]
        scratch_loss.append(loss)
        print(f"SCRATCH {i + 1}/{N_ARCHS}: {loss:.5f}", flush=True)
    results["scratch_seconds"] = round(time.time() - t0, 1)

    # ---- 5. correlations -------------------------------------------------
    results["ws_loss"] = [round(x, 6) for x in ws_loss]
    results["scratch_loss"] = [round(x, 6) for x in scratch_loss]
    results["kendall_tau"] = round(kendall_tau(ws_loss, scratch_loss), 4)
    results["spearman_rho"] = round(spearman_rho(ws_loss, scratch_loss), 4)
    # Retrieval quality at the top: does WS-top-25% contain scratch-best?
    k = max(1, N_ARCHS // 4)
    ws_top = set(np.argsort(ws_loss)[:k].tolist())
    sc_top = set(np.argsort(scratch_loss)[:k].tolist())
    results["top_quartile_overlap"] = len(ws_top & sc_top) / k

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "rank_correlation_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
