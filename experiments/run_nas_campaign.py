"""Full NAS campaign demo on one TPU chip (synthetic CTR with planted
second-order interactions):

  1. one-shot supernet training (canonical strategy/hyperparams, scaled down)
  2. regularized EA over the trained supernet (vmapped candidate groups)
  3. retrain EA-discovered archs from scratch vs random-arch baselines

Writes results to experiments/nas_campaign_results.json.
Run: python experiments/run_nas_campaign.py  (on the TPU host; ~15-25 min)
"""

import json
import os
import time

import numpy as np

from nasrec_tpu.config import OPS_CONFIG_LIB
from nasrec_tpu.data.synthetic import SyntheticSpec
from nasrec_tpu.search import Tokenizer
from nasrec_tpu.workloads import (
    DataOptions,
    SearchOptions,
    SupernetOptions,
    TrainOptions,
    search_from_supernet,
    train_fixed_subnet,
    train_supernet,
)

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "campaign")
SPEC = SyntheticSpec(vocab=1000, signal_scale=1.0,
                     interaction_pairs=16, interaction_scale=2.0)


def patched_data(**kw):
    data = DataOptions(
        dataset="criteo-kaggle", data_source="synthetic",
        synthetic_train_examples=1_000_000, synthetic_test_examples=200_000,
        **kw,
    )
    return data


def main():
    # Route the campaign's synthetic spec through the workloads.
    import nasrec_tpu.workloads as W

    orig = W._make_iterators

    def make_iters(data):
        from nasrec_tpu.data.synthetic import synthetic_batches

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
    os.makedirs(OUT_DIR, exist_ok=True)
    results = {"spec": {"vocab": SPEC.vocab, "interaction_pairs": SPEC.interaction_pairs}}

    # ---- 1. Supernet one-shot training ------------------------------------
    t0 = time.time()
    sn_out = train_supernet(
        SupernetOptions(
            config="xlarge", num_blocks=7, use_layernorm=True,
            strategy="default", anypath_choice="binomial-0.5",
            supernet_training_steps=1500,
        ),
        patched_data(train_batch_size=512, test_batch_size=8192),
        TrainOptions(
            learning_rate=0.12, max_train_steps=6000, test_interval=6000,
            display_interval=1000, max_eval_steps=12,
            logging_dir=os.path.join(OUT_DIR, "supernet"),
        ),
    )
    results["supernet"] = {
        "steps": 6000,
        "final_eval_auroc": sn_out["logs"][0]["test_AUROC"][-1],
        "final_eval_loss": sn_out["logs"][0]["test_loss"][-1],
        "seconds": round(time.time() - t0, 1),
    }
    print("SUPERNET:", results["supernet"], flush=True)

    # ---- 2. Regularized EA over the supernet -------------------------------
    t0 = time.time()
    ea = search_from_supernet(
        SearchOptions(
            method="regularized-ea", config="xlarge", num_blocks=7,
            ckpt_path=os.path.join(OUT_DIR, "supernet", "supernet_checkpoint.pkl"),
            learning_rate=0.04, max_train_steps=200, max_eval_steps=24,
            n_generations=15, n_childs=8, init_population=32, sample_size=16,
            ea_top_k=2, group_size=8, seed=0,
        ),
        patched_data(train_batch_size=512, test_batch_size=4096),
        logging_dir=os.path.join(OUT_DIR, "ea"),
    )
    best = sorted(ea, key=lambda r: r["test_loss"])
    results["ea"] = {
        "evaluated": 32 + 15 * 8,
        "best_ws_loss": best[0]["test_loss"],
        "best_ws_auroc": best[0]["test_auroc"],
        "seconds": round(time.time() - t0, 1),
    }
    print("EA:", results["ea"], flush=True)

    # ---- 3. Retrain discovered vs random archs from scratch -----------------
    def retrain(choice, tag):
        payload = {"macro": choice["macro"], "micro": choice["micro"],
                   "config": "xlarge", "num_blocks": 7}
        out = train_fixed_subnet(
            payload,
            patched_data(train_batch_size=512, test_batch_size=8192),
            TrainOptions(
                learning_rate=0.12, max_train_steps=3000, test_interval=3000,
                display_interval=1000, max_eval_steps=24,
                test_only_at_last_step=True,
            ),
            log_fn=lambda s: None,
        )
        logs = out["logs"][0]
        r = {"tag": tag, "test_loss": logs["test_loss"][-1],
             "test_auroc": logs["test_AUROC"][-1]}
        print("RETRAIN", r, flush=True)
        return r

    t0 = time.time()
    retrained = [retrain(best[i]["choice"], f"ea_top{i + 1}") for i in range(2)]
    tok = Tokenizer(7, OPS_CONFIG_LIB["xlarge"], seed=123)
    retrained += [retrain(tok.generate_random_choice(), f"random{i}") for i in range(2)]
    results["retrained"] = retrained
    results["retrain_seconds"] = round(time.time() - t0, 1)

    ea_best = min(r["test_loss"] for r in retrained if r["tag"].startswith("ea"))
    rnd_best = min(r["test_loss"] for r in retrained if r["tag"].startswith("random"))
    results["ea_beats_random"] = bool(ea_best <= rnd_best)

    with open(os.path.join(OUT_DIR, "..", "nas_campaign_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    W._make_iterators = orig


if __name__ == "__main__":
    main()
