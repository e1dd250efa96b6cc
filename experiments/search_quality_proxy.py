"""Search-quality proxy on planted structure (round 5; VERDICT r4 item 8).

Question: does the EA — supernet weight-sharing, final-only fine-tune
scoring, regularized evolution — reliably rank INTERACTION-BEARING
architectures above interaction-free ones on a task whose labels are
dominated by planted second-order structure?  This is the synthetic
stand-in for "search finds real signal" (ref:
/root/reference/nasrec/eval_subnet_from_supernet.py:71-207), decoupled
from the from-scratch rank-correlation question (EXPERIMENTS.md §2c/2d):
here the target property is STRUCTURAL (can the arch express products of
embeddings at all), not a noisy scalar.

"Interaction-bearing" is decided by exact taint propagation over the
choice's channel graph (mirrors models/fixed.py:298-371 block wiring):
second-order-in-embeddings signal is EMITTED by an active dot-product
node (pairwise dots of [dense | sparse-embedding] slots) or by deep_fm
(FM over the block's sparse output); it PROPAGATES through linear-2d /
linear-3d / the ds-interact concat; the arch is bearing iff tainted
signal reaches a head-consumed channel (last block's dense or sparse
output).  Note ds-interact alone does NOT emit: it concats a linear
projection of dense as pseudo-slots (interaction only arises when a
downstream dot-product/FM consumes them).

Protocol (xlarge-zeros space, 2 blocks — chosen by measured base rate:
random archs are interaction-bearing 79% of the time there, vs 97% in
autoctr-3/xlarge-3 where no interaction-free class exists to rank
against; task = the §2d calibrated spec: vocab 500, 16 planted
latent-factor pairs at interaction_scale 1.0 over signal_scale 0.7 mains):
  1. train a supernet 6,000 steps (canonical default/binomial-0.5);
  2. regularized EA over the checkpoint (24 init + 15 gens x 8 children,
     final-only 200-step fine-tune on FRESH data, vmapped groups of 8);
  3. report: bearing base rate (500 tokenizer draws), bearing fraction of
     init pop / all explored / WS top-quartile / EA top-8, the
     bearing-vs-free AUC of WS scores, mean WS loss per class, and the
     per-generation bearing fraction of EA children (selection pressure).

Run (on-TPU): PYTHONPATH=/root/.axon_site:/root/repo \
    python experiments/search_quality_proxy.py
Writes experiments/search_quality_proxy_results.json.
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

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "search_quality_proxy")
SPEC = SyntheticSpec(vocab=500, signal_scale=0.7,
                     interaction_pairs=16, interaction_scale=1.0)
CONFIG = "xlarge-zeros"   # bearing base rate 0.79 at 2 blocks (autoctr-3
NUM_BLOCKS = 2            # is 0.97 — no interaction-free class to rank)
SUPERNET_STEPS = 6000


def interaction_bearing(choice, num_blocks=NUM_BLOCKS, space=None):
    """True iff second-order-in-embeddings signal reaches the head.

    Exact taint propagation over virtual-block channels; wiring mirrors
    models/fixed.py:_make_block_fn (dense_out = sum of linear-2d /
    dot-product [+ deep_fm(sparse_out_pre)]; sparse_out = sum of
    linear-3d [concat ds-proj(dense_out) if interact]; head consumes the
    LAST block's dense and sparse channels, last_n_blocks_out=1).
    """
    space = space or OPS_CONFIG_LIB[CONFIG]
    names = space.node_names
    # channel state per virtual block: (exists, tainted)
    dense = [(True, False)] + [None] * num_blocks
    sparse = [(True, False)] + [None] * num_blocks
    for b in range(num_blocks):
        m, mi = choice["macro"][b], choice["micro"][b]
        active = {names[int(k)] for k in mi["active_nodes"]}
        d_ex = any(dense[int(j)][0] for j in m["dense_idx"])
        d_tn = any(dense[int(j)][1] for j in m["dense_idx"])
        s_ex = any(sparse[int(j)][0] for j in m["sparse_idx"])
        s_tn = any(sparse[int(j)][1] for j in m["sparse_idx"])
        l_tn = any(dense[int(j)][1] for j in m["dense_left_idx"])
        r_tn = any(dense[int(j)][1] for j in m["dense_right_idx"])

        do_ex, do_tn = False, False
        if "linear-2d" in active and d_ex:
            do_ex, do_tn = True, do_tn or d_tn
        if "dot-product" in active and (d_ex or s_ex):
            do_ex = True
            # pairwise dots: EMITS if >=2 slots carry embedding-derived
            # content (s_ex covers it; dense-alone is a single slot).
            do_tn = do_tn or d_tn or s_tn or s_ex
        if "sum" in active or "sigmoid-gating" in active:
            do_ex, do_tn = True, do_tn or l_tn or r_tn
        so_ex, so_tn = False, False
        if "linear-3d" in active and s_ex:
            so_ex, so_tn = True, s_tn
        if "transformer" in active and s_ex:
            # self-attention: softmax(q k^T) v — products of embeddings.
            so_ex, so_tn = True, True
        if int(mi["deep_fm"]) and so_ex:
            # FM over this block's (pre-concat) sparse output: emitter.
            do_ex, do_tn = True, True
        if int(mi["dense_sparse_interact"]) and (so_ex or do_ex):
            so_ex, so_tn = True, so_tn or do_tn
        dense[b + 1] = (do_ex, do_tn)
        sparse[b + 1] = (so_ex, so_tn)
    return bool(dense[num_blocks][1] or sparse[num_blocks][1])


def patched_iterators(train_seed):
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


def data_opts(**kw):
    from nasrec_tpu.workloads import DataOptions

    return DataOptions(
        dataset="criteo-kaggle", data_source="synthetic",
        synthetic_train_examples=1_000_000, synthetic_test_examples=200_000,
        synthetic_vocab=SPEC.vocab,
        **kw,
    )


def auc(scores_pos, scores_neg):
    """P(bearing scores LOWER loss than free), ties 0.5."""
    wins = 0.0
    for a in scores_pos:
        for b in scores_neg:
            wins += 1.0 if a < b else (0.5 if a == b else 0.0)
    return wins / (len(scores_pos) * len(scores_neg))


def main():
    from nasrec_tpu.workloads import (
        SearchOptions, SupernetOptions, TrainOptions,
        search_from_supernet, train_supernet,
    )
    import nasrec_tpu.workloads as W
    from nasrec_tpu.search.evolution import Searcher  # noqa: F401 (doc link)

    os.makedirs(OUT_DIR, exist_ok=True)
    results = {
        "config": CONFIG, "num_blocks": NUM_BLOCKS,
        "supernet_steps": SUPERNET_STEPS,
        "spec": {"vocab": SPEC.vocab, "signal_scale": SPEC.signal_scale,
                 "interaction_pairs": SPEC.interaction_pairs,
                 "interaction_scale": SPEC.interaction_scale},
    }

    # Base rate over the space (pure tokenizer prior).
    tok = Tokenizer(NUM_BLOCKS, OPS_CONFIG_LIB[CONFIG], seed=123)
    base = [interaction_bearing(tok.generate_random_choice())
            for _ in range(500)]
    results["base_rate_random"] = round(float(np.mean(base)), 4)
    print(f"base rate (500 draws): {results['base_rate_random']}", flush=True)

    # 1. supernet.
    ckpt = os.path.join(OUT_DIR, "supernet_checkpoint.pkl")
    if not os.path.exists(ckpt):
        patched_iterators(train_seed=0)
        t0 = time.time()
        train_supernet(
            SupernetOptions(
                config=CONFIG, num_blocks=NUM_BLOCKS, use_layernorm=True,
                strategy="default", anypath_choice="binomial-0.5",
                supernet_training_steps=SUPERNET_STEPS // 4,
            ),
            data_opts(train_batch_size=512, test_batch_size=8192),
            TrainOptions(
                learning_rate=0.12, max_train_steps=SUPERNET_STEPS,
                test_interval=SUPERNET_STEPS, display_interval=2000,
                max_eval_steps=12, logging_dir=OUT_DIR,
            ),
        )
        results["supernet_seconds"] = round(time.time() - t0, 1)
        print(f"supernet trained in {results['supernet_seconds']}s", flush=True)

    # 2. EA over the checkpoint; fine-tune on FRESH data (§2c control).
    patched_iterators(train_seed=303)
    so = SearchOptions(
        config=CONFIG, num_blocks=NUM_BLOCKS, ckpt_path=ckpt,
        learning_rate=0.04, max_train_steps=200, max_eval_steps=24,
        group_size=8, seed=11, method="regularized-ea",
        n_generations=15, n_childs=8, init_population=24, sample_size=8,
        ea_top_k=8,
    )
    t0 = time.time()
    # search_from_supernet discards the Searcher; re-create its internals
    # here to keep all_results (per-candidate order = init pop then
    # generation-by-generation children).
    top = search_from_supernet(
        so, data_opts(train_batch_size=512, test_batch_size=4096),
        logging_dir=OUT_DIR,
    )
    results["ea_seconds"] = round(time.time() - t0, 1)
    import pickle
    with open(os.path.join(OUT_DIR, "all_results.pickle"), "rb") as f:
        allr = pickle.load(f)
    results["n_explored"] = len(allr)

    flags = [interaction_bearing(r["choice"]) for r in allr]
    losses = [float(r["test_loss"]) for r in allr]
    init_flags = flags[:so.init_population]
    results["bearing_frac_init"] = round(float(np.mean(init_flags)), 4)
    results["bearing_frac_explored"] = round(float(np.mean(flags)), 4)

    order = np.argsort(losses)
    k = max(1, len(allr) // 4)
    results["bearing_frac_ws_top_quartile"] = round(
        float(np.mean([flags[i] for i in order[:k]])), 4)
    results["bearing_frac_ea_top8"] = round(
        float(np.mean([interaction_bearing(r["choice"]) for r in top])), 4)

    pos = [l for l, f in zip(losses, flags) if f]
    neg = [l for l, f in zip(losses, flags) if not f]
    results["n_bearing"], results["n_free"] = len(pos), len(neg)
    if pos and neg:
        results["ws_auc_bearing_vs_free"] = round(auc(pos, neg), 4)
        results["mean_ws_loss_bearing"] = round(float(np.mean(pos)), 5)
        results["mean_ws_loss_free"] = round(float(np.mean(neg)), 5)

    # Selection pressure: bearing fraction of children per generation.
    gen_frac = []
    for g in range(so.n_generations):
        s = so.init_population + g * so.n_childs
        chunk = flags[s:s + so.n_childs]
        if chunk:
            gen_frac.append(round(float(np.mean(chunk)), 3))
    results["bearing_frac_per_generation"] = gen_frac

    out_path = os.path.join(HERE, "search_quality_proxy_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
