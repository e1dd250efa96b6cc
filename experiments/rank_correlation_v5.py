"""Rank correlation §2d: a FAIR trial of the one-shot premise.

The v1-v4 arc (EXPERIMENTS.md §2c) falsified the weight-sharing premise at
miniature scale — but on a test bed that could not have validated it: the
from-scratch target's self-reliability was only tau = 0.33 (two seeds of
the same archs barely agreed) and the xlarge space reached statistically
identical quality on the planted task (no spread to rank).  Round-3 judge
directive: first build a task + space where the target CAN rank itself
(self-tau >= ~0.7), then re-run the protocol at 2 supernet budgets.

Design changes vs v1-v4:
  - autoctr space, 3 blocks: the 3-node space (linear-2d / dot-product /
    linear-3d) with dims 16..1024 makes capacity and the PRESENCE of the
    interaction op load-bearing; fewer blocks = fewer redundant paths.
  - interaction-DOMINATED task: main effects scaled DOWN (0.3), 32 planted
    latent-factor pairs scaled UP (4.0), vocab 2000 — an arch that cannot
    express second-order structure cannot fit the labels.
  - reliable target: every arch trained from scratch TWICE (different
    init+data seeds), 4000 steps; target = seed-mean; self-tau reported
    and gating the interpretation.
  - WS fine-tune on FRESH data (seeds unseen by the supernet) — the v3/v4
    control that killed the train-pool memorization artifact.
  - 2 supernet budgets (6k / 24k steps) + a WS replica (different fresh
    fine-tune data) at the large budget.

Writes experiments/rank_correlation_v5_results.json.
Run: env -u PALLAS_AXON_POOL_IPS python experiments/rank_correlation_v5.py
(CPU by default — the study is 48+ DISTINCT tiny-model jit signatures, and on
the axon runtime each remote compile is 30-250 s (measured: ~11 min for the
first scratch cell), so the TPU run is compile-bound at ~5+ hours while CPU
compiles in seconds and the models are small enough that CPU step time does
not matter; rankings are framework-internal so CPU f32 numerics are fine.
Pass --tpu to keep the ambient backend.)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--tpu" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

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
from rank_correlation import kendall_tau, spearman_rho

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "rankcorr_v5")
# Spec CALIBRATED by probe_v5_calibration.py (round 5): the originally
# planned (vocab=2000, ss=0.3, pairs=32, is=4.0) was unlearnable — all
# archs sat at chance (0.6927-0.6932 across the first 6 cells of the
# aborted run), exactly as the probe's host-side decomposition predicted
# (mains-only 0.716 > chance).  Of the probed learnable specs, vocab=500
# (mean 0.63515, std 6.1e-4, range 1.6e-3 over 6 archs) gives more
# arch-driven spread than vocab=200 (std 4.4e-4) while staying well below
# the mains-only floor 0.643.
SPEC = SyntheticSpec(vocab=500, signal_scale=0.7,
                     interaction_pairs=16, interaction_scale=1.0)
N_ARCHS = 24
NUM_BLOCKS = 3
CONFIG = "autoctr"
SCRATCH_STEPS = 4000
SUPERNET_BUDGETS = (6000, 24000)


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
    return DataOptions(
        dataset="criteo-kaggle", data_source="synthetic",
        synthetic_train_examples=1_000_000, synthetic_test_examples=200_000,
        # Tables must cover SPEC.vocab: fused-table offsets are cumulative,
        # so indices beyond the per-slot table size would silently land in
        # the NEXT slot's rows (caught in round 4 before the first v5 run).
        synthetic_vocab=SPEC.vocab,
        **kw,
    )


def scratch_loss_of(choice, seed):
    payload = {"macro": choice["macro"], "micro": choice["micro"],
               "config": CONFIG, "num_blocks": NUM_BLOCKS}
    out = train_fixed_subnet(
        payload,
        data_opts(train_batch_size=512, test_batch_size=8192),
        TrainOptions(
            learning_rate=0.12, max_train_steps=SCRATCH_STEPS,
            test_interval=SCRATCH_STEPS, display_interval=SCRATCH_STEPS,
            max_eval_steps=24, test_only_at_last_step=True, seed=seed,
        ),
        log_fn=lambda s: None,
    )
    return out["logs"][0]["test_loss"][-1]


def ws_rank(ckpt, ft_seed):
    from nasrec_tpu.workloads import evaluate_choices_from_supernet

    patched_iterators(train_seed=ft_seed)   # FRESH fine-tune pool
    res = evaluate_choices_from_supernet(
        ARCHS,
        SearchOptions(
            config=CONFIG, num_blocks=NUM_BLOCKS, ckpt_path=ckpt,
            learning_rate=0.04, max_train_steps=500, max_eval_steps=24,
            group_size=8, seed=0,
        ),
        data_opts(train_batch_size=512, test_batch_size=4096),
    )
    return [r["test_loss"] for r in res]


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    results = {
        "config": CONFIG, "num_blocks": NUM_BLOCKS, "n_archs": N_ARCHS,
        "scratch_steps": SCRATCH_STEPS,
        "spec": {"vocab": SPEC.vocab, "signal_scale": SPEC.signal_scale,
                 "interaction_pairs": SPEC.interaction_pairs,
                 "interaction_scale": SPEC.interaction_scale},
    }

    tok = Tokenizer(NUM_BLOCKS, OPS_CONFIG_LIB[CONFIG], seed=7)
    global ARCHS
    ARCHS, seen = [], set()
    while len(ARCHS) < N_ARCHS:
        c = tok.generate_random_choice()
        key = json.dumps(c, sort_keys=True, default=str)
        if key not in seen:
            seen.add(key)
            ARCHS.append(c)

    # ---- 1. from-scratch target + its self-reliability -------------------
    # Each (seed, arch) cell persists to OUT_DIR as it lands so an
    # interrupted run (tunnel wedge, timeout) resumes instead of redoing
    # ~2x24x4000 training steps.
    scratch = {}
    for seed in (0, 101):
        cell_path = os.path.join(OUT_DIR, f"scratch_seed{seed}.json")
        done = []
        if os.path.exists(cell_path):
            with open(cell_path) as f:
                done = json.load(f)
            print(f"SCRATCH seed{seed}: resuming at {len(done)}/{N_ARCHS}",
                  flush=True)
        patched_iterators(train_seed=seed + 50)   # distinct data AND init
        t0 = time.time()
        losses = list(done)
        for i, c in enumerate(ARCHS):
            if i < len(done):
                continue
            losses.append(scratch_loss_of(c, seed))
            with open(cell_path, "w") as f:
                json.dump(losses, f)
            print(f"SCRATCH seed{seed} {i+1}/{N_ARCHS}: {losses[-1]:.5f}",
                  flush=True)
        scratch[seed] = losses
        results[f"scratch_seconds_seed{seed}"] = round(time.time() - t0, 1)
    a, b = scratch[0], scratch[101]
    results["scratch_loss_seed0"] = [round(x, 6) for x in a]
    results["scratch_loss_seed101"] = [round(x, 6) for x in b]
    results["scratch_self_tau"] = round(kendall_tau(a, b), 4)
    results["scratch_self_rho"] = round(spearman_rho(a, b), 4)
    results["scratch_spread"] = round(float(np.std(np.mean([a, b], 0))), 5)
    target = np.mean([a, b], axis=0)
    print(f"TARGET self-tau={results['scratch_self_tau']} "
          f"spread(std)={results['scratch_spread']}", flush=True)

    # ---- 2. supernets at two budgets -------------------------------------
    for steps in SUPERNET_BUDGETS:
        ck_dir = os.path.join(OUT_DIR, f"supernet_{steps}")
        ckpt = os.path.join(ck_dir, "supernet_checkpoint.pkl")
        if not os.path.exists(ckpt):
            patched_iterators(train_seed=0)   # the supernet's train pool
            t0 = time.time()
            train_supernet(
                SupernetOptions(
                    config=CONFIG, num_blocks=NUM_BLOCKS, use_layernorm=True,
                    strategy="default", anypath_choice="binomial-0.5",
                    supernet_training_steps=steps // 4,
                ),
                data_opts(train_batch_size=512, test_batch_size=8192),
                TrainOptions(
                    learning_rate=0.12, max_train_steps=steps,
                    test_interval=steps, display_interval=2000,
                    max_eval_steps=12, logging_dir=ck_dir,
                ),
            )
            results[f"supernet{steps}_seconds"] = round(time.time() - t0, 1)
            print(f"SUPERNET {steps} trained", flush=True)

        ws = ws_rank(ckpt, ft_seed=303)
        results[f"ws{steps}_loss"] = [round(x, 6) for x in ws]
        results[f"ws{steps}_tau"] = round(kendall_tau(ws, target), 4)
        results[f"ws{steps}_rho"] = round(spearman_rho(ws, target), 4)
        k = max(1, N_ARCHS // 4)
        ws_top = set(np.argsort(ws)[:k].tolist())
        sc_top = set(np.argsort(target)[:k].tolist())
        results[f"ws{steps}_top_quartile_overlap"] = len(ws_top & sc_top) / k
        print(f"WS@{steps}: tau={results[f'ws{steps}_tau']} "
              f"rho={results[f'ws{steps}_rho']}", flush=True)

    # ---- 3. WS replica control (different fresh fine-tune data) ----------
    big = SUPERNET_BUDGETS[-1]
    ckpt = os.path.join(OUT_DIR, f"supernet_{big}", "supernet_checkpoint.pkl")
    ws2 = ws_rank(ckpt, ft_seed=404)
    results["ws_replica_tau"] = round(
        kendall_tau(results[f"ws{big}_loss"], ws2), 4
    )
    print(f"WS replica tau={results['ws_replica_tau']}", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "rank_correlation_v5_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
