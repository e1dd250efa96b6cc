"""Calibrate rank_correlation_v5's synthetic task so the target CAN rank.

The first v5 launch (this round) exposed the planned spec
(vocab=2000, signal_scale=0.3, pairs=32, interaction_scale=4.0) as
unlearnable in the scratch budget: std(inter)=8.5 saturates the labels, a
mains-only predictor scores 0.716 (WORSE than 0.693 chance), and all 24
archs sat at chance after 4000 steps — self-tau would gate the trial to
"cannot rank itself".  Host-side signal decomposition of candidate specs
(binary-entropy Bayes floor + mains-only reference):

  vocab=2000 ss=0.3 pairs=32 is=4.0: bayes=0.153 mains_only=0.716  (orig)
  vocab=500  ss=0.7 pairs=16 is=1.0: bayes=0.420 mains_only=0.643
  vocab=200  ss=0.7 pairs=16 is=1.0: bayes=0.419 mains_only=0.643

This probe trains the trial's FIRST 6 tokenizer archs (seed 7 — the same
stream v5 uses) for the scratch budget on candidate specs and reports the
achieved losses: we need (a) learning well below mains-only and (b) spread
across archs.  Run:
PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_v5_calibration.py
"""
import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import rank_correlation_v5 as v5
from nasrec_tpu.data.synthetic import SyntheticSpec
from nasrec_tpu.config import OPS_CONFIG_LIB
from nasrec_tpu.search import Tokenizer

CANDS = [
    SyntheticSpec(vocab=500, signal_scale=0.7, interaction_pairs=16,
                  interaction_scale=1.0),
    SyntheticSpec(vocab=200, signal_scale=0.7, interaction_pairs=16,
                  interaction_scale=1.0),
]
N_PROBE = 6

tok = Tokenizer(v5.NUM_BLOCKS, OPS_CONFIG_LIB[v5.CONFIG], seed=7)
archs, seen = [], set()
while len(archs) < N_PROBE:
    c = tok.generate_random_choice()
    key = json.dumps(c, sort_keys=True, default=str)
    if key not in seen:
        seen.add(key)
        archs.append(c)

for spec in CANDS:
    v5.SPEC = spec
    v5.patched_iterators(train_seed=50)
    losses = []
    t0 = time.time()
    for i, c in enumerate(archs):
        losses.append(v5.scratch_loss_of(c, 0))
        print(f"spec(vocab={spec.vocab},ss={spec.signal_scale},"
              f"is={spec.interaction_scale}) arch {i}: {losses[-1]:.5f}",
              flush=True)
    print(f"  -> mean={np.mean(losses):.5f} std={np.std(losses):.5f} "
          f"range=[{min(losses):.5f},{max(losses):.5f}] "
          f"({time.time()-t0:.0f}s)", flush=True)
