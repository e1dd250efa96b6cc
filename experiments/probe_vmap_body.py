"""Fused transformer body under vmap: xla vs pallas in the EA evaluator.

Round 3 routed the fused body kernel (ops/kernels/transformer_body_pallas.py)
to the two training CLIs but explicitly kept XLA for the vmapped search
evaluators without a measurement.  The EA evaluator IS the search hot loop
(measured 2.43 s/candidate, probe_stale_rows.py), so this probe decides with
numbers: vmapped final-only fine-tune of a group of 8 at the canonical
search scale (bs 512 ft / 1024 eval, capped 0.5M tables, xlarge 7 blocks),
identical streams, attention_impl xla vs pallas.

Also probes the WHOLE-net fine-tune mode (each candidate owns a full param
copy) at group 4, since its per-step cost profile differs.

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_vmap_body.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB, SEARCH_MAX_NUM_EMBEDDINGS
from nasrec_tpu.models import SuperNetConfig, supernet_init
from nasrec_tpu.search import Tokenizer
from nasrec_tpu.search.worker import make_candidate_evaluator

spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(SEARCH_MAX_NUM_EMBEDDINGS)
space = OPS_CONFIG_LIB["xlarge"]
rng = np.random.RandomState(0)
FT_STEPS, EVAL_BATCHES = 200, 20


def draw(batch):
    cols = [rng.randint(0, v, size=batch) for v in vocab]
    return (
        jnp.asarray(rng.randn(batch, spec.num_dense).astype(np.float32)),
        jnp.asarray(np.stack(cols, 1).astype(np.int32)),
        jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32)),
    )


ft_batches = [draw(512) for _ in range(8)]
ev_batches = [draw(1024) for _ in range(4)]


def train_iter_fn():
    for i in range(FT_STEPS):
        yield ft_batches[i % len(ft_batches)]


def test_iter_fn():
    for i in range(EVAL_BATCHES):
        yield ev_batches[i % len(ev_batches)]


tok = Tokenizer(7, space, seed=1)

for mode, group in (("final-only", 8), ("whole", 4)):
    choices = [tok.generate_random_choice() for _ in range(group)]
    row = {}
    for impl in ("xla", "pallas"):
        cfg = SuperNetConfig(
            space=space, num_blocks=7, num_dense=spec.num_dense,
            num_sparse=spec.num_sparse, vocab_sizes=vocab,
            use_layernorm=True, attention_impl=impl,
        )
        params = supernet_init(jax.random.PRNGKey(0), cfg)
        ev = make_candidate_evaluator(
            cfg, params, learning_rate=0.04, max_train_steps=FT_STEPS,
            max_eval_steps=EVAL_BATCHES, finetune_mode=mode,
        )
        res = ev(choices, train_iter_fn, test_iter_fn)   # compile warmup
        t0 = time.perf_counter()
        res = ev(choices, train_iter_fn, test_iter_fn)
        dt = time.perf_counter() - t0
        assert all(np.isfinite(r["test_loss"]) for r in res)
        row[impl] = (dt, [round(r["test_loss"], 5) for r in res])
        print(f"{mode} group={group} impl={impl}: {dt:.2f} s wall "
              f"= {dt / group:.3f} s/candidate", flush=True)
        del params, ev
    lx, lp = row["xla"][1], row["pallas"][1]
    drift = max(abs(a - b) for a, b in zip(lx, lp))
    print(f"{mode}: losses max|xla-pallas| = {drift:.5f}; "
          f"speedup xla/pallas = {row['xla'][0] / row['pallas'][0]:.2f}x",
          flush=True)
