"""Probe: step time of the flagship full-vocab train step across
(batch, micro_batches) now that sparse activations are flat [B, S*E].

Round-2 context: with the lane-padded [B, S, 16] layout, batch 32768 needed
micro_batches=2 to fit HBM and 65536 OOM'd outright (STATUS gaps 1-2).
Run: python experiments/probe_flat_micro.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.profiling import chained_rate
from nasrec_tpu.train import make_optimizer
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.optim import make_lr_schedule
from nasrec_tpu.train.sparse_embedding import (
    make_sparse_embedding_train_step,
    pack_state_for_sweep,
)

spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
choice = get_best_arch("criteo-kaggle", "xlarge")
plan = build_fixed_plan(
    choice, OPS_CONFIG_LIB["xlarge"], 7, spec.num_dense, spec.num_sparse,
    vocab, use_layernorm=False, attention_impl="pallas",
)
opt = make_optimizer("adagrad")
sched = make_lr_schedule("cosine", 0.16, 10_000, 1_000)
rng = np.random.RandomState(0)


def draw(batch):
    cols = [rng.randint(0, v, size=batch) for v in vocab]
    return (
        jnp.asarray(rng.randn(batch, spec.num_dense).astype(np.float32)),
        jnp.asarray(np.stack(cols, axis=1).astype(np.int32)),
        jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32)),
    )


for batch, micro in [(32768, 1), (32768, 2), (65536, 1), (65536, 2), (131072, 2), (131072, 4)]:
    try:
        params = fixed_init(jax.random.PRNGKey(0), plan)
        state = pack_state_for_sweep(init_train_state(params, opt))
        step = make_sparse_embedding_train_step(
            lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
            opt, sched, table_offsets(vocab), grad_clip=5.0,
            table_update="sweep", microbatch=micro,
        )
        batches = [draw(batch) for _ in range(2)]
        box = {"state": state}

        def run_k(k):
            st = box["state"]
            for i in range(k):
                d, c, y = batches[i % 2]
                st, m = step(st, d, c, y)
            box["state"] = st
            jax.device_get(m["loss"])

        run_k(6)
        step_s = chained_rate(run_k, 10, 40)
        print(f"batch={batch} micro={micro}: {step_s * 1e3:.1f} ms, "
              f"{batch / step_s / 1e3:.1f}k ex/s", flush=True)
        del state, step, batches, box
    except Exception as e:
        print(f"batch={batch} micro={micro}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
