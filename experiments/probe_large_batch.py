"""Large-batch flagship step in a FRESH process per config.

probe_flat_micro.py ran all (batch, micro) configs in one loop, keeping the
previous config's packed table+accumulator (4.3 GB) alive while building
the next — its 65536 "OOM" was probe-induced, not a framework limit.
Run: python experiments/probe_large_batch.py <batch> <micro>
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

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

batch, micro = int(sys.argv[1]), int(sys.argv[2])
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

state = pack_state_for_sweep(init_train_state(fixed_init(jax.random.PRNGKey(0), plan), opt))
step = make_sparse_embedding_train_step(
    lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
    opt, sched, table_offsets(vocab), grad_clip=5.0,
    microbatch=micro, table_update="sweep",
)
dense = jnp.asarray(rng.randn(batch, spec.num_dense).astype(np.float32))
cat = jnp.asarray(
    np.stack([rng.randint(0, v, size=batch) for v in vocab], 1).astype(np.int32)
)
y = jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32))

def run_k(k):
    global state
    for _ in range(k):
        state, m = step(state, dense, cat, y)
    jax.device_get(m["loss"])


run_k(3)  # compile + post-compile warmup (sorts autotune on first calls)
dt = chained_rate(run_k, 3, 9)
print(f"batch={batch} micro={micro}: {dt*1e3:.1f} ms, {batch/dt/1e3:.1f}k ex/s")
