"""Batch-scaling attribution for the flagship step (fresh process per batch).

Round 2 measured 65536 one-shot SLOWER per example than 32768 (193.8k vs
204.8k ex/s) without attribution.  This probe times the full step AND its
separable components at one batch size so the scaling table in
EXPERIMENTS.md §3 can name the regressing term:

  - full train step (sweep update, pallas attention)
  - packed super-row gather (forward lookup)
  - slotwise segment-sum prep (sort + permute + cumsum)
  - sweep table update alone (sorted payload prebuilt)

Run: PYTHONPATH=/root/.axon_site:/root/repo \\
       python experiments/probe_batch_scaling.py <batch> [micro]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.ops.kernels import table_sweep_pallas as tsp
from nasrec_tpu.profiling import chained_rate
from nasrec_tpu.train import make_optimizer
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.optim import make_lr_schedule
from nasrec_tpu.train.sparse_embedding import (
    make_sparse_embedding_train_step,
    pack_state_for_sweep,
    rowwise_segment_sum_slotwise,
)

batch = int(sys.argv[1])
micro = int(sys.argv[2]) if len(sys.argv) > 2 else 1
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
offsets = np.asarray(table_offsets(vocab), np.int32)
rng = np.random.RandomState(0)
cat_np = np.stack(
    [rng.randint(0, v, size=batch) for v in vocab], 1
).astype(np.int32)
idx2d = jnp.asarray(cat_np + offsets[None, :])
n = batch * spec.num_sparse
g = jnp.asarray(rng.randn(n, 16).astype(np.float32) * 0.01)


def timeit(name, run_k, k=(3, 9)):
    run_k(2)
    dt = chained_rate(run_k, *k)
    print(f"{name:<28}: {dt*1e3:8.2f} ms", flush=True)
    return dt


# --- components --------------------------------------------------------------
tpad = tsp.sweep_padded_rows(int(sum(vocab)))
table_p = jax.random.normal(jax.random.PRNGKey(0),
                            (tpad // tsp.GROUP, tsp.LANES), jnp.float32)

lookup = jax.jit(tsp.packed_lookup)


def run_gather(k):
    r = None
    for _ in range(k):
        r = lookup(table_p, idx2d.reshape(-1))
    jax.device_get(r[0, 0])


timeit("packed gather fwd", run_gather)

prep = jax.jit(rowwise_segment_sum_slotwise)


def run_prep(k):
    r = None
    gg = g
    for _ in range(k):
        r, s, e = prep(idx2d, gg)
        gg = s
    jax.device_get(r[0])


timeit("slotwise prep", run_prep)

rows, seg16, _ = jax.block_until_ready(prep(idx2d, g))
acc_p = jnp.abs(jax.random.normal(jax.random.PRNGKey(1),
                                  table_p.shape, jnp.float32))
box = {"t": table_p, "a": acc_p}


def run_sweep(k):
    t, a = box["t"], box["a"]
    for _ in range(k):
        t, a = tsp.sweep_adagrad_update(t, a, rows, seg16, 0.01)
    box["t"], box["a"] = t, a
    jax.device_get(t[0, 0])


timeit("sweep update", run_sweep)
del box, table_p, acc_p, rows, seg16, g

# --- full step ----------------------------------------------------------------
choice = get_best_arch("criteo-kaggle", "xlarge")
plan = build_fixed_plan(
    choice, OPS_CONFIG_LIB["xlarge"], 7, spec.num_dense, spec.num_sparse,
    vocab, use_layernorm=False, attention_impl="pallas",
)
opt = make_optimizer("adagrad")
state = pack_state_for_sweep(
    init_train_state(fixed_init(jax.random.PRNGKey(0), plan), opt)
)
step = make_sparse_embedding_train_step(
    lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
    opt, make_lr_schedule("cosine", 0.16, 10_000, 1_000),
    table_offsets(vocab), grad_clip=5.0,
    microbatch=micro, table_update="sweep",
)
dense = jnp.asarray(rng.randn(batch, spec.num_dense).astype(np.float32))
cat = jnp.asarray(cat_np)
y = jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32))
sbox = {"s": state}


def run_step(k):
    st = sbox["s"]
    for _ in range(k):
        st, m = step(st, dense, cat, y)
    sbox["s"] = st
    jax.device_get(m["loss"])


dt = timeit(f"full step (micro={micro})", run_step)
print(f"batch={batch} micro={micro}: {batch/dt/1e3:.1f}k ex/s", flush=True)
