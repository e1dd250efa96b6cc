"""Measure the Pallas sweep kernel + full packed step on the real chip at
bench scale (full Criteo vocab, batch 32768)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.ops.kernels.embedding_sweep_pallas import (
    aggregate_updates, packed_rows, sweep_adagrad_update,
)
from nasrec_tpu.train import make_optimizer
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.optim import make_lr_schedule
from nasrec_tpu.train.packed_embedding import (
    make_packed_sparse_train_step, pack_embedding_params,
)

batch = 32768
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
T = sum(vocab)
TP = packed_rows(T)
N = batch * spec.num_sparse
rng = np.random.RandomState(0)

# --- kernel alone ---------------------------------------------------------
table_p = jnp.zeros((TP, 128), jnp.float32)
acc_p = jnp.zeros((TP, 128), jnp.float32)
idx = np.sort(rng.randint(0, T, size=N)).astype(np.int32)
g = jnp.asarray(rng.randn(N, 16).astype(np.float32))
rows_c, seg_c = jax.jit(lambda i, g: aggregate_updates(i, g, 1 << 30))(
    jnp.asarray(idx), g)
jax.block_until_ready(rows_c)

t0 = time.perf_counter()
new_t, new_a = sweep_adagrad_update(table_p, acc_p, rows_c, seg_c, 0.1)
jax.block_until_ready(new_t)
print(f"sweep kernel first(compile): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
n = 10
for _ in range(n):
    new_t, new_a = sweep_adagrad_update(new_t, new_a, rows_c, seg_c, 0.1)
_ = float(new_t.ravel()[0])
print(f"sweep kernel 851968 updates over [4.2M,128]x2: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)
del table_p, acc_p, new_t, new_a

# --- full packed train step ----------------------------------------------
choice = get_best_arch("criteo-kaggle", "xlarge")
plan = build_fixed_plan(choice, OPS_CONFIG_LIB["xlarge"], 7, spec.num_dense,
                        spec.num_sparse, vocab, use_layernorm=False,
                        attention_impl="pallas")
params = pack_embedding_params(fixed_init(jax.random.PRNGKey(0), plan))
opt = make_optimizer("adagrad")
state = init_train_state(params, opt)
sched = make_lr_schedule("cosine", 0.16, 10_000, 1_000)
step = make_packed_sparse_train_step(
    lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
    opt, sched, table_offsets(vocab), grad_clip=5.0)

batches = [(jnp.asarray(rng.randn(batch, spec.num_dense).astype(np.float32)),
            jnp.asarray(np.stack([rng.randint(0, v, size=batch) for v in vocab], 1).astype(np.int32)),
            jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32)))
           for _ in range(4)]
t0 = time.perf_counter()
for i in range(4):
    d, c, y = batches[i % 4]
    state, metrics = step(state, d, c, y)
_ = float(metrics["loss"])
print(f"packed step first(compile+4): {time.perf_counter()-t0:.1f}s", flush=True)
for trial in range(3):
    t0 = time.perf_counter()
    for i in range(50):
        d, c, y = batches[i % 4]
        state, metrics = step(state, d, c, y)
    v = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / 50
    print(f"packed full step: {dt*1e3:.2f} ms -> {batch/dt/1e3:.0f}k ex/s (loss {v:.4f})", flush=True)
print("DONE", flush=True)
