"""Validate bench timing: does the measured rate hold at 10x steps, and with
full final-state materialization? Also hand-count model flops vs XLA cost."""
import time
import numpy as np, jax, jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.train import make_optimizer
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.optim import make_lr_schedule
from nasrec_tpu.train.sparse_embedding import make_sparse_embedding_train_step

batch = 32768
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
choice = get_best_arch("criteo-kaggle", "xlarge")
plan = build_fixed_plan(choice, OPS_CONFIG_LIB["xlarge"], 7, spec.num_dense,
                        spec.num_sparse, vocab, use_layernorm=False,
                        attention_impl="pallas")
params = fixed_init(jax.random.PRNGKey(0), plan)
opt = make_optimizer("adagrad")
state = init_train_state(params, opt)
sched = make_lr_schedule("cosine", 0.16, 10_000, 1_000)
step = make_sparse_embedding_train_step(
    lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
    opt, sched, table_offsets(vocab), grad_clip=5.0)

rng = np.random.RandomState(0)
def draw():
    cols = [rng.randint(0, v, size=batch) for v in vocab]
    return (jnp.asarray(rng.randn(batch, spec.num_dense).astype(np.float32)),
            jnp.asarray(np.stack(cols, 1).astype(np.int32)),
            jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32)))
batches = [draw() for _ in range(4)]

for i in range(10):
    state, m = step(state, *batches[i % 4])
jax.block_until_ready(m["loss"])

for nsteps in (100, 300, 1000):
    t0 = time.perf_counter()
    for i in range(nsteps):
        state, m = step(state, *batches[i % 4])
    # force FULL final state (incl. table) to materialize
    jax.block_until_ready(state.params["embedding"]["table"])
    dt = time.perf_counter() - t0
    print(f"steps={nsteps}: {dt*1e3:.1f} ms total, {dt/nsteps*1e3:.3f} ms/step, "
          f"{batch*nsteps/dt/1e6:.1f} M ex/s", flush=True)

# independent single-step timing: sync before and after one call
jax.block_until_ready(state)
t0 = time.perf_counter()
state, m = step(state, *batches[0])
jax.block_until_ready(state.params["embedding"]["table"])
print(f"single fully-synced step: {(time.perf_counter()-t0)*1e3:.2f} ms")
