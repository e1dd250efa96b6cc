"""Component-level timing of the flagship sparse train step with TRUE
barriers — finds where the 394 ms/step goes.  Each probe's jitted output is
reduced to a scalar inside the jit (temps stay execution-local, no OOM from
queued outputs); k dispatches + one device_get of the last scalar bounds all
of them (single-core in-order execution); two window sizes cancel the RTT."""
import functools
import numpy as np, jax, jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.profiling import chained_rate
from nasrec_tpu.train import make_optimizer
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.sparse_embedding import (
    make_sparse_embedding_train_step, rowwise_segment_sum,
)

batch = 32768
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
offsets = np.asarray(table_offsets(vocab), np.int32)
choice = get_best_arch("criteo-kaggle", "xlarge")
plan = build_fixed_plan(choice, OPS_CONFIG_LIB["xlarge"], 7, spec.num_dense,
                        spec.num_sparse, vocab, use_layernorm=False,
                        attention_impl="pallas")
params = fixed_init(jax.random.PRNGKey(0), plan)
table = params["embedding"]["table"]
print("table", table.shape, flush=True)

rng = np.random.RandomState(0)
cols = [rng.randint(0, v, size=batch) for v in vocab]
cat = jnp.asarray(np.stack(cols, 1).astype(np.int32))
dense = jnp.asarray(rng.randn(batch, spec.num_dense).astype(np.float32))
y = jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32))
idx = jax.jit(lambda c: (c + jnp.asarray(offsets)[None, :]).reshape(-1))(cat)
stem = jnp.asarray(np.asarray(jnp.take(table, idx, axis=0)).reshape(
    batch, spec.num_sparse, -1))
g_stem = jnp.asarray(rng.randn(batch * spec.num_sparse, 16).astype(np.float32))


def timeit(name, fn, *args, k=(3, 12)):
    def scalarized(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return functools.reduce(
            lambda x, y: x + y, [l.astype(jnp.float32).sum() for l in leaves]
        )
    jf = jax.jit(scalarized)
    jax.device_get(jf(*args))
    def run_k(kk):
        o = None
        for _ in range(kk):
            o = jf(*args)
        jax.device_get(o)
    dt = chained_rate(run_k, *k)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


timeit("gather unsorted 851k rows", lambda t, i: jnp.take(t, i, axis=0), table, idx)
idx_sorted = jnp.sort(idx)
timeit("gather sorted 851k rows", lambda t, i: jnp.take(t, i, axis=0), table, idx_sorted)
timeit("argsort 851k int32", lambda i: jnp.argsort(i), idx)
timeit("sort 851k int32", lambda i: jnp.sort(i), idx)
timeit("rowwise_segment_sum", lambda i, g: rowwise_segment_sum(i, g), idx, g_stem)

r, seg, is_end = jax.jit(rowwise_segment_sum)(idx, g_stem)
tgt = jax.jit(lambda e, rr: jnp.where(e, rr, table.shape[0]))(is_end, r)
timeit("scatter-add 851k unique drop",
       lambda t, tg, s: t.at[tg].add(s, mode="drop", unique_indices=True),
       table, tgt, seg)
timeit("forward embedded",
       lambda p, d, s: fixed_apply_embedded(plan, p, d, s), params, dense, stem)

def fwdbwd(p, d, s, yy):
    rest = {k2: v for k2, v in p.items() if k2 != "embedding"}
    def loss(rp, si):
        lg = fixed_apply_embedded(plan, {**rp, "embedding": {}}, d, si)
        return jnp.mean(jnp.maximum(lg, 0) - lg * yy + jnp.log1p(jnp.exp(-jnp.abs(lg))))
    l, g = jax.value_and_grad(loss, argnums=(0, 1))(rest, s)
    return (l, g)
timeit("fwd+bwd embedded", fwdbwd, params, dense, stem, y)

opt = make_optimizer("adagrad")
state = init_train_state(params, opt)
sched = lambda s: jnp.asarray(0.1)
step = make_sparse_embedding_train_step(
    lambda p, d, s: fixed_apply_embedded(plan, p, d, s), opt, sched, offsets,
    grad_clip=5.0, donate=False)
st, m = step(state, dense, cat, y)
jax.device_get(m["loss"])
def run_step_k(kk):
    st = state
    m = None
    for _ in range(kk):
        st, m = step(st, dense, cat, y)
    jax.device_get(m["loss"])
dt = chained_rate(run_step_k, 3, 12)
print(f"full step: {dt*1e3:.2f} ms", flush=True)
