"""Sub-attribution of the two biggest stages of the 144 ms flagship step.

probe_step_attrib_r4.py measured: fwd+bwd 75.1 ms (fwd alone 28.2), prep
(rowwise_segment_sum_slotwise) 19.1 ms, sweep 29.4, lookup 14.4 — the body
and the prep are now the targets.  This probe splits them:

prep parts (at [32768, 26] idx / [852k, 16] grads):
  a. batched per-column argsort of [B, S]
  b. take_along_axis + transpose/reshape of rows
  c. permutation gather of g [852k, 16]
  d. cumsum [852k, 16] axis 0
  e. boundary/is_end + prev_end associative scan + base gather + where
  f. whole rowwise_segment_sum_slotwise (cross-check)

body parts (flat stem [B, S*16], pallas bodies):
  per-block forward+backward attribution by nesting: time fwd+bwd of the
  model truncated to the first k blocks (block_limit), attribute block k as
  the difference — boundary effects noted, trend is what matters.

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_prep_and_body_r4.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.profiling import chained_rate
from nasrec_tpu.train.metrics import bce_with_logits
from nasrec_tpu.train.sparse_embedding import (
    _segment_last_sum,
    _slotwise_sort,
    rowwise_segment_sum_slotwise,
)

batch = 32768
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
offsets = np.asarray(table_offsets(vocab), np.int32)

rng = np.random.RandomState(0)
cat = jnp.asarray(np.stack(
    [rng.randint(0, v, size=batch) for v in vocab], 1).astype(np.int32))
idx2d = jax.jit(lambda c: c + jnp.asarray(offsets)[None, :])(cat)
g = jnp.asarray((rng.randn(batch * spec.num_sparse, 16) * 1e-2)
                .astype(np.float32))
jax.block_until_ready(g)


def timeit(name, fn, *args, k=(3, 12)):
    def scalarized(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return functools.reduce(
            lambda x, z: x + z, [l.astype(jnp.float32).sum() for l in leaves]
        )
    jf = jax.jit(scalarized)
    jax.device_get(jf(*args))

    def run_k(kk):
        o = None
        for _ in range(kk):
            o = jf(*args)
        jax.device_get(o)

    dt = chained_rate(run_k, *k)
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    return dt


print("== prep parts ==", flush=True)
timeit("a argsort [B,S] axis0", lambda i: jnp.argsort(i, axis=0), idx2d)

def rows_of(i):
    order_b = jnp.argsort(i, axis=0)
    rows = jnp.take_along_axis(i, order_b, axis=0)
    return rows.T.reshape(-1), order_b

timeit("b rows sort+transpose", lambda i: rows_of(i)[0], idx2d)

order_b = jax.jit(lambda i: jnp.argsort(i, axis=0))(idx2d)
perm = jax.jit(
    lambda ob: (ob * spec.num_sparse
                + jnp.arange(spec.num_sparse, dtype=ob.dtype)[None, :]).T.reshape(-1)
)(order_b)
timeit("c perm gather g[852k,16]", lambda gg, p: jnp.take(gg, p, axis=0), g, perm)
gs = jax.jit(lambda gg, p: jnp.take(gg, p, axis=0))(g, perm)
timeit("d cumsum [852k,16]", lambda x: jnp.cumsum(x, axis=0), gs)

rows_sorted = jax.jit(lambda i: rows_of(i)[0])(idx2d)
timeit("e segment_last_sum", lambda r, x: _segment_last_sum(r, x),
       rows_sorted, gs)
timeit("f whole slotwise prep",
       lambda i, gg: rowwise_segment_sum_slotwise(i, gg), idx2d, g)

print("== body per-block (pallas) ==", flush=True)
choice = get_best_arch("criteo-kaggle", "xlarge")
dense = jnp.asarray(rng.randn(batch, spec.num_dense).astype(np.float32))
y = jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32))

prev = 0.0
for nb in range(1, 8):
    # Truncate the flagship arch to its first nb blocks (macro indices only
    # ever reference earlier blocks, so a prefix is a valid choice).
    trunc = {"macro": choice["macro"][:nb], "micro": choice["micro"][:nb]}
    plan = build_fixed_plan(
        trunc, OPS_CONFIG_LIB["xlarge"], nb, spec.num_dense, spec.num_sparse,
        vocab, use_layernorm=False, attention_impl="pallas",
    )
    params = fixed_init(jax.random.PRNGKey(0), plan)
    rest = {k: v for k, v in params.items() if k != "embedding"}
    stem = jax.jit(
        lambda t, c: jnp.take(
            t, (c + jnp.asarray(offsets)[None, :]).reshape(-1), axis=0
        ).reshape(batch, -1)
    )(params["embedding"]["table"], cat)

    def fwdbwd(rp, s, d, yy, _plan=plan):
        def loss(rpp, si):
            lg = fixed_apply_embedded(_plan, rpp, d, si)
            return bce_with_logits(lg, yy)
        return jax.value_and_grad(loss, argnums=(0, 1))(rp, s)

    dt = timeit(f"blocks 0..{nb - 1} f+b", fwdbwd, rest, stem, dense, y)
    print(f"   block {nb - 1} marginal: {(dt - prev) * 1e3:.2f} ms", flush=True)
    prev = dt
