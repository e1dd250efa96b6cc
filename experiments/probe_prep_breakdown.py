"""Decompose the sparse-update prep (sort + permute + segment-sum) cost.

rowwise_segment_sum at the flagship shape ([852k] fused-table rows, [852k,
16] f32 grads) measured ~20.7 ms on the v5e — the third-largest step
component after the sweep update and the transformer body.  This probe
times each candidate sub-cost and the alternatives:

  - argsort of the keys alone (the sort network)
  - sort_key_val(keys, iota) (same thing, explicit)
  - variadic lax.sort carrying the [N, 16] payload THROUGH the network
  - jnp.take(g, order) (the 852k x 64B row gather)
  - the cumsum/segment machinery alone on pre-sorted inputs
  - batched per-slot argsort [B, 26] (shorter sorts, same take)
  - one-hot MXU dense aggregation for SMALL slots (vocab <= cap): a
    [v, B] @ [B, 16] matmul sums duplicates with NO sort/take at all and
    yields rows sorted by construction

Run: python experiments/probe_prep_breakdown.py   (real TPU via axon)
"""
import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.profiling import chained_rate
from nasrec_tpu.train.sparse_embedding import (
    _segment_last_sum,
    rowwise_segment_sum,
    rowwise_segment_sum_slotwise,
)

B = 32768
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
S = spec.num_sparse
offsets = np.asarray(table_offsets(vocab), np.int32)
rng = np.random.RandomState(0)
cat = np.stack([rng.randint(0, v, size=B) for v in vocab], 1).astype(np.int32)
idx2d = jnp.asarray(cat + offsets[None, :])
idx = idx2d.reshape(-1)
g = jnp.asarray(rng.randn(B * S, 16).astype(np.float32) * 0.01)
N = B * S
print(f"N={N} slots={S}", flush=True)


def timeit(name, fn, *args, k=(4, 12)):
    jf = jax.jit(fn)
    out = jf(*args)
    jax.block_until_ready(out)

    def run_k(kk):
        o = None
        for _ in range(kk):
            o = jf(*args)
        jax.device_get(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])

    run_k(2)
    dt = chained_rate(run_k, *k)
    print(f"{name:<42}: {dt * 1e3:7.2f} ms", flush=True)
    return dt


# --- baselines ---------------------------------------------------------------
timeit("rowwise_segment_sum (full prep)",
       lambda i, gg: rowwise_segment_sum(i, gg), idx, g)
timeit("slotwise full prep", lambda i2, gg: rowwise_segment_sum_slotwise(i2, gg),
       idx2d, g)

# --- components --------------------------------------------------------------
timeit("argsort keys", lambda i: jnp.argsort(i), idx)
timeit("sort keys only", lambda i: jnp.sort(i), idx)
timeit("sort_key_val(keys, iota)",
       lambda i: jax.lax.sort_key_val(i, jnp.arange(N, dtype=jnp.int32)), idx)
timeit("variadic sort keys + 16 f32 payload",
       lambda i, gg: jax.lax.sort(
           (i,) + tuple(gg[:, j] for j in range(16)), num_keys=1),
       idx, g)

order = jax.block_until_ready(jnp.argsort(idx))
timeit("take(g, order)  [852k x 64B gather]",
       lambda gg, o: jnp.take(gg, o, axis=0), g, order)
rows_sorted = jax.block_until_ready(idx[order])
g_sorted = jax.block_until_ready(jnp.take(g, order, axis=0))
timeit("segment machinery on sorted input",
       lambda r, gs: _segment_last_sum(r, gs), rows_sorted, g_sorted)

timeit("batched per-slot argsort [B, 26]",
       lambda i2: jnp.argsort(i2, axis=0), idx2d)

# --- dense one-hot aggregation for small slots -------------------------------
# slot s's aggregated grad = onehot(cat[:, s], v).T @ g_s: [v, B] x [B, 16].
# bf16 one-hot (0/1 exact); 3-pass mantissa-split dot would make it f32-exact
# like the sweep kernel; for timing a single f32-accum pass suffices.
for cap in (2048, 8192, 32768):
    small = [s for s, v in enumerate(vocab) if v <= cap]
    if not small:
        continue
    nsm = len(small)
    vmax = max(vocab[s] for s in small)

    def dense_agg(c2, gg, _small=tuple(small), _vmax=vmax):
        g3 = gg.reshape(B, S, 16)
        outs = []
        for s in _small:
            oh = jax.nn.one_hot(c2[:, s], _vmax, dtype=jnp.bfloat16)  # [B, v]
            outs.append(jax.lax.dot_general(
                oh, g3[:, s, :].astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return jnp.stack(outs)

    timeit(f"dense one-hot agg, {nsm} slots vmax={vmax}", dense_agg,
           jnp.asarray(cat), g)
