"""Embedding-update prep + sweep window-size probe at the flagship shapes.

Round-2 baseline (probe_table_sweep.py): the segment-sum prep (global
argsort of 852k keys) 20.6 ms; sweep update 35.4 ms at cw=256.
Two candidate wins measured here:
  1. slotwise prep: one batched [B, 26] column argsort (disjoint ascending
     per-slot ranges make the concatenation globally sorted).
     RESULT: SLOWER — 20.92 ms vs 18.52 ms global; the shorter sort does
     not pay for the extra take_along_axis + permute-gather.  The train
     step keeps the global argsort.
  2. sweep cw in {128, 256, 512, 1024}: MXU work per window scales with
     cw * K_TILE while the per-step overhead (~4.7 us on axon) scales with
     the step count ~ n/cw + 2 * n_tiles.
Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_prep_and_cw.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.ops.kernels import table_sweep_pallas as tsp
from nasrec_tpu.profiling import chained_rate
from nasrec_tpu.train.sparse_embedding import (
    rowwise_segment_sum,
    rowwise_segment_sum_slotwise,
)

B = 32768
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
offsets = np.asarray(table_offsets(vocab), np.int32)
rng = np.random.RandomState(0)
cat = np.stack([rng.randint(0, v, size=B) for v in vocab], 1).astype(np.int32)
idx2d = jnp.asarray(cat + offsets[None, :])
g = jnp.asarray(rng.randn(B * spec.num_sparse, 16).astype(np.float32) * 0.01)

total = int(offsets[-1] + vocab[-1]) if len(offsets) == len(vocab) else int(sum(vocab))
tpad = tsp.sweep_padded_rows(sum(vocab))
table_p = jnp.asarray(rng.randn(tpad // tsp.GROUP, tsp.LANES).astype(np.float32))
acc_p = jnp.abs(jnp.asarray(rng.randn(tpad // tsp.GROUP, tsp.LANES).astype(np.float32)))


def timeit(name, fn, *args, k=(4, 12)):
    jf = jax.jit(fn)
    out = jf(*args)
    jax.block_until_ready(out)

    def run_k(kk):
        o = None
        for _ in range(kk):
            o = jf(*args)
        jax.device_get(jax.tree_util.tree_leaves(o)[0][0])

    run_k(2)
    dt = chained_rate(run_k, *k)
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


timeit("global prep (argsort 852k) ",
       lambda i2, gg: rowwise_segment_sum(i2.reshape(-1), gg), idx2d, g)
timeit("slotwise prep (batched sort)",
       lambda i2, gg: rowwise_segment_sum_slotwise(i2, gg), idx2d, g)

rows, seg, _ = jax.jit(rowwise_segment_sum_slotwise)(idx2d, g)
rows = jax.block_until_ready(rows)

for cw in (128, 256, 512, 1024):
    # rows/seg MUST be arguments, not closure constants: seg is large and
    # a closure constant gets baked into the axon remote-compile request
    # (HTTP 413) and re-fed per call.
    def run(tp, ap, rr, ss, _cw=cw):
        return tsp.sweep_adagrad_update(tp, ap, rr, ss, 0.05, cw=_cw)
    try:
        jf = jax.jit(run)  # donation happens inside sweep's own jit
        t, a = jf(table_p, acc_p, rows, seg)
        jax.block_until_ready(t)

        def run_k(kk):
            tt, aa = table_p, acc_p
            for _ in range(kk):
                tt, aa = jf(tt, aa, rows, seg)
            jax.device_get(tt[0, 0])

        run_k(2)
        dt = chained_rate(run_k, 3, 9)
        print(f"sweep cw={cw:<5}: {dt*1e3:.2f} ms", flush=True)
    except Exception as ex:
        print(f"sweep cw={cw} FAILED {type(ex).__name__}: {str(ex)[:150]}",
              flush=True)
