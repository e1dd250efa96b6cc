"""Full-scale TPU probe: PACKED streaming-sweep adagrad update vs scatter.

Workload: full-vocab Criteo fused table (~33.8M x 16 f32 stored packed as
[~4.2M, 128], 2.17 GB + same for the accumulator), batch 32768 x 26 slots ->
~852k update positions (~841k unique rows).

Modes (argv[1], default "sweep"):
  sweep   — time rowwise_segment_sum prep, packed_lookup forward gather,
            and the Pallas sweep update at full scale
  scatter — time the unpacked take + rowwise prep + XLA scatter pair
            (today's production path) at full scale
  check   — on-device sweep-vs-scatter agreement at 2-tile scale
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS
from nasrec_tpu.ops.kernels import table_sweep_pallas as tsp
from nasrec_tpu.profiling import chained_rate
from nasrec_tpu.train.sparse_embedding import (
    rowwise_segment_sum, sparse_adagrad_table_update,
)

MODE = sys.argv[1] if len(sys.argv) > 1 else "sweep"
BATCH = 32768
vocab = DATASETS["criteo-kaggle"].vocab_sizes(None)
offsets = np.cumsum([0] + list(vocab[:-1])).astype(np.int32)
total = int(sum(vocab))
tpad = tsp.sweep_padded_rows(total)
print(f"mode={MODE} total_vocab={total} tpad={tpad} "
      f"tiles={tpad//tsp.ROWS_PER_TILE}", flush=True)

rng = np.random.RandomState(0)
idx_np = np.stack(
    [rng.randint(0, v, size=BATCH) + o for v, o in zip(vocab, offsets)], 1
).reshape(-1).astype(np.int32)
print("positions:", idx_np.size, "unique:", np.unique(idx_np).size, flush=True)

idx = jnp.asarray(idx_np)
g = jnp.asarray(rng.randn(idx_np.size, 16).astype(np.float32) * 1e-2)
key = jax.random.PRNGKey(0)

if MODE == "sweep":
    table_p = jax.random.normal(key, (tpad // tsp.GROUP, tsp.LANES), jnp.float32)
    acc_p = jnp.abs(
        jax.random.normal(jax.random.PRNGKey(1), table_p.shape, jnp.float32)
    )

    # --- forward gather on the packed layout --------------------------------
    lookup = jax.jit(tsp.packed_lookup)
    def run_lookup(k):
        r = None
        for _ in range(k):
            r = lookup(table_p, idx)
        jax.device_get(r[0, 0])
    run_lookup(3)
    print(f"packed_lookup fwd: {chained_rate(run_lookup, 4, 12)*1e3:.2f} ms",
          flush=True)

    # --- segment-sum prep ----------------------------------------------------
    segsum = jax.jit(rowwise_segment_sum)
    rows_s, seg16, is_end = jax.block_until_ready(segsum(idx, g))
    def run_segsum(k):
        r = None
        gg = g
        for _ in range(k):
            r, s, e = segsum(idx, gg)
            gg = s  # chain
        jax.device_get(r[0])
    run_segsum(3)
    print(f"rowwise_segment_sum: {chained_rate(run_segsum, 4, 12)*1e3:.2f} ms",
          flush=True)

    # --- the sweep -----------------------------------------------------------
    state = {"t": table_p, "a": acc_p}
    def run_sweep(k):
        t, a = state["t"], state["a"]
        for _ in range(k):
            t, a = tsp.sweep_adagrad_update(t, a, rows_s, seg16, 0.05)
        state["t"], state["a"] = t, a
        jax.device_get(t[0, 0])
    t0 = time.perf_counter()
    run_sweep(1)
    print(f"sweep first call (compile+run): {time.perf_counter()-t0:.1f} s",
          flush=True)
    dt = chained_rate(run_sweep, 4, 12)
    print(f"sweep update: {dt*1e3:.2f} ms "
          f"({4*tpad*64/dt/1e9:.0f} GB/s table+acc r+w)", flush=True)

elif MODE == "scatter":
    table = jax.random.normal(key, (tpad, 16), jnp.float32)
    acc = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (tpad, 16)))
    lookup = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    def run_lookup(k):
        r = None
        for _ in range(k):
            r = lookup(table, idx)
        jax.device_get(r[0, 0])
    run_lookup(3)
    print(f"unpacked take fwd: {chained_rate(run_lookup, 4, 12)*1e3:.2f} ms",
          flush=True)

    segsum = jax.jit(rowwise_segment_sum)
    rows, seg, is_end = jax.block_until_ready(segsum(idx, g))
    scatter_upd = jax.jit(
        lambda t, a, r, s, e: sparse_adagrad_table_update(
            t, a, r, s, 0.05, 1e-2, 1.0, e
        ),
        donate_argnums=(0, 1),
    )
    state = {"t": table, "a": acc}
    def run_scatter(k):
        t, a = state["t"], state["a"]
        for _ in range(k):
            t, a = scatter_upd(t, a, rows, seg, is_end)
        state["t"], state["a"] = t, a
        jax.device_get(t[0, 0])
    run_scatter(2)
    dt = chained_rate(run_scatter, 4, 12)
    print(f"scatter pair: {dt*1e3:.2f} ms", flush=True)

elif MODE == "check":
    tp2 = 2 * tsp.ROWS_PER_TILE
    idx2 = jnp.asarray(rng.randint(0, tp2, size=200_000).astype(np.int32))
    g2 = jnp.asarray(rng.randn(200_000, 16).astype(np.float32) * 1e-2)
    table = jax.random.normal(key, (tp2, 16), jnp.float32)
    acc = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (tp2, 16)))
    table_p, acc_p = tsp.pack_rows(table), tsp.pack_rows(acc)

    rows, seg, is_end = jax.jit(rowwise_segment_sum)(idx2, g2)

    # fwd gather parity on device (before the sweep donates table_p)
    st_p = tsp.packed_lookup(table_p, idx2[:4096])
    st_u = jnp.take(table, idx2[:4096], axis=0)
    print(f"lookup |d|max={float(jnp.max(jnp.abs(st_p - st_u))):.3e}", flush=True)

    t_sw_p, a_sw_p = tsp.sweep_adagrad_update(table_p, acc_p, rows,
                                              seg, 0.05)
    t_sw = tsp.unpack_rows(t_sw_p, tp2)
    a_sw = tsp.unpack_rows(a_sw_p, tp2)
    t_sc, a_sc = jax.jit(
        lambda t, a, r, s, e: sparse_adagrad_table_update(
            t, a, r, s, 0.05, 1e-2, 1.0, e
        )
    )(table, acc, rows, seg, is_end)
    dt_max = float(jnp.max(jnp.abs(t_sw - t_sc)))
    da_max = float(jnp.max(jnp.abs(a_sw - a_sc)))
    print(f"|dT|max={dt_max:.3e} |dA|max={da_max:.3e} "
          f"(touched {np.unique(np.asarray(idx2)).size} rows)", flush=True)
else:
    raise SystemExit(f"unknown mode {MODE}")
