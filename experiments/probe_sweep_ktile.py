"""Full-scale sweep-update timing vs K_TILE (and CW).

The (2048, 128) tile was chosen when (512, 128) measured <1 GB/s — per-step
overhead, not bandwidth, set the floor.  A plain chained a+1 stream over
4.3 GB sustains ~625 GB/s r+w on this chip while the sweep runs ~291 GB/s,
so per-step overhead may still dominate at 2048.  This probe re-times the
full flagship-scale update for K_TILE in {2048, 4096, 8192} by rebinding
the module constants before tracing (they are read at trace time).

Run: python experiments/probe_sweep_ktile.py  (from the repo root)

RESULTS (2026-08-18, flagship scale: 852k positions / 296k unique rows,
33.8M-row table, one v5e via axon):

    K_TILE=512  CW=128: 31.83 ms   K_TILE=512  CW=256: 31.27 ms
    K_TILE=1024 CW=128: 29.94 ms   K_TILE=1024 CW=256: 28.32 ms
    K_TILE=2048 CW=128: 30.43 ms   K_TILE=2048 CW=256: 28.46 ms
    K_TILE=4096 CW=256: 35.26 ms   K_TILE=8192 CW=256: 49.61 ms

Flat 28-32 ms across a 16x tile range and a 2x window range -> the limiter
is NEITHER the one-hot MXU dots (prop. to K_TILE, 4x swing expected), NOR
grid-step count (4x swing expected), NOR DMA block size.  Two floors
bracket it:
  - pure Pallas aliased copy-through of table+acc at the same (2048, 128)
    block pattern: 14.55 ms (594 GB/s r+w) — the DMA pattern itself is fine;
  - a chained jnp a+1 stream over one 2.17 GB buffer: ~623 GB/s.
The ~14 ms gap is per-active-step cost that does not scale with any block
dimension — consistent with the per-step window-block DMA (256 KB, new
index every active step, ~3-5k active steps) failing to overlap behind the
resident-tile compute.  Closing it needs manual double-buffered
make_async_copy window prefetch (or folding several windows into one grid
step with in-kernel loop + prefetch), i.e. a kernel-structure change, not a
parameter change.  The shipped default (2048, 256) is at the flat optimum.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS
from nasrec_tpu.ops.kernels import table_sweep_pallas as tsp
from nasrec_tpu.profiling import chained_rate

BATCH = 32768
vocab = DATASETS["criteo-kaggle"].vocab_sizes(None)
offsets = np.cumsum([0] + list(vocab[:-1])).astype(np.int32)
total = int(sum(vocab))

rng = np.random.RandomState(0)
idx_np = np.stack(
    [rng.randint(0, v, size=BATCH) + o for v, o in zip(vocab, offsets)], 1
).reshape(-1).astype(np.int32)
n = idx_np.size

# Pre-build the sorted payload ONCE (prep is timed elsewhere).  No segment
# sum: duplicates violate the exactness contract but not the timing.
order = np.argsort(idx_np, kind="stable")
rows = jnp.asarray(idx_np[order])
seg16 = jnp.asarray((rng.randn(n, 16) * 1e-2).astype(np.float32)[order])
jax.block_until_ready(seg16)

for ktile, cw, wf in ((1024, 256, 1), (1024, 128, 2), (1024, 128, 4),
                      (1024, 256, 2), (2048, 128, 4), (2048, 256, 2),
                      (512, 128, 4)):
        tsp.K_TILE = ktile
        tsp.ROWS_PER_TILE = ktile * tsp.GROUP
        tpad = tsp.sweep_padded_rows(total)
        key = jax.random.PRNGKey(0)
        table_p = jax.random.normal(
            key, (tpad // tsp.GROUP, tsp.LANES), jnp.float32)
        acc_p = jnp.abs(jax.random.normal(
            jax.random.PRNGKey(1), table_p.shape, jnp.float32))
        box = {"t": table_p, "a": acc_p}

        def run(k):
            t, a = box["t"], box["a"]
            for _ in range(k):
                t, a = tsp.sweep_adagrad_update(
                    t, a, rows, seg16, 0.01, cw=cw, wf=wf)
            box["t"], box["a"] = t, a
            jax.device_get(t[0, 0])

        run(2)
        dt = chained_rate(run, 3, 9)
        gbs = 4 * table_p.size * 4 / dt / 1e9
        print(f"K_TILE={ktile} CW={cw} WF={wf}: {dt*1e3:.2f} ms "
              f"({gbs:.0f} GB/s table+acc r+w, tiles={tpad//tsp.ROWS_PER_TILE})",
              flush=True)
        del table_p, acc_p, box
