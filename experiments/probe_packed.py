"""Verify the packed-table design's component costs on the v5e:
  (a) packed lookup = super-row gather + multiply-sum lane select
  (b) cumsum segment-sum over [N,128]
  (c) ends-first compaction (argsort bool + take)
  (d) Pallas streaming copy bandwidth (the sweep kernel's DMA floor)
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 851968
T = 33_762_624
TP = T // 8
rng = np.random.RandomState(0)
idx_np = rng.randint(0, T, size=N).astype(np.int32)


def timed(label, fn, *args, n=10):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label}: first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    s = None
    for _ in range(n):
        s = fn(*args)
    _ = float(jnp.ravel(s)[0])
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)


packed = jnp.zeros((TP, 128), jnp.float32)
idx = jnp.asarray(idx_np)

# (a) packed lookup: gather super-row then select 16-lane group by mult-sum
def lookup(t, i):
    sup = jnp.take(t, i // 8, axis=0)                     # [N,128]
    sup = sup.reshape(-1, 8, 16)
    onehot = jax.nn.one_hot(i % 8, 8, dtype=sup.dtype)    # [N,8]
    return jnp.einsum("ng,ngk->nk", onehot, sup).sum()

timed("packed lookup multsum 851968", jax.jit(lookup), packed, idx)

# (b) segment-sum by super-row over lane-expanded [N,128]
g = jnp.asarray(rng.randn(N, 16).astype(np.float32))
srows = jnp.asarray(np.sort(idx_np))

def segsum128(rows, g16):
    lane = jax.nn.one_hot(rows % 8, 8, dtype=g16.dtype)   # [N,8]
    wide = (lane[:, :, None] * g16[:, None, :]).reshape(-1, 128)
    sup = rows // 8
    cs = jnp.cumsum(wide, axis=0)
    is_end = jnp.concatenate([sup[1:] != sup[:-1], jnp.ones((1,), bool)])
    pos = jnp.arange(rows.shape[0], dtype=jnp.int32)
    end_pos = jnp.where(is_end, pos, -1)
    prev = jax.lax.associative_scan(jnp.maximum, end_pos)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prev[:-1]])
    base = jnp.where((prev >= 0)[:, None], jnp.take(cs, jnp.maximum(prev, 0), axis=0), 0.0)
    seg = jnp.where(is_end[:, None], cs - base, 0.0)
    return seg.sum()

timed("lane-expand + segsum128 851968", jax.jit(segsum128), srows, g)

# (c) ends-first compaction: stable argsort of !is_end + take [N,16]
def compact(rows, g16):
    is_end = jnp.concatenate([rows[1:] != rows[:-1], jnp.ones((1,), bool)])
    order = jnp.argsort(~is_end, stable=True)
    return jnp.take(g16, order, axis=0).sum(), jnp.take(rows, order).sum()

timed("ends-first compact [N,16]", jax.jit(lambda r, g16: compact(r, g16)[0]), srows, g)

# (d) Pallas streaming copy bandwidth over the packed table
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 512  # super-rows per block
NT = TP // K

def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 0.999

pcopy = jax.jit(lambda x: pl.pallas_call(
    copy_kernel,
    out_shape=jax.ShapeDtypeStruct((NT * K, 128), jnp.float32),
    grid=(NT,),
    in_specs=[pl.BlockSpec((K, 128), lambda t: (t, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((K, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
)(x))
xin = packed[: NT * K]
out = pcopy(xin)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(10):
    out = pcopy(out)
_ = float(out.ravel()[0])
dt = (time.perf_counter() - t0) / 10
gb = NT * K * 128 * 4 * 2 / 1e9
print(f"pallas stream copy {gb:.1f} GB: {dt*1e3:.2f} ms -> {gb/dt:.0f} GB/s", flush=True)
print("DONE", flush=True)
