"""Characterize TPU gather/scatter costs for the packed-embedding design.

Finding that motivates this probe: XLA lays out [N, 16] f32 tables as
T(8,128) tiles — the 16-wide row pads to 128 lanes, so a layout copy of the
full Criteo table materializes 17.3 GB (OOM on a 16 GB v5e).  Packing 8
vocab rows per 128-lane super-row ([T/8, 128]) removes the 8x lane waste.
This probe measures whether packed gathers/scatters also FIX the speed
(descriptor-bound vs bandwidth-bound).

Run on the real chip: python experiments/probe_gather.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 851968
T = 33_762_624
TP = T // 8  # packed super-rows
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

# 1. packed gather: super-row fetch + in-register sub-row select
g128 = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
timed("gather 851968 super-rows [4.2M,128]", g128, packed, jnp.asarray(idx_np // 8))
timed("gather 851968 sorted [4.2M,128]", g128, packed,
      jnp.asarray(np.sort(idx_np // 8)))


def full_lookup(t, i):
    sup = jnp.take(t, i // 8, axis=0)           # [N,128]
    sub = sup.reshape(-1, 8, 16)
    sel = jnp.take_along_axis(sub, (i % 8)[:, None, None], axis=1)
    return sel.sum()


timed("packed lookup (gather+select) 851968", jax.jit(full_lookup),
      packed, jnp.asarray(idx_np))

# 2. packed scatter-add with unique indices (drop mode)
g = jnp.ones((N, 128), jnp.float32)
sidx = np.sort(idx_np // 8).astype(np.int32)


def scat_unique(t, i, g):
    is_end = jnp.concatenate([i[1:] != i[:-1], jnp.ones((1,), bool)])
    rows = jnp.where(is_end, i, TP)
    return t.at[rows].add(g, mode="drop", unique_indices=True)


sc = jax.jit(scat_unique)
out = sc(packed, jnp.asarray(sidx), g)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(10):
    out = sc(out, jnp.asarray(sidx), g)
_ = float(out.ravel()[0])
print(f"packed unique-scatter 851968 [4.2M,128]: {(time.perf_counter()-t0)*100:.2f} ms", flush=True)
del out

# 3. plain duplicate scatter for comparison
sc2 = jax.jit(lambda t, i, g: t.at[i].add(g))
out = sc2(packed, jnp.asarray(idx_np // 8), g)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(5):
    out = sc2(out, jnp.asarray(idx_np // 8), g)
_ = float(out.ravel()[0])
print(f"packed dup-scatter 851968 [4.2M,128]: {(time.perf_counter()-t0)*200:.2f} ms", flush=True)
del out, g

# 4. argsort cost at this N
srt = jax.jit(lambda i, s: jnp.sort(i + s * 0).sum() + 0 * s)
timed("sort 851968 int32", srt, jnp.asarray(idx_np), jnp.zeros((), jnp.int32))

a = jnp.asarray(rng.randn(N, 16).astype(np.float32))


def argsort_take(i, a):
    o = jnp.argsort(i)
    return jnp.take(a, o, axis=0).sum()


timed("argsort+take [851968,16]", jax.jit(argsort_take), jnp.asarray(idx_np), a)

# 5. streaming RMW of the packed table (dense-sweep alternative)
upd = jax.jit(lambda t: t * 0.999)
out = upd(packed)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(5):
    out = upd(out)
_ = float(out.ravel()[0])
print(f"stream RMW packed 2.1GB (r+w 4.3GB): {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)
print("DONE", flush=True)
