"""Packed-table lookup variants on the v5e (the einsum multsum was 42 s).

  (a) super-row gather [N,128] alone
  (b) gather + 8 static lane-slices + select  (candidate)
  (c) gather + take_along_axis lane select
  (d) super-row segment-sum [N,128] + meta concat [N,256] (sweep prep)
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 851968
T = 33_767_424
TP = T // 8
rng = np.random.RandomState(0)
idx_np = rng.randint(0, T, size=N).astype(np.int32)
idx = jnp.asarray(idx_np)
packed = jnp.zeros((TP, 128), jnp.float32)


def timed(label, fn, *args, n=10):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label}: first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    t1 = None
    for k in (3, 3 + n):
        for _ in range(k if t1 is None else n):
            s = fn(*args)
        _ = float(jnp.ravel(s)[0])
        if t1 is None:
            t1 = time.perf_counter()
    t2 = time.perf_counter()
    print(f"{label}: {((t2-t1)-(t1-t0))/ (n-3) *1e3:.2f} ms", flush=True)


def gather_only(t, i):
    return jnp.take(t, i // 8, axis=0).sum()

timed("super-gather [N,128]", jax.jit(gather_only), packed, idx)


def slice_select(t, i):
    sup = jnp.take(t, i // 8, axis=0)          # [N,128]
    lane = (i % 8)[:, None]
    out = jnp.zeros((i.shape[0], 16), sup.dtype)
    for j in range(8):
        out = jnp.where(lane == j, sup[:, 16 * j:16 * (j + 1)], out)
    return out.sum()

timed("gather + 8-slice select", jax.jit(slice_select), packed, idx)


def tala(t, i):
    sup = jnp.take(t, i // 8, axis=0)
    lane_idx = (i % 8)[:, None] * 16 + jnp.arange(16)[None, :]
    return jnp.take_along_axis(sup, lane_idx, axis=1).sum()

timed("gather + take_along_axis", jax.jit(tala), packed, idx)


srows = jnp.asarray(np.sort(idx_np))
g = jnp.asarray(rng.randn(N, 16).astype(np.float32))

def sweep_prep(rows, g16):
    lane = jax.nn.one_hot(rows % 8, 8, dtype=g16.dtype)
    wide = (lane[:, :, None] * g16[:, None, :]).reshape(-1, 128)
    sup = rows // 8
    cs = jnp.cumsum(wide, axis=0)
    is_end = jnp.concatenate([sup[1:] != sup[:-1], jnp.ones((1,), bool)])
    pos = jnp.arange(rows.shape[0], dtype=jnp.int32)
    end_pos = jnp.where(is_end, pos, -1)
    prev = jax.lax.associative_scan(jnp.maximum, end_pos)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prev[:-1]])
    base = jnp.where((prev >= 0)[:, None],
                     jnp.take(cs, jnp.maximum(prev, 0), axis=0), 0.0)
    seg = jnp.where(is_end[:, None], cs - base, 0.0)
    rel = (sup % 2048).astype(jnp.float32)
    meta = jnp.zeros((rows.shape[0], 128), jnp.float32).at[:, 0].set(rel)
    upd = jnp.concatenate([seg, meta], axis=1)
    return upd.sum()

timed("segsum128 + meta concat", jax.jit(sweep_prep), srows, g)
print("DONE", flush=True)
