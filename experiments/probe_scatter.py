"""Scatter cost model on the v5e: per-row vs per-element, scaling in N,
and a minimal Pallas VMEM-RMW loop calibration."""
import time
import numpy as np
import jax
import jax.numpy as jnp

T = 33_762_624
rng = np.random.RandomState(0)


def bench(label, fn, init, *args, n=5):
    out = fn(init, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(out, *args)
    _ = float(out.ravel()[0])
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)


# 1. scalar scatter: 851968 f32 into flat [33.8M]
N = 851968
idx = jnp.asarray(rng.randint(0, T, size=N).astype(np.int32))
gs = jnp.ones((N,), jnp.float32)
flat = jnp.zeros((T,), jnp.float32)
sc1 = jax.jit(lambda t, i, g: t.at[i].add(g))
bench("scalar scatter 851968 -> [33.8M]", sc1, flat, idx, gs)
del flat

# 2. row scatter at N/8: does cost scale with N?
N8 = N // 8
idx8 = jnp.asarray(rng.randint(0, T, size=N8).astype(np.int32))
g8 = jnp.ones((N8, 16), jnp.float32)
tab = jnp.zeros((T, 16), jnp.float32)
sc2 = jax.jit(lambda t, i, g: t.at[i].add(g))
bench("row scatter 106496x16 -> [33.8M,16]", sc2, tab, idx8, g8)

# 3. row scatter full N (reference point, matches earlier 102ms)
gN = jnp.ones((N, 16), jnp.float32)
bench("row scatter 851968x16 -> [33.8M,16]", sc2, tab, idx, gN)
del tab

# 4. Pallas per-row VMEM RMW loop calibration: K iterations of dynamic
#    row read-modify-write on a VMEM tile.
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, K = 1024, 4096


def kernel(rows_ref, vals_ref, tile_ref, out_ref):
    out_ref[:] = tile_ref[:]

    def body(j, _):
        r = rows_ref[j]
        out_ref[r, :] = out_ref[r, :] + vals_ref[j, :]
        return 0

    jax.lax.fori_loop(0, K, body, 0)


tile = jnp.zeros((ROWS, 128), jnp.float32)
rows = jnp.asarray(rng.randint(0, ROWS, size=K).astype(np.int32))
vals = jnp.ones((K, 128), jnp.float32)

call = jax.jit(lambda t, r, v: pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(r, v, t))
try:
    out = call(tile, rows, vals)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = call(out, rows, vals)
    _ = float(out.ravel()[0])
    dt = (time.perf_counter() - t0) / 10
    print(f"pallas VMEM RMW {K} rows: {dt*1e3:.2f} ms -> {dt/K*1e9:.0f} ns/row", flush=True)
except Exception as e:
    print(f"pallas RMW kernel failed: {type(e).__name__}: {str(e)[:300]}", flush=True)
print("DONE", flush=True)
