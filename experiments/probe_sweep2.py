"""Isolate the sweep kernel's slowness: block size, in/out aliasing,
scalar prefetch, manual chunk DMA, matmul precision."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP = 4_220_326  # packed criteo rows
TPpad = -(-TP // 8192) * 8192


def timeit(label, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
    dt = (time.perf_counter() - t0) / n
    gb = TPpad * 128 * 4 * 2 / 1e9
    print(f"{label}: {dt*1e3:.2f} ms ({gb/dt:.0f} GB/s r+w-equiv)", flush=True)


x = jnp.zeros((TPpad, 128), jnp.float32)

# (a) plain copy at several block sizes
def mk_copy(K):
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 0.999
    return jax.jit(lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((TPpad, 128), jnp.float32),
        grid=(TPpad // K,),
        in_specs=[pl.BlockSpec((K, 128), lambda t: (t, 0))],
        out_specs=pl.BlockSpec((K, 128), lambda t: (t, 0)),
    )(x))

for K in (512, 2048, 8192):
    timeit(f"copy K={K}", mk_copy(K), x)

# (b) two in / two out blocks with aliasing (the sweep's data motion)
def mk_copy2(K, alias):
    def kern(x_ref, y_ref, ox_ref, oy_ref):
        ox_ref[:] = x_ref[:] * 0.999
        oy_ref[:] = y_ref[:] * 0.999
    bs = pl.BlockSpec((K, 128), lambda t: (t, 0))
    f = lambda x, y: pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((TPpad, 128), jnp.float32),) * 2,
        grid=(TPpad // K,),
        in_specs=[bs, bs], out_specs=[bs, bs],
        input_output_aliases={0: 0, 1: 1} if alias else {},
    )(x, y)
    return jax.jit(f, donate_argnums=(0, 1) if alias else ())

y = jnp.zeros((TPpad, 128), jnp.float32)
for K in (2048,):
    for alias in (False, True):
        f = mk_copy2(K, alias)
        out = f(jnp.array(x), jnp.array(y))
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        n = 5
        a, b = jnp.array(x), jnp.array(y)
        for _ in range(n):
            a, b = f(a, b)
        _ = float(a.ravel()[0])
        dt = (time.perf_counter() - t0) / n
        gb = TPpad * 128 * 4 * 4 / 1e9
        print(f"copy2 K={K} alias={alias}: {dt*1e3:.2f} ms ({gb/dt:.0f} GB/s)", flush=True)

# (c) add a manual chunk DMA + small matmul per tile (sweep skeleton)
N = 851968
upd = jnp.zeros((N + 256, 256), jnp.float32)

def mk_skel(K, C, hiprec):
    prec = jax.lax.Precision.HIGHEST if hiprec else None
    def kern(starts_ref, x_ref, y_ref, u_hbm, ox_ref, oy_ref, ubuf, sem):
        t = pl.program_id(0)
        start = (starts_ref[t] // 8) * 8
        cp = pltpu.make_async_copy(u_hbm.at[pl.ds(start, C), :], ubuf, sem)
        cp.start()
        ox_ref[:] = x_ref[:] * 0.999
        oy_ref[:] = y_ref[:] * 0.999
        cp.wait()
        val = ubuf[:]
        at = (val[:, 128:] > 0.5).astype(jnp.float32)
        d = jax.lax.dot_general(at, val[:, :128], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        ox_ref[:K // (K // 128), :] = ox_ref[:K // (K // 128), :]
        oy_ref[:128, :] += d[:128, :] * 0.0
    bs = pl.BlockSpec((K, 128), lambda t, *_: (t, 0))
    nt = TPpad // K
    starts = jnp.linspace(0, N, nt + 1).astype(jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nt,),
        in_specs=[bs, bs, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[bs, bs],
        scratch_shapes=[pltpu.VMEM((C, 256), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    f = lambda x, y, u: pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=(jax.ShapeDtypeStruct((TPpad, 128), jnp.float32),) * 2,
        input_output_aliases={1: 0, 2: 1},
    )(starts, x, y, u)
    return jax.jit(f, donate_argnums=(0, 1))

for K, C, hp in ((2048, 128, False), (2048, 128, True), (512, 128, False)):
    try:
        f = mk_skel(K, C, hp)
        a, b = jnp.array(x), jnp.array(y)
        a, b = f(a, b, upd)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            a, b = f(a, b, upd)
        _ = float(a.ravel()[0])
        dt = (time.perf_counter() - t0) / n
        gb = TPpad * 128 * 4 * 4 / 1e9
        print(f"skel K={K} C={C} hiprec={hp}: {dt*1e3:.2f} ms ({gb/dt:.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"skel K={K} C={C} hiprec={hp} FAILED: {str(e)[:200]}", flush=True)
print("DONE", flush=True)
