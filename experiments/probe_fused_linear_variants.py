"""Which in-kernel formulation of the E-contraction feature linear is fast?

The fused transformer-body kernel (round 3) needs qkv/out/fc linears INSIDE
a batch-on-lanes [E, S, B] Pallas kernel.  The contraction is over E (the
MAJOR axis), which no MXU dot takes directly at this layout.  Candidates,
timed standalone at the block-0 shape ([16, 64, 32768] f32 -> [48, 64, *]):

  xla     — the current glue einsum ef,esb->fsb (one [48,16]x[16,S*B] dot),
            the HBM-round-trip baseline the fused kernel replaces
  copy    — pallas kernel that just writes a [48, S, TB] block (floor)
  per_s   — python loop over s: dot(w^T, x[:, s, :]) with strided sublane
            slices, jnp.stack(axis=1)
  vpu     — per-output-feature plane accumulation: 48 x 16 broadcast-fma on
            [S, TB] planes, jnp.stack(axis=0)
  reshape — x.reshape(16, S*TB) -> one dot -> reshape back (Mosaic relayout)

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_fused_linear_variants.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nasrec_tpu.profiling import chained_rate

B, S, E, F = 32768, 64, 16, 48
TB = 512
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(E, S, B).astype(np.float32) * 0.05)
w = jnp.asarray(rng.randn(E, F).astype(np.float32) * 0.1)


def timeit(name, fn, *args, k=(4, 16)):
    # Scalarize INSIDE the jit: fetching the raw [F, S, B] output would pull
    # 400 MB through the axon tunnel per call and swamp the measurement.
    def scalarized(*a):
        return fn(*a).astype(jnp.float32).sum()

    jf = jax.jit(scalarized)
    try:
        out = jf(*args)
        jax.block_until_ready(out)
    except Exception as ex:
        print(f"{name:<10}: FAILED {type(ex).__name__}: {str(ex)[:140]}",
              flush=True)
        return None

    def run_k(kk):
        o = None
        for _ in range(kk):
            o = jf(*args)
        jax.device_get(o)

    run_k(2)
    dt = chained_rate(run_k, *k)
    print(f"{name:<10}: {dt * 1e3:7.2f} ms", flush=True)
    return dt


def _call(kernel, n_in=2):
    specs = [pl.BlockSpec((E, S, TB), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((E, F), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, S, B), jnp.float32),
        grid=(B // TB,),
        in_specs=specs[:n_in],
        out_specs=pl.BlockSpec((F, S, TB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def k_copy(x_ref, w_ref, o_ref):
    xv = x_ref[:]
    o_ref[:] = jnp.concatenate([xv, xv, xv], axis=0)


def k_per_s(x_ref, w_ref, o_ref):
    xv = x_ref[:]
    wv = w_ref[:]
    cols = [
        jax.lax.dot_general(wv, xv[:, s, :], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for s in range(S)
    ]                                   # each [F, TB]
    o_ref[:] = jnp.stack(cols, axis=1)  # [F, S, TB]


def k_vpu(x_ref, w_ref, o_ref):
    xv = x_ref[:]
    wv = w_ref[:]
    planes = []
    for f in range(F):
        acc = xv[0] * wv[0, f]
        for e in range(1, E):
            acc = acc + xv[e] * wv[e, f]
        planes.append(acc)
    o_ref[:] = jnp.stack(planes, axis=0)


def k_reshape(x_ref, w_ref, o_ref):
    x2 = x_ref[:].reshape(E, S * TB)
    y = jax.lax.dot_general(w_ref[:], x2, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = y.reshape(F, S, TB)


timeit("xla", lambda xx, ww: jnp.einsum("ef,esb->fsb", ww, xx), x, w)
timeit("copy", lambda xx, ww: _call(k_copy)(xx, ww), x, w)
timeit("per_s", lambda xx, ww: _call(k_per_s)(xx, ww), x, w)
timeit("vpu", lambda xx, ww: _call(k_vpu)(xx, ww), x, w)
timeit("reshape", lambda xx, ww: _call(k_reshape)(xx, ww), x, w)

# correctness spot-check of whichever kernels compiled
want = np.asarray(jnp.einsum("ef,esb->fsb", w, x))
for name, k in (("per_s", k_per_s), ("vpu", k_vpu), ("reshape", k_reshape)):
    try:
        got = np.asarray(jax.jit(lambda xx, ww: _call(k)(xx, ww))(x, w))
        err = np.max(np.abs(got - want))
        print(f"{name} |err|max = {err:.2e}", flush=True)
    except Exception as ex:
        print(f"{name} check FAILED: {str(ex)[:100]}", flush=True)
