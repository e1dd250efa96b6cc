"""Attention kernel variants at the flagship shapes.

probe_block0_ops.py: the E-major per-row-dot Pallas kernel costs 17.3 ms fwd
/ 25.9 ms f+b at [32768, 16, 64] — ~25x off HBM bandwidth (0.65 ms) because
each batch row issues 8 tiny MXU dots (issue-bound, ~10+ cycles each).

Variant under test: batch-on-LANES layout [E, S, B].  hd=2 makes scores
rank-2 outer products: s_h[i,j,b] = q[2h,i,b]k[2h,j,b] + q[2h+1,i,b]k[2h+1,j,b]
— pure VPU broadcast/fma/sublane-reduce, no transposes, no MXU.
Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_attn_variants.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nasrec_tpu.ops.kernels.attention_pallas import (
    mha_reference,
    tiny_head_attention_bmajor,
)
from nasrec_tpu.profiling import chained_rate

B, E, S, H = 32768, 16, 64, 8
HD = E // H
rng = np.random.RandomState(0)


def rand(shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.3)


def timeit(name, fn, *args, k=(4, 16)):
    def scalarized(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return functools.reduce(
            lambda x, y: x + y, [l.astype(jnp.float32).sum() for l in leaves]
        )
    jf = jax.jit(scalarized)
    jax.device_get(jf(*args))

    def run_k(kk):
        o = None
        for _ in range(kk):
            o = jf(*args)
        jax.device_get(o)

    dt = chained_rate(run_k, *k)
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    return dt


# ---------------------------------------------------------------- variant: VPU batch-on-lanes
def _vpu_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int):
    q = q_ref[:].astype(jnp.float32)   # [E, S, TB]
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    e, s, tb = q.shape
    hd = e // num_heads
    scale = 1.0 / np.sqrt(hd)
    outs = []
    for h in range(num_heads):
        sblk = jnp.zeros((s, s, tb), jnp.float32)
        for d in range(hd):
            qd = q[h * hd + d]            # [S, TB]
            kd = k[h * hd + d]
            sblk = sblk + qd[:, None, :] * kd[None, :, :]
        sblk = sblk * scale
        m = jnp.max(sblk, axis=1, keepdims=True)
        p = jnp.exp(sblk - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        for d in range(hd):
            vd = v[h * hd + d]            # [S, TB]
            outs.append(jnp.sum(p * vd[None, :, :], axis=1))  # [S, TB]
    o_ref[:] = jnp.stack(outs, axis=0).astype(o_ref.dtype)


def vpu_attention_fwd(qt, kt, vt, num_heads=8, tb=512):
    e, s, b = qt.shape
    spec = pl.BlockSpec((e, s, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_vpu_fwd_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((e, s, b), qt.dtype),
        grid=(-(-b // tb),),
        in_specs=[spec] * 3,
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(qt, kt, vt)


q = rand((B, E, S))
qT = jnp.transpose(q, (1, 2, 0))  # [E, S, B]

# correctness first (tiny, interpret-free on real TPU)
small = rand((4, E, 8))
ref = mha_reference(jnp.swapaxes(small, 1, 2), jnp.swapaxes(small, 1, 2),
                    jnp.swapaxes(small, 1, 2), H)           # [4, 8, E]
got = vpu_attention_fwd(jnp.transpose(small, (1, 2, 0)),
                        jnp.transpose(small, (1, 2, 0)),
                        jnp.transpose(small, (1, 2, 0)), H, tb=4)
err = float(jnp.max(jnp.abs(jnp.transpose(got, (2, 1, 0)) - ref)))
print(f"vpu kernel max err vs reference: {err:.2e}")

# NOTE: the "current emajor kernel" baseline recorded in the findings below
# was the since-removed gen-2 fused_tiny_head_attention_t (per-row MXU dots);
# the line now times HEAD's shipped b-major kernel instead so the probe runs
# against the current API.
qkvT = jnp.concatenate([qT, qT, qT], axis=0)  # [3E, S, B]
timeit("shipped bmajor kernel fwd     ",
       lambda a: tiny_head_attention_bmajor(a, H), qkvT)
for tb in (256, 512, 1024):
    try:
        timeit(f"vpu b-on-lanes fwd tb={tb:<5}",
               lambda a, t=tb: vpu_attention_fwd(a, a, a, H, t), qT)
    except Exception as ex:  # noqa
        print(f"tb={tb} FAILED {type(ex).__name__}: {str(ex)[:120]}")

# cost of the layout change at the boundary
timeit("transpose [B,E,S]->[E,S,B]    ",
       lambda a: jnp.transpose(a, (1, 2, 0)), q)
timeit("transpose [E,S,B]->[B,E,S]    ",
       lambda a: jnp.transpose(a, (2, 0, 1)), qT)
