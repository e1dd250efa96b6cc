"""Dot-product interaction: batched-einsum (per-example K=16 dots) vs a
batch-minor outer-product formulation, at block2's flagship shapes
(dense_in=160, sparse_in=162 slots, out_dim=768 -> slot_dim=39, n=40,
batch 32768; block2 f+b measured 15.0 ms total).
Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_dotproduct.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.ops.interactions import dot_product_apply_flat, dot_product_init
from nasrec_tpu.profiling import chained_rate

B, D_IN, S_IN, OUT, E = 32768, 160, 162, 768, 16
rng = np.random.RandomState(0)
p = dot_product_init(jax.random.PRNGKey(0), D_IN, S_IN, OUT, E, False)
dense = jnp.asarray(rng.randn(B, D_IN).astype(np.float32) * 0.1)
sparse = jnp.asarray(rng.randn(B, S_IN * E).astype(np.float32) * 0.1)


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
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def current(pp, d, s):
    return dot_product_apply_flat(pp, d, s, S_IN, E, None)


def fb(fn):
    def f(args):
        def loss(a):
            return jnp.sum(fn(*a))
        return jax.grad(loss)(args)
    return lambda *a: f(a)


timeit("dot-product fwd (current)", current, p, dense, sparse)
timeit("dot-product f+b (current)", fb(current), p, dense, sparse)


def bminor(pp, d, s):
    """Same math, pairwise scores built batch-minor in XLA."""
    from nasrec_tpu.ops.common import linear_apply, flat_to_emajor, linear_apply_e

    x = d
    if "dense_proj" in pp:
        x = linear_apply(pp["dense_proj"], x)
    yt = flat_to_emajor(s, S_IN, E)
    if "sparse_proj" in pp:
        q = pp["sparse_proj"]
        yt = linear_apply_e(q["w"], q.get("b"), yt)
    if "slot_proj" in pp:
        yt = linear_apply(pp["slot_proj"], yt)        # [B, E, slot_dim]
    t = jnp.concatenate([x[:, :, None], yt], axis=2)  # [B, E, n]
    tb = jnp.transpose(t, (1, 2, 0))                  # [E, n, B]
    n = tb.shape[1]
    z = jnp.zeros((n, n, tb.shape[2]), jnp.float32)
    for e in range(E):
        z = z + tb[e][:, None, :] * tb[e][None, :, :]
    tril = jnp.concatenate([z[i, :i] for i in range(1, n)], axis=0)  # [P, B]
    out = jnp.transpose(tril, (1, 0))                 # [B, P]
    if "out_proj" in pp:
        out = linear_apply(pp["out_proj"], out)
    return out


# correctness
a = jax.jit(current)(p, dense[:256], sparse[:256])
b = jax.jit(lambda pp, d, s: bminor(pp, d, s))(p, dense[:256], sparse[:256])
print("max err:", float(jnp.max(jnp.abs(a - b))))

timeit("dot-product fwd (b-minor)", bminor, p, dense, sparse)
timeit("dot-product f+b (b-minor)", fb(bminor), p, dense, sparse)
