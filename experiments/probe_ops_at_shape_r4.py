"""Standalone fwd+bwd cost of every non-transformer node at its EXACT
flagship shapes (batch 32768) — ranks kernel-fusion candidates for the
~41 ms of non-transformer body time (probe_step_attrib_r4.py).

Caveat: standalone jit boundaries add relayout cost vs in-context fusion
(probe_fused_linear_variants.py measured up to 10x on a lone einsum), so
these are UPPER bounds; the ranking is what matters.

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_ops_at_shape_r4.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.ops.interactions import (
    dot_product_apply_flat,
    fm3d_apply_flat,
    sigmoid_gating_apply,
    sum_apply,
)
from nasrec_tpu.ops.linear import elastic_linear3d_apply_flat, elastic_linear_apply
from nasrec_tpu.profiling import chained_rate

batch = 32768
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
choice = get_best_arch("criteo-kaggle", "xlarge")
plan = build_fixed_plan(
    choice, OPS_CONFIG_LIB["xlarge"], 7, spec.num_dense, spec.num_sparse,
    vocab, use_layernorm=False, attention_impl="pallas",
)
params = fixed_init(jax.random.PRNGKey(0), plan)
rng = np.random.RandomState(0)


def timeit(name, fn, *args, k=(3, 12)):
    def scalarized(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return functools.reduce(
            lambda x, z: x + z, [l.astype(jnp.float32).sum() for l in leaves]
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


def rnd(*shape):
    return jnp.asarray((rng.randn(*shape) * 0.1).astype(np.float32))


e = plan.emb_dim
total = 0.0
for i, bp in enumerate(plan.blocks):
    bparams = params["blocks"][str(i)] if str(i) in params.get("blocks", {}) \
        else params["blocks"][i]
    dense_in = rnd(batch, bp.dense_in)
    sparse_in = rnd(batch, bp.sparse_in * e)
    left_in = rnd(batch, bp.left_in)
    right_in = rnd(batch, bp.right_in)

    for kn in bp.active_nodes:
        name = plan.space.node_names[kn]
        np_ = bparams["nodes"][str(kn)]
        if name == "transformer":
            continue  # covered by the fused-body attribution
        if name == "linear-2d":
            fn = lambda p, x, _n=np_: elastic_linear_apply(p, x, plan.activation, None)
            fb = lambda p, x: jax.value_and_grad(
                lambda pp, xx: fn(pp, xx).sum(), argnums=(0, 1))(p, x)
            total += timeit(f"b{i} linear-2d [{bp.dense_in}->{bp.dense_dim}] f+b",
                            fb, np_, dense_in)
        elif name == "sum":
            fb = lambda p, l, r: jax.value_and_grad(
                lambda pp, ll, rr: sum_apply(pp, ll, rr, None).sum(),
                argnums=(0, 1, 2))(p, l, r)
            total += timeit(f"b{i} sum [{bp.left_in},{bp.right_in}->{bp.dense_dim}] f+b",
                            fb, np_, left_in, right_in)
        elif name == "sigmoid-gating":
            fb = lambda p, l, r: jax.value_and_grad(
                lambda pp, ll, rr: sigmoid_gating_apply(pp, ll, rr, None).sum(),
                argnums=(0, 1, 2))(p, l, r)
            total += timeit(f"b{i} gating [{bp.left_in},{bp.right_in}->{bp.dense_dim}] f+b",
                            fb, np_, left_in, right_in)
        elif name == "dot-product":
            fb = lambda p, d, s, _s=bp.sparse_in: jax.value_and_grad(
                lambda pp, dd, ss: dot_product_apply_flat(
                    pp, dd, ss, _s, e, None).sum(), argnums=(0, 1, 2))(p, d, s)
            total += timeit(
                f"b{i} dot-product [d{bp.dense_in}, s{bp.sparse_in} -> {bp.dense_dim}] f+b",
                fb, np_, dense_in, sparse_in)
        elif name == "linear-3d":
            fb = lambda p, s, _s=bp.sparse_in: jax.value_and_grad(
                lambda pp, ss: elastic_linear3d_apply_flat(
                    pp, ss, _s, e, plan.activation, None).sum(),
                argnums=(0, 1))(p, s)
            total += timeit(
                f"b{i} linear-3d [s{bp.sparse_in} -> {bp.sparse_dim}] f+b",
                fb, np_, sparse_in)
    if bp.deep_fm:
        np_ = bparams["deep_fm"]
        sp_out = rnd(batch, bp.sparse_dim * e)
        fb = lambda p, s, _s=bp.sparse_dim: jax.value_and_grad(
            lambda pp, ss: fm3d_apply_flat(pp, ss, _s, e, None).sum(),
            argnums=(0, 1))(p, s)
        total += timeit(f"b{i} deep-fm [s{bp.sparse_dim}] f+b", fb, np_, sp_out)
    if bp.interact and "ds_proj" in bparams:
        from nasrec_tpu.ops.common import linear_apply
        d_out = rnd(batch, bp.dense_dim)
        fb = lambda p, x: jax.value_and_grad(
            lambda pp, xx: linear_apply(pp, xx).sum(), argnums=(0, 1))(p, x)
        total += timeit(f"b{i} ds_proj [{bp.dense_dim}->128] f+b", fb,
                        bparams["ds_proj"], d_out)

print(f"sum of standalone non-transformer ops: {total * 1e3:.2f} ms", flush=True)
