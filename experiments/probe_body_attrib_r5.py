"""Round-5 attribution INSIDE the flagship model body, on the PRODUCTION
(impl='pallas') paths.

probe_step_attrib_r4 re-run this round puts the body at 69.9 ms fwd+bwd
(fwd 20.6) of the 127.7 ms step; probe_ops_at_shape_r4 measured the
dot-product nodes on the superseded XLA path (13.7 + 5.3 ms).  This probe
times every node's PRODUCTION implementation standalone at its exact
flagship shape (batch 32768), so the body's remaining time decomposes into
(a) the 3 fused transformer bodies, (b) the 2 Pallas dot-products,
(c) the cheap dense/linear/fm glue ops, (d) unattributed XLA stitching.

Also prints dot-FLOPs of the embedded fwd+bwd (per example and total) and
the implied MXU time at the chip's measured matmul peak — the roofline
denominator for "is the body near its arithmetic?".

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_body_attrib_r5.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.ops.interactions import dot_product_apply_flat
from nasrec_tpu.ops.attention import transformer_apply_flat
from nasrec_tpu.profiling import chained_rate, dot_flops
from nasrec_tpu.train.metrics import bce_with_logits

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
names = plan.space.node_names


def rnd(*shape):
    return jnp.asarray((rng.randn(*shape) * 0.1).astype(np.float32))


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


e = plan.emb_dim
t_transformer = 0.0
t_dotprod = 0.0
for i, bp in enumerate(plan.blocks):
    bparams = params["blocks"][i]
    if isinstance(bparams, dict) and str(i) in params["blocks"]:
        bparams = params["blocks"][str(i)]
    for kn in bp.active_nodes:
        name = names[kn]
        np_ = bparams["nodes"][str(kn)]
        if name == "transformer":
            x = rnd(batch, bp.sparse_in * e)
            fb = lambda p, s, _s=bp.sparse_in: jax.value_and_grad(
                lambda pp, ss: transformer_apply_flat(
                    pp, ss, _s, e, impl="pallas").sum(), argnums=(0, 1))(p, s)
            t_transformer += timeit(
                f"b{i} transformer[pallas] [s{bp.sparse_in}->s{bp.sparse_dim}] f+b",
                fb, np_, x,
            )
        elif name == "dot-product":
            d = rnd(batch, bp.dense_in)
            s = rnd(batch, bp.sparse_in * e)
            fb = lambda p, dd, ss, _s=bp.sparse_in: jax.value_and_grad(
                lambda pp, d2, s2: dot_product_apply_flat(
                    pp, d2, s2, _s, e, None, impl="pallas").sum(),
                argnums=(0, 1, 2))(p, dd, ss)
            t_dotprod += timeit(
                f"b{i} dot-product[pallas] [d{bp.dense_in}, s{bp.sparse_in} -> {bp.dense_dim}] f+b",
                fb, np_, d, s,
            )

print(f"transformer bodies total: {t_transformer*1e3:.2f} ms", flush=True)
print(f"pallas dot-products total: {t_dotprod*1e3:.2f} ms", flush=True)

# Whole embedded body fwd+bwd (the attribution's stage-2 number) + roofline.
stem = rnd(batch, spec.num_sparse * e)
dense = rnd(batch, spec.num_dense)
y = jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32))
rest = {k: v for k, v in params.items() if k != "embedding"}


def fwdbwd(rp, s, d, yy):
    def loss(rpp, si):
        lg = fixed_apply_embedded(plan, rpp, d, si)
        return bce_with_logits(lg, yy)
    return jax.value_and_grad(loss, argnums=(0, 1))(rp, s)


t_body = timeit("embedded body f+b (stage-2 cross-check)", fwdbwd, rest, stem, dense, y)

fl = dot_flops(fwdbwd, rest, stem, dense, y)
print(f"fwd+bwd dot-FLOPs: {fl/1e9:.1f} GFLOP total, "
      f"{fl/batch/1e6:.2f} MFLOP/example", flush=True)
from nasrec_tpu.profiling import calibrate_chip
calib = calibrate_chip(trials=8)
mm = calib["matmul_flops_per_s"]
print(f"measured matmul peak {mm/1e12:.1f} TFLOP/s -> MXU floor "
      f"{fl/mm*1e3:.2f} ms ({fl/mm/t_body*100:.1f}% of body)", flush=True)
print(f"accounted: transformer {t_transformer*1e3:.1f} + dotprod "
      f"{t_dotprod*1e3:.1f} = {(t_transformer+t_dotprod)*1e3:.1f} ms; "
      f"remainder (glue/linears/gating/fm/concat): "
      f"{(t_body-t_transformer-t_dotprod)*1e3:.1f} ms", flush=True)
