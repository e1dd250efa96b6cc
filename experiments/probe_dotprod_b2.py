"""Decompose the flagship b2 dot-product node (d160, s162 -> 768): 13.6 ms
f+b measured (probe_body_attrib_r5.py) on BOTH impls, vs ~2 ms of
arithmetic — where does it go?

Stages (each timed standalone fwd AND fwd+bwd where meaningful):
  1. flat_to_emajor             [B, 2592] -> [B, 16, 162]
  2. slot_proj                  [B, 16, 162] -> [B, 16, 39] (linear_apply)
  3. concat dense col           -> [B, 16, 40]
  4a. pallas scores+tril        [16, 40, B] -> [780, B] (incl. transposes)
  4b. xla scores+tril           einsum bnm + static slices
  5. out_proj                   [780, B] -> [B, 768]
  6. full node fwd (pallas)     the production composition
  7. full node f+b (pallas)     = the 13.6 ms attribution number

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_dotprod_b2.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.ops.common import flat_to_emajor, linear_apply, linear_apply_e
from nasrec_tpu.ops.interactions import dot_product_apply_flat
from nasrec_tpu.ops.kernels.dotprod_pallas import dot_scores_tril_bmajor
from nasrec_tpu.profiling import chained_rate

batch = 32768
E = 16
spec = DATASETS["criteo-kaggle"]
choice = get_best_arch("criteo-kaggle", "xlarge")
plan = build_fixed_plan(
    choice, OPS_CONFIG_LIB["xlarge"], 7, spec.num_dense, spec.num_sparse,
    spec.vocab_sizes(None), use_layernorm=False, attention_impl="pallas",
)
params = fixed_init(jax.random.PRNGKey(0), plan)
bp = plan.blocks[2]
np_ = params["blocks"][2]["nodes"][
    [str(k) for k in bp.active_nodes
     if plan.space.node_names[k] == "dot-product"][0]
]
S_IN = bp.sparse_in
SLOT = np_["slot_proj"]["w"].shape[1] if "slot_proj" in np_ else S_IN
N = 1 + SLOT
P = N * (N - 1) // 2
print(f"b2 dot-product: s_in={S_IN} slot_dim={SLOT} n={N} pairs={P}", flush=True)

rng = np.random.RandomState(0)
dense = jnp.asarray((rng.randn(batch, bp.dense_in) * 0.1).astype(np.float32))
sflat = jnp.asarray((rng.randn(batch, S_IN * E) * 0.1).astype(np.float32))
yt_in = jnp.asarray((rng.randn(batch, E, S_IN) * 0.1).astype(np.float32))
t40b = jnp.asarray((rng.randn(E, N, batch) * 0.1).astype(np.float32))
z780 = jnp.asarray((rng.randn(P, batch) * 0.1).astype(np.float32))


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


timeit("1 flat_to_emajor fwd", lambda s: flat_to_emajor(s, S_IN, E), sflat)
if "sparse_proj" in np_:
    q = np_["sparse_proj"]
    timeit("1b sparse_proj (feature axis)",
           lambda s: linear_apply_e(q["w"], q.get("b"), flat_to_emajor(s, S_IN, E)),
           sflat)
timeit("2 slot_proj fwd", lambda y: linear_apply(np_["slot_proj"], y), yt_in)
timeit("4a pallas scores+tril fwd (incl transpose)",
       lambda t: dot_scores_tril_bmajor(
           jnp.transpose(t, (1, 2, 0)), False),
       jnp.transpose(t40b, (2, 0, 1)))
timeit("4a' pallas scores+tril fwd (pre-transposed)",
       lambda t: dot_scores_tril_bmajor(t, False), t40b)
q = np_["out_proj"]
timeit("5 out_proj pb,po->bo fwd",
       lambda z: jnp.einsum("pb,po->bo", z, q["w"]), z780)

fwd = lambda p, d, s: dot_product_apply_flat(p, d, s, S_IN, E, None, impl="pallas")
timeit("6 full node fwd (pallas)", fwd, np_, dense, sflat)
fb = lambda p, d, s: jax.value_and_grad(
    lambda pp, dd, ss: fwd(pp, dd, ss).sum(), argnums=(0, 1, 2))(p, d, s)
timeit("7 full node f+b (pallas)", fb, np_, dense, sflat)

fwd_x = lambda p, d, s: dot_product_apply_flat(p, d, s, S_IN, E, None, impl="xla")
timeit("6x full node fwd (xla)", fwd_x, np_, dense, sflat)
fbx = lambda p, d, s: jax.value_and_grad(
    lambda pp, dd, ss: fwd_x(pp, dd, ss).sum(), argnums=(0, 1, 2))(p, d, s)
timeit("7x full node f+b (xla)", fbx, np_, dense, sflat)
