"""Supernet-step attribution + roofline (round 5; VERDICT r4 weak #2).

The canonical bs-512 supernet step runs 31.85 ms (~16.1k ex/s) and the SAME
per-example rate at bs 8192 — a real compute wall, previously unattributed.
This probe measures, at bs 8192 (per-node costs at bs 512 drown in dispatch):

  1. supernet step time (cross-check vs bench/probe_stale_rows)
  2. embedded supernet forward alone and fwd+bwd (body vs embedding split)
  3. dot-FLOPs per example of the step + achieved TFLOP/s vs the measured
     matmul peak -> the supernet MFU that bench now reports
  4. every node TYPE standalone f+b at the LAST block's max widths
     (dense_in 6157, sparse_in 458 slots; block costs grow ~linearly with
     block index, so block-6 x 7/2 approximates the per-type total)

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_supernet_attrib_r5.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB, SEARCH_MAX_NUM_EMBEDDINGS
from nasrec_tpu.models import SuperNetConfig, supernet_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.supernet import supernet_apply_embedded, _node_init
from nasrec_tpu.ops import (
    dot_product_apply_flat,
    elastic_linear3d_apply_flat,
    elastic_linear_apply,
    fm3d_apply_flat,
    sigmoid_gating_apply,
    sum_apply,
    transformer_apply_flat,
)
from nasrec_tpu.profiling import calibrate_chip, chained_rate, dot_flops
from nasrec_tpu.sampling import ChoiceSampler, DeviceMaskBuffer
from nasrec_tpu.train import make_optimizer
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.metrics import bce_with_logits
from nasrec_tpu.train.optim import make_lr_schedule
from nasrec_tpu.train.sparse_embedding import make_sparse_embedding_train_step

BS = 8192
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(SEARCH_MAX_NUM_EMBEDDINGS)
space = OPS_CONFIG_LIB["xlarge"]
cfg = SuperNetConfig(
    space=space, num_blocks=7, num_dense=spec.num_dense,
    num_sparse=spec.num_sparse, vocab_sizes=tuple(vocab), use_layernorm=True,
)
params = supernet_init(jax.random.PRNGKey(0), cfg)
# The train step donates its state, deleting these leaves — keep a host
# snapshot for the body-only stages below.
params_host = jax.device_get(params)
rng = np.random.RandomState(0)
opt = make_optimizer("adagrad")

masks_buf = DeviceMaskBuffer(
    ChoiceSampler(space, 7, strategy="default", anypath_choice="binomial-0.5",
                  supernet_training_steps=100, seed=0),
    size=8,
)
dense = jnp.asarray(rng.randn(BS, spec.num_dense).astype(np.float32))
cat = jnp.asarray(np.stack(
    [rng.randint(0, v, size=BS) for v in vocab], 1).astype(np.int32))
y = jnp.asarray(rng.randint(0, 2, size=(BS, 1)).astype(np.float32))

step = make_sparse_embedding_train_step(
    lambda p, d, s, m: supernet_apply_embedded(cfg, p, d, s, m),
    opt, make_lr_schedule("cosine", 0.12, 10_000, 1_000),
    table_offsets(vocab), grad_clip=5.0, has_masks=True,
)
box = {"s": init_train_state(params, opt)}


def run_step(k):
    st = box["s"]
    m = None
    for i in range(k):
        st, m = step(st, dense, cat, y, masks_buf())
    box["s"] = st
    jax.device_get(m["loss"])


run_step(3)
dt_step = chained_rate(run_step, 3, 10)
print(f"supernet step bs{BS}: {dt_step*1e3:.1f} ms "
      f"({BS/dt_step/1e3:.1f}k ex/s)", flush=True)

fl = dot_flops(step, box["s"], dense, cat, y, masks_buf())
mm = calibrate_chip(trials=8)["matmul_flops_per_s"]
print(f"step dot-FLOPs: {fl/1e9:.1f} GFLOP ({fl/BS/1e6:.1f} MFLOP/example); "
      f"achieved {fl/dt_step/1e12:.2f} TFLOP/s = "
      f"{fl/dt_step/mm*100:.1f}% of measured matmul peak "
      f"({mm/1e12:.0f} TFLOP/s)", flush=True)
del box


def timeit(name, fn, *args, k=(3, 10)):
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


# 2. body alone (embedded fwd / fwd+bwd on a fixed stem)
stem = jnp.asarray((rng.randn(BS, spec.num_sparse * cfg.emb_dim) * 0.1
                    ).astype(np.float32))
rest = jax.tree_util.tree_map(
    jnp.asarray, {k: v for k, v in params_host.items() if k != "embedding"}
)
buf, sel = masks_buf()   # (device buffer, index) -> select one mask pytree
m0 = jax.tree_util.tree_map(lambda x: x[sel], buf)


def fwd(rp, s, d, m):
    return supernet_apply_embedded(cfg, rp, d, s, m)


def fwdbwd(rp, s, d, yy, m):
    def loss(rpp, si):
        return bce_with_logits(supernet_apply_embedded(cfg, rpp, d, si, m), yy)
    return jax.value_and_grad(loss, argnums=(0, 1))(rp, s)


timeit("supernet body fwd", fwd, rest, stem, dense, m0)
timeit("supernet body f+b", fwdbwd, rest, stem, dense, y, m0)

# 4. per-node-type standalone f+b at the LAST block's widths
i = cfg.num_blocks - 1
d_in = cfg.block_dense_in(i)
s_in = cfg.block_sparse_in(i)
e = cfg.emb_dim
print(f"block {i} widths: dense_in={d_in} sparse_in={s_in}", flush=True)
key = jax.random.PRNGKey(7)
xd = jnp.asarray((rng.randn(BS, d_in) * 0.1).astype(np.float32))
xs = jnp.asarray((rng.randn(BS, s_in * e) * 0.1).astype(np.float32))

for name in space.node_names:
    p = _node_init(key, cfg, i, name)
    if name == "linear-2d":
        fb = lambda pp, x: jax.value_and_grad(
            lambda q, xx: elastic_linear_apply(q, xx, cfg.activation, None).sum(),
            argnums=(0, 1))(pp, x)
        timeit(f"node {name} [{d_in}->1024] f+b", fb, p, xd)
    elif name == "dot-product":
        fb = lambda pp, d2, s2: jax.value_and_grad(
            lambda q, dd, ss: dot_product_apply_flat(
                q, dd, ss, s_in, e, None, impl="pallas").sum(),
            argnums=(0, 1, 2))(pp, d2, s2)
        timeit(f"node {name} [d{d_in}, s{s_in}] f+b", fb, p, xd, xs)
    elif name == "sigmoid-gating":
        fb = lambda pp, l, r: jax.value_and_grad(
            lambda q, ll, rr: sigmoid_gating_apply(q, ll, rr, None).sum(),
            argnums=(0, 1, 2))(pp, l, r)
        timeit(f"node {name} [{d_in}x2] f+b", fb, p, xd, xd)
    elif name == "sum":
        fb = lambda pp, l, r: jax.value_and_grad(
            lambda q, ll, rr: sum_apply(q, ll, rr, None).sum(),
            argnums=(0, 1, 2))(pp, l, r)
        timeit(f"node {name} [{d_in}x2] f+b", fb, p, xd, xd)
    elif name == "transformer":
        fb = lambda pp, s2: jax.value_and_grad(
            lambda q, ss: transformer_apply_flat(
                q, ss, s_in, e, impl="pallas").sum(), argnums=(0, 1))(pp, s2)
        timeit(f"node {name} [s{s_in}->s{space.max_sparse_dim}] f+b", fb, p, xs)
    elif name == "linear-3d":
        fb = lambda pp, s2: jax.value_and_grad(
            lambda q, ss: elastic_linear3d_apply_flat(
                q, ss, s_in, e, cfg.activation, None).sum(),
            argnums=(0, 1))(pp, s2)
        timeit(f"node {name} [s{s_in}] f+b", fb, p, xs)
