"""Round-4 component attribution of the PRODUCTION flagship step.

probe_step_components.py predates the sweep/flat-stem production path; this
probe decomposes the step bench.py actually measures (packed table, sweep
update, flat slot-major stem, fused pallas bodies, batch 32768, full vocab)
into its pipeline stages, with slope timing + scalarized outputs (true
barriers), so the unattributed remainder of the ~144 ms step is visible.

Stages (each jitted standalone; boundary relayouts can make the sum exceed
the fused whole):
  1. packed_lookup + flat reshape         (production forward input)
  2. fwd+bwd of the embedded model        (pallas bodies, flat stem)
  3. prep: rowwise_segment_sum_slotwise   (batched column sort + segsum)
  4. clip norm + rest-optimizer update    (adagrad on the dense params)
  5. sweep_adagrad_update                 (packed table+acc stream)
  6. the full fused production step       (make_sparse_embedding_train_step)

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_step_attrib_r4.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.ops.kernels import table_sweep_pallas as tsp
from nasrec_tpu.profiling import chained_rate
from nasrec_tpu.train import make_optimizer
from nasrec_tpu.train.loop import init_train_state
from nasrec_tpu.train.optim import l2_penalty
from nasrec_tpu.train.sparse_embedding import (
    make_sparse_embedding_train_step,
    pack_state_for_sweep,
    rowwise_segment_sum_slotwise,
)
from nasrec_tpu.train.metrics import bce_with_logits

batch = 32768
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
offsets = np.asarray(table_offsets(vocab), np.int32)
choice = get_best_arch("criteo-kaggle", "xlarge")
plan = build_fixed_plan(choice, OPS_CONFIG_LIB["xlarge"], 7, spec.num_dense,
                        spec.num_sparse, vocab, use_layernorm=False,
                        attention_impl="pallas")
params = fixed_init(jax.random.PRNGKey(0), plan)
params_host = jax.device_get(params)

rng = np.random.RandomState(0)
cat = jnp.asarray(np.stack(
    [rng.randint(0, v, size=batch) for v in vocab], 1).astype(np.int32))
dense = jnp.asarray(rng.randn(batch, spec.num_dense).astype(np.float32))
y = jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32))

opt = make_optimizer("adagrad")
state = pack_state_for_sweep(init_train_state(params, opt))
table_p = state.params["embedding"]["table"]
acc_p = state.opt_state["embedding"]["table"]
rest = {k: v for k, v in state.params.items() if k != "embedding"}
opt_rest = {k: v for k, v in state.opt_state.items() if k != "embedding"}
idx = jax.jit(lambda c: (c + jnp.asarray(offsets)[None, :]).reshape(-1))(cat)
stem_flat = jax.jit(
    lambda t, i: tsp.packed_lookup(t, i).reshape(batch, -1)
)(table_p, idx)
g_stem = jnp.asarray(
    (rng.randn(batch * spec.num_sparse, 16) * 1e-2).astype(np.float32))
jax.block_until_ready(g_stem)


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


# 1. production forward input
t_lookup = timeit(
    "1 packed_lookup+flat", lambda t, i: tsp.packed_lookup(t, i).reshape(batch, -1),
    table_p, idx,
)

# 2. fwd+bwd of the embedded model on the flat stem
def fwdbwd(rp, s, d, yy):
    def loss(rpp, si):
        lg = fixed_apply_embedded(plan, rpp, d, si)
        return bce_with_logits(lg, yy)
    l, g = jax.value_and_grad(loss, argnums=(0, 1))(rp, s)
    return (l, g)

t_body = timeit("2 fwd+bwd embedded", fwdbwd, rest, stem_flat, dense, y)

# 2b. forward only (for the bwd share)
t_fwd = timeit(
    "2b forward only",
    lambda rp, s, d: fixed_apply_embedded(plan, rp, d, s), rest, stem_flat, dense,
)

# 3. prep
t_prep = timeit(
    "3 segsum slotwise",
    lambda c, g: rowwise_segment_sum_slotwise(
        c + jnp.asarray(offsets)[None, :], g),
    cat, g_stem,
)

# 4. clip + rest optimizer
def clip_and_update(rp, op, g, seg):
    sq_rest = sum(jnp.sum(jnp.square(l)) for l in jax.tree_util.tree_leaves(g))
    norm = jnp.sqrt(sq_rest + jnp.sum(jnp.square(seg)))
    scale = jnp.minimum(1.0, 5.0 / (norm + 1e-6))
    g = jax.tree_util.tree_map(lambda x: x * scale, g)
    return opt.update(rp, op, g, 0.1)

g_rest = jax.jit(lambda rp, s, d, yy: fwdbwd(rp, s, d, yy)[1][0])(
    rest, stem_flat, dense, y)
rows_s, seg_s, _ = jax.jit(
    lambda c, g: rowwise_segment_sum_slotwise(
        c + jnp.asarray(offsets)[None, :], g)
)(cat, g_stem)
t_opt = timeit("4 clip+rest-adagrad", clip_and_update, rest, opt_rest, g_rest, seg_s)

# 5. sweep (donates its table/acc inputs — snapshot to HOST first, chain
# through `box`)
table_host = jax.device_get(table_p)
acc_host = jax.device_get(acc_p)
box = {"t": table_p, "a": acc_p}
del table_p, acc_p

def run_sweep(kk):
    t, a = box["t"], box["a"]
    for _ in range(kk):
        t, a = tsp.sweep_adagrad_update(t, a, rows_s, seg_s, 0.01)
    box["t"], box["a"] = t, a
    jax.device_get(t[0, 0])

run_sweep(2)   # compile warmup
dt = chained_rate(run_sweep, 3, 12)
print(f"5 sweep update: {dt * 1e3:.2f} ms", flush=True)
t_sweep = dt
del box        # free 4.3 GB before the full-step state is built

# 6. full production step
fresh = jax.tree_util.tree_map(jnp.asarray, params_host)
state = pack_state_for_sweep(init_train_state(fresh, opt))
step = make_sparse_embedding_train_step(
    lambda p, d, s: fixed_apply_embedded(plan, p, d, s),
    opt, lambda s: jnp.asarray(0.1), offsets, grad_clip=5.0,
    table_update="sweep",
)
sbox = {"s": state}

def run_step(kk):
    st = sbox["s"]
    m = None
    for _ in range(kk):
        st, m = step(st, dense, cat, y)
    sbox["s"] = st
    jax.device_get(m["loss"])

run_step(3)
dt = chained_rate(run_step, 3, 12)
print(f"6 full production step: {dt * 1e3:.2f} ms", flush=True)
parts = t_lookup + t_body + t_prep + t_opt + t_sweep
print(f"sum of stages 1-5: {parts * 1e3:.2f} ms "
      f"(unattributed in full step: {(dt - parts) * 1e3:.2f} ms)", flush=True)
