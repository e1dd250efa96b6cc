"""Does per-block rematerialisation beat saved residuals at flagship scale?

The r4 attribution (probe_step_attrib_r4.py) puts the model fwd+bwd at
75.1 ms while its matmul FLOPs are ~2-3 ms of MXU time — the backward is
dominated by residual/layout traffic, not arithmetic.  jax.checkpoint per
block (FixedPlan.remat_blocks, already wired in models/fixed.py:266) trades
a second forward (cheap FLOPs) for not saving/reloading intra-block
residuals.  This probe measures fwd+bwd of the embedded flagship model with
remat off/on, pallas bodies, batch 32768.

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_remat_body.py
"""
import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.embedding import table_offsets
from nasrec_tpu.models.fixed import fixed_apply_embedded
from nasrec_tpu.profiling import chained_rate
from nasrec_tpu.train.metrics import bce_with_logits

batch = 32768
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
offsets = np.asarray(table_offsets(vocab), np.int32)
choice = get_best_arch("criteo-kaggle", "xlarge")
base_plan = build_fixed_plan(
    choice, OPS_CONFIG_LIB["xlarge"], 7, spec.num_dense, spec.num_sparse,
    vocab, use_layernorm=False, attention_impl="pallas",
)
params = fixed_init(jax.random.PRNGKey(0), base_plan)
rest = {k: v for k, v in params.items() if k != "embedding"}

rng = np.random.RandomState(0)
cat = jnp.asarray(np.stack(
    [rng.randint(0, v, size=batch) for v in vocab], 1).astype(np.int32))
dense = jnp.asarray(rng.randn(batch, spec.num_dense).astype(np.float32))
y = jnp.asarray(rng.randint(0, 2, size=(batch, 1)).astype(np.float32))
stem = jax.jit(
    lambda t, c: jnp.take(
        t, (c + jnp.asarray(offsets)[None, :]).reshape(-1), axis=0
    ).reshape(batch, -1)
)(params["embedding"]["table"], cat)


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


for label, plan in (
    ("remat OFF", base_plan),
    ("remat ON ", dataclasses.replace(base_plan, remat_blocks=True)),
):
    def fwdbwd(rp, s, d, yy, _plan=plan):
        def loss(rpp, si):
            lg = fixed_apply_embedded(_plan, rpp, d, si)
            return bce_with_logits(lg, yy)
        return jax.value_and_grad(loss, argnums=(0, 1))(rp, s)

    timeit(f"fwd+bwd {label}", fwdbwd, rest, stem, dense, y)
