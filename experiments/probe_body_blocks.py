"""Per-block fwd / fwd+bwd timing of the flagship body (flat layout).

The full step is ~212 ms at batch 32768 with only ~72 ms of embedding work
and ~3 ms of MXU math — this probe attributes the remaining body time block
by block, then op by op inside the worst block.
Run: PYTHONPATH=/root/repo python experiments/probe_body_blocks.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.models.fixed import _gather_concat, _make_block_fn
from nasrec_tpu.profiling import chained_rate

batch = 32768
spec = DATASETS["criteo-kaggle"]
vocab = spec.vocab_sizes(None)
choice = get_best_arch("criteo-kaggle", "xlarge")
plan = build_fixed_plan(choice, OPS_CONFIG_LIB["xlarge"], 7, spec.num_dense,
                        spec.num_sparse, vocab, use_layernorm=False,
                        attention_impl="pallas")
params = fixed_init(jax.random.PRNGKey(0), plan)
rng = np.random.RandomState(0)


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


def rand(shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)


# Reconstruct per-block input shapes by walking the plan.
dense_dims = [spec.num_dense] + [bp.dense_dim for bp in plan.blocks]
sparse_flats = [spec.num_sparse * plan.emb_dim] + [
    bp.out_slots * plan.emb_dim for bp in plan.blocks
]

for i, bp in enumerate(plan.blocks):
    d_in = rand((batch, bp.dense_in))
    s_in = rand((batch, bp.sparse_in * plan.emb_dim))
    l_in = rand((batch, bp.left_in))
    r_in = rand((batch, bp.right_in))
    bfn = _make_block_fn(plan, i, bp)
    bparams = params["blocks"][i]
    timeit(f"block{i} fwd ", bfn, bparams, d_in, s_in, l_in, r_in)

    def fb(bp_, d, s, l, r):
        def loss(args):
            do, so = bfn(args[0], args[1], args[2], args[3], args[4])
            return do.sum() + so.sum()
        return jax.grad(loss)((bp_, d, s, l, r))

    timeit(f"block{i} f+b ", fb, bparams, d_in, s_in, l_in, r_in)
