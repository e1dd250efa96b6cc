"""Op-level timing inside the transformer node (block 0 of the flagship).

probe_body_blocks.py showed blocks 0/5/6 (the transformer-bearing ones) cost
37.8/6.5/26.9 ms f+b at batch 32768 after the gen-3 batch-on-lanes kernel.
This probe splits block 0's transformer node into (a) the Pallas attention
kernel proper and (b) the XLA glue around it (slot proj, qkv/out/fc linears,
LNs, residuals, boundary transposes) — the fusion target.

NOTE standalone-op timings at these shapes are DOMINATED by jit-boundary
relayouts (a lone qkv einsum measures 21 ms vs ~1-2 ms in context,
experiments/probe_fused_linear_variants.py) — so this probe times nested
SUBGRAPHS of the real node, not isolated ops, and attributes by differences.

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_block0_ops.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.config import DATASETS, OPS_CONFIG_LIB
from nasrec_tpu.configs import get_best_arch
from nasrec_tpu.models import build_fixed_plan, fixed_init
from nasrec_tpu.ops.attention import (
    _slot_proj_bmajor,
    _transformer_bmajor,
    transformer_apply_flat,
)
from nasrec_tpu.ops.kernels.attention_pallas import tiny_head_attention_bmajor
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


def rand(shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)


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
    print(f"{name}: {dt * 1e3:7.2f} ms", flush=True)
    return dt


def timeit_fb(name, fn, *args, k=(4, 16)):
    def loss(a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return functools.reduce(
            lambda x, y: x + y, [l.astype(jnp.float32).sum() for l in leaves]
        )
    return timeit(name, jax.grad(loss), tuple(args), k=k)


for blk in (0, 5, 6):
    bp = plan.blocks[blk]
    e = plan.emb_dim
    tp = params["blocks"][blk]["nodes"]["4"]
    S_in, S_out = bp.sparse_in, bp.sparse_dim
    print(f"--- block{blk}: S_in={S_in} S_out={S_out}", flush=True)

    s_flat = rand((batch, S_in * e))
    xb_out = rand((e, S_out, batch))   # post-projection b-major activations
    qkvb = rand((3 * e, S_out, batch))

    fullfn = functools.partial(transformer_apply_flat, in_slots=S_in,
                               emb_dim=e, impl="pallas")
    t_full_f = timeit("node fwd            ", lambda p, s: fullfn(p, s),
                      tp, s_flat)
    t_full = timeit_fb("node f+b            ", lambda p, s: fullfn(p, s),
                       tp, s_flat)
    t_attn_f = timeit("attn kernel fwd     ",
                      lambda a: tiny_head_attention_bmajor(a, 8), qkvb)
    t_attn = timeit_fb("attn kernel f+b     ",
                       lambda a: tiny_head_attention_bmajor(a, 8), qkvb)
    # post-projection body (kernel + all glue, no slot proj / transposes)
    t_body = timeit_fb("bmajor body f+b     ",
                       lambda p, x: _transformer_bmajor(p, x, None, 8),
                       tp, xb_out)
    t_proj = timeit_fb("slot proj f+b       ",
                       lambda p, x: _slot_proj_bmajor(p, x),
                       tp, rand((e, S_in, batch)))
    print(f"=> glue f+b (body - kernel): {1e3 * (t_body - t_attn):.2f} ms; "
          f"boundary+proj (node - body): {1e3 * (t_full - t_body):.2f} ms",
          flush=True)
