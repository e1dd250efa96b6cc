"""Op-level timing inside the slow blocks (0/5/6 of the flagship arch).

probe_body_blocks.py showed blocks 0/5/6 cost 59.5/30.0/52.1 ms f+b at
batch 32768 — all three contain the transformer node, and block0's cost
(S=26->64) exceeds block6's (S=104->48), so the cost is not FLOPs.  This
probe times each component of block0 in isolation, fwd and fwd+bwd.
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
    _mha_t,
    _transformer_emajor,
    transformer_apply_flat,
)
from nasrec_tpu.ops.common import (
    flat_to_emajor,
    emajor_to_flat,
    linear_apply,
    linear_apply_e,
    ln_apply_e,
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
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def timeit_fb(name, fn, *args, k=(4, 16)):
    def loss(a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return functools.reduce(
            lambda x, y: x + y, [l.astype(jnp.float32).sum() for l in leaves]
        )
    timeit(name, jax.grad(loss), tuple(args), k=k)


bp = plan.blocks[0]
e = plan.emb_dim
tp = params["blocks"][0]["nodes"]["4"]  # transformer node params
S_in, S_out = bp.sparse_in, bp.sparse_dim
print(f"block0: S_in={S_in} S_out={S_out} dense_dim={bp.dense_dim}")

s_flat = rand((batch, S_in * e))
xt_in = rand((batch, e, S_in))
xt = rand((batch, e, S_out))
q = rand((batch, e, S_out))

# 1. whole transformer node (flat -> flat)
fullfn = functools.partial(transformer_apply_flat, in_slots=S_in,
                           emb_dim=e, impl="pallas")
timeit("transformer fwd      ", lambda p, s: fullfn(p, s), tp, s_flat)
timeit_fb("transformer f+b      ", lambda p, s: fullfn(p, s), tp, s_flat)

# 2. components
timeit("  flat->emajor fwd   ", lambda s: flat_to_emajor(s, S_in, e), s_flat)
timeit("  slot proj fwd      ", lambda p, x: linear_apply(p["proj"], x), tp, xt_in)
timeit_fb("  slot proj f+b      ", lambda p, x: linear_apply(p["proj"], x), tp, xt_in)
timeit("  mha_t fwd           ", lambda p, x: _mha_t(p["mha"], x, 8), tp, xt)
timeit_fb("  mha_t f+b           ", lambda p, x: _mha_t(p["mha"], x, 8), tp, xt)
# (gen-2 E-major kernel removed; time HEAD's b-major kernel at its native
# stacked [3E, S, B] layout instead)
qkvb = jnp.concatenate([jnp.transpose(q, (1, 2, 0))] * 3, axis=0)
timeit("  pallas attn fwd     ",
       lambda a: tiny_head_attention_bmajor(a, 8), qkvb)
timeit_fb("  pallas attn f+b     ",
          lambda a: tiny_head_attention_bmajor(a, 8), qkvb)
timeit("  qkv proj (w_in) fwd ",
       lambda p, x: linear_apply_e(p["mha"]["w_in"], p["mha"]["b_in"], x), tp, xt)
timeit("  ffn fwd             ",
       lambda p, x: linear_apply_e(p["fc2"]["w"], p["fc2"].get("b"),
                                   jax.nn.relu(linear_apply_e(p["fc1"]["w"],
                                                              p["fc1"].get("b"), x))),
       tp, xt)
timeit("  ln_e fwd            ", lambda p, x: ln_apply_e(p["attn_ln"], x), tp, xt)
timeit_fb("  ln_e f+b            ", lambda p, x: ln_apply_e(p["attn_ln"], x), tp, xt)
timeit("  emajor->flat fwd    ", lambda x: emajor_to_flat(x), xt)

# 3. the full emajor body minus proj
timeit_fb("  emajor body f+b     ",
          lambda p, x: _transformer_emajor(p, x, None, 8), tp, xt)

# 4. sigmoid-gating node for contrast (the other node in block0)
from nasrec_tpu.ops.linear import sigmoid_gating_apply
gp = params["blocks"][0]["nodes"]["2"]
l_in = rand((batch, bp.left_in))
r_in = rand((batch, bp.right_in))
timeit_fb("sigmoid-gating f+b   ",
          lambda p, l, r: sigmoid_gating_apply(p, l, r), gp, l_in, r_in)
