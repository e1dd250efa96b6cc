"""Transformer node over the sparse-slot axis.

Reference semantics (ref: nasrec/supernet/modules.py:599-688):
  1. slot projection S_in -> out_slots (transpose-linear) + optional LN over the
     projected slot axis
  2. slot mask (supernet mode)
  3. 8-head self-attention (E=16 -> head_dim=2), residual, LN with weight
     initialised to LN_INIT=0.17 (ref :598, :637)
  4. two FC layers E->E with ReLU (hard-coded relu, ref :671), residual,
     LN(0.17)
  5. slot mask again

The two residual LayerNorms exist regardless of `use_layernorm`; only the
projection LN is conditional (ref :622, :625, :630).

Pallas path layout: the body runs BATCH-ON-LANES [E, S, B] end-to-end
between one boundary transpose each way (~0.5 ms at [32768, 16, 64]).
With head_dim 2 the attention math is outer-product/VPU work, and batch on
the lane axis makes every op lane-parallel with no padding at any S that is
a multiple of 8 (sparse_node_dims are 16..64) — see
ops/kernels/attention_pallas.py for the kernel's generation history.  The
feature linears (qkv/out/fc1/fc2) contract E=16 on the MAJOR axis: XLA
lowers them as [E_out, E] x [E, S*B] single dots with a huge minor dim.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nasrec_tpu.config import LN_INIT, NUM_MHA_HEADS
from nasrec_tpu.ops.common import (
    LN_EPS,
    Params,
    _xavier_uniform,
    apply_mask,
    linear_apply,
    linear_init,
    ln_apply,
    ln_init,
)


def transformer_init(
    key,
    in_slots: int,
    out_slots: int,
    emb_dim: int,
    use_layernorm: bool,
    num_heads: int = NUM_MHA_HEADS,
) -> Params:
    keys = jax.random.split(key, 5)
    p: Params = {
        "proj": linear_init(keys[0], in_slots, out_slots, use_bias=not use_layernorm),
        # Combined qkv projection, matching torch MultiheadAttention's
        # in_proj_weight fan-in/fan-out (E, 3E) for init statistics.
        "mha": {
            "w_in": _xavier_uniform(keys[1], emb_dim, 3 * emb_dim, (emb_dim, 3 * emb_dim)),
            "b_in": jnp.zeros((3 * emb_dim,), jnp.float32),
            "w_out": _xavier_uniform(keys[2], emb_dim, emb_dim, (emb_dim, emb_dim)),
            "b_out": jnp.zeros((emb_dim,), jnp.float32),
        },
        "attn_ln": ln_init(emb_dim, weight_init=LN_INIT),
        "fc1": linear_init(keys[3], emb_dim, emb_dim, use_bias=True),
        "fc2": linear_init(keys[4], emb_dim, emb_dim, use_bias=True),
        "fc_ln": ln_init(emb_dim, weight_init=LN_INIT),
    }
    if use_layernorm:
        p["proj_ln"] = ln_init(out_slots)
    return p


def _mha(p: Params, x: jnp.ndarray, num_heads: int, impl: str = "xla") -> jnp.ndarray:
    """Multi-head self-attention on S-major [B, S, E]; softmax in f32."""
    b, s, e = x.shape
    hd = e // num_heads
    qkv = jnp.dot(x, p["w_in"].astype(x.dtype)) + p["b_in"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    if impl == "pallas":
        from nasrec_tpu.ops.kernels.attention_pallas import fused_tiny_head_attention

        out = fused_tiny_head_attention(
            q, k, v, num_heads, jax.default_backend() != "tpu"
        )
    else:
        def heads(t):
            return t.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)  # [B,H,S,hd]

        qh, kh, vh = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
            jnp.asarray(hd, x.dtype)
        )
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, e)
    return jnp.dot(out, p["w_out"].astype(x.dtype)) + p["b_out"].astype(x.dtype)


def _linear_b(w: jnp.ndarray, b, x: jnp.ndarray) -> jnp.ndarray:
    """Feature linear on b-major [E_in, S, B]: contract the major axis.
    w is stored [E_in, E_out] (apply = x @ w in S-major terms)."""
    y = jnp.einsum("ef,esb->fsb", w.astype(x.dtype), x)
    if b is not None:
        y = y + b.astype(x.dtype)[:, None, None]
    return y


def _ln_b(p: Params, x: jnp.ndarray, axis: int, eps: float = LN_EPS) -> jnp.ndarray:
    """LayerNorm over `axis` of b-major [E, S, B]; stats in f32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axis, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    shape = [1, 1, 1]
    shape[axis] = x.shape[axis]
    y = y * p["scale"].reshape(shape) + p["bias"].reshape(shape)
    return y.astype(x.dtype)


def _transformer_bmajor(
    p: Params, xb: jnp.ndarray, slot_mask, num_heads: int
) -> jnp.ndarray:
    """Post-projection transformer body on b-major [E, out_slots, B].

    The whole body (qkv/attention/out/LN/FFN/LN) runs as ONE fused Pallas
    kernel (ops/kernels/transformer_body_pallas.py) — the unfused variant
    below paid ~2x the kernel's time again in XLA glue round trips
    (experiments/probe_block0_ops.py).  Slot masks stay outside the kernel
    (exact mask gradients; fixed mode passes None and pays nothing)."""
    from nasrec_tpu.ops.kernels.transformer_body_pallas import (
        transformer_body_fused_params,
    )

    interpret = jax.default_backend() != "tpu"
    xb = apply_mask(xb, slot_mask, axis=1)    # mask slot axis (ref :653-662)
    out = transformer_body_fused_params(p, xb, num_heads, interpret)
    return apply_mask(out, slot_mask, axis=1)  # final slot mask (ref :678-686)


def _transformer_bmajor_unfused(
    p: Params, xb: jnp.ndarray, slot_mask, num_heads: int
) -> jnp.ndarray:
    """Op-by-op b-major body (the fused kernel's reference in tests)."""
    from nasrec_tpu.ops.kernels.attention_pallas import tiny_head_attention_bmajor

    interpret = jax.default_backend() != "tpu"
    xb = apply_mask(xb, slot_mask, axis=1)    # mask slot axis (ref :653-662)
    qkv = _linear_b(p["mha"]["w_in"], p["mha"]["b_in"], xb)   # [3E, S, B]
    attn = tiny_head_attention_bmajor(qkv, num_heads, interpret)
    attn = _linear_b(p["mha"]["w_out"], p["mha"]["b_out"], attn)
    xb = _ln_b(p["attn_ln"], attn + xb, axis=0)  # residual + LN(0.17) (ref :666-668)
    h = jax.nn.relu(_linear_b(p["fc1"]["w"], p["fc1"].get("b"), xb))
    h = _linear_b(p["fc2"]["w"], p["fc2"].get("b"), h)
    xb = _ln_b(p["fc_ln"], xb + h, axis=0)    # residual + LN(0.17) (ref :673-675)
    return apply_mask(xb, slot_mask, axis=1)  # final slot mask (ref :678-686)


def _slot_proj_bmajor(p: Params, xb: jnp.ndarray) -> jnp.ndarray:
    """Slot projection S_in -> out_slots on b-major [E, S_in, B]."""
    y = jnp.einsum("esb,st->etb", xb, p["proj"]["w"].astype(xb.dtype))
    if "b" in p["proj"]:
        y = y + p["proj"]["b"].astype(xb.dtype)[None, :, None]
    if "proj_ln" in p:
        y = _ln_b(p["proj_ln"], y, axis=1)
    return y


def transformer_apply_flat(
    p: Params,
    sparse: jnp.ndarray,  # [B, S_in*E] slot-major flat
    in_slots: int,
    emb_dim: int,
    slot_mask: Optional[jnp.ndarray] = None,
    num_heads: int = NUM_MHA_HEADS,
    impl: str = "xla",
) -> jnp.ndarray:
    """Flat-layout transformer: [B, S_in*E] -> [B, out_slots*E]."""
    if impl != "pallas":
        x3 = sparse.reshape(sparse.shape[0], in_slots, emb_dim)
        out = transformer_apply(p, x3, slot_mask, num_heads, impl)
        return out.reshape(out.shape[0], -1)
    b = sparse.shape[0]
    x3 = sparse.reshape(b, in_slots, emb_dim)
    xb = jnp.transpose(x3, (2, 1, 0))                # [E, S_in, B]
    xb = _slot_proj_bmajor(p, xb)                    # [E, out_slots, B]
    out = _transformer_bmajor(p, xb, slot_mask, num_heads)
    return jnp.transpose(out, (2, 1, 0)).reshape(b, -1)


def transformer_apply(
    p: Params,
    sparse: jnp.ndarray,  # [B, S_in, E]
    slot_mask: Optional[jnp.ndarray] = None,
    num_heads: int = NUM_MHA_HEADS,
    impl: str = "xla",
) -> jnp.ndarray:
    if impl == "pallas":
        xb = jnp.transpose(sparse, (2, 1, 0))        # [E, S_in, B]
        xb = _slot_proj_bmajor(p, xb)
        out = _transformer_bmajor(p, xb, slot_mask, num_heads)
        return jnp.transpose(out, (2, 1, 0))

    xt = jnp.swapaxes(sparse, 1, 2)           # [B, E, S_in]
    xt = linear_apply(p["proj"], xt)
    if "proj_ln" in p:
        xt = ln_apply(p["proj_ln"], xt)

    x = jnp.swapaxes(xt, 1, 2)                # [B, out_slots, E]
    x = apply_mask(x, slot_mask, axis=1)      # mask slot axis (ref :653-662)

    attn = _mha(p["mha"], x, num_heads, impl)
    x = ln_apply(p["attn_ln"], attn + x)      # residual + LN(0.17) (ref :666-668)

    h = jax.nn.relu(linear_apply(p["fc1"], x))  # hard-coded relu (ref :671)
    h = linear_apply(p["fc2"], h)
    x = ln_apply(p["fc_ln"], x + h)           # residual + LN(0.17) (ref :673-675)

    return apply_mask(x, slot_mask, axis=1)   # final slot mask (ref :678-686)
