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

At slot counts <= ~530 and E=16 this attention is tiny; a single fused XLA
einsum chain is already bandwidth-optimal on TPU — no flash-attention needed
(see SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nasrec_tpu.config import LN_INIT, NUM_MHA_HEADS
from nasrec_tpu.ops.common import (
    Params,
    _xavier_uniform,
    apply_mask,
    emajor_to_flat,
    flat_to_emajor,
    linear_apply,
    linear_apply_e,
    linear_init,
    ln_apply,
    ln_apply_e,
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


_linear_e = linear_apply_e
_ln_e = ln_apply_e


def _mha_t(p: Params, xt: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Multi-head self-attention on E-MAJOR [B, E, S] via the fused Pallas
    kernel — no [B, S, E] lane-padded tensors anywhere (E=16 pads 8x on
    lanes; on sublanes it is exactly two (8,128) tiles)."""
    from nasrec_tpu.ops.kernels.attention_pallas import fused_tiny_head_attention_t

    qkv = _linear_e(p["w_in"], p["b_in"], xt)          # [B, 3E, S]
    e = xt.shape[1]
    q, k, v = qkv[:, :e], qkv[:, e:2 * e], qkv[:, 2 * e:]
    out = fused_tiny_head_attention_t(
        q, k, v, num_heads, jax.default_backend() != "tpu"
    )
    return _linear_e(p["w_out"], p["b_out"], out)


def _transformer_emajor(
    p: Params, xt: jnp.ndarray, slot_mask, num_heads: int
) -> jnp.ndarray:
    """Post-projection transformer body on E-major [B, E, out_slots]: every
    [B, S, E] intermediate would pad E=16 -> 128 lanes (8x traffic); on
    sublanes E is exactly two (8,128) tiles.  Same math as the S-major path
    in `transformer_apply`."""
    xt = apply_mask(xt, slot_mask, axis=2)    # mask slot axis (ref :653-662)
    attn = _mha_t(p["mha"], xt, num_heads)
    xt = _ln_e(p["attn_ln"], attn + xt)       # residual + LN(0.17) (ref :666-668)
    h = jax.nn.relu(_linear_e(p["fc1"]["w"], p["fc1"].get("b"), xt))
    h = _linear_e(p["fc2"]["w"], p["fc2"].get("b"), h)
    xt = _ln_e(p["fc_ln"], xt + h)            # residual + LN(0.17) (ref :673-675)
    return apply_mask(xt, slot_mask, axis=2)  # final slot mask (ref :678-686)


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
    xt = flat_to_emajor(sparse, in_slots, emb_dim)   # [B, E, S_in]
    xt = linear_apply(p["proj"], xt)                 # [B, E, out_slots]
    if "proj_ln" in p:
        xt = ln_apply(p["proj_ln"], xt)
    return emajor_to_flat(_transformer_emajor(p, xt, slot_mask, num_heads))


def transformer_apply(
    p: Params,
    sparse: jnp.ndarray,  # [B, S_in, E]
    slot_mask: Optional[jnp.ndarray] = None,
    num_heads: int = NUM_MHA_HEADS,
    impl: str = "xla",
) -> jnp.ndarray:
    xt = jnp.swapaxes(sparse, 1, 2)          # [B, E, S_in]
    xt = linear_apply(p["proj"], xt)          # [B, E, out_slots]
    if "proj_ln" in p:
        xt = ln_apply(p["proj_ln"], xt)

    if impl == "pallas":
        return jnp.swapaxes(
            _transformer_emajor(p, xt, slot_mask, num_heads), 1, 2
        )

    x = jnp.swapaxes(xt, 1, 2)                # [B, out_slots, E]
    x = apply_mask(x, slot_mask, axis=1)      # mask slot axis (ref :653-662)

    attn = _mha(p["mha"], x, num_heads, impl)
    x = ln_apply(p["attn_ln"], attn + x)      # residual + LN(0.17) (ref :666-668)

    h = jax.nn.relu(linear_apply(p["fc1"], x))  # hard-coded relu (ref :671)
    h = linear_apply(p["fc2"], h)
    x = ln_apply(p["fc_ln"], x + h)           # residual + LN(0.17) (ref :673-675)

    return apply_mask(x, slot_mask, axis=1)   # final slot mask (ref :678-686)
