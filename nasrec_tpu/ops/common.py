"""Shared primitives: linear / layernorm / activations / embedding init.

Initialisation parity with the reference (ref: nasrec/utils/train_utils.py:70-89):
  - nn.Linear          -> xavier-uniform weight, zero bias
  - nn.Embedding       -> xavier-normal
  - nn.MultiheadAttention params -> xavier-uniform (>1-D), zeros (1-D)
LayerNorm eps matches torch default 1e-5.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp


Params = Dict[str, jnp.ndarray]

LN_EPS = 1e-5


def _xavier_uniform(key, fan_in: int, fan_out: int, shape, dtype=jnp.float32):
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def _xavier_normal(key, fan_in: int, fan_out: int, shape, dtype=jnp.float32):
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def linear_init(key, in_dim: int, out_dim: int, use_bias: bool = True) -> Params:
    """Weight stored [in, out] (transposed vs torch) so apply is x @ w."""
    p: Params = {"w": _xavier_uniform(key, in_dim, out_dim, (in_dim, out_dim))}
    if use_bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def ln_init(dim: int, weight_init: float = 1.0) -> Params:
    return {
        "scale": jnp.full((dim,), weight_init, jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
    }


def ln_apply(p: Params, x: jnp.ndarray, eps: float = LN_EPS) -> jnp.ndarray:
    """LayerNorm over the last axis; stats in f32 for bf16 safety."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def embedding_init(key, vocab: int, dim: int) -> jnp.ndarray:
    return _xavier_normal(key, vocab, dim, (vocab, dim))


# Activation library (ref: nasrec/supernet/modules.py:28-32).
ACTIVATIONS = {
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "identity": lambda x: x,
}


def apply_mask(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = -1) -> jnp.ndarray:
    """Multiply by a width mask along `axis` (None = fixed mode, no-op)."""
    if mask is None:
        return x
    mask = mask.astype(x.dtype)
    if axis == -1 or axis == x.ndim - 1:
        return x * mask
    shape = [1] * x.ndim
    shape[axis] = mask.shape[0]
    return x * mask.reshape(shape)


# ---------------------------------------------------------------------------
# FLAT sparse layout [B, S*E] (slot-major flatten) and its E-major island
# [B, E, S] for ops that contract the slot axis.
#
# Rationale (TPU memory tiles are (8, 128) on the last two dims): the naive
# [B, S, 16] layout pads E=16 -> 128 lanes, so EVERY materialised sparse
# activation costs 8x its logical bytes in HBM traffic.  The slot-major flat
# 2-D layout pads only (S*E) -> next multiple of 128 (<= 1.3x for S >= 16),
# and happens to make three model-level operations free:
#   - concat along the slot axis   == concat along the last (lane) axis
#   - the ds-interact merge        == concat of the [B, 8*E] projection as-is
#   - the head's sparse flatten    == identity (the reference flattens
#     S-major too, so final-linear weight order is transplant-compatible)
# Ops that contract the slot axis (transformer / linear-3d / dot-product /
# FM) convert to E-major [B, E, S] internally: E=16 is exactly two (8, 128)
# sublane tiles and the slot contraction becomes an MXU-native dot.
# ---------------------------------------------------------------------------


def flat_to_emajor(x: jnp.ndarray, slots: int, emb_dim: int) -> jnp.ndarray:
    """[B, S*E] slot-major flat -> E-major [B, E, S] (one fused XLA copy)."""
    return x.reshape(x.shape[0], slots, emb_dim).swapaxes(1, 2)


def emajor_to_flat(xt: jnp.ndarray) -> jnp.ndarray:
    """E-major [B, E, S] -> slot-major flat [B, S*E]."""
    b, e, s = xt.shape
    return xt.swapaxes(1, 2).reshape(b, s * e)


def linear_apply_e(w: jnp.ndarray, b: Optional[jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """Feature linear on E-major [B, E, S]: contract the E (sublane) axis."""
    y = jnp.einsum("ef,bes->bfs", w.astype(x.dtype), x)
    if b is not None:
        y = y + b.astype(x.dtype)[None, :, None]
    return y


def ln_apply_e(p: Params, x: jnp.ndarray, eps: float = LN_EPS) -> jnp.ndarray:
    """LayerNorm over the E axis of E-major [B, E, S]; stats in f32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"][None, :, None] + p["bias"][None, :, None]
    return y.astype(x.dtype)
