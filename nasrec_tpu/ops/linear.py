"""Elastic linear operators (dense 2-D and sparse 3-D).

Reference semantics:
  - ElasticLinear   (ref: nasrec/supernet/modules.py:134-181):
        out = act(LN(x @ W + b)) * width_mask
    bias only when layernorm is off; mask only in supernet (masked) mode.
  - ElasticLinear3D (ref: nasrec/supernet/modules.py:184-235): the same linear
    applied over the *slot* axis: transpose [B,S,E]->[B,E,S], project S->out,
    LayerNorm over the projected slot axis, activation, slot mask, transpose
    back.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from nasrec_tpu.ops.common import (
    ACTIVATIONS,
    Params,
    apply_mask,
    emajor_to_flat,
    flat_to_emajor,
    linear_apply,
    linear_init,
    ln_apply,
    ln_init,
)


def elastic_linear_init(
    key, in_dim: int, out_dim: int, use_layernorm: bool
) -> Params:
    p: Params = {"linear": linear_init(key, in_dim, out_dim, use_bias=not use_layernorm)}
    if use_layernorm:
        p["ln"] = ln_init(out_dim)
    return p


def elastic_linear_apply(
    p: Params,
    x: jnp.ndarray,
    activation: str = "relu",
    dim_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    out = linear_apply(p["linear"], x)
    if "ln" in p:
        out = ln_apply(p["ln"], out)
    out = ACTIVATIONS[activation](out)
    return apply_mask(out, dim_mask)


def elastic_linear3d_init(
    key, in_slots: int, out_slots: int, use_layernorm: bool
) -> Params:
    p: Params = {"linear": linear_init(key, in_slots, out_slots, use_bias=not use_layernorm)}
    if use_layernorm:
        p["ln"] = ln_init(out_slots)
    return p


def elastic_linear3d_apply(
    p: Params,
    x: jnp.ndarray,  # [B, S_in, E]
    activation: str = "relu",
    slot_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    xt = jnp.swapaxes(x, 1, 2)          # [B, E, S_in]
    out = _linear3d_emajor(p, xt, activation, slot_mask)
    return jnp.swapaxes(out, 1, 2)       # [B, out_slots, E]


def _linear3d_emajor(p, xt, activation, slot_mask):
    out = linear_apply(p["linear"], xt)  # [B, E, out_slots]
    if "ln" in p:
        out = ln_apply(p["ln"], out)     # LN over the slot axis (ref :225-226)
    out = ACTIVATIONS[activation](out)
    return apply_mask(out, slot_mask)    # mask the slot axis (lanes in E-major)


def elastic_linear3d_apply_flat(
    p: Params,
    x: jnp.ndarray,  # [B, S_in*E] slot-major flat
    in_slots: int,
    emb_dim: int,
    activation: str = "relu",
    slot_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Flat-layout ElasticLinear3D: [B, S_in*E] -> [B, out_slots*E]."""
    xt = flat_to_emajor(x, in_slots, emb_dim)
    return emajor_to_flat(_linear3d_emajor(p, xt, activation, slot_mask))
