"""Pallas fused multi-head self-attention for tiny heads (E=16, hd=2).

The slot-axis transformer attends over <=~530 slots with 8 heads of dim 2
(ref: nasrec/supernet/modules.py:624, SURVEY.md §5.7).  XLA's backward for
this shape materialises [B, H, S, S] score tensors (2x padded) in HBM — the
allocation that OOMs a v5e at batch >=32k even under remat.

This kernel processes batch tiles entirely in VMEM and never writes scores to
HBM in either direction (flash-style; no log-sum-exp streaming needed because
the full slot axis fits in VMEM).

Layout trick for head_dim=2: slicing [*, 2] operands would pad each to 128
lanes (64x waste) and overflow VMEM.  Instead every per-head contraction runs
over the FULL E axis with a 0/1 head mask folded into one operand:

    s_h   = (q * m_h) k^T          (= q_h k_h^T, since m_h is idempotent)
    out  += p_h (v * m_h)          (writes only head-h output columns)

so all tensors keep the [TB, S, E] shape and pad once.

Measured on v5e (full Criteo-best train step, batch 16384): 0.73 ms/step vs
0.72 ms for the XLA einsum path with remat — parity on speed; the win is
memory (no [B,H,S,S] HBM transients in the backward).  Default stays "xla".
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _head_mask(e: int, num_heads: int, h: int) -> jnp.ndarray:
    """In-kernel 0/1 mask over the E axis selecting head h's dims (iota-based:
    Pallas kernels cannot capture array constants)."""
    hd = e // num_heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e), 2)
    return (lane // hd == h).astype(jnp.float32)


_CE = (((2,), (2,)), ((0,), (0,)))  # contract E:      [TB,S,E]x[TB,S,E] -> [TB,S,S]
_CS = (((2,), (1,)), ((0,), (0,)))  # contract rows:   [TB,S,S]x[TB,S,E] -> [TB,S,E]
_CT = (((1,), (1,)), ((0,), (0,)))  # transpose-contract over the first S axis


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    e = q.shape[-1]
    scale = 1.0 / np.sqrt(e // num_heads)
    out = jnp.zeros_like(q)
    for h in range(num_heads):
        m = _head_mask(e, num_heads, h)
        s = jax.lax.dot_general(q * m, k, _CE, preferred_element_type=jnp.float32)
        p = _softmax(s * scale)
        out = out + jax.lax.dot_general(
            p, v * m, _CS, preferred_element_type=jnp.float32
        )
    o_ref[:] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, num_heads: int):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    e = q.shape[-1]
    scale = 1.0 / np.sqrt(e // num_heads)
    dq = jnp.zeros_like(q)
    dk = jnp.zeros_like(q)
    dv = jnp.zeros_like(q)
    for h in range(num_heads):
        m = _head_mask(e, num_heads, h)
        qm = q * m
        s = jax.lax.dot_general(qm, k, _CE, preferred_element_type=jnp.float32)
        p = _softmax(s * scale)
        dp = jax.lax.dot_general(do * m, v, _CE, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        dq = dq + jax.lax.dot_general(
            ds, k, _CS, preferred_element_type=jnp.float32
        ) * m
        dk = dk + jax.lax.dot_general(
            ds, qm, _CT, preferred_element_type=jnp.float32
        ) * m
        dv = dv + jax.lax.dot_general(
            p, do * m, _CT, preferred_element_type=jnp.float32
        )
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _block_specs(batch_tile: int, s: int, e: int, n: int):
    spec = pl.BlockSpec((batch_tile, s, e), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return [spec] * n


VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MiB of VMEM; leave headroom


def _pick_tile(b: int, s: int) -> int:
    # Empirical VMEM footprint (io buffers pad E 16->128 lanes, scores pad
    # S->128, Mosaic keeps several unrolled-head transients live) is ~16 KB
    # per (tile x slot) unit; stay well under the 100 MB cap.
    budget_units = 5120
    for t in (512, 256, 128, 64, 32, 16, 8):
        if b % t == 0 and t * s <= budget_units:
            return t
    return min(b, 8)


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _run_fwd(q, k, v, num_heads, interpret):
    b, s, e = q.shape
    tb = _pick_tile(b, s)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, s, e), q.dtype),
        grid=(_cdiv(b, tb),),
        in_specs=_block_specs(tb, s, e, 3),
        out_specs=_block_specs(tb, s, e, 1)[0],
        compiler_params=_params(),
        interpret=interpret,
    )(q, k, v)


def _run_bwd(q, k, v, do, num_heads, interpret):
    b, s, e = q.shape
    tb = _pick_tile(b, s)
    shape = jax.ShapeDtypeStruct((b, s, e), q.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads),
        out_shape=(shape, shape, shape),
        grid=(_cdiv(b, tb),),
        in_specs=_block_specs(tb, s, e, 4),
        out_specs=tuple(_block_specs(tb, s, e, 3)),
        compiler_params=_params(),
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_tiny_head_attention(q, k, v, num_heads: int = 8, interpret: bool = False):
    """softmax(q k^T / sqrt(hd)) v per head; [B, S, E] -> [B, S, E]."""
    return _run_fwd(q, k, v, num_heads, interpret)


def _vjp_fwd(q, k, v, num_heads, interpret):
    return _run_fwd(q, k, v, num_heads, interpret), (q, k, v)


def _vjp_bwd(num_heads, interpret, res, g):
    q, k, v = res
    dq, dk, dv = _run_bwd(q, k, v, g, num_heads, interpret)
    return dq, dk, dv


fused_tiny_head_attention.defvjp(_vjp_fwd, _vjp_bwd)


def mha_reference(q, k, v, num_heads: int):
    """jnp reference (identical math to ops.attention._mha's core)."""
    b, s, e = q.shape
    hd = e // num_heads

    def heads(t):
        return t.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, s, e)
