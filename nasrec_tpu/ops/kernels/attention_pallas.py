"""Pallas fused multi-head self-attention for tiny heads (E=16, hd=2).

The slot-axis transformer attends over <=~530 slots with 8 heads of dim 2
(ref: nasrec/supernet/modules.py:624, SURVEY.md §5.7).  XLA's backward for
this shape materialises [B, H, S, S] score tensors in HBM — the allocation
that OOMs a v5e at batch >=32k even under remat.

This kernel processes batch tiles entirely in VMEM and never writes scores
to HBM in either direction (flash-style; no log-sum-exp streaming needed
because the full slot axis fits in VMEM).

Layout: operands are E-MAJOR — [B, E, S] with E=16 on sublanes (exactly two
(8,128) tiles) and slots on lanes.  The S-major [B, S, E] form pads E
16->128 lanes (8x VMEM and VPU traffic), which capped batch tiles at 32-64
rows and made the kernel overhead-bound: the first-generation S-major
kernel measured 44/28/11 ms fwd+bwd at S=64/48/16, batch 32768 — ~84 ms of
a 164 ms train-step body (experiments, round-2 trace).  E-major removes all
padding, and both attention contractions are MXU-native:

    scores_h = (q*m_h)^T k        contraction over E (sublanes)
    out_h    = (v*m_h) p^T        contraction over slots (lanes)

where m_h is a 0/1 sublane mask selecting head h's two dims (per-head
slicing would create sublane-2 operands; the idempotent mask keeps every
tensor [TB, 16, S] and is exact).

The op-level caller (ops/attention.py) stays E-major end-to-end between its
slot projection and the final swap back, so no extra transposes are paid.
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
    """0/1 mask over the E (sublane) axis selecting head h's dims
    (iota-based: Pallas kernels cannot capture array constants)."""
    hd = e // num_heads
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, e, 1), 1)
    return (sub // hd == h).astype(jnp.float32)


# dot_general dimension numbers on [TB, E, S] operands (batch dim 0):
_C_E = (((1,), (1,)), ((0,), (0,)))   # [TB,E,S] x [TB,E,T] -> [TB,S,T]
_C_T = (((2,), (2,)), ((0,), (0,)))   # [TB,E,T] x [TB,S,T] -> [TB,E,S]
_C_S = (((2,), (1,)), ((0,), (0,)))   # [TB,E,S] x [TB,S,T] -> [TB,E,T]


def _fold_factor(s: int, num_heads: int) -> int:
    """Heads folded side-by-side into the lane axis of one dot.

    Per-batch-row dots are MXU-ISSUE-bound at these sizes (~10 cycles per
    tiny dot regardless of S; measured: the unfolded kernel's fwd cost was
    flat-ish in S).  Masking k/v instead of q makes the per-head score
    blocks independent along the OUTPUT lane axis, so F masked copies can
    be stacked on lanes and one dot serves F heads — F·S <= 128 keeps the
    stack within one lane tile (S=16 -> F=8 exactly fills 128 lanes)."""
    f = num_heads
    while f > 1 and (f * s > 128 or num_heads % f):
        f -= 1
    return max(1, f)


def _masked_stack(x, num_heads, g, f):
    """Lane-concat of head-masked copies: [TB,E,S] -> [TB,E,F*S]."""
    e = x.shape[1]
    return jnp.concatenate(
        [x * _head_mask(e, num_heads, g * f + j) for j in range(f)], axis=2
    )


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int):
    q = q_ref[:].astype(jnp.float32)      # [TB, E, S]
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    e, s = q.shape[1], q.shape[2]
    f = _fold_factor(s, num_heads)
    scale = 1.0 / np.sqrt(e // num_heads)
    out = jnp.zeros_like(q)
    for g in range(num_heads // f):
        kg = _masked_stack(k, num_heads, g, f)
        sg = jax.lax.dot_general(q, kg, _C_E, preferred_element_type=jnp.float32)
        # Per-head softmax on lane slices ([TB,S,F*S] holds F score blocks).
        pg = jnp.concatenate(
            [_softmax(sg[:, :, j * s:(j + 1) * s] * scale) for j in range(f)],
            axis=2,
        )
        vg = _masked_stack(v, num_heads, g, f)
        # Contract the full F*S lane axis: cross-head terms are zero by the
        # v-side masks, so this sums the group's per-head outputs exactly.
        out = out + jax.lax.dot_general(
            vg, pg, _C_T, preferred_element_type=jnp.float32
        )
    o_ref[:] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                num_heads: int):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    e, s = q.shape[1], q.shape[2]
    f = _fold_factor(s, num_heads)
    scale = 1.0 / np.sqrt(e // num_heads)
    dq = jnp.zeros_like(q)
    dk = jnp.zeros_like(q)
    dv = jnp.zeros_like(q)
    for g in range(num_heads // f):
        kg = _masked_stack(k, num_heads, g, f)
        vg = _masked_stack(v, num_heads, g, f)
        sg = jax.lax.dot_general(q, kg, _C_E, preferred_element_type=jnp.float32)
        dpg = jax.lax.dot_general(do, vg, _C_E, preferred_element_type=jnp.float32)
        p_parts, ds_parts = [], []
        for j in range(f):
            pj = _softmax(sg[:, :, j * s:(j + 1) * s] * scale)
            dpj = dpg[:, :, j * s:(j + 1) * s]
            ds_parts.append(
                pj * (dpj - jnp.sum(dpj * pj, axis=-1, keepdims=True)) * scale
            )
            p_parts.append(pj)
        pg = jnp.concatenate(p_parts, axis=2)
        dsg = jnp.concatenate(ds_parts, axis=2)
        # dq: contract the full lane stack (cross-head terms vanish by the
        # k-side masks); the result lands pre-masked per head.
        dq = dq + jax.lax.dot_general(
            kg, dsg, _C_T, preferred_element_type=jnp.float32
        )
        dk_full = jax.lax.dot_general(
            q, dsg, _C_S, preferred_element_type=jnp.float32
        )                                  # [TB, E, F*S]
        dv_full = jax.lax.dot_general(
            do, pg, _C_S, preferred_element_type=jnp.float32
        )
        for j in range(f):
            m = _head_mask(e, num_heads, g * f + j)
            dk = dk + dk_full[:, :, j * s:(j + 1) * s] * m
            dv = dv + dv_full[:, :, j * s:(j + 1) * s] * m
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MiB of VMEM; leave headroom


def _pick_tile(b: int, e: int, s: int) -> int:
    """Largest batch tile whose VMEM footprint stays well under the limit:
    7 io blocks [TB,16,S] (in+out, double-buffered) + [S,S]-sized score
    transients per batch row (Mosaic's stack keeps ~16 of them live across
    the unrolled heads — measured 255 KB/row at S=64), all f32 and unpadded
    in the E-major layout."""
    lanes = -(-s // 128) * 128   # minor dim still pads to 128 lanes
    per_row = (7 * e * lanes + 16 * s * lanes) * 4
    budget = 48 * 1024 * 1024
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if b % t == 0 and t * per_row <= budget:
            return t
    return min(b, 8)


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _block_specs(tb: int, e: int, s: int, n: int):
    spec = pl.BlockSpec((tb, e, s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return [spec] * n


def _run_fwd(qt, kt, vt, num_heads, interpret):
    b, e, s = qt.shape
    tb = _pick_tile(b, e, s)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, e, s), qt.dtype),
        grid=(_cdiv(b, tb),),
        in_specs=_block_specs(tb, e, s, 3),
        out_specs=_block_specs(tb, e, s, 1)[0],
        compiler_params=_params(),
        interpret=interpret,
    )(qt, kt, vt)


def _run_bwd(qt, kt, vt, do, num_heads, interpret):
    b, e, s = qt.shape
    tb = _pick_tile(b, e, s)
    shape = jax.ShapeDtypeStruct((b, e, s), qt.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads),
        out_shape=(shape, shape, shape),
        grid=(_cdiv(b, tb),),
        in_specs=_block_specs(tb, e, s, 4),
        out_specs=tuple(_block_specs(tb, e, s, 3)),
        compiler_params=_params(),
        interpret=interpret,
    )(qt, kt, vt, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_tiny_head_attention_t(qt, kt, vt, num_heads: int = 8,
                                interpret: bool = False):
    """Per-head softmax(q k^T / sqrt(hd)) v on E-MAJOR operands:
    [B, E, S] -> [B, E, S]."""
    return _run_fwd(qt, kt, vt, num_heads, interpret)


def _vjp_fwd(qt, kt, vt, num_heads, interpret):
    return _run_fwd(qt, kt, vt, num_heads, interpret), (qt, kt, vt)


def _vjp_bwd(num_heads, interpret, res, g):
    qt, kt, vt = res
    return _run_bwd(qt, kt, vt, g, num_heads, interpret)


fused_tiny_head_attention_t.defvjp(_vjp_fwd, _vjp_bwd)


def fused_tiny_head_attention(q, k, v, num_heads: int = 8,
                              interpret: bool = False):
    """S-major convenience wrapper: [B, S, E] -> [B, S, E] via the E-major
    kernel (two transposes; prefer fused_tiny_head_attention_t when the
    caller is already E-major, as ops/attention.py is)."""
    out = fused_tiny_head_attention_t(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        num_heads, interpret,
    )
    return jnp.swapaxes(out, 1, 2)


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
