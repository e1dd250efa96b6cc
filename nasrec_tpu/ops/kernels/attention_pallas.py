"""Pallas fused multi-head self-attention for tiny heads (E=16, hd=2).

The slot-axis transformer attends over <=~530 slots with 8 heads of dim 2
(ref: nasrec/supernet/modules.py:624, SURVEY.md §5.7).  XLA's backward for
this shape materialises [B, H, S, S] score tensors in HBM — the allocation
that OOMs a v5e at batch >=32k even under remat.

Layout: operands are BATCH-MAJOR-ON-LANES — [3E, S, B] stacked qkv with the
batch on the lane (minor) axis.  Rationale, in order of discovery:

  gen 1 (S-major [B, S, E] blocks): E=16 pads 16->128 lanes (8x VMEM/VPU
    traffic); 44/28/11 ms fwd+bwd at S=64/48/16, batch 32768.
  gen 2 (E-major [B, E, S] blocks, heads folded into lanes so one MXU dot
    serves F heads): no padding, but every batch row still issues its own
    tiny dots — MXU-ISSUE-bound at ~10+ cycles per [16,S]x[16,F*S] dot;
    17.3/25.9 ms fwd/f+b at S=64 (experiments/probe_block0_ops.py), ~25x
    off HBM speed-of-light (0.65 ms).
  gen 3 (this kernel): with hd = E/H = 2, a head's score matrix is a SUM OF
    TWO OUTER PRODUCTS over slots — there is no contraction worth an MXU.
    Putting batch on lanes makes every step a lane-parallel VPU op:

        s_h[i,j,b] = q[2h,i,b] k[2h,j,b] + q[2h+1,i,b] k[2h+1,j,b]
        p_h        = softmax_j(s_h / sqrt(hd))      (sublane reduction)
        o[2h+d,i,b] = sum_j p_h[i,j,b] v[2h+d,j,b]  (sublane reduction)

    — broadcasts along sublane/major axes, reductions along sublane/major
    axes, ZERO transposes, ZERO per-row dots.  The batch axis is purely
    elementwise (no cross-lane ops), so partial batch tiles are safe.
    Measured 7.8 ms fwd at [32768, 16, 64] vs gen 2's 17.3 ms
    (experiments/probe_attn_variants.py).

Taking qkv STACKED on the feature axis (one [3E, S, B] ref) matters for the
backward: the gen-2 interface took q/k/v separately, which made XLA slice
the qkv projection's output three ways and concatenate the three gradients
— ~24 ms of pure copy glue per f+b at batch 32768.  Here the kernel slices
heads off the stacked block's MAJOR axis (free static offsets) and writes
one stacked dqkv gradient.
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


VMEM_BUDGET = 48 * 1024 * 1024  # of the v5e's 128 MiB; leaves Mosaic slack
VMEM_LIMIT = 100 * 1024 * 1024


def _pick_tile(b: int, e: int, s: int, n_io: int, k_transient: int) -> int:
    """Largest lane tile whose VMEM estimate fits the budget: `n_io`
    [*,S,TB]-ish io blocks (double-buffered) of total feature rows ~8E,
    plus `k_transient` live [S, S, TB] score slabs (Mosaic keeps several
    per unrolled head)."""
    per_lane = 4 * (2 * n_io * 2 * e * s + k_transient * s * s)
    for t in (1024, 512, 256, 128):
        if t * per_lane <= VMEM_BUDGET:
            return min(t, max(128, b))
    # Every post-projection slot count in the search spaces is <= 64
    # (config.sparse_node_dims), far inside the budget; fail loudly rather
    # than hand Mosaic a tile that exceeds vmem_limit_bytes.
    raise ValueError(
        f"attention kernel: no batch tile fits VMEM at S={s} "
        f"(per-lane bytes {per_lane}); use attention_impl='xla' for this shape"
    )


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _fwd_kernel(qkv_ref, o_ref, *, num_heads: int):
    qkv = qkv_ref[:].astype(jnp.float32)          # [3E, S, TB]
    e = qkv.shape[0] // 3
    s = qkv.shape[1]
    hd = e // num_heads
    scale = 1.0 / np.sqrt(hd)
    q, k, v = qkv[:e] * scale, qkv[e:2 * e], qkv[2 * e:]
    outs = []
    for h in range(num_heads):
        sb = q[h * hd][:, None, :] * k[h * hd][None, :, :]
        for d in range(1, hd):
            sb = sb + q[h * hd + d][:, None, :] * k[h * hd + d][None, :, :]
        m = jnp.max(sb, axis=1, keepdims=True)    # softmax over keys j
        p = jnp.exp(sb - m)
        p = p * (1.0 / jnp.sum(p, axis=1, keepdims=True))
        for d in range(hd):
            outs.append(jnp.sum(p * v[h * hd + d][None, :, :], axis=1))
    o_ref[:] = jnp.stack(outs, axis=0).astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, num_heads: int):
    qkv = qkv_ref[:].astype(jnp.float32)          # [3E, S, TB]
    do = do_ref[:].astype(jnp.float32)            # [E, S, TB]
    e = qkv.shape[0] // 3
    hd = e // num_heads
    scale = 1.0 / np.sqrt(hd)
    q, k, v = qkv[:e], qkv[e:2 * e], qkv[2 * e:]
    dq, dk, dv = [], [], []
    for h in range(num_heads):
        qs = [q[h * hd + d] * scale for d in range(hd)]
        ks = [k[h * hd + d] for d in range(hd)]
        vs = [v[h * hd + d] for d in range(hd)]
        dos = [do[h * hd + d] for d in range(hd)]
        sb = qs[0][:, None, :] * ks[0][None, :, :]
        dp = dos[0][:, None, :] * vs[0][None, :, :]
        for d in range(1, hd):
            sb = sb + qs[d][:, None, :] * ks[d][None, :, :]
            dp = dp + dos[d][:, None, :] * vs[d][None, :, :]
        m = jnp.max(sb, axis=1, keepdims=True)
        p = jnp.exp(sb - m)
        p = p * (1.0 / jnp.sum(p, axis=1, keepdims=True))
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True)) * scale
        for d in range(hd):
            dq.append(jnp.sum(ds * ks[d][None, :, :], axis=1))   # over j
            dk.append(jnp.sum(ds * q[h * hd + d][:, None, :], axis=0))
            dv.append(jnp.sum(p * dos[d][:, None, :], axis=0))   # over i
    dqkv_ref[:] = jnp.stack(dq + dk + dv, axis=0).astype(dqkv_ref.dtype)


def _specs(rows, s, tb):
    return pl.BlockSpec((rows, s, tb), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)


def _run_fwd(qkv, num_heads, interpret):
    r, s, b = qkv.shape
    e = r // 3
    tb = _pick_tile(b, e, s, n_io=2, k_transient=6)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((e, s, b), qkv.dtype),
        grid=(_cdiv(b, tb),),
        in_specs=[_specs(r, s, tb)],
        out_specs=_specs(e, s, tb),
        compiler_params=_params(),
        interpret=interpret,
    )(qkv)


def _run_bwd(qkv, do, num_heads, interpret):
    r, s, b = qkv.shape
    e = r // 3
    tb = _pick_tile(b, e, s, n_io=3, k_transient=10)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((r, s, b), qkv.dtype),
        grid=(_cdiv(b, tb),),
        in_specs=[_specs(r, s, tb), _specs(e, s, tb)],
        out_specs=_specs(r, s, tb),
        compiler_params=_params(),
        interpret=interpret,
    )(qkv, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def tiny_head_attention_bmajor(qkv, num_heads: int = 8,
                               interpret: bool = False):
    """Per-head softmax(q k^T / sqrt(hd)) v on batch-on-lanes stacked
    operands: qkv [3E, S, B] -> out [E, S, B]."""
    return _run_fwd(qkv, num_heads, interpret)


def _vjp_fwd(qkv, num_heads, interpret):
    return _run_fwd(qkv, num_heads, interpret), qkv


def _vjp_bwd(num_heads, interpret, qkv, g):
    return (_run_bwd(qkv, g, num_heads, interpret),)


tiny_head_attention_bmajor.defvjp(_vjp_fwd, _vjp_bwd)


def fused_tiny_head_attention(q, k, v, num_heads: int = 8,
                              interpret: bool = False):
    """S-major convenience wrapper: [B, S, E] -> [B, S, E] via the b-major
    kernel (transposes at the boundary; prefer the stacked b-major form
    when the caller can stay [*, S, B], as ops/attention.py does)."""
    qkv = jnp.concatenate(
        [jnp.transpose(t, (2, 1, 0)) for t in (q, k, v)], axis=0
    )
    out = tiny_head_attention_bmajor(qkv, num_heads, interpret)
    return jnp.transpose(out, (2, 1, 0))


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
