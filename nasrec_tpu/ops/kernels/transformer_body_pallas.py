"""Fully-fused transformer-node body (qkv/attention/out/LN/FFN/LN) kernel.

Why: after the gen-3 batch-on-lanes attention kernel
(ops/kernels/attention_pallas.py), the flagship step still paid ~30 ms f+b
of XLA glue AROUND the kernel — the qkv/out/fc1/fc2 feature linears, two
residual LayerNorms and their backward, each a full [*, S, B] HBM round
trip (measured in context: blocks 0/5/6 glue = 17.3/2.5/10.8 ms f+b at
batch 32768, experiments/probe_block0_ops.py).  This kernel fuses the WHOLE
post-slot-projection body — everything `ops.attention._transformer_bmajor`
does except the slot masks (left to XLA so mask gradients stay exact) —
into one Pallas forward and one Pallas backward:

    qkv = w_in^T x + b_in                  (one MXU dot per linear: the
    o   = tiny-head attention(qkv)          [E, S, TB] block reshaped
    a   = w_out^T o + b_out                 [E, S*TB] contracts E on the
    x4  = LN_E(a + x) * g1 + h1             MXU; measured bandwidth-bound
    f   = fc2(relu(fc1(x4)))                at the block-0 shape,
    out = LN_E(x4 + f) * g2 + h2            experiments/probe_fused_linear_
                                             variants.py)

The attention math itself is the gen-3 formulation (head_dim = E/H = 2, so
scores are sums of TWO outer products over slots — lane-parallel VPU
broadcast/fma/sublane-reduce with batch on the lane axis; see
attention_pallas.py for the generation history).  The TRAINING forward
saves the attention output o and the per-head softmax stats (max +
inverse-sum, [2H, S, B]) as extra kernel outputs; the backward rebuilds
the probabilities as exp(sb - m) * iden — bit-identical to the forward's,
with no slab reductions — and skips the o recompute entirely (round 5:
the sublane max/sum reductions and the p*v passes were the backward's
largest VPU slices; saving them cut the flagship body's bwd ~17 -> ~13 ms
for +0.5 ms of residual traffic).  dx plus all twelve parameter gradients
come out in one pass, weight/bias grads accumulating across batch tiles
in revisited output blocks.

Per-block HBM traffic: read x + write out/o/stats (fwd), read
x + dout + o + stats + write dx (bwd), plus the parameter tiles — still
far below the ~12 XLA round trips the fusion replaced.

Ref semantics: nasrec/supernet/modules.py:599-688 (8-head MHA with residual
+ LN(init 0.17) + 2-layer relu FFN + residual + LN; the projection LN and
the slot masks around this body live in ops/attention.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nasrec_tpu.ops.common import LN_EPS

VMEM_BUDGET = 80 * 1024 * 1024
VMEM_LIMIT = 100 * 1024 * 1024


def _cdiv(a, b):
    return -(-a // b)


def _pick_tile(b: int, e: int, s: int, *, bwd: bool) -> int:
    """Largest batch (lane) tile whose VMEM estimate fits the budget.

    Live per-lane f32 bytes: io blocks (double-buffered by the pipeline) +
    ~`k_feat` [*, S]-row transients (x/qkv/o/x4/h/... block values) +
    `k_slab` [S, S] score slabs Mosaic keeps live per unrolled head."""
    # Coefficients CALIBRATED against Mosaic's actual scoped-vmem stack
    # (fwd at S=64/TB=256 allocates 109.9M -> ~430KB/lane), not a hand count
    # of live values — Mosaic keeps far more alive than the dataflow needs.
    # Round 5: the backward gained two residual inputs (saved attention o +
    # softmax stats -> n_io 5) but dropped the in-kernel attention-forward
    # recompute (fewer live feature rows and score slabs).
    n_io = 5 if bwd else 2
    k_feat = 50 if bwd else 50       # in units of E feature rows
    k_slab = 14 if bwd else 15
    per_lane = 4 * (2 * n_io * 2 * e * s + k_feat * e * s + k_slab * s * s)
    fits = [t for t in (512, 256, 128) if t * per_lane <= VMEM_BUDGET]
    if fits:
        # The backward's weight/bias grads reduce over the LANE (batch)
        # axis, so padding lanes of a partial tile would poison them —
        # TRAINING batches must tile exactly: pick the largest fitting tile
        # that also DIVIDES b (e.g. B=640 at S=16 fits 512 but must tile at
        # 128), honouring the documented multiples-of-128 contract.  The
        # forward is lane-local (linears, LN-over-features and the attention
        # math never cross lanes), so eval-only batches of any size are
        # fine: partial tiles compute garbage only in out-of-bounds lanes,
        # which the block write masks out.
        if not bwd:
            return min(fits[0], b)
        for t in fits:
            t = min(t, b)      # a whole-batch tile has no padding lanes
            if b % t == 0:
                return t
        raise ValueError(
            f"fused transformer body: training batch {b} is not a "
            f"multiple of any fitting lane tile {fits}; pad the batch "
            f"to a multiple of 128"
        )
    raise ValueError(
        f"fused transformer body: no batch tile fits VMEM at S={s} "
        f"(per-lane bytes {per_lane}); use attention_impl='xla'"
    )


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _lin(w, b, x):
    """Feature linear contracting the MAJOR axis: x [Ein, S, TB] -> [Eout,
    S, TB]; w [Ein, Eout] (apply = x @ w in S-major terms).  The bias (a
    [1, Eout] row) rides as an AUGMENTED contraction row against a ones row
    — Mosaic cannot shape-cast a lane vector onto the major axis, and one
    extra K row is free on the MXU."""
    ein, s, tb = x.shape
    x2 = x.reshape(ein, s * tb)
    if b is not None:
        x2 = jnp.concatenate(
            [x2, jnp.ones((1, s * tb), jnp.float32)], axis=0
        )
        w = jnp.concatenate([w, b], axis=0)
    return jax.lax.dot_general(
        w, x2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(-1, s, tb)


def _lin_t(w, dy):
    """Transposed linear (the dx of _lin): dy [Eout, S, TB] -> [Ein, S, TB]."""
    eout, s, tb = dy.shape
    return jax.lax.dot_general(
        w, dy.reshape(eout, s * tb), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(-1, s, tb)


def _wgrad(x, dy):
    """dw [Ein, Eout] = sum_{s,b} x[e,s,b] dy[f,s,b] — one minor-axis dot."""
    ein, s, tb = x.shape
    return jax.lax.dot_general(
        x.reshape(ein, s * tb), dy.reshape(-1, s * tb),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _ln_e(r, s_ref, b_ref, eps=LN_EPS):
    """LayerNorm over the feature (major) axis of [E, S, TB].  The affine
    params live in SMEM ((1, E) blocks) and are applied per feature plane —
    scalar SMEM reads are the only free way onto the major axis.  Returns
    (y, xhat, inv) — xhat/inv feed the backward."""
    e = r.shape[0]
    mu = jnp.mean(r, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(r - mu), axis=0, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (r - mu) * inv
    y = jnp.stack(
        [xhat[i] * s_ref[0, i] + b_ref[0, i] for i in range(e)], axis=0
    )
    return y, xhat, inv


def _ln_e_bwd(dy, xhat, inv, s_ref):
    """dr for y = xhat*scale + bias with xhat = (r - mean)/std over axis 0."""
    e = dy.shape[0]
    dxh = jnp.stack([dy[i] * s_ref[0, i] for i in range(e)], axis=0)
    return inv * (
        dxh
        - jnp.mean(dxh, axis=0, keepdims=True)
        - xhat * jnp.mean(dxh * xhat, axis=0, keepdims=True)
    )


def _rowsum(z):
    """[F, S, TB] -> [1, F]: per-feature sum over (slots, batch) as ONE
    ones-row dot (Mosaic-friendly replacement for a multi-axis reduce that
    would land on the major axis)."""
    f, s, tb = z.shape
    return jax.lax.dot_general(
        jnp.ones((1, s * tb), jnp.float32), z.reshape(f, s * tb),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _attn_fwd(qkv, num_heads, with_stats=False):
    """Gen-3 tiny-head attention on [3E, S, TB] block values -> o [E, S, TB].

    with_stats=True additionally returns the per-head softmax statistics
    stacked as [2H, S, TB] (H rows of max, then H rows of 1/sum): the
    training forward saves them so the backward's probability recompute
    skips BOTH slab reductions (sublane max + sum are the slow VPU ops at
    these shapes; the exp itself is recomputed flash-style either way)."""
    e = qkv.shape[0] // 3
    hd = e // num_heads
    scale = float(1.0 / np.sqrt(hd))
    q, k, v = qkv[:e] * scale, qkv[e:2 * e], qkv[2 * e:]
    outs, ms, idens = [], [], []
    for h in range(num_heads):
        sb = q[h * hd][:, None, :] * k[h * hd][None, :, :]
        for d in range(1, hd):
            sb = sb + q[h * hd + d][:, None, :] * k[h * hd + d][None, :, :]
        m = jnp.max(sb, axis=1, keepdims=True)
        p = jnp.exp(sb - m)
        iden = 1.0 / jnp.sum(p, axis=1, keepdims=True)
        p = p * iden
        for d in range(hd):
            outs.append(jnp.sum(p * v[h * hd + d][None, :, :], axis=1))
        ms.append(m[:, 0, :])
        idens.append(iden[:, 0, :])
    o = jnp.stack(outs, axis=0)
    if with_stats:
        return o, jnp.stack(ms + idens, axis=0)
    return o


def _attn_bwd(qkv, do, stats, num_heads):
    """Gen-3 attention backward with the forward's saved softmax stats
    ([2H, S, TB]: H max rows + H inverse-sum rows): p is recomputed as
    exp(sb - m) * iden — bit-identical to the forward's p, with no slab
    reductions — and the attention output is NOT recomputed (the forward
    saves o for the out-proj weight grad)."""
    e = qkv.shape[0] // 3
    hd = e // num_heads
    scale = float(1.0 / np.sqrt(hd))
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
        p = jnp.exp(sb - stats[h][:, None, :]) * stats[num_heads + h][:, None, :]
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True)) * scale
        for d in range(hd):
            dq.append(jnp.sum(ds * ks[d][None, :, :], axis=1))
            dk.append(jnp.sum(ds * q[h * hd + d][:, None, :], axis=0))
            dv.append(jnp.sum(p * dos[d][:, None, :], axis=0))
    return jnp.stack(dq + dk + dv, axis=0)


_SMEM_IDX = (4, 5, 10, 11)   # LN scale/bias params (SMEM scalar reads)


def _fwd_kernel(x_ref, w_in, b_in, w_out, b_out, g1, h1,
                fc1w, fc1b, fc2w, fc2b, g2, h2, out_ref, *res_refs,
                num_heads):
    x = x_ref[:].astype(jnp.float32)
    qkv = _lin(w_in[:], b_in[:], x)
    if res_refs:                      # training fwd: save bwd residuals
        o_ref, stats_ref = res_refs
        o, stats = _attn_fwd(qkv, num_heads, with_stats=True)
        o_ref[:] = o
        stats_ref[:] = stats
    else:
        o = _attn_fwd(qkv, num_heads)
    a = _lin(w_out[:], b_out[:], o)
    x4, _, _ = _ln_e(a + x, g1, h1)
    p1 = _lin(fc1w[:], fc1b[:], x4)
    f = _lin(fc2w[:], fc2b[:], jnp.maximum(p1, 0.0))
    out, _, _ = _ln_e(x4 + f, g2, h2)
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, do_ref, o_ref, stats_ref,
                w_in_r, b_in_r, w_out_r, b_out_r, g1, h1,
                fc1w_r, fc1b_r, fc2w_r, fc2b_r, g2, h2,
                dx_ref, *dprm_refs, num_heads):
    w_in, b_in = w_in_r[:], b_in_r[:]
    w_out, b_out = w_out_r[:], b_out_r[:]
    fc1w, fc1b = fc1w_r[:], fc1b_r[:]
    fc2w, fc2b = fc2w_r[:], fc2b_r[:]
    x = x_ref[:].astype(jnp.float32)
    dout = do_ref[:].astype(jnp.float32)
    o_fwd = o_ref[:]
    stats = stats_ref[:]

    # --- forward recomputation (attention o and its softmax stats come
    # saved from the forward; only the post-attention chain re-runs) -------
    qkv = _lin(w_in, b_in, x)
    a = _lin(w_out, b_out, o_fwd)
    x4, xh1, inv1 = _ln_e(a + x, g1, h1)
    p1 = _lin(fc1w, fc1b, x4)
    hrelu = jnp.maximum(p1, 0.0)
    f = _lin(fc2w, fc2b, hrelu)
    _, xh2, inv2 = _ln_e(x4 + f, g2, h2)

    # --- backward ----------------------------------------------------------
    dg2 = _rowsum(dout * xh2)
    dh2 = _rowsum(dout)
    dr2 = _ln_e_bwd(dout, xh2, inv2, g2)
    dfc2w = _wgrad(hrelu, dr2)
    dfc2b = _rowsum(dr2)
    dp1 = _lin_t(fc2w, dr2) * (p1 > 0.0).astype(jnp.float32)
    dfc1w = _wgrad(x4, dp1)
    dfc1b = _rowsum(dp1)
    dx4 = dr2 + _lin_t(fc1w, dp1)
    dg1 = _rowsum(dx4 * xh1)
    dh1 = _rowsum(dx4)
    dr1 = _ln_e_bwd(dx4, xh1, inv1, g1)
    do = _lin_t(w_out, dr1)
    dbout = _rowsum(dr1)
    # attention backward (probs rebuilt from the saved stats — bit-identical
    # to the forward's p, with no slab reductions)
    dqkv = _attn_bwd(qkv, do, stats, num_heads)
    dwout = _wgrad(o_fwd, dr1)
    dwin = _wgrad(x, dqkv)
    dbin = _rowsum(dqkv)
    dx = dr1 + _lin_t(w_in, dqkv)

    dx_ref[:] = dx.astype(dx_ref.dtype)

    grads = (dwin, dbin, dwout, dbout, dg1, dh1,
             dfc1w, dfc1b, dfc2w, dfc2b, dg2, dh2)
    i = pl.program_id(0)
    for ref, val in zip(dprm_refs, grads):
        @pl.when(i == 0)
        def _init(ref=ref, val=val):
            ref[:] = val

        @pl.when(i > 0)
        def _acc(ref=ref, val=val):
            ref[:] = ref[:] + val


def _prm_arrays(p):
    """Params dict (ops.attention.transformer_init schema) -> flat tuple of
    2-D arrays in kernel order."""
    mha = p["mha"]
    return (
        mha["w_in"], mha["b_in"].reshape(1, -1),
        mha["w_out"], mha["b_out"].reshape(1, -1),
        p["attn_ln"]["scale"].reshape(1, -1), p["attn_ln"]["bias"].reshape(1, -1),
        p["fc1"]["w"], p["fc1"]["b"].reshape(1, -1),
        p["fc2"]["w"], p["fc2"]["b"].reshape(1, -1),
        p["fc_ln"]["scale"].reshape(1, -1), p["fc_ln"]["bias"].reshape(1, -1),
    )


def _prm_specs(prm):
    return [
        pl.BlockSpec(
            a.shape, lambda i: (0, 0),
            memory_space=pltpu.SMEM if j in _SMEM_IDX else pltpu.VMEM,
        )
        for j, a in enumerate(prm)
    ]


def _x_spec(rows, s, tb):
    return pl.BlockSpec((rows, s, tb), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)


def _run_fwd(x, prm, num_heads, interpret, save_residuals=False):
    """save_residuals=True (training) additionally returns the attention
    output o [E, S, B] f32 and softmax stats [2H, S, B] f32 for the
    backward; the eval/primal path compiles the single-output variant."""
    e, s, b = x.shape
    tb = _pick_tile(b, e, s, bwd=False)
    out_shape = jax.ShapeDtypeStruct((e, s, b), x.dtype)
    out_spec = _x_spec(e, s, tb)
    if save_residuals:
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((e, s, b), jnp.float32),
            jax.ShapeDtypeStruct((2 * num_heads, s, b), jnp.float32),
        )
        out_spec = [out_spec, _x_spec(e, s, tb),
                    _x_spec(2 * num_heads, s, tb)]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads),
        out_shape=out_shape,
        grid=(_cdiv(b, tb),),
        in_specs=[_x_spec(e, s, tb)] + _prm_specs(prm),
        out_specs=out_spec,
        compiler_params=_params(),
        interpret=interpret,
    )(x, *prm)


def _run_bwd(x, do, o, stats, prm, num_heads, interpret):
    e, s, b = x.shape
    tb = _pick_tile(b, e, s, bwd=True)
    grad_shapes = tuple(
        jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in prm
    )
    grad_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in prm
    ]
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads),
        out_shape=(jax.ShapeDtypeStruct((e, s, b), x.dtype),) + grad_shapes,
        grid=(_cdiv(b, tb),),
        in_specs=[_x_spec(e, s, tb), _x_spec(e, s, tb), _x_spec(e, s, tb),
                  _x_spec(2 * num_heads, s, tb)] + _prm_specs(prm),
        out_specs=[_x_spec(e, s, tb)] + grad_specs,
        compiler_params=_params(),
        interpret=interpret,
    )(x, do, o, stats, *prm)
    return out[0], tuple(out[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def transformer_body_fused(x, prm, num_heads: int = 8,
                           interpret: bool = False):
    """Fused transformer body on batch-on-lanes [E, S, B]: qkv projection,
    tiny-head attention, out projection, residual LN (x2) and the relu FFN
    in one kernel.  `prm` is the flat tuple from `_prm_arrays`.  Slot masks
    (supernet mode) must be applied OUTSIDE (before and after)."""
    return _run_fwd(x, prm, num_heads, interpret)


def _vjp_fwd(x, prm, num_heads, interpret):
    out, o, stats = _run_fwd(x, prm, num_heads, interpret,
                             save_residuals=True)
    return out, (x, o, stats, prm)


def _vjp_bwd(num_heads, interpret, res, g):
    x, o, stats, prm = res
    dx, dprm = _run_bwd(x, g, o, stats, prm, num_heads, interpret)
    return dx, dprm


transformer_body_fused.defvjp(_vjp_fwd, _vjp_bwd)


def transformer_body_fused_params(p, xb, num_heads: int = 8,
                                  interpret: bool = False):
    """Dict-params convenience wrapper: reshapes 1-D params to the kernel's
    2-D tiles and maps the grad pytree back to the dict schema via custom
    vjp on `prm` (jax reassembles the dict cotangent from the tuple)."""
    return transformer_body_fused(xb, _prm_arrays(p), num_heads, interpret)
