"""Dense/sparse interaction operators: DotProduct, Sum, SigmoidGating, FM3D.

Projection-elision parity: the reference's LazyLinear projections are created
or elided depending on whether the incoming width already matches the target
(ref: nasrec/supernet/modules.py:339-389, :488-495, :583-586, :739-743).  Here
the same decisions are made *statically* at init time from the known widths,
so fixed subnets reproduce the reference's exact parameter set.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from nasrec_tpu.ops.common import (
    Params,
    apply_mask,
    flat_to_emajor,
    linear_apply,
    linear_apply_e,
    linear_init,
    ln_apply,
    ln_apply_e,
    ln_init,
)


# ---------------------------------------------------------------------------
# DotProduct (ref: nasrec/supernet/modules.py:273-401)
# ---------------------------------------------------------------------------


def dot_product_slot_dim(out_dim: int) -> int:
    """Slot-axis projection width: round(sqrt(2*out_dim)) (ref :298)."""
    return round(np.sqrt(2 * out_dim))


def dot_product_init(
    key,
    dense_in: int,
    sparse_slots: int,
    out_dim: int,
    emb_dim: int,
    use_layernorm: bool,
    sparse_feat_dim: Optional[int] = None,
) -> Params:
    """Build params for the pairwise dot-product interaction.

    dense_in      width of the incoming dense tensor
    sparse_slots  slot count of the incoming sparse tensor
    out_dim       `max_dims_or_dims` of this node
    sparse_feat_dim  last dim of the sparse tensor (defaults to emb_dim)
    """
    import jax

    sparse_feat_dim = emb_dim if sparse_feat_dim is None else sparse_feat_dim
    keys = jax.random.split(key, 4)
    bias = not use_layernorm
    p: Params = {}
    if dense_in != emb_dim:                       # ref :339-345
        p["dense_proj"] = linear_init(keys[0], dense_in, emb_dim, bias)
        if use_layernorm:
            p["dense_ln"] = ln_init(emb_dim)
    if sparse_feat_dim != emb_dim:                # ref :348-354
        p["sparse_proj"] = linear_init(keys[1], sparse_feat_dim, emb_dim, bias)
        if use_layernorm:
            p["sparse_ln"] = ln_init(emb_dim)
    slot_dim = dot_product_slot_dim(out_dim)
    if sparse_slots != slot_dim:                  # ref :357-364
        p["slot_proj"] = linear_init(keys[2], sparse_slots, slot_dim, bias)
        if use_layernorm:
            p["slot_ln"] = ln_init(slot_dim)
    n = 1 + slot_dim
    n_interactions = n * (n - 1) // 2             # tril offset -1 (ref :374-379)
    if n_interactions != out_dim:                 # ref :384-389
        p["out_proj"] = linear_init(keys[3], n_interactions, out_dim, bias)
    if use_layernorm:                             # final LN always on (ref :391-392)
        p["out_ln"] = ln_init(out_dim)
    return p


def dot_product_apply(
    p: Params,
    dense: jnp.ndarray,   # [B, D]
    sparse: jnp.ndarray,  # [B, S, E]
    dim_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    x = dense
    if "dense_proj" in p:
        x = linear_apply(p["dense_proj"], x)
        if "dense_ln" in p:
            x = ln_apply(p["dense_ln"], x)
    y = sparse
    if "sparse_proj" in p:
        y = linear_apply(p["sparse_proj"], y)
        if "sparse_ln" in p:
            y = ln_apply(p["sparse_ln"], y)
    if "slot_proj" in p:
        yt = jnp.swapaxes(y, 1, 2)                  # [B, E, S]
        yt = linear_apply(p["slot_proj"], yt)       # [B, E, slot_dim]
        if "slot_ln" in p:
            yt = ln_apply(p["slot_ln"], yt)
        y = jnp.swapaxes(yt, 1, 2)                  # [B, slot_dim, E]
    t = jnp.concatenate([x[:, None, :], y], axis=1)  # [B, n, E]
    z = jnp.einsum("bne,bme->bnm", t, t)             # pairwise dots
    return _dot_product_tail(p, z, dim_mask)


def _dot_product_tail(p: Params, z: jnp.ndarray, dim_mask) -> jnp.ndarray:
    # Strict lower triangle, row-major (== flat[tril_flat_indices]): row i
    # contributes its first i entries, which are CONTIGUOUS — static slices
    # + one concat.  A flat gather of the n(n-1)/2 indices lowers to a
    # serialized per-index while-loop on TPU (~13 ms/step at n=40, batch
    # 32768, measured in the round-2 trace); slicing is pure layout.
    n = z.shape[1]
    out = jnp.concatenate([z[:, i, :i] for i in range(1, n)], axis=1)
    if "out_proj" in p:
        out = linear_apply(p["out_proj"], out)
    if "out_ln" in p:
        out = ln_apply(p["out_ln"], out)
    return apply_mask(out, dim_mask)


def dot_product_apply_flat(
    p: Params,
    dense: jnp.ndarray,   # [B, D]
    sparse: jnp.ndarray,  # [B, S*E] slot-major flat
    in_slots: int,
    emb_dim: int,
    dim_mask: Optional[jnp.ndarray] = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Flat-layout DotProduct — same math as `dot_product_apply` but the
    sparse operand goes straight to E-major [B, E, S]: the slot projection
    contracts lanes, the pairwise scores contract the E sublane axis, and no
    [B, S, E] tensor (E=16 pads 8x on lanes) is ever materialised.

    impl='pallas': the pairwise scores + triangle flatten run as one
    batch-on-lanes Pallas kernel (ops/kernels/dotprod_pallas.py) and the
    out-projection contracts in b-major — XLA's batched tiny GEMMs for this
    shape are MXU-issue-bound and its [B, n, n] score tensor pads n<=46 to
    128 lanes in HBM both ways."""
    import jax

    x = dense
    if "dense_proj" in p:
        x = linear_apply(p["dense_proj"], x)
        if "dense_ln" in p:
            x = ln_apply(p["dense_ln"], x)
    yt = flat_to_emajor(sparse, in_slots, emb_dim)   # [B, F, S] feature-major
    if "sparse_proj" in p:                            # contract the feature axis
        q = p["sparse_proj"]
        yt = linear_apply_e(q["w"], q.get("b"), yt)
        if "sparse_ln" in p:
            yt = ln_apply_e(p["sparse_ln"], yt)
    if "slot_proj" in p:
        yt = linear_apply(p["slot_proj"], yt)         # [B, E, slot_dim]
        if "slot_ln" in p:
            yt = ln_apply(p["slot_ln"], yt)
    if impl == "pallas":
        from nasrec_tpu.ops.kernels.dotprod_pallas import dot_scores_tril_bmajor

        tb = jnp.concatenate([x[:, :, None], yt], axis=2)   # [B, E, n]
        t = jnp.transpose(tb, (1, 2, 0))                    # [E, n, B]
        z = dot_scores_tril_bmajor(
            t, jax.default_backend() != "tpu"
        )                                                   # [P, B]
        if "out_proj" in p:
            q = p["out_proj"]
            out = jnp.einsum("pb,po->bo", z, q["w"].astype(z.dtype))
            if "b" in q:
                out = out + q["b"].astype(z.dtype)
        else:
            out = z.T
        if "out_ln" in p:
            out = ln_apply(p["out_ln"], out)
        return apply_mask(out, dim_mask)
    t = jnp.concatenate([x[:, :, None], yt], axis=2)  # [B, E, n]
    z = jnp.einsum("ben,bem->bnm", t, t)              # pairwise dots
    return _dot_product_tail(p, z, dim_mask)


# ---------------------------------------------------------------------------
# Sum (ref: nasrec/supernet/modules.py:432-501)
# ---------------------------------------------------------------------------


def pad_align_2d(left: jnp.ndarray, right: jnp.ndarray):
    """Zero-pad the narrower tensor to match widths (ref :403-430)."""
    dl, dr = left.shape[-1], right.shape[-1]
    if dl == dr:
        return left, right
    if dl < dr:
        return jnp.pad(left, ((0, 0), (0, dr - dl))), right
    return left, jnp.pad(right, ((0, 0), (0, dl - dr)))


def sum_init(key, left_in: int, right_in: int, out_dim: int, use_layernorm: bool) -> Params:
    p: Params = {}
    width = max(left_in, right_in)
    if width != out_dim:                           # ref :488-491
        p["proj"] = linear_init(key, width, out_dim, use_bias=not use_layernorm)
    if use_layernorm:
        p["ln"] = ln_init(out_dim)
    return p


def sum_apply(
    p: Params,
    left: jnp.ndarray,
    right: jnp.ndarray,
    dim_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    left, right = pad_align_2d(left, right)
    out = left + right
    if "proj" in p:
        out = linear_apply(p["proj"], out)
    if "ln" in p:
        out = ln_apply(p["ln"], out)
    return apply_mask(out, dim_mask)  # no activation (ref :496)


# ---------------------------------------------------------------------------
# SigmoidGating (ref: nasrec/supernet/modules.py:504-595)
#   out = proj( sigmoid(self_linear(left)) * right )
# ---------------------------------------------------------------------------


def sigmoid_gating_init(
    key, left_in: int, right_in: int, out_dim: int, use_layernorm: bool
) -> Params:
    import jax

    k1, k2 = jax.random.split(key)
    width = max(left_in, right_in)
    # LazySelfLinear always has bias (ref :515); proj always has bias (ref :541).
    p: Params = {"self_linear": linear_init(k1, width, width, use_bias=True)}
    if width != out_dim:                           # ref :583-586
        p["proj"] = linear_init(k2, width, out_dim, use_bias=True)
    if use_layernorm:
        p["ln"] = ln_init(out_dim)
    return p


def sigmoid_gating_apply(
    p: Params,
    left: jnp.ndarray,
    right: jnp.ndarray,
    dim_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    import jax

    left, right = pad_align_2d(left, right)
    gate = jax.nn.sigmoid(linear_apply(p["self_linear"], left))
    out = gate * right
    if "proj" in p:
        out = linear_apply(p["proj"], out)
    if "ln" in p:
        out = ln_apply(p["ln"], out)
    return apply_mask(out, dim_mask)


# ---------------------------------------------------------------------------
# FactorizationMachine3D (ref: nasrec/supernet/modules.py:720-750)
#   ix = (sum_s x)^2 - sum_s x^2  over the slot axis, then optional proj+LN.
# ---------------------------------------------------------------------------


def fm3d_init(key, feat_dim: int, out_dim: int, use_layernorm: bool) -> Params:
    p: Params = {}
    if feat_dim != out_dim:                        # ref :739-743
        p["proj"] = linear_init(key, feat_dim, out_dim, use_bias=not use_layernorm)
        if use_layernorm:
            p["ln"] = ln_init(out_dim)
    return p


def fm3d_apply(
    p: Params,
    sparse: jnp.ndarray,  # [B, S, E]
    dim_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    s = jnp.sum(sparse, axis=1)
    square_of_sum = jnp.square(s)
    sum_of_square = jnp.sum(jnp.square(sparse), axis=1)
    return _fm3d_tail(p, square_of_sum - sum_of_square, dim_mask)


def _fm3d_tail(p: Params, ix: jnp.ndarray, dim_mask) -> jnp.ndarray:
    if "proj" in p:
        ix = linear_apply(p["proj"], ix)
        if "ln" in p:
            ix = ln_apply(p["ln"], ix)
    return apply_mask(ix, dim_mask)


def fm3d_apply_flat(
    p: Params,
    sparse: jnp.ndarray,  # [B, S*E] slot-major flat
    in_slots: int,
    emb_dim: int,
    dim_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Flat-layout FM: the per-feature slot sums are one matmul with a static
    [S*E, E] block-identity (K[s*E+e, e] = 1), so the reduction runs on the
    MXU over the unpadded flat tensor instead of reshaping to [B, S, E]
    (E=16 pads 8x on lanes)."""
    k = np.kron(
        np.ones((in_slots, 1), np.float32), np.eye(emb_dim, dtype=np.float32)
    )
    k = k.astype(sparse.dtype)
    s = jnp.dot(sparse, k, preferred_element_type=sparse.dtype)
    sum_of_square = jnp.dot(
        jnp.square(sparse), k, preferred_element_type=sparse.dtype
    )
    return _fm3d_tail(p, jnp.square(s) - sum_of_square, dim_mask)
