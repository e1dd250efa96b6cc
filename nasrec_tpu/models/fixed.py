"""Standalone fixed-subnet model built from a choice JSON.

Reference: SuperNet(fixed=True, fixed_choice=...) (ref: nasrec/supernet/
supernet.py:945-982 node construction, :604-668 fixed_forward, :1185-1242
block fixed_forward).  In fixed mode the reference *drops* non-selected inputs
(shapes are exact, no masks) and creates only the chosen nodes with exact
dims; projection layers are elided whenever the incoming width already
matches (the LazyLinear pruning in modules.py).  Here those decisions are made
statically in `build_fixed_plan`, which reproduces the warmup-time shape
inference deterministically.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from nasrec_tpu.config import (
    DEFAULT_EMBEDDING_DIM,
    DS_INTERACT_NUM_SPLITS,
    OpsConfig,
)
from nasrec_tpu.choices import Choice, validate_choice
from nasrec_tpu.models.embedding import (
    embedding_stem_apply,
    embedding_stem_init,
    table_offsets,
)
from nasrec_tpu.ops import (
    dot_product_apply_flat,
    dot_product_init,
    elastic_linear3d_apply_flat,
    elastic_linear3d_init,
    elastic_linear_apply,
    elastic_linear_init,
    fm3d_apply_flat,
    fm3d_init,
    sigmoid_gating_apply,
    sigmoid_gating_init,
    sum_apply,
    sum_init,
    transformer_apply_flat,
    transformer_init,
)
from nasrec_tpu.ops.common import linear_apply, linear_init, ln_apply, ln_init


@dataclasses.dataclass(frozen=True)
class BlockPlan:
    """Static structure of one fixed choice block."""

    active_nodes: Tuple[int, ...]        # node indices into space.node_names
    dense_dim: int
    sparse_dim: int
    interact: bool
    deep_fm: bool
    dense_idx: Tuple[int, ...]           # ascending virtual-block selections
    sparse_idx: Tuple[int, ...]
    left_idx: Tuple[int, ...]
    right_idx: Tuple[int, ...]
    dense_in: int                        # concat widths
    sparse_in: int
    left_in: int
    right_in: int
    out_slots: int                       # sparse_dim (+8 if interact)


@dataclasses.dataclass(frozen=True)
class FixedPlan:
    space: OpsConfig
    num_blocks: int
    num_dense: int
    num_sparse: int
    vocab_sizes: Tuple[int, ...]
    emb_dim: int
    use_layernorm: bool
    activation: str
    blocks: Tuple[BlockPlan, ...]
    head_width: int
    use_final_sigmoid: bool = False
    # Head fan-in: outputs of the last n blocks (ref: supernet.py:226,657-660).
    last_n_blocks_out: int = 1
    # See SuperNetConfig.remat_attention / attention_impl.
    remat_attention: bool = True
    attention_impl: str = "xla"
    # Recompute each block in the backward pass (activations are cheap to
    # recompute; trades ~30% step time for the HBM that caps large batches).
    remat_blocks: bool = False


def build_fixed_plan(
    choice: Choice,
    space: OpsConfig,
    num_blocks: int,
    num_dense: int,
    num_sparse: int,
    vocab_sizes: Tuple[int, ...],
    emb_dim: int = DEFAULT_EMBEDDING_DIM,
    use_layernorm: bool = False,
    activation: str = "relu",
    use_final_sigmoid: bool = False,
    attention_impl: str = "xla",
    last_n_blocks_out: int = 1,
) -> FixedPlan:
    validate_choice(choice, space, num_blocks)
    dense_w: List[int] = [num_dense]      # virtual-block dense widths
    sparse_s: List[int] = [num_sparse]    # virtual-block sparse slot counts
    blocks: List[BlockPlan] = []
    for i in range(num_blocks):
        m, mi = choice["macro"][i], choice["micro"][i]
        dense_idx = tuple(sorted(set(int(j) for j in m["dense_idx"])))
        sparse_idx = tuple(sorted(set(int(j) for j in m["sparse_idx"])))
        left_idx = tuple(sorted(set(int(j) for j in m["dense_left_idx"])))
        right_idx = tuple(sorted(set(int(j) for j in m["dense_right_idx"])))
        interact = bool(int(mi["dense_sparse_interact"]))
        bp = BlockPlan(
            active_nodes=tuple(sorted(int(a) for a in mi["active_nodes"])),
            dense_dim=int(mi["dense_in_dims"]),
            sparse_dim=int(mi["sparse_in_dims"]),
            interact=interact,
            deep_fm=bool(int(mi["deep_fm"])),
            dense_idx=dense_idx,
            sparse_idx=sparse_idx,
            left_idx=left_idx,
            right_idx=right_idx,
            dense_in=sum(dense_w[j] for j in dense_idx),
            sparse_in=sum(sparse_s[j] for j in sparse_idx),
            left_in=sum(dense_w[j] for j in left_idx),
            right_in=sum(dense_w[j] for j in right_idx),
            out_slots=int(mi["sparse_in_dims"])
            + (DS_INTERACT_NUM_SPLITS if interact else 0),
        )
        blocks.append(bp)
        dense_w.append(bp.dense_dim)
        sparse_s.append(bp.out_slots)
    # Head concats the last n dense outputs on the feature axis and the last
    # n sparse outputs on the EMB axis (ref: supernet.py:657-660) — the
    # latter requires equal slot counts across those blocks.
    n = last_n_blocks_out
    if n > 1:
        tail_slots = sparse_s[-n:]
        if len(set(tail_slots)) != 1:
            raise ValueError(
                f"last_n_blocks_out={n} needs equal sparse slot counts in the "
                f"final {n} blocks (got {tail_slots}); the reference's "
                f"torch.cat(dim=-1) has the same constraint"
            )
    head_width = sum(dense_w[-n:]) + sparse_s[-1] * emb_dim * n
    return FixedPlan(
        space=space,
        num_blocks=num_blocks,
        num_dense=num_dense,
        num_sparse=num_sparse,
        vocab_sizes=tuple(int(v) for v in vocab_sizes),
        emb_dim=emb_dim,
        use_layernorm=use_layernorm,
        activation=activation,
        blocks=tuple(blocks),
        head_width=head_width,
        use_final_sigmoid=use_final_sigmoid,
        attention_impl=attention_impl,
        last_n_blocks_out=last_n_blocks_out,
    )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _fixed_node_init(key, plan: FixedPlan, bp: BlockPlan, name: str) -> Dict:
    uln = plan.use_layernorm
    if name == "linear-2d":
        return elastic_linear_init(key, bp.dense_in, bp.dense_dim, uln)
    if name in ("zeros-2d", "zeros-3d"):
        return {}
    if name == "sum":
        return sum_init(key, bp.left_in, bp.right_in, bp.dense_dim, uln)
    if name == "sigmoid-gating":
        return sigmoid_gating_init(key, bp.left_in, bp.right_in, bp.dense_dim, uln)
    if name == "dot-product":
        return dot_product_init(
            key, bp.dense_in, bp.sparse_in, bp.dense_dim, plan.emb_dim, uln
        )
    if name == "transformer":
        return transformer_init(key, bp.sparse_in, bp.sparse_dim, plan.emb_dim, uln)
    if name == "linear-3d":
        return elastic_linear3d_init(key, bp.sparse_in, bp.sparse_dim, uln)
    raise NotImplementedError(name)


def fixed_init(key, plan: FixedPlan) -> Dict:
    keys = jax.random.split(key, plan.num_blocks + 2)
    blocks = []
    for i, bp in enumerate(plan.blocks):
        bkeys = jax.random.split(keys[1 + i], len(bp.active_nodes) + 2)
        nodes = {
            str(k): _fixed_node_init(bkeys[n], plan, bp, plan.space.node_names[k])
            for n, k in enumerate(bp.active_nodes)
        }
        p: Dict[str, Any] = {"nodes": nodes}
        expanded = DS_INTERACT_NUM_SPLITS * plan.emb_dim
        if bp.interact and bp.dense_dim != expanded:   # ref: supernet.py:1219-1226
            p["ds_proj"] = linear_init(
                bkeys[-2], bp.dense_dim, expanded, use_bias=not plan.use_layernorm
            )
            if plan.use_layernorm:
                p["ds_ln"] = ln_init(expanded)
        if bp.deep_fm:                                  # ref: supernet.py:998-1003
            p["deep_fm"] = fm3d_init(
                bkeys[-1], plan.emb_dim, bp.dense_dim, plan.use_layernorm
            )
        blocks.append(p)
    return {
        "embedding": embedding_stem_init(keys[0], plan.vocab_sizes, plan.emb_dim),
        "blocks": blocks,
        "final": linear_init(keys[-1], plan.head_width, 1, use_bias=True),
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _gather_concat(tensors: List[jnp.ndarray], idx: Tuple[int, ...], axis: int) -> jnp.ndarray:
    parts = [tensors[j] for j in idx]
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else parts[0]


def fixed_apply(
    plan: FixedPlan,
    params: Dict,
    dense_x: jnp.ndarray,
    cat_x: jnp.ndarray,
    *,
    compute_dtype=jnp.float32,
    stem_lookup=None,  # override for sharded tables (nasrec_tpu/parallel)
) -> jnp.ndarray:
    """Forward pass of the fixed subnet -> logits [B, 1].

    Sparse activations flow in the FLAT slot-major [B, S*E] layout (see
    ops/common.py): slot-axis concat, the ds-interact merge and the head
    flatten are plain 2-D lane ops, and nothing materialises an
    8x-lane-padded [B, S, 16] tensor between blocks."""
    offsets = table_offsets(plan.vocab_sizes)
    lookup = stem_lookup if stem_lookup is not None else embedding_stem_apply
    sparse_stem = lookup(params["embedding"], cat_x, offsets)
    if sparse_stem.ndim == 3:  # [B, S, E] -> flat [B, S*E]
        sparse_stem = sparse_stem.reshape(sparse_stem.shape[0], -1)
    dense_list = [dense_x.astype(compute_dtype)]
    sparse_list = [sparse_stem.astype(compute_dtype)]

    for i, bp in enumerate(plan.blocks):
        bparams = params["blocks"][i]
        dense_in = _gather_concat(dense_list, bp.dense_idx, axis=-1)
        sparse_in = _gather_concat(sparse_list, bp.sparse_idx, axis=-1)
        left_in = _gather_concat(dense_list, bp.left_idx, axis=-1)
        right_in = _gather_concat(dense_list, bp.right_idx, axis=-1)

        block_fn = _make_block_fn(plan, i, bp)
        if plan.remat_blocks:
            block_fn = jax.checkpoint(block_fn)
        dense_out, sparse_out = block_fn(
            bparams, dense_in, sparse_in, left_in, right_in
        )
        dense_list.append(dense_out)
        sparse_list.append(sparse_out)

    n = plan.last_n_blocks_out
    flat_dense = (
        jnp.concatenate(dense_list[-n:], axis=-1) if n > 1 else dense_list[-1]
    )
    if n > 1:
        # The reference concats the tail sparse outputs on the EMB axis
        # before flattening (ref: supernet.py:657-660) — rebuild 3-D for the
        # interleaved column order so final-linear weights stay
        # transplant-compatible.
        e = plan.emb_dim
        tail = [
            s.reshape(s.shape[0], s.shape[-1] // e, e) for s in sparse_list[-n:]
        ]
        sp = jnp.concatenate(tail, axis=-1)
        flat_sparse = sp.reshape(sp.shape[0], -1)
    else:
        flat_sparse = sparse_list[-1]  # flat layout == the reference flatten
    feats = jnp.concatenate([flat_dense, flat_sparse], axis=-1)
    out = linear_apply(params["final"], feats).astype(jnp.float32)
    if plan.use_final_sigmoid:
        out = jax.nn.sigmoid(out)
    return out


def _make_block_fn(plan: FixedPlan, i: int, bp: BlockPlan):
    e = plan.emb_dim

    def block_fn(bparams, dense_in, sparse_in, left_in, right_in):
        dtype = dense_in.dtype
        dense_outs, sparse_outs = [], []
        for k in bp.active_nodes:
            name = plan.space.node_names[k]
            np_ = bparams["nodes"][str(k)]
            if name == "linear-2d":
                dense_outs.append(
                    elastic_linear_apply(np_, dense_in, plan.activation, None)
                )
            elif name == "zeros-2d":
                dense_outs.append(
                    jnp.zeros((dense_in.shape[0], bp.dense_dim), dtype)
                )
            elif name == "sum":
                dense_outs.append(sum_apply(np_, left_in, right_in, None))
            elif name == "sigmoid-gating":
                dense_outs.append(sigmoid_gating_apply(np_, left_in, right_in, None))
            elif name == "dot-product":
                dense_outs.append(
                    dot_product_apply_flat(
                        np_, dense_in, sparse_in, bp.sparse_in, e, None,
                        impl=plan.attention_impl,
                    )
                )
            elif name == "transformer":
                tf = functools.partial(
                    transformer_apply_flat, impl=plan.attention_impl
                )
                if plan.remat_attention and plan.attention_impl != "pallas":
                    tf = jax.checkpoint(tf, static_argnums=(2, 3))
                sparse_outs.append(tf(np_, sparse_in, bp.sparse_in, e, None))
            elif name == "linear-3d":
                sparse_outs.append(
                    elastic_linear3d_apply_flat(
                        np_, sparse_in, bp.sparse_in, e, plan.activation, None
                    )
                )
            elif name == "zeros-3d":
                sparse_outs.append(
                    jnp.zeros((sparse_in.shape[0], bp.sparse_dim * e), dtype)
                )
            else:
                raise NotImplementedError(name)

        dense_out = sum(dense_outs)
        sparse_out = sum(sparse_outs)

        # ds-interact projection from PRE-deep-fm dense output (ref ordering).
        if bp.interact:
            if "ds_proj" in bparams:
                proj = linear_apply(bparams["ds_proj"], dense_out)
                if "ds_ln" in bparams:
                    proj = ln_apply(bparams["ds_ln"], proj)
            else:
                proj = dense_out
            # proj [B, 8*E] IS the slot-major flat of the 8 pseudo-slots the
            # reference reshapes to [B, 8, E] (ref: supernet.py:1137-1161) —
            # in the flat layout it concats onto the sparse output as-is.

        if bp.deep_fm:
            dense_out = dense_out + fm3d_apply_flat(
                bparams["deep_fm"], sparse_out, bp.sparse_dim, e, None
            )

        if bp.interact:
            sparse_out = jnp.concatenate([sparse_out, proj], axis=-1)

        return dense_out, sparse_out

    return block_fn


def fixed_apply_embedded(
    plan: FixedPlan, params: Dict, dense_x: jnp.ndarray, stem: jnp.ndarray, **kw
) -> jnp.ndarray:
    """Forward with a precomputed stem — [B, S, E] or already-flat [B, S*E]
    (host-offloaded embedding; `params` needs no 'embedding' entry)."""
    p = dict(params)
    p.setdefault("embedding", {})
    return fixed_apply(plan, p, dense_x, stem, stem_lookup=lambda _p, s, _o: s, **kw)
