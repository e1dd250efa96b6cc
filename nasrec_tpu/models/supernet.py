"""Weight-sharing supernet: static shapes everywhere, choices as mask inputs.

Reference model: nasrec/supernet/supernet.py (SuperNet :210, SuperNetBlock
:884).  The reference keeps shapes static in supernet mode by substituting
cached zero tensors for non-selected inputs and multiplying node outputs by
width masks (ref :536-568, modules.py:57-127).  That is exactly the
XLA-friendly formulation, so here the entire architecture choice is lowered
to `ChoiceMasks` (see nasrec_tpu/choices.py) and passed as an *input* to one
jitted function — a single compiled executable serves every subnet, including
the full path.

Differences from the reference, on purpose (TPU-first):
  - explicit analytical shape inference instead of nn.LazyLinear warmup
  - functional params pytree + threaded RNG keys instead of module state
  - input selection implemented as scalar-mask multiply + concat (equivalent
    arithmetic to zero-substitution, but with no host-side tensor cache)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from nasrec_tpu.config import (
    DEFAULT_EMBEDDING_DIM,
    DENSE_BINARY_NODES,
    DENSE_SPARSE_NODES,
    DENSE_UNARY_NODES,
    DS_INTERACT_NUM_SPLITS,
    OpsConfig,
    SPARSE_NODES,
)
from nasrec_tpu.choices import ChoiceMasks
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
class SuperNetConfig:
    """Static supernet description (hashable; safe to close over in jit)."""

    space: OpsConfig
    num_blocks: int
    num_dense: int
    num_sparse: int
    vocab_sizes: Tuple[int, ...]
    emb_dim: int = DEFAULT_EMBEDDING_DIM
    use_layernorm: bool = True
    activation: str = "relu"
    last_n_blocks_out: int = 1
    use_final_sigmoid: bool = False
    # Recompute attention in the backward pass instead of saving [B,H,S,S]
    # score residuals — with head_dim=2 the scores are ~64x larger than the
    # useful activations, so remat trades negligible FLOPs for huge HBM wins.
    remat_attention: bool = True
    # "pallas": fused VMEM-resident attention kernel (no [B,H,S,S] in HBM in
    # either direction; makes remat unnecessary).  "xla": einsum path.
    attention_impl: str = "xla"

    # -- derived static shapes (supernet mode: everything at max width) ------

    def dense_width(self, j: int) -> int:
        """Width of virtual-block j's dense output (j=0 is the stem)."""
        return self.num_dense if j == 0 else self.space.max_dense_dim

    def sparse_slots(self, j: int) -> int:
        """Slot count of virtual-block j's sparse output.  Every choice block
        appends DS_INTERACT_NUM_SPLITS pseudo-slots (ref: supernet.py:1161)."""
        if j == 0:
            return self.num_sparse
        return self.space.max_sparse_dim + DS_INTERACT_NUM_SPLITS

    def block_dense_in(self, i: int) -> int:
        return sum(self.dense_width(j) for j in range(i + 1))

    def block_sparse_in(self, i: int) -> int:
        return sum(self.sparse_slots(j) for j in range(i + 1))

    def head_width(self) -> int:
        n = self.last_n_blocks_out
        nb = self.num_blocks
        dense = sum(self.dense_width(j) for j in range(nb, nb - n, -1))
        slots = self.sparse_slots(nb)  # all tail blocks share this slot count
        return dense + slots * self.emb_dim * n


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _node_init(key, cfg: SuperNetConfig, i: int, name: str) -> Dict:
    """Init one node of block i at maximum (supernet) widths."""
    s = cfg.space
    d_in = cfg.block_dense_in(i)
    s_in = cfg.block_sparse_in(i)
    if name == "linear-2d":
        return elastic_linear_init(key, d_in, s.max_dense_dim, cfg.use_layernorm)
    if name == "zeros-2d" or name == "zeros-3d":
        return {}
    if name == "sum":
        return sum_init(key, d_in, d_in, s.max_dense_dim, cfg.use_layernorm)
    if name == "sigmoid-gating":
        return sigmoid_gating_init(key, d_in, d_in, s.max_dense_dim, cfg.use_layernorm)
    if name == "dot-product":
        return dot_product_init(
            key, d_in, s_in, s.max_dense_dim, cfg.emb_dim, cfg.use_layernorm
        )
    if name == "transformer":
        return transformer_init(key, s_in, s.max_sparse_dim, cfg.emb_dim, cfg.use_layernorm)
    if name == "linear-3d":
        return elastic_linear3d_init(key, s_in, s.max_sparse_dim, cfg.use_layernorm)
    raise NotImplementedError(name)


def _block_init(key, cfg: SuperNetConfig, i: int) -> Dict:
    s = cfg.space
    keys = jax.random.split(key, s.num_nodes + 2)
    nodes = [_node_init(keys[k], cfg, i, name) for k, name in enumerate(s.node_names)]
    p: Dict[str, Any] = {"nodes": nodes}
    # Dense->sparse merge projection (ref: supernet.py:985-995); in supernet
    # mode it always exists because max_dense != 8*emb_dim for the lib spaces.
    expanded = DS_INTERACT_NUM_SPLITS * cfg.emb_dim
    if s.max_dense_dim != expanded:
        p["ds_proj"] = linear_init(
            keys[-2], s.max_dense_dim, expanded, use_bias=not cfg.use_layernorm
        )
        if cfg.use_layernorm:
            p["ds_ln"] = ln_init(expanded)
    # DeepFM branch (ref: supernet.py:997-1003).
    p["deep_fm"] = fm3d_init(keys[-1], cfg.emb_dim, s.max_dense_dim, cfg.use_layernorm)
    return p


def supernet_init(key, cfg: SuperNetConfig) -> Dict:
    keys = jax.random.split(key, cfg.num_blocks + 2)
    params: Dict[str, Any] = {
        "embedding": embedding_stem_init(keys[0], cfg.vocab_sizes, cfg.emb_dim),
        "blocks": [_block_init(keys[1 + i], cfg, i) for i in range(cfg.num_blocks)],
        "final": linear_init(keys[-1], cfg.head_width(), 1, use_bias=True),
    }
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _masked_concat(tensors: Sequence[jnp.ndarray], sel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Concat prior outputs, scaling each by its 0/1 selector (equivalent to
    the reference's zero-tensor substitution, ref: supernet.py:536-568)."""
    parts = [t * sel[j].astype(t.dtype) for j, t in enumerate(tensors)]
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else parts[0]


def _block_apply(
    bp: Dict,
    cfg: SuperNetConfig,
    i: int,
    dense_in: jnp.ndarray,
    sparse_in: jnp.ndarray,
    left_in: jnp.ndarray,
    right_in: jnp.ndarray,
    masks: ChoiceMasks,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    s = cfg.space
    act = masks.node_act[i]
    ddim = masks.dense_dim[i]
    sdim = masks.sparse_dim[i]
    dtype = dense_in.dtype
    e = cfg.emb_dim
    s_in = cfg.block_sparse_in(i)

    dense_outs: List[jnp.ndarray] = []
    sparse_outs: List[jnp.ndarray] = []
    for k, name in enumerate(s.node_names):
        np_ = bp["nodes"][k]
        if name in ("zeros-2d", "zeros-3d"):
            continue  # contributes exact zeros to the sum (ref: supernet.py:1083-1111)
        gate = act[k].astype(dtype)
        if name == "linear-2d":
            o = elastic_linear_apply(np_, dense_in, cfg.activation, ddim)
            dense_outs.append(o * gate)
        elif name == "sum":
            o = sum_apply(np_, left_in, right_in, ddim)
            dense_outs.append(o * gate)
        elif name == "sigmoid-gating":
            o = sigmoid_gating_apply(np_, left_in, right_in, ddim)
            dense_outs.append(o * gate)
        elif name == "dot-product":
            o = dot_product_apply_flat(np_, dense_in, sparse_in, s_in, e, ddim,
                                       impl=cfg.attention_impl)
            dense_outs.append(o * gate)
        elif name == "transformer":
            tf = functools.partial(transformer_apply_flat, impl=cfg.attention_impl)
            if cfg.remat_attention and cfg.attention_impl != "pallas":
                tf = jax.checkpoint(tf, static_argnums=(2, 3))
            o = tf(np_, sparse_in, s_in, e, sdim)
            sparse_outs.append(o * gate)
        elif name == "linear-3d":
            o = elastic_linear3d_apply_flat(
                np_, sparse_in, s_in, e, cfg.activation, sdim
            )
            sparse_outs.append(o * gate)
        else:
            raise NotImplementedError(name)

    dense_out = sum(dense_outs)   # node outputs are summed (ref: supernet.py:1133-1134)
    sparse_out = sum(sparse_outs)

    # Dense->sparse merge, computed from the PRE-deep-fm dense output
    # (ref ordering: supernet.py:1137-1161).
    if "ds_proj" in bp:
        proj = linear_apply(bp["ds_proj"], dense_out)
        if "ds_ln" in bp:
            proj = ln_apply(bp["ds_ln"], proj)
    else:
        proj = dense_out
    # proj [B, 8*E] is already the slot-major flat of the 8 pseudo-slots
    # (ref reshapes to [B, 8, E]; the flat layout concats it as-is).
    proj = proj * masks.interact[i].astype(dtype)

    # DeepFM: sparse -> dense residual (ref: supernet.py:1154-1157).
    fm = fm3d_apply_flat(bp["deep_fm"], sparse_out, s.max_sparse_dim, e, ddim)
    dense_out = dense_out + fm * masks.deep_fm[i].astype(dtype)

    sparse_out = jnp.concatenate([sparse_out, proj], axis=-1)
    return dense_out, sparse_out


def supernet_apply(
    cfg: SuperNetConfig,
    params: Dict,
    dense_x: jnp.ndarray,  # [B, num_dense] float
    cat_x: jnp.ndarray,    # [B, num_sparse] int32
    masks: ChoiceMasks,
    *,
    compute_dtype=jnp.float32,
    stem_lookup=None,  # override for sharded tables (nasrec_tpu/parallel)
) -> jnp.ndarray:
    """Forward pass -> logits [B, 1].  One compiled graph for every subnet.

    Sparse activations flow in the FLAT slot-major [B, S*E] layout (see
    ops/common.py) — slot-axis selection/concat and the head flatten are
    plain 2-D lane ops with no 8x-lane-padded [B, S, 16] tensors."""
    offsets = table_offsets(cfg.vocab_sizes)
    lookup = stem_lookup if stem_lookup is not None else embedding_stem_apply
    sparse_stem = lookup(params["embedding"], cat_x, offsets)
    if sparse_stem.ndim == 3:  # [B, S, E] -> flat [B, S*E]
        sparse_stem = sparse_stem.reshape(sparse_stem.shape[0], -1)
    dense_list = [dense_x.astype(compute_dtype)]
    sparse_list = [sparse_stem.astype(compute_dtype)]

    for i in range(cfg.num_blocks):
        dense_in = _masked_concat(dense_list, masks.dense_sel[i], axis=-1)
        sparse_in = _masked_concat(sparse_list, masks.sparse_sel[i], axis=-1)
        left_in = _masked_concat(dense_list, masks.left_sel[i], axis=-1)
        right_in = _masked_concat(dense_list, masks.right_sel[i], axis=-1)
        d_out, s_out = _block_apply(
            params["blocks"][i], cfg, i, dense_in, sparse_in, left_in, right_in, masks
        )
        dense_list.append(d_out)
        sparse_list.append(s_out)

    n = cfg.last_n_blocks_out
    flat_dense = jnp.concatenate(dense_list[-n:], axis=-1) if n > 1 else dense_list[-1]
    if n > 1:
        # Reference concats the tail sparse outputs on the EMB axis before
        # flattening (ref: supernet.py:657-660): rebuild 3-D for the
        # interleaved column order (transplant-compatible final weights).
        e = cfg.emb_dim
        tail = [
            s.reshape(s.shape[0], s.shape[-1] // e, e) for s in sparse_list[-n:]
        ]
        flat_sparse = jnp.concatenate(tail, axis=-1).reshape(dense_x.shape[0], -1)
    else:
        flat_sparse = sparse_list[-1]  # flat layout == the reference flatten
    feats = jnp.concatenate([flat_dense, flat_sparse], axis=-1)
    out = linear_apply(params["final"], feats).astype(jnp.float32)
    if cfg.use_final_sigmoid:
        out = jax.nn.sigmoid(out)
    return out


def supernet_apply_embedded(
    cfg: SuperNetConfig, params: Dict, dense_x: jnp.ndarray, stem: jnp.ndarray,
    masks: ChoiceMasks, **kw
) -> jnp.ndarray:
    """Forward with a precomputed stem — [B, S, E] or already-flat [B, S*E]
    (host-offloaded embedding; `params` needs no 'embedding' entry)."""
    p = dict(params)
    p.setdefault("embedding", {})
    return supernet_apply(
        cfg, p, dense_x, stem, masks, stem_lookup=lambda _p, s, _o: s, **kw
    )
