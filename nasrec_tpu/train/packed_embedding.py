"""EXPERIMENTAL: sparse-embedding training on the PACKED table layout.

Same semantics as train/sparse_embedding.py (touched-rows-only torch-Adagrad,
duplicates summed before squaring, global-norm clip over aggregated row
grads), but the table lives as [ceil(vocab/8), 128] (zero lane waste) and
the update can run through the Pallas sweep kernel
(ops/kernels/embedding_sweep_pallas.py) or an XLA scatter fallback
(impl="xla").

NOT the default: the standard sparse step already reaches ~0.65 ms/step at
batch 32768 on full-vocab Criteo via the unique-indices parallel scatter,
and the Pallas sweep is dominated by per-grid-step overhead on the axon
remote runtime (see the status note in embedding_sweep_pallas.py).  The
packed layout remains useful where the plain [vocab, 16] layout would be
forced through a (8,128)-tiled copy (8x memory).

The step sorts the batch's flat indices ONCE and reuses the permutation for
the forward gather, the backward aggregation, and the sweep segments.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.ops.kernels.embedding_sweep_pallas import (
    GROUP,
    aggregate_updates,
    pack_table,
    packed_lookup_sorted,
    sweep_adagrad_update,
    sweep_adagrad_update_reference,
    unpack_table,
)
from nasrec_tpu.train.loop import TrainState
from nasrec_tpu.train.metrics import bce_with_logits
from nasrec_tpu.train.optim import Optimizer, l2_penalty

_SENTINEL = np.int32(2**30)


def pack_embedding_params(params: dict) -> dict:
    """{'embedding': {'table': [T,16]}} -> packed [TP,128] layout."""
    out = dict(params)
    out["embedding"] = {
        **params["embedding"], "table": pack_table(params["embedding"]["table"])
    }
    return out


def unpack_embedding_params(params: dict, total_vocab: int) -> dict:
    out = dict(params)
    out["embedding"] = {
        **params["embedding"],
        "table": unpack_table(params["embedding"]["table"], total_vocab),
    }
    return out


def make_packed_sparse_train_step(
    apply_embedded: Callable,   # (params_rest, dense, stem[, masks]) -> logits
    optimizer: Optimizer,       # non-embedding params
    lr_schedule: Callable,
    offsets: np.ndarray,        # [S] per-slot row offsets (static)
    *,
    grad_clip: Optional[float] = 5.0,
    adagrad_eps: float = 1e-2,
    l2_reg: float = 0.0,
    l2_exclude: Optional[str] = None,
    has_masks: bool = False,
    donate: bool = True,
    impl: str = "pallas",       # "pallas" | "xla" (reference scatter)
    interpret: bool = False,    # Pallas interpreter (CPU tests)
):
    """jitted step(state, dense, cat, y[, masks]); params['embedding']['table']
    must be in the packed [TP, 128] layout (pack_embedding_params)."""
    offsets = np.asarray(offsets, np.int32)

    def step_fn(state: TrainState, dense, cat, y, masks=None):
        if isinstance(masks, tuple):  # (device mask buffer, index)
            buffer, buf_idx = masks
            masks = jax.tree_util.tree_map(lambda x: x[buf_idx], buffer)
        params = state.params
        table = params["embedding"]["table"]
        rest = {k: v for k, v in params.items() if k != "embedding"}
        idx = (cat + jnp.asarray(offsets)[None, :]).reshape(-1)
        order = jnp.argsort(idx)
        idx_s = jnp.take(idx, order)
        inv = jnp.argsort(order)
        stem_sorted = packed_lookup_sorted(table, idx_s)
        stem = jnp.take(stem_sorted, inv, axis=0).reshape(
            cat.shape[0], cat.shape[1], -1
        )

        def loss_fn(rest_p, stem_in):
            logits = (
                apply_embedded(rest_p, dense, stem_in, masks)
                if has_masks
                else apply_embedded(rest_p, dense, stem_in)
            )
            bce = bce_with_logits(logits, y)
            l2 = l2_penalty(rest_p, l2_reg, l2_exclude)
            return bce + l2, (bce, logits)

        (loss, (bce, logits)), (g_rest, g_stem) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rest, stem)

        g_sorted = jnp.take(g_stem.reshape(-1, stem.shape[-1]), order, axis=0)
        rows_c, seg_c = aggregate_updates(idx_s, g_sorted, _SENTINEL)

        if grad_clip is not None:
            sq_rest = sum(
                jnp.sum(jnp.square(l.astype(jnp.float32)))
                for l in jax.tree_util.tree_leaves(g_rest)
            )
            norm = jnp.sqrt(sq_rest + jnp.sum(jnp.square(seg_c)))
            scale = jnp.minimum(1.0, grad_clip / (norm + 1e-6))
        else:
            scale = jnp.float32(1.0)

        lr = lr_schedule(state.step)
        acc = state.opt_state["embedding"]["table"]
        if impl == "pallas":
            new_table, new_acc = sweep_adagrad_update(
                table, acc, rows_c, seg_c * scale, lr,
                eps=adagrad_eps, interpret=interpret,
            )
        else:
            new_table, new_acc = sweep_adagrad_update_reference(
                table, acc, rows_c, seg_c * scale, lr, eps=adagrad_eps
            )

        g_rest = jax.tree_util.tree_map(lambda g: g * scale, g_rest)
        opt_rest = {k: v for k, v in state.opt_state.items() if k != "embedding"}
        new_rest, new_opt_rest = optimizer.update(rest, opt_rest, g_rest, lr)

        new_params = dict(new_rest)
        new_params["embedding"] = {**params["embedding"], "table": new_table}
        new_opt = dict(new_opt_rest)
        new_opt["embedding"] = {**state.opt_state["embedding"], "table": new_acc}
        metrics = {"loss": bce, "l2": loss - bce, "lr": lr, "logits": logits}
        return TrainState(new_params, new_opt, state.step + 1), metrics

    if has_masks:
        fn = lambda state, dense, cat, y, masks: step_fn(state, dense, cat, y, masks)
    else:
        fn = lambda state, dense, cat, y: step_fn(state, dense, cat, y)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_packed_eval_lookup(offsets: np.ndarray):
    """stem_lookup(params, cat, offsets_ignored) -> [B,S,E] for the packed
    layout (sorted gather + unsort), pluggable into fixed_apply/supernet_apply."""
    offsets = np.asarray(offsets, np.int32)

    def lookup(params, cat_x, _offsets):
        idx = (cat_x + jnp.asarray(offsets)[None, :]).reshape(-1)
        order = jnp.argsort(idx)
        stem_sorted = packed_lookup_sorted(
            params["table"], jnp.take(idx, order)
        )
        inv = jnp.argsort(order)
        return jnp.take(stem_sorted, inv, axis=0).reshape(
            cat_x.shape[0], cat_x.shape[1], -1
        )

    return lookup
