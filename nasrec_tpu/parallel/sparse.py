"""Sparse (touched-rows-only) embedding updates under (data, model) sharding.

Combines the two speed claims of this repo into one step:
  - the table is row-sharded over `model` (parallel/embedding.py), and
  - the adagrad table update touches only the rows in the batch
    (train/sparse_embedding.py) — HBM traffic is O(batch * slots), not
    O(table), on every shard.

Data flow per step (shard_map over the full mesh):
  1. forward: masked-gather + psum lookup (shard-local table access)
  2. autodiff w.r.t. the looked-up stem, not the table
  3. update shard_map:
       idx, d_stem  --all_gather over "data"-->  full-batch rows/grads
       sort + segment-sum (exact torch-adagrad semantics: duplicates summed
       BEFORE squaring), global-norm clip folded in
       each `model` shard scatter-updates only the rows it owns
     The all_gather moves O(batch*slots*emb) bytes over ICI — the same order
     as the forward psum — and the table/accumulator traffic stays
     O(touched rows) per shard.

table_update="sweep" swaps both table paths for the streaming-sweep Pallas
kernel on the per-shard PACKED [rows_local/8, 128] layout
(ops/kernels/table_sweep_pallas.py; 5.3x faster than the scatter pair at
flagship scale single-chip): the forward gathers super-rows shard-locally
(+psum), and each shard runs ONE sweep over its own tiles with
row_offset = shard * sup_local — its tile boundaries searchsorted into the
GLOBAL sorted update stream, so other shards' positions are skipped, not
applied, and per-shard results concatenate to exactly the single-chip sweep
(tests/test_table_sweep.py::test_sweep_row_offset_shards_reproduce_full_table).
Shards hold whole kernel tiles: pad with `sweep_rows_per_shard` /
`pack_table_for_mesh`.

The reference has no distributed analogue (SURVEY.md §2.9); this is the
BASELINE north-star path (config #5: multi-host Criteo full-embedding train
with sharded tables).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from nasrec_tpu.parallel.embedding import _lookup_shard
from nasrec_tpu.train.loop import TrainState
from nasrec_tpu.train.metrics import bce_with_logits
from nasrec_tpu.train.optim import Optimizer, l2_penalty
from nasrec_tpu.train.sparse_embedding import (
    rowwise_segment_sum_slotwise,
    sparse_adagrad_table_update,
)


# --- sweep-packed row sharding ----------------------------------------------


def sweep_rows_per_shard(total_vocab: int, num_shards: int) -> int:
    """Vocab rows per model shard, padded so every shard holds WHOLE sweep
    tiles (the kernel's row_offset contract)."""
    from nasrec_tpu.ops.kernels.table_sweep_pallas import ROWS_PER_TILE

    return -(-total_vocab // (num_shards * ROWS_PER_TILE)) * ROWS_PER_TILE


def pack_table_for_mesh(table: jnp.ndarray, num_shards: int) -> jnp.ndarray:
    """[T, 16] -> sweep-packed [num_shards*per/8, 128] where shard m's
    contiguous slice is pack_rows of global vocab rows [m*per, (m+1)*per).
    Padding lives at the global END (vocab-row numbering is unchanged), so
    `idx` built from table_offsets stays valid."""
    from nasrec_tpu.ops.kernels.table_sweep_pallas import pack_rows

    t, e = table.shape
    per = sweep_rows_per_shard(t, num_shards)
    pad = per * num_shards - t
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad, e), table.dtype)], axis=0
        )
    return jnp.concatenate(
        [pack_rows(table[m * per:(m + 1) * per]) for m in range(num_shards)],
        axis=0,
    )


def unpack_table_from_mesh(
    packed: jnp.ndarray, total_vocab: int, num_shards: int
) -> jnp.ndarray:
    """Inverse of pack_table_for_mesh: back to [total_vocab, 16]."""
    from nasrec_tpu.ops.kernels.table_sweep_pallas import GROUP, unpack_rows

    per = sweep_rows_per_shard(total_vocab, num_shards)
    sup_per = per // GROUP
    parts = [
        unpack_rows(packed[m * sup_per:(m + 1) * sup_per], per)
        for m in range(num_shards)
    ]
    return jnp.concatenate(parts, axis=0)[:total_vocab]


def _packed_lookup_shard(table_p_local: jnp.ndarray, idx: jnp.ndarray):
    """Per-shard packed-table lookup: gather owned super-rows (lane-select),
    zero the rest, psum over `model` — the packed twin of _lookup_shard."""
    from nasrec_tpu.ops.kernels.table_sweep_pallas import (
        EMB, GROUP, packed_lookup,
    )

    rows_local = table_p_local.shape[0] * GROUP
    shard = jax.lax.axis_index("model")
    local = idx - shard * rows_local
    owned = (local >= 0) & (local < rows_local)
    safe = jnp.clip(local, 0, rows_local - 1)
    out = packed_lookup(table_p_local, safe.reshape(-1))
    out = out.reshape(*idx.shape, EMB)
    out = out * owned[..., None].astype(out.dtype)
    return jax.lax.psum(out, "model")


def make_sharded_packed_stem_lookup(mesh: Mesh):
    """Sweep-packed twin of parallel.embedding.make_sharded_stem_lookup:
    lookup(params, cat_x, offsets) -> [B, S, E] with the PACKED table
    sharded P("model", None) and the batch P("data", None)."""
    mapped = shard_map(
        _packed_lookup_shard,
        mesh=mesh,
        in_specs=(P("model", None), P("data", None)),
        out_specs=P("data", None, None),
    )

    def lookup(params, cat_x, offsets):
        idx = cat_x + jnp.asarray(offsets)[None, :]
        return mapped(params["table"], idx)

    return lookup


def make_parallel_sparse_train_step(
    apply_embedded: Callable,   # (params_rest, dense, stem[, masks]) -> logits
    optimizer: Optimizer,       # for all non-embedding params
    lr_schedule: Callable,
    mesh: Mesh,
    offsets: np.ndarray,        # [S] per-slot row offsets (static)
    *,
    grad_clip: Optional[float] = 5.0,
    adagrad_eps: float = 1e-2,
    l2_reg: float = 0.0,        # non-embedding params only
    l2_exclude: Optional[str] = None,
    has_masks: bool = False,
    donate: bool = True,
    table_update: str = "scatter",   # "scatter" | "sweep"
    sweep_interpret: Optional[bool] = None,
    microbatch: int = 1,
):
    """jitted step(state, dense, cat, y[, masks]) with the table and its
    adagrad accumulator sharded P("model", None) and the batch P("data").

    table_update="sweep" requires the state's table/accumulator in the
    per-shard packed layout (pack_table_for_mesh); results match the
    scatter path up to FMA contraction.

    microbatch > 1 splits the global batch into that many equal slices and
    scans fwd+bwd over them (same gradient-accumulation semantics as the
    single-chip step: mean of slice grads == full-batch grad for the mean
    loss), bounding activation HBM per shard while the table update still
    sees the whole batch's touched rows at once."""
    offsets = np.asarray(offsets, np.int32)
    if table_update not in ("scatter", "sweep"):
        raise ValueError(f"unknown table_update {table_update!r}")
    if microbatch < 1:
        raise ValueError(f"microbatch must be >= 1, got {microbatch}")
    sweep = table_update == "sweep"
    if sweep and sweep_interpret is None:
        sweep_interpret = jax.default_backend() != "tpu"

    lookup = shard_map(
        _packed_lookup_shard if sweep else _lookup_shard,
        mesh=mesh,
        in_specs=(P("model", None), P("data", None)),
        out_specs=P("data", None, None),
    )

    def _update_shard(table_local, acc_local, idx_local, g_local, sq_rest, lr):
        """Per-(data, model)-shard body: aggregate the global batch's
        embedding grads, clip, update owned rows (scatter or sweep)."""
        idx_g = jax.lax.all_gather(idx_local, "data", tiled=True)   # [B, S]
        g_g = jax.lax.all_gather(g_local, "data", tiled=True)       # [B, S, E]
        # Slotwise (batched per-column sort) aggregation — ~2x cheaper than
        # the flat argsort at large batches (train/sparse_embedding.py).
        rows, seg, is_end = rowwise_segment_sum_slotwise(
            idx_g, g_g.reshape(-1, g_g.shape[-1])
        )
        # sum(seg^2) equals the dense-table grad norm (seg holds each vocab
        # row's summed grad once, zeros elsewhere).
        sq_emb = jnp.sum(jnp.square(seg))
        if grad_clip is not None:
            norm = jnp.sqrt(sq_rest + sq_emb)
            scale = jnp.minimum(1.0, grad_clip / (norm + 1e-6))
        else:
            scale = jnp.float32(1.0)
        shard = jax.lax.axis_index("model")
        if sweep:
            from nasrec_tpu.ops.kernels.table_sweep_pallas import (
                sweep_adagrad_update,
            )

            new_table, new_acc = sweep_adagrad_update(
                table_local, acc_local, rows, seg * scale, lr,
                shard * table_local.shape[0],
                eps=adagrad_eps, interpret=sweep_interpret,
            )
            return new_table, new_acc, scale
        rows_local = table_local.shape[0]
        local = rows - shard * rows_local
        owned = (local >= 0) & (local < rows_local)
        safe = jnp.clip(local, 0, rows_local - 1)
        new_table, new_acc = sparse_adagrad_table_update(
            table_local, acc_local, safe, seg, lr, adagrad_eps, scale,
            is_end & owned,
        )
        return new_table, new_acc, scale

    update = shard_map(
        _update_shard,
        mesh=mesh,
        in_specs=(
            P("model", None), P("model", None),
            P("data", None), P("data", None, None), P(), P(),
        ),
        out_specs=(P("model", None), P("model", None), P()),
        check_vma=False,  # scale is replicated by construction (same math on
                          # identical all_gathered inputs on every shard)
    )

    def step_fn(state: TrainState, dense, cat, y, masks=None):
        params = state.params
        table = params["embedding"]["table"]
        rest = {k: v for k, v in params.items() if k != "embedding"}
        idx = cat + jnp.asarray(offsets)[None, :]

        def loss_fn(rest_p, stem_in, dense_in, y_in):
            logits = (
                apply_embedded(rest_p, dense_in, stem_in, masks)
                if has_masks
                else apply_embedded(rest_p, dense_in, stem_in)
            )
            bce = bce_with_logits(logits, y_in)
            l2 = l2_penalty(rest_p, l2_reg, l2_exclude)
            return bce + l2, (bce, logits)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

        if microbatch == 1:
            stem = lookup(table, idx)
            (loss, (bce, logits)), (g_rest, g_stem) = grad_fn(
                rest, stem, dense, y
            )
        else:
            b_full, s = cat.shape
            assert b_full % microbatch == 0, (
                f"batch {b_full} not divisible by microbatch {microbatch}"
            )
            b = b_full // microbatch

            def micro(g_rest_acc, xs):
                d_i, c_i, y_i = xs
                idx_i = c_i + jnp.asarray(offsets)[None, :]
                stem_i = lookup(table, idx_i)
                (loss_i, (bce_i, logits_i)), (g_rest_i, g_stem_i) = grad_fn(
                    rest, stem_i, d_i, y_i
                )
                g_rest_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g, g_rest_acc, g_rest_i
                )
                return g_rest_acc, (g_stem_i, loss_i, bce_i, logits_i)

            zeros = jax.tree_util.tree_map(jnp.zeros_like, rest)
            g_rest_sum, (g_stems, losses, bces, logits_m) = jax.lax.scan(
                micro,
                zeros,
                (
                    dense.reshape(microbatch, b, -1),
                    cat.reshape(microbatch, b, s),
                    y.reshape(microbatch, b, -1),
                ),
            )
            inv_m = 1.0 / microbatch
            g_rest = jax.tree_util.tree_map(lambda g: g * inv_m, g_rest_sum)
            # [M, b, S, E] row-major stacking equals the full-batch [B, S, E]
            # order, so `idx` (whole batch) lines up with the concatenation.
            g_stem = g_stems.reshape(b_full, s, -1) * inv_m
            loss, bce = losses.mean(), bces.mean()
            logits = logits_m.reshape(b_full, -1)

        sq_rest = sum(
            jnp.sum(jnp.square(l.astype(jnp.float32)))
            for l in jax.tree_util.tree_leaves(g_rest)
        ) if grad_clip is not None else jnp.float32(0.0)

        lr = lr_schedule(state.step)
        acc = state.opt_state["embedding"]["table"]
        new_table, new_acc, scale = update(table, acc, idx, g_stem, sq_rest, lr)

        g_rest = jax.tree_util.tree_map(lambda g: g * scale, g_rest)
        opt_rest = {k: v for k, v in state.opt_state.items() if k != "embedding"}
        new_rest, new_opt_rest = optimizer.update(rest, opt_rest, g_rest, lr)

        new_params = dict(new_rest)
        new_params["embedding"] = {**params["embedding"], "table": new_table}
        new_opt = dict(new_opt_rest)
        new_opt["embedding"] = {**state.opt_state["embedding"], "table": new_acc}
        metrics = {"loss": bce, "l2": loss - bce, "lr": lr, "logits": logits}
        return TrainState(new_params, new_opt, state.step + 1), metrics

    batch_sharding = NamedSharding(mesh, P("data"))
    if has_masks:
        fn = lambda state, dense, cat, y, masks: step_fn(state, dense, cat, y, masks)
        in_shardings = (None, batch_sharding, batch_sharding, batch_sharding, None)
    else:
        fn = lambda state, dense, cat, y: step_fn(state, dense, cat, y)
        in_shardings = (None, batch_sharding, batch_sharding, batch_sharding)
    return jax.jit(
        fn, in_shardings=in_shardings, donate_argnums=(0,) if donate else ()
    )
