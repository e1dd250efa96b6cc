"""Sparse (touched-rows-only) embedding updates inside one jitted step.

Problem: the generic train step materialises a DENSE gradient for the fused
embedding table (gather-VJP scatters into a table-sized zero array) and the
optimizer then reads+writes every row of table/accumulator — ~1 GB of HBM
traffic per step for the search-capped Criteo table, dominating the step.

TPU-native fix: differentiate w.r.t. the looked-up stem [B,S,E] instead of
the table, aggregate duplicate rows ON DEVICE with static shapes
(sort + cumsum segment-sum), and scatter-update only the touched rows:

    rows, seg = aggregate(idx, d_stem)      # seg = per-unique-row summed grad
    acc'   = acc.at[rows].add(seg^2)        # adagrad accumulates (sum g)^2
    table' = table.at[rows].add(-lr * seg / (sqrt(acc_rows + seg^2) + eps))

Off-boundary positions carry seg=0, so their scatter contributions are exact
no-ops — everything stays static-shape.  Semantics match torch's dense
Adagrad exactly (duplicates summed before squaring), including the global
grad-norm clip which sees the aggregated per-row norms.

Traffic drops from O(table) to O(batch * slots) per step.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from nasrec_tpu.train.loop import TrainState
from nasrec_tpu.train.metrics import bce_with_logits
from nasrec_tpu.train.optim import Optimizer


def _segment_last_sum(keys_sorted: jnp.ndarray, vals_sorted: jnp.ndarray):
    """Per-segment sums of vals at each segment's LAST position (else 0).

    keys_sorted: [N] int32 non-decreasing, vals_sorted: [N, E].  Returns
    (seg [N, E], is_end [N] bool)."""
    cs = jnp.cumsum(vals_sorted, axis=0)
    k = keys_sorted
    is_end = jnp.concatenate([k[1:] != k[:-1], jnp.ones((1,), bool)])
    n = k.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    # Index of the previous segment end (exclusive prefix cummax of end marks).
    end_pos = jnp.where(is_end, pos, -1)
    prev_end = jax.lax.associative_scan(jnp.maximum, end_pos)
    prev_end = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prev_end[:-1]])
    base = jnp.where(
        (prev_end >= 0)[:, None], jnp.take(cs, jnp.maximum(prev_end, 0), axis=0), 0.0
    )
    seg = jnp.where(is_end[:, None], cs - base, 0.0)
    return seg, is_end


def _slotwise_sort(idx2d: jnp.ndarray, g: jnp.ndarray):
    """Sort fused-table indices by exploiting the slot partition.

    idx2d: [B, S] where column s holds indices in [offsets[s], offsets[s+1])
    — DISJOINT ranges, ascending with s (the fused-table layout guarantee).
    Column-sorting and concatenating columns therefore yields a globally
    non-decreasing stream via one batched [B, S] sort.

    The sorted values and the permutation come from ONE lax.sort over
    (values, iota) — jnp.argsort followed by take_along_axis re-gathers the
    values element-by-element, which is latency-bound on TPU (~8 ms for
    852k elements at the flagship shape, probe_prep_and_body_r4.py r4).

    g: [B*S, E] in (b, s) row-major order (the stem-grad flatten).
    Returns (rows_sorted [B*S], g_sorted [B*S, E])."""
    b, s = idx2d.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, s), 0)
    rows_bs, order_b = jax.lax.sort((idx2d, iota), dimension=0, num_keys=1)
    rows = rows_bs.T.reshape(-1)                             # slot-major
    perm = (order_b * s
            + jnp.arange(s, dtype=order_b.dtype)[None, :]).T.reshape(-1)
    return rows, jnp.take(g, perm, axis=0)


def rowwise_segment_sum_slotwise(idx2d: jnp.ndarray, g: jnp.ndarray):
    """rowwise_segment_sum on slot-partitioned [B, S] indices (see
    _slotwise_sort for the contract).

    COLUMN-MAJOR COMPACT pipeline (round 4; 19.1 -> ~9 ms at the flagship
    shape, probe_prep_and_body_r4.py): the old path flattened to [B*S, 16]
    first, putting every per-position op on 16-lane rows that TPU pads to
    128 lanes (8x traffic) and paying an element-gather for the sorted
    rows.  Here everything runs in the [B, S, E] / [B, S*E] layout — full
    128-lane utilisation — and only the two OUTPUT transposes touch the
    slot-major flat order the sweep/scatter contract wants:

      1. one lax.sort over (idx2d, iota): sorted rows + permutation;
      2. one take_along_axis row gather of g;
      3. cumsum over compact [B, S*E] lanes; each segment's base (the
         cumsum just before its start) comes from a cummax of start
         positions + one [B, S]-indexed row gather of the cumsum.

    Per-column cumsums also accumulate less rounding than the old global
    cumsum over the concatenated columns (segments never span columns, so
    the telescoped differences are over the same additions either way).
    """
    b, s = idx2d.shape
    e = g.shape[-1]
    g3 = g.reshape(b, s, e)
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, s), 0)
    rows_bs, order_b = jax.lax.sort((idx2d, iota), dimension=0, num_keys=1)
    g_sorted = jnp.take_along_axis(g3, order_b[:, :, None], axis=0)

    cs = jnp.cumsum(g_sorted.reshape(b, s * e), axis=0)        # [B, S*E]
    cs3 = cs.reshape(b, s, e)
    is_end = jnp.concatenate(
        [rows_bs[1:] != rows_bs[:-1], jnp.ones((1, s), bool)], axis=0
    )                                                          # [B, S]
    is_start = jnp.concatenate(
        [jnp.ones((1, s), bool), rows_bs[1:] != rows_bs[:-1]], axis=0
    )
    # Index of each position's segment start (per column): forward-carried
    # maximum of start positions.
    start_idx = jax.lax.cummax(
        jnp.where(is_start, iota, 0), axis=0
    )                                                          # [B, S]
    # base = cumsum one row above the segment start (zero for row-0 starts).
    base = jnp.take_along_axis(
        cs3, jnp.maximum(start_idx - 1, 0)[:, :, None], axis=0
    )
    base = jnp.where((start_idx > 0)[:, :, None], base, 0.0)
    seg_col = jnp.where(is_end[:, :, None], cs3 - base, 0.0)   # [B, S, E]

    rows = rows_bs.T.reshape(-1)
    seg = seg_col.transpose(1, 0, 2).reshape(b * s, e)
    return rows, seg, is_end.T.reshape(-1)


def rowwise_segment_sum(rows: jnp.ndarray, g: jnp.ndarray):
    """Aggregate gradient contributions of duplicate rows (static shapes).

    rows: [N] int32, g: [N, E].  Returns (sorted_rows [N], seg [N, E],
    is_end [N] bool) where seg is the full per-row sum at each segment's LAST
    position and exactly zero elsewhere; is_end marks those last positions.
    This is also the sweep kernel's input contract (sorted vocab rows,
    16-lane per-row sums; duplicates carry exact zeros) — the kernel does
    its own lane expansion and super-row mapping in VMEM.
    """
    order = jnp.argsort(rows)
    r = rows[order]
    gs = jnp.take(g, order, axis=0)
    seg, is_end = _segment_last_sum(r, gs)
    return r, seg, is_end


def sparse_adagrad_table_update(
    table: jnp.ndarray,
    acc: jnp.ndarray,
    rows: jnp.ndarray,   # [N] already-sorted rows from rowwise_segment_sum
    seg: jnp.ndarray,    # [N, E] aggregated grads (zero off-boundary)
    lr,
    eps: float = 1e-2,
    scale=1.0,
    is_end: jnp.ndarray = None,  # [N] bool segment-end marks
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    seg = seg * scale
    acc_rows = jnp.take(acc, rows, axis=0)
    sq = jnp.square(seg)
    if is_end is not None:
        # Only segment-end positions carry a nonzero contribution; route the
        # rest out-of-bounds so mode="drop" skips them and the remaining
        # indices are unique — XLA then emits a parallel scatter instead of
        # the serialized duplicate-handling one (the difference between
        # ~100 ms and ~10 ms at 851k rows on v5e).
        tgt = jnp.where(is_end, rows, table.shape[0])
        new_acc = acc.at[tgt].add(sq, mode="drop", unique_indices=True)
        delta = -lr * seg / (jnp.sqrt(acc_rows + sq) + eps)
        new_table = table.at[tgt].add(delta, mode="drop", unique_indices=True)
    else:
        new_acc = acc.at[rows].add(sq)
        delta = -lr * seg / (jnp.sqrt(acc_rows + sq) + eps)
        new_table = table.at[rows].add(delta)
    return new_table, new_acc


def pack_state_for_sweep(state: TrainState) -> TrainState:
    """Convert the fused embedding table (and its adagrad accumulator) to the
    streaming-sweep packed [Tpad/8, 128] layout (zero-padding vocab rows to a
    tile multiple first; padding is never indexed and passes through the
    sweep bit-exactly).  `unpack_state_from_sweep` inverts it (checkpoints,
    eval on the standard layout, parity comparisons)."""
    from nasrec_tpu.ops.kernels.table_sweep_pallas import pack_rows

    params = dict(state.params)
    params["embedding"] = {
        **state.params["embedding"],
        "table": pack_rows(state.params["embedding"]["table"]),
    }
    opt = dict(state.opt_state)
    opt["embedding"] = {
        **state.opt_state["embedding"],
        "table": pack_rows(state.opt_state["embedding"]["table"]),
    }
    return TrainState(params, opt, state.step)


def packed_stem_lookup(emb_params, cat_x, offsets):
    """Drop-in stem lookup (models.fixed_apply's `stem_lookup` hook) for the
    packed [Tpad/8, 128] table layout — eval/inference on a sweep-mode state
    without unpacking.  Slightly FASTER than the unpacked gather (15.6 ms vs
    17.3 ms for 852k rows; experiments/probe_table_sweep.py): the super-row
    gather moves aligned 512 B lines."""
    from nasrec_tpu.ops.kernels.table_sweep_pallas import packed_lookup

    b, s = cat_x.shape
    idx = (cat_x + jnp.asarray(offsets)[None, :]).reshape(-1)
    return packed_lookup(emb_params["table"], idx).reshape(b, s, -1)


def unpack_state_from_sweep(state: TrainState, total_vocab: int) -> TrainState:
    """Inverse of pack_state_for_sweep: back to the [total_vocab, 16] layout."""
    from nasrec_tpu.ops.kernels.table_sweep_pallas import unpack_rows

    params = dict(state.params)
    params["embedding"] = {
        **state.params["embedding"],
        "table": unpack_rows(state.params["embedding"]["table"], total_vocab),
    }
    opt = dict(state.opt_state)
    opt["embedding"] = {
        **state.opt_state["embedding"],
        "table": unpack_rows(state.opt_state["embedding"]["table"], total_vocab),
    }
    return TrainState(params, opt, state.step)


def make_sparse_embedding_train_step(
    apply_embedded: Callable,   # (params_rest, dense, stem[, masks]) -> logits
    optimizer: Optimizer,       # used for all non-embedding params
    lr_schedule: Callable,
    offsets: np.ndarray,        # [S] per-slot row offsets (static)
    *,
    grad_clip: Optional[float] = 5.0,
    adagrad_eps: float = 1e-2,
    l2_reg: float = 0.0,        # applied to non-embedding params only
    l2_exclude: Optional[str] = None,
    has_masks: bool = False,
    donate: bool = True,
    microbatch: int = 1,
    table_update: str = "scatter",   # "scatter" | "sweep"
    sweep_interpret: Optional[bool] = None,
):
    """jitted step(state, dense, cat, y) with a sparse-adagrad table update.

    `state.params` holds the full pytree including params["embedding"]["table"];
    `state.opt_state` mirrors it (the table's slot is its adagrad accumulator).
    Requires the embedding optimizer to be Adagrad and wd handled as an
    explicit loss EXCLUDING the table (a dense L2 grad would defeat sparsity).

    table_update="sweep" replaces the two touched-row scatters with the
    streaming-sweep Pallas kernel (ops/kernels/table_sweep_pallas.py): XLA's
    TPU scatter is latency-bound at ~104 ns/row, so at ~841k touched rows the
    scatter pair costs ~176 ms while a full-table stream applying the same
    update costs ~30-40 ms.  Requires the fused table (and its accumulator)
    in the PACKED [Tpad/8, 128] layout — convert the state once with
    `pack_state_for_sweep` (and back with `unpack_state_from_sweep` for
    checkpoints/eval); padding rows are never indexed and pass through
    bit-exactly.  The forward gathers super-rows from the packed table
    (lane-select, see table_sweep_pallas.packed_lookup) and the backward
    aggregates at super-row granularity.  Numerics match the scatter path up
    to FMA contraction and f32 summation order.  sweep_interpret=None
    auto-selects the Pallas interpreter off-TPU (tests).

    microbatch > 1 splits the batch into that many equal slices and runs the
    forward+backward under `lax.scan`, accumulating gradients — peak
    activation memory drops to one slice's worth while the update math stays
    that of the FULL batch (grads averaged before the clip; duplicate rows
    aggregated across all slices before squaring), so numerics match the
    single-shot step up to float summation order.  This is the large-batch
    path: batch 65536+ of the flagship model exceeds HBM on the lane-padded
    [B, slots, 16] block activations, and recomputation (remat) cannot
    shrink the SAVED residuals that dominate there; slicing the batch can.
    """
    # Keep the closure as NumPy: device arrays captured as jit constants take a
    # slow per-call feed path on some PJRT runtimes; NumPy folds into the HLO.
    offsets = np.asarray(offsets, np.int32)

    from nasrec_tpu.train.optim import l2_penalty

    if table_update == "sweep":
        from nasrec_tpu.ops.kernels import table_sweep_pallas as _tsp
        sweep_fn = _tsp.sweep_adagrad_update
        if sweep_interpret is None:
            sweep_interpret = jax.default_backend() != "tpu"

        def lookup(table, idx_flat):
            return _tsp.packed_lookup(table, idx_flat)
    elif table_update == "scatter":
        def lookup(table, idx_flat):
            return jnp.take(table, idx_flat, axis=0)
    else:
        raise ValueError(f"unknown table_update {table_update!r}")

    def step_fn(state: TrainState, dense, cat, y, masks=None):
        if isinstance(masks, tuple):  # (device mask buffer, index) — select on device
            buffer, buf_idx = masks
            masks = jax.tree_util.tree_map(lambda x: x[buf_idx], buffer)
        params = state.params
        table = params["embedding"]["table"]
        if table_update == "sweep" and (
            table.shape[1] != _tsp.LANES or table.shape[0] % _tsp.K_TILE != 0
        ):
            raise ValueError(
                f"table_update='sweep' needs the packed "
                f"[Tpad/{_tsp.GROUP}, {_tsp.LANES}] layout (tile-aligned); got "
                f"{table.shape} — convert the state with pack_state_for_sweep"
            )
        rest = {k: v for k, v in params.items() if k != "embedding"}
        idx = (cat + jnp.asarray(offsets)[None, :]).reshape(-1)

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
            looked = lookup(table, idx)                   # [B*S, E]
            e_dim = looked.shape[-1]
            # Hand the model the FLAT slot-major stem [B, S*E] (a contiguous
            # row-major reshape) — the 3-D [B, S, E] form would pad E=16 ->
            # 128 lanes (8x HBM traffic) just to be re-flattened inside.
            stem = looked.reshape(cat.shape[0], cat.shape[1] * e_dim)
            (loss, (bce, logits)), (g_rest, g_stem) = grad_fn(rest, stem, dense, y)
            g_stem_flat = g_stem.reshape(-1, e_dim)
        else:
            b_full, s = cat.shape
            assert b_full % microbatch == 0, (
                f"batch {b_full} not divisible by microbatch {microbatch}"
            )
            b = b_full // microbatch

            def micro(g_rest_acc, xs):
                d_i, c_i, y_i = xs
                idx_i = (c_i + jnp.asarray(offsets)[None, :]).reshape(-1)
                looked_i = lookup(table, idx_i)           # [b*S, E]
                e_dim = looked_i.shape[-1]
                stem_i = looked_i.reshape(b, s * e_dim)   # flat slot-major
                (loss_i, (bce_i, logits_i)), (g_rest_i, g_stem_i) = grad_fn(
                    rest, stem_i, d_i, y_i
                )
                g_rest_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g, g_rest_acc, g_rest_i
                )
                return g_rest_acc, (
                    g_stem_i.reshape(-1, e_dim),
                    loss_i, bce_i, logits_i,
                )

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
            # [M, b*S, E] stacking order equals the full-batch row-major
            # flatten of [B, S], so `idx` (computed on the whole batch) lines
            # up with the concatenated slice gradients.
            g_stem_flat = g_stems.reshape(-1, g_stems.shape[-1]) * inv_m
            loss, bce = losses.mean(), bces.mean()
            logits = logits_m.reshape(b_full, -1)

        # Sorted vocab rows + per-row summed 16-lane grads — the shared
        # contract of both the scatter update and the sweep kernel.  The
        # slotwise (batched per-column sort) variant is ~2x cheaper than
        # the flat argsort at large batches (see _slotwise_sort).
        rows, seg, is_end = rowwise_segment_sum_slotwise(
            cat + jnp.asarray(offsets)[None, :], g_stem_flat
        )

        if grad_clip is not None:
            sq_rest = sum(
                jnp.sum(jnp.square(l.astype(jnp.float32)))
                for l in jax.tree_util.tree_leaves(g_rest)
            )
            # sum(seg^2) equals the dense-table grad norm: seg holds each
            # vocab row's summed grad once, zeros elsewhere.
            sq_emb = jnp.sum(jnp.square(seg))
            norm = jnp.sqrt(sq_rest + sq_emb)
            scale = jnp.minimum(1.0, grad_clip / (norm + 1e-6))
        else:
            scale = jnp.float32(1.0)

        lr = lr_schedule(state.step)
        g_rest = jax.tree_util.tree_map(lambda g: g * scale, g_rest)
        opt_rest = {k: v for k, v in state.opt_state.items() if k != "embedding"}
        new_rest, new_opt_rest = optimizer.update(rest, opt_rest, g_rest, lr)

        acc = state.opt_state["embedding"]["table"]
        if table_update == "sweep":
            new_table, new_acc = sweep_fn(
                table, acc, rows, seg * scale, lr,
                eps=adagrad_eps, interpret=sweep_interpret,
            )
        else:
            new_table, new_acc = sparse_adagrad_table_update(
                table, acc, rows, seg, lr, adagrad_eps, scale, is_end
            )

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
