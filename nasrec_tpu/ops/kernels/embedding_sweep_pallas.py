"""EXPERIMENTAL: packed embedding tables + a Pallas sweep kernel for the
sparse-adagrad table update.  NOT the default path — see the honest status
note below before using it.

Motivation (measured on v5e-via-axon, experiments/probe_*.py):
  - Forcing the [vocab, 16] f32 table into XLA's (8, 128) tile layout pads
    the 16-wide row to 128 lanes: a 2.1 GB Criteo table becomes a 17.3 GB
    allocation -> OOM (hit by plain row-scatter probes).
  - A flat scalar scatter of 851k indices takes ~108 s.
  - XLA gather of UNSORTED 128-lane rows hits a pathological path; sorted
    gathers are fast.

STATUS / honesty note: the production sparse step
(train/sparse_embedding.py) routes duplicate rows out of bounds and
scatters with unique_indices=True, which gets XLA's parallel scatter path —
the full 851k-touched-row train step measures ~0.65 ms on this chip.  That
removes the original motivation at Criteo scale.  This kernel's streaming
design (O(table) = ~8.6 GB table+acc traffic per call, roofline ~15-30 ms)
only wins when touched rows approach the table size; and measured through
the axon remote runtime it is far slower still (~80 s/call: per-grid-step
overhead there is ~2.5 ms x 33k tiles; a plain Pallas stream copy measures
47 GB/s vs 310 GB/s for XLA on the same chip).  Kept as (a) a tested
reference for MXU-based scatter (one-hot matmul gather/scatter-add is how a
TPU scatters at speed when it must), (b) the packed [ceil(vocab/8), 128]
layout utilities, which waste zero lanes and are load-bearing for
larger-than-HBM table experiments.  Tests run the interpreter path.

Design:
  - The fused table is stored PACKED: 8 consecutive vocab rows per 128-lane
    super-row -> [ceil(vocab/8), 128] f32.  Zero lane waste, natural tiles.
  - Lookups gather SORTED super-rows and select the 16-lane group with a
    one-hot multiply-sum (MXU/VPU), then invert the sort.
  - The update is a STREAMING SWEEP: the kernel walks table+acc tiles
    ([K super-rows, 128] blocks, auto-pipelined); per tile it DMAs the
    (sorted, aggregated, compacted) update segment and applies it with
    one-hot MATMULS — gather of per-update accumulator rows and the
    scatter-add both run on the MXU, which is how a TPU does scatter at
    speed.  Updates for the NEXT tile are prefetched during the current one
    (cross-grid-step double buffering; scratch persists between steps).
  - Traffic is O(table) streamed (read+write table+acc) + O(batch) updates,
    which beats the serialized scatters ~10x at Criteo scale; duplicates
    are summed BEFORE squaring exactly like torch Adagrad
    (ref semantics: nasrec/main_train.py:151-154, see
    train/sparse_embedding.py).

Everything is shape-static; per-tile update counts are bounded by the
tile's own vocab rows (hard bound, any index distribution).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
GROUP = 8          # vocab rows per packed super-row (LANES // emb_dim)
EMB = 16


def packed_rows(total_vocab: int) -> int:
    return -(-total_vocab // GROUP)


def pack_table(table16: jnp.ndarray) -> jnp.ndarray:
    """[T, 16] -> [ceil(T/8), 128] (pad rows are zero, never indexed)."""
    t, e = table16.shape
    assert e == EMB
    tp = packed_rows(t)
    pad = tp * GROUP - t
    if pad:
        table16 = jnp.concatenate(
            [table16, jnp.zeros((pad, e), table16.dtype)], axis=0
        )
    return table16.reshape(tp, LANES)


def unpack_table(packed: jnp.ndarray, total_vocab: int) -> jnp.ndarray:
    """[TP, 128] -> [T, 16]."""
    return packed.reshape(-1, EMB)[:total_vocab]


# ---------------------------------------------------------------------------
# Sorted lookup
# ---------------------------------------------------------------------------


def packed_lookup_sorted(packed: jnp.ndarray, idx_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gather [N] SORTED vocab-row ids -> [N, 16].  (Unsorted 128-lane
    gathers are pathologically slow on v5e; callers sort once and reuse the
    permutation for the backward aggregation.)"""
    sup = jnp.take(packed, idx_sorted // GROUP, axis=0)        # [N, 128]
    sup = sup.reshape(-1, GROUP, EMB)
    onehot = jax.nn.one_hot(idx_sorted % GROUP, GROUP, dtype=sup.dtype)
    return jnp.einsum("ng,ngk->nk", onehot, sup)


def lane_expand(rows: jnp.ndarray, seg16: jnp.ndarray) -> jnp.ndarray:
    """Place each [16] update at its lane group -> [N, 128]."""
    onehot = jax.nn.one_hot(rows % GROUP, GROUP, dtype=seg16.dtype)  # [N, 8]
    return (onehot[:, :, None] * seg16[:, None, :]).reshape(-1, LANES)


# ---------------------------------------------------------------------------
# The sweep kernel
# ---------------------------------------------------------------------------


def _sweep_kernel(
    # scalar prefetch
    starts_ref,          # [n_tiles + 1] int32 segment starts (SMEM)
    lr_ref,              # [1] f32
    # inputs
    table_ref,           # [K, 128] VMEM block (aliased with output 0)
    acc_ref,             # [K, 128] VMEM block (aliased with output 1)
    upd_hbm,             # [Npad, 256] f32 in HBM: lanes 0-127 = seg,
                         # 128-255 = super-row id as f32 (exact below 2^24)
    # outputs
    table_out,           # [K, 128] VMEM block
    acc_out,             # [K, 128] VMEM block
    # scratch
    upd_buf,             # [3, C, 256] f32
    sems,                # DMA semaphores (3,)
    *,
    K: int,
    C: int,
    eps: float,
):
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    lr = lr_ref[0]

    # DMA sublane starts must be 8-aligned (f32 tiling): each chunk's window
    # starts at align8(span start) and spans C rows; the chunk's TRUE span is
    # C_EFF = C - 8 rows, and a position mask keeps window-overlap rows from
    # being applied twice.
    C_EFF = C - 8

    def window_pos(pos):
        return (pos // 8) * 8

    def chunk_dma(slot, pos):
        return pltpu.make_async_copy(
            upd_hbm.at[pl.ds(window_pos(pos), C), :],
            upd_buf.at[slot],
            sems.at[slot],
        )

    def start_chunk(slot, pos):
        chunk_dma(slot, pos).start()

    def wait_chunk(slot, pos):
        chunk_dma(slot, pos).wait()

    # Bootstrap: tile 0 prefetches its own first chunk.
    @pl.when(t == 0)
    def _():
        start_chunk(0, starts_ref[0])

    # Prefetch the NEXT tile's first chunk while this tile computes
    # (slot = tile parity; scratch persists across sequential grid steps).
    @pl.when(t + 1 < n_tiles)
    def _():
        start_chunk((t + 1) % 2, starts_ref[t + 1])

    table_out[:] = table_ref[:]
    acc_out[:] = acc_ref[:]

    tile_base = t * K
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (C, K), dimension=1)
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (C, K), dimension=0)

    def apply_chunk(slot, lo):
        hi = jnp.minimum(lo + C_EFF, end)
        val = upd_buf[slot]                      # [C, 256]
        seg = val[:, :LANES]                     # [C, 128]
        if K == LANES:  # row id broadcast across lanes lines up with iota
            rowsk = val[:, LANES:]
        else:
            rowsk = jnp.broadcast_to(val[:, LANES : LANES + 1], (C, K))
        # At[c, k] = 1 iff update c targets tile row k AND its global
        # position is inside this chunk's true span; out-of-tile and padding
        # rows produce all-zero columns on their own.
        pos = window_pos(lo) + pos_iota
        in_span = (pos >= lo) & (pos < hi)
        at = (
            (rowsk.astype(jnp.int32) - tile_base == row_iota) & in_span
        ).astype(jnp.float32)  # [C, K]
        acc_u = jax.lax.dot_general(
            at, acc_out[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                        # [C, 128] per-update acc rows
        sq = seg * seg
        denom = jnp.sqrt(acc_u + sq) + eps
        delta = (-lr) * seg / denom
        # Scatter-add via the transposed one-hot (contraction over updates).
        acc_out[:] += jax.lax.dot_general(
            at, sq, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        table_out[:] += jax.lax.dot_general(
            at, delta, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    # Chunk 0 (always present for uniform control flow; empty segments
    # contribute all-zero one-hots).
    wait_chunk(t % 2, start)
    apply_chunk(t % 2, start)

    # Rare extra chunks (tiles with > C_EFF updates), synchronous on slot 2.
    n_chunks = jax.lax.div(end - start + (C_EFF - 1), C_EFF)

    def extra(c, _):
        lo = start + c * C_EFF
        start_chunk(2, lo)
        wait_chunk(2, lo)
        apply_chunk(2, lo)
        return 0

    jax.lax.fori_loop(1, n_chunks, extra, 0)


@functools.partial(
    jax.jit, static_argnames=("K", "C", "eps", "interpret"),
    donate_argnums=(0, 1),
)
def sweep_adagrad_update(
    table_p: jnp.ndarray,      # [TP, 128] packed table
    acc_p: jnp.ndarray,        # [TP, 128] packed accumulator
    rows: jnp.ndarray,         # [N] int32 vocab rows, sorted valid prefix,
                               # tail = sentinel >= TP*8 (compacted, unique)
    seg16: jnp.ndarray,        # [N, 16] aggregated grads (zero on tail)
    lr,
    *,
    K: int = 128,
    C: int = 128,
    eps: float = 1e-2,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the touched-row adagrad update by sweeping the packed table."""
    assert C >= 16, "C must leave room for the 8-row DMA alignment slack"
    tp = table_p.shape[0]
    n_tiles = -(-tp // K)
    pad_tiles = n_tiles * K - tp
    if pad_tiles:
        z = jnp.zeros((pad_tiles, LANES), table_p.dtype)
        table_p = jnp.concatenate([table_p, z], axis=0)
        acc_p = jnp.concatenate([acc_p, z], axis=0)

    seg = lane_expand(rows, seg16)                      # [N, 128]
    sup = (rows // GROUP).astype(jnp.int32)             # sorted (sentinel last)
    # Fused update payload: seg in lanes 0-127, super-row id (f32, exact:
    # valid ids < 2^24, sentinel is a power of two) in lanes 128-255.
    upd = jnp.concatenate(
        [seg, jnp.broadcast_to(sup.astype(jnp.float32)[:, None], seg.shape)],
        axis=1,
    )
    # Pad by one chunk so prefetch overreads stay in bounds.
    pad_rows = jnp.concatenate(
        [jnp.zeros((C, LANES), seg.dtype),
         jnp.full((C, LANES), jnp.float32(2**27))], axis=1
    )
    upd_pad = jnp.concatenate([upd, pad_rows], axis=0)
    starts = jnp.searchsorted(
        sup, jnp.arange(n_tiles + 1, dtype=jnp.int32) * K
    ).astype(jnp.int32)

    kernel = functools.partial(_sweep_kernel, K=K, C=C, eps=eps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((K, LANES), lambda t, *_: (t, 0)),
            pl.BlockSpec((K, LANES), lambda t, *_: (t, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((K, LANES), lambda t, *_: (t, 0)),
            pl.BlockSpec((K, LANES), lambda t, *_: (t, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, C, 2 * LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    new_table, new_acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(table_p.shape, table_p.dtype),
            jax.ShapeDtypeStruct(acc_p.shape, acc_p.dtype),
        ),
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(starts, jnp.asarray(lr, jnp.float32).reshape(1), table_p, acc_p, upd_pad)
    if pad_tiles:
        new_table = new_table[:tp]
        new_acc = new_acc[:tp]
    return new_table, new_acc


# ---------------------------------------------------------------------------
# Pure-JAX reference (CPU tests / fallback): identical math via scatter.
# ---------------------------------------------------------------------------


def sweep_adagrad_update_reference(
    table_p, acc_p, rows, seg16, lr, *, eps: float = 1e-2
):
    tp = table_p.shape[0]
    seg = lane_expand(rows, seg16)
    sup = rows // GROUP
    valid = rows < tp * GROUP
    tgt = jnp.where(valid, sup, tp)
    sq = seg * seg
    acc_rows = jnp.take(acc_p, jnp.clip(sup, 0, tp - 1), axis=0)
    new_acc = acc_p.at[tgt].add(sq, mode="drop")
    delta = -lr * seg / (jnp.sqrt(acc_rows + sq) + eps)
    new_table = table_p.at[tgt].add(delta, mode="drop")
    return new_table, new_acc


# ---------------------------------------------------------------------------
# Aggregation frontend: raw (idx, grad) -> compacted unique sorted updates
# ---------------------------------------------------------------------------


def sorted_segment_sum(r_sorted: jnp.ndarray, g_sorted: jnp.ndarray):
    """Segment-sum over an ALREADY-SORTED row id array.  Returns
    (seg [N, E] with the full sum at each segment's last position, zero
    elsewhere; is_end [N])."""
    cs = jnp.cumsum(g_sorted, axis=0)
    is_end = jnp.concatenate([r_sorted[1:] != r_sorted[:-1], jnp.ones((1,), bool)])
    n = r_sorted.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    end_pos = jnp.where(is_end, pos, -1)
    prev_end = jax.lax.associative_scan(jnp.maximum, end_pos)
    prev_end = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prev_end[:-1]])
    base = jnp.where(
        (prev_end >= 0)[:, None], jnp.take(cs, jnp.maximum(prev_end, 0), axis=0), 0.0
    )
    seg = jnp.where(is_end[:, None], cs - base, 0.0)
    return seg, is_end


def aggregate_updates(idx_sorted: jnp.ndarray, g_sorted: jnp.ndarray,
                      sentinel: int):
    """Sorted raw updates -> (rows [N] unique-sorted + sentinel tail,
    seg16 [N, 16] per-unique-row sums, ends first)."""
    seg, is_end = sorted_segment_sum(idx_sorted, g_sorted)
    order = jnp.argsort(~is_end, stable=True)     # ends first, order kept
    rows_c = jnp.where(is_end, idx_sorted, sentinel)[order]
    seg_c = jnp.take(seg, order, axis=0)
    return rows_c, seg_c
