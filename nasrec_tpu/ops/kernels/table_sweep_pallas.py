"""Streaming-sweep sparse-adagrad table update (the production update path).

Why: XLA's scatter on TPU is LATENCY-bound at ~104 ns/row regardless of
donation or uniqueness (measured, experiments/probe_step_components.py) —
the flagship full-vocab step pays ~186 ms for its two scatter-adds at
~852k update positions (experiments/probe_table_sweep.py).  A full-table
STREAMING pass, by contrast, moves table+acc (8.6 GB read+write) in ~30 ms.
This kernel applies the touched-row update DURING one such sweep.

Layout: the [T, 16] f32 table is stored PACKED as [TP, 128] with
table[8p + j] at packed[p, 16j:16j+16] (8 vocab rows per 128-lane row).
Packing is mandatory: Mosaic cannot stream 16-lane blocks, and the naive
XLA reshape [T,16]->[T/8,128] relayouts through a T(8,128)-tiled copy that
PADS 16 lanes to 128 — a 17 GB allocation at Criteo scale.  `pack_rows` /
`unpack_rows` convert with 8 static strided slices (pure bandwidth, no fat
intermediate), and `packed_lookup` gathers super-rows then selects the
16-lane group with 8 static slices + select (15 ms for 852k lookups vs
42 s for the einsum formulation — measured, experiments/probe_packed2.py).

The sweep — a WINDOW-LINEARIZED grid:
  - Update positions are sorted by vocab row and cut into (CW, 128) window
    blocks; each grid step processes ONE window of ONE tile.  A scalar-
    prefetched schedule (built by cheap XLA ops in `_build_schedule`) maps
    grid step g -> (tile, window block, is_first, is_last, span), giving
    every tile ceil(segment/CW) consecutive steps.  Total steps are
    <= ceil(n/unit) + n_tiles + 1 for ANY index distribution (unit = CW*WF;
    see _build_schedule for the telescoping bound) — a static budget — so
    unlike a fixed windows-per-tile scheme there is NO overflow path:
    CTR-skewed traffic (small tables concentrate ~100k positions in one
    tile) just gives that tile more steps.
  - The (K_TILE, 128) table/acc blocks stay RESIDENT across a tile's steps
    (consecutive same block index -> Pallas fetches/flushes once).  Block
    size is throughput-critical on the axon runtime: (512, 128) grids run
    <1 GB/s (per-step overhead) while (2048, 128) sustains ~308 GB/s
    (measured, experiments/probe_sweep2.py).
  - A window position carries one vocab row's summed gradient (16 lanes)
    plus that row's offset within its tile in lane 16 (< ROWS_PER_TILE =
    16384, f32-exact).  The segment-sum contract
    (train/sparse_embedding.py) guarantees at most one NONZERO position
    per vocab row.  The kernel lane-expands the 16-lane payload into the
    row's lane group and turns the window into a dense [K_TILE, 128] delta
    via one one-hot matmul, ACCUMULATED in a VMEM scratch across the
    tile's windows; the element-wise adagrad math runs ONCE, on the tile's
    LAST step:

        D      = sum over windows of one-hot @ seg    (per-row summed grads)
        acc'   = acc + D*D
        table' = table - lr * D / (sqrt(acc') + eps)

    Accumulating D before applying is EXACT: each vocab row has one
    nonzero position in one window, and rows sharing a super-row occupy
    disjoint lane groups, so every element of D receives at most one
    nonzero term.  Untouched rows see D == 0 and pass through bit-exactly
    (acc + 0 == acc; table - lr*0/(sqrt(acc)+eps) == table).  Semantics
    match torch Adagrad exactly — duplicates are summed upstream BEFORE
    squaring (ref: nasrec/main_train.py:151-154).

    Round-3 restructure (this shape): round 2 applied the update
    incrementally per window — a full [K_TILE, 128] read-modify-write of
    BOTH resident blocks (sqrt+divide included) on every active step, plus
    a separate first-step copy-through, and the window payload carried
    pre-lane-expanded 128-lane rows (a (CW, 256) block).  Per-tile
    accumulation cuts the element-wise work by the tile's window count,
    the single apply subsumes the copy-through, in-kernel lane expansion
    halves the window DMA and the prep-side payload build, and WF
    sub-windows fold into one grid step (span-guarded, so folding adds no
    MXU work).

    Measured plateau (experiments/probe_sweep_ktile.py + probe_sweep_diag.py,
    flagship scale): ~29 ms FLAT across K_TILE in {512..2048} x CW x WF —
    the terms trade off almost exactly: per-grid-step pipeline overhead
    (~1 us; a pure copy-through under this very schedule costs 22.4 ms at
    ~10k steps vs 14.6 ms at ~2k steps), the one-hot MXU expansion
    (~2*3*K_TILE*128 MACs per position, ~6-9 ms), and the 8.6 GB resident
    stream.  An in-kernel manual-DMA variant with ONE step per tile
    measured 40 ms (the serial in-tile loop defeats Pallas' cross-step
    software pipelining) and was reverted.

Cost model: table/acc stream over TOUCHED TILES ONLY (untouched tiles get
zero grid steps — their aliased blocks are never DMA'd and pass through as
raw memory) + ~n*0.5KB window traffic at ~300 GB/s, with the one-hot MXU
work (~0.2 GFLOP/window at 3 bf16 passes) overlapped by Pallas' grid
pipelining.  Uniform flagship traffic touches every tile (full 8.6 GB
stream); skewed CTR traffic pays only for the tiles it hits.
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
GROUP = 8           # vocab rows per packed 128-lane super-row
EMB = 16
K_TILE = 1024       # packed super-rows per tile block (8192 vocab rows)
CW = 256            # update positions per sub-window (one one-hot dot)
WF = 2              # sub-windows folded into one grid step
ROWS_PER_TILE = K_TILE * GROUP      # vocab rows per tile


def sweep_padded_rows(total_vocab: int) -> int:
    """Smallest tile-aligned vocab-row count >= total_vocab."""
    return -(-total_vocab // ROWS_PER_TILE) * ROWS_PER_TILE


# Conversions run CHUNKED: XLA stores the strided-slice / scatter
# intermediates of a [*, 16] array in the lane-padded T(8,128) tiled layout
# (16 -> 128 lanes, 8x bytes) — at full Criteo scale one such intermediate
# is 2.2 GB and the 8 needed at once exceed HBM.  2M-row chunks cap the
# transient padding at ~1 GB; conversion is a once-per-run layout change.
_PACK_CHUNK = 1 << 21   # vocab rows per conversion chunk


def pack_rows(x: jnp.ndarray) -> jnp.ndarray:
    """[T, 16] -> packed [Tpad/8, 128]; row 8p+j lands at [p, 16j:16j+16].

    8 static strided slices + lane concat per chunk: every op is
    layout-compatible on TPU (the direct reshape relayouts through a
    16->128 lane-padded copy of the WHOLE table).  Zero-pads rows to a tile
    multiple first; padding is never indexed.
    """
    t, e = x.shape
    assert e == EMB, x.shape
    tp = sweep_padded_rows(t)
    if tp != t:
        x = jnp.concatenate([x, jnp.zeros((tp - t, e), x.dtype)], 0)
    packed = [
        jnp.concatenate(
            [x[off + j:off + _PACK_CHUNK:GROUP] for j in range(GROUP)], axis=1
        )
        for off in range(0, tp, _PACK_CHUNK)
    ]
    return packed[0] if len(packed) == 1 else jnp.concatenate(packed, axis=0)


def unpack_rows(packed: jnp.ndarray, total_vocab: int) -> jnp.ndarray:
    """Inverse of pack_rows: packed [TP, 128] -> [total_vocab, 16]."""
    chp = _PACK_CHUNK // GROUP
    chunks = []
    for off in range(0, packed.shape[0], chp):
        sub = packed[off:off + chp]
        out = jnp.zeros((sub.shape[0] * GROUP, EMB), packed.dtype)
        for j in range(GROUP):
            out = out.at[j::GROUP].set(sub[:, EMB * j:EMB * (j + 1)])
        chunks.append(out)
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
    return out[:total_vocab]


def packed_lookup(packed: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather vocab rows from the packed table: [N] int32 -> [N, 16].

    Super-row gather + 8 static lane-slices + select — the only fast lane
    selection on this runtime (take_along_axis: 300 ms, einsum: 42 s;
    measured, experiments/probe_packed2.py)."""
    sup = jnp.take(packed, idx // GROUP, axis=0)      # [N, 128]
    lane = (idx % GROUP)[:, None]
    out = sup[:, :EMB]
    for j in range(1, GROUP):
        out = jnp.where(lane == j, sup[:, EMB * j:EMB * (j + 1)], out)
    return out


def lane_expand(rows: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """[N] vocab rows + [N, 16] grads -> [N, 128] at each row's lane group.

    The scatter REFERENCE path's layout helper; the sweep kernel itself
    expands lanes in VMEM (its payload stays 16 grad lanes + the row
    metadata lane)."""
    lane = jax.nn.one_hot(rows % GROUP, GROUP, dtype=g.dtype)      # [N, 8]
    return (lane[:, :, None] * g[:, None, :]).reshape(-1, LANES)


def _build_schedule(starts: jnp.ndarray, n_tiles: int, n: int, unit: int):
    """Static-budget step schedule: one grid step per (tile, window block).

    `unit` = positions per grid step (= cw * wf: a step's block holds wf
    sub-windows of cw positions; sub-windows outside the tile's span are
    skipped by the kernel's per-sub-window guard, so folding cuts the step
    count without adding MXU work).

    starts: [n_tiles + 1] int32 segment boundaries (searchsorted of tile
    vocab-row boundaries in the sorted update positions).  Returns int32
    [BUDGET] tables (tile_id, win_block, is_first, is_last, span_s, span_e)
    with BUDGET = ceil(n/unit) + n_tiles + 1 — a TIGHT upper bound on the
    windows any distribution needs: tile t uses
    ceil(e_t/unit) - floor(s_t/unit), and because touched segments are
    consecutive (s_{t+1} >= e_t) the floor/ceil terms telescope:
    sum_t steps_t <= ceil(n/unit) + #touched_tiles.  (Surplus steps cost
    ~1 us each in pure grid sequencing even with their DMAs skipped —
    measured, experiments/probe_sweep_diag.py — so the previous 2*n_tiles
    budget wasted ~4 ms at flagship scale, where ~4100 of its 9921 steps
    were surplus.  Property-checked over adversarial distributions:
    tests/test_table_sweep.py::test_schedule_budget_tight.)

    UNTOUCHED tiles get ZERO steps: the grid never visits their blocks, so
    no DMA is issued for them, and because the table/acc outputs alias their
    inputs (donation or XLA's defensive copy both start the output buffer
    from the input bytes) the unvisited regions pass through bit-exactly.
    Under skewed CTR traffic this collapses the stream from the whole table
    to the touched tiles.  Surplus steps get an empty span (s == e == 0) on
    the LAST active tile/window, so their block indices repeat (no DMA;
    that block was already written by its is_last apply) and the kernel's
    span guard skips their compute entirely.
    """
    cw = unit
    budget = -(-n // cw) + n_tiles + 1
    s, e = starts[:-1], starts[1:]
    aligned = (s // cw) * cw
    n_win = jnp.where(e > s, -(-(e - aligned) // cw), 0)     # [n_tiles]
    steps_end = jnp.cumsum(n_win)
    g = jnp.arange(budget, dtype=jnp.int32)
    tile_id = jnp.searchsorted(steps_end, g, side="right").astype(jnp.int32)
    active = tile_id < n_tiles
    t_c = jnp.minimum(tile_id, n_tiles - 1)
    w_local = g - jnp.where(t_c > 0, jnp.take(steps_end, t_c - 1), 0)
    win_block = jnp.take(s, t_c) // cw + jnp.where(active, w_local, 0)
    # Surplus steps: repeat the last active step's indices so Pallas skips
    # their DMAs entirely.
    last = jnp.maximum(steps_end[-1] - 1, 0)
    tile_id = jnp.where(active, t_c, jnp.take(t_c, last))
    win_block = jnp.where(active, win_block, jnp.take(win_block, last))
    is_first = (active & (w_local == 0)).astype(jnp.int32)
    is_last = (active & (w_local == jnp.take(n_win, t_c) - 1)).astype(
        jnp.int32
    )
    # All-sentinel input (a shard owning no touched rows): zero active steps
    # would still flush step 0's (never-written) VMEM blocks at the end —
    # force a zero-delta apply (first zeroes the scratch, last applies it)
    # so the flush is a bit-exact pass-through.
    degenerate = steps_end[-1] == 0
    is_first = is_first.at[0].set(jnp.where(degenerate, 1, is_first[0]))
    is_last = is_last.at[0].set(jnp.where(degenerate, 1, is_last[0]))
    span_s = jnp.where(active, jnp.take(s, t_c), 0).astype(jnp.int32)
    span_e = jnp.where(active, jnp.take(e, t_c), 0).astype(jnp.int32)
    return tile_id, win_block.astype(jnp.int32), is_first, is_last, span_s, span_e


def _sweep_kernel(
    tile_id_ref,     # [BUDGET] int32 (SMEM, scalar prefetch)
    win_ref,         # [BUDGET] int32
    first_ref,       # [BUDGET] int32 (1 on a tile's first step)
    last_ref,        # [BUDGET] int32 (1 on a tile's last step)
    ss_ref,          # [BUDGET] int32 span start (global update position)
    se_ref,          # [BUDGET] int32 span end
    lr_ref,          # [1] f32
    table_ref,       # [K_TILE, 128] resident input block
    acc_ref,         # [K_TILE, 128]
    u_ref,           # [WF*CW, 128] window block (wf folded sub-windows)
    table_out,       # [K_TILE, 128] resident output block (aliased)
    acc_out,         # [K_TILE, 128]
    d_acc,           # [K_TILE, 128] f32 VMEM scratch: the tile's delta
    *,
    cw: int,
    wf: int,
    eps: float,
):
    g = pl.program_id(0)
    s = ss_ref[g]
    e = se_ref[g]

    # Zero the tile's delta once, on its first step (also covers the
    # degenerate all-sentinel schedule, whose forced step 0 is first+last
    # with an empty span: the apply below then passes through bit-exactly).
    @pl.when(first_ref[g] == 1)
    def _zero():
        d_acc[:] = jnp.zeros_like(d_acc)

    # Surplus steps (s == e) repeat the last active step's block indices:
    # no DMA, and this guard skips their one-hot dots entirely.
    @pl.when(s != e)
    def _accumulate():
        u = u_ref[:]                          # [wf*cw, 128]

        def dot(lhs, rhs):  # one bf16 MXU pass, f32 accumulate
            return jax.lax.dot_general(
                lhs, rhs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        for j in range(wf):
            base = win_ref[g] * (wf * cw) + j * cw

            # Sub-windows that do not intersect the tile's span [s, e) are
            # skipped OUTRIGHT — folding wf sub-windows into one grid step
            # cuts pipeline-step count without paying their MXU work
            # (alignment slack and neighbours' positions stay guarded).
            @pl.when((base < e) & (base + cw > s))
            def _sub(j=j, base=base):
                uj = u[j * cw:(j + 1) * cw]       # [cw, 128]
                seg16 = uj[:, :EMB]               # per-vocab-row summed grads
                rel = uj[:, EMB].astype(jnp.int32)  # vocab-row offset in tile
                pos = base + jax.lax.broadcasted_iota(jnp.int32, (cw, 1), 0)
                span = (pos >= s) & (pos < e)     # column mask
                # Lane-expand the 16-lane payload into the row's lane group.
                # Out-of-span rows may expand to garbage lanes; their one-hot
                # column is zero, so they contribute nothing to the dot.
                lane = jax.lax.broadcasted_iota(jnp.int32, (cw, LANES), 1)
                seg = jnp.where(
                    lane // EMB == (rel % GROUP)[:, None],
                    jnp.concatenate([seg16] * GROUP, axis=1),
                    0.0,
                )                                 # [cw, 128] lane-expanded
                sup_iota = jax.lax.broadcasted_iota(jnp.int32, (cw, K_TILE), 1)
                a = (((rel // GROUP)[:, None] == sup_iota) & span).astype(
                    jnp.bfloat16
                )
                # Manual 3-pass split (Mosaic lowers only DEFAULT/HIGHEST dot
                # precision): `a` is 0/1 (bf16-exact) and each output element
                # receives at most one nonzero term, so splitting `seg` into
                # its exact bf16 hi/mid/lo mantissa triple (8+8+8 of f32's 24
                # mantissa bits; each subtraction is Sterbenz-exact) and
                # summing three single-pass dots reconstructs the f32
                # gradient EXACTLY at half the MXU cost of HIGHEST — and
                # bf16 operands halve the scratch VMEM.  (Round-5 A/B:
                # stacking the three passes into ONE K=3cw dot measured
                # 1.2 ms SLOWER at flagship scale — the concat copies cost
                # more than the saved MXU issues; the 7 ms full-vs-nodot gap
                # is the _accumulate body's real VPU+MXU execution time,
                # serialized against the tile stream, probe_sweep_diag.py.)
                hi = seg.astype(jnp.bfloat16)
                r1 = seg - hi.astype(jnp.float32)
                mid = r1.astype(jnp.bfloat16)
                lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                d_acc[:] = d_acc[:] + (
                    (dot(a, hi) + dot(a, mid)) + dot(a, lo)
                )                                 # [K_TILE, 128]

    # One element-wise adagrad application per tile, on its last step.
    # Elements with D == 0 (untouched rows, zero-seg duplicate positions)
    # pass through bit-exactly.
    @pl.when(last_ref[g] == 1)
    def _apply():
        d = d_acc[:]
        acc_new = acc_ref[:] + d * d
        acc_out[:] = acc_new
        table_out[:] = (
            table_ref[:] - lr_ref[0] * d / (jnp.sqrt(acc_new) + eps)
        )


def _sweep_impl(table_p, acc_p, rows, seg16, lr, row_offset, *,
                eps, cw, wf, interpret):
    tp, lanes = table_p.shape
    assert lanes == LANES and tp % K_TILE == 0, (tp, lanes)
    n_tiles = tp // K_TILE
    n = rows.shape[0]

    # row_offset > 0: `table_p` is one row-shard of a larger table and
    # `rows` carry GLOBAL vocab ids — the shard's tile boundaries are
    # searchsorted into the global sorted stream, so positions owned by
    # other shards fall outside every span and are never applied.  The
    # window payload's in-tile offset (rows % ROWS_PER_TILE) stays valid
    # because the offset is a K_TILE multiple (shards hold whole tiles).
    sup_rows = rows // GROUP
    boundaries = (jnp.arange(n_tiles + 1, dtype=jnp.int32) * K_TILE
                  + jnp.asarray(row_offset, jnp.int32))
    starts = jnp.searchsorted(sup_rows, boundaries).astype(jnp.int32)
    unit = cw * wf
    tile_id, win_block, is_first, is_last, span_s, span_e = _build_schedule(
        starts, n_tiles, n, unit
    )
    budget = int(tile_id.shape[0])

    # Window payload: lanes 0-15 = per-vocab-row summed (and clip-scaled)
    # grads, lane 16 = the row's offset within its tile (< ROWS_PER_TILE,
    # f32-exact).  Padded to whole window blocks plus one spare so the last
    # tile's final window index stays in bounds; padded positions fail the
    # span test.  Built by in-place updates of one zeros buffer — the
    # concatenate formulation's extra copies tipped large batches over HBM.
    npad = n + (-n) % unit + unit
    upd = jax.lax.dynamic_update_slice(
        jnp.zeros((npad, LANES), jnp.float32), seg16, (0, 0)
    )
    upd = upd.at[:n, EMB].set((rows % ROWS_PER_TILE).astype(jnp.float32))

    kernel = functools.partial(_sweep_kernel, cw=cw, wf=wf, eps=eps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(budget,),
        in_specs=[
            pl.BlockSpec((K_TILE, LANES),
                         lambda g, tid, win, fst, lst, ss, se, lr: (tid[g], 0)),
            pl.BlockSpec((K_TILE, LANES),
                         lambda g, tid, win, fst, lst, ss, se, lr: (tid[g], 0)),
            pl.BlockSpec((unit, LANES),
                         lambda g, tid, win, fst, lst, ss, se, lr: (win[g], 0)),
        ],
        out_specs=[
            pl.BlockSpec((K_TILE, LANES),
                         lambda g, tid, win, fst, lst, ss, se, lr: (tid[g], 0)),
            pl.BlockSpec((K_TILE, LANES),
                         lambda g, tid, win, fst, lst, ss, se, lr: (tid[g], 0)),
        ],
        scratch_shapes=[pltpu.VMEM((K_TILE, LANES), jnp.float32)],
    )
    new_table_p, new_acc_p = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(table_p.shape, table_p.dtype),
            jax.ShapeDtypeStruct(acc_p.shape, acc_p.dtype),
        ),
        input_output_aliases={7: 0, 8: 1},
        # 4x [K_TILE, 128] f32 blocks (table/acc in+out, double-buffered) +
        # the delta scratch + the window block + transients; the default
        # 16 MiB scoped limit is exactly full at K_TILE=2048 and blocks any
        # larger tile.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(tile_id, win_block, is_first, is_last, span_s, span_e,
      jnp.asarray(lr, jnp.float32).reshape(1), table_p, acc_p, upd)
    return new_table_p, new_acc_p


@functools.partial(
    jax.jit,
    static_argnames=("eps", "cw", "wf", "interpret"),
    donate_argnums=(0, 1),
)
def sweep_adagrad_update(
    table_p: jnp.ndarray,   # [TP, 128] f32 packed table, TP % K_TILE == 0
    acc_p: jnp.ndarray,     # [TP, 128] f32 packed adagrad accumulator
    rows: jnp.ndarray,      # [N] int32 SORTED touched VOCAB rows; sentinel
                            #   (>= TP*GROUP) tail allowed.  Duplicates
                            #   allowed as long as at most one position per
                            #   vocab row carries a NONZERO seg16 — the
                            #   segment-sum contract (zero rows add exact
                            #   0.0 terms to the one-hot dot).
    seg16: jnp.ndarray,     # [N, 16] per-vocab-row summed (and clip-scaled)
                            #   grads, zero off segment ends
    lr,
    row_offset=0,           # global super-row id of this table's first row
                            #   (row-sharded tables; MUST be a K_TILE
                            #   multiple — shards hold whole tiles).  Global
                            #   positions outside [row_offset, row_offset +
                            #   TP) are skipped, not applied.
    *,
    eps: float = 1e-2,
    cw: int = CW,
    wf: int = WF,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming-sweep application of the touched-row adagrad update."""
    return _sweep_impl(table_p, acc_p, rows, seg16, lr, row_offset,
                       eps=eps, cw=cw, wf=wf, interpret=interpret)


def sweep_adagrad_update_reference(table_p, acc_p, rows, seg16, lr, *,
                                   eps=1e-2):
    """Scatter-based reference with identical semantics (tests).  Takes the
    same (sorted vocab rows, 16-lane segs) contract as the kernel; duplicate
    rows with zero segs are fine (plain .add of exact zeros)."""
    tp = table_p.shape[0]
    sup_rows = rows // GROUP
    seg128 = lane_expand(rows, seg16)
    tgt = jnp.where(sup_rows < tp, sup_rows, tp)
    sq = jnp.square(seg128)
    acc_rows = jnp.take(acc_p, jnp.clip(sup_rows, 0, tp - 1), axis=0)
    new_acc = acc_p.at[tgt].add(sq, mode="drop")
    delta = -lr * seg128 / (jnp.sqrt(acc_rows + sq) + eps)
    new_table = table_p.at[tgt].add(delta, mode="drop")
    return new_table, new_acc
