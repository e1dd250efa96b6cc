"""Ablate the sweep kernel to attribute its gap over the copy-through floor.

The tuned kernel runs ~29 ms at flagship scale while a pure aliased
copy-through of table+acc at the same block pattern runs ~14.6 ms
(probe_sweep_ktile.py round 2).  Parameter sweeps (K_TILE x CW x WF) are
FLAT, so the gap is structural.  This probe times ablated variants that
share the exact grid/schedule/BlockSpecs of the real kernel:

  full      — the production kernel
  nodot     — window DMA + lane-expand skipped; apply still runs with the
              (zeroed) delta: isolates the one-hot + 3 MXU dots
  nowin     — like nodot but the window BlockSpec is pinned to block 0
              (one fetch total): additionally isolates the window DMA
  copyonly  — apply replaced by a raw copy-through on is_last: the floor
              under THIS schedule (vs the round-2 floor probe's)

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_sweep_diag.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nasrec_tpu.config import DATASETS
from nasrec_tpu.ops.kernels import table_sweep_pallas as tsp
from nasrec_tpu.profiling import chained_rate

BATCH = 32768
vocab = DATASETS["criteo-kaggle"].vocab_sizes(None)
offsets = np.cumsum([0] + list(vocab[:-1])).astype(np.int32)
total = int(sum(vocab))
rng = np.random.RandomState(0)
idx_np = np.stack(
    [rng.randint(0, v, size=BATCH) + o for v, o in zip(vocab, offsets)], 1
).reshape(-1).astype(np.int32)
n = idx_np.size
order = np.argsort(idx_np, kind="stable")
rows = jnp.asarray(idx_np[order])
seg16 = jnp.asarray((rng.randn(n, 16) * 1e-2).astype(np.float32)[order])
jax.block_until_ready(seg16)

K_TILE, LANES, EMB, GROUP = tsp.K_TILE, tsp.LANES, tsp.EMB, tsp.GROUP
CW, WF = tsp.CW, tsp.WF
tpad = tsp.sweep_padded_rows(total)
n_tiles = tpad // tsp.ROWS_PER_TILE
print(f"K_TILE={K_TILE} CW={CW} WF={WF} tiles={n_tiles}", flush=True)


def make_variant(mode):
    def kernel(tile_id_ref, win_ref, first_ref, last_ref, ss_ref, se_ref,
               lr_ref, table_ref, acc_ref, u_ref, table_out, acc_out, d_acc,
               *, cw, wf, eps):
        g = pl.program_id(0)
        s, e = ss_ref[g], se_ref[g]

        @pl.when(first_ref[g] == 1)
        def _zero():
            d_acc[:] = jnp.zeros_like(d_acc)

        if mode == "full":
            @pl.when(s != e)
            def _acc():
                u = u_ref[:]

                def dot(lhs, rhs):
                    return jax.lax.dot_general(
                        lhs, rhs, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

                for j in range(wf):
                    base = win_ref[g] * (wf * cw) + j * cw

                    @pl.when((base < e) & (base + cw > s))
                    def _sub(j=j, base=base):
                        uj = u[j * cw:(j + 1) * cw]
                        s16 = uj[:, :EMB]
                        rel = uj[:, EMB].astype(jnp.int32)
                        pos = base + jax.lax.broadcasted_iota(
                            jnp.int32, (cw, 1), 0)
                        span = (pos >= s) & (pos < e)
                        lane = jax.lax.broadcasted_iota(
                            jnp.int32, (cw, LANES), 1)
                        seg = jnp.where(
                            lane // EMB == (rel % GROUP)[:, None],
                            jnp.concatenate([s16] * GROUP, axis=1), 0.0)
                        sup_iota = jax.lax.broadcasted_iota(
                            jnp.int32, (cw, K_TILE), 1)
                        a = (((rel // GROUP)[:, None] == sup_iota)
                             & span).astype(jnp.bfloat16)
                        hi = seg.astype(jnp.bfloat16)
                        r1 = seg - hi.astype(jnp.float32)
                        mid = r1.astype(jnp.bfloat16)
                        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                        d_acc[:] = d_acc[:] + (
                            (dot(a, hi) + dot(a, mid)) + dot(a, lo))

        @pl.when(last_ref[g] == 1)
        def _apply():
            if mode == "copyonly":
                table_out[:] = table_ref[:]
                acc_out[:] = acc_ref[:]
            else:
                d = d_acc[:]
                acc_new = acc_ref[:] + d * d
                acc_out[:] = acc_new
                table_out[:] = (
                    table_ref[:] - lr_ref[0] * d / (jnp.sqrt(acc_new) + eps))

    pin_window = mode in ("nowin", "copyonly")

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_once(table_p, acc_p, rows, seg16, lr):
        tp = table_p.shape[0]
        ntl = tp // K_TILE
        sup = rows // GROUP
        boundaries = jnp.arange(ntl + 1, dtype=jnp.int32) * K_TILE
        starts = jnp.searchsorted(sup, boundaries).astype(jnp.int32)
        unit = CW * WF
        sched = tsp._build_schedule(starts, ntl, rows.shape[0], unit)
        tile_id, win_block, is_first, is_last, span_s, span_e = sched
        budget = int(tile_id.shape[0])
        npad = rows.shape[0] + (-rows.shape[0]) % unit + unit
        upd = jax.lax.dynamic_update_slice(
            jnp.zeros((npad, LANES), jnp.float32), seg16, (0, 0))
        upd = upd.at[:rows.shape[0], EMB].set(
            (rows % tsp.ROWS_PER_TILE).astype(jnp.float32))

        if pin_window:
            win_spec = pl.BlockSpec(
                (unit, LANES), lambda g, tid, win, fst, lst, ss, se, lr: (0, 0))
        else:
            win_spec = pl.BlockSpec(
                (unit, LANES),
                lambda g, tid, win, fst, lst, ss, se, lr: (win[g], 0))
        blk = pl.BlockSpec(
            (K_TILE, LANES), lambda g, tid, win, fst, lst, ss, se, lr: (tid[g], 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7, grid=(budget,),
            in_specs=[blk, blk, win_spec], out_specs=[blk, blk],
            scratch_shapes=[pltpu.VMEM((K_TILE, LANES), jnp.float32)],
        )
        return pl.pallas_call(
            functools.partial(make_kernel, cw=CW, wf=WF, eps=1e-2),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct(table_p.shape, table_p.dtype),
                       jax.ShapeDtypeStruct(acc_p.shape, acc_p.dtype)),
            input_output_aliases={7: 0, 8: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(tile_id, win_block, is_first, is_last, span_s, span_e,
          jnp.asarray(lr, jnp.float32).reshape(1), table_p, acc_p, upd)

    make_kernel = kernel
    return run_once


for mode in ("full", "nodot", "nowin", "copyonly"):
    table_p = jax.random.normal(
        jax.random.PRNGKey(0), (tpad // GROUP, LANES), jnp.float32)
    acc_p = jnp.abs(jax.random.normal(
        jax.random.PRNGKey(1), table_p.shape, jnp.float32))
    runner = make_variant(mode)
    box = {"t": table_p, "a": acc_p}

    def run(k):
        t, a = box["t"], box["a"]
        for _ in range(k):
            t, a = runner(t, a, rows, seg16, 0.01)
        box["t"], box["a"] = t, a
        jax.device_get(t[0, 0])

    run(2)
    dt = chained_rate(run, 3, 9)
    gbs = 4 * table_p.size * 4 / dt / 1e9
    print(f"{mode:<9}: {dt*1e3:6.2f} ms ({gbs:.0f} GB/s table+acc r+w)",
          flush=True)
    del table_p, acc_p, box
